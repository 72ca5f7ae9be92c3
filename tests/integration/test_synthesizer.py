"""Synthesizer integration: scan vs fused paths share params and agree.

(CPU: fused runs the Pallas kernel interpreted, dropout off there — so the
comparison uses a dropout-free config; TPU behavior is covered by
scripts/tpu_smoke.py.)
"""

import dataclasses

import numpy as np
import pytest

import jax

from tacotron_tpu.config import AudioConfig, get_config
from tacotron_tpu.data.vocab import Vocab
from tacotron_tpu.infer import Synthesizer
from tacotron_tpu.train.step import create_train_state

ACFG = AudioConfig(n_fft=512, win_length=400, hop_length=128, n_mels=80,
                   griffin_lim_iters=5)


@pytest.fixture(scope="module")
def setup():
    c = get_config("tiny_cpu")
    cfg = dataclasses.replace(
        c,
        audio=ACFG,
        model=dataclasses.replace(c.model, vocab_size=40, n_freq=ACFG.n_freq,
                                  prenet_dropout=0.0, max_decode_steps=6),
    )
    vocab = Vocab.build(["hello world test synthesis"])
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    return cfg, state, vocab


def test_scan_synthesizer_end_to_end(setup):
    cfg, state, vocab = setup
    synth = Synthesizer(cfg, state.params, state.batch_stats, vocab)
    out = synth(["hello world", "test"], n_steps=6, gl_iters=5)
    assert out["wavs"].shape[0] == 2
    assert out["mel"].shape == (2, 6 * cfg.model.r, cfg.model.n_mels)
    assert out["audio_seconds"] > 0
    assert np.all(np.isfinite(out["wavs"]))
    assert np.abs(out["wavs"]).max() <= 1.0 + 1e-5  # peak-normalised


def test_fused_matches_scan(setup):
    cfg, state, vocab = setup
    scan_s = Synthesizer(cfg, state.params, state.batch_stats, vocab, fused=False)
    fused_s = Synthesizer(cfg, state.params, state.batch_stats, vocab, fused=True)
    a = scan_s(["hello test"], n_steps=6, gl_iters=3, seed=7)
    b = fused_s(["hello test"], n_steps=6, gl_iters=3, seed=7)
    # dropout off -> decode is deterministic; mel must agree to kernel tolerance
    np.testing.assert_allclose(b["mel"], a["mel"], rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(b["alignments"], a["alignments"], atol=5e-3)


def test_while_decode_matches_scan(setup):
    """The early-exit while_loop decode with a never-trip threshold must equal
    the fixed-length nn.scan decode bit-for-bit-ish (same math, pure form)."""
    cfg, state, vocab = setup
    ee_cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, early_exit=True,
                                       silence_threshold=-1.0))
    a = Synthesizer(cfg, state.params, state.batch_stats, vocab)(
        ["hello test", "world"], n_steps=6, gl_iters=3, seed=7)
    b = Synthesizer(ee_cfg, state.params, state.batch_stats, vocab)(
        ["hello test", "world"], n_steps=6, gl_iters=3, seed=7)
    np.testing.assert_allclose(b["mel"], a["mel"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(b["alignments"], a["alignments"], atol=1e-5)
    np.testing.assert_allclose(b["wavs"], a["wavs"], rtol=1e-4, atol=1e-4)


def test_early_exit_stops_and_trims(setup):
    """With an impossibly high silence threshold every frame is 'silent': the
    while_loop must stop after min_silence_frames worth of steps, the frames
    past the exit stay zero, and the trim metadata reflects the early end."""
    cfg, state, vocab = setup
    ee_cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(
            cfg.infer, early_exit=True, silence_threshold=1e9,
            min_silence_frames=2 * cfg.model.r))
    out = Synthesizer(ee_cfg, state.params, state.batch_stats, vocab)(
        ["hello test"], n_steps=6, gl_iters=3)
    # stop unit is a decoder step: 2 steps of r frames, rest zero
    assert np.all(out["mel"][:, 2 * cfg.model.r:] == 0.0)
    assert out["end_frames"][0] == 0          # silence from the very start
    assert out["trimmed_audio_seconds"] == 0.0
    assert out["audio_seconds"] > 0           # padded metric still reported


def test_trim_before_gl(setup):
    """trim_before_gl slices the linear spectrogram to the quantized max end
    frame before Griffin-Lim; wav length shrinks accordingly."""
    cfg, state, vocab = setup
    t_cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, trim_before_gl=True,
                                       gl_length_quantum=8))
    full = Synthesizer(cfg, state.params, state.batch_stats, vocab)(
        ["hello test"], n_steps=6, gl_iters=3)
    trimmed = Synthesizer(t_cfg, state.params, state.batch_stats, vocab)(
        ["hello test"], n_steps=6, gl_iters=3)
    assert trimmed["wavs"].shape[1] <= full["wavs"].shape[1]
    # quantum 8: GL ran on a multiple of 8 frames (or the full length)
    n_frames_gl = trimmed["wavs"].shape[1] // cfg.audio.hop_length
    assert trimmed["wavs"].shape[1] < full["wavs"].shape[1] or \
        trimmed["end_frames"].max() > full["mel"].shape[1] - 8
    assert trimmed["trimmed_audio_seconds"] <= trimmed["audio_seconds"] + 1e-9


def test_end_frames_detector():
    from tacotron_tpu.infer.early_exit import end_frames, end_frames_device
    mel = np.full((2, 20, 4), 0.5, np.float32)
    mel[0, 10:] = 0.0                  # silence from frame 10 onward
    mel[1, 5:8] = 0.0                  # a 3-frame dip, then speech resumes
    ends = end_frames(mel, threshold=0.05, min_run=4)
    assert ends[0] == 10
    assert ends[1] == 20               # dip shorter than min_run: no trigger
    # device version (used by the Synthesizer so only (B,) ints cross the
    # host link): identical result, including the short-T degenerate case
    np.testing.assert_array_equal(
        np.asarray(end_frames_device(mel, threshold=0.05, min_run=4)), ends)
    short = mel[:, :3]
    np.testing.assert_array_equal(
        np.asarray(end_frames_device(short, threshold=0.05, min_run=4)),
        end_frames(short, threshold=0.05, min_run=4))
