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
