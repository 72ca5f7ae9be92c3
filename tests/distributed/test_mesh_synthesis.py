"""Multi-chip DP synthesis: the Synthesizer over an 8-fake-device mesh
(BASELINE "inference 1 chip / 1 host / N hosts" row; SURVEY.md §2.3).

The model pass shards the utterance batch via GSPMD; Griffin-Lim runs under
shard_map (pallas_call does not auto-partition, so each device runs the
batched GL on its local shard). Output must match the single-device
Synthesizer on the same params.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron_tpu.config import MeshConfig, get_config
from tacotron_tpu.data.vocab import Vocab
from tacotron_tpu.infer import Synthesizer
from tacotron_tpu.models import Tacotron
from tacotron_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("tiny_cpu")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, vocab_size=32,
                                  prenet_dropout=0.0),
        audio=dataclasses.replace(cfg.audio, griffin_lim_iters=3),
    )
    vocab = Vocab.build(["the quick brown fox jumps over a lazy dog"])
    model = Tacotron(cfg.model, train=False)
    text = jnp.ones((2, 8), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, jnp.full((2,), 8, jnp.int32),
        gt_mel=jnp.zeros((2, 2 * cfg.model.r, cfg.model.n_mels)),
    )
    return cfg, vocab, variables


def test_mesh_synthesis_matches_single_device(setup):
    cfg, vocab, variables = setup
    assert len(jax.devices()) == 8, "conftest forces 8 fake devices"
    mesh = make_mesh(MeshConfig())

    texts = ["hello world", "abc", "synthesis on a mesh"]  # 3 -> pads to 8
    kw = dict(n_steps=6, gl_iters=3, peak_normalize=False)

    ref = Synthesizer(cfg, variables["params"], variables["batch_stats"],
                      vocab)(texts, **kw)
    got = Synthesizer(cfg, variables["params"], variables["batch_stats"],
                      vocab, mesh=mesh)(texts, **kw)

    assert got["wavs"].shape == ref["wavs"].shape  # pad rows sliced off
    np.testing.assert_allclose(got["mel"], ref["mel"], atol=1e-5)
    np.testing.assert_allclose(got["linear"], ref["linear"], atol=1e-5)
    np.testing.assert_allclose(got["wavs"], ref["wavs"], atol=1e-4)
    np.testing.assert_array_equal(got["end_frames"], ref["end_frames"])


def test_mesh_synthesis_gl_actually_sharded(setup):
    """The GL stage's jitted output must be laid out over the data axis."""
    cfg, vocab, variables = setup
    mesh = make_mesh(MeshConfig())
    s = Synthesizer(cfg, variables["params"], variables["batch_stats"],
                    vocab, mesh=mesh)
    text, lengths = s.encode_texts(["hello world"] * 8)
    text = jax.device_put(text, s._batch2d)
    lengths = jax.device_put(lengths, s._batch1d)
    _, linear, _ = s._model_fn(s.variables, text, lengths,
                               jax.random.PRNGKey(0), 6)
    wav = s._gl_fn(linear, 3)
    # one shard per device along the batch axis
    assert len(wav.sharding.device_set) == 8
    shard_shapes = {tuple(sh.data.shape) for sh in wav.addressable_shards}
    assert shard_shapes == {(1, wav.shape[1])}


def test_pallas_gl_traces_under_shard_map():
    """pallas_call has no GSPMD partitioning rule — the mesh design runs it
    inside shard_map. On CPU the production path falls back to mm
    (dsp/audio.py), so this exercises the shard_map<->pallas_call tracing
    contract DIRECTLY with the interpret kernel: each device runs the fused
    GL kernel on its local batch shard."""
    from jax.sharding import PartitionSpec as P

    from tacotron_tpu.dsp.dft import stft_mm
    from tacotron_tpu.dsp.pallas_gl import griffin_lim_pallas

    mesh = make_mesh(MeshConfig())
    kw = dict(n_fft=256, hop_length=64, win_length=160)
    y = jax.random.normal(jax.random.PRNGKey(0), (8, 64 * 80))
    re, im = stft_mm(y, **kw)
    mag = jnp.sqrt(re**2 + im**2 + 1e-12)

    f = jax.shard_map(
        lambda m: griffin_lim_pallas(m, **kw, n_iter=2, interpret=True),
        mesh=mesh, in_specs=P("data", None, None), out_specs=P("data", None),
        check_vma=False)
    wav = jax.jit(f)(jax.device_put(
        mag, jax.sharding.NamedSharding(mesh, P("data", None, None))))
    ref = griffin_lim_pallas(mag, **kw, n_iter=2, interpret=True)
    np.testing.assert_allclose(np.asarray(wav), np.asarray(ref), atol=1e-5)
