"""Hoisted teacher-forced decoder (ModelConfig.tf_decoder="hoisted").

The fast path re-associates the scanned DecoderCell math (prenet, attention-
GRU input halves, and frame projection hoisted out of the scan) over the SAME
param pytree — so with dropout disabled it must reproduce the scan path's
outputs AND gradients to float tolerance, under remat, and run under bf16.
Reference behavior being preserved: models/decoder.py DecoderCell semantics
(SURVEY.md §2.1 #10).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron_tpu.config import get_config
from tacotron_tpu.models import Tacotron


def _cfg(**model_kw):
    cfg = get_config("tiny_cpu")
    return dataclasses.replace(
        cfg.model, vocab_size=32, prenet_dropout=0.0, **model_kw)


def _batch(rs, mcfg, b=3, t_in=11, n_steps=4):
    text = jnp.asarray(rs.integers(1, 30, (b, t_in)), jnp.int32)
    tlen = jnp.asarray(rs.integers(5, t_in + 1, (b,)), jnp.int32)
    mel = jnp.asarray(rs.random((b, n_steps * mcfg.r, mcfg.n_mels), np.float32))
    return text, tlen, mel


def _apply(mcfg, variables, batch, rng=None):
    model = Tacotron(mcfg, train=True)
    rngs = {"dropout": rng} if rng is not None else None
    out, _ = model.apply(variables, batch[0], batch[1], gt_mel=batch[2],
                         rngs=rngs, mutable=["batch_stats"])
    return out


@pytest.fixture(scope="module")
def setup():
    mcfg = _cfg()
    rs = np.random.default_rng(0)
    batch = _batch(rs, mcfg)
    model = Tacotron(mcfg, train=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch[0], batch[1], gt_mel=batch[2])
    return mcfg, variables, batch


class TestHoistedDecoder:
    def test_outputs_match_scan(self, setup):
        mcfg, variables, batch = setup
        out_scan = _apply(mcfg, variables, batch)
        out_fast = _apply(dataclasses.replace(mcfg, tf_decoder="hoisted"),
                          variables, batch)
        np.testing.assert_allclose(out_scan.mel, out_fast.mel,
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(out_scan.linear, out_fast.linear,
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(out_scan.alignments, out_fast.alignments,
                                   atol=2e-5, rtol=1e-5)

    def test_gradients_match_scan(self, setup):
        mcfg, variables, batch = setup

        def loss(params, m):
            out, _ = Tacotron(m, train=True).apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch[0], batch[1], gt_mel=batch[2],
                mutable=["batch_stats"])
            return jnp.abs(out.mel).mean() + jnp.abs(out.linear).mean()

        g_scan = jax.grad(loss)(variables["params"], mcfg)
        g_fast = jax.grad(loss)(variables["params"],
                                dataclasses.replace(mcfg, tf_decoder="hoisted"))
        flat_s = jax.tree_util.tree_leaves_with_path(g_scan)
        flat_f = jax.tree_util.tree_leaves(g_fast)
        for (path, a), bb in zip(flat_s, flat_f):
            np.testing.assert_allclose(
                a, bb, atol=3e-5, rtol=2e-4,
                err_msg=jax.tree_util.keystr(path))

    def test_remat_matches(self, setup):
        mcfg, variables, batch = setup
        base = _apply(dataclasses.replace(mcfg, tf_decoder="hoisted"),
                      variables, batch)
        rem = _apply(dataclasses.replace(mcfg, tf_decoder="hoisted",
                                         remat_decoder=True),
                     variables, batch)
        np.testing.assert_allclose(base.mel, rem.mel, atol=1e-6)

    def test_dropout_path_runs_and_trains(self):
        """With dropout active the two paths differ stochastically but the
        hoisted path must train: loss decreases over a few steps."""
        from tacotron_tpu.train.step import create_train_state, make_train_step

        cfg = get_config("tiny_cpu")
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, vocab_size=32,
                                           tf_decoder="hoisted"))
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg)
        rs = np.random.default_rng(1)
        mcfg = cfg.model
        b, t_in, n_steps = 4, 12, 4
        text = jnp.asarray(rs.integers(1, 30, (b, t_in)), jnp.int32)
        tlen = jnp.full((b,), t_in, jnp.int32)
        mel = jnp.asarray(rs.random((b, n_steps * mcfg.r, mcfg.n_mels), np.float32))
        lin = jnp.asarray(rs.random((b, n_steps * mcfg.r, mcfg.n_freq), np.float32))
        flen = jnp.full((b,), n_steps * mcfg.r, jnp.int32)
        losses = []
        for _ in range(6):
            state, m, _ = step(state, text, tlen, mel, lin, flen)
            losses.append(float(m["total_loss"]))
        assert losses[-1] < losses[0]
        assert np.all(np.isfinite(losses))

    def test_bf16_compute(self, setup):
        mcfg, variables, batch = setup
        out = _apply(dataclasses.replace(mcfg, tf_decoder="hoisted",
                                         compute_dtype="bfloat16"),
                     variables, batch)
        assert out.mel.dtype == jnp.float32
        assert np.all(np.isfinite(out.mel))
