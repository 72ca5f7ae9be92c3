"""Fused Bahdanau attention-energy kernel vs the XLA formula (interpret).

SURVEY.md §4.3: every Pallas kernel gets an interpret=True CPU test against
its XLA reference — forward AND the custom VJP, including under the exact
machinery the hoisted decoder uses it in (lax.scan body wrapped in
jax.checkpoint, keys entering as a scan constant).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron_tpu.ops.pallas.attn_energy import (
    attention_energy,
    attention_energy_reference,
)


def _inputs(b, t, a, dtype, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    keys = jax.random.normal(k1, (b, t, a), jnp.float32).astype(dtype)
    q = jax.random.normal(k2, (b, a), jnp.float32).astype(dtype)
    v = jax.random.normal(k3, (a, 1), jnp.float32) * 0.3
    return keys, q, v


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("b,t,a", [(4, 16, 256), (6, 37, 256), (8, 128, 128)])
def test_forward_matches_reference(dtype, b, t, a):
    keys, q, v = _inputs(b, t, a, dtype)
    got = attention_energy(keys, q, v, backend="pallas", interpret=True)
    want = attention_energy_reference(keys, q, v)
    assert got.dtype == jnp.float32
    # f32: the kernel's lane reduce vs the reference's matmul differ only
    # in summation order
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grads_match_reference(dtype):
    keys, q, v = _inputs(4, 37, 256, dtype, seed=1)
    co = jax.random.normal(jax.random.PRNGKey(5), (4, 37), jnp.float32)

    def loss(fn):
        return lambda k, qq, vv: jnp.sum(fn(k, qq, vv) * co)

    fused = jax.grad(
        loss(lambda k, qq, vv: attention_energy(
            k, qq, vv, backend="pallas", interpret=True)),
        argnums=(0, 1, 2))(keys, q, v)
    ref = jax.grad(loss(attention_energy_reference),
                   argnums=(0, 1, 2))(keys, q, v)
    tol = 1e-5 if dtype == jnp.float32 else 4e-2
    for g, r, name in zip(fused, ref, ("dkeys", "dq", "dv")):
        assert g.dtype == r.dtype, name
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=tol, atol=tol, err_msg=name)


def test_auto_backend_falls_back_on_cpu():
    # conftest pins the suite to CPU, so "auto" must take the XLA path and
    # produce bit-identical results (this is what keeps model configs with
    # attention_energy="fused" runnable in CPU tests and the CPU dryrun).
    keys, q, v = _inputs(4, 16, 128, jnp.float32)
    got = attention_energy(keys, q, v, backend="auto")
    want = attention_energy_reference(keys, q, v)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_under_scan_and_checkpoint():
    """The op exactly as the hoisted decoder uses it: inside a jax.checkpoint
    scan body with keys as a closed-over constant, gradient taken through
    the whole scan (dkeys accumulates across steps)."""
    b, t, a, steps = 4, 24, 128, 5
    keys, q0, v = _inputs(b, t, a, jnp.float32, seed=2)
    w = jax.random.normal(jax.random.PRNGKey(7), (t, a), jnp.float32) * 0.1

    def make_loss(energy_fn):
        def loss(keys, q0, v):
            def step(q, _):
                e = energy_fn(keys, q, v)           # (b, t) f32
                q = jnp.tanh(e @ w)                 # feed energies back
                return q, jnp.sum(e)
            step = jax.checkpoint(step, prevent_cse=False)
            _, es = jax.lax.scan(step, q0, None, length=steps)
            return jnp.sum(es)
        return loss

    fused = jax.grad(make_loss(
        lambda k, qq, vv: attention_energy(
            k, qq, vv, backend="pallas", interpret=True)),
        argnums=(0, 1, 2))(keys, q0, v)
    ref = jax.grad(make_loss(attention_energy_reference),
                   argnums=(0, 1, 2))(keys, q0, v)
    for g, r, name in zip(fused, ref, ("dkeys", "dq0", "dv")):
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-5, err_msg=name)


def test_hoisted_decoder_fused_config_cpu():
    """model.attention_energy="fused" on CPU = the XLA path (auto fallback):
    the full hoisted teacher-forced decoder must produce identical loss and
    grads to the default config."""
    import dataclasses

    from tacotron_tpu.config import get_config
    from tacotron_tpu.models import Tacotron

    base = dataclasses.replace(
        get_config("tiny_cpu").model, tf_decoder="hoisted",
        prenet_dropout=0.0, vocab_size=32)
    b, t_in, t_out = 2, 9, 4 * base.r
    text = jax.random.randint(jax.random.PRNGKey(0), (b, t_in), 1, 30)
    lengths = jnp.array([t_in, t_in - 3])
    mel = jax.random.uniform(jax.random.PRNGKey(1), (b, t_out, base.n_mels))

    def run(cfg):
        model = Tacotron(cfg, train=True)
        variables = model.init(
            {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
            text, lengths, gt_mel=mel)

        def loss(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                text, lengths, gt_mel=mel,
                rngs={"dropout": jax.random.PRNGKey(4)},
                mutable=["batch_stats"])
            return jnp.mean(jnp.abs(out.mel - mel))

        val, grads = jax.value_and_grad(loss)(variables["params"])
        return val, grads

    v_xla, g_xla = run(base)
    v_fused, g_fused = run(dataclasses.replace(base, attention_energy="fused"))
    assert float(v_xla) == float(v_fused)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        g_xla, g_fused)
