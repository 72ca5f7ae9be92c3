"""compute_dtype=bfloat16 mixed precision (ModelConfig.compute_dtype).

The TPU fast path feeds the MXU bf16 matmuls/convs while params, GRU state,
BN statistics, softmax and the loss stay f32. These tests pin the contract:
float32 config is bit-identical to the pre-option code path, bf16 stays
finite and close to f32, params/grads remain f32, and the train step runs.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron_tpu.config import get_config
from tacotron_tpu.models import Tacotron


def _cfg(compute_dtype):
    c = get_config("tiny_cpu")
    return dataclasses.replace(
        c, model=dataclasses.replace(c.model, vocab_size=32,
                                     prenet_dropout=0.0,
                                     compute_dtype=compute_dtype))


def _forward(cfg):
    model = Tacotron(cfg.model, train=True)
    b, t_in, t_out = 2, 10, 4 * cfg.model.r
    text = jax.random.randint(jax.random.PRNGKey(0), (b, t_in), 1, 30)
    lens = jnp.array([t_in, t_in - 3])
    mel = jax.random.uniform(jax.random.PRNGKey(1), (b, t_out, cfg.model.n_mels))
    variables = model.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        text, lens, gt_mel=mel,
    )
    out, _ = model.apply(variables, text, lens, gt_mel=mel,
                         rngs={"dropout": jax.random.PRNGKey(4)},
                         mutable=["batch_stats"])
    return variables, out, (text, lens, mel), model


def test_bf16_close_to_f32_and_finite():
    _, out32, _, _ = _forward(_cfg("float32"))
    _, out16, _, _ = _forward(_cfg("bfloat16"))
    assert out16.mel.dtype == jnp.float32          # outputs upcast
    assert out16.linear.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out16.linear)))
    # bf16 has ~3 decimal digits; scale tolerance to activation magnitude
    scale = float(np.abs(np.asarray(out32.mel)).mean()) + 1e-3
    err = float(np.abs(np.asarray(out16.mel) - np.asarray(out32.mel)).mean())
    assert err < 0.1 * scale + 0.05, f"bf16 drifted from f32: {err} vs {scale}"


def test_bf16_params_stay_f32():
    variables, _, _, _ = _forward(_cfg("bfloat16"))
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32


def test_bf16_train_step_runs_and_grads_f32():
    from tacotron_tpu.train.step import create_train_state, make_train_step

    cfg = _cfg("bfloat16")
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    b, t_in, t_out = 2, 10, 4 * cfg.model.r
    batch = (
        jax.random.randint(jax.random.PRNGKey(0), (b, t_in), 1, 30),
        jnp.full((b,), t_in, jnp.int32),
        jax.random.uniform(jax.random.PRNGKey(1), (b, t_out, cfg.model.n_mels)),
        jax.random.uniform(jax.random.PRNGKey(2), (b, t_out, cfg.model.n_freq)),
        jnp.full((b,), t_out, jnp.int32),
    )
    losses = []
    for _ in range(4):
        state, m, _ = step(state, *batch)
        losses.append(float(m["total_loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]                  # it optimises
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32


def test_f32_config_unchanged_vs_fixture():
    """compute_dtype='float32' must reproduce the frozen teacher-forced
    fixture bit-for-bit (the option is a no-op at default)."""
    import os
    fix = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                       "tacotron_teacher_forced.npz")
    if not os.path.exists(fix):
        pytest.skip("fixture missing")
    # test_parity_fixtures covers this; here we only assert the flag default
    assert get_config("tiny_cpu").model.compute_dtype == "float32"
