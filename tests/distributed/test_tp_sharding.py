"""TP (model-axis) sharding path: 4x2 mesh on 8 fake devices (SURVEY.md §2.3)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tacotron_tpu.config import MeshConfig, get_config
from tacotron_tpu.parallel import make_mesh, shard_batch
from tacotron_tpu.parallel.sharding import tree_shardings
from tacotron_tpu.train.step import create_train_state, make_train_step


@pytest.fixture(scope="module")
def cfg():
    c = get_config("tiny_cpu")
    return dataclasses.replace(
        c,
        model=dataclasses.replace(c.model, vocab_size=32, n_freq=260),  # 260 % 2 == 0
        mesh=MeshConfig(model_parallel_size=2),
        train=dataclasses.replace(c.train, batch_size=8),
    )


def test_rules_shard_wide_projection(cfg):
    mesh = make_mesh(cfg.mesh)
    assert mesh.shape == {"data": 4, "model": 2}
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    sh = tree_shardings(state, mesh, cfg.mesh)
    lin = sh.params["postnet"]["linear_proj"]["kernel"]
    assert lin.spec == P(None, "model")
    emb = sh.params["encoder"]["embed"]["embedding"]
    assert emb.spec == P("model", None)
    # a GRU kernel stays replicated
    assert sh.params["decoder"]["cell"]["attention_gru"]["gates"]["kernel"].spec == P()


def test_tp_train_step_runs(cfg):
    mesh = make_mesh(cfg.mesh)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, mesh, state_template=state)

    b, t_in, t_out = cfg.train.batch_size, 16, 4 * cfg.model.r
    batch = (
        jnp.ones((b, t_in), jnp.int32),
        jnp.full((b,), t_in, jnp.int32),
        jnp.zeros((b, t_out, cfg.model.n_mels)),
        jnp.zeros((b, t_out, cfg.model.n_freq)),
        jnp.full((b,), t_out, jnp.int32),
    )
    with mesh:
        batch = shard_batch(batch, mesh, cfg.mesh)
        state, metrics, _ = step_fn(state, *batch)
        state, metrics, _ = step_fn(state, *batch)
    assert np.isfinite(float(metrics["total_loss"]))
    # the wide projection is actually materialised sharded over model axis
    lin = state.params["postnet"]["linear_proj"]["kernel"]
    assert lin.sharding.spec == P(None, "model")
    assert int(state.step) == 2


def test_tp_sharded_checkpoint_roundtrip(cfg, tmp_path):
    """checkpoint.save must assemble TP-sharded leaves to full host arrays and
    restore must load them back bit-identically (VERDICT r1 weak #10)."""
    from tacotron_tpu.train import checkpoint

    mesh = make_mesh(cfg.mesh)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    shardings = tree_shardings(state, mesh, cfg.mesh)
    with mesh:
        sharded = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), state, shardings)
    lin = sharded.params["postnet"]["linear_proj"]["kernel"]
    assert lin.sharding.spec == P(None, "model")  # actually sharded input

    d = str(tmp_path / "ckpt")
    checkpoint.save(d, 3, sharded)
    restored, step = checkpoint.restore(d, state)
    assert step == 3
    want = jax.tree_util.tree_leaves(state)
    got = jax.tree_util.tree_leaves(restored)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
