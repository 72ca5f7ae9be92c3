"""The jitted training step: fwd/bwd/update as ONE device computation.

The reference's step was one `sess.run(train_op)` over a TF1 graph with queue
dequeue + GPU transfer per step (SURVEY.md §3.2 [R]). Here the entire step —
teacher-forced forward (decoder as lax.scan), L1 losses, backward, Adam
update — is a single jit with donated state, compiled per bucket shape.
Data parallelism comes from GSPMD: the batch is sharded over the mesh's
`data` axis and gradient psum over ICI is emitted by the partitioner
(SURVEY.md §2.3/§5.8); cross-replica batch-norm falls out of global-batch
moments under jit (SURVEY.md §7.3 item 4).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tacotron_tpu.config import Config
from tacotron_tpu.models import Tacotron
from tacotron_tpu.train.loss import tacotron_loss
from tacotron_tpu.train.schedule import make_optimizer


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array


def create_train_state(cfg: Config, rng: jax.Array,
                       sample_text_len: int = 16,
                       sample_frames: int | None = None) -> TrainState:
    """Initialise params with a tiny sample shape (shapes don't affect params)."""
    model = Tacotron(cfg.model, train=True)
    sample_frames = sample_frames or (2 * cfg.model.r)
    p_rng, d_rng, s_rng = jax.random.split(rng, 3)
    text = jnp.ones((1, sample_text_len), jnp.int32)
    mel = jnp.zeros((1, sample_frames, cfg.model.n_mels))
    variables = model.init({"params": p_rng, "dropout": d_rng},
                           text, jnp.array([sample_text_len]), gt_mel=mel)
    tx = make_optimizer(cfg.train)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        rng=s_rng,
    )


def train_step(state: TrainState, text, text_len, mel_gt, linear_gt, frame_len,
               *, cfg: Config):
    """One teacher-forced fwd/bwd/update. Pure; jit-wrapped by make_train_step."""
    # Feature targets arrive in the loader's wire dtype (f16 by default — the
    # packed dataset is f16, so shipping f16 over PCIe and casting here is
    # bit-identical at half the transfer bytes); model + loss compute in f32.
    mel_gt = mel_gt.astype(jnp.float32)
    linear_gt = linear_gt.astype(jnp.float32)
    model = Tacotron(cfg.model, train=True)
    tx = make_optimizer(cfg.train)
    rng, dropout_rng = jax.random.split(state.rng)

    def loss_fn(params):
        out, updates = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            text, text_len, gt_mel=mel_gt,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        total, metrics = tacotron_loss(
            out.mel, out.linear, mel_gt, linear_gt, frame_len,
            mask_padding=cfg.train.mask_padding,
            linear_weight=cfg.train.loss_linear_weight,
        )
        return total, (metrics, updates["batch_stats"], out.alignments)

    grads, (metrics, new_bs, alignments) = jax.grad(loss_fn, has_aux=True)(state.params)
    metrics["grad_norm"] = optax.global_norm(grads)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(new_params, new_bs, new_opt, state.step + 1, rng)
    return new_state, metrics, alignments


def make_train_step(cfg: Config, mesh: Mesh | None = None,
                    state_template: TrainState | None = None):
    """jit train_step with donated state and DP(+TP) shardings over the mesh.

    With model_parallel_size > 1 the TP sharding rules (parallel/sharding.py)
    are applied to the state pytree; the template they need is derived via
    ``jax.eval_shape`` when the caller does not pass one (so TP is never
    silently skipped — previously a caller omitting ``state_template``
    trained fully replicated while believing TP was active).
    """
    fn = partial(train_step, cfg=cfg)
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(cfg.mesh.data_axis))
    if cfg.mesh.model_parallel_size > 1:
        from tacotron_tpu.parallel.sharding import tree_shardings

        if state_template is None:
            state_template = jax.eval_shape(
                lambda: create_train_state(cfg, jax.random.PRNGKey(0)))
        state_sh = tree_shardings(state_template, mesh, cfg.mesh)
    else:
        state_sh = jax.tree_util.tree_map(lambda _: repl, state_template) \
            if state_template is not None else repl
    return jax.jit(
        fn,
        donate_argnums=(0,),
        in_shardings=(state_sh, data, data, data, data, data),
        out_shardings=(state_sh, repl, data),
    )
