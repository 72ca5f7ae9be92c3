"""Optimizer + LR schedule (paper §3.3; SURVEY.md §2.1 #13).

Adam with piecewise-constant decay: 1e-3 -> 5e-4 @500k -> 3e-4 @1M -> 1e-4
@2M, global-norm gradient clipping (present in TF1-era Tacotrons [R],
config-gated).
"""

from __future__ import annotations

import optax

from tacotron_tpu.config import TrainConfig


def lr_schedule(cfg: TrainConfig):
    if len(cfg.lr_values) != len(cfg.lr_boundaries) + 1:
        raise ValueError(
            f"train.lr_values needs len(lr_boundaries)+1 entries: got "
            f"{len(cfg.lr_values)} values for {len(cfg.lr_boundaries)} "
            f"boundaries")
    # learning_rate is the base rate: overriding it scales the whole
    # piecewise schedule proportionally (at the default it equals
    # lr_values[0], giving exactly the paper schedule). Previously the field
    # was dead and --set train.learning_rate was silently ignored.
    scale = cfg.learning_rate / cfg.lr_values[0]
    values = [v * scale for v in cfg.lr_values]
    boundaries = {b: values[i + 1] / values[i]
                  for i, b in enumerate(cfg.lr_boundaries)}
    return optax.piecewise_constant_schedule(values[0], boundaries)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    tx = [optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps)]
    if cfg.grad_clip_norm is not None:
        tx.insert(0, optax.clip_by_global_norm(cfg.grad_clip_norm))
    tx.append(optax.scale_by_learning_rate(lr_schedule(cfg)))
    return optax.chain(*tx)
