"""L1 losses: mel + linear, equal weight (paper §3.3; SURVEY.md §2.1 #12).

The paper trains on zero-padded frames WITHOUT masking; the masked variant is
exposed behind ``mask_padding`` because the choice is a must-verify reference
detail (SURVEY.md #12) and changes loss-curve calibration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tacotron_loss(mel_pred, linear_pred, mel_gt, linear_gt, frame_len=None,
                  mask_padding: bool = False, linear_weight: float = 1.0):
    """Returns (total, {mel_loss, linear_loss})."""
    if mask_padding and frame_len is not None:
        t = mel_pred.shape[1]
        mask = (jnp.arange(t)[None, :] < frame_len[:, None]).astype(mel_pred.dtype)
        denom = jnp.maximum(mask.sum(), 1.0)
        mel_l1 = (jnp.abs(mel_pred - mel_gt).mean(-1) * mask).sum() / denom
        lin_l1 = (jnp.abs(linear_pred - linear_gt).mean(-1) * mask).sum() / denom
    else:
        mel_l1 = jnp.mean(jnp.abs(mel_pred - mel_gt))
        lin_l1 = jnp.mean(jnp.abs(linear_pred - linear_gt))
    total = mel_l1 + linear_weight * lin_l1
    return total, {"mel_loss": mel_l1, "linear_loss": lin_l1, "total_loss": total}
