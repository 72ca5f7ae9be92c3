"""Reusable Tacotron building blocks: prenet, conv bank, projections, highway.

TPU-native rebuild of the reference's ``models/ops.py`` (SURVEY.md §2.1 #4-#7
[R]). Convolutions use ``lax.conv_general_dilated`` via flax (NWC layout — the
channel-last layout XLA tiles best onto the MXU); the conv *bank* evaluates all
K kernel widths as ONE packed padded weight tensor — a single MXU conv instead
of K kernel launches. That packed-XLA formulation IS the TPU design here:
XLA fuses the bias+BN+ReLU epilogue into the conv, so there is no extra
memory traffic for a hand-written kernel to reclaim, and the measured
0.66 ms / 52 TFLOP/s (K=16 B32xT128; BASELINE.md kernel-efficiency row)
prices the op at ~6% of a decode-path step.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class Prenet(nn.Module):
    """FC-ReLU-dropout stack; dropout active at train AND inference
    (paper §3.2, Table 1; SURVEY.md #4). Reference: models/ops.py prenet [R]."""

    dims: Sequence[int] = (256, 128)
    dropout: float = 0.5
    deterministic: bool = False
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype | None = None    # computation dtype (bf16 fast path)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.relu(nn.Dense(d, name=f"fc{i}", param_dtype=self.param_dtype,
                                 dtype=self.dtype)(x))
            x = nn.Dropout(self.dropout, deterministic=self.deterministic,
                           name=f"drop{i}")(x)
        return x


class BatchNorm(nn.Module):
    """Batch norm over (batch, time) for NWC activations.

    Under jit+GSPMD the batch mean/var are computed over the *global* sharded
    batch, which is the cross-replica choice of SURVEY.md §7.3 item 4; no
    explicit axis_name is needed on the jit path.
    """

    train: bool
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=not self.train,
            momentum=0.99,
            epsilon=1e-3,
            param_dtype=self.param_dtype,
            name="bn",
        )(x)


def conv_bank_group_bounds(k: int, groups: int) -> list[tuple[int, int]]:
    """Contiguous width-range partition of the packed conv bank: group
    (lo, hi] is built as one width-hi conv with (hi-lo)*channels outputs.
    Shared with the roofline accounting (scripts/roofline_report.py)."""
    g = max(1, min(groups, k))
    bounds = [round(i * k / g) for i in range(g + 1)]
    return list(zip(bounds[:-1], bounds[1:]))


class ConvBank(nn.Module):
    """K parallel 1-D convs with widths 1..K, each ``channels`` wide, ReLU +
    batch-norm, stacked on the channel axis (paper Table 1; SURVEY.md #5).

    Per-branch BN matches the reference structure [R] (one BN per conv1d call).

    ``packed=True`` (default) evaluates ALL K branches as ONE width-K
    convolution with K*channels output channels: each branch's taps are
    placed at the offsets its own SAME padding implies, the rest are
    structural zeros. One big conv keeps the MXU busy with a single
    well-tiled contraction instead of K skinny ones (trades ~1.9x padded
    FLOPs for one pass over x; measured faster on TPU). Param layout is
    identical in all modes, so checkpoints are interchangeable.

    ``groups`` splits the packed conv into that many contiguous width ranges,
    each packed separately: group (lo, hi] is a width-hi conv with
    (hi-lo)*channels outputs. Structural-zero MACs fall from ~47% (K=16,
    one group) to ~22% at groups=4, at the cost of more (still wide) convs —
    the sweet spot is a TPU measurement (scripts/roofline_report.py A/Bs it).
    """

    k: int
    channels: int
    train: bool
    param_dtype: jnp.dtype = jnp.float32
    packed: bool = True
    groups: int = 1
    dtype: jnp.dtype | None = None    # conv computation dtype; BN stays f32

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C)
        c_in = x.shape[-1]
        if not self.packed:
            outs = []
            for width in range(1, self.k + 1):
                h = nn.Conv(
                    self.channels,
                    kernel_size=(width,),
                    padding="SAME",
                    use_bias=False,
                    name=f"conv{width}",
                    param_dtype=self.param_dtype,
                    dtype=self.dtype,
                )(x)
                h = BatchNorm(self.train, self.param_dtype,
                              name=f"bn{width}")(h.astype(jnp.float32))
                outs.append(nn.relu(h))
            return jnp.concatenate(outs, axis=-1)  # (B, T, K*channels)

        # Packed: same per-branch params, assembled into per-group
        # (hi, C, (hi-lo)*ch) kernels (one group == one (K, C, K*ch) kernel).
        # A width-W SAME conv computes y[t] = sum_i x[t - left_W + i] Wt[i];
        # branch w needs x[t - left_w + j] W_w[j], so tap j lands at
        # i = j + left_W - left_w (left_w = (w-1)//2 per flax SAME stride-1).
        # NOTE: no preferred_element_type on the convs — a f32-typed output
        # makes the conv VJP transpose mix f32 cotangents with bf16 weights
        # (TypeError). bf16 in/out still accumulates f32 on the MXU.
        cd = self.dtype or self.param_dtype
        x_c = x.astype(cd)
        spans = conv_bank_group_bounds(self.k, self.groups)
        ys = []
        for lo, hi in spans:
            left_hi = (hi - 1) // 2
            big = jnp.zeros((hi, c_in, (hi - lo) * self.channels),
                            self.param_dtype)
            for width in range(lo + 1, hi + 1):
                kern = self.param(
                    f"conv{width}",
                    lambda key, w=width: {"kernel":
                        nn.initializers.lecun_normal()(
                            key, (w, c_in, self.channels), self.param_dtype)},
                )["kernel"]
                off = left_hi - (width - 1) // 2
                col = (width - 1 - lo) * self.channels
                big = jax.lax.dynamic_update_slice(big, kern, (off, 0, col))
            ys.append(jax.lax.conv_general_dilated(
                x_c, big.astype(cd),
                window_strides=(1,), padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
            ))  # (B, T, (hi-lo)*channels), channels ordered by width
        y = ys[0] if len(spans) == 1 else jnp.concatenate(ys, axis=-1)
        # per-branch BN + ReLU on the packed output (same params as unpacked)
        outs = []
        for width in range(1, self.k + 1):
            h = y[..., (width - 1) * self.channels : width * self.channels]
            h = BatchNorm(self.train, self.param_dtype,
                          name=f"bn{width}")(h.astype(jnp.float32))
            outs.append(nn.relu(h))
        return jnp.concatenate(outs, axis=-1)


class Conv1dProjection(nn.Module):
    """Width-3 conv projections after the bank (SURVEY.md #7): first ReLU,
    second linear, each batch-normed."""

    dims: Sequence[int]
    train: bool
    activations: Sequence[Callable | None] = (nn.relu, None)
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        for i, (d, act) in enumerate(zip(self.dims, self.activations)):
            x = nn.Conv(d, kernel_size=(3,), padding="SAME", use_bias=False,
                        name=f"proj{i}", param_dtype=self.param_dtype,
                        dtype=self.dtype)(x)
            x = BatchNorm(self.train, self.param_dtype,
                          name=f"bn{i}")(x.astype(jnp.float32))
            if act is not None:
                x = act(x)
        return x


class HighwayStack(nn.Module):
    """N highway layers: H(x)*T(x) + x*(1-T(x)); gate bias init negative
    (paper Table 1; SURVEY.md #6). A Dense resize precedes the stack when the
    input width differs from ``dim`` (reference: highwaynet [R])."""

    layers: int = 4
    dim: int = 128
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] != self.dim:
            x = nn.Dense(self.dim, name="resize", param_dtype=self.param_dtype,
                         dtype=self.dtype)(x)
        for i in range(self.layers):
            h = nn.relu(nn.Dense(self.dim, name=f"H{i}", param_dtype=self.param_dtype,
                                 dtype=self.dtype)(x).astype(jnp.float32))
            t = jax.nn.sigmoid(
                nn.Dense(
                    self.dim,
                    name=f"T{i}",
                    bias_init=nn.initializers.constant(-1.0),
                    param_dtype=self.param_dtype,
                    dtype=self.dtype,
                )(x).astype(jnp.float32)
            )
            x = x.astype(jnp.float32)
            x = h * t + x * (1.0 - t)
        return x
