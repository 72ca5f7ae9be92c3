"""CBHG: Conv Bank + Highway + bidirectional GRU (paper §3.1, Table 1).

Rebuild of the reference's ``cbhg`` graph fn (SURVEY.md §2.1 #7 [R]):
conv bank(1..K) -> max-pool (width 2, stride 1) -> width-3 conv projections
(ReLU then linear, batch-normed) -> residual add with the input -> highway x4
-> biGRU. Used with K=16/proj(128,128) in the encoder and K=8/proj(256,80) in
the post-net.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from tacotron_tpu.ops.gru import bidirectional_gru
from tacotron_tpu.ops.modules import ConvBank, Conv1dProjection, HighwayStack


class CBHG(nn.Module):
    k: int
    bank_channels: int
    proj_dims: Sequence[int]
    highway_layers: int
    highway_dim: int
    gru_dim: int
    train: bool
    param_dtype: jnp.dtype = jnp.float32
    bank_groups: int = 1              # packed conv-bank width groups
    dtype: jnp.dtype | None = None    # matmul/conv computation dtype
    gru_unroll: int = 1               # lax.scan unroll for the biGRU

    @nn.compact
    def __call__(self, x, lengths=None):
        # x: (B, T, C_in); returns (B, T, 2*gru_dim)
        residual = x
        h = ConvBank(self.k, self.bank_channels, self.train,
                     self.param_dtype, groups=self.bank_groups,
                     dtype=self.dtype, name="bank")(x)
        # Max pool width 2, stride 1, SAME. Keep nn.max_pool (reduce_window +
        # select-and-scatter backward): the r5 device trace prices the
        # select-and-scatter at 3.1 ms/step, but the "cheaper" rewrite as
        # max(h, shift_left(h)) MEASURED 6% SLOWER end-to-end (1.242M vs
        # 1.327M frames/s/chip at pod_dp+gru_scan_unroll=4; 1.203M vs 1.282M
        # at unroll 1, interleaved same-day cells) — the shifted-concat
        # copies of the (B, T, K*128) bank tensor and the unfused
        # where-select backward cost more than select-and-scatter saved.
        h = nn.max_pool(h, window_shape=(2,), strides=(1,), padding="SAME")
        h = Conv1dProjection(tuple(self.proj_dims), self.train,
                             param_dtype=self.param_dtype, dtype=self.dtype,
                             name="proj")(h)
        h = h + residual.astype(h.dtype)  # proj_dims[-1] must equal C_in
        h = HighwayStack(self.highway_layers, self.highway_dim,
                         self.param_dtype, dtype=self.dtype, name="highway")(h)
        return bidirectional_gru(self.gru_dim, self.param_dtype,
                                 dtype=self.dtype, unroll=self.gru_unroll,
                                 name="bigru")(
            h, lengths=lengths
        )
