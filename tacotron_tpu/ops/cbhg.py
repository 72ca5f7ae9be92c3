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
        # Max pool width 2, stride 1, SAME — written as an elementwise max
        # of h and its left-shifted self (last step maxes with itself, the
        # identity for SAME's single right pad). Forward is bit-identical to
        # nn.max_pool (tests/unit/test_ops.py), but the backward lowers to
        # fused where-selects instead of XLA's select-and-scatter, which the
        # r5 device trace prices at 3.1 ms/step of the pod_dp recipe
        # (artifacts/trace/op_table.json).
        h = jnp.maximum(h, jnp.concatenate([h[:, 1:], h[:, -1:]], axis=1))
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
