"""Post-processing net: mel -> CBHG(K=8) -> Dense(1025) linear spectrogram.

Rebuild of the reference's post-net (SURVEY.md §2.1 #11 [R]; paper §3.3,
Table 1). Sees the full ungrouped mel sequence (non-causal by design — the
whole point of post-processing after the autoregressive decoder, paper §3.3).
The final 1025-wide projection is the widest matmul in the model and the one
that would shard over the `model` mesh axis if ever needed (SURVEY.md §2.3).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from tacotron_tpu.config import ModelConfig
from tacotron_tpu.ops.cbhg import CBHG


class PostNet(nn.Module):
    cfg: ModelConfig
    train: bool

    @nn.compact
    def __call__(self, mel, lengths=None):
        cfg = self.cfg
        pdtype = jnp.dtype(cfg.param_dtype)
        h = CBHG(
            k=cfg.postnet_bank_k,
            bank_channels=cfg.postnet_bank_channels,
            proj_dims=cfg.postnet_proj_dims,
            highway_layers=cfg.highway_layers,
            highway_dim=cfg.highway_dim,
            gru_dim=cfg.gru_dim,
            train=self.train,
            param_dtype=pdtype,
            bank_groups=cfg.bank_groups,
            dtype=cfg.cdtype,
            gru_unroll=cfg.gru_scan_unroll,
            name="cbhg",
        )(mel, lengths=lengths)
        return nn.Dense(cfg.n_freq, name="linear_proj", param_dtype=pdtype,
                        dtype=cfg.cdtype)(h).astype(jnp.float32)
