"""Tacotron encoder: char embedding -> pre-net -> CBHG(K=16) -> memory.

Rebuild of the encoder section of the reference's models/tacotron.py
(SURVEY.md §2.1 #8 [R]; paper §3.1, Table 1). Output memory is
(B, T_in, 2*gru_dim) = (B, T_in, 256) at full size.

Embedding lookup uses jnp.take (gather); for the small Tacotron vocab this is
cheap — the MXU work is downstream in the conv bank and GRUs.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from tacotron_tpu.config import ModelConfig
from tacotron_tpu.ops.cbhg import CBHG
from tacotron_tpu.ops.modules import Prenet


class Encoder(nn.Module):
    cfg: ModelConfig
    train: bool

    @nn.compact
    def __call__(self, text_ids, text_lengths=None):
        cfg = self.cfg
        pdtype = jnp.dtype(cfg.param_dtype)
        cdtype = cfg.cdtype
        emb = nn.Embed(cfg.vocab_size, cfg.embed_dim, name="embed",
                       param_dtype=pdtype)(text_ids)  # (B, T_in, E)
        x = Prenet(cfg.prenet_dims, cfg.prenet_dropout,
                   deterministic=False,  # paper: dropout always on
                   param_dtype=pdtype, dtype=cdtype, name="prenet")(emb)
        memory = CBHG(
            k=cfg.encoder_bank_k,
            bank_channels=cfg.encoder_bank_channels,
            proj_dims=cfg.encoder_proj_dims,
            highway_layers=cfg.highway_layers,
            highway_dim=cfg.highway_dim,
            gru_dim=cfg.gru_dim,
            train=self.train,
            param_dtype=pdtype,
            bank_groups=cfg.bank_groups,
            dtype=cdtype,
            gru_unroll=cfg.gru_scan_unroll,
            name="cbhg",
        )(x, lengths=text_lengths)
        return memory  # (B, T_in, 2*gru_dim)
