"""Tacotron assembly: encoder + attention decoder + post-net.

Rebuild of the reference's models/tacotron.py `Tacotron` (SURVEY.md §2.1
#8-#11 [R]). The TF1 original builds two different graphs (teacher-forced
train graph vs feed-previous inference graph) tied together by variable-name
scoping (SURVEY.md §3.5); here both modes are the same parameter pytree and
one pure apply function with a mode switch — no naming contract.

Shapes (SURVEY.md §3.4): text (B,T_in) -> memory (B,T_in,256) ->
mel (B,T_out,80) -> linear (B,T_out,1025).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tacotron_tpu.config import ModelConfig
from tacotron_tpu.models.decoder import Decoder
from tacotron_tpu.models.encoder import Encoder
from tacotron_tpu.models.postnet import PostNet


class TacotronOutput(NamedTuple):
    mel: jax.Array         # (B, T_out, n_mels)
    linear: jax.Array      # (B, T_out, n_freq)
    alignments: jax.Array  # (B, T_out/r, T_in)


class Tacotron(nn.Module):
    cfg: ModelConfig
    train: bool

    @nn.compact
    def __call__(self, text_ids, text_lengths=None, gt_mel=None,
                 n_steps: int | None = None) -> TacotronOutput:
        """Teacher-forced when ``gt_mel`` is given; else autoregressive decode
        of ``n_steps`` (default cfg.max_decode_steps) decoder steps."""
        cfg = self.cfg
        pdtype = jnp.dtype(cfg.param_dtype)

        mask = None
        if text_lengths is not None:
            mask = jnp.arange(text_ids.shape[1])[None, :] < text_lengths[:, None]

        memory = Encoder(cfg, self.train, name="encoder")(text_ids, text_lengths)
        # Attention keys hoisted out of the decode scan (SURVEY.md §3.3):
        # one (B,T_in,memory_dim)x(memory_dim,attention_dim) matmul per batch.
        keys = nn.Dense(cfg.attention_dim, use_bias=False, name="memory_proj",
                        param_dtype=pdtype, dtype=cfg.cdtype)(memory)

        if gt_mel is None and n_steps is None:
            n_steps = cfg.max_decode_steps
        mel, alignments = Decoder(cfg, name="decoder")(
            memory, keys, mask, gt_frames=gt_mel, n_steps=n_steps
        )
        linear = PostNet(cfg, self.train, name="postnet")(mel)
        return TacotronOutput(mel=mel, linear=linear, alignments=alignments)
