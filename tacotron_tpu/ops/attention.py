"""Bahdanau (additive, content-based) attention.

TPU-native replacement for ``tf.contrib.seq2seq.BahdanauAttention`` +
``AttentionWrapper`` (SURVEY.md §2.1 #9 [R]). Non-normalised variant:

    score(q, m_j) = v^T tanh(W_q q + W_m m_j)
    alpha = softmax(score) over encoder time (masked to text length)
    context = sum_j alpha_j m_j

The memory projection ``W_m m`` is computed ONCE per utterance (outside the
decode scan) and carried — the per-step work is one small matmul + masked
softmax + weighted sum, which is what the fused Pallas decode-step kernel
targets (BASELINE.json:5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9


class BahdanauAttention(nn.Module):
    dim: int = 256
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype | None = None    # projection dtype; scores/softmax f32
    energy: str = "xla"               # "xla" | "fused" (Pallas attn_energy
                                      # kernel on TPU; falls back off-TPU)

    def setup(self):
        self.query_proj = nn.Dense(self.dim, use_bias=False, name="query",
                                   param_dtype=self.param_dtype,
                                   dtype=self.dtype)
        self.memory_proj = nn.Dense(self.dim, use_bias=False, name="memory",
                                    param_dtype=self.param_dtype,
                                    dtype=self.dtype)
        self.v = self.param("v", nn.initializers.lecun_normal(), (self.dim, 1),
                            self.param_dtype)

    def full_step(self, query, memory, mask=None):
        """process_memory + one attention step in one call — used to init all
        params and as the unfused reference path in tests."""
        keys = self.process_memory(memory)
        return self(query, keys, memory, mask)

    def process_memory(self, memory):
        """(B, T_in, D_mem) -> keys (B, T_in, dim). Hoisted out of the scan."""
        return self.memory_proj(memory)

    def __call__(self, query, keys, memory, mask=None):
        """One attention step.

        query: (B, D_q) decoder state; keys: processed memory (B, T_in, dim);
        memory: (B, T_in, D_mem); mask: (B, T_in) bool, True = valid.
        Returns (context (B, D_mem), alignment (B, T_in)).
        """
        q = self.query_proj(query)                        # (B, dim)
        if self.energy == "fused":
            from tacotron_tpu.ops.pallas.attn_energy import attention_energy

            scores = attention_energy(keys, q, self.v)    # (B, T_in) f32
        else:
            scores = jnp.squeeze(
                jnp.tanh(keys + q[:, None, :]).astype(jnp.float32) @ self.v,
                -1)
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        alignment = jax.nn.softmax(scores, axis=-1)
        context = jnp.einsum("bt,btd->bd", alignment,
                             memory.astype(jnp.float32))
        return context, alignment
