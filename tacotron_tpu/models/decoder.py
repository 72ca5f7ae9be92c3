"""Attention decoder: r mel frames per step, teacher-forced or feed-previous.

Rebuild of the reference's decoder (SURVEY.md §2.1 #10 [R]; paper §3.2): per
step, prenet(previous r-th frame) feeds a 256-unit attention GRU wrapped with
Bahdanau attention; [attention-RNN output, context] is projected to 256 and
passed through 2 residual GRUs of 256; a final Dense emits r*80 mels. The TF1
realization was `tf.contrib.seq2seq.AttentionWrapper` + `OutputProjectionWrapper`
+ `ResidualWrapper` cells under dynamic_rnn/raw_rnn while_loops with a custom
feed-previous helper [R]; here BOTH modes are the same `nn.scan`-lifted cell —
teacher forcing scans over ground-truth frames, inference carries the last
predicted frame in the scan state. No stop token: inference runs a fixed
number of steps (paper §3.2).

TPU notes: the attention memory keys (W_m @ memory) are computed ONCE in the
Tacotron top module and enter the scan as a broadcast constant, so the per-step
work is only small matmuls over the carried state — the target of the fused
Pallas decode-step kernel (BASELINE.json:5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tacotron_tpu.config import ModelConfig
from tacotron_tpu.ops.attention import BahdanauAttention
from tacotron_tpu.ops.gru import GRUCell
from tacotron_tpu.ops.modules import Prenet


class DecoderState(NamedTuple):
    h_att: jax.Array                 # attention GRU state (B, attention_gru_dim)
    h_dec: tuple                     # decoder GRU states, each (B, decoder_gru_dim)
    context: jax.Array               # previous attention context (B, memory_dim)
    prev_frame: jax.Array            # last emitted mel frame (B, n_mels)


class DecoderCell(nn.Module):
    """One decode step. Shared by teacher-forced and autoregressive scans."""

    cfg: ModelConfig
    feed_previous: bool

    @nn.compact
    def __call__(self, state: DecoderState, frame_in, keys, memory, mask):
        cfg = self.cfg
        pdtype = jnp.dtype(cfg.param_dtype)
        cdtype = cfg.cdtype

        # Input frame: ground truth (teacher forcing) or last prediction.
        x = state.prev_frame if self.feed_previous else frame_in
        x = Prenet(cfg.prenet_dims, cfg.prenet_dropout, deterministic=False,
                   param_dtype=pdtype, dtype=cdtype, name="prenet")(x)

        # Attention RNN: input = [prenet_out, previous context]
        h_att, _ = GRUCell(cfg.attention_gru_dim, pdtype, dtype=cdtype,
                           name="attention_gru")(
            state.h_att, jnp.concatenate([x, state.context.astype(x.dtype)], axis=-1)
        )
        # keys were precomputed outside the scan (memory_proj in Tacotron).
        context, alignment = BahdanauAttention(
            cfg.attention_dim, pdtype, dtype=cdtype, name="attention"
        )(h_att, keys, memory, mask)

        # [attention RNN output, context] -> 256 (reference:
        # OutputProjectionWrapper over the concat cell [R])
        h = nn.Dense(cfg.decoder_gru_dim, name="decoder_input_proj",
                     param_dtype=pdtype, dtype=cdtype)(
            jnp.concatenate([h_att, context], axis=-1)
        ).astype(jnp.float32)

        # 2-layer residual GRU stack (paper Table 1)
        new_h_dec = []
        for i, h_prev in enumerate(state.h_dec):
            h_i, _ = GRUCell(cfg.decoder_gru_dim, pdtype, dtype=cdtype,
                             name=f"decoder_gru{i}")(
                h_prev, h
            )
            h = h + h_i  # residual connection
            new_h_dec.append(h_i)

        # Emit r frames at once (paper §3.2 reduction trick)
        frames = nn.Dense(cfg.r * cfg.n_mels, name="frame_proj",
                          param_dtype=pdtype, dtype=cdtype)(h).astype(jnp.float32)  # (B, r*n_mels)
        last_frame = frames[:, (cfg.r - 1) * cfg.n_mels :]

        new_state = DecoderState(h_att, tuple(new_h_dec), context, last_frame)
        return new_state, (frames, alignment)


class Decoder(nn.Module):
    """Scan DecoderCell over decoder steps.

    Teacher-forced: ``__call__(memory, keys, mask, gt_frames)`` — the input at
    step t is the last ground-truth frame of group t-1 (zero "go" frame at
    t=0).  Autoregressive: ``decode(memory, keys, mask, n_steps)``.
    Both return (mel (B, n_steps*r, n_mels), alignments (B, n_steps, T_in)).
    """

    cfg: ModelConfig

    def _init_state(self, batch, dtype):
        cfg = self.cfg
        return DecoderState(
            h_att=jnp.zeros((batch, cfg.attention_gru_dim), dtype),
            h_dec=tuple(
                jnp.zeros((batch, cfg.decoder_gru_dim), dtype)
                for _ in range(cfg.decoder_depth)
            ),
            context=jnp.zeros((batch, cfg.memory_dim), dtype),
            prev_frame=jnp.zeros((batch, cfg.n_mels), dtype),
        )

    @nn.compact
    def __call__(self, memory, keys, mask, gt_frames=None, n_steps=None):
        """Teacher-forced when ``gt_frames`` is given, else autoregressive for
        ``n_steps``. (One compact method: both modes share the cell params.)"""
        cfg = self.cfg
        b = memory.shape[0]
        feed_previous = gt_frames is None

        if feed_previous:
            assert n_steps is not None
            frames_in = None
            frame_axis = nn.broadcast
            length = n_steps
        else:
            t_out = gt_frames.shape[1]
            assert t_out % cfg.r == 0, "T_out must be padded to a multiple of r"
            n_steps = t_out // cfg.r
            # Input at step t: last (r-th) ground-truth frame of group t-1.
            last_of_group = gt_frames[:, cfg.r - 1 :: cfg.r, :]  # (B, n_steps, n_mels)
            shifted = jnp.concatenate(
                [jnp.zeros_like(last_of_group[:, :1]), last_of_group[:, :-1]], axis=1
            )
            frames_in = shifted.swapaxes(0, 1)  # (n_steps, B, n_mels)
            frame_axis = 0
            length = None

        cell_cls = DecoderCell
        if cfg.remat_decoder:
            # recompute the cell in backward instead of storing per-step
            # activations (SURVEY.md §7.3 item 5)
            cell_cls = nn.remat(DecoderCell, prevent_cse=False)
        cell = nn.scan(
            cell_cls,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=(frame_axis, nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
            length=length,
        )(self.cfg, feed_previous=feed_previous, name="cell")
        state = self._init_state(b, memory.dtype)
        _, (frames, alignments) = cell(state, frames_in, keys, memory, mask)

        # frames: (n_steps, B, r*n_mels) -> (B, n_steps*r, n_mels)
        mel = frames.swapaxes(0, 1).reshape(b, n_steps * cfg.r, cfg.n_mels)
        return mel, alignments.swapaxes(0, 1)
