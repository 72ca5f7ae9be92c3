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
import jax.ad_checkpoint
import jax.numpy as jnp
from flax import linen as nn

from tacotron_tpu.config import ModelConfig
from tacotron_tpu.ops.attention import NEG_INF, BahdanauAttention
from tacotron_tpu.ops.pallas.attn_energy import attention_energy
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
            cfg.attention_dim, pdtype, dtype=cdtype,
            energy=cfg.attention_energy, name="attention"
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


def _hoisted_teacher_forced(p, cfg: ModelConfig, frames_in, keys, memory,
                            mask, rng):
    """Teacher-forced decode on the raw ``cell`` param pytree with all
    state-independent work hoisted out of the scan (cfg.tf_decoder="hoisted").

    Same math and the same parameters as scanning DecoderCell, re-associated:

      * prenet over ALL steps: two (B*S, d) MXU matmuls + one dropout draw
        (teacher-forced inputs are known ahead of time — the scanned cell
        recomputes them step by step only because the autoregressive mode
        has to);
      * the prenet half of the attention-GRU gate/candidate matmuls is
        precomputed over all steps (the _ScanGRU hoisting trick applied to
        the attention GRU);
      * the r-frame output projection runs ONCE on the stacked per-step
        states after the scan (its output never feeds back in this mode).

    Per-step work drops from 13 small matmuls to 9, and the per-step dropout
    RNG folding disappears from the sequential chain entirely.

    frames_in: (B, S, n_mels) shifted last-of-group ground-truth frames.
    Returns (mel (B, S*r, n_mels), alignments (B, S, T_in)).
    """
    f32 = jnp.float32
    cd = cfg.cdtype or jnp.dtype(cfg.param_dtype)
    b, s, _ = frames_in.shape
    p1 = cfg.prenet_dims[-1]
    m_dim = cfg.memory_dim

    # ---- hoisted prenet: parallel over (B, S) ----
    x = frames_in
    for i in range(len(cfg.prenet_dims)):
        w = p["prenet"][f"fc{i}"]["kernel"].astype(cd)
        bias = p["prenet"][f"fc{i}"]["bias"].astype(cd)
        x = nn.relu(x.astype(cd) @ w + bias)
        if cfg.prenet_dropout > 0.0:
            rng, sub = jax.random.split(rng)
            keep = 1.0 - cfg.prenet_dropout
            keep_mask = jax.random.bernoulli(sub, keep, x.shape)
            x = jnp.where(keep_mask, x / keep, 0).astype(x.dtype)
    pre = x                                             # (B, S, p1)

    # ---- attention-GRU weights split at the [prenet | context | h] rows ----
    ag = p["attention_gru"]
    wg, bg = ag["gates"]["kernel"], ag["gates"]["bias"]
    wc, bc = ag["candidate"]["kernel"], ag["candidate"]["bias"]
    gx = (pre @ wg[:p1].astype(cd) + bg.astype(cd)).astype(f32)  # (B, S, 2d)
    cx = (pre @ wc[:p1].astype(cd) + bc.astype(cd)).astype(f32)  # (B, S, d)
    wg_ch = wg[p1:].astype(cd)                          # [context, h] rows
    wc_ch = wc[p1:].astype(cd)                          # [context, r*h] rows

    wq = p["attention"]["query"]["kernel"].astype(cd)
    v = p["attention"]["v"].astype(f32)                 # scores stay f32
    fused_energy = cfg.attention_energy == "fused"
    wp = p["decoder_input_proj"]["kernel"].astype(cd)
    bp = p["decoder_input_proj"]["bias"].astype(cd)
    wf = p["frame_proj"]["kernel"].astype(cd)
    bf = p["frame_proj"]["bias"].astype(cd)
    grus = tuple(
        (p[f"decoder_gru{i}"]["gates"]["kernel"].astype(cd),
         p[f"decoder_gru{i}"]["gates"]["bias"].astype(cd),
         p[f"decoder_gru{i}"]["candidate"]["kernel"].astype(cd),
         p[f"decoder_gru{i}"]["candidate"]["bias"].astype(cd))
        for i in range(cfg.decoder_depth)
    )
    keys_c = keys.astype(cd)
    mem_f = memory.astype(f32)

    def gru_step(h, xin, wg_i, bg_i, wc_i, bc_i):
        # TF1 semantics, fused [x, h] layout — identical to GRUCell
        xh = jnp.concatenate([xin, h], axis=-1).astype(cd)
        ru = jax.nn.sigmoid((xh @ wg_i + bg_i).astype(f32))
        r, u = jnp.split(ru, 2, axis=-1)
        xrh = jnp.concatenate([xin, r * h], axis=-1).astype(cd)
        c = jnp.tanh((xrh @ wc_i + bc_i).astype(f32))
        return u * h + (1.0 - u) * c

    def step(carry, inp):
        h_att, ctx, h_dec = carry
        gx_t, cx_t = inp
        # attention GRU on [context, h] (prenet half precomputed in gx/cx)
        ch = jnp.concatenate([ctx, h_att], axis=-1).astype(cd)
        ru = jax.nn.sigmoid(gx_t + (ch @ wg_ch).astype(f32))
        r, u = jnp.split(ru, 2, axis=-1)
        crh = jnp.concatenate([ctx, r * h_att], axis=-1).astype(cd)
        cand = jnp.tanh(cx_t + (crh @ wc_ch).astype(f32))
        h_att = u * h_att + (1.0 - u) * cand
        # Bahdanau step (ops/attention.py semantics)
        q = h_att.astype(cd) @ wq
        if fused_energy:
            scores = attention_energy(keys_c, q, v)
        else:
            e = jnp.tanh(keys_c + q[:, None, :])
            if cfg.remat_policy == "save_attn":
                # the name is what save_only_these_names targets; kept out
                # of the default path so "all" stays bit-identical to r4
                e = jax.ad_checkpoint.checkpoint_name(e, "attn_tanh")
            scores = jnp.squeeze(e.astype(f32) @ v, -1)
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        align = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bt,btd->bd", align, mem_f)
        # projection + residual GRU stack
        h = (jnp.concatenate([h_att, ctx], axis=-1).astype(cd) @ wp
             + bp).astype(f32)
        new_hd = []
        for (wg_i, bg_i, wc_i, bc_i), h_prev in zip(grus, h_dec):
            h_i = gru_step(h_prev, h, wg_i, bg_i, wc_i, bc_i)
            h = h + h_i
            new_hd.append(h_i)
        return (h_att, ctx, tuple(new_hd)), (h, align)

    if cfg.remat_decoder:
        if cfg.remat_policy == "save_attn":
            step = jax.checkpoint(
                step, prevent_cse=False,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_tanh"))
        else:
            step = jax.checkpoint(step, prevent_cse=False)

    carry0 = (
        jnp.zeros((b, cfg.attention_gru_dim), f32),
        jnp.zeros((b, m_dim), f32),
        tuple(jnp.zeros((b, cfg.decoder_gru_dim), f32)
              for _ in range(cfg.decoder_depth)),
    )
    _, (hs, aligns) = jax.lax.scan(
        step, carry0, (gx.swapaxes(0, 1), cx.swapaxes(0, 1)),
        unroll=cfg.scan_unroll)

    # ---- hoisted output projection: one (S*B, d) matmul after the scan ----
    frames = (hs.astype(cd) @ wf + bf).astype(f32)      # (S, B, r*n_mels)
    mel = frames.swapaxes(0, 1).reshape(b, s * cfg.r, cfg.n_mels)
    return mel, aligns.swapaxes(0, 1)


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
            if cfg.tf_decoder == "hoisted" and not self.is_initializing():
                # Raw-scan fast path on the SAME param pytree the scanned
                # cell owns (created at init through the cell path below).
                rng = (self.make_rng("dropout")
                       if cfg.prenet_dropout > 0.0 else None)
                return _hoisted_teacher_forced(
                    self.variables["params"]["cell"], cfg, shifted,
                    keys, memory, mask, rng)
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
