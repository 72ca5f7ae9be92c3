"""Fused autoregressive decode loop: the whole inference decode in ONE kernel.

The reference's inference hot loop is a TF1 while_loop of ~20 small ops per
step (SURVEY.md §3.3 [R]); the XLA rebuild's lax.scan still round-trips the
carried state and reloads every weight matrix from HBM each step. This kernel
is the speed-of-light design (BASELINE.json:5 "attention energy/softmax/
context fused per decode step"): weights, encoder memory and attention keys
are loaded into VMEM ONCE, and a fori_loop inside the kernel runs every decode
step — prenet (with on-chip PRNG dropout, active at inference per paper §3.2),
attention GRU, Bahdanau energy/softmax/context, input projection, two residual
GRUs, and the r-frame output projection — with zero HBM traffic for state.

Inference-only (no VJP): training keeps the XLA scan, which autodiffs.

Weight layout contract matches models/decoder.DecoderCell; pack_decoder_weights
extracts the arrays from the flax param tree.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


class DecoderWeights(NamedTuple):
    # prenet
    p_w0: jax.Array; p_b0: jax.Array; p_w1: jax.Array; p_b1: jax.Array
    # attention GRU (ops/gru.GRUCell fused [x, h] row layout, kept fused:
    # ONE gates dot and ONE candidate dot per step — the step is
    # latency-bound, so sequential MXU op count is the cost that matters)
    ag_wg: jax.Array; ag_bg: jax.Array
    ag_wc: jax.Array; ag_bc: jax.Array
    # attention (query proj + energy vector)
    at_wq: jax.Array; at_v: jax.Array
    # decoder input projection
    ip_w: jax.Array; ip_b: jax.Array
    # two decoder GRUs
    d0_wg: jax.Array; d0_bg: jax.Array
    d0_wc: jax.Array; d0_bc: jax.Array
    d1_wg: jax.Array; d1_bg: jax.Array
    d1_wc: jax.Array; d1_bc: jax.Array
    # frame projection
    f_w: jax.Array; f_b: jax.Array


def pack_decoder_weights(params) -> DecoderWeights:
    """Flax param tree (decoder/cell/...) -> DecoderWeights.

    ``params`` is variables["params"]["decoder"]["cell"]. GRU weights keep
    ops/gru.GRUCell's fused [x, h] concat row layout verbatim: the kernel
    concatenates [x, h] on lanes (both 128-aligned) and runs one MXU dot per
    gate set, instead of separate x-side and h-side dots.
    """
    def gru(g):
        return (g["gates"]["kernel"], g["gates"]["bias"],
                g["candidate"]["kernel"], g["candidate"]["bias"])

    pre = params["prenet"]
    att = params["attention"]
    ag = gru(params["attention_gru"])
    d0 = gru(params["decoder_gru0"])
    d1 = gru(params["decoder_gru1"])

    return DecoderWeights(
        p_w0=pre["fc0"]["kernel"], p_b0=pre["fc0"]["bias"],
        p_w1=pre["fc1"]["kernel"], p_b1=pre["fc1"]["bias"],
        ag_wg=ag[0], ag_bg=ag[1], ag_wc=ag[2], ag_bc=ag[3],
        at_wq=att["query"]["kernel"], at_v=att["v"],  # (dim, 1), kept 2-D for Mosaic
        ip_w=params["decoder_input_proj"]["kernel"],
        ip_b=params["decoder_input_proj"]["bias"],
        d0_wg=d0[0], d0_bg=d0[1], d0_wc=d0[2], d0_bc=d0[3],
        d1_wg=d1[0], d1_bg=d1[1], d1_wc=d1[2], d1_bc=d1[3],
        f_w=params["frame_proj"]["kernel"], f_b=params["frame_proj"]["bias"],
    )


def _gru_step(h, x, wg, bg, wc, bc):
    """TF1 GRU semantics (ops/gru.GRUCell): bf16/f32 MXU dots, f32 accumulation,
    f32 state and elementwise math. Fused [x, h] layout — 2 sequential dots."""
    wd = wg.dtype
    xh = jnp.concatenate([x.astype(wd), h.astype(wd)], axis=-1)
    ru = jax.nn.sigmoid(
        jnp.dot(xh, wg, preferred_element_type=jnp.float32)
        + bg.astype(jnp.float32)
    )
    d = h.shape[-1]
    r, u = ru[:, :d], ru[:, d:]
    xrh = jnp.concatenate([x.astype(wd), (r * h).astype(wd)], axis=-1)
    c = jnp.tanh(
        jnp.dot(xrh, wc, preferred_element_type=jnp.float32)
        + bc.astype(jnp.float32)
    )
    return u * h + (1.0 - u) * c


def _make_kernel(n_steps: int, n_mels: int, r: int, dropout: bool,
                 collect_aligns: bool, dropout_rate: float = 0.5,
                 t_in_pad: int | None = None):
    # threshold compare on uint32 PRNG bits: keep iff bits < keep_prob * 2^32.
    # numpy scalar, NOT jnp: a jnp constant would be a captured traced array,
    # which pallas_call rejects on the TPU (non-interpret) path.
    import numpy as np
    dropout = dropout and dropout_rate > 0.0  # rate 0 must be a true no-op
    keep_prob = 1.0 - dropout_rate
    keep_threshold = np.uint32(min(int(keep_prob * 2.0**32), 2**32 - 1))
    keep_scale = 1.0 / keep_prob if keep_prob > 0 else 0.0
    def kernel(seed_ref, memory_ref, keys_ref, maskbias_ref, *refs):
        # Outputs live in HBM: per-step results are staged in two
        # small VMEM slots and streamed out with double-buffered async DMA,
        # so the (n_steps, bt, ·) output arrays never occupy VMEM — that VMEM
        # headroom is what lets the batch tile grow (BASELINE.md r2 item:
        # "multi-utterance interleaved schedule" — more rows per step is the
        # latency-bound win).
        # Two SEPARATE single-slot stages per stream (not one (2, bt, ·)
        # buffer): Mosaic cannot DMA-slice a tiled VMEM memref whose lane dim
        # (r*n_mels = 160) is not 128-aligned, but whole-ref copies are fine.
        if collect_aligns:
            (*w_refs, frames_ref, align_ref, h_att, h0, h1, ctx, prev,
             fstage0, fstage1, astage0, astage1, fsem, asem) = refs
        else:
            (*w_refs, frames_ref, h_att, h0, h1, ctx, prev,
             fstage0, fstage1, fsem) = refs
            align_ref = astage0 = astage1 = asem = None
        w = DecoderWeights(*[ref[:] for ref in w_refs])
        if dropout:
            # per-tile seed (decorrelated outside via seed + tile_index)
            pltpu.prng_seed(seed_ref[0])

        b = memory_ref.shape[0]
        t_in = memory_ref.shape[1]
        keys_flat = keys_ref[:].reshape(b * t_in, -1)   # bf16 on the fast path
        maskbias = maskbias_ref[:]                      # (B, T_in) 0 / -1e9

        h_att[:] = jnp.zeros_like(h_att)
        h0[:] = jnp.zeros_like(h0)
        h1[:] = jnp.zeros_like(h1)
        ctx[:] = jnp.zeros_like(ctx)
        prev[:] = jnp.zeros_like(prev)

        def drop(x):
            if not dropout:
                return x
            # prng_random_bits returns int32 — bitcast before the unsigned
            # threshold compare (signed compare keeps everything)
            bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
            keep = bits < keep_threshold
            return jnp.where(keep, x * keep_scale, 0.0)

        wd = w.p_w0.dtype  # storage dtype (bf16 on the fast path)

        def out_dma(stage, sem, sem_i, hbm, t):
            return pltpu.make_async_copy(stage, hbm.at[t], sem.at[sem_i])

        f_stages = (fstage0, fstage1)
        a_stages = (astage0, astage1)

        def step(t, _):
            even = jax.lax.rem(t, 2) == 0

            # the DMA issued from this parity's stage two steps ago must land
            # before the stage is overwritten
            for par, is_par in ((0, even), (1, jnp.logical_not(even))):
                @pl.when(jnp.logical_and(t >= 2, is_par))
                def _(par=par):
                    out_dma(f_stages[par], fsem, par, frames_ref, t - 2).wait()
                    if collect_aligns:
                        out_dma(a_stages[par], asem, par, align_ref,
                                t - 2).wait()
            # prenet (dropout active, paper §3.2)
            x = jnp.maximum(
                jnp.dot(prev[:].astype(wd), w.p_w0,
                        preferred_element_type=jnp.float32)
                + w.p_b0.astype(jnp.float32), 0.0)
            x = drop(x)
            x = jnp.maximum(
                jnp.dot(x.astype(wd), w.p_w1,
                        preferred_element_type=jnp.float32)
                + w.p_b1.astype(jnp.float32), 0.0)
            x = drop(x)

            gi = jnp.concatenate([x, ctx[:]], axis=-1)
            h_att[:] = _gru_step(h_att[:], gi, w.ag_wg, w.ag_bg,
                                 w.ag_wc, w.ag_bc)

            # Bahdanau energy / masked softmax / context — fused. Energies in
            # the storage dtype (bf16 fast path), f32 score accumulation.
            q = jnp.dot(h_att[:].astype(wd), w.at_wq,
                        preferred_element_type=jnp.float32)
            e = jnp.tanh(keys_flat
                         + jnp.repeat(q.astype(keys_flat.dtype), t_in, axis=0))
            # v-contraction on the VPU: as a matmul this is (b*t_in, dim) x
            # (dim, 1) — N=1 padded to a 128-lane MXU tile, 99% wasted; an
            # f32 multiply + lane reduction is exact (products in f32) and
            # frees the MXU slot in the latency-bound step
            scores = jnp.sum(e.astype(jnp.float32)
                             * w.at_v.astype(jnp.float32).reshape(1, -1),
                             axis=-1)
            scores = scores.reshape(b, t_in) + maskbias
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp(scores - m)
            alpha = p / jnp.sum(p, axis=-1, keepdims=True)          # (B, T_in)
            # context: weighted sum over encoder time; bf16 product with f32
            # accumulation keeps the transient small on the fast path
            prod = alpha.reshape(b, t_in, 1).astype(memory_ref.dtype) * memory_ref[:]
            ctx[:] = prod.sum(axis=1, dtype=jnp.float32)
            if collect_aligns:
                alpha_out = alpha
                if t_in_pad is not None and t_in_pad != t_in:
                    alpha_out = jnp.pad(alpha,
                                        ((0, 0), (0, t_in_pad - t_in)))
                for par, is_par in ((0, even), (1, jnp.logical_not(even))):
                    @pl.when(is_par)
                    def _(par=par):
                        a_stages[par][:] = alpha_out
                        out_dma(a_stages[par], asem, par, align_ref, t).start()

            h = jnp.dot(jnp.concatenate([h_att[:], ctx[:]], axis=-1).astype(wd),
                        w.ip_w, preferred_element_type=jnp.float32) \
                + w.ip_b.astype(jnp.float32)
            h0[:] = _gru_step(h0[:], h, w.d0_wg, w.d0_bg, w.d0_wc, w.d0_bc)
            h = h + h0[:]
            h1[:] = _gru_step(h1[:], h, w.d1_wg, w.d1_bg, w.d1_wc, w.d1_bc)
            h = h + h1[:]

            frames = jnp.dot(h.astype(wd), w.f_w,
                             preferred_element_type=jnp.float32) \
                + w.f_b.astype(jnp.float32)
            for par, is_par in ((0, even), (1, jnp.logical_not(even))):
                @pl.when(is_par)
                def _(par=par):
                    f_stages[par][:] = frames
                    out_dma(f_stages[par], fsem, par, frames_ref, t).start()
            # explicit upper bound: f_w may be lane-padded past r*n_mels
            prev[:] = frames[:, (r - 1) * n_mels : r * n_mels]
            return 0

        jax.lax.fori_loop(0, n_steps, step, 0)

        # drain the last (up to) two in-flight copies per stream; n_steps and
        # the stage parities are static Python ints here
        for t_last in range(max(0, n_steps - 2), n_steps):
            par = t_last % 2
            out_dma(f_stages[par], fsem, par, frames_ref, t_last).wait()
            if collect_aligns:
                out_dma(a_stages[par], asem, par, align_ref, t_last).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "dropout", "interpret", "collect_alignments",
                     "lowp", "batch_tile", "dropout_rate"),
)
def decode_loop(memory, keys, mask, weights: DecoderWeights, *, n_steps: int,
                seed: int | jax.Array = 0, dropout: bool = True,
                dropout_rate: float = 0.5,
                interpret: bool = False, collect_alignments: bool = True,
                lowp: bool = True, batch_tile: int | None = None):
    """Run the fused decode. memory/keys (B,T_in,D); mask (B,T_in) bool or None.

    Returns (frames (B, n_steps, r*n_mels), alignments (B, n_steps, T_in) or
    None when collect_alignments=False).

    ``lowp``: store memory/keys/weights in bf16 (f32 accumulation everywhere;
    energies/context products bf16). Halves VMEM -> bigger batch tiles ->
    fewer sequential tile passes.
    """
    b, t_in, _ = memory.shape
    r_nm = weights.f_w.shape[1]
    n_mels = weights.p_w0.shape[0]
    r = r_nm // n_mels
    att_dim = weights.ag_wg.shape[1] // 2
    dec_dim = weights.d0_wg.shape[1] // 2
    mem_dim = memory.shape[2]
    sdtype = jnp.bfloat16 if lowp else jnp.float32

    # Batch tiling: VMEM (~16 MB) cannot hold memory+keys+outputs+weights for
    # a big batch at once. Each pallas_call handles one tile (single program,
    # no grid -> no double-buffering overhead) and lax.map walks the tiles;
    # weights are re-fetched per tile (a few MB of HBM traffic — negligible).
    if batch_tile is not None:
        bt = min(b, batch_tile)
    elif not lowp:
        bt = min(b, 8)
    else:
        # measured on v5e with HBM-streamed outputs (r2): bt=32 beats bt=16
        # (8.07 vs 9.50 ms at B32/T128/200 steps) — the step is latency-bound,
        # so more rows per step win once the outputs no longer occupy VMEM
        bt = min(b, 32)
    if b % bt != 0:
        pad = bt - b % bt
        memory = jnp.pad(memory, ((0, pad), (0, 0), (0, 0)))
        keys = jnp.pad(keys, ((0, pad), (0, 0), (0, 0)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, pad), (0, 0)))
        b_padded = b + pad
    else:
        b_padded = b
    n_tiles = b_padded // bt

    maskbias = (
        jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
        if mask is not None else jnp.zeros((b_padded, t_in), jnp.float32)
    )

    # DMA slice shapes must be lane-aligned (128); r*n_mels = 160 is not, so
    # the frame projection is zero-padded to the next lane multiple and the
    # pad is sliced off after the call (same for alignments when T_in is
    # unaligned). Zero columns cost nothing on the MXU.
    r_nm_pad = -(-r_nm // 128) * 128
    t_in_pad = -(-t_in // 128) * 128
    if r_nm_pad != r_nm:
        weights = weights._replace(
            f_w=jnp.pad(weights.f_w, ((0, 0), (0, r_nm_pad - r_nm))),
            f_b=jnp.pad(weights.f_b, (0, r_nm_pad - r_nm)))
    w_list = [x.astype(sdtype) for x in weights]
    kernel = _make_kernel(n_steps, n_mels, r, dropout, collect_alignments,
                          dropout_rate=dropout_rate, t_in_pad=t_in_pad)

    # Outputs pinned to HBM: streamed from two-slot VMEM stages by async DMA
    # inside the kernel — VMEM then only holds memory/keys/weights/state, so
    # the batch tile can grow (the latency-bound win: more rows per step).
    out_shape = [jax.ShapeDtypeStruct((n_steps, bt, r_nm_pad), jnp.float32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
    if collect_alignments:
        out_shape.append(
            jax.ShapeDtypeStruct((n_steps, bt, t_in_pad), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))

    scratch_shapes = [
        pltpu.VMEM((bt, att_dim), jnp.float32),   # h_att
        pltpu.VMEM((bt, dec_dim), jnp.float32),   # h0
        pltpu.VMEM((bt, dec_dim), jnp.float32),   # h1
        pltpu.VMEM((bt, mem_dim), jnp.float32),   # context
        pltpu.VMEM((bt, n_mels), jnp.float32),    # prev frame
        pltpu.VMEM((bt, r_nm_pad), jnp.float32),  # frame DMA stage, parity 0
        pltpu.VMEM((bt, r_nm_pad), jnp.float32),  # frame DMA stage, parity 1
    ]
    if collect_alignments:
        scratch_shapes.append(pltpu.VMEM((bt, t_in_pad), jnp.float32))  # al st0
        scratch_shapes.append(pltpu.VMEM((bt, t_in_pad), jnp.float32))  # al st1
        scratch_shapes.append(pltpu.SemaphoreType.DMA((2,)))   # frame sem
        scratch_shapes.append(pltpu.SemaphoreType.DMA((2,)))   # align sem
    else:
        scratch_shapes.append(pltpu.SemaphoreType.DMA((2,)))   # frame sem

    call = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + len(w_list))
        ),
        out_specs=tuple(out_specs),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )

    mem_t = memory.astype(sdtype).reshape(n_tiles, bt, t_in, mem_dim)
    keys_t = keys.astype(sdtype).reshape(n_tiles, bt, t_in, keys.shape[2])
    bias_t = maskbias.reshape(n_tiles, bt, t_in)
    seeds = (jnp.asarray(seed, jnp.int32) + jnp.arange(n_tiles, dtype=jnp.int32)
             ).reshape(n_tiles, 1)

    def one_tile(args):
        s, m, k, mb = args
        return call(s, m, k, mb, *w_list)

    outs = jax.lax.map(one_tile, (seeds, mem_t, keys_t, bias_t))
    # (n_tiles, n_steps, bt, ·) -> (B, n_steps, ·); drop the lane padding
    frames = outs[0][..., :r_nm].transpose(0, 2, 1, 3) \
        .reshape(b_padded, n_steps, r_nm)
    if not collect_alignments:
        return frames[:b], None
    aligns = outs[1][..., :t_in].transpose(0, 2, 1, 3) \
        .reshape(b_padded, n_steps, t_in)
    return frames[:b], aligns[:b]
