"""Pallas TPU Griffin-Lim: the full iSTFT -> OLA -> normalise -> reflect-pad ->
STFT -> magnitude-projection iteration fused into ONE VMEM-resident kernel.

Why (VERDICT.md item 1 / BASELINE.md round-2 candidates): the XLA matmul-DFT
Griffin-Lim loop (dsp/dft.py) is HBM-bandwidth-bound at ~17% of speed-of-light
because every iteration materialises frames/signal/spectra intermediates in HBM
(~460 MB/iter at B32x5s). The reference runs the same loop on host CPU via
librosa (SURVEY.md §3.3 [R]); at 1000 iterations it dominates the graded
audio-seconds/s metric either way. This kernel keeps the whole round trip in
VMEM so per-iteration HBM traffic collapses to (at most) the carried spectrum,
leaving the MXU matmuls as the only real cost.

Design notes (all shapes static per compile):

* hop-chunk matmul decomposition. Framing and overlap-add are never done as
  gathers/reshapes. With m = ceil(n_fft/hop) and frames[f] covering samples
  [f*hop, f*hop + n_fft), both directions decompose over m hop-sized chunks of
  the frame: position n = j*hop + p. Row-shifted slices y[j:j+F] are sublane
  ops (cheap, aligned); the default path has no lane-unaligned access in the
  hot loop. (The opt-in `trim_chunks` lane-trim stores boundary chunks at a
  128-aligned lane OFFSET with a non-128 width — new slice patterns whose
  Mosaic lowering is validated by the guarded tpu_smoke/bench A/Bs before the
  flag ever defaults on.)

* twiddle factorisation keeps VMEM small. The angle splits as
  theta = 2*pi*(j*hop + p)*k/N = a_j*k + b_p*k, so the DFT block for chunk j
  is D_j[p, k] = E[p, k] * W_j[k] (complex): ONE shared (hop, S) matrix E
  ([cos b | -sin b]) serves every chunk and both directions, with a cheap
  per-chunk elementwise rotation by (cos a_j, sin a_j) on the spectral side.
  vs storing all m chunk matrices this is an m-fold matrix-bytes cut
  (10.1 MB -> 1.27 MB at 2048/275), which is what fits the kernel inside the
  ~16 MB VMEM scoped budget; the rotations are VPU work that overlaps MXU.
  Positions n >= n_fft in the last chunk carry nonzero E*W values, but the
  analysis/synthesis window (zero there) multiplies them out, exactly like
  the zero rows of the unfactored matrix did.

* reflect padding as permutation matmuls. stft() re-pads the interior signal
  with `reflect` (librosa center=True semantics; see dsp/stft.py). Mosaic has
  no lane-reverse, so each affected edge row of the blocked signal is
  rebuilt as (1, hop) @ P with P a precomputed (hop, hop) permutation matrix
  mapping source lanes to reversed target lanes; only ~4 distinct P matrices
  exist (two per edge) because the mapping is shift-invariant across rows.
  Built by brute force in `_reflect_plan` and verified against np.pad in
  tests/unit/test_pallas_gl.py.

* the magnitude projection (impose |target|, keep phase) matches
  dsp/dft.py:griffin_lim_mm exactly: scale = mag / max(sqrt(re^2+im^2), 1e-8)
  in f32. Matmuls are bf16 with f32 accumulation and the carried spectrum is
  bf16 (same trade as the `mm` backend's lowp mode: GL re-imposes the f32
  target magnitude every iteration so transform noise does not accumulate).

Reference parity: semantics match dsp/dft.py:griffin_lim_mm up to bf16 matmul
noise; that path is itself golden-tested against scipy/librosa conventions
(tests/unit/test_dsp.py). The reference repo's audio.py griffin_lim [R] is the
~1000-iteration host-CPU original (SURVEY.md §2.1 #1).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tacotron_tpu.dsp.dft import istft_mm


LANE = 128
SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass(frozen=True)
class _ReflectRow:
    """One blocked-signal row whose value after reflect padding differs from
    the raw OLA output: target <- sum of (source row @ P[mat]) blended with
    the direct value under `mask` (1 = reflected lane)."""

    target: int
    sources: tuple[tuple[int, int], ...]   # (source_row, matrix_index)
    masked: bool


@dataclass(frozen=True)
class _GLPlan:
    n_fft: int
    hop: int
    win_length: int
    n_frames: int               # true frame count (reflect/wss geometry)
    f_pad: int                  # frames padded to a sublane multiple
    m: int                      # chunks per frame = ceil(n_fft / hop)
    n_blocks: int               # blocked signal rows = f_pad + m - 1
    s_half: int                 # padded per-component spectral width
    s: int                      # 2 * s_half
    e_cat: np.ndarray           # (hop, 2*s_half) f32 [cos(b_p k) | -sin(b_p k)]
                                # one fused positional matrix: each direction's
                                # cos/sin matmul PAIR becomes ONE wider MXU op
                                # (half the per-op issue overhead; the synthesis
                                # N dim is hop=275 -> padded 384, so op count,
                                # not MACs, is the controllable cost)
    cos_a: np.ndarray           # (m, s_half) f32 cos(a_j k)
    sin_a: np.ndarray           # (m, s_half) f32 sin(a_j k)
    syn_c: np.ndarray           # (m, s_half) f32 cos(a_j k) * w_k/N
    syn_s: np.ndarray           # (m, s_half) f32 sin(a_j k) * w_k/N
    win_chunks: np.ndarray      # (m, hop) f32 padded analysis/synthesis window
    chunk_spans: tuple[tuple[int, int, int], ...]
                                # (j, lo, hi) live lane range per LIVE chunk —
                                # chunks whose window slice is all zero are
                                # absent entirely (both passes' matmuls for
                                # them are multiplied by win == 0): at the
                                # production geometry (2048/275/1102,
                                # lpad 473) chunks {0, 6, 7} of 8 are dead,
                                # a 3/8 MAC cut on the dominant cost.
                                # lo 128-aligned, hi capped at hop. With
                                # trimming the two boundary chunks at the
                                # production geometry (1: lanes [128, 275),
                                # 5: [0, 256)) drop 2 of the remaining 13
                                # output lane-tiles per pass; without trimming
                                # every span is (j, 0, hop)
    invwss: np.ndarray          # (n_blocks, hop) f32, zero beyond signal end
    p_mats: np.ndarray          # (n_p, hop, hop) f32 reversal permutations
    refl_rows: tuple[_ReflectRow, ...]
    refl_masks: np.ndarray      # (len(refl_rows), hop) f32, 1 = reflected lane


def _reflect_plan(n_fft: int, hop: int, n_frames: int):
    """Brute-force the centre reflect-pad index map into per-row permutation
    matrices. Padded coords: y_pad[t] = y_norm[t] in the interior
    [pad, Ty - pad); left edge y_pad[pad - k] = y_norm[pad + k]; right edge
    y_pad[c + k] = y_norm[c - k] with c = Ty - pad - 1 (np.pad 'reflect')."""
    pad = n_fft // 2
    ty = n_fft + hop * (n_frames - 1)
    c = ty - pad - 1
    # the farthest reflection source is t_src = 2*pad (for t = 0), which must
    # land in the interior [pad, ty - pad): requires ty >= 3*pad + 1
    if ty < 3 * pad + 1:
        min_frames = -(-(3 * pad + 1 - n_fft) // hop) + 1
        raise ValueError(
            f"signal too short to reflect-pad: ty {ty} < 3*pad+1 "
            f"{3 * pad + 1}; need n_frames >= {min_frames}")

    per_pair: dict[tuple[int, int], np.ndarray] = {}
    reflected_lanes: dict[int, np.ndarray] = {}
    for t in list(range(pad)) + list(range(c + 1, ty)):
        t_src = 2 * pad - t if t < pad else 2 * c - t
        assert pad <= t_src < ty - pad, (t, t_src)
        tr, tl = divmod(t, hop)
        sr, sl = divmod(t_src, hop)
        mat = per_pair.setdefault((tr, sr), np.zeros((hop, hop), np.float32))
        mat[sl, tl] = 1.0
        reflected_lanes.setdefault(tr, np.zeros(hop, np.float32))[tl] = 1.0

    # Dedup matrices (shift invariance means ~2 distinct per edge).
    unique: list[np.ndarray] = []
    index: dict[bytes, int] = {}
    pair_mat: dict[tuple[int, int], int] = {}
    for key, mat in per_pair.items():
        b = mat.tobytes()
        if b not in index:
            index[b] = len(unique)
            unique.append(mat)
        pair_mat[key] = index[b]

    rows = []
    masks = []
    for tr in sorted(reflected_lanes):
        srcs = tuple(sorted((sr, mi) for (t, sr), mi in pair_mat.items()
                            if t == tr))
        mask = reflected_lanes[tr]
        rows.append(_ReflectRow(tr, srcs, masked=bool((mask == 0).any())))
        masks.append(mask)
    return np.stack(unique), tuple(rows), np.stack(masks)


@functools.lru_cache(maxsize=8)
def _gl_plan(n_fft: int, hop: int, win_length: int, n_frames: int,
             trim: bool = False) -> _GLPlan:
    m = -(-n_fft // hop)
    f_pad = _round_up(n_frames, SUBLANE)
    n_blocks = f_pad + m - 1
    n_bins = n_fft // 2 + 1
    s_half = _round_up(n_bins, LANE)
    s = 2 * s_half

    k = np.arange(n_bins)[None, :]
    # shared positional matrix: b_p*k angles, p in [0, hop)
    p_idx = np.arange(hop)[:, None]
    ang_b = 2.0 * np.pi * p_idx * k / n_fft
    e_cat = np.zeros((hop, 2 * s_half), np.float32)
    e_cat[:, :n_bins] = np.cos(ang_b)
    e_cat[:, s_half:s_half + n_bins] = -np.sin(ang_b)

    # per-chunk twiddles: a_j*k angles
    j_idx = np.arange(m)[:, None]
    ang_a = 2.0 * np.pi * (j_idx * hop) * k / n_fft
    cos_a = np.zeros((m, s_half), np.float32)
    sin_a = np.zeros((m, s_half), np.float32)
    cos_a[:, :n_bins] = np.cos(ang_a)
    sin_a[:, :n_bins] = np.sin(ang_a)

    # synthesis weights w_k / N (rfft completion: double interior bins)
    w = np.full(n_bins, 2.0, np.float32)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    wn_half = np.zeros(s_half, np.float32)
    wn_half[:n_bins] = w / n_fft
    syn_c = cos_a * wn_half
    syn_s = sin_a * wn_half

    # periodic Hann centred in n_fft (matches dsp/stft._padded_window)
    rows = m * hop
    wn_ = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / win_length)
    lpad = (n_fft - win_length) // 2
    win = np.zeros(rows, np.float32)
    win[lpad:lpad + win_length] = wn_
    win_chunks = win.reshape(m, hop)

    # window sum-square over the OLA span of the TRUE frames, blocked;
    # zero beyond signal end (padded frames contribute nothing: their
    # synthesis rows are zeroed by invwss and their analysis reads zeros)
    ty = n_fft + hop * (n_frames - 1)
    wss = np.zeros(n_blocks * hop, np.float32)
    for f in range(n_frames):
        wss[f * hop:f * hop + n_fft] += win[:n_fft] ** 2
    invwss = 1.0 / np.maximum(wss, 1e-11)
    invwss[ty:] = 0.0

    p_mats, refl_rows, refl_masks = _reflect_plan(n_fft, hop, n_frames)
    spans = []
    for j in range(m):
        if not win_chunks[j].any():
            continue                       # dead chunk: skipped in both passes
        if trim:
            nz = np.nonzero(win_chunks[j])[0]
            lo = int(nz.min()) // LANE * LANE
            hi = min(_round_up(int(nz.max()) + 1, LANE), hop)
        else:
            lo, hi = 0, hop
        spans.append((j, lo, hi))
    return _GLPlan(n_fft, hop, win_length, n_frames, f_pad, m, n_blocks,
                   s_half, s, e_cat, cos_a, sin_a, syn_c, syn_s,
                   win_chunks, tuple(spans),
                   invwss.reshape(n_blocks, hop),
                   p_mats, refl_rows, refl_masks)


_FRAME_TILE = 128   # frame rows per tile; bounds the VMEM value stack


def _iteration_body(plan: _GLPlan, beta: float, mdtype,
                    src, prev, mag_at, dst, save_prev,
                    ecat_ref, rots, win, invwss,
                    p_ref, mask_ref, y_scr, yp_scr, ola: str = "scatter"):
    """One Griffin-Lim projection on VMEM-resident refs, frame-tiled.

    Accessors (all slices static, over frame tiles of <= _FRAME_TILE rows):
      src(t0, ft)      -> (re, im) mdtype (ft, S_half) spectrum slices
      prev(t0, ft)     -> previous-iteration pair, or None when beta == 0
      mag_at(t0, ft)   -> f32 target-magnitude slice
      dst(t0, ft, re, im)  writes the projected mdtype slices
      save_prev(t0, ft)    copies src -> prev storage (no-op when beta == 0)
    y_scr / yp_scr are (n_blocks, hop) f32 scratch refs for the blocked
    signal before/after reflect padding.

    Everything is tiled to (ft, S_half) working sets: at the production
    2048/275 B32x5s geometry a whole-spectrum formulation peaks the Mosaic
    value stack ~9 MB over budget (compile-time VMEM OOM); per-tile
    temporaries keep the stack < ~3 MB. Half-spectrum arrays throughout —
    the complex chunk rotation is 4 half-width multiplies instead of
    full-width swaps/concats.

    `ola` selects the overlap-add formulation for the synthesis pass:

    * "scatter" (default): per frame tile, each chunk j is accumulated into
      y_scr rows [j+t0, j+t0+ft) — a sublane-UNALIGNED (offset j mod 8)
      read-modify-write of (ft, hop) f32 per (tile, chunk).
    * "gather": iterate over ALIGNED output row tiles of y_scr; for each
      output tile, pull the m contributing spectrum windows (rows [b0-j, ...),
      unaligned bf16 LOADS), accumulate in a register value, and issue ONE
      aligned store per tile. Same MACs and same f32 accumulation order per
      output row, so results are bitwise-comparable up to matmul batching;
      trades m unaligned f32 RMWs for m unaligned half-width loads.
    """
    f, m, hop = plan.f_pad, plan.m, plan.hop
    cos_a, sin_a, syn_c, syn_s = rots
    tiles = [(t0, min(_FRAME_TILE, f - t0))
             for t0 in range(0, f, _FRAME_TILE)]

    def extrapolate(t0, ft):
        re32, im32 = (x.astype(jnp.float32) for x in src(t0, ft))
        if beta:
            pre, pim = prev(t0, ft)
            re32 = re32 + beta * (re32 - pre.astype(jnp.float32))
            im32 = im32 + beta * (im32 - pim.astype(jnp.float32))
        return re32, im32

    def chunk_matmul(re32, im32, j, lo, hi):
        # [rot_re | rot_im] (ft, 2*s_half) against the fused positional
        # matrix: ONE MXU op per chunk instead of a cos+sin pair; only the
        # live lane span [lo, hi) of the chunk's output is computed
        rot2 = jnp.concatenate(
            [(re32 * syn_c[j:j + 1] - im32 * syn_s[j:j + 1]),
             (re32 * syn_s[j:j + 1] + im32 * syn_c[j:j + 1])],
            axis=1).astype(mdtype)
        return jax.lax.dot_general(
            rot2, ecat_ref[lo:hi, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # (ft, hi - lo)

    # ---- synthesis: blocked iSTFT via m hop-chunk matmuls per frame
    if ola == "gather":
        nb = plan.n_blocks
        for b0 in range(0, nb, _FRAME_TILE):
            bt = min(_FRAME_TILE, nb - b0)
            acc = jnp.zeros((bt, hop), jnp.float32)
            for j, llo, lhi in plan.chunk_spans:  # zero-window chunks skipped
                lo, hi = b0 - j, b0 - j + bt            # frame-row window
                lo_c, hi_c = max(lo, 0), min(hi, f)     # clip to real rows
                if hi_c <= lo_c:
                    continue
                re32, im32 = extrapolate(lo_c, hi_c - lo_c)
                chunk = (chunk_matmul(re32, im32, j, llo, lhi)
                         * win[j:j + 1, llo:lhi])
                top, bot = lo_c - lo, hi - hi_c         # clipped rows = zero
                if top or bot:
                    parts = [chunk]
                    if top:
                        parts.insert(0, jnp.zeros((top, lhi - llo),
                                                  jnp.float32))
                    if bot:
                        parts.append(jnp.zeros((bot, lhi - llo), jnp.float32))
                    chunk = jnp.concatenate(parts, axis=0)
                if (llo, lhi) == (0, hop):
                    acc = acc + chunk
                else:
                    acc = acc.at[:, llo:lhi].add(chunk)
            y_scr[b0:b0 + bt] = acc                     # one ALIGNED store
    else:
        y_scr[:] = jnp.zeros(y_scr.shape, jnp.float32)
        for t0, ft in tiles:
            re32, im32 = extrapolate(t0, ft)
            for j, llo, lhi in plan.chunk_spans:  # zero-window chunks skipped
                chunk = chunk_matmul(re32, im32, j, llo, lhi)
                y_scr[j + t0:j + t0 + ft, llo:lhi] += (
                    chunk * win[j:j + 1, llo:lhi])

    # ---- window-sum-square normalise (edges included, matching istft)
    yp_scr[:] = y_scr[:] * invwss

    # ---- centre reflect padding: rebuild edge rows via permutation matmuls
    edge = {}
    for i, row in enumerate(plan.refl_rows):
        r = jnp.zeros((1, hop), jnp.float32)
        for srow, mi in row.sources:
            r = r + jnp.dot(yp_scr[srow:srow + 1, :].astype(mdtype), p_ref[mi],
                            preferred_element_type=jnp.float32)
        if row.masked:
            mask = mask_ref[i:i + 1, :]
            r = mask * r + (1.0 - mask) * yp_scr[row.target:row.target + 1, :]
        edge[row.target] = r
    for t, r in edge.items():   # write after all reads (targets overlap sources)
        yp_scr[t:t + 1, :] = r

    # ---- analysis + magnitude projection, per frame tile. Writing dst per
    # tile is safe even when dst aliases src (fused kernel): synthesis has
    # fully consumed the source spectrum by this point.
    for t0, ft in tiles:
        acc_re = jnp.zeros((ft, plan.s_half), jnp.float32)
        acc_im = jnp.zeros((ft, plan.s_half), jnp.float32)
        for j, llo, lhi in plan.chunk_spans:  # win == 0 chunks skipped
            seg = (yp_scr[j + t0:j + t0 + ft, llo:lhi] * win[j:j + 1, llo:lhi]
                   ).astype(mdtype)
            # one (ft, span) x (span, 2*s_half) op; split the aligned halves
            cs = jnp.dot(seg, ecat_ref[llo:lhi, :],
                         preferred_element_type=jnp.float32)
            cs_c, cs_m = cs[:, :plan.s_half], cs[:, plan.s_half:]
            acc_re = acc_re + (cs_c * cos_a[j:j + 1] + cs_m * sin_a[j:j + 1])
            acc_im = acc_im + (cs_m * cos_a[j:j + 1] - cs_c * sin_a[j:j + 1])
        # f32 projection, matching griffin_lim_mm
        scale = mag_at(t0, ft) / jnp.maximum(
            jnp.sqrt(acc_re * acc_re + acc_im * acc_im), 1e-8)
        save_prev(t0, ft)
        dst(t0, ft, (acc_re * scale).astype(mdtype),
            (acc_im * scale).astype(mdtype))


def _const_specs(plan: _GLPlan):
    def const_spec(shape):
        return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return [
        const_spec(plan.e_cat.shape),
        const_spec(plan.cos_a.shape),
        const_spec(plan.sin_a.shape),
        const_spec(plan.syn_c.shape),
        const_spec(plan.syn_s.shape),
        const_spec(plan.win_chunks.shape),
        const_spec(plan.invwss.shape),
        const_spec(plan.p_mats.shape),
        const_spec(plan.refl_masks.shape),
    ]


def _flops_iter(plan: _GLPlan, batch: int) -> int:
    # 2 passes (synth+analysis), 2 flop/MAC; only the live lane spans
    live = sum(hi - lo for _, lo, hi in plan.chunk_spans)
    return 4 * plan.f_pad * live * plan.s * batch


def _make_gl_call_fused(plan: _GLPlan, batch: int, beta: float, n_iter: int,
                        mdtype=jnp.bfloat16, interpret: bool = False,
                        ola: str = "scatter"):
    """Whole-loop kernel: ALL `n_iter` GL iterations in one launch, grid over
    batch. The only HBM traffic per utterance is the f32 magnitude in and the
    final mdtype spectrum halves out, both moved by explicit single-buffered
    DMA (`pl.ANY` + `make_async_copy`); the zero-phase init is computed
    in-kernel from the magnitude. vs the segmented kernel's pipelined block
    specs this removes every double buffer and the spectrum-carry operands —
    the difference between 21.1 MB (compile-time VMEM OOM at the production
    2048/275 B32x5s geometry) and fitting the ~16 MB scoped budget.
    """
    f, s_half = plan.f_pad, plan.s_half
    with_prev = bool(beta)

    def kernel(*args):
        mag_hbm = args[0]
        (ecat_ref, ca_ref, sa_ref, sc_ref, ss_ref, win_ref,
         invwss_ref, p_ref, mask_ref) = args[1:10]
        out_re_hbm, out_im_hbm = args[10:12]
        (mag_scr, re_scr, im_scr) = args[12:15]
        rest = args[15:]
        if with_prev:
            pre_scr, pim_scr = rest[:2]
            rest = rest[2:]
        y_scr, yp_scr, sem_in, sem_re, sem_im = rest

        b = pl.program_id(0)
        cp_in = pltpu.make_async_copy(mag_hbm.at[b], mag_scr, sem_in)
        cp_in.start()
        cp_in.wait()

        rots = (ca_ref[:], sa_ref[:], sc_ref[:], ss_ref[:])
        win = win_ref[:]
        invwss = invwss_ref[:]

        re_scr[:] = mag_scr[:].astype(mdtype)        # zero-phase init
        im_scr[:] = jnp.zeros((f, s_half), mdtype)
        if with_prev:
            pre_scr[:] = re_scr[:]
            pim_scr[:] = im_scr[:]

        def src(t0, ft):
            return re_scr[t0:t0 + ft], im_scr[t0:t0 + ft]

        def prev(t0, ft):
            return pre_scr[t0:t0 + ft], pim_scr[t0:t0 + ft]

        def mag_at(t0, ft):
            return mag_scr[t0:t0 + ft]

        def save_prev(t0, ft):
            if with_prev:
                pre_scr[t0:t0 + ft] = re_scr[t0:t0 + ft]
                pim_scr[t0:t0 + ft] = im_scr[t0:t0 + ft]

        def dst(t0, ft, re_n, im_n):
            re_scr[t0:t0 + ft] = re_n
            im_scr[t0:t0 + ft] = im_n

        def body(_, carry):
            _iteration_body(
                plan, beta, mdtype, src, prev, mag_at, dst, save_prev,
                ecat_ref, rots, win, invwss, p_ref, mask_ref,
                y_scr, yp_scr, ola=ola)
            return carry

        jax.lax.fori_loop(0, n_iter, body, 0)

        cp_re = pltpu.make_async_copy(re_scr, out_re_hbm.at[b], sem_re)
        cp_im = pltpu.make_async_copy(im_scr, out_im_hbm.at[b], sem_im)
        cp_re.start()
        cp_im.start()
        cp_re.wait()
        cp_im.wait()

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((f, s_half), jnp.float32),     # mag
        pltpu.VMEM((f, s_half), mdtype),          # re carry
        pltpu.VMEM((f, s_half), mdtype),          # im carry
    ]
    if with_prev:
        scratch += [pltpu.VMEM((f, s_half), mdtype),
                    pltpu.VMEM((f, s_half), mdtype)]
    scratch += [
        pltpu.VMEM((plan.n_blocks, plan.hop), jnp.float32),
        pltpu.VMEM((plan.n_blocks, plan.hop), jnp.float32),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]

    return pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[any_spec] + _const_specs(plan),
        out_specs=(any_spec, any_spec),
        out_shape=(
            jax.ShapeDtypeStruct((batch, f, s_half), mdtype),
            jax.ShapeDtypeStruct((batch, f, s_half), mdtype),
        ),
        scratch_shapes=scratch,
        # deliberately ONE iteration's flops, not n_iter's: XLA's scheduler
        # spends compile time proportional to the estimate (measured: true
        # 1000-iter flops -> 329 s compile, capped -> 22 s) and there is
        # nothing to overlap around a whole-loop kernel anyway
        cost_estimate=pl.CostEstimate(
            flops=_flops_iter(plan, batch),
            bytes_accessed=batch * f * plan.s * 8,
            transcendentals=batch * f * s_half,
        ),
        interpret=interpret,
    )


def _make_gl_call(plan: _GLPlan, batch: int, mdtype=jnp.bfloat16,
                  interpret: bool = False, ola: str = "scatter"):
    """Segmented kernel: ONE GL iteration per launch, spectrum carried through
    HBM between launches via pipelined VMEM block specs. Test/fallback path
    (inner=1 streams every iteration); the production path is
    `_make_gl_call_fused`. No momentum: segmented momentum would need the
    previous iterate carried too, and the fused kernel covers that case.
    """
    f, s, s_half = plan.f_pad, plan.s, plan.s_half

    def kernel(*args):
        re_ref, im_ref, mag_ref = args[:3]
        (ecat_ref, ca_ref, sa_ref, sc_ref, ss_ref, win_ref,
         invwss_ref, p_ref, mask_ref) = args[3:12]
        out_re, out_im = args[12:14]
        y_scr, yp_scr = args[14:]

        rots = (ca_ref[:], sa_ref[:], sc_ref[:], ss_ref[:])

        def src(t0, ft):
            return re_ref[0, t0:t0 + ft], im_ref[0, t0:t0 + ft]

        def mag_at(t0, ft):
            return mag_ref[0, t0:t0 + ft]

        def dst(t0, ft, re_n, im_n):
            out_re[0, t0:t0 + ft] = re_n
            out_im[0, t0:t0 + ft] = im_n

        def noop(t0, ft):
            return None

        _iteration_body(
            plan, 0.0, mdtype, src, None, mag_at, dst, noop,
            ecat_ref, rots, win_ref[:], invwss_ref[:],
            p_ref, mask_ref, y_scr, yp_scr, ola=ola)

    half = pl.BlockSpec((1, f, s_half), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [half] * 3 + _const_specs(plan)

    return pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=in_specs,
        out_specs=(half, half),
        out_shape=(
            jax.ShapeDtypeStruct((batch, f, s_half), mdtype),
            jax.ShapeDtypeStruct((batch, f, s_half), mdtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((plan.n_blocks, plan.hop), jnp.float32),
            pltpu.VMEM((plan.n_blocks, plan.hop), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=_flops_iter(plan, batch),
            bytes_accessed=batch * f * s * 8,
            transcendentals=batch * f * s_half,
        ),
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "n_iter", "length",
                     "momentum", "inner", "lowp", "interpret", "ola",
                     "trim_chunks"),
)
def griffin_lim_pallas(magnitude: jax.Array, *, n_fft: int, hop_length: int,
                       win_length: int, n_iter: int = 60,
                       length: int | None = None, momentum: float = 0.0,
                       inner: int | None = None, lowp: bool = True,
                       interpret: bool = False,
                       ola: str = "scatter",
                       trim_chunks: bool = False) -> jax.Array:
    """Griffin-Lim phase recovery with the fused Pallas iteration kernel.

    Drop-in equivalent of dsp/dft.py:griffin_lim_mm (same zero-phase init,
    same projection, same momentum extrapolation, final iSTFT in f32).
    `inner`: GL iterations per kernel launch (None = all of them: the carried
    spectrum never leaves VMEM; 1 = stream it per iteration, used in tests).
    `ola`: overlap-add formulation, "scatter" (default) or "gather" — see
    `_iteration_body`; numerically equivalent, A/B-able for MXU utilisation.
    `trim_chunks`: lane-trim the partially-windowed boundary chunks' matmuls
    to their 128-aligned live span (exact — the trimmed lanes carry zero
    window); off by default until measured on hardware.
    """
    mag = magnitude.astype(jnp.float32)
    *batch_dims, f, n_bins = mag.shape
    assert n_bins == n_fft // 2 + 1, (n_bins, n_fft)
    plan = _gl_plan(n_fft, hop_length, win_length, f, trim=trim_chunks)
    b = int(np.prod(batch_dims, dtype=np.int64)) if batch_dims else 1
    beta = float(momentum)
    mdtype = jnp.bfloat16 if lowp else jnp.float32

    mag_p = jnp.zeros((b, plan.f_pad, plan.s_half), jnp.float32)
    mag_p = mag_p.at[:, :f, :n_bins].set(mag.reshape(b, f, n_bins))
    re0 = mag_p.astype(mdtype)                         # zero-phase init
    im0 = jnp.zeros((b, plan.f_pad, plan.s_half), mdtype)

    consts = (
        jnp.asarray(plan.e_cat, mdtype),
        jnp.asarray(plan.cos_a),
        jnp.asarray(plan.sin_a),
        jnp.asarray(plan.syn_c),
        jnp.asarray(plan.syn_s),
        jnp.asarray(plan.win_chunks),
        jnp.asarray(plan.invwss),
        jnp.asarray(plan.p_mats, mdtype),   # 0/1 entries: exact in bf16
        jnp.asarray(plan.refl_masks),
    )

    if inner is None:
        # production path: whole loop in one launch, init computed in-kernel
        call = _make_gl_call_fused(plan, b, beta, n_iter, mdtype=mdtype,
                                   interpret=interpret, ola=ola)
        re_f, im_f = call(mag_p, *consts)
    else:
        # streaming path: one launch per iteration, spectrum through HBM
        assert inner == 1, "segmented kernel streams one iteration per launch"
        # segmented momentum would reset `prev` at segment boundaries
        assert beta == 0.0, "momentum requires inner=None"
        call = _make_gl_call(plan, b, mdtype=mdtype, interpret=interpret,
                             ola=ola)

        def body(_, carry):
            return call(carry[0], carry[1], mag_p, *consts)

        re_f, im_f = jax.lax.fori_loop(0, n_iter, body, (re0, im0))

    re = re_f.astype(jnp.float32)[:, :f, :n_bins].reshape(
        *batch_dims, f, n_bins)
    im = im_f.astype(jnp.float32)[:, :f, :n_bins].reshape(
        *batch_dims, f, n_bins)
    return istft_mm(re, im, n_fft, hop_length, win_length, length=length)
