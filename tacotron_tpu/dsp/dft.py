"""Matmul-DFT STFT/iSTFT: the MXU-native transform backend.

``jnp.fft`` lowers to XLA's generic FFT on TPU, which does not use the MXU.
For Tacotron's 2048-point real transforms the DFT-as-matmul formulation maps
the entire transform onto the systolic array: frames (B*F, n_fft) @ DFT
(n_fft, 2*(n_fft/2+1)) — with the analysis window folded into the DFT matrix
so framing -> windowing -> transform is ONE matmul. At Griffin-Lim's 1000
iterations (BASELINE.json:10) this is the vocoder's inner loop.

The synthesis direction folds the window and 1/N normalisation in likewise;
overlap-add reuses the shifted-slice fold from stft.py.

Numerics: the public stft_mm/istft_mm default to f32 (verified against
jnp.fft in tests to 1e-3) with a ``lowp`` bf16 option; the Griffin-Lim loop
defaults to bf16 operands AND a bf16 spectral carry — the loop is
HBM-bandwidth-bound, GL re-imposes the f32 target magnitude every iteration,
and the measured magnitude error is unchanged (tests + BASELINE.md).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from tacotron_tpu.dsp.stft import _padded_window, frame_signal, overlap_add


@functools.lru_cache(maxsize=4)
def _live_span(n_fft: int, win_length: int) -> tuple[int, int]:
    """128-aligned bounds of the folded window's nonzero rows [lpad,
    lpad+win_length) — the only rows/columns of the DFT matrices that carry
    window mass (see _dft_matrices). Aligned so sliced dot operands stay
    lane-aligned windows of their buffers."""
    lpad = (n_fft - win_length) // 2
    lo = lpad // 128 * 128
    hi = min(-(-(lpad + win_length) // 128) * 128, n_fft)
    return lo, hi


def _dft_matrices(n_fft: int, win_length: int):
    """(analysis (n_fft, 2*n_bins) with window folded, synthesis (2*n_bins, n_fft)
    with window + 1/N + hermitian weights folded). numpy, built once."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    cos, sin = np.cos(ang), np.sin(ang)

    # periodic Hann centred in n_fft, in pure numpy (this runs under jit trace,
    # so the jnp-based stft._padded_window cannot be used here)
    wn = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / win_length)
    lpad = (n_fft - win_length) // 2
    win = np.zeros(n_fft)
    win[lpad : lpad + win_length] = wn

    # analysis: re = (x*win) @ cos, im = -(x*win) @ sin
    fwd = np.concatenate([cos * win[:, None], -sin * win[:, None]], axis=1)

    # synthesis: x[n] = (1/N) sum_k w_k (re_k cos - im_k sin), w = 2 except DC/Nyquist
    w = np.full(n_bins, 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    inv_re = (cos * w[None, :] / n_fft).T          # (n_bins, n_fft)
    inv_im = (-sin * w[None, :] / n_fft).T
    # windowed synthesis frames (istft multiplies by window before OLA)
    bwd = np.concatenate([inv_re, inv_im], axis=0) * win[None, :]

    return fwd.astype(np.float32), bwd.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _dft_matrices_padded(n_fft: int, win_length: int):
    """Lane-aligned variants for the Griffin-Lim inner loop: the spectral dim
    2*(n_fft/2+1) is padded up to a multiple of 128 (measured on v5e: the
    unaligned 2050-wide matmul runs at 83 TFLOP/s vs 121 aligned)."""
    fwd, bwd = _dft_matrices(n_fft, win_length)
    spec_dim = fwd.shape[1]
    pad_to = -(-spec_dim // 128) * 128
    fwd_p = np.zeros((fwd.shape[0], pad_to), np.float32)
    fwd_p[:, :spec_dim] = fwd
    bwd_p = np.zeros((pad_to, bwd.shape[1]), np.float32)
    bwd_p[:spec_dim] = bwd
    return fwd_p, bwd_p


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "hop_length", "win_length", "lowp"))
def stft_mm(y: jax.Array, n_fft: int, hop_length: int, win_length: int,
            lowp: bool = False):
    """Matmul STFT -> (re, im) pair, each (..., frames, n_bins).

    ``lowp``: bf16 operands with f32 accumulation — single-pass MXU (~3x the
    f32 path's throughput, ~0.3% relative error; fine for Griffin-Lim).
    """
    frames = frame_signal(y, n_fft, hop_length)
    fwd, _ = _dft_matrices(n_fft, win_length)
    # rows outside the centred window span are zero (window folded into the
    # matrix) — contract only the live span: K 2048 -> 1280 at the production
    # geometry, a 37.5% MAC cut, exact up to f32 reduction order
    lo, hi = _live_span(n_fft, win_length)
    frames = frames[..., lo:hi]
    fwd = jnp.asarray(fwd[lo:hi])
    if lowp:
        out = jax.lax.dot_general(
            frames.astype(jnp.bfloat16), fwd.astype(jnp.bfloat16),
            (((frames.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        out = frames @ fwd  # (..., frames, 2*n_bins) one MXU matmul
    n_bins = n_fft // 2 + 1
    return out[..., :n_bins], out[..., n_bins:]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length"))
def stft_mm_magnitude(y, n_fft, hop_length, win_length):
    re, im = stft_mm(y, n_fft, hop_length, win_length)
    return jnp.sqrt(re * re + im * im + 1e-12)


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "length", "lowp")
)
def istft_mm(re: jax.Array, im: jax.Array, n_fft: int, hop_length: int,
             win_length: int, length: int | None = None, lowp: bool = False):
    """Matmul iSTFT with window-sum-square OLA (mirrors stft.istft)."""
    _, bwd = _dft_matrices(n_fft, win_length)
    # synthesis frames are windowed, so columns outside the centred window
    # span are zero — compute only the live span and zero-pad for the OLA
    lo, hi = _live_span(n_fft, win_length)
    bwd = jnp.asarray(bwd[:, lo:hi])
    spec = jnp.concatenate([re, im], axis=-1)       # (..., frames, 2*n_bins)
    if lowp:
        frames_t = jax.lax.dot_general(
            spec.astype(jnp.bfloat16), bwd.astype(jnp.bfloat16),
            (((spec.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        frames_t = spec @ bwd                        # windowed real frames
    frames_t = jnp.pad(
        frames_t, [(0, 0)] * (frames_t.ndim - 1) + [(lo, n_fft - hi)])

    n_frames = frames_t.shape[-2]
    pad = n_fft // 2
    total = n_fft + hop_length * (n_frames - 1)
    y = overlap_add(frames_t, hop_length)

    win = _padded_window(win_length, n_fft, frames_t.dtype)
    wss = overlap_add(jnp.broadcast_to(win * win, (n_frames, n_fft)), hop_length)
    y = y / jnp.maximum(wss, 1e-11)

    y = y[..., pad : total - pad]
    if length is not None:
        n = y.shape[-1]
        if n < length:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - n)])
        else:
            y = y[..., :length]
    return y


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "n_iter", "length",
                     "lowp", "momentum"),
)
def griffin_lim_mm(magnitude: jax.Array, *, n_fft: int, hop_length: int,
                   win_length: int, n_iter: int = 60,
                   length: int | None = None, lowp: bool = True,
                   momentum: float = 0.0) -> jax.Array:
    """Griffin-Lim over the matmul transforms: every iteration is two MXU
    matmuls + OLA, no XLA FFT anywhere. bf16 single-pass matmuls by default
    (GL re-imposes the target magnitude every iteration, so transform noise
    does not accumulate; verified against the f32 path in tests).

    ``momentum``: Fast Griffin-Lim (Perraudin et al. 2013) over-relaxation —
    the projection input is extrapolated by beta*(c_t - c_{t-1}). beta ~0.99
    reaches vanilla-GL-at-1000-iters quality in ~100 iterations (verified in
    tests + BASELINE.md); 0.0 is exact vanilla GL for the parity config.
    """
    mag = magnitude.astype(jnp.float32)
    beta = float(momentum)
    n_bins = n_fft // 2 + 1

    # Inner loop in flat 2-D with lane-aligned spectral dim (see
    # _dft_matrices_padded): (B*F, pad) @ (pad, n_fft) and back — measured
    # ~1.5x over the unaligned 3-D formulation on v5e.
    fwd_p, bwd_p = _dft_matrices_padded(n_fft, win_length)
    mdtype = jnp.bfloat16 if lowp else jnp.float32
    fwd_j = jnp.asarray(fwd_p).astype(mdtype)
    bwd_j = jnp.asarray(bwd_p).astype(mdtype)
    pad_dim = fwd_p.shape[1]

    *batch, f, _ = mag.shape
    bf = int(np.prod(batch, dtype=np.int64)) if batch else 1
    mag2 = mag.reshape(bf, f, n_bins)
    win = _padded_window(win_length, n_fft, jnp.float32)
    wss = overlap_add(jnp.broadcast_to(win * win, (f, n_fft)), hop_length)
    wss = jnp.maximum(wss, 1e-11)
    pad = n_fft // 2

    def synth_frames(spec_pad):
        """(BF, F, pad_dim) spectral -> (BF, F, n_fft) analysis frames."""
        frames_t = jnp.dot(spec_pad.reshape(bf * f, pad_dim).astype(mdtype),
                           bwd_j, preferred_element_type=jnp.float32)
        frames_t = frames_t.astype(cdtype)
        y = overlap_add(frames_t.reshape(bf, f, n_fft), hop_length) / wss.astype(cdtype)
        # interior estimate -> centre reflect-padded frames, as stft does
        y = y[..., pad:-pad]
        return frame_signal(y, n_fft, hop_length)

    # On the fast path the carried spectral state is bf16: GL re-imposes the
    # f32 target magnitude every iteration, so only phase rides bf16, and the
    # loop is HBM-bandwidth-bound — halving the carried bytes is the lever.
    cdtype = mdtype

    def project(spec_pad):
        frames = synth_frames(spec_pad)
        out = jnp.dot(frames.reshape(bf * f, n_fft).astype(mdtype), fwd_j,
                      preferred_element_type=jnp.float32).reshape(bf, f, pad_dim)
        re, im = out[..., :n_bins], out[..., n_bins : 2 * n_bins]
        scale = mag2 / jnp.maximum(jnp.sqrt(re * re + im * im), 1e-8)
        return jnp.concatenate(
            [re * scale, im * scale,
             jnp.zeros((bf, f, pad_dim - 2 * n_bins), jnp.float32)],
            axis=-1).astype(cdtype)

    spec0 = jnp.concatenate(
        [mag2, jnp.zeros((bf, f, pad_dim - n_bins), jnp.float32)],
        axis=-1).astype(cdtype)
    if beta == 0.0:
        spec = jax.lax.fori_loop(0, n_iter, lambda _, s: project(s), spec0)
    else:
        def body(_, carry):
            s, prev = carry
            cur = project(s + beta * (s - prev))
            return cur, s

        spec, _ = jax.lax.fori_loop(0, n_iter, body, (spec0, spec0))

    re = spec[..., :n_bins].reshape(*batch, f, n_bins)
    im = spec[..., n_bins : 2 * n_bins].reshape(*batch, f, n_bins)
    return istft_mm(re, im, n_fft, hop_length, win_length, length=length)
