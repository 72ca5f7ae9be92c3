"""Batched STFT / iSTFT in JAX.

The reference delegates STFT to librosa's C FFT on the host CPU (SURVEY.md §2.2
[R]); here it is a pure-jnp, jit-able, batched transform so spectrogram
extraction and Griffin-Lim run on TPU. Semantics follow the librosa convention
the reference relied on: centre-padded (reflect), periodic Hann window of
``win_length`` zero-padded to ``n_fft``, one-sided rFFT.

Everything is static-shaped: the frame count is a function of the (static)
input length, so the whole pipeline stays jit-compatible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic (sym=False) Hann window, matching librosa/scipy ``hann``."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _padded_window(win_length: int, n_fft: int, dtype=jnp.float32) -> jax.Array:
    """Window centred in an n_fft-long buffer (librosa pad_center)."""
    w = hann_window(win_length, dtype)
    lpad = (n_fft - win_length) // 2
    return jnp.pad(w, (lpad, n_fft - win_length - lpad))


def num_frames(n_samples: int, hop_length: int) -> int:
    """Frame count for a centre-padded signal of static length."""
    return n_samples // hop_length + 1


def frame_signal(y: jax.Array, n_fft: int, hop_length: int,
                 center: bool = True) -> jax.Array:
    """(..., T) -> (..., frames, n_fft) overlapping frames.

    ``center=True`` reflect-pads by n_fft//2 first (librosa center
    semantics); ``center=False`` frames the signal as-is (callers that
    pre-padded per utterance, e.g. data/ljspeech.py batched extraction).

    Framing is built from hop-sized blocks with m = ceil(n_fft/hop) static
    shifted slices (the exact adjoint of overlap_add) instead of a fancy-index
    gather — gathers serialize on TPU and dominated Griffin-Lim profiles.
    """
    if center:
        pad = n_fft // 2
        pad_width = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
        y = jnp.pad(y, pad_width, mode="reflect")
    n = y.shape[-1]
    f = (n - n_fft) // hop_length + 1
    m = -(-n_fft // hop_length)
    total = (f + m) * hop_length
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, total - n)])
    blocks = y.reshape(*y.shape[:-1], f + m, hop_length)
    parts = [blocks[..., j : j + f, :] for j in range(m)]
    frames = jnp.concatenate(parts, axis=-1)   # (..., f, m*hop)
    return frames[..., :n_fft]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length",
                                             "win_length", "center"))
def stft(y: jax.Array, n_fft: int, hop_length: int, win_length: int,
         center: bool = True) -> jax.Array:
    """Complex STFT. (..., T) -> (..., frames, n_fft//2 + 1)."""
    frames = frame_signal(y, n_fft, hop_length, center=center)
    win = _padded_window(win_length, n_fft, frames.dtype)
    return jnp.fft.rfft(frames * win, n=n_fft, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length",
                                             "win_length", "center"))
def stft_magnitude(
    y: jax.Array, n_fft: int, hop_length: int, win_length: int,
    center: bool = True
) -> jax.Array:
    return jnp.abs(stft(y, n_fft, hop_length, win_length, center=center))


def overlap_add(frames_t: jax.Array, hop_length: int) -> jax.Array:
    """OLA without scatter: (..., F, n_fft) -> (..., n_fft + hop*(F-1)).

    A scatter-add OLA serializes on TPU (measured: it dominated Griffin-Lim).
    Instead, pad each frame to a multiple of hop, split into m = ceil(n_fft/
    hop) hop-sized chunks, and add chunk j into output block row i+j — m
    shifted adds of dense (F, hop) arrays, all VPU-vectorised.
    """
    *batch, f, n_fft = frames_t.shape
    m = -(-n_fft // hop_length)              # chunks per frame
    p = m * hop_length
    fr = jnp.pad(frames_t, [(0, 0)] * len(batch) + [(0, 0), (0, p - n_fft)])
    fr = fr.reshape(*batch, f, m, hop_length)
    out = jnp.zeros((*batch, f + m, hop_length), frames_t.dtype)
    for j in range(m):
        out = out.at[..., j : j + f, :].add(fr[..., :, j, :])
    total = n_fft + hop_length * (f - 1)
    return out.reshape(*batch, (f + m) * hop_length)[..., :total]


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "length")
)
def istft(
    spec: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    length: int | None = None,
) -> jax.Array:
    """Inverse STFT with window-sum-square normalisation (Griffin-Lim style).

    (..., frames, n_fft//2+1) complex -> (..., T) real. Matches librosa.istft
    (center=True): output length = (frames - 1) * hop_length unless ``length``.
    """
    frames_t = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # (..., frames, n_fft)
    win = _padded_window(win_length, n_fft, frames_t.dtype)
    frames_t = frames_t * win

    n_frames = spec.shape[-2]
    pad = n_fft // 2
    total = n_fft + hop_length * (n_frames - 1)

    y = overlap_add(frames_t, hop_length)

    # Window sum-square normalisation (shared across batch).
    wss = overlap_add(jnp.broadcast_to(win * win, (n_frames, n_fft)), hop_length)
    y = y / jnp.maximum(wss, 1e-11)

    y = y[..., pad : total - pad]
    if length is not None:
        n = y.shape[-1]
        if n < length:  # last partial hop is unrecoverable; zero-pad the tail
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - n)])
        else:
            y = y[..., :length]
    return y
