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


def frame_signal(y: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """(..., T) -> (..., frames, n_fft) overlapping frames, centre reflect-padded."""
    pad = n_fft // 2
    pad_width = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
    y = jnp.pad(y, pad_width, mode="reflect")
    n = y.shape[-1]
    frames = (n - n_fft) // hop_length + 1
    idx = jnp.arange(frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    return y[..., idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length"))
def stft(y: jax.Array, n_fft: int, hop_length: int, win_length: int) -> jax.Array:
    """Complex STFT. (..., T) -> (..., frames, n_fft//2 + 1)."""
    frames = frame_signal(y, n_fft, hop_length)
    win = _padded_window(win_length, n_fft, frames.dtype)
    return jnp.fft.rfft(frames * win, n=n_fft, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length"))
def stft_magnitude(
    y: jax.Array, n_fft: int, hop_length: int, win_length: int
) -> jax.Array:
    return jnp.abs(stft(y, n_fft, hop_length, win_length))


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

    # Overlap-add via scatter-add over flattened frame positions.
    idx = (jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]).reshape(-1)
    batch_shape = frames_t.shape[:-2]
    flat = frames_t.reshape(batch_shape + (-1,))
    y = jnp.zeros(batch_shape + (total,), frames_t.dtype).at[..., idx].add(flat)

    # Window sum-square normalisation (shared across batch).
    wss = jnp.zeros((total,), frames_t.dtype).at[idx].add(jnp.tile(win * win, n_frames))
    y = y / jnp.maximum(wss, 1e-11)

    y = y[..., pad : total - pad]
    if length is not None:
        n = y.shape[-1]
        if n < length:  # last partial hop is unrecoverable; zero-pad the tail
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - n)])
        else:
            y = y[..., :length]
    return y
