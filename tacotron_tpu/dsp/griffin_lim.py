"""Batched Griffin-Lim phase recovery on device.

The reference runs ~1000 Griffin-Lim iterations per utterance on the host CPU
via librosa istft/stft (SURVEY.md §3.3 [R]) — the dominant inference cost. Here
the loop is a ``lax.fori_loop`` over the batched jnp iSTFT/STFT pair, so the
whole vocoder is one jitted device computation; batching across utterances is
what buys audio-seconds/s throughput (BASELINE.json:2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tacotron_tpu.dsp.stft import istft, stft


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "n_iter", "length"),
)
def griffin_lim(
    magnitude: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_iter: int = 60,
    length: int | None = None,
) -> jax.Array:
    """Recover a waveform from a magnitude spectrogram (..., frames, n_freq).

    Classic alternating projection: start from zero phase, repeatedly iSTFT ->
    STFT and keep only the phase, re-imposing the target magnitude.
    """
    mag = magnitude.astype(jnp.float32)
    spec = mag.astype(jnp.complex64)  # zero initial phase

    def body(_, spec):
        y = istft(spec, n_fft, hop_length, win_length)
        rebuilt = stft(y, n_fft, hop_length, win_length)
        # keep phase, impose magnitude
        phase = rebuilt / jnp.maximum(jnp.abs(rebuilt), 1e-8)
        # rebuilt may have one fewer frame than mag if lengths round; shapes
        # here are static and istft/stft round-trip preserves frame count.
        return mag * phase

    spec = jax.lax.fori_loop(0, n_iter, body, spec)
    return istft(spec, n_fft, hop_length, win_length, length=length)
