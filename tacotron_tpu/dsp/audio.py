"""Audio feature pipeline: wav <-> normalised log spectrograms.

TPU-native rebuild of the reference's ``audio.py`` (SURVEY.md §2.1 #1 [R]):
pre-emphasis (0.97), STFT (paper Table 1 framing), 80-band mel, log-magnitude
with dB normalisation into [0, 1], magnitude^1.5 sharpening before Griffin-Lim
inversion (paper §3.3). All transforms are pure jnp functions over batches,
jit-able end to end, so feature extraction and inversion both run on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tacotron_tpu.config import AudioConfig
from tacotron_tpu.dsp.mel import mel_filterbank
from tacotron_tpu.dsp.stft import istft, stft, stft_magnitude
from tacotron_tpu.dsp.griffin_lim import griffin_lim


def preemphasis(y: jax.Array, coef: float = 0.97) -> jax.Array:
    """y[t] - coef * y[t-1] (reference: scipy lfilter([1, -coef], [1]))."""
    return jnp.concatenate([y[..., :1], y[..., 1:] - coef * y[..., :-1]], axis=-1)


def inv_preemphasis(y: jax.Array, coef: float = 0.97) -> jax.Array:
    """Inverse IIR filter 1 / (1 - coef z^-1), as an associative scan.

    The recurrence x[t] = y[t] + coef * x[t-1] is a first-order linear
    recurrence, solved in O(log T) on TPU with ``jax.lax.associative_scan``
    instead of a sequential loop.
    """
    coefs = jnp.full(y.shape, coef, dtype=y.dtype)

    def combine(a, b):
        # pairs (A, B) represent x -> A*x + B
        a_c, a_y = a
        b_c, b_y = b
        return a_c * b_c, b_c * a_y + b_y

    _, out = jax.lax.associative_scan(combine, (coefs, y), axis=y.ndim - 1)
    return out


def amp_to_db(x: jax.Array) -> jax.Array:
    return 20.0 * jnp.log10(jnp.maximum(1e-5, x))


def db_to_amp(x: jax.Array) -> jax.Array:
    return jnp.power(10.0, x * 0.05)


def normalize(s_db: jax.Array, cfg: AudioConfig) -> jax.Array:
    return jnp.clip((s_db - cfg.min_level_db) / -cfg.min_level_db, 0.0, 1.0)


def denormalize(s: jax.Array, cfg: AudioConfig) -> jax.Array:
    return jnp.clip(s, 0.0, 1.0) * -cfg.min_level_db + cfg.min_level_db


def spectrogram(y: jax.Array, cfg: AudioConfig, *, preemph: bool = True,
                center: bool = True) -> jax.Array:
    """Waveform (..., T) -> normalised linear log-spectrogram (..., frames, n_freq).

    ``preemph=False, center=False`` is the batched-preprocess path
    (data/ljspeech.py): pre-emphasis and the centre reflect padding are then
    applied per utterance by the caller, so batch zero-padding never leaks
    into the reflected tail frames.
    """
    if preemph:
        y = preemphasis(y, cfg.preemphasis)
    mag = stft_magnitude(y, cfg.n_fft, cfg.hop_length, cfg.win_length,
                         center=center)
    return normalize(amp_to_db(mag) - cfg.ref_level_db, cfg)


def melspectrogram(y: jax.Array, cfg: AudioConfig, *, preemph: bool = True,
                   center: bool = True) -> jax.Array:
    """Waveform (..., T) -> normalised mel log-spectrogram (..., frames, n_mels)."""
    if preemph:
        y = preemphasis(y, cfg.preemphasis)
    mag = stft_magnitude(y, cfg.n_fft, cfg.hop_length, cfg.win_length,
                         center=center)
    mel = jnp.einsum(
        "...tf,mf->...tm",
        mag,
        jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)),
    )
    return normalize(amp_to_db(mel) - cfg.ref_level_db, cfg)


def inv_spectrogram(
    s: jax.Array, cfg: AudioConfig, *, n_iter: int | None = None, length: int | None = None
) -> jax.Array:
    """Normalised linear spectrogram (..., frames, n_freq) -> waveform (..., T).

    denormalise -> dB to amplitude -> magnitude^power sharpening (paper §3.3)
    -> Griffin-Lim phase recovery -> inverse pre-emphasis. Fully batched, runs
    on TPU (reference ran this on the host CPU; SURVEY.md §3.3).
    """
    mag = db_to_amp(denormalize(s, cfg) + cfg.ref_level_db)
    mag = jnp.power(mag, cfg.griffin_lim_power)
    kw = dict(
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        n_iter=cfg.griffin_lim_iters if n_iter is None else n_iter,
        length=length,
    )
    backend = cfg.gl_backend
    if backend == "pallas" and jax.default_backend() == "cpu":
        # interpret-mode Pallas is far too slow for a real GL loop; the mm
        # path is numerically equivalent (tests/unit/test_pallas_gl.py)
        backend = "mm"
    if backend == "fft":
        y = griffin_lim(mag, **kw)
    elif backend == "pallas":  # fused VMEM-resident kernel (dsp/pallas_gl.py)
        from tacotron_tpu.dsp.pallas_gl import griffin_lim_pallas

        y = griffin_lim_pallas(mag, momentum=cfg.gl_momentum,
                               trim_chunks=cfg.gl_trim_chunks, **kw)
    else:  # matmul-DFT on the MXU (see dsp/dft.py)
        from tacotron_tpu.dsp.dft import griffin_lim_mm

        # lowp keys off the EFFECTIVE backend so the pallas->mm CPU fallback
        # runs the same bf16 spectral-carry path the pallas-parity tests use
        y = griffin_lim_mm(mag, lowp=(backend == "mm"),
                           momentum=cfg.gl_momentum, **kw)
    return inv_preemphasis(y, cfg.preemphasis)
