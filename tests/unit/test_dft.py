"""Matmul-DFT backend vs the jnp.fft reference implementation."""

import numpy as np

import jax.numpy as jnp

from tacotron_tpu.dsp.stft import stft, istft
from tacotron_tpu.dsp.dft import stft_mm, istft_mm, stft_mm_magnitude, griffin_lim_mm
from tacotron_tpu.dsp.griffin_lim import griffin_lim

SMALL = dict(n_fft=512, hop_length=128, win_length=400)


def _signal(n=6000, seed=0):
    rs = np.random.default_rng(seed)
    t = np.arange(n) / 22050
    return (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.01 * rs.standard_normal(n)).astype(np.float32)


def test_stft_mm_matches_fft():
    y = jnp.asarray(_signal())
    ref = stft(y, **SMALL)
    re, im = stft_mm(y, **SMALL)
    np.testing.assert_allclose(np.asarray(re), np.asarray(ref.real), atol=2e-3)
    np.testing.assert_allclose(np.asarray(im), np.asarray(ref.imag), atol=2e-3)


def test_magnitude_matches():
    y = jnp.asarray(_signal())
    ref = jnp.abs(stft(y, **SMALL))
    mag = stft_mm_magnitude(y, **SMALL)
    np.testing.assert_allclose(np.asarray(mag), np.asarray(ref), atol=2e-3)


def test_istft_mm_matches_fft_istft():
    y = jnp.asarray(_signal())
    spec = stft(y, **SMALL)
    ref = istft(spec, **SMALL, length=6000)
    out = istft_mm(spec.real, spec.imag, **SMALL, length=6000)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_batched():
    y = jnp.asarray(np.stack([_signal(seed=i) for i in range(3)]))
    re, im = stft_mm(y, **SMALL)
    re0, im0 = stft_mm(y[0], **SMALL)
    np.testing.assert_allclose(np.asarray(re[0]), np.asarray(re0), atol=1e-4)


def test_griffin_lim_mm_converges_like_fft_gl():
    y = jnp.asarray(_signal(n=4000))
    mag = jnp.abs(stft(y, **SMALL))

    def err(rec):
        m2 = jnp.abs(stft(rec, **SMALL))
        return float(jnp.linalg.norm(m2 - mag) / jnp.linalg.norm(mag))

    e_mm = err(griffin_lim_mm(mag, **SMALL, n_iter=30))
    e_fft = err(griffin_lim(mag, **SMALL, n_iter=30))
    assert e_mm < e_fft * 1.2 + 0.02, f"mm GL {e_mm:.3f} vs fft GL {e_fft:.3f}"


def test_fast_gl_momentum_converges_faster():
    """FGLA at 30 iters should beat vanilla at 30 and approach vanilla at ~100."""
    y = jnp.asarray(_signal(n=4000))
    mag = jnp.abs(stft(y, **SMALL))

    def err(rec):
        m2 = jnp.abs(stft(rec, **SMALL))
        return float(jnp.linalg.norm(m2 - mag) / jnp.linalg.norm(mag))

    e_vanilla30 = err(griffin_lim_mm(mag, **SMALL, n_iter=30, momentum=0.0))
    e_fast30 = err(griffin_lim_mm(mag, **SMALL, n_iter=30, momentum=0.99))
    e_vanilla100 = err(griffin_lim_mm(mag, **SMALL, n_iter=100, momentum=0.0))
    assert e_fast30 < e_vanilla30, (e_fast30, e_vanilla30)
    assert e_fast30 < e_vanilla100 * 1.5, (e_fast30, e_vanilla100)


def test_momentum_zero_is_vanilla():
    y = jnp.asarray(_signal(n=3000))
    mag = jnp.abs(stft(y, **SMALL))
    a = griffin_lim_mm(mag, **SMALL, n_iter=10, momentum=0.0)
    b = griffin_lim_mm(mag, **SMALL, n_iter=10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
