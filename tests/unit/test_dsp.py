"""DSP golden tests: jnp STFT/mel/GL vs independent numpy/scipy references.

Reference parity target: the reference's audio.py used librosa (SURVEY.md §2.1
#1 [R]); librosa is absent here, so references are hand-written numpy (mel,
framing) and scipy (FFT), per SURVEY.md §4.3 ("self-golden, frozen").
"""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from tacotron_tpu.config import AudioConfig
from tacotron_tpu.dsp import (
    amp_to_db,
    db_to_amp,
    denormalize,
    griffin_lim,
    inv_preemphasis,
    inv_spectrogram,
    istft,
    melspectrogram,
    mel_filterbank,
    normalize,
    preemphasis,
    spectrogram,
    stft,
)

CFG = AudioConfig(griffin_lim_iters=30)
SMALL = dict(n_fft=512, hop_length=128, win_length=400)


def _signal(n=8000, sr=22050, seed=0):
    rs = np.random.default_rng(seed)
    t = np.arange(n) / sr
    y = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1320 * t)
    return (y + 0.01 * rs.standard_normal(n)).astype(np.float32)


def np_stft(y, n_fft, hop, win_length):
    """Independent numpy reference: librosa-convention STFT."""
    pad = n_fft // 2
    y = np.pad(y, (pad, pad), mode="reflect")
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win_length) / win_length)
    lpad = (n_fft - win_length) // 2
    w = np.pad(w, (lpad, n_fft - win_length - lpad))
    frames = (len(y) - n_fft) // hop + 1
    out = np.empty((frames, n_fft // 2 + 1), np.complex128)
    for i in range(frames):
        seg = y[i * hop : i * hop + n_fft] * w
        out[i] = np.fft.rfft(seg, n_fft)
    return out


class TestSTFT:
    def test_matches_numpy_reference(self):
        y = _signal()
        ours = np.asarray(stft(jnp.asarray(y), **SMALL))
        ref = np_stft(y, SMALL["n_fft"], SMALL["hop_length"], SMALL["win_length"])
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_batched(self):
        y = np.stack([_signal(seed=i) for i in range(3)])
        batched = np.asarray(stft(jnp.asarray(y), **SMALL))
        for i in range(3):
            single = np.asarray(stft(jnp.asarray(y[i]), **SMALL))
            np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-5)

    def test_istft_roundtrip(self):
        y = _signal()
        spec = stft(jnp.asarray(y), **SMALL)
        rec = np.asarray(istft(spec, **SMALL, length=len(y)))
        assert rec.shape == y.shape
        # Centre region reconstructs almost exactly (NOLA); edges/tail are
        # affected by padding and the unrecoverable last partial hop.
        m = SMALL["n_fft"]
        valid = (len(y) // SMALL["hop_length"]) * SMALL["hop_length"] - m
        np.testing.assert_allclose(rec[m:valid], y[m:valid], atol=1e-3)


class TestMel:
    def test_filterbank_matches_independent_slaney(self):
        """Slaney filterbank vs a from-first-principles numpy build."""
        sr, n_fft, n_mels = 22050, 512, 20
        fb = mel_filterbank(sr, n_fft, n_mels)
        assert fb.shape == (n_mels, n_fft // 2 + 1)

        def h2m(f):
            f = np.asarray(f, float)
            with np.errstate(divide="ignore"):  # log(0) branch is unselected
                return np.where(
                    f >= 1000.0,
                    15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0),
                    3 * f / 200.0,
                )

        def m2h(m):
            m = np.asarray(m, float)
            return np.where(
                m >= 15.0, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), 200.0 * m / 3
            )

        pts = m2h(np.linspace(h2m(0.0), h2m(sr / 2), n_mels + 2))
        freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
        ref = np.zeros((n_mels, len(freqs)))
        for i in range(n_mels):
            lo, c, hi = pts[i], pts[i + 1], pts[i + 2]
            up = (freqs - lo) / (c - lo)
            down = (hi - freqs) / (hi - c)
            ref[i] = np.maximum(0, np.minimum(up, down)) * 2.0 / (hi - lo)
        np.testing.assert_allclose(fb, ref, rtol=1e-5, atol=1e-7)

    def test_melspectrogram_shape_and_range(self):
        y = jnp.asarray(_signal(n=22050))
        m = melspectrogram(y, CFG)
        assert m.shape == (22050 // CFG.hop_length + 1, CFG.n_mels)
        assert float(m.min()) >= 0.0 and float(m.max()) <= 1.0


class TestNormalization:
    def test_db_roundtrip(self):
        x = jnp.asarray([1e-4, 0.01, 0.5, 1.0, 10.0])
        np.testing.assert_allclose(np.asarray(db_to_amp(amp_to_db(x))), np.asarray(x), rtol=1e-5)

    def test_normalize_roundtrip(self):
        s = jnp.linspace(CFG.min_level_db, 0.0, 64).reshape(8, 8)
        np.testing.assert_allclose(
            np.asarray(denormalize(normalize(s, CFG), CFG)), np.asarray(s), atol=1e-4
        )


class TestPreemphasis:
    def test_matches_scipy_lfilter(self):
        y = _signal()
        ours = np.asarray(preemphasis(jnp.asarray(y), 0.97))
        ref = scipy.signal.lfilter([1.0, -0.97], [1.0], y)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_inverse_matches_scipy(self):
        y = _signal(n=2000)
        ours = np.asarray(inv_preemphasis(jnp.asarray(y), 0.97))
        ref = scipy.signal.lfilter([1.0], [1.0, -0.97], y)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_roundtrip(self):
        y = _signal(n=3000)
        rec = np.asarray(inv_preemphasis(preemphasis(jnp.asarray(y), 0.97), 0.97))
        np.testing.assert_allclose(rec, y, atol=1e-4)


class TestGriffinLim:
    def test_recovers_sinusoid(self):
        """GL on a pure tone's magnitude should reproduce a tone with the same
        spectrogram (phase-invariant check)."""
        y = _signal(n=6000)
        mag = jnp.abs(stft(jnp.asarray(y), **SMALL))

        def rel_err(n_iter):
            rec = griffin_lim(mag, **SMALL, n_iter=n_iter)
            mag_rec = jnp.abs(stft(rec, **SMALL))
            return float(jnp.linalg.norm(mag_rec - mag) / jnp.linalg.norm(mag))

        e10, e50 = rel_err(10), rel_err(50)
        assert e50 < 0.2, f"relative magnitude error {e50:.3f}"
        assert e50 < e10, "GL should converge with more iterations"

    def test_batched_matches_single(self):
        y = np.stack([_signal(seed=i, n=4000) for i in range(2)])
        mag = jnp.abs(stft(jnp.asarray(y), **SMALL))
        batched = np.asarray(griffin_lim(mag, **SMALL, n_iter=5))
        single0 = np.asarray(griffin_lim(mag[0], **SMALL, n_iter=5))
        np.testing.assert_allclose(batched[0], single0, atol=1e-4)


class TestEndToEnd:
    def test_spectrogram_inversion_preserves_content(self):
        cfg = AudioConfig(griffin_lim_iters=30)
        y = jnp.asarray(_signal(n=22050))
        s = spectrogram(y, cfg)
        assert s.shape[-1] == cfg.n_freq
        rec = inv_spectrogram(s, cfg, length=22050)
        assert rec.shape == y.shape
        # The inverted audio's spectrogram should match the input spectrogram.
        s2 = spectrogram(rec, cfg)
        corr = np.corrcoef(np.asarray(s).ravel(), np.asarray(s2).ravel())[0, 1]
        # power-1.5 sharpening intentionally distorts magnitudes, so the
        # correlation is high but not ~1 even with perfect phase recovery
        assert corr > 0.85, f"spectrogram correlation {corr:.3f}"
