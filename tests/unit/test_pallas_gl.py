"""Pallas Griffin-Lim kernel: interpret-mode parity vs the XLA matmul-DFT path.

Gates (SURVEY.md §4.3 "Pallas kernels" layer): every kernel gets an
interpret=True CPU test against its XLA reference implementation. The TPU
allclose + benchmark runs live in scripts/roofline_report.py / bench.py.

Small transform geometry (n_fft=256, hop=48, win=190) keeps CPU time down
while exercising every structural feature of the real (2048/275/1102) config:
hop does not divide n_fft, win < n_fft (centred padding), odd chunk count,
partial last chunk, reflect edges spanning multiple hop blocks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron_tpu.dsp.dft import griffin_lim_mm, istft_mm, stft_mm
from tacotron_tpu.dsp.pallas_gl import _gl_plan, griffin_lim_pallas
from tacotron_tpu.dsp.stft import istft, stft

KW = dict(n_fft=256, hop_length=48, win_length=190)


def _mag(batch=2, t=4096, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.standard_normal((batch, t)).astype(np.float32)
    # band-limit a little so magnitudes aren't white
    y = np.cumsum(y, axis=-1) * 0.1
    y -= y.mean(axis=-1, keepdims=True)
    re, im = stft_mm(jnp.asarray(y), **KW)
    return jnp.sqrt(re**2 + im**2 + 1e-12)


def test_reflect_plan_matches_np_pad():
    plan = _gl_plan(KW["n_fft"], KW["hop_length"], KW["win_length"], 40)
    hop, nb, pad = plan.hop, plan.n_blocks, plan.n_fft // 2
    ty = plan.n_fft + hop * (plan.n_frames - 1)
    rng = np.random.default_rng(1)
    yn = rng.standard_normal(nb * hop).astype(np.float32)
    yn[ty:] = 0.0

    want = yn.copy()
    want[:ty] = np.pad(yn[pad:ty - pad], pad, mode="reflect")

    got = yn.reshape(nb, hop).copy()
    blocks = yn.reshape(nb, hop)
    new_rows = {}
    for i, row in enumerate(plan.refl_rows):
        r = np.zeros(hop, np.float32)
        for src, mi in row.sources:
            r += blocks[src] @ plan.p_mats[mi]
        mask = plan.refl_masks[i]
        new_rows[row.target] = mask * r + (1 - mask) * blocks[row.target]
    for t, r in new_rows.items():
        got[t] = r
    np.testing.assert_allclose(got.reshape(-1)[:ty], want[:ty], atol=1e-6)


def test_plan_transform_matches_stft():
    """One full-precision synthesis+analysis pass through the plan's
    twiddle-factored chunked matmuls (numpy) must equal istft->stft."""
    f = 40
    plan = _gl_plan(KW["n_fft"], KW["hop_length"], KW["win_length"],
                    n_frames=f)
    sh = plan.s_half
    fp = plan.f_pad
    n_bins = plan.n_fft // 2 + 1
    rng = np.random.default_rng(2)
    re = rng.standard_normal((f, n_bins)).astype(np.float32)
    im = rng.standard_normal((f, n_bins)).astype(np.float32)
    im[:, 0] = 0
    im[:, -1] = 0

    re_s = np.zeros((fp, sh), np.float32)
    im_s = np.zeros((fp, sh), np.float32)
    re_s[:f, :n_bins] = re
    im_s[:f, :n_bins] = im

    # synthesis (wn folded into syn_c/syn_s); e_cat = [cos | -sin] fused
    e_cos, e_msin = plan.e_cat[:, :sh], plan.e_cat[:, sh:]
    y = np.zeros((plan.n_blocks, plan.hop), np.float32)
    win = plan.win_chunks
    for j in range(plan.m):
        rot_re = re_s * plan.syn_c[j] - im_s * plan.syn_s[j]
        rot_im = re_s * plan.syn_s[j] + im_s * plan.syn_c[j]
        chunk = rot_re @ e_cos.T + rot_im @ e_msin.T
        y[j:j + fp] += chunk * win[j]
    yn = y * plan.invwss
    # reflect
    for i, row in enumerate(plan.refl_rows):
        r = np.zeros(plan.hop, np.float32)
        for src, mi in row.sources:
            r += yn[src] @ plan.p_mats[mi]
        mask = plan.refl_masks[i]
        yn[row.target] = mask * r + (1 - mask) * yn[row.target]
    # analysis
    acc_re = np.zeros((fp, sh), np.float32)
    acc_im = np.zeros((fp, sh), np.float32)
    for j in range(plan.m):
        seg = yn[j:j + fp] * win[j]
        cs_c = seg @ e_cos
        cs_m = seg @ e_msin
        acc_re += cs_c * plan.cos_a[j] + cs_m * plan.sin_a[j]
        acc_im += cs_m * plan.cos_a[j] - cs_c * plan.sin_a[j]

    # reference: istft -> stft in f32 via the golden-tested jnp path
    wav = istft(jnp.asarray(re + 1j * im), **KW)
    ref = stft(wav, **KW)
    np.testing.assert_allclose(acc_re[:f, :n_bins], np.real(ref), atol=2e-3)
    np.testing.assert_allclose(acc_im[:f, :n_bins], np.imag(ref), atol=2e-3)
    # padded frame rows must stay exactly zero through the round trip
    np.testing.assert_array_equal(acc_re[f:], 0.0)
    np.testing.assert_array_equal(acc_im[f:], 0.0)


@pytest.mark.parametrize("inner", [1, None])
def test_kernel_matches_mm_f32(inner):
    """Interpret-mode kernel in f32 vs griffin_lim_mm(lowp=False)."""
    mag = _mag()
    n_iter = 4
    want = griffin_lim_mm(mag, **KW, n_iter=n_iter, lowp=False)
    got = griffin_lim_pallas(mag, **KW, n_iter=n_iter, inner=inner,
                             lowp=False, interpret=True)
    assert got.shape == want.shape
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale, atol=5e-4)


def test_kernel_momentum_matches_mm_f32():
    mag = _mag(seed=3)
    n_iter = 5
    want = griffin_lim_mm(mag, **KW, n_iter=n_iter, lowp=False, momentum=0.9)
    # lowp=False isolates structure from bf16 noise; momentum path needs
    # inner=None (single launch carries prev in VMEM)
    got = griffin_lim_pallas(mag, **KW, n_iter=n_iter, momentum=0.9,
                             lowp=False, interpret=True)
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale, atol=5e-4)


def test_kernel_bf16_converges_like_f32():
    """The production bf16 kernel must reach the same magnitude error as the
    f32 reference loop (GL re-imposes |target| each iteration, so transform
    noise must not accumulate). Mirrors the test_dft.py lowp gate."""
    mag = _mag(seed=4)
    n_iter = 30
    ref = griffin_lim_mm(mag, **KW, n_iter=n_iter, lowp=False)
    got = griffin_lim_pallas(mag, **KW, n_iter=n_iter, lowp=True,
                             interpret=True)

    def mag_err(wav):
        re, im = stft_mm(wav, **KW)
        m = jnp.sqrt(re**2 + im**2 + 1e-12)
        return float(jnp.mean(jnp.abs(m - mag)) / jnp.mean(mag))

    e_ref, e_got = mag_err(ref), mag_err(got)
    assert e_got < e_ref * 1.05 + 1e-3, (e_got, e_ref)


@pytest.mark.parametrize("momentum", [0.0, 0.9])
def test_gather_ola_matches_scatter(momentum):
    """The gather-OLA synthesis formulation (aligned output stores, unaligned
    spectrum loads) must match the default scatter formulation. t=8192 gives
    ~171 frames = two _FRAME_TILE tiles, exercising the clipped top/bottom
    chunk windows at tile boundaries as well as at the signal edges."""
    mag = _mag(batch=1, t=8192, seed=5)
    n_iter = 3
    want = griffin_lim_pallas(mag, **KW, n_iter=n_iter, momentum=momentum,
                              lowp=False, interpret=True)
    got = griffin_lim_pallas(mag, **KW, n_iter=n_iter, momentum=momentum,
                             lowp=False, interpret=True, ola="gather")
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale, atol=1e-5)


def test_too_short_signal_raises_valueerror():
    """2-4-frame magnitudes cannot centre-reflect (source index would leave
    the interior); must be a ValueError with the true minimum, not an assert."""
    # production geometry (2048/275): minimum is 5 frames
    with pytest.raises(ValueError, match="n_frames >= 5"):
        _gl_plan(2048, 275, 1102, n_frames=4)
    # this file's small geometry (256/48): minimum is 4
    with pytest.raises(ValueError, match="n_frames >= 4"):
        _gl_plan(KW["n_fft"], KW["hop_length"], KW["win_length"], n_frames=3)
    _gl_plan(KW["n_fft"], KW["hop_length"], KW["win_length"], n_frames=4)


def test_dead_window_chunks_are_skipped():
    """Chunks whose window slice is all zero are statically dropped from both
    passes; the remaining chunks must still cover every nonzero window row.
    At the production geometry (2048/275/1102) 3 of 8 chunks are dead."""
    plan = _gl_plan(KW["n_fft"], KW["hop_length"], KW["win_length"], 40)
    assert [j for j, _, _ in plan.chunk_spans] == [0, 1, 2, 3, 4]  # 5 dead
    prod = _gl_plan(2048, 275, 1102, 408)
    assert [j for j, _, _ in prod.chunk_spans] == [1, 2, 3, 4, 5]  # 0,6,7 dead
    for p in (plan, prod):
        live = np.zeros(p.m * p.hop, bool)
        for j, _, _ in p.chunk_spans:
            live[j * p.hop:(j + 1) * p.hop] = True
        w = p.win_chunks.reshape(-1)
        assert not w[~live].any()                    # dropped rows truly zero
        assert w[live].any()


@pytest.mark.parametrize("ola", ["scatter", "gather"])
def test_trimmed_boundary_chunks_match_untrimmed(ola):
    """Lane-trimming the partially-live boundary chunks is exact. Geometry
    chosen so trimming actually bites (hop >= LANE): 512/160/256 gives
    spans chunk0 [128,160), chunk1 full, chunk2 [0,128), chunk3 dead."""
    kw = dict(n_fft=512, hop_length=160, win_length=256)
    plan = _gl_plan(kw["n_fft"], kw["hop_length"], kw["win_length"], 24,
                    trim=True)
    assert plan.chunk_spans == ((0, 128, 160), (1, 0, 160), (2, 0, 128))
    rs = np.random.default_rng(11)
    y = jnp.asarray(rs.standard_normal((2, 160 * 24)).astype(np.float32))
    re, im = stft_mm(y, **kw)
    mag = jnp.sqrt(re**2 + im**2 + 1e-12)
    want = griffin_lim_pallas(mag, **kw, n_iter=4, interpret=True, lowp=False,
                              ola=ola, trim_chunks=False)
    got = griffin_lim_pallas(mag, **kw, n_iter=4, interpret=True, lowp=False,
                             ola=ola, trim_chunks=True)
    # trimming drops only exact-zero window terms, but the shorter dot
    # contractions reassociate f32 partial sums and GL's |spec| normalisation
    # amplifies that near small bins — same 5e-4 scale tolerance as the
    # kernel-vs-mm parity tests above
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale, atol=5e-4)
