"""Roofline report for the three named kernels (BASELINE.json:5; SURVEY.md §5.1).

Times each kernel steady-state on the real chip and prints achieved vs peak
(speed-of-light) accounting via utils/roofline. Appends a JSON line per kernel.

Run: python scripts/roofline_report.py   (uses the axon TPU; slow first compile)
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from tacotron_tpu.config import get_config
from tacotron_tpu.utils.roofline import (
    KernelRoofline, conv_bank_flops, decode_step_flops, gl_iteration_flops,
)


def force(x):
    return float(jnp.sum(jnp.abs(x)))


def timed(fn, n=3):
    force(fn())
    t0 = time.time()
    for _ in range(n):
        r = fn()
    force(r)
    return (time.time() - t0) / n


def main():
    results = []

    # ---- STFT / Griffin-Lim iteration (matmul-DFT backend)
    from tacotron_tpu.dsp.stft import stft
    from tacotron_tpu.dsp.dft import griffin_lim_mm

    kw = dict(n_fft=2048, hop_length=275, win_length=1102)
    B, sec = 32, 5
    rs = np.random.default_rng(0)
    y = jnp.asarray(rs.standard_normal((B, 22050 * sec)).astype(np.float32))
    mag = jnp.abs(stft(y, **kw))
    frames = mag.shape[1]

    n_iter = 50
    t_gl = timed(lambda: griffin_lim_mm(mag, **kw, n_iter=n_iter), n=2)
    per_iter = t_gl / n_iter
    fl = gl_iteration_flops(B, frames, kw["n_fft"], kw["win_length"])
    # bytes: ALL intermediate arrays the iteration materialises, not just the
    # matmul operands — the loop is HBM-bandwidth-bound in practice (spec
    # carry r/w, frames write+read both directions, projection read+write,
    # all bf16) + both DFT matrices read once per iteration
    frame_bytes = B * frames * 2048 * 2
    spec_bytes = B * frames * 2304 * 2
    byts = (2 * spec_bytes              # carry read + write
            + 4 * frame_bytes           # frames w+r, analysis frames w+r
            + 2 * spec_bytes            # projection out w + r
            + 2 * (2048 * 2304 * 2))    # fwd+bwd matrices
    results.append(KernelRoofline("griffin_lim_iteration(mm,bf16)", fl, byts,
                                  per_iter).report())

    # ---- Griffin-Lim iteration (fused Pallas VMEM-resident kernel).
    # Time at two iteration counts and difference out the fixed costs (final
    # f32 iSTFT, init DMA) to isolate the per-iteration kernel cost.
    from tacotron_tpu.dsp.pallas_gl import griffin_lim_pallas, _gl_plan

    t_p100 = timed(lambda: griffin_lim_pallas(mag, **kw, n_iter=100), n=2)
    t_p50 = timed(lambda: griffin_lim_pallas(mag, **kw, n_iter=50), n=2)
    per_iter_p = (t_p100 - t_p50) / 50
    from tacotron_tpu.dsp.pallas_gl import _flops_iter

    plan = _gl_plan(kw["n_fft"], kw["hop_length"], kw["win_length"], frames)
    # true MXU work of the hop-chunk factorisation — the kernel's own
    # accounting (live chunks / live lane spans), kept in one place
    fl_p = _flops_iter(plan, B)
    # HBM traffic amortises to ~zero: the spectrum carry lives in VMEM across
    # all iterations; charge the one-time mag in + spectrum out over 50 iters
    byts_p = B * plan.f_pad * plan.s_half * (4 + 2 * 2) / 50
    results.append(KernelRoofline("griffin_lim_iteration(pallas,fused)", fl_p,
                                  byts_p, per_iter_p).report())

    # ---- conv bank (packed single-conv form) fwd
    from tacotron_tpu.ops.modules import ConvBank

    bank = ConvBank(k=16, channels=128, train=False, packed=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 128, 128))
    variables = bank.init(jax.random.PRNGKey(1), x)

    # amortise inside ONE jit: single-dispatch timings on axon carry a
    # ~7-10 ms fixed roundtrip floor that swamps sub-ms kernels
    N_IN = 20

    @jax.jit
    def bank_loop(v, x):
        def body(i, acc):
            y = bank.apply(v, x + acc * 1e-9)
            return acc + jnp.sum(y) * 1e-12
        return jax.lax.fori_loop(0, N_IN, body, jnp.float32(0))

    t_bank = timed(lambda: bank_loop(variables, x)) / N_IN
    fl = conv_bank_flops(32, 128, 128, 16, 128, packed=True)
    byts = (32 * 128 * 128 + 16 * 128 * 16 * 128 + 32 * 128 * 2048) * 4
    results.append(KernelRoofline("conv_bank_K16(packed)", fl, byts,
                                  t_bank).report())

    bank_u = ConvBank(k=16, channels=128, train=False, packed=False)

    @jax.jit
    def bank_loop_u(v, x):
        def body(i, acc):
            y = bank_u.apply(v, x + acc * 1e-9)
            return acc + jnp.sum(y) * 1e-12
        return jax.lax.fori_loop(0, N_IN, body, jnp.float32(0))

    t_bank_u = timed(lambda: bank_loop_u(variables, x)) / N_IN
    results.append(KernelRoofline("conv_bank_K16(unpacked,16 convs)",
                                  conv_bank_flops(32, 128, 128, 16, 128, packed=False),
                                  byts, t_bank_u).report())

    # grouped packing sweep: fewer structural-zero taps per extra conv.
    # MACs per group (lo,hi]: T*hi*(hi-lo)*ch*c_in; bounds and weight bytes
    # come from the module's own partition rule
    from tacotron_tpu.ops.modules import conv_bank_group_bounds

    for g in (2, 4):
        bank_g = ConvBank(k=16, channels=128, train=False, packed=True,
                          groups=g)

        @jax.jit
        def bank_loop_g(v, x, bank_g=bank_g):
            def body(i, acc):
                y = bank_g.apply(v, x + acc * 1e-9)
                return acc + jnp.sum(y) * 1e-12
            return jax.lax.fori_loop(0, N_IN, body, jnp.float32(0))

        t_bank_g = timed(lambda: bank_loop_g(variables, x)) / N_IN
        spans = conv_bank_group_bounds(16, g)
        fl_g = sum(2 * 32 * 128 * hi * (hi - lo) * 128 * 128
                   for lo, hi in spans)
        wt_g = sum(hi * 128 * (hi - lo) * 128 for lo, hi in spans) * 4
        byts_g = (32 * 128 * 128 + 32 * 128 * 2048) * 4 + wt_g
        results.append(KernelRoofline(f"conv_bank_K16(groups={g})", fl_g,
                                      byts_g, t_bank_g).report())

    # ---- fused decode step (Pallas, no alignments, bt=32)
    from tacotron_tpu.models import Tacotron
    from tacotron_tpu.ops.pallas.decode_loop import (
        decode_loop, pack_decoder_weights,
    )

    cfg = dataclasses.replace(get_config("full_1chip").model, vocab_size=64)
    model = Tacotron(cfg, train=False)
    text = jnp.ones((32, 128), jnp.int32)
    lens = jnp.full((32,), 128, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, lens, gt_mel=jnp.zeros((32, 2 * cfg.r, cfg.n_mels)),
    )
    w = pack_decoder_weights(variables["params"]["decoder"]["cell"])
    mem = jax.random.normal(jax.random.PRNGKey(2), (32, 128, 256))
    keys = jax.random.normal(jax.random.PRNGKey(3), (32, 128, 256))
    n_steps = 200
    t_dec = timed(lambda: decode_loop(mem, keys, None, w, n_steps=n_steps,
                                      dropout=False,
                                      collect_alignments=False)[0], n=2)
    per_step = t_dec / n_steps
    fl = decode_step_flops(32, 128)
    byts = 1_600_000 * 2  # bf16 weights re-read once per batch tile, amortised
    results.append(KernelRoofline("fused_decode_step(bt=32)", fl,
                                  byts / n_steps, per_step).report())

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
