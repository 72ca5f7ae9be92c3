"""Real-TPU parity + timing for the fused Pallas Griffin-Lim kernel vs the XLA
matmul-DFT path, at production geometry (config.audio: 2048/275/1102, B32x5s).

Run: python scripts/bench_pallas_gl.py [n_iter] [batch] [seconds]
Prints per-iteration ms for both paths and a magnitude-error parity check
(GL re-imposes |target| every iteration, so wavs are compared by residual
magnitude error, not sample allclose).

Axon gotcha: force host reads (float(jnp.sum(...))) to block; amortize the
whole loop inside one jit/kernel launch (fixed ~7-10 ms dispatch floor).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from tacotron_tpu.dsp.dft import griffin_lim_mm, stft_mm
from tacotron_tpu.dsp.pallas_gl import griffin_lim_pallas

KW = dict(n_fft=2048, hop_length=275, win_length=1102)


def force(x):
    return float(jnp.sum(jnp.abs(x.astype(jnp.float32))))


def mag_err(wav, mag):
    re, im = stft_mm(wav, **KW)
    m = jnp.sqrt(re**2 + im**2 + 1e-12)
    return float(jnp.mean(jnp.abs(m - mag)) / jnp.mean(mag))


def timed(fn, n=2):
    force(fn())
    t0 = time.time()
    for _ in range(n):
        r = fn()
    force(r)
    return (time.time() - t0) / n


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sec = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0

    print("devices:", jax.devices())
    rs = np.random.default_rng(0)
    y = jnp.asarray(rs.standard_normal((batch, int(22050 * sec))
                                       ).astype(np.float32))
    re, im = stft_mm(y, **KW)
    mag = jnp.sqrt(re**2 + im**2 + 1e-12)
    print("mag shape:", mag.shape)

    audio_sec = batch * sec

    t_mm = timed(lambda: griffin_lim_mm(mag, **KW, n_iter=n_iter))
    print(f"mm     : {t_mm*1e3:8.1f} ms total  {t_mm/n_iter*1e3:6.2f} ms/iter"
          f"  {audio_sec/t_mm:7.1f} audio-sec/s")

    t_pl = timed(lambda: griffin_lim_pallas(mag, **KW, n_iter=n_iter))
    print(f"pallas : {t_pl*1e3:8.1f} ms total  {t_pl/n_iter*1e3:6.2f} ms/iter"
          f"  {audio_sec/t_pl:7.1f} audio-sec/s   speedup {t_mm/t_pl:.2f}x")

    # gather-OLA A/B: aligned output stores / unaligned spectrum loads
    # (scatter does m sublane-unaligned f32 RMWs per frame tile instead)
    t_ga = timed(lambda: griffin_lim_pallas(mag, **KW, n_iter=n_iter,
                                            ola="gather"))
    print(f"gather : {t_ga*1e3:8.1f} ms total  {t_ga/n_iter*1e3:6.2f} ms/iter"
          f"  {audio_sec/t_ga:7.1f} audio-sec/s   vs scatter {t_pl/t_ga:.2f}x")

    # lane-trimmed boundary chunks (spans [128,275) and [0,256) at this
    # geometry): guarded so a Mosaic lowering failure doesn't kill the run
    try:
        t_tr = timed(lambda: griffin_lim_pallas(mag, **KW, n_iter=n_iter,
                                                trim_chunks=True))
        print(f"trim   : {t_tr*1e3:8.1f} ms total  {t_tr/n_iter*1e3:6.2f} "
              f"ms/iter  {audio_sec/t_tr:7.1f} audio-sec/s   "
              f"vs untrimmed {t_pl/t_tr:.2f}x")
    except Exception as e:
        print(f"trim   : FAILED ({type(e).__name__}: {e})")

    w_mm = griffin_lim_mm(mag, **KW, n_iter=n_iter)
    w_pl = griffin_lim_pallas(mag, **KW, n_iter=n_iter)
    e_mm, e_pl = mag_err(w_mm, mag), mag_err(w_pl, mag)
    print(f"residual magnitude error: mm {e_mm:.5f}  pallas {e_pl:.5f}")


if __name__ == "__main__":
    main()
