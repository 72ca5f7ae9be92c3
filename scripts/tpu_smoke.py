"""TPU hardware validation + microbenchmarks for the Pallas/matmul paths.

Runs on the real chip (axon). Covers what CPU interpret tests cannot:
- fused decode kernel compiles and matches the XLA scan on TPU (dropout off)
- on-chip PRNG dropout determinism per seed
- fused decode vs XLA scan decode latency
- matmul-DFT Griffin-Lim vs jnp.fft Griffin-Lim accuracy + speed

NOTE: timings force completion with a host read; block_until_ready is not
reliable on the axon platform.
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from tacotron_tpu.config import get_config
from tacotron_tpu.models import Tacotron
from tacotron_tpu.ops.pallas.decode_loop import decode_loop, pack_decoder_weights
from tacotron_tpu.dsp.stft import stft
from tacotron_tpu.dsp.griffin_lim import griffin_lim
from tacotron_tpu.dsp.dft import griffin_lim_mm


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
    print("devices:", jax.devices())
    cfg = dataclasses.replace(get_config("full_1chip").model,
                              vocab_size=64, prenet_dropout=0.0)
    b, t_in, n_steps = 32, 128, 200
    model = Tacotron(cfg, train=False)
    text = jax.random.randint(jax.random.PRNGKey(0), (b, t_in), 1, 30)
    lengths = jnp.full((b,), t_in, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        text, lengths, gt_mel=jnp.zeros((b, 2 * cfg.r, cfg.n_mels)),
    )

    # --- encoder outputs once
    from tacotron_tpu.models.encoder import Encoder
    enc = Encoder(cfg, train=False)
    memory = enc.apply(
        {"params": variables["params"]["encoder"],
         "batch_stats": variables["batch_stats"]["encoder"]},
        text, lengths, rngs={"dropout": jax.random.PRNGKey(9)},
    )
    keys = memory @ variables["params"]["memory_proj"]["kernel"]
    mask = jnp.arange(t_in)[None, :] < lengths[:, None]
    w = pack_decoder_weights(variables["params"]["decoder"]["cell"])

    # --- correctness: fused kernel vs flax scan on TPU
    out = model.apply(variables, text, lengths, n_steps=n_steps,
                      rngs={"dropout": jax.random.PRNGKey(3)})
    frames, aligns = decode_loop(memory, keys, mask, w, n_steps=n_steps,
                                 dropout=False)
    mel_fused = frames.reshape(b, n_steps * cfg.r, cfg.n_mels)
    err = float(jnp.max(jnp.abs(mel_fused - out.mel)))
    print(f"fused-vs-scan max abs err: {err:.2e}  {'OK' if err < 5e-3 else 'FAIL'}")

    # --- PRNG dropout determinism
    f1, _ = decode_loop(memory, keys, mask, w, n_steps=8, seed=1, dropout=True)
    f1b, _ = decode_loop(memory, keys, mask, w, n_steps=8, seed=1, dropout=True)
    f2, _ = decode_loop(memory, keys, mask, w, n_steps=8, seed=2, dropout=True)
    same = np.array_equal(np.asarray(f1), np.asarray(f1b))
    diff = not np.allclose(np.asarray(f1), np.asarray(f2))
    print(f"prng dropout: deterministic={same} seed-sensitive={diff}")

    # --- latency
    @jax.jit
    def scan_decode(v, text, lengths, rng):
        return model.apply(v, text, lengths, n_steps=n_steps,
                           rngs={"dropout": rng}).mel

    t_scan = timed(lambda: scan_decode(variables, text, lengths,
                                       jax.random.PRNGKey(3)))
    t_fused = timed(lambda: decode_loop(memory, keys, mask, w,
                                        n_steps=n_steps, dropout=False)[0])
    print(f"decode {b}x{n_steps} steps: XLA scan {t_scan*1000:.1f} ms "
          f"(includes encoder+postnet) | fused kernel {t_fused*1000:.1f} ms "
          f"(decoder only)")

    # --- Griffin-Lim: fft vs matmul-DFT
    acfg = get_config("synth_gl1000").audio
    kw = dict(n_fft=acfg.n_fft, hop_length=acfg.hop_length,
              win_length=acfg.win_length)
    rs = np.random.default_rng(0)
    t = np.arange(22050 * 2) / 22050
    y = np.stack([
        (0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t)
         + 0.01 * rs.standard_normal(len(t))).astype(np.float32)
        for i in range(8)
    ])
    mag = jnp.abs(stft(jnp.asarray(y), **kw))

    def rel_err(rec):
        m2 = jnp.abs(stft(rec, **kw))
        return float(jnp.linalg.norm(m2 - mag) / jnp.linalg.norm(mag))

    t_fft = timed(lambda: griffin_lim(mag, **kw, n_iter=50), n=1)
    t_mm = timed(lambda: griffin_lim_mm(mag, **kw, n_iter=50), n=1)
    e_fft = rel_err(griffin_lim(mag, **kw, n_iter=50))
    e_mm = rel_err(griffin_lim_mm(mag, **kw, n_iter=50))
    print(f"GL50 on {y.shape[0]}x2s audio: fft {t_fft*1000:.0f} ms (err {e_fft:.3f})"
          f" | matmul-DFT {t_mm*1000:.0f} ms (err {e_mm:.3f})"
          f" | speedup {t_fft/t_mm:.1f}x")

    # --- Pallas GL under shard_map on the REAL chip (1-device mesh): the
    # multi-chip synthesis design (infer/synthesize.py mesh branch) runs the
    # kernel per-shard; this validates the non-interpret Mosaic lowering
    # inside shard_map, which CPU tests can only cover in interpret mode.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tacotron_tpu.dsp.pallas_gl import griffin_lim_pallas

    mesh1 = Mesh(np.array(jax.devices()[:1]), ("data",))
    f_sm = jax.jit(jax.shard_map(
        lambda m: griffin_lim_pallas(m, **kw, n_iter=10),
        mesh=mesh1, in_specs=P("data", None, None),
        out_specs=P("data", None), check_vma=False))
    rec_sm = f_sm(jax.device_put(mag, NamedSharding(mesh1, P("data", None, None))))
    rec_ref = griffin_lim_pallas(mag, **kw, n_iter=10)
    d = float(jnp.max(jnp.abs(rec_sm - rec_ref)))
    print(f"pallas GL under shard_map (1-dev mesh): max|diff| vs direct {d:.2e}"
          f"  {'OK' if d < 1e-4 else 'FAIL'}")

    # --- pallas GL magnitude-parity vs the mm path on the real chip (the
    # dead-chunk skip is default-on: validate its Mosaic lowering), and the
    # lane-trimmed variant (guarded: new slice patterns)
    e_pl = rel_err(griffin_lim_pallas(mag, **kw, n_iter=50))
    print(f"pallas GL50 residual magnitude err {e_pl:.3f} (mm: {e_mm:.3f})  "
          f"{'OK' if e_pl < e_mm * 1.2 + 0.01 else 'FAIL'}")
    try:
        e_tr = rel_err(griffin_lim_pallas(mag, **kw, n_iter=50,
                                          trim_chunks=True))
        print(f"pallas GL50 trim_chunks err {e_tr:.3f}  "
              f"{'OK' if abs(e_tr - e_pl) < 0.01 else 'FAIL'}")
    except Exception as e:
        print(f"pallas GL trim_chunks FAILED to lower: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
