"""Fused-decode decision bench (VERDICT r2 next #5).

Measures, on the real chip, everything needed to settle the fused decode
kernel's fate in serving (synth_fast) mode:

  * model-only synthesis pass (encoder + decode + postnet, no GL):
    XLA scan vs fused Pallas kernel at several batch tiles;
  * the e2e stage breakdown at synth_fast settings: encoder, decode,
    postnet, Fast-GL(100) and GL(1000) — shows what fraction of serving
    time the decode actually is;
  * B64 decode through both paths (the kernel's headroom claim was "bigger
    batch tile amortises the latency-bound step").

Protocol mirrors the r2 same-run comparison (BASELINE.md): B32, T_in 128,
200 decode steps, prenet dropout ON, alignments collected OFF on the fused
serving path (scan always materialises them).

Run: python scripts/bench_decode.py [--b 32] [--steps 200] [--t-in 128]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def force(x):
    return float(jnp.sum(jnp.abs(x)))


def timed(fn, n=5):
    force(fn())
    t0 = time.time()
    for _ in range(n):
        r = fn()
    force(r)
    return (time.time() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=32)
    p.add_argument("--t-in", type=int, default=128)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--tiles", default="16,32,48,64")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import dataclasses

    from tacotron_tpu.config import get_config
    from tacotron_tpu.models import Tacotron
    from tacotron_tpu.models.encoder import Encoder
    from tacotron_tpu.models.postnet import PostNet
    from tacotron_tpu.dsp import inv_spectrogram
    from tacotron_tpu.ops.pallas.decode_loop import (decode_loop,
                                                     pack_decoder_weights)

    cfg = get_config("full_1chip")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, vocab_size=64))
    b, t_in, n_steps = args.b, args.t_in, args.steps
    r, n_mels = cfg.model.r, cfg.model.n_mels

    model = Tacotron(cfg.model, train=False)
    text = jax.random.randint(jax.random.PRNGKey(0), (b, t_in), 1, 60)
    lens = jnp.full((b,), t_in, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        text, lens, gt_mel=jnp.zeros((b, 2 * r, n_mels)))
    v, bs = variables["params"], variables["batch_stats"]
    rng = jax.random.PRNGKey(3)

    # ---- scan path: full model apply (encoder + scan decode + postnet)
    @jax.jit
    def scan_model(variables, text, lens, rng):
        out = model.apply(variables, text, lens, n_steps=n_steps,
                          rngs={"dropout": rng})
        return out.linear

    t_scan = timed(lambda: scan_model(variables, text, lens, rng))

    # ---- shared preamble (encoder + keys) and postnet, timed alone
    encoder = Encoder(cfg.model, train=False)
    postnet = PostNet(cfg.model, train=False)

    @jax.jit
    def enc(v, bs, text, lens, rng):
        memory = encoder.apply(
            {"params": v["encoder"], "batch_stats": bs["encoder"]},
            text, lens, rngs={"dropout": rng})
        keys = memory @ v["memory_proj"]["kernel"]
        return memory, keys

    memory, keys = enc(v, bs, text, lens, rng)
    mask = jnp.arange(t_in)[None, :] < lens[:, None]
    w = pack_decoder_weights(v["decoder"]["cell"])
    t_enc = timed(lambda: enc(v, bs, text, lens, rng)[0])

    mel_shape = jnp.zeros((b, n_steps * r, n_mels))

    @jax.jit
    def post(v, bs, mel):
        return postnet.apply(
            {"params": v["postnet"], "batch_stats": bs["postnet"]}, mel)

    linear = post(v, bs, mel_shape)
    t_post = timed(lambda: post(v, bs, mel_shape))

    t_gl100 = timed(lambda: inv_spectrogram(linear, cfg.audio, n_iter=100),
                    n=3)
    t_gl1000 = timed(lambda: inv_spectrogram(linear, cfg.audio, n_iter=1000),
                     n=2)

    # ---- fused kernel at several batch tiles (serving: no alignments)
    fused = {}
    for bt in (int(x) for x in args.tiles.split(",")):
        if bt > b:
            continue

        def run(bt=bt):
            frames, _ = decode_loop(
                memory, keys, mask, w, n_steps=n_steps, seed=7,
                dropout=True, dropout_rate=cfg.model.prenet_dropout,
                collect_alignments=False, batch_tile=bt)
            return frames

        try:
            fused[bt] = timed(run)
        except Exception as e:  # VMEM overflow at big tiles: record, move on
            fused[bt] = f"failed: {type(e).__name__}"
            print(json.dumps({"tile": bt, "error": str(e)[-300:]}),
                  file=sys.stderr, flush=True)

    best = min((v for v in fused.values() if isinstance(v, float)),
               default=float("inf"))
    # scan decode-only estimate: full scan pass minus encoder+postnet
    t_scan_dec = t_scan - t_enc - t_post
    print(json.dumps({
        "config": {"b": b, "t_in": t_in, "steps": n_steps},
        "scan_model_ms": round(t_scan * 1e3, 2),
        "scan_decode_only_ms_est": round(t_scan_dec * 1e3, 2),
        "encoder_ms": round(t_enc * 1e3, 2),
        "postnet_ms": round(t_post * 1e3, 2),
        "gl100_ms": round(t_gl100 * 1e3, 2),
        "gl1000_ms": round(t_gl1000 * 1e3, 2),
        "fused_decode_ms_by_tile": {
            str(k): (round(v * 1e3, 2) if isinstance(v, float) else v)
            for k, v in fused.items()},
        "fused_vs_scan_model": round(t_scan / (t_enc + t_post + best), 3)
        if best < float("inf") else None,
        "fused_vs_scan_decode_only": round(t_scan_dec / best, 3)
        if best < float("inf") else None,
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
