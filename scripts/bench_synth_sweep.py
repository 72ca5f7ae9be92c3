"""Synthesis batch sweep via composed stages (VERDICT r2 next #6).

The one-jit e2e synth bench (bench.py --metric synth) wedges in the axon
TPU tunnel for some shapes (B64@GL1000: 4 hung attempts over r2+r3; on
2026-08-19 even the previously-measured B32 Fast-GL cell hung at compile).
This harness measures the same end-to-end pipeline as two compiled stages —
model pass (encoder + scan decode + postnet, one jit) and Griffin-Lim
(inv_spectrogram) — and derives audio-sec/s from the stage sum. The
per-dispatch tunnel overhead this adds (~1-3 ms) is <2% of the 0.2-1.4 s
GL stage, so the composition is a faithful lower bound on the one-jit
number; the stage split also pins WHICH stage an environment hang lives in.

Run: python scripts/bench_synth_sweep.py [--batches 32,64,128]
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


def timed(fn, n=3):
    force(fn())
    t0 = time.time()
    for _ in range(n):
        r = fn()
    force(r)
    return (time.time() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="32,64,128")
    p.add_argument("--t-in", type=int, default=128)
    p.add_argument("--t-out", type=int, default=400)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import dataclasses

    from tacotron_tpu.config import get_config
    from tacotron_tpu.models import Tacotron
    from tacotron_tpu.dsp import inv_spectrogram

    cfg = get_config("full_1chip")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, vocab_size=64))
    fast_audio = dataclasses.replace(cfg.audio, gl_momentum=0.99,
                                     gl_trim_chunks=True)
    r, n_mels = cfg.model.r, cfg.model.n_mels
    n_steps = args.t_out // r
    model = Tacotron(cfg.model, train=False)

    for b in (int(x) for x in args.batches.split(",")):
        text = jax.random.randint(jax.random.PRNGKey(0), (b, args.t_in), 1, 60)
        lens = jnp.full((b,), args.t_in, jnp.int32)
        variables = model.init(
            {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
            text, lens, gt_mel=jnp.zeros((b, 2 * r, n_mels)))
        rng = jax.random.PRNGKey(3)

        @jax.jit
        def model_pass(variables, text, lens, rng):
            out = model.apply(variables, text, lens, n_steps=n_steps,
                              rngs={"dropout": rng})
            return out.linear

        print(json.dumps({"stage": "model", "b": b}), flush=True)
        t_model = timed(lambda: model_pass(variables, text, lens, rng))
        linear = model_pass(variables, text, lens, rng)

        print(json.dumps({"stage": "gl1000", "b": b}), flush=True)
        t_gl1000 = timed(
            lambda: inv_spectrogram(linear, cfg.audio, n_iter=1000), n=2)
        print(json.dumps({"stage": "gl100_fast", "b": b}), flush=True)
        t_gl100 = timed(
            lambda: inv_spectrogram(linear, fast_audio, n_iter=100), n=3)

        wav_len_s = (args.t_out * cfg.audio.hop_length +
                     cfg.audio.win_length) / cfg.audio.sample_rate
        audio_s = b * wav_len_s
        print(json.dumps({
            "b": b, "t_in": args.t_in, "t_out": args.t_out,
            "model_pass_ms": round(t_model * 1e3, 2),
            "gl1000_ms": round(t_gl1000 * 1e3, 2),
            "gl100_fast_ms": round(t_gl100 * 1e3, 2),
            "audio_s_per_batch": round(audio_s, 2),
            "e2e_gl1000_audio_sec_per_s":
                round(audio_s / (t_model + t_gl1000), 2),
            "e2e_fastgl100_audio_sec_per_s":
                round(audio_s / (t_model + t_gl100), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
