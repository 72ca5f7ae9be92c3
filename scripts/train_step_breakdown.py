"""Whole-train-step time breakdown by shape differencing (VERDICT r3 next #2).

scripts/train_stage_profile.py times each stage as its own jax.grad graph —
but several of those raw-grad graphs wedge this machine's axon remote-compile
path (observed 2026-08-20: 30+ min no-compile, then Broken pipe — the same
pathology as the one-jit synth megafunction). This harness instead times ONLY
the full production train step (train.step.make_train_step — the graph the
driver bench compiles every round, proven to build here) at three shape
cells and derives the stage attribution by differencing:

  A: (B, T_in 128, T_out 400, r 2)  — the pod_dp recipe          [base]
  B: same, r=4                      — decoder scan halves to 100 steps,
                                      postnet/encoder/loss unchanged
  C: same, T_out 200                — decoder 100 steps AND postnet/loss
                                      halve; encoder unchanged

  decoder_per_step  = (tA - tB) / 100          (r4's per-step cost is ~equal:
                                                attention + 3 GRUs dominate;
                                                only frame_proj widens)
  postnet_per_frame = (tA - tC - 100*decoder_per_step) / 200
                                               (includes linear proj + loss,
                                                which also scale with T_out)
  encoder_fixed     = tA - 200*dec_per_step - 400*post_per_frame

Also prints achieved TFLOP/s and % of chip peak from
utils/roofline.train_step_flops — the whole-step speed-of-light accounting
(SURVEY.md §5.1).

Run on TPU:  python scripts/train_step_breakdown.py [--batch 256]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--t-in", type=int, default=128)
    p.add_argument("--t-out", type=int, default=400)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--platform", default=None)
    p.add_argument("--set", action="append", default=[], dest="overrides")
    args = p.parse_args()
    if args.t_out % 4 != 0:
        p.error("--t-out must be divisible by 4: the shape-differencing "
                "cells run r=2, r=4 and t_out/2 (all need r-aligned frames)")
    if any(ov.partition("=")[0] == "model.r" for ov in args.overrides):
        p.error("--set model.r is unsupported: the cells pin r=2/r=4 "
                "themselves and the FLOP model must match the timed shapes")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from tacotron_tpu.config import apply_overrides, get_config
    from tacotron_tpu.parallel import make_mesh, shard_batch
    from tacotron_tpu.train.step import create_train_state, make_train_step
    from tacotron_tpu.utils.profiling import enable_compilation_cache
    from tacotron_tpu.utils.roofline import V5E, train_step_flops

    enable_compilation_cache()

    base = get_config("pod_dp")
    base = dataclasses.replace(
        base, model=dataclasses.replace(base.model, vocab_size=64))
    base = apply_overrides(base, args.overrides)
    mesh = make_mesh(base.mesh)
    b, t_in = args.batch, args.t_in

    def force(x):
        return float(jnp.sum(x))

    def cell(r: int, t_out: int) -> float:
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model, r=r),
            train=dataclasses.replace(base.train, batch_size=args.batch))
        rng = jax.random.PRNGKey(0)
        state = create_train_state(cfg, rng)
        step_fn = make_train_step(cfg, mesh)
        batch = (
            jax.random.randint(rng, (b, t_in), 1, 60),
            jnp.full((b,), t_in, jnp.int32),
            jax.random.uniform(rng, (b, t_out, cfg.model.n_mels)),
            jax.random.uniform(rng, (b, t_out, cfg.model.n_freq)),
            jnp.full((b,), t_out, jnp.int32),
        )
        with mesh:
            batch = shard_batch(batch, mesh, cfg.mesh)
            # >=1 warmup step always: the first call compiles, and the timing
            # below assumes a warm cache (with --warmup 0 `metrics` would
            # also be unbound here)
            for _ in range(max(1, args.warmup)):
                state, metrics, _ = step_fn(state, *batch)
            force(metrics["total_loss"])
            t0 = time.time()
            for _ in range(args.steps):
                state, metrics, _ = step_fn(state, *batch)
            force(metrics["total_loss"])
            dt = (time.time() - t0) / args.steps
        print(json.dumps({"cell": f"r{r}_tout{t_out}",
                          "ms_per_step": round(dt * 1e3, 2)}), flush=True)
        return dt

    t_out = args.t_out
    tA = cell(2, t_out)
    tB = cell(4, t_out)
    tC = cell(2, t_out // 2)

    nA, nB = t_out // 2, t_out // 4          # decoder steps in A / B
    dec_step = (tA - tB) / (nA - nB)
    post_frame = (tA - tC - (nA - t_out // 4) * dec_step) / (t_out / 2)
    dec_total = nA * dec_step
    post_total = t_out * post_frame
    enc_fixed = tA - dec_total - post_total

    fl = train_step_flops(base.model, b, t_in, t_out)
    achieved = fl / tA
    print(json.dumps({
        "step_ms": round(tA * 1e3, 2),
        "decoder_ms": round(dec_total * 1e3, 2),
        "decoder_us_per_scan_step": round(dec_step * 1e6, 1),
        "postnet_plus_loss_ms": round(post_total * 1e3, 2),
        "encoder_plus_fixed_ms": round(enc_fixed * 1e3, 2),
        "frames_per_s_per_chip": round(b * t_out / tA / len(jax.devices()), 1),
        "step_tflops": round(fl / 1e12, 3),
        "achieved_tflops_per_s": round(achieved / 1e12, 2),
        "pct_of_v5e_bf16_peak": round(100 * achieved / V5E["flops_peak"], 1),
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
