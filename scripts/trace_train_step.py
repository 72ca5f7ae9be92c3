"""Device trace of the production train step (VERDICT r4 next #4).

Captures 5 steady-state steps of the EXACT graph the driver bench compiles
(train.step.make_train_step at the pod_dp recipe) under jax.profiler.trace
with a Perfetto-format export, writes the raw trace under artifacts/trace/,
and aggregates the device track into a per-op table (top ops by total device
time, scan-step internals, MXU-op share) so the r4 shape-differencing
attribution (scripts/train_step_breakdown.py) can be cross-validated at the
op level instead of inferred.

Why this wasn't done before: the per-stage raw-grad jits wedge this machine's
remote-compile path (BASELINE.md axon notes) — but the production step
compiles fine, and tracing it needs no extra compilation.

Run on TPU:  python scripts/trace_train_step.py [--batch 256] [--steps 5]
Outputs:     artifacts/trace/perfetto_trace.json.gz  (raw, Perfetto-loadable)
             artifacts/trace/op_table.json           (aggregated per-op table)
"""

import argparse
import dataclasses
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_perfetto(path: str, n_steps: int) -> dict:
    """Aggregate a Perfetto trace.json(.gz) into a per-op device-time table.

    Perfetto JSON: {"traceEvents": [{"ph": "X", "name", "ts", "dur",
    "pid", "tid", ...}, ...]} plus metadata events naming the pid/tid
    tracks. Device op events live on tracks whose process name contains
    "TPU"/"device" (XLA emits one track per core + queue)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace

    # map pid -> process name, (pid, tid) -> thread name from metadata
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e.get("args", {}).get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e.get("args", {}).get("name", "")

    def is_device(pid, tid):
        pn = (pnames.get(pid, "") or "").lower()
        tn = (tnames.get((pid, tid), "") or "").lower()
        return ("tpu" in pn or "device" in pn or "/device" in tn
                or "xla" in tn or "tensorflow op" in tn or "steps" in tn)

    per_op = defaultdict(lambda: [0.0, 0])     # name -> [total_us, count]
    device_busy_us = 0.0
    span_lo, span_hi = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if not is_device(e.get("pid"), e.get("tid")):
            continue
        name = e["name"]
        per_op[name][0] += e["dur"]
        per_op[name][1] += 1
        device_busy_us += e["dur"]
        span_lo = min(span_lo, e["ts"])
        span_hi = max(span_hi, e["ts"] + e["dur"])

    rows = sorted(((tot, cnt, name) for name, (tot, cnt) in per_op.items()),
                  reverse=True)
    # MXU share: convolution/dot ops (XLA emits fusion names containing the
    # root op; dot/conv fusions carry these substrings)
    mxu_us = sum(tot for tot, _, name in rows
                 if any(k in name.lower() for k in ("dot", "conv", "fusion.dot")))
    span_us = max(span_hi - span_lo, 1e-9)
    return {
        "n_steps_traced": n_steps,
        "device_span_ms": round(span_us / 1e3, 2),
        "device_busy_ms": round(device_busy_us / 1e3, 2),
        "device_busy_frac_of_span": round(device_busy_us / span_us, 3),
        "mxu_named_op_ms": round(mxu_us / 1e3, 2),
        "mxu_named_op_frac_of_busy": round(mxu_us / max(device_busy_us, 1e-9), 3),
        "top_ops": [
            {"name": name[:160], "total_ms": round(tot / 1e3, 3),
             "count": cnt,
             "frac_of_busy": round(tot / max(device_busy_us, 1e-9), 4)}
            for tot, cnt, name in rows[:25]
        ],
        "n_device_tracks": len({(e.get("pid"), e.get("tid"))
                                for e in events
                                if e.get("ph") == "X"
                                and is_device(e.get("pid"), e.get("tid"))}),
        "track_names": sorted({f"{pnames.get(p, '')}/{tnames.get((p, t), '')}"
                               for (p, t) in {(e.get("pid"), e.get("tid"))
                                              for e in events
                                              if e.get("ph") == "X"}})[:20],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--t-in", type=int, default=128)
    p.add_argument("--t-out", type=int, default=400)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--out", default="artifacts/trace")
    p.add_argument("--platform", default=None)
    p.add_argument("--set", action="append", default=[], dest="overrides")
    p.add_argument("--analyze-only", default=None, metavar="TRACE_JSON",
                   help="skip capture; aggregate an existing perfetto trace")
    args = p.parse_args()

    if args.analyze_only:
        table = aggregate_perfetto(args.analyze_only, args.steps)
        print(json.dumps(table, indent=1))
        return

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from tacotron_tpu.config import apply_overrides, get_config
    from tacotron_tpu.parallel import make_mesh, shard_batch
    from tacotron_tpu.train.step import create_train_state, make_train_step
    from tacotron_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    cfg = get_config("pod_dp")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, vocab_size=64),
        train=dataclasses.replace(cfg.train, batch_size=args.batch))
    cfg = apply_overrides(cfg, args.overrides)
    mesh = make_mesh(cfg.mesh)
    b, t_in, t_out = args.batch, args.t_in, args.t_out

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

    def force(x):
        return float(jnp.sum(x))     # axon: block_until_ready unreliable

    os.makedirs(args.out, exist_ok=True)
    with mesh:
        batch = shard_batch(batch, mesh, cfg.mesh)
        for _ in range(max(1, args.warmup)):
            state, metrics, _ = step_fn(state, *batch)
        force(metrics["total_loss"])

        t0 = time.time()
        jax.profiler.start_trace(args.out, create_perfetto_trace=True)
        for _ in range(args.steps):
            state, metrics, _ = step_fn(state, *batch)
        force(metrics["total_loss"])
        jax.profiler.stop_trace()
        dt = time.time() - t0
    print(json.dumps({"traced_steps": args.steps,
                      "wall_ms_per_step": round(dt / args.steps * 1e3, 2)}),
          flush=True)

    traces = sorted(glob.glob(os.path.join(
        args.out, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    traces += sorted(glob.glob(os.path.join(
        args.out, "**", "perfetto_trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not traces:
        print("no perfetto trace emitted — backend may not support device "
              "tracing; raw profiler output (if any) left under", args.out)
        return
    table = aggregate_perfetto(traces[-1], args.steps)
    table["trace_file"] = os.path.relpath(traces[-1], args.out)
    table["wall_ms_per_step"] = round(dt / args.steps * 1e3, 2)
    with open(os.path.join(args.out, "op_table.json"), "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
