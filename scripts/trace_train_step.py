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

    XLA's TPU profiler emits, per device, separate tracks named "Steps"
    (one span per executed step), "XLA Modules" (one span per module
    execution), and "XLA Ops" (the leaf HLO ops — non-overlapping device
    time, each with args: hlo_category, model_flops, bytes_accessed).
    Only the leaf track is summed for busy time (summing all tracks would
    triple-count: module span == sum of its ops). MXU share is computed
    from hlo_category + model_flops, not name substrings — TPU fusions are
    named "fusion.N" and carry their dot/conv nature only in the args."""
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

    def track(e):
        pn = (pnames.get(e.get("pid"), "") or "").lower()
        if "device" not in pn and "tpu" not in pn:
            return None
        return tnames.get((e.get("pid"), e.get("tid")), "")

    # "while" spans CONTAIN their body ops (which also appear as leaf
    # events), so they are excluded from the sums and reported once as
    # control-flow wrapper time; busy time is the interval UNION of leaf
    # spans (async copies overlap compute — summing would double-count).
    CONTAINERS = ("while", "conditional", "call")
    per_op = defaultdict(lambda: [0.0, 0, 0.0, 0.0, ""])
    per_cat = defaultdict(lambda: [0.0, 0, 0.0])   # cat -> [us, count, flops]
    flops = mxu_us = bytes_acc = container_us = 0.0
    step_spans, module_spans, leaf_iv = [], [], []
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        tr = track(e)
        if tr == "Steps":
            step_spans.append(e["dur"])
            continue
        if tr == "XLA Modules":
            module_spans.append(e["dur"])
            continue
        if tr != "XLA Ops":
            continue
        args = e.get("args", {})
        cat = args.get("hlo_category", "?")
        if cat in CONTAINERS:
            container_us += e["dur"]
            continue
        f = float(args.get("model_flops", 0) or 0)
        b = float(args.get("raw_bytes_accessed",
                           args.get("bytes_accessed", 0)) or 0)
        rec = per_op[e["name"]]
        rec[0] += e["dur"]
        rec[1] += 1
        rec[2] += f
        rec[3] += b
        rec[4] = cat
        c = per_cat[cat]
        c[0] += e["dur"]
        c[1] += 1
        c[2] += f
        leaf_iv.append((e["ts"], e["ts"] + e["dur"]))
        flops += f
        bytes_acc += b
        if f > 0:       # op does MXU work (dot/conv or a fusion rooted in one)
            mxu_us += e["dur"]

    # interval union of leaf spans
    leaf_iv.sort()
    busy_us, cur_lo, cur_hi = 0.0, None, None
    for lo, hi in leaf_iv:
        if cur_hi is None or lo > cur_hi:
            if cur_hi is not None:
                busy_us += cur_hi - cur_lo
            cur_lo, cur_hi = lo, hi
        else:
            cur_hi = max(cur_hi, hi)
    if cur_hi is not None:
        busy_us += cur_hi - cur_lo

    # the trailing force-sum jit shows up as a tiny extra module/step span:
    # keep only spans within 2x..0.5x of the median step
    if step_spans:
        med = sorted(step_spans)[len(step_spans) // 2]
        step_spans = [s for s in step_spans if 0.5 * med <= s <= 2 * med]
    n_spans = max(len(step_spans), 1)
    span_us = sum(step_spans) if step_spans else sum(module_spans)
    span_us = max(span_us, 1e-9)
    sum_leaf_us = sum(v[0] for v in per_op.values())
    rows = sorted(((v[0], k) for k, v in per_op.items()), reverse=True)
    return {
        "n_steps_traced": len(step_spans) or n_steps,
        "step_ms_mean": round(span_us / n_spans / 1e3, 3),
        "device_busy_ms_per_step": round(busy_us / n_spans / 1e3, 3),
        "device_busy_frac_of_step": round(busy_us / span_us, 4),
        "container_while_ms_per_step": round(container_us / n_spans / 1e3, 3),
        "flops_per_step_G": round(flops / n_spans / 1e9, 2),
        "achieved_tflops_busy": round(flops / 1e12 / (busy_us / 1e6), 2),
        "achieved_tflops_wall": round(flops / 1e12 / (span_us / 1e6), 2),
        "op_bytes_per_step_MB": round(bytes_acc / n_spans / 1e6, 1),
        "mxu_op_ms_per_step": round(mxu_us / n_spans / 1e3, 3),
        "mxu_op_frac_of_leaf_time": round(mxu_us / max(sum_leaf_us, 1e-9), 4),
        "by_category": sorted(
            ({"category": k, "ms_per_step": round(v[0] / n_spans / 1e3, 3),
              "count_per_step": round(v[1] / n_spans, 1),
              "frac_of_leaf_time": round(v[0] / max(sum_leaf_us, 1e-9), 4),
              "gflops_per_step": round(v[2] / n_spans / 1e9, 2)}
             for k, v in per_cat.items()),
            key=lambda r: -r["ms_per_step"]),
        "top_ops": [
            {"name": name[:120], "category": per_op[name][4],
             "ms_per_step": round(tot / n_spans / 1e3, 3),
             "count_per_step": round(per_op[name][1] / n_spans, 1),
             "frac_of_leaf_time": round(tot / max(sum_leaf_us, 1e-9), 4),
             "gflops_per_step": round(per_op[name][2] / n_spans / 1e9, 2),
             "MB_per_step": round(per_op[name][3] / n_spans / 1e6, 2)}
            for tot, name in rows[:25]
        ],
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
