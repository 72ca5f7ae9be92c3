"""CLI: training driver (reference: python train.py [R], SURVEY.md §2.1 #14).

    python -m tacotron_tpu.cli.train --data-dir data/ljspeech --run-dir runs/x \
        [--preset full_1chip] [--steps N] [--batch-size B] [--no-restore]

Always-resume contract (SURVEY.md §5.3): if the run dir holds a checkpoint,
training continues from the latest complete one unless --no-restore.
Host 0 writes checkpoints/summaries; every host feeds its own data shard.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--run-dir", required=True)
    p.add_argument("--preset", default="full_1chip")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--no-restore", action="store_true")
    p.add_argument("--num-buckets", type=int, default=None)
    p.add_argument("--device-cache", action="store_true",
                   help="device-resident dataset mode: upload the packed "
                        "arrays once and assemble each step's padded batch "
                        "ON DEVICE (jitted gather) — per-step host->device "
                        "traffic drops to five (B,) int32 vectors. For "
                        "corpora that fit HBM (LJSpeech f16 ~4 GB); "
                        "single-host runs (the cache is per-process)")
    p.add_argument("--summary-every", type=int, default=None)
    p.add_argument("--checkpoint-every", type=int, default=None)
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu) before first use")
    p.add_argument("--coordinator", default=None,
                   help="multi-host rendezvous address host:port "
                        "(jax.distributed.initialize; SURVEY.md §2.4)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="total process count for the multi-host run")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's id in [0, num-processes)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (SURVEY.md §5.2)")
    p.add_argument("--debug-sync", action="store_true",
                   help="cross-host batch-shape agreement EVERY step, plus "
                        "step agreement + input-shard content-distinctness "
                        "at summary cadence (SURVEY.md §5.2)")
    p.add_argument("--eval-every", type=int, default=0,
                   help="every N steps: synthesize --eval-text and write an "
                        "audio + alignment summary (reference behavior, "
                        "SURVEY.md §5.5); 0 = off")
    p.add_argument("--eval-text", default="the quick brown fox jumps over the lazy dog")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE",
                   help="config override, repeatable — e.g. "
                        "--set model.tf_decoder=hoisted "
                        "--set model.compute_dtype=bfloat16")
    p.add_argument("--profile-port", type=int, default=0,
                   help="start a jax.profiler server on this port for live "
                        "capture via TensorBoard's profile plugin (SURVEY.md "
                        "§5.1); 0 = off")
    p.add_argument("--trace-steps", default=None, metavar="FIRST:LAST",
                   help="capture a device trace spanning these steps "
                        "(inclusive) into RUN_DIR/trace — view in "
                        "TensorBoard/Perfetto; e.g. --trace-steps 40:45")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    # rendezvous BEFORE any backend/device use (single-process: no-op)
    from tacotron_tpu.parallel import multihost

    multihost.initialize(coordinator_address=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)

    import jax.numpy as jnp

    from tacotron_tpu.config import apply_overrides, get_config
    from tacotron_tpu.data.loader import DataLoader, Dataset, device_prefetch
    from tacotron_tpu.parallel import make_mesh, shard_batch
    from tacotron_tpu.train import checkpoint
    from tacotron_tpu.train.step import TrainState, create_train_state, make_train_step
    from tacotron_tpu.utils import SummaryWriter
    from tacotron_tpu.utils import profiling

    profiling.enable_compilation_cache()
    if args.profile_port:
        profiling.start_server(args.profile_port)
    trace_first = trace_last = -1
    if args.trace_steps:
        trace_first, trace_last = (int(x) for x in args.trace_steps.split(":"))

    cfg = get_config(args.preset)
    ds = Dataset(args.data_dir)
    tr = cfg.train
    if args.steps is not None:
        tr = dataclasses.replace(tr, max_steps=args.steps)
    if args.batch_size is not None:
        tr = dataclasses.replace(tr, batch_size=args.batch_size)
    if args.summary_every is not None:
        tr = dataclasses.replace(tr, summary_every=args.summary_every)
    if args.checkpoint_every is not None:
        tr = dataclasses.replace(tr, checkpoint_every=args.checkpoint_every)
    cfg = dataclasses.replace(
        cfg,
        train=tr,
        model=dataclasses.replace(cfg.model, vocab_size=max(64, len(ds.vocab) + 1),
                                  n_freq=ds.linears.shape[1],
                                  n_mels=ds.mels.shape[1]),
    )
    cfg = apply_overrides(cfg, args.overrides)

    mesh = make_mesh(cfg.mesh)
    n_dev = mesh.devices.size
    # an explicit batch size wins over the per-chip derivation, whether it
    # came via --batch-size OR --set train.batch_size=N (ADVICE r3: the
    # override path was silently clobbered by per_chip_batch_size * n_dev)
    batch_overridden = args.batch_size is not None or any(
        ov.partition("=")[0] == "train.batch_size" for ov in args.overrides)
    if not batch_overridden and cfg.train.per_chip_batch_size:
        # topology-agnostic presets (pod_dp): global batch = per-chip sweet
        # spot x live device count, whatever the chips-per-host layout
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, batch_size=cfg.train.per_chip_batch_size * n_dev))
    assert cfg.train.batch_size % n_dev == 0, (
        f"global batch {cfg.train.batch_size} not divisible by {n_dev} devices"
    )

    os.makedirs(args.run_dir, exist_ok=True)
    if multihost.is_primary():
        with open(os.path.join(args.run_dir, "config.json"), "w") as f:
            f.write(cfg.to_json())

    if args.device_cache and jax.process_count() > 1:
        # Multi-host shard_batch round-trips jax arrays through the host
        # (np.asarray + make_array_from_process_local_data), which would
        # invert the device-cache optimization into a per-step
        # device->host->device copy — refuse instead of silently pessimizing.
        raise SystemExit("--device-cache is single-host only: multi-host "
                         "shard_batch would copy each on-device batch back "
                         "through the host every step")
    loader = DataLoader(
        ds, batch_size=cfg.train.batch_size // jax.process_count(),
        num_buckets=args.num_buckets or cfg.data.num_buckets, r=cfg.model.r,
        seed=cfg.train.seed, process_index=jax.process_index(),
        process_count=jax.process_count(), device_cache=args.device_cache,
    )
    print(f"buckets: {[b.key() for b in loader.buckets]}")

    state = create_train_state(cfg, jax.random.PRNGKey(cfg.train.seed))
    ckpt_dir = os.path.join(args.run_dir, "ckpt")
    start_step = 0
    if not args.no_restore and checkpoint.latest(ckpt_dir) is not None:
        state, start_step = checkpoint.restore(ckpt_dir, state)
        state = TrainState(*jax.tree_util.tree_map(jnp.asarray, tuple(state)))
        print(f"resumed from step {start_step}")
    # Unconditional (not --debug-sync) cross-host agreement on the resume
    # step: only process 0 writes checkpoints, so on a host-local run_dir
    # the other hosts would silently restart at step 0 with fresh params and
    # the psum-averaged gradients would mix divergent parameter sets.
    multihost.assert_same_step(start_step)

    step_fn = make_train_step(cfg, mesh)
    writer = SummaryWriter(os.path.join(args.run_dir, "tb"),
                           enabled=multihost.is_primary())

    # host->device copies overlap the device step (device_put is async;
    # depth 2 keeps one batch in flight) — without this the transfer
    # serialises with compute and bounds throughput at the host-link rate
    def to_dev(b):
        return shard_batch(
            (jnp.asarray(b.text), jnp.asarray(b.text_len), jnp.asarray(b.mel),
             jnp.asarray(b.linear), jnp.asarray(b.frame_len)),
            mesh, cfg.mesh,
        )

    it = device_prefetch(iter(loader), to_dev)
    t_last = time.time()
    frames_since = 0
    step = start_step
    eval_synth = None
    tracing = False
    with mesh:
        while step < cfg.train.max_steps:
            # >= not ==: a checkpoint resume can land inside (or past) the
            # requested window; the flag keeps start/stop paired either way
            if trace_first >= 0 and step + 1 >= trace_first and not tracing:
                jax.profiler.start_trace(os.path.join(args.run_dir, "trace"))
                tracing = True
            b, arrays = next(it)
            if args.debug_sync:
                # shapes EVERY step (one 8-byte allgather — catches bucket
                # divergence at the offending step, not at a deadlock later);
                # the costlier step + content-distinctness checks at summary
                # cadence
                multihost.assert_same_shapes(
                    (b.text, b.text_len, b.mel, b.linear, b.frame_len))
                if (step + 1) % cfg.train.summary_every == 0:
                    multihost.assert_same_step(step)
                    multihost.assert_shard_consistency(
                        (b.text, b.text_len, b.mel, b.linear, b.frame_len))
            state, metrics, alignments = step_fn(state, *arrays)
            step += 1
            if tracing and step >= trace_last:
                profiling.force(metrics["total_loss"])  # drain before stop
                jax.profiler.stop_trace()
                tracing = False
                trace_first = -1          # one window per run
                print(f"trace written: {os.path.join(args.run_dir, 'trace')}")
            frames_since += b.mel.shape[0] * b.mel.shape[1] * jax.process_count()

            if step % cfg.train.summary_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t_last
                fps = frames_since / dt
                writer.scalars(metrics, step, prefix="train/")
                writer.scalar("perf/frames_per_s", fps, step)
                writer.scalar("perf/frames_per_s_per_chip", fps / n_dev, step)
                writer.alignment("train/alignment", np.asarray(alignments[0]), step)
                print(json.dumps({"step": step, **metrics,
                                  "frames_per_s": round(fps, 1)}))
                t_last, frames_since = time.time(), 0

            if step % cfg.train.checkpoint_every == 0:
                multihost.barrier("pre-ckpt")
                # collective: every process participates in the shard gather;
                # only process 0 writes files (checkpoint.save gates itself)
                checkpoint.save(ckpt_dir, step, state)
                multihost.barrier("post-ckpt")

            if args.eval_every and step % args.eval_every == 0:
                from tacotron_tpu.infer import Synthesizer
                from tacotron_tpu.train.checkpoint import _to_host

                # COLLECTIVE: multi-process state is not fully addressable on
                # any single host, and eval runs a single-process jit — every
                # process must join the gather, then only host 0 synthesizes
                # (same contract as checkpoint.save)
                eval_params = jax.tree_util.tree_map(_to_host, state.params)
                eval_bstats = jax.tree_util.tree_map(_to_host,
                                                     state.batch_stats)
                if multihost.is_primary():
                    if eval_synth is None:
                        # built ONCE: the jitted synth graph is reused across
                        # evals (a fresh Synthesizer per eval re-traced and
                        # re-compiled the whole decode+GL graph every time)
                        eval_synth = Synthesizer(cfg, eval_params,
                                                 eval_bstats, ds.vocab)
                    else:
                        eval_synth.variables = {"params": eval_params,
                                                "batch_stats": eval_bstats}
                    out = eval_synth([args.eval_text], gl_iters=60)
                    writer.audio("eval/audio", out["wavs"][0],
                                 cfg.audio.sample_rate, step)
                    writer.alignment("eval/alignment", out["alignments"][0],
                                     step)
                    writer.flush()

    if tracing:   # window extended past max_steps: still write the trace
        jax.profiler.stop_trace()
        print(f"trace written: {os.path.join(args.run_dir, 'trace')}")
    checkpoint.save(ckpt_dir, step, state)
    writer.close()
    print(json.dumps({"done": True, "step": step}))


if __name__ == "__main__":
    main()
