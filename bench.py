"""Benchmark: the two graded metrics on one chip, as ONE JSON line.

Default (plain ``python bench.py``) measures BOTH graded metrics —
training throughput (frames/s/chip, full 256-d model, B256 recipe) and
end-to-end synthesis (audio-seconds/s @ GL1000, B32 staged protocol) —
and prints one combined JSON record whose primary fields are the train
metric with the synth metric nested under ``"synth"`` (VERDICT r4 next
#3: every BENCH_r*.json before r5 carried only the train number because
the driver runs the default invocation).

Protocol (BASELINE.md): steady-state after compile warm-up,
device-read-bracketed; frames/s counts decoder output frames (T_out);
the synth stages are each timed over ``--iters`` (>=5) steady-state
iterations and the MEDIAN is reported (VERDICT r4 next #6 — n=1 was
thin evidence on a tunnel with day-to-day variance). The reference
publishes no numbers (BASELINE.json:13), so vs_baseline is the ratio
against OUR first recorded value in BASELINE.md (the ratchet).

Usage: python bench.py [--metric both|train|synth] [--steps N] [--batch N]
       [--t-in 128] [--t-out 400] [--platform cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import re
import statistics
import sys
import time


def read_ratchet(key: str) -> float | None:
    """Our first recorded value for ``key`` from BASELINE.md, if present."""
    try:
        with open("BASELINE.md") as f:
            text = f.read()
        m = re.search(rf"<!-- ratchet:{key}=([0-9.]+) -->", text)
        return float(m.group(1)) if m else None
    except OSError:
        return None


def bench_synth(cfg, args) -> dict:
    """Staged synthesis protocol (VERDICT r3 next #5): model pass (encoder +
    decode + postnet, one jit) and Griffin-Lim (inv_spectrogram) timed as
    separate compiled stages; audio-sec/s derives from the stage sum. The
    one-jit megafunction (encoder + scan + postnet + GL1000 in a single XLA
    program) reproducibly wedges the axon tunnel's compile path (BASELINE.md
    inference row), and the stage split's per-dispatch overhead (~1-3 ms) is
    <2% of the 0.2-1.4 s GL stage. Each stage is timed ``--iters`` times
    steady-state and the median taken (BASELINE.md protocol line)."""
    import jax
    import jax.numpy as jnp

    from tacotron_tpu.models import Tacotron
    from tacotron_tpu.dsp import inv_spectrogram

    model = Tacotron(cfg.model, train=False)
    b = args.batch or 32          # graded protocol cell: B32 (BASELINE.md)
    t_in, n_steps = args.t_in, args.t_out // cfg.model.r
    text = jax.random.randint(jax.random.PRNGKey(0), (b, t_in), 1, 60)
    lens = jnp.full((b,), t_in, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        text, lens, gt_mel=jnp.zeros((b, 2 * cfg.model.r, cfg.model.n_mels)),
    )

    if args.fused:
        from tacotron_tpu.models.encoder import Encoder
        from tacotron_tpu.models.postnet import PostNet
        from tacotron_tpu.ops.pallas.decode_loop import (
            decode_loop, pack_decoder_weights,
        )

        encoder = Encoder(cfg.model, train=False)
        postnet = PostNet(cfg.model, train=False)
        # CPU smoke: interpret the kernel; its PRNG has no CPU lowering,
        # so prenet dropout is off there (same policy as the Synthesizer)
        interp = jax.default_backend() == "cpu"
        use_dropout = cfg.model.prenet_dropout > 0 and not interp

        @jax.jit
        def model_pass(variables, text, lens, rng):
            v, bs = variables["params"], variables["batch_stats"]
            memory = encoder.apply(
                {"params": v["encoder"], "batch_stats": bs["encoder"]},
                text, lens, rngs={"dropout": rng})
            keys = memory @ v["memory_proj"]["kernel"]
            mask = jnp.arange(text.shape[1])[None, :] < lens[:, None]
            w = pack_decoder_weights(v["decoder"]["cell"])
            seed = jax.random.randint(rng, (), 0, 2**31 - 1)
            frames, _ = decode_loop(
                memory, keys, mask, w, n_steps=n_steps, seed=seed,
                dropout=use_dropout,
                dropout_rate=cfg.model.prenet_dropout,
                collect_alignments=False, interpret=interp)
            mel = frames.reshape(text.shape[0],
                                 n_steps * cfg.model.r, cfg.model.n_mels)
            return postnet.apply(
                {"params": v["postnet"], "batch_stats": bs["postnet"]},
                mel)
    else:
        @jax.jit
        def model_pass(v, text, lens, rng):
            out = model.apply(v, text, lens, n_steps=n_steps,
                              rngs={"dropout": rng})
            return out.linear

    def force(x):
        # device->host read: block_until_ready is NOT reliable on axon
        return float(jnp.sum(jnp.abs(x)))

    # stage 1: model pass — compile, then median of --iters steady-state calls
    force(model_pass(variables, text, lens, jax.random.PRNGKey(3)))
    t_models = []
    for i in range(max(1, args.iters)):
        t0 = time.time()
        linear = model_pass(variables, text, lens, jax.random.PRNGKey(4 + i))
        force(linear)
        t_models.append(time.time() - t0)
    # stage 2: Griffin-Lim on the model output (separate jit cache entry)
    wav = inv_spectrogram(linear, cfg.audio, n_iter=args.gl_iters)
    force(wav)
    t_gls = []
    for _ in range(max(1, args.iters)):
        t0 = time.time()
        wav = inv_spectrogram(linear, cfg.audio, n_iter=args.gl_iters)
        force(wav)
        t_gls.append(time.time() - t0)
    t_model = statistics.median(t_models)
    t_gl = statistics.median(t_gls)
    dt = t_model + t_gl
    audio_s = b * wav.shape[-1] / cfg.audio.sample_rate
    ratchet = read_ratchet("audio_sec_per_s")
    val = audio_s / dt
    print(json.dumps({"model_pass_ms": round(t_model * 1e3, 2),
                      "gl_ms": round(t_gl * 1e3, 2),
                      "gl_iters": args.gl_iters,
                      "iters": args.iters,
                      "model_pass_ms_all": [round(t * 1e3, 2) for t in t_models],
                      "gl_ms_all": [round(t * 1e3, 2) for t in t_gls],
                      "protocol": "staged(model_jit+gl_jit), median"},),
          file=sys.stderr)
    return {
        "metric": "synth_audio_sec_per_s",
        "value": round(val, 2),
        "unit": "audio-seconds/s",
        "vs_baseline": round(val / ratchet, 4) if ratchet else 1.0,
    }


def bench_train(cfg, args, mesh) -> dict:
    import jax
    import jax.numpy as jnp

    from tacotron_tpu.parallel import shard_batch
    from tacotron_tpu.train.step import create_train_state, make_train_step

    rng = jax.random.PRNGKey(0)
    b = args.batch or 256     # swept on v5e: 256+remat peaks (BASELINE.md)
    t_in, t_out = args.t_in, args.t_out
    assert t_out % cfg.model.r == 0
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=b))
    n_chips = len(jax.devices())
    # Steady-state protocol: >=100 measured steps resident (BASELINE.md
    # protocol line; ~8.5 s of device time at the v5e step rate). The
    # pipeline path keeps a lower default because on this machine each step
    # moves ~230 MB through a 2-92 MB/s tunnel (BASELINE.md loader-fed
    # bullet) — recorded deviation, overridable via --steps.
    steps = args.steps or (15 if args.with_pipeline else 100)

    def force(x):
        # device->host read: block_until_ready is NOT reliable on the axon
        # platform (verified empirically — it returns before compute finishes)
        return float(jnp.sum(x))

    if args.with_pipeline:
        # Real input path: synthetic corpus -> packed f16 arrays -> native
        # batcher + prefetch -> host->device transfer each step. One bucket
        # (single compiled shape) sized to ~t_out frames.
        from tacotron_tpu.data import ljspeech
        from tacotron_tpu.data.loader import (DataLoader, Dataset,
                                              device_prefetch)

        sec = t_out * cfg.audio.hop_length / cfg.audio.sample_rate
        root = f"/tmp/bench_pipeline_t{t_out}"
        if not os.path.exists(os.path.join(root, "data", "index.json")):
            n_utt = max(2 * b, 128)
            ljspeech.generate_synthetic_corpus(
                os.path.join(root, "corpus"), n=n_utt,
                sample_rate=cfg.audio.sample_rate,
                min_sec=sec * 0.9, max_sec=sec * 1.02)
            ljspeech.preprocess(os.path.join(root, "corpus"),
                                os.path.join(root, "data"), cfg.audio,
                                chunk=16)
        ds = Dataset(os.path.join(root, "data"))
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           vocab_size=max(64, len(ds.vocab))))
        loader = DataLoader(ds, batch_size=b, num_buckets=1, r=cfg.model.r,
                            device_cache=args.device_cache)
        t_out_eff = loader.buckets[0].n_frames
        state = create_train_state(cfg, rng)
        step_fn = make_train_step(cfg, mesh)

        def to_dev(bt):
            # device-cache batches are already device arrays — shard_batch is
            # then a device-side (re)layout, not a host link transfer
            return shard_batch((bt.text, bt.text_len, bt.mel, bt.linear,
                                bt.frame_len), mesh, cfg.mesh)

        # depth-2 device prefetch: the async host->device copy of batch N+1
        # overlaps the step on batch N (same wrapper the train CLI uses)
        it = device_prefetch(iter(loader), to_dev)

        with mesh:
            for _ in range(args.warmup):
                state, metrics, _ = step_fn(state, *next(it)[1])
            force(metrics["total_loss"])
            t0 = time.time()
            for _ in range(steps):
                state, metrics, _ = step_fn(state, *next(it)[1])
            force(metrics["total_loss"])
            dt = time.time() - t0
        per_chip = steps * b * t_out_eff / dt / n_chips
        ratchet = read_ratchet("frames_per_s_per_chip")
        return {
            "metric": "train_frames_per_s_per_chip_with_pipeline"
                      + ("_device_cache" if args.device_cache else ""),
            "value": round(per_chip, 1),
            "unit": "frames/s/chip",
            "vs_baseline": round(per_chip / ratchet, 4) if ratchet else 1.0,
        }

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
        for _ in range(args.warmup):
            state, metrics, _ = step_fn(state, *batch)
        force(metrics["total_loss"])

        t0 = time.time()
        for _ in range(steps):
            state, metrics, _ = step_fn(state, *batch)
        force(metrics["total_loss"])
        dt = time.time() - t0

    per_chip = steps * b * t_out / dt / n_chips
    ratchet = read_ratchet("frames_per_s_per_chip")
    return {
        "metric": "train_frames_per_s_per_chip",
        "value": round(per_chip, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(per_chip / ratchet, 4) if ratchet else 1.0,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=None,
                   help="train measured steps; default 100 resident / 15 "
                        "with-pipeline (see protocol note in bench_train)")
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--batch", type=int, default=None,
                   help="per-metric defaults when unset: train 256 (v5e "
                        "sweep optimum), synth 32 (graded protocol cell)")
    p.add_argument("--t-in", type=int, default=128)
    p.add_argument("--t-out", type=int, default=400)
    p.add_argument("--iters", type=int, default=5,
                   help="synth: steady-state timed iterations per stage; "
                        "the median is reported")
    p.add_argument("--platform", default=None)
    p.add_argument("--fused", action="store_true",
                   help="synth metric: decode through the fused Pallas "
                        "decode-loop kernel instead of the XLA scan")
    p.add_argument("--with-pipeline", action="store_true",
                   help="train metric: feed real DataLoader batches (f16 wire "
                        "format, native C++ assembler, prefetch thread, "
                        "host->device transfer) instead of one resident "
                        "device batch — measures the production input path")
    p.add_argument("--device-cache", action="store_true",
                   help="with --with-pipeline: device-resident dataset mode — "
                        "packed arrays uploaded once, each step's padded "
                        "batch assembled ON DEVICE by a jitted gather; the "
                        "per-step host->device traffic is five (B,) int32 "
                        "vectors instead of ~230 MB of features")
    p.add_argument("--metric", default="both",
                   choices=["both", "train", "synth"],
                   help="both (default) = one combined JSON record, train "
                        "primary + synth nested — the driver's plain "
                        "invocation captures both graded metrics")
    p.add_argument("--gl-iters", type=int, default=1000)
    p.add_argument("--gl-momentum", type=float, default=0.0,
                   help="Fast Griffin-Lim momentum (0 = vanilla parity mode)")
    p.add_argument("--remat", action=argparse.BooleanOptionalAction, default=True,
                   help="remat the decoder scan (fits bigger batches in HBM; "
                        "measured optimal with batch 256 on v5e)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE",
                   help="config override, e.g. --set model.tf_decoder=hoisted")
    args = p.parse_args()
    if args.device_cache and not args.with_pipeline:
        p.error("--device-cache only changes the --with-pipeline path; "
                "without it the run would measure the resident-batch path "
                "while looking like a device-cache cell")
    if args.metric == "synth" and (args.with_pipeline or args.device_cache):
        p.error("--with-pipeline/--device-cache only affect the train "
                "metric; combined with --metric synth the run would measure "
                "a resident-batch synth cell while looking like a pipeline "
                "cell (ADVICE r4)")
    if args.metric == "both" and (args.with_pipeline or args.device_cache
                                  or args.fused or args.gl_momentum):
        p.error("--metric both is the plain graded-protocol invocation; "
                "run variant cells (--with-pipeline/--device-cache/--fused/"
                "--gl-momentum) with an explicit --metric train|synth so the "
                "emitted record is unambiguous about what it measured")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from tacotron_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    if args.device_cache and jax.process_count() > 1:
        # mirror cli/train's refusal (ADVICE r4): DeviceCache uploads the
        # FULL packed arrays per process and feeds process-local gathers —
        # undefined under the multi-host shared-seed schedule
        print(json.dumps({"error": "--device-cache is single-host-only "
                          "(full-array upload per process); no measurement "
                          "taken"}), file=sys.stderr)
        os._exit(4)

    # Preflight with a hard deadline: the axon TPU tunnel has been observed to
    # die mid-round (relay process gone -> every device op blocks forever,
    # even a 128x128 matmul). Failing fast with a diagnostic beats hanging the
    # caller indefinitely. 600 s is far above a healthy first-compile.
    import threading

    done = threading.Event()
    probe_error: list[BaseException] = []

    def _probe():
        try:
            float(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128))))
        except BaseException as e:  # surface instead of masquerading as a hang
            probe_error.append(e)
        done.set()

    threading.Thread(target=_probe, daemon=True).start()
    deadline = float(os.environ.get("BENCH_PREFLIGHT_TIMEOUT", "600"))
    if not done.wait(timeout=deadline):
        print(json.dumps({"error": f"device preflight timed out after "
                          f"{deadline:.0f}s — accelerator tunnel unreachable "
                          "(see BASELINE.md axon notes); no measurement "
                          "taken"}), file=sys.stderr)
        os._exit(3)
    if probe_error:
        print(json.dumps({"error": f"device preflight failed: "
                          f"{probe_error[0]!r}; no measurement taken"}),
              file=sys.stderr)
        os._exit(3)

    from tacotron_tpu.config import apply_overrides, get_config
    from tacotron_tpu.parallel import make_mesh

    cfg = get_config("full_1chip")
    cfg = dataclasses.replace(
        cfg,
        audio=dataclasses.replace(cfg.audio, gl_momentum=args.gl_momentum),
        # default = the measured-best v5e training recipe (BASELINE.md):
        # hoisted teacher-forced decoder + bf16 compute. Parity mode:
        # --set model.tf_decoder=scan --set model.compute_dtype=float32
        model=dataclasses.replace(cfg.model, vocab_size=64,
                                  remat_decoder=args.remat,
                                  tf_decoder="hoisted",
                                  compute_dtype="bfloat16"),
    )
    cfg = apply_overrides(cfg, args.overrides)

    if args.metric == "synth":
        print(json.dumps(bench_synth(cfg, args)))
        return

    mesh = make_mesh(cfg.mesh)
    train_rec = bench_train(cfg, args, mesh)
    if args.metric == "train":
        print(json.dumps(train_rec))
        return

    # --metric both: ONE combined JSON line; primary fields = the train
    # metric (continuity with BENCH_r01-r04), synth nested alongside
    synth_rec = bench_synth(cfg, args)
    print(json.dumps({**train_rec, "synth": synth_rec}))


if __name__ == "__main__":
    main()
