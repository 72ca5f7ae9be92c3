"""CLI: synthesis driver (reference: python synthesize.py [R], SURVEY.md §3.3).

    python -m tacotron_tpu.cli.synthesize --run-dir runs/x --data-dir data/ljspeech \
        --text "hello world" [--text "..."] --out-dir out/ \
        [--steps N] [--gl-iters 1000]
"""

from __future__ import annotations

import argparse
import json
import os
import time

from tacotron_tpu.config import PRESETS  # light import: dataclasses only


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-dir", required=True)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--text", action="append", default=None,
                   help="prompt (repeatable)")
    p.add_argument("--text-file", default=None,
                   help="file with one prompt per line (blank lines skipped); "
                        "combines with --text")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--gl-iters", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    p.add_argument("--fused", action="store_true",
                   help="decode through the fused Pallas decode-loop kernel")
    p.add_argument("--early-exit", action="store_true",
                   help="stop decoding when the whole batch has gone silent "
                        "(lax.while_loop; SURVEY.md §7.3 item 1 — off for "
                        "reference parity)")
    p.add_argument("--trim", action="store_true",
                   help="write per-utterance silence-trimmed wavs and run "
                        "Griffin-Lim only on the non-padding prefix")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the utterance batch over all visible devices "
                        "(DP mesh; GSPMD model pass + shard_mapped "
                        "Griffin-Lim). Excludes --fused/--early-exit/--trim")
    p.add_argument("--trace-dir", default=None,
                   help="capture a jax.profiler device trace of the "
                        "(post-compile) synthesis pass into this directory "
                        "(utils/profiling; SURVEY.md §5.1). The JSON timing "
                        "line is marked traced: profiler overhead makes it "
                        "incomparable to untraced runs")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE",
                   help="override a field of the restored run config, e.g. "
                        "--set audio.gl_trim_chunks=true (model overrides "
                        "must keep the parameter shapes compatible with the "
                        "checkpoint)")
    p.add_argument("--preset", default=None, choices=sorted(PRESETS),
                   help="overlay a named preset's Griffin-Lim settings "
                        "(iters/momentum/backend/trim) and infer section on "
                        "the restored run config — frame geometry and model "
                        "always come from the run, they must match the "
                        "checkpoint. E.g. synth_fast: Fast-GL momentum 0.99 "
                        "x 100 iters, early-exit decode, trimming")
    args = p.parse_args(argv)
    texts = list(args.text or [])
    if args.text_file:
        with open(args.text_file) as f:
            texts += [ln.strip() for ln in f if ln.strip()]
    if not texts:
        p.error("no prompts: pass --text and/or --text-file")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import dataclasses

    from tacotron_tpu.config import Config, apply_overrides, get_config
    from tacotron_tpu.data.ljspeech import save_wav
    from tacotron_tpu.data.vocab import Vocab
    from tacotron_tpu.infer import Synthesizer
    from tacotron_tpu.train import checkpoint
    from tacotron_tpu.train.step import create_train_state

    with open(os.path.join(args.run_dir, "config.json")) as f:
        cfg = Config.from_json(f.read())
    if args.preset:
        ps = get_config(args.preset)
        # only synthesis-behavior fields: frame geometry (n_fft/hop/win/...)
        # and the model section are pinned by the checkpoint
        cfg = dataclasses.replace(
            cfg,
            audio=dataclasses.replace(
                cfg.audio,
                griffin_lim_iters=ps.audio.griffin_lim_iters,
                gl_momentum=ps.audio.gl_momentum,
                gl_backend=ps.audio.gl_backend,
                gl_trim_chunks=ps.audio.gl_trim_chunks,
            ),
            infer=ps.infer,
        )
    cfg = apply_overrides(cfg, args.overrides)
    if args.early_exit or args.trim:
        # flags only ENABLE: a False flag must not clobber what --preset or
        # --set just turned on
        cfg = dataclasses.replace(
            cfg, infer=dataclasses.replace(
                cfg.infer,
                early_exit=args.early_exit or cfg.infer.early_exit,
                trim_before_gl=args.trim or cfg.infer.trim_before_gl))
    # mutual exclusions on the EFFECTIVE config (flags, --preset and --set
    # can all set these), as clean CLI errors rather than deep tracebacks
    ee_or_trim = cfg.infer.early_exit or cfg.infer.trim_before_gl
    if args.data_parallel and (args.fused or ee_or_trim):
        p.error("--data-parallel cannot combine with --fused or "
                "early-exit/trim (from flags, --preset or --set): fused is a "
                "single-chip kernel; early-exit/trim are host-driven")
    if args.fused and ee_or_trim:
        p.error("--fused cannot combine with early-exit/trim (from flags, "
                "--preset or --set): the fused kernel decodes a fixed "
                "length; the flags' savings would silently not happen")
    vocab = Vocab.load(os.path.join(args.data_dir, "vocab.json"))

    template = create_train_state(cfg, jax.random.PRNGKey(0))
    state, step = checkpoint.restore(os.path.join(args.run_dir, "ckpt"), template)
    print(f"restored checkpoint at step {step}")

    mesh = None
    if args.data_parallel:
        from tacotron_tpu.parallel import make_mesh
        mesh = make_mesh(cfg.mesh)
    synth = Synthesizer(cfg, state.params, state.batch_stats, vocab,
                        fused=args.fused, mesh=mesh)
    import contextlib

    ctx = contextlib.nullcontext()
    if args.trace_dir:
        from tacotron_tpu.utils import profiling

        # warm-up pass first so the trace shows steady-state device work,
        # not the one-time XLA compile
        synth(texts, n_steps=args.steps, gl_iters=args.gl_iters,
              seed=args.seed)
        ctx = profiling.trace(args.trace_dir)
    with ctx:
        t0 = time.time()
        out = synth(texts, n_steps=args.steps, gl_iters=args.gl_iters,
                    seed=args.seed)
        dt = time.time() - t0
    if args.trace_dir:
        print(f"trace written: {args.trace_dir}")

    os.makedirs(args.out_dir, exist_ok=True)
    for i, wav in enumerate(out["wavs"]):
        path = os.path.join(args.out_dir, f"utt_{i:03d}.wav")
        if cfg.infer.trim_before_gl:   # effective config, not just the flag
            wav = wav[: max(int(out["wav_lengths"][i]), cfg.audio.hop_length)]
        save_wav(path, wav, cfg.audio.sample_rate)
    print(json.dumps({
        **({"traced": True} if args.trace_dir else {}),
        "n": len(out["wavs"]),
        "audio_seconds": round(out["audio_seconds"], 2),
        "trimmed_audio_seconds": round(out["trimmed_audio_seconds"], 2),
        "wall_seconds": round(dt, 2),
        "audio_seconds_per_s": round(out["audio_seconds"] / dt, 3),
        "trimmed_audio_seconds_per_s": round(out["trimmed_audio_seconds"] / dt, 3),
        "out_dir": args.out_dir,
    }))


if __name__ == "__main__":
    main()
