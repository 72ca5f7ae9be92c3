"""Alignment-learning evidence run (VERDICT.md round-1 missing item #1).

The reference's de-facto validation was a trained model whose TensorBoard
attention-alignment image shows a monotonic diagonal (SURVEY.md §4.1 [R]).
This script produces that evidence for the rebuild: it overfits the char-tone
toy corpus (audio IS the text — each character renders as a pitch-coded tone,
so a ground-truth monotonic alignment exists) and records

  * the attention-entropy curve over training,
  * a monotonicity score: fraction of adjacent decoder steps whose attention
    argmax does not move backwards (tolerance 1 encoder position),
  * a diagonal-correlation score: Pearson r between attention argmax position
    and decoder step index,
  * final mel/linear L1 (the BASELINE.md "Mel L1 at convergence" toy row),
  * the final alignment heatmap (PNG via utils/metrics.plot_alignment + raw
    .npy), committed under artifacts/alignment/.

Run:  python scripts/alignment_run.py [--steps 3000] [--platform cpu]
      (default platform = whatever JAX gives; TPU is ~an order faster)

The gated regression test lives in tests/integration/test_alignment.py
(marked slow): same corpus/config, fewer steps, softer thresholds.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def monotonicity(align: np.ndarray, text_len: int, frame_steps: int) -> dict:
    """Shared scorer (also used by tests/unit/test_alignment_artifact.py)."""
    from tacotron_tpu.utils.metrics import alignment_scores

    return alignment_scores(align, text_len, frame_steps)


def entropy(align: np.ndarray) -> float:
    a = np.clip(align, 1e-8, 1.0)
    return float(-(a * np.log(a)).sum(-1).mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--n-utts", type=int, default=16)
    p.add_argument("--text-len", type=int, default=14)
    p.add_argument("--char-sec", type=float, default=0.06,
                   help="tone duration per character. The alignment pressure "
                        "scales with decoder steps per character: at ~2 "
                        "steps/char the teacher-forced input crosses a tone "
                        "boundary nearly every step, so copying the previous "
                        "frame cannot solve the task and attention must. "
                        "(r=2 models want ~0.025 s at hop 128; the r=5 tiny "
                        "preset got the same ratio from the 0.06 default — "
                        "the full-model 0.06/r=2 run collapsed onto position "
                        "0 instead of aligning)")
    p.add_argument("--char-sec-jitter", type=float, default=0.0,
                   help="random per-character duration in char_sec*[1-j,1+j]: "
                        "boundary timing becomes observable only through "
                        "attention (see data/ljspeech.generate_char_tone_"
                        "corpus)")
    p.add_argument("--alphabet-size", type=int, default=26,
                   help="distinct characters; with a larger alphabet and "
                        "enough utterances the decoder cannot memorise the "
                        "corpus through its autoregressive state, so the "
                        "attention MUST resolve text position")
    p.add_argument("--batch-size", type=int, default=0,
                   help="0 = overfit one fixed batch of all n-utts (fast "
                        "demo). >0 = shuffled minibatches over the corpus — "
                        "with n-utts >> batch the decoder cannot memorise "
                        "per-utterance outputs, which is what forces a real "
                        "positional alignment (the r1 probe's flat-attention "
                        "failure mode was exactly single-batch memorisation)")
    p.add_argument("--platform", default=None)
    p.add_argument("--preset", default="tiny_cpu",
                   help="model preset; 'full_1chip' = the flagship 256-d r=2 "
                        "architecture (fast on TPU, hours on CPU)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE",
                   help="config override, repeatable — e.g. --set model.r=5 "
                        "(the r5 renderable-regime evidence run, VERDICT r4 "
                        "next #1)")
    p.add_argument("--out", default="artifacts/alignment")
    p.add_argument("--save-run", default=None,
                   help="also write a synthesize-compatible run dir "
                        "(config.json + ckpt/step_N) here at the end, so the "
                        "trained model can be driven by cli/synthesize — the "
                        "end-to-end audio-evidence path "
                        "(scripts/audio_evidence.py) builds on this")
    p.add_argument("--resume-from", default=None,
                   help="run dir written by a previous --save-run: restore "
                        "its latest checkpoint and continue training (the "
                        "corpus is regenerated deterministically from the "
                        "same args, so the data distribution is identical); "
                        "--steps counts ADDITIONAL steps on top of the "
                        "restored step")
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--save-every", type=int, default=0,
                   help="also score + write artifacts every N steps (0 = only "
                        "at the end) — a truncated long run still leaves "
                        "evidence on disk")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from tacotron_tpu.config import AudioConfig, get_config
    from tacotron_tpu.data import ljspeech
    from tacotron_tpu.data.loader import DataLoader, Dataset
    from tacotron_tpu.models import Tacotron
    from tacotron_tpu.train.step import create_train_state, make_train_step
    from tacotron_tpu.utils.metrics import plot_alignment

    acfg = AudioConfig(n_fft=512, win_length=400, hop_length=128, n_mels=80)
    # corpus/data working dir is keyed to --out: two concurrent runs (e.g. a
    # long evidence run + a quick smoke) must not clobber each other's packed
    # arrays mid-training (observed: silent SIGBUS death of the long run)
    root = os.path.abspath(args.out).rstrip("/") + "_work"
    ljspeech.generate_char_tone_corpus(
        os.path.join(root, "corpus"), n=args.n_utts, text_len=args.text_len,
        alphabet_size=args.alphabet_size, char_sec=args.char_sec,
        char_sec_jitter=args.char_sec_jitter)
    ljspeech.preprocess(os.path.join(root, "corpus"),
                        os.path.join(root, "data"), acfg, chunk=8)
    ds = Dataset(os.path.join(root, "data"))

    from tacotron_tpu.config import apply_overrides

    cfg = apply_overrides(get_config(args.preset), args.overrides)
    cfg = dataclasses.replace(
        cfg, audio=acfg,
        model=dataclasses.replace(cfg.model,
                                  vocab_size=max(32, len(ds.vocab)),
                                  n_freq=acfg.n_freq),
    )
    dl = DataLoader(ds, batch_size=args.batch_size or args.n_utts,
                    num_buckets=1, r=cfg.model.r, seed=5)
    it = iter(dl)

    def to_dev(b):
        return (jnp.asarray(b.text), jnp.asarray(b.text_len),
                jnp.asarray(b.mel), jnp.asarray(b.linear),
                jnp.asarray(b.frame_len))

    b = next(it)                       # fixed eval batch (= the train batch
    eval_batch = to_dev(b)             # in single-batch overfit mode)

    state = create_train_state(cfg, jax.random.PRNGKey(3))
    step0 = 0
    if args.resume_from:
        from tacotron_tpu.train import checkpoint

        state, step0 = checkpoint.restore(
            os.path.join(args.resume_from, "ckpt"), state)
        print(f"resumed from {args.resume_from} at step {step0}", flush=True)
    step = make_train_step(cfg)

    curve = []
    tl = np.asarray(b.text_len)
    fl = np.asarray(b.frame_len)
    os.makedirs(args.out, exist_ok=True)

    # Scoring runs an EVAL-mode teacher-forced forward (train=False: BN uses
    # running stats, no state mutation, no optimizer update) with a FIXED
    # dropout key (prenet dropout is active at inference by paper design,
    # SURVEY.md §2.1 #4, but the fixed key makes the pass deterministic).
    # The r2 protocol ran a TRAIN step on a defensive state copy — live
    # dropout made the committed summary drift from what the gate test could
    # recompute (VERDICT r2 weak #1/#5).
    eval_model = Tacotron(cfg.model, train=False)
    eval_key = jax.random.PRNGKey(0)

    @jax.jit
    def eval_fwd(params, batch_stats, text, text_len, mel):
        out = eval_model.apply({"params": params, "batch_stats": batch_stats},
                               text, text_len,
                               gt_mel=mel.astype(jnp.float32),
                               rngs={"dropout": eval_key})
        return out.alignments

    # The scoring protocol — per-utterance TRUE lengths — is recorded in the
    # summary (text_lens / frame_steps) so the gate test recomputes with the
    # IDENTICAL slices; scoring with nominal/padded lengths diverges once
    # --char-sec-jitter varies per-utterance frame counts.
    text_lens = [int(x) for x in tl]
    frame_steps = [int(x) // cfg.model.r for x in fl]

    def score_and_save(state, at_step):
        al = eval_fwd(state.params, state.batch_stats,
                      eval_batch[0], eval_batch[1], eval_batch[2])
        al_np = np.asarray(al)                # (B, dec_steps, T_in)
        scores = [monotonicity(al_np[j], text_lens[j], frame_steps[j])
                  for j in range(len(tl))]
        summary = {
            "steps": at_step,
            "n_utts": args.n_utts,
            "text_len": args.text_len,
            "text_lens": text_lens,
            "frame_steps": frame_steps,
            "args": {k: v for k, v in vars(args).items()},
            "scoring": "eval_fwd(train=False, fixed dropout key), "
                       "per-utterance true lengths",
            "final": curve[-1] if curve else None,
            "monotonic_frac_mean": float(np.mean([s["monotonic_frac"] for s in scores])),
            "monotonic_frac_min": float(np.min([s["monotonic_frac"] for s in scores])),
            "diag_corr_mean": float(np.mean([s["diag_corr"] for s in scores])),
            "diag_corr_min": float(np.min([s["diag_corr"] for s in scores])),
            "per_utt": scores,
            "curve": curve,
            "backend": jax.default_backend(),
        }
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        np.save(os.path.join(args.out, "final_alignments.npy"), al_np)
        # heatmap of the first utterance's active region
        img = plot_alignment(al_np[0, :int(fl[0]) // cfg.model.r, :int(tl[0])],
                             title=f"char-tone utt0 @ step {at_step}")
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.imsave(os.path.join(args.out, "alignment_utt0.png"), img)
        except Exception as e:  # keep the npy artifact even if PNG fails
            print("png save failed:", e)
        print(json.dumps({k: summary[k] for k in
                          ("monotonic_frac_mean", "diag_corr_mean", "final")}),
              flush=True)

    for i in range(step0 + 1, step0 + args.steps + 1):
        batch = eval_batch if args.batch_size == 0 else to_dev(next(it))
        state, m, al = step(state, *batch)
        if i % args.log_every == 0 or i == step0 + args.steps:
            al_np = np.asarray(al)
            ent = entropy(al_np)
            row = {"step": i, "total_loss": float(m["total_loss"]),
                   "mel_loss": float(m["mel_loss"]),
                   "linear_loss": float(m["linear_loss"]), "entropy": ent}
            curve.append(row)
            print(f"step {i:5d}  loss {row['total_loss']:.4f}  "
                  f"mel {row['mel_loss']:.4f}  entropy {ent:.3f}", flush=True)
        if args.save_every and i % args.save_every == 0 \
                and i < step0 + args.steps:
            score_and_save(state, i)
            if args.save_run:   # a truncated long run still leaves a ckpt
                from tacotron_tpu.train import checkpoint

                os.makedirs(args.save_run, exist_ok=True)
                with open(os.path.join(args.save_run, "config.json"),
                          "w") as f:
                    f.write(cfg.to_json())
                checkpoint.save(os.path.join(args.save_run, "ckpt"), i, state)

    score_and_save(state, step0 + args.steps)

    if args.save_run:
        from tacotron_tpu.train import checkpoint

        os.makedirs(args.save_run, exist_ok=True)
        with open(os.path.join(args.save_run, "config.json"), "w") as f:
            f.write(cfg.to_json())
        path = checkpoint.save(os.path.join(args.save_run, "ckpt"),
                               int(state.step), state)
        print(f"run dir written: {args.save_run} (ckpt {path})")


if __name__ == "__main__":
    main()
