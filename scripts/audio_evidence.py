"""End-to-end audio evidence: synthesized wavs machine-checked against prompts.

The reference's final validation loop was a human listening to TensorBoard
audio summaries (SURVEY.md §4.1 [R]) — subjective and unreproducible here.
The char-tone corpus makes that loop objective: audio IS the text (each
character renders as a pitch-coded tone), so the synthesized wav can be
DECODED back to characters (data/ljspeech.decode_char_tones, pure numpy) and
scored against the prompt by edit-distance character accuracy.

Run after scripts/alignment_run.py --save-run produced a trained run dir:

    python scripts/audio_evidence.py \
        --run-dir artifacts/alignment_full_work/run \
        --data-dir artifacts/alignment_full_work/data \
        --out artifacts/audio_evidence

Writes per-prompt wavs + summary.json (prompts, decoded strings, accuracies).
Prompts are HELD OUT (fresh seed, never in the training corpus) and avoid
adjacent duplicate characters so tone runs map 1:1 to characters. The gate
test (tests/unit/test_audio_evidence.py) re-decodes the committed wavs and
asserts accuracy — the artifact can't silently rot.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def held_out_prompts(n: int, text_len: int, alphabet_size: int,
                     seed: int) -> list[str]:
    rs = np.random.default_rng(seed)
    alphabet = "abcdefghijklmnopqrstuvwxyz"[:alphabet_size]
    prompts = []
    for _ in range(n):
        chars = [str(rs.choice(list(alphabet)))]
        while len(chars) < text_len:
            c = str(rs.choice(list(alphabet)))
            if c != chars[-1]:
                chars.append(c)
        prompts.append("".join(chars))
    return prompts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run-dir", default="artifacts/alignment_full_work/run")
    p.add_argument("--data-dir", default="artifacts/alignment_full_work/data")
    p.add_argument("--out", default="artifacts/audio_evidence")
    p.add_argument("--n-prompts", type=int, default=8)
    p.add_argument("--text-len", type=int, default=20)
    p.add_argument("--alphabet-size", type=int, default=26)
    p.add_argument("--char-sec", type=float, default=0.025,
                   help="training corpus mean tone duration — sizes the "
                        "decode-step budget")
    p.add_argument("--seed", type=int, default=123,
                   help="prompt seed — differs from the corpus seed, so "
                        "prompts are held out")
    p.add_argument("--corpus-prompts", action="store_true",
                   help="draw prompts from the TRAINING corpus metadata "
                        "instead of sampling held-out strings — the "
                        "reference's own audio check synthesized training "
                        "utterances (SURVEY.md §4.1 audio summaries); "
                        "prompts with adjacent duplicate characters are "
                        "skipped (the tone decoder merges duplicate runs)")
    p.add_argument("--no-dropout", action="store_true",
                   help="zero prenet dropout for the synthesis pass (paper "
                        "keeps it on at inference; on the deterministic "
                        "tone corpus it only injects noise — record which "
                        "mode produced the artifact)")
    p.add_argument("--steps", type=int, default=0,
                   help="decoder steps; 0 = 1.6x the expected frame count")
    p.add_argument("--gl-iters", type=int, default=1000)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tacotron_tpu.config import Config
    from tacotron_tpu.data.ljspeech import (char_accuracy, decode_char_tones,
                                            save_wav)
    from tacotron_tpu.data.vocab import Vocab
    from tacotron_tpu.infer import Synthesizer
    from tacotron_tpu.train import checkpoint
    from tacotron_tpu.train.step import create_train_state

    with open(os.path.join(args.run_dir, "config.json")) as f:
        cfg = Config.from_json(f.read())
    if args.no_dropout:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, prenet_dropout=0.0))
    vocab = Vocab.load(os.path.join(args.data_dir, "vocab.json"))
    template = create_train_state(cfg, jax.random.PRNGKey(0))
    state, step = checkpoint.restore(os.path.join(args.run_dir, "ckpt"),
                                     template)
    print(f"restored checkpoint at step {step}")

    if args.corpus_prompts:
        prompts = []
        corpus_meta = os.path.join(os.path.dirname(args.data_dir.rstrip("/")),
                                   "corpus", "metadata.csv")
        with open(corpus_meta) as f:
            for line in f:
                text = line.strip().split("|")[1]
                if all(a != b for a, b in zip(text, text[1:])):
                    prompts.append(text)
                if len(prompts) >= args.n_prompts:
                    break
    else:
        prompts = held_out_prompts(args.n_prompts, args.text_len,
                                   args.alphabet_size, args.seed)
    n_steps = args.steps or int(
        1.6 * args.text_len * args.char_sec * cfg.audio.sample_rate
        / cfg.audio.hop_length / cfg.model.r)

    synth = Synthesizer(cfg, state.params, state.batch_stats, vocab)
    out = synth(prompts, n_steps=n_steps, gl_iters=args.gl_iters)

    os.makedirs(args.out, exist_ok=True)
    rows = []
    for i, (prompt, wav) in enumerate(zip(prompts, out["wavs"])):
        wav = np.asarray(wav)
        # no stop token (paper §3.2): the fixed decode budget free-runs past
        # the utterance end, so the decoded string is scored on its
        # prompt-length prefix — the tail is post-content babble by design
        hyp = decode_char_tones(wav, cfg.audio.sample_rate,
                                args.alphabet_size)[: len(prompt)]
        acc = char_accuracy(prompt, hyp)
        path = os.path.join(args.out, f"utt_{i:02d}.wav")
        save_wav(path, wav, cfg.audio.sample_rate)
        rows.append({"prompt": prompt, "decoded": hyp,
                     "char_accuracy": round(acc, 4), "wav": f"utt_{i:02d}.wav"})
        print(f"{prompt} -> {hyp}  acc {acc:.3f}")

    summary = {
        "checkpoint_step": step,
        "n_prompts": args.n_prompts,
        "text_len": args.text_len,
        "alphabet_size": args.alphabet_size,
        "prompt_seed": args.seed,
        "n_decode_steps": n_steps,
        "gl_iters": args.gl_iters,
        "prompt_source": "training-corpus" if args.corpus_prompts
        else "held-out",
        "prenet_dropout": cfg.model.prenet_dropout,
        "sample_rate": cfg.audio.sample_rate,
        "per_prompt": rows,
        "char_accuracy_mean": round(float(np.mean(
            [r["char_accuracy"] for r in rows])), 4),
        "char_accuracy_min": round(float(np.min(
            [r["char_accuracy"] for r in rows])), 4),
        "backend": jax.default_backend(),
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("char_accuracy_mean", "char_accuracy_min")}))


if __name__ == "__main__":
    main()
