"""Gate on the committed alignment-learning evidence (VERDICT r1 item 2).

The reference's de-facto validation was a trained model whose attention
alignment is a monotonic diagonal (SURVEY.md §4.1). `scripts/alignment_run.py`
produces that evidence for the rebuild — 20k minibatch steps over a 128-utt
char-tone corpus (the decoder CANNOT memorise per-utterance outputs, so the
attention must resolve text position) — and commits the raw alignments +
summary under artifacts/alignment/. This test recomputes the monotonicity
metrics from the raw .npy (not trusting the recorded summary) and gates them,
so the committed artifact can't silently rot or be replaced by a weaker run.

The live training path itself is gated by the (slow) overfit test in
tests/integration/test_train_integration.py; reproducing the full diagonal
takes ~20k steps and lives in the script, not the suite.
"""

import json
import os

import numpy as np

from tacotron_tpu.utils.metrics import alignment_scores

ART = os.path.join(os.path.dirname(__file__), "..", "..",
                   "artifacts", "alignment")

DIAG_CORR_GATE = 0.9        # 1.0 = perfect diagonal; r1's failed probe: 0.19
MONOTONIC_GATE = 0.95


def _recompute(art_dir):
    """Recompute the summary metrics from the raw .npy with the IDENTICAL
    protocol the generator used: per-utterance true lengths, recorded in the
    summary as text_lens/frame_steps (the r2 mismatch — nominal text_len +
    padded step count here vs true lengths in the generator — is what let the
    committed summary drift from what this gate could verify)."""
    al = np.load(os.path.join(art_dir, "final_alignments.npy"))  # (B, S, T_in)
    with open(os.path.join(art_dir, "summary.json")) as f:
        s = json.load(f)
    scores = [alignment_scores(al[j], s["text_lens"][j], s["frame_steps"][j])
              for j in range(al.shape[0])]
    return s, scores


def test_alignment_artifact_is_a_monotonic_diagonal():
    s, scores = _recompute(ART)
    diag = float(np.mean([x["diag_corr"] for x in scores]))
    mono = float(np.mean([x["monotonic_frac"] for x in scores]))
    assert diag >= DIAG_CORR_GATE, f"diag_corr_mean {diag}"
    assert mono >= MONOTONIC_GATE, f"monotonic_frac_mean {mono}"
    # every utterance individually monotone-ish — no memorised outliers
    assert min(x["monotonic_frac"] for x in scores) >= 0.85
    # summary must match what the raw artifact actually contains
    np.testing.assert_allclose(diag, s["diag_corr_mean"], atol=1e-6)


def test_alignment_artifact_entropy_decreased_during_training():
    with open(os.path.join(ART, "summary.json")) as f:
        s = json.load(f)
    ents = [row["entropy"] for row in s["curve"]]
    # attention sharpened materially over training (uniform over 14 ~ 2.64)
    assert ents[-1] < ents[0] - 0.5, (ents[0], ents[-1])
    assert s["final"]["mel_loss"] < 0.02   # BASELINE.md toy-convergence row


# ---- flagship (256-d full_1chip) model at corpus scale: same gates, produced
# by scripts/alignment_run.py --preset full_1chip --n-utts 512 --text-len 20.
# Skipped until the run completes and the artifact is committed.

ART_FULL = os.path.join(os.path.dirname(__file__), "..", "..",
                        "artifacts", "alignment_full")

import pytest  # noqa: E402


ART_R5 = os.path.join(os.path.dirname(__file__), "..", "..",
                      "artifacts", "alignment_r5")


@pytest.mark.parametrize("art_dir", [ART_FULL, ART_R5],
                         ids=["alignment_full", "alignment_r5"])
def test_full_model_alignment_artifact_is_a_monotonic_diagonal(art_dir):
    # alignment_r5: the r=5 renderable-regime flagship run (VERDICT r4
    # next #1) — same gates, same recompute-from-raw protocol
    if not os.path.exists(os.path.join(art_dir, "final_alignments.npy")):
        pytest.skip("artifact not yet committed")
    s, scores = _recompute(art_dir)
    diag = float(np.mean([x["diag_corr"] for x in scores]))
    mono = float(np.mean([x["monotonic_frac"] for x in scores]))
    assert diag >= DIAG_CORR_GATE, f"diag_corr_mean {diag}"
    assert mono >= MONOTONIC_GATE, f"monotonic_frac_mean {mono}"
    np.testing.assert_allclose(diag, s["diag_corr_mean"], atol=1e-6)
    # eval-mode deterministic scoring is part of the protocol contract
    assert "eval_fwd" in s.get("scoring", "")
