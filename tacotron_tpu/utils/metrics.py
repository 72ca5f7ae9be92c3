"""Observability: scalars, alignment heatmaps, audio summaries (SURVEY.md §5.5).

The reference logged three artifact kinds via tf.summary: loss scalars,
matplotlib attention-alignment images (THE Tacotron health check), and
periodic Griffin-Lim audio [R]. The rebuild keeps all three through
tensorboardX, written host-0-only, plus the two graded throughput counters
(frames/s/chip, audio-seconds/s) as first-class scalars (BASELINE.json:2).
"""

from __future__ import annotations

import io
import os

import numpy as np


def plot_alignment(alignment: np.ndarray, title: str = "") -> np.ndarray:
    """(dec_steps, T_in) -> HWC uint8 heatmap image (matplotlib, Agg)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4), dpi=100)
    im = ax.imshow(alignment.T, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("decoder step")
    ax.set_ylabel("encoder position")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    buf = io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    buf.seek(0)
    import PIL.Image

    return np.asarray(PIL.Image.open(buf).convert("RGB"))


def alignment_scores(align: np.ndarray, text_len: int,
                     frame_steps: int) -> dict:
    """Monotonicity metrics of one utterance's attention map.

    ``align``: (dec_steps, T_in). Scored over the active region only.
    Returns monotonic_frac (fraction of adjacent decoder steps whose attention
    argmax does not move backwards, tolerance 1 encoder position), diag_corr
    (Pearson r between argmax position and decoder step — 1.0 is a perfect
    diagonal, the reference's de-facto training health check, SURVEY.md §4.1),
    and span_frac (fraction of encoder positions ever attended)."""
    a = np.asarray(align)[:frame_steps, :text_len]
    pos = a.argmax(axis=-1).astype(np.float64)
    steps = np.arange(len(pos), dtype=np.float64)
    fwd = np.diff(pos) >= -1.0
    corr = float(np.corrcoef(steps, pos)[0, 1]) if pos.std() > 0 else 0.0
    return {
        "monotonic_frac": float(fwd.mean()),
        "diag_corr": corr,
        "span_frac": float(np.unique(pos).size / text_len),
    }


class SummaryWriter:
    """Thin tensorboardX wrapper; silently no-ops on non-primary hosts."""

    def __init__(self, log_dir: str, enabled: bool = True):
        self.enabled = enabled
        self._w = None
        if enabled:
            os.makedirs(log_dir, exist_ok=True)
            from tensorboardX import SummaryWriter as TBWriter

            self._w = TBWriter(log_dir)

    def scalar(self, tag: str, value, step: int):
        if self._w:
            self._w.add_scalar(tag, float(value), step)

    def scalars(self, values: dict, step: int, prefix: str = ""):
        for k, v in values.items():
            self.scalar(prefix + k, v, step)

    def alignment(self, tag: str, alignment: np.ndarray, step: int):
        if self._w:
            img = plot_alignment(np.asarray(alignment), title=f"step {step}")
            self._w.add_image(tag, img, step, dataformats="HWC")

    def audio(self, tag: str, wav: np.ndarray, sample_rate: int, step: int):
        if not self._w:
            return
        try:
            self._w.add_audio(tag, np.clip(wav, -1, 1)[None, :], step,
                              sample_rate=sample_rate)
        except (ImportError, ModuleNotFoundError):
            # tensorboardX's audio encoding needs soundfile, absent in this
            # image — keep the domain diagnostic as a wav next to the events
            from tacotron_tpu.data.ljspeech import save_wav

            d = os.path.join(self._w.logdir, "audio")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"{tag.replace('/', '_')}_{step}.wav")
            save_wav(path, np.asarray(wav), sample_rate)
            self._w.add_text(tag, f"audio written to {path}", step)

    def flush(self):
        if self._w:
            self._w.flush()

    def close(self):
        if self._w:
            self._w.close()
