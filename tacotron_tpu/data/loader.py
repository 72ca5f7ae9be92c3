"""Host-side input pipeline: bucketed, padded, prefetched batches.

TPU-native replacement for the reference's TF queue runners (SURVEY.md §2.1
#3, §2.2 [R]): no device-side queues — a host thread assembles static-shaped
numpy batches per bucket and a double-buffered prefetcher overlaps host work
with device steps (SURVEY.md §2.3 "intra-op concurrency").

Multi-host: each process takes a deterministic shard of the utterance list by
``process_index`` (SURVEY.md §2.4 "cross-host data plane") and draws its
*local* batch; under jit+GSPMD the per-host arrays form the global batch.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from dataclasses import dataclass

import numpy as np

from tacotron_tpu.data.buckets import BucketSpec, assign_bucket, make_buckets
from tacotron_tpu.data.vocab import Vocab


@dataclass
class Batch:
    text: np.ndarray        # (B, text_len) int32, pad 0
    text_len: np.ndarray    # (B,) int32
    mel: np.ndarray         # (B, n_frames, n_mels) feature_dtype (f16 default:
                            # the packed source is f16, so shipping f16 to the
                            # device and casting inside the jitted step is
                            # bit-identical at half the PCIe bytes)
    linear: np.ndarray      # (B, n_frames, n_freq) feature_dtype
    frame_len: np.ndarray   # (B,) int32
    bucket: int = 0


class Dataset:
    """Packed-array dataset produced by ljspeech.preprocess."""

    def __init__(self, data_dir: str):
        self.data_dir = data_dir
        with open(os.path.join(data_dir, "index.json")) as f:
            self.index = json.load(f)
        self.vocab = Vocab.load(os.path.join(data_dir, "vocab.json"))
        self.texts = np.load(os.path.join(data_dir, "texts.npy"), mmap_mode="r")
        self.mels = np.load(os.path.join(data_dir, "mels.npy"), mmap_mode="r")
        self.linears = np.load(os.path.join(data_dir, "linears.npy"), mmap_mode="r")

    def __len__(self):
        return len(self.index)

    def utterance(self, i: int):
        e = self.index[i]
        text = np.asarray(self.texts[e["text_offset"] : e["text_offset"] + e["text_len"]])
        mel = np.asarray(self.mels[e["frame_offset"] : e["frame_offset"] + e["n_frames"]],
                         dtype=np.float32)
        lin = np.asarray(self.linears[e["frame_offset"] : e["frame_offset"] + e["n_frames"]],
                         dtype=np.float32)
        return text, mel, lin


class DataLoader:
    def __init__(self, dataset: Dataset, batch_size: int, num_buckets: int, r: int,
                 seed: int = 0, process_index: int = 0, process_count: int = 1,
                 drop_oversize: bool = True, prefetch: int = 2,
                 use_native: bool = True, feature_dtype: str = "float16"):
        self.ds = dataset
        self.batch_size = batch_size
        self.r = r
        self.feature_dtype = np.dtype(feature_dtype)
        # Native C++ batch assembler (tacotron_tpu/native): threads do the
        # f16->f32 + pad + gather; numpy fallback when the toolchain is absent.
        self.native = None
        if use_native:
            try:
                from tacotron_tpu.native import NativeBatcher

                self.native = NativeBatcher(dataset)
            except (RuntimeError, OSError, ImportError):
                self.native = None
        text_lens = [e["text_len"] for e in dataset.index]
        frame_lens = [e["n_frames"] for e in dataset.index]
        self.buckets = make_buckets(text_lens, frame_lens, num_buckets, r)
        if not self.buckets:  # degenerate tiny datasets
            self.buckets = [BucketSpec(
                text_len=max(text_lens), n_frames=((max(frame_lens) + r - 1) // r) * r
            )]
        # deterministic per-host shard (SURVEY.md §2.4)
        self.my_items = [
            i for i in range(len(dataset)) if i % process_count == process_index
        ]
        self.assignments = {}
        for i in self.my_items:
            e = dataset.index[i]
            b = assign_bucket(self.buckets, e["text_len"], e["n_frames"])
            if b < 0:
                if drop_oversize:
                    continue
                b = len(self.buckets) - 1
            self.assignments.setdefault(b, []).append(i)
        self.rng = np.random.default_rng(seed + process_index)
        self.prefetch = prefetch

    def _make_batch(self, bucket_id: int, items: list[int]) -> Batch:
        spec = self.buckets[bucket_id]
        if self.native is not None:
            text, text_len, mel, lin, frame_len = self.native.assemble(
                items, spec.text_len, spec.n_frames, dtype=self.feature_dtype
            )
            return Batch(text, text_len, mel, lin, frame_len, bucket=bucket_id)
        b = len(items)
        n_mels = self.ds.mels.shape[1]
        n_freq = self.ds.linears.shape[1]
        text = np.zeros((b, spec.text_len), np.int32)
        mel = np.zeros((b, spec.n_frames, n_mels), self.feature_dtype)
        lin = np.zeros((b, spec.n_frames, n_freq), self.feature_dtype)
        text_len = np.zeros((b,), np.int32)
        frame_len = np.zeros((b,), np.int32)
        for j, i in enumerate(items):
            t, m, l = self.ds.utterance(i)
            n_f = min(len(m), spec.n_frames)
            n_t = min(len(t), spec.text_len)
            text[j, :n_t] = t[:n_t]
            mel[j, :n_f] = m[:n_f]
            lin[j, :n_f] = l[:n_f]
            text_len[j] = n_t
            frame_len[j] = n_f
        return Batch(text, text_len, mel, lin, frame_len, bucket=bucket_id)

    def epoch(self, shuffle: bool = True):
        """Yield full batches; within a batch all items share a bucket.
        Remainders are wrapped (sampled with replacement) to keep shapes static."""
        order = {}
        for b, items in self.assignments.items():
            idx = np.array(items)
            if shuffle:
                self.rng.shuffle(idx)
            order[b] = idx
        pending = [(b, i) for b, idx in order.items()
                   for i in range(0, len(idx), self.batch_size)]
        if shuffle:
            self.rng.shuffle(pending)
        for b, start in pending:
            chunk = order[b][start : start + self.batch_size]
            if len(chunk) < self.batch_size:
                extra = self.rng.choice(order[b], self.batch_size - len(chunk))
                chunk = np.concatenate([chunk, extra])
            yield self._make_batch(b, list(chunk))

    def __iter__(self):
        """Infinite prefetched stream over reshuffled epochs."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                for batch in self.epoch(shuffle=True):
                    if stop.is_set():
                        return
                    q.put(batch)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
