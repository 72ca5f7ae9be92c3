"""Host-side input pipeline: bucketed, padded, prefetched batches.

TPU-native replacement for the reference's TF queue runners (SURVEY.md §2.1
#3, §2.2 [R]): no device-side queues — a host thread assembles static-shaped
numpy batches per bucket and a double-buffered prefetcher overlaps host work
with device steps (SURVEY.md §2.3 "intra-op concurrency").

Multi-host: the per-step bucket schedule is drawn from a SHARED seed over the
global assignment — every host agrees on the step's batch shape — and each
process draws its positional shard of the globally-shuffled items
(SURVEY.md §2.4 "cross-host data plane"); under jit+GSPMD the per-host
arrays form the global batch.
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
    items: tuple = ()       # dataset indices behind each row (debug/tests)


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


class DeviceCache:
    """Device-resident dataset: upload the packed arrays ONCE, assemble each
    step's padded batch on device with a jitted gather.

    For corpora that fit HBM (every corpus used on this machine; LJSpeech
    packed-f16 is ~4 GB vs 16 GB/chip) this removes the per-step host->device
    feature transfer entirely — the only upload per step is five (B,) int32
    index/length vectors. The padded (B, T, n_mels/n_freq) batch is built by
    an XLA gather from the flat packed arrays (HBM->HBM at memory bandwidth),
    so input assembly runs at device speed instead of host-link speed
    (SURVEY.md §2.3 intra-op concurrency; VERDICT r3 next #3).

    Features stay in the on-disk f16 layout on device (the jitted train step
    casts to f32 on first use — bit-identical to the f16 wire path).
    """

    def __init__(self, dataset: Dataset, feature_dtype=np.float16):
        import jax
        import jax.numpy as jnp

        self._jnp = jnp
        # one-time uploads (mmap -> host materialize -> device). Features are
        # uploaded in the on-disk layout, then cast ONCE on device to the
        # loader's wire dtype so every loader mode serves identical batch
        # dtypes (the host/native assemblers cast per batch).
        fdt = jnp.dtype(np.dtype(feature_dtype))
        # size-vs-HBM sanity check (ADVICE r4): an oversized corpus should
        # fail HERE with a clear message, not deep in jnp.asarray with an
        # opaque allocator error. memory_stats() is optional per backend.
        need = (np.asarray(dataset.texts).nbytes
                + (dataset.mels.shape[0] * dataset.mels.shape[1]
                   + dataset.linears.shape[0] * dataset.linears.shape[1])
                * fdt.itemsize)
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit and need > 0.9 * limit:
            raise ValueError(
                f"DeviceCache: packed corpus needs ~{need / 2**30:.2f} GiB "
                f"on device but the chip reports {limit / 2**30:.2f} GiB "
                f"HBM — the whole-corpus upload would not leave room for "
                f"activations. Use the streaming loader (device_cache=False) "
                f"for this corpus.")
        self.texts = jnp.asarray(np.asarray(dataset.texts))
        self.mels = jnp.asarray(np.asarray(dataset.mels)).astype(fdt)
        self.linears = jnp.asarray(np.asarray(dataset.linears)).astype(fdt)
        idx = dataset.index
        self.t_off = np.asarray([e["text_offset"] for e in idx], np.int32)
        self.t_len = np.asarray([e["text_len"] for e in idx], np.int32)
        self.f_off = np.asarray([e["frame_offset"] for e in idx], np.int32)
        self.f_len = np.asarray([e["n_frames"] for e in idx], np.int32)

        def _assemble(texts, mels, linears, t_off, t_len, f_off, f_len,
                      t_pad, f_pad):
            ar_t = jnp.arange(t_pad, dtype=jnp.int32)
            # clamp the gather index to the row's last element; the mask
            # zeroes the padding region (pad id 0 / zero frames)
            idx_t = t_off[:, None] + jnp.minimum(
                ar_t[None, :], jnp.maximum(t_len[:, None] - 1, 0))
            text = texts[idx_t] * (ar_t[None, :] < t_len[:, None])
            ar_f = jnp.arange(f_pad, dtype=jnp.int32)
            idx_f = f_off[:, None] + jnp.minimum(
                ar_f[None, :], jnp.maximum(f_len[:, None] - 1, 0))
            mask_f = (ar_f[None, :] < f_len[:, None])[:, :, None]
            mel = mels[idx_f] * mask_f.astype(mels.dtype)
            lin = linears[idx_f] * mask_f.astype(linears.dtype)
            return text.astype(jnp.int32), t_len, mel, lin, f_len

        # one compile per (batch, text_pad, frame_pad) bucket shape
        self._fn = jax.jit(_assemble, static_argnums=(7, 8))

    def assemble(self, items, text_pad: int, frame_pad: int):
        """(device) text, text_len, mel, linear, frame_len for these rows."""
        it = np.asarray(items, np.int64)
        jnp = self._jnp
        return self._fn(
            self.texts, self.mels, self.linears,
            jnp.asarray(self.t_off[it]),
            jnp.asarray(np.minimum(self.t_len[it], text_pad)),
            jnp.asarray(self.f_off[it]),
            jnp.asarray(np.minimum(self.f_len[it], frame_pad)),
            text_pad, frame_pad)


class DataLoader:
    def __init__(self, dataset: Dataset, batch_size: int, num_buckets: int, r: int,
                 seed: int = 0, process_index: int = 0, process_count: int = 1,
                 drop_oversize: bool = True, prefetch: int = 2,
                 use_native: bool = True, feature_dtype: str = "float16",
                 device_cache: bool = False):
        self.ds = dataset
        self.batch_size = batch_size
        self.r = r
        self.feature_dtype = np.dtype(feature_dtype)
        # Device-resident mode: batches are assembled ON DEVICE by a jitted
        # gather from once-uploaded packed arrays; Batch fields are jax
        # arrays. The native/numpy host assemblers are bypassed.
        self.cache = (DeviceCache(dataset, self.feature_dtype)
                      if device_cache else None)
        # Native C++ batch assembler (tacotron_tpu/native): threads do the
        # f16->f32 + pad + gather; numpy fallback when the toolchain is absent.
        self.native = None
        if use_native and not device_cache:
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
        self.process_index = process_index
        self.process_count = process_count
        # GLOBAL bucket assignment, identical on every host (derived from the
        # full index, which all hosts share on disk): the per-step bucket
        # schedule must be a pure function of shared state, because under
        # GSPMD every host's local batch is one shard of the same global
        # array — hosts disagreeing on the step's bucket (= batch SHAPE)
        # deadlocks the collective (VERDICT r2 §2.3 hazard).
        self.assignments = {}
        for i in range(len(dataset)):
            e = dataset.index[i]
            b = assign_bucket(self.buckets, e["text_len"], e["n_frames"])
            if b < 0:
                if drop_oversize:
                    continue
                b = len(self.buckets) - 1
            self.assignments.setdefault(b, []).append(i)
        self.assignments = {b: np.asarray(v) for b, v in self.assignments.items()}
        # static modulo shard — the deterministic partition property
        # (SURVEY.md §2.4); per-epoch item draws use positional shards of the
        # shared global shuffle instead, so which items a host sees rotates
        # across epochs while every host agrees on counts
        self.my_items = [
            i for i in range(len(dataset)) if i % process_count == process_index
        ]
        # TWO generators: the schedule rng (shared seed, NO process_index) is
        # consumed identically on every host — global per-bucket shuffles and
        # the step->bucket sequence come from it. The fill rng is host-local;
        # it only picks wrap-fill items WITHIN the agreed bucket, so host
        # divergence there is shape-safe.
        self.sched_rng = np.random.default_rng(seed)
        self.rng = np.random.default_rng(seed + process_index)
        self.prefetch = prefetch

    def _make_batch(self, bucket_id: int, items: list[int]) -> Batch:
        spec = self.buckets[bucket_id]
        if self.cache is not None:
            text, text_len, mel, lin, frame_len = self.cache.assemble(
                items, spec.text_len, spec.n_frames)
            return Batch(text, text_len, mel, lin, frame_len,
                         bucket=bucket_id, items=tuple(items))
        if self.native is not None:
            text, text_len, mel, lin, frame_len = self.native.assemble(
                items, spec.text_len, spec.n_frames, dtype=self.feature_dtype
            )
            return Batch(text, text_len, mel, lin, frame_len,
                         bucket=bucket_id, items=tuple(items))
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
        return Batch(text, text_len, mel, lin, frame_len, bucket=bucket_id,
                     items=tuple(items))

    def epoch(self, shuffle: bool = True):
        """Yield full batches; within a batch all items share a bucket.

        Multi-host contract: every host yields the SAME bucket id at the same
        position in the epoch (schedule drawn from the shared-seed rng over
        the global assignment), so all hosts compile/feed the same batch
        shape each step. Remainders are wrapped (sampled with replacement,
        host-local rng) to keep shapes static."""
        order, steps = {}, {}
        per_step_global = self.batch_size * self.process_count
        for b, idx_all in self.assignments.items():
            idx = idx_all.copy()
            if shuffle:
                self.sched_rng.shuffle(idx)
            # my positional shard of the shared global shuffle; the step
            # count below depends only on the GLOBAL size, never the shard's
            order[b] = idx[self.process_index::self.process_count]
            steps[b] = -(-len(idx) // per_step_global)
        pending = [(b, s) for b in order for s in range(steps[b])]
        if shuffle:
            self.sched_rng.shuffle(pending)
        for b, s in pending:
            chunk = order[b][s * self.batch_size : (s + 1) * self.batch_size]
            if len(chunk) < self.batch_size:
                # shard may run dry before the global step count does (bucket
                # smaller than the host count, uneven split); fill from the
                # bucket's own GLOBAL item list — never cross-bucket, which
                # would truncate long utterances mid-content (ADVICE r3).
                # Host-local sampling of another host's items is shape- and
                # content-safe here: fill rows are resampled training data,
                # not shards of a global array. assignments[b] is non-empty
                # by construction (b came from it).
                pool = order[b] if len(order[b]) else self.assignments[b]
                extra = self.rng.choice(pool, self.batch_size - len(chunk))
                chunk = np.concatenate([chunk, extra]) if len(chunk) else extra
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


def device_prefetch(batch_iter, put_fn, depth: int = 2):
    """Overlap host->device transfer with device compute.

    ``put_fn(batch) -> device arrays`` must use an ASYNC transfer
    (jax.device_put / sharded device_put: it enqueues the copy and returns
    immediately). Keeping ``depth`` batches in flight means the step consuming
    batch N runs while batch N+1's bytes move — without this the transfer
    serialises with the step (the reference's queue runners owned this
    overlap on the GPU side; SURVEY.md §2.3 "intra-op concurrency").
    Yields (host_batch, device_arrays) pairs so callers keep the host-side
    metadata (bucket id, frame counts, debug-sync hashes).
    """
    import collections

    q: "collections.deque" = collections.deque()
    it = iter(batch_iter)
    try:
        while True:
            while len(q) < depth:
                b = next(it)
                q.append((b, put_fn(b)))
            yield q.popleft()
    except StopIteration:
        while q:
            yield q.popleft()
