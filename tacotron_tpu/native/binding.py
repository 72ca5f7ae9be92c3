"""ctypes bindings + lazy g++ build for the native batch assembler."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "batcher.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_batcher.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _SO + ".tmp"],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(_SO + ".tmp", _SO)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def load_batcher():
    """Returns the ctypes lib or None (then callers use the numpy path)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        if lib.batcher_abi_version() != 2:
            return None
        lib.assemble_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,   # mels, linears (u16)
            ctypes.c_void_p,                    # texts (i32)
            ctypes.c_void_p, ctypes.c_void_p,   # text_off, text_len (i64)
            ctypes.c_void_p, ctypes.c_void_p,   # frame_off, frame_len (i64)
            ctypes.c_void_p, ctypes.c_int32,    # items, n_items
            ctypes.c_int32, ctypes.c_int32,     # text_pad, frame_pad
            ctypes.c_int32, ctypes.c_int32,     # n_mels, n_freq
            ctypes.c_void_p, ctypes.c_void_p,   # out_mel, out_lin (f32)
            ctypes.c_void_p,                    # out_text (i32)
            ctypes.c_void_p, ctypes.c_void_p,   # out_text_len, out_frame_len
            ctypes.c_int32,                     # n_threads
        ]
        lib.assemble_batch.restype = None
        # f16 passthrough variant: identical signature, u16 feature outputs
        lib.assemble_batch_f16.argtypes = lib.assemble_batch.argtypes
        lib.assemble_batch_f16.restype = None
        _lib = lib
        return _lib


class NativeBatcher:
    """Vectorised batch assembly over the packed dataset arrays."""

    def __init__(self, dataset):
        self.lib = load_batcher()
        if self.lib is None:
            raise RuntimeError("native batcher unavailable")
        ds = dataset
        # force plain contiguous views of the packed arrays (mmap-backed ok)
        self.mels = np.ascontiguousarray(ds.mels.view(np.uint16)) \
            if ds.mels.dtype == np.float16 else None
        if self.mels is None:
            raise RuntimeError("native batcher expects float16 packed features")
        self.linears = np.ascontiguousarray(ds.linears.view(np.uint16))
        self.texts = np.ascontiguousarray(ds.texts, dtype=np.int32)
        idx = ds.index
        self.text_off = np.array([e["text_offset"] for e in idx], np.int64)
        self.text_len = np.array([e["text_len"] for e in idx], np.int64)
        self.frame_off = np.array([e["frame_offset"] for e in idx], np.int64)
        self.frame_len = np.array([e["n_frames"] for e in idx], np.int64)
        self.n_mels = ds.mels.shape[1]
        self.n_freq = ds.linears.shape[1]

    def assemble(self, items, text_pad: int, frame_pad: int, n_threads: int = 0,
                 dtype=np.float32):
        """dtype float16 = raw pad+gather (half the host work and half the
        host->device bytes; source arrays are f16, so no precision is lost);
        float32 = legacy host-side conversion."""
        items = np.ascontiguousarray(items, dtype=np.int32)
        n = len(items)
        f16 = np.dtype(dtype) == np.float16
        fdt = np.float16 if f16 else np.float32
        fn = self.lib.assemble_batch_f16 if f16 else self.lib.assemble_batch
        out_mel = np.empty((n, frame_pad, self.n_mels), fdt)
        out_lin = np.empty((n, frame_pad, self.n_freq), fdt)
        out_text = np.empty((n, text_pad), np.int32)
        out_tl = np.empty((n,), np.int32)
        out_fl = np.empty((n,), np.int32)
        c = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        fn(
            c(self.mels), c(self.linears), c(self.texts),
            c(self.text_off), c(self.text_len), c(self.frame_off),
            c(self.frame_len), c(items), n, text_pad, frame_pad,
            self.n_mels, self.n_freq,
            c(out_mel), c(out_lin), c(out_text), c(out_tl), c(out_fl),
            n_threads,
        )
        return out_text, out_tl, out_mel, out_lin, out_fl
