"""Native (C++) host runtime: batch assembler with ctypes bindings.

Builds lazily with g++ on first use (no pybind11 in this image); falls back
to the pure-numpy path in data/loader.py when a toolchain is unavailable.
"""

from tacotron_tpu.native.binding import NativeBatcher, load_batcher

__all__ = ["NativeBatcher", "load_batcher"]
