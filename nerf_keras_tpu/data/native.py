"""ctypes bindings for the native C++ ray batcher.

The reference's input pipeline is tf.data (shuffle buffer -> batch ->
prefetch(AUTOTUNE), reference data_utils.py:140-170).  Its JAX-side
equivalent here is a small C++ module (data/native/batcher.cc) that runs
per-epoch Fisher-Yates shuffling and the three per-step row gathers on a
background thread with a 4-deep ring of pre-assembled batches — host batch
assembly overlaps device compute instead of serializing with dispatch.

The library is compiled on first use (g++, ~1 s) and cached next to the
source; environments without a toolchain fall back to the pure-numpy
``iterate_batches`` transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "batcher.cc")
_LIB = os.path.join(os.path.dirname(__file__), "native", "libray_batcher.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None


def _build() -> str:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC],
        check=True, capture_output=True,
    )
    return _LIB


def load_library() -> ctypes.CDLL | None:
    """Compile (once) and load the batcher; None if no toolchain."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError):
            return None
        lib.batcher_create.restype = ctypes.c_void_p
        lib.batcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_float)] * 3 + [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
        ]
        lib.batcher_next.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_float)]
        lib.batcher_steps_per_epoch.restype = ctypes.c_int64
        lib.batcher_steps_per_epoch.argtypes = [ctypes.c_void_p]
        lib.batcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeRayBatcher:
    """Prefetching batch iterator over a RayDataset (infinite stream).

    Yields ``(pixels, origins, directions)`` float32 arrays of shape
    ``(batch_size, 3)`` each; reshuffles automatically at epoch boundaries.
    """

    def __init__(self, dataset, batch_size: int, seed: int = 0):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native batcher unavailable (no g++)")
        self._lib = lib
        self.batch_size = int(batch_size)
        # Own contiguous copies so the C++ side's borrowed pointers stay
        # valid and aligned for the object's lifetime.
        self._px = np.ascontiguousarray(dataset.pixels, dtype=np.float32)
        self._og = np.ascontiguousarray(dataset.origins, dtype=np.float32)
        self._dr = np.ascontiguousarray(dataset.directions, dtype=np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        self._handle = lib.batcher_create(
            self._px.ctypes.data_as(fp),
            self._og.ctypes.data_as(fp),
            self._dr.ctypes.data_as(fp),
            self._px.shape[0], self.batch_size, seed,
        )
        self._out = np.empty((3, self.batch_size, 3), dtype=np.float32)

    @property
    def steps_per_epoch(self) -> int:
        return int(self._lib.batcher_steps_per_epoch(self._handle))

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        return self

    def __next__(self):
        self._lib.batcher_next(
            self._handle,
            self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return (
            self._out[0].copy(),
            self._out[1].copy(),
            self._out[2].copy(),
        )

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.batcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
