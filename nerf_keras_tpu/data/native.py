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

# void (*)(uint64_t epoch, int64_t* order, int64_t n) — the worker thread
# calls back into Python for each epoch's permutation so the native and
# numpy pipelines share one RNG (default_rng((seed, epoch))).  ctypes
# acquires the GIL for callbacks from foreign threads.
RESHUFFLE_FN = ctypes.CFUNCTYPE(
    None, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64
)


def _build() -> str:
    # Build to a per-process temp name and os.replace into place: g++
    # writing _LIB directly would let a SIBLING process (multi-process
    # launch on a fresh checkout) dlopen a half-written library — the
    # module-level lock only serializes threads within one process.
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, _SRC],
            check=True, capture_output=True,
        )
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
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
            ctypes.c_uint64, RESHUFFLE_FN,
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

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 start_epoch: int = 0):
        if int(batch_size) <= 0 or int(batch_size) > len(dataset):
            # The C++ worker would read the permutation out of bounds — a
            # SIGSEGV in a background thread no try/except can catch.
            raise ValueError(
                f"batch_size={batch_size} must be in [1, len(dataset)="
                f"{len(dataset)}]"
            )
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

        def _reshuffle(epoch: int, order_ptr, n: int) -> None:
            # Same keying as pipeline.iterate_batches: the two input paths
            # yield identical batch orders for a given (seed, epoch), and a
            # resumed run (start_epoch > 0) continues the original order.
            perm = np.ascontiguousarray(
                np.random.default_rng((seed, int(epoch))).permutation(n),
                dtype=np.int64,
            )
            # perm must stay bound to a local through the memmove: taking
            # .ctypes.data of a temporary frees the buffer before the copy.
            ctypes.memmove(order_ptr, perm.ctypes.data, n * 8)

        self._reshuffle_cb = RESHUFFLE_FN(_reshuffle)  # keep alive
        fp = ctypes.POINTER(ctypes.c_float)
        self._handle = lib.batcher_create(
            self._px.ctypes.data_as(fp),
            self._og.ctypes.data_as(fp),
            self._dr.ctypes.data_as(fp),
            self._px.shape[0], self.batch_size, seed,
            start_epoch, self._reshuffle_cb,
        )
        if not self._handle:
            raise RuntimeError("batcher_create rejected the arguments")
        self._out = np.empty((3, self.batch_size, 3), dtype=np.float32)

    @property
    def steps_per_epoch(self) -> int:
        if self._handle is None:
            # same guard as __next__: ctypes would pass NULL into C++ and
            # the null deref SIGSEGVs the interpreter, not an exception
            raise RuntimeError("NativeRayBatcher is closed")
        return int(self._lib.batcher_steps_per_epoch(self._handle))

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        return self

    def __next__(self):
        if self._handle is None:
            raise RuntimeError("NativeRayBatcher is closed")
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
