"""Profiling and timing harness.

The reference has no tracing/profiling beyond tqdm progress bars
(SURVEY.md §5 tracing row).  This module provides the TPU-native
equivalents promised there:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory (XLA op breakdown, HBM usage);
* :class:`StepTimer` — dispatch-safe wall-clock timing of jitted steps.
  On tunneled PJRT backends (axon) ``block_until_ready`` can return before
  execution finishes, so the timer synchronizes by *fetching a scalar
  value* and subtracts the measured fetch round-trip;
* :func:`annotate` — named profiler spans (``jax.profiler.TraceAnnotation``)
  so custom phases show up in the trace viewer;
* :func:`bench_scalar` — the standard component-timing recipe for the
  profiling/experiment scripts: jit-wrap ``fn`` to reduce its output to a
  scalar ON DEVICE (a large output would bill tunnel transfer time to the
  component) and measure with :class:`StepTimer`.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace into ``log_dir``.

    Usage::

        with trace("/tmp/jax-trace"):
            trainer.train_step(batch)
            float(metrics["loss"])   # force execution inside the window
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span for the profiler timeline (no-op overhead when idle)."""
    return jax.profiler.TraceAnnotation(name)


def _sync_scalar(tree) -> float:
    """Synchronize by value fetch (see module docstring for why not
    ``block_until_ready``); returns the fetched scalar."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:  # warmup=0: nothing dispatched yet — nothing to sync
        return 0.0
    return float(np.asarray(leaves[0]).ravel()[0])


def bench_scalar(timer: "StepTimer", name: str, fn, *xs,
                 width: int = 44, rate=None) -> float | None:
    """Time ``fn(*xs)`` with on-device scalar reduction and print one line.

    The scalar-sum wrapper forces the full computation (XLA cannot
    dead-code-eliminate a consumed value) while keeping the per-step fetch
    to one scalar — the only sync that works on tunneled backends (module
    docstring).  Exceptions (e.g. a tile size over the VMEM cap) print as
    FAILED and return None so sweeps continue.  ``rate`` is an optional
    ``ms -> str`` callback appended to the line (throughput columns).
    """
    import jax.numpy as jnp

    jitted = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    try:
        stats = timer.measure(lambda: jitted(*xs))
    except Exception as e:  # noqa: BLE001 — sweep must survive any backend error
        print(f"{name:{width}s}   FAILED {type(e).__name__}: "
              f"{(str(e).splitlines() or [repr(e)])[0][:90]}", flush=True)
        return None
    ms = stats["step_ms"]
    tail = rate(ms) if rate else f"(fetch_rtt {stats['fetch_rtt_ms']:.1f} ms)"
    print(f"{name:{width}s} {ms:8.2f} ms  {tail}", flush=True)
    return ms


@dataclass
class StepTimer:
    """Measure steady-state step time of a dispatch-async step function.

    Example::

        timer = StepTimer(warmup=5, steps=30)
        stats = timer.measure(lambda: trainer.train_step(batch))
        print(stats["step_ms"], stats["steps_per_sec"])
    """

    warmup: int = 5
    steps: int = 20
    _rtt: float = field(default=0.0, init=False)

    def measure(self, step_fn) -> dict:
        out = None
        for _ in range(self.warmup):
            out = step_fn()
        _sync_scalar(out)

        # Fetch round-trip on an already-materialized value: measures the
        # tunnel/host overhead that must be subtracted from the window.
        t0 = time.perf_counter()
        _sync_scalar(out)
        self._rtt = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(self.steps):
            out = step_fn()
        _sync_scalar(out)
        elapsed = max(time.perf_counter() - t0 - self._rtt, 1e-9)
        step_s = elapsed / self.steps
        return {
            "step_ms": step_s * 1e3,
            "steps_per_sec": 1.0 / step_s,
            "fetch_rtt_ms": self._rtt * 1e3,
        }
