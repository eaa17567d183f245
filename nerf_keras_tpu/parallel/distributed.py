"""Multi-host (multi-process) initialization.

The reference's distribution story is a gRPC TPUClusterResolver +
TPUStrategy pair wired inline into its TPU entry points
(train_tpu_lego.py:72-82).  The TPU-native equivalent (SURVEY.md §2.6) is
``jax.distributed.initialize()`` once per process, after which the SAME
``Mesh`` code spans all hosts: devices within a slice communicate over ICI,
slices over DCN, with the GSPMD partitioner placing collectives — no
strategy object, no special multi-host code path in the trainer.

Usage (per process, before any other JAX call)::

    from nerf_keras_tpu.parallel.distributed import maybe_initialize
    maybe_initialize()          # no-op on a single host

On Cloud TPU pods the coordinator address / process count / process id are
discovered from the TPU metadata automatically by JAX; on other clusters
set ``NERF_COORDINATOR`` / ``NERF_NUM_PROCESSES`` / ``NERF_PROCESS_ID``
(or call ``jax.distributed.initialize`` yourself).
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize() -> bool:
    """Initialize ``jax.distributed`` when a multi-process env is detected.

    Returns True iff distributed mode was (or already is) active.  Safe to
    call multiple times and on single-host setups (no-op).
    """
    global _initialized
    if _initialized:
        return True

    coordinator = os.environ.get("NERF_COORDINATOR")
    num_procs = os.environ.get("NERF_NUM_PROCESSES")
    proc_id = os.environ.get("NERF_PROCESS_ID")

    trio = (coordinator, num_procs, proc_id)
    if any(v is not None for v in trio) and not all(trio):
        # A partial trio is a misconfigured launch (typo'd var, one host
        # missing an export).  Silently falling back to single-host mode
        # would have BOTH processes train the full unsharded dataset and
        # race on the same run dir — fail loudly instead.
        missing = [
            name for name, v in zip(
                ("NERF_COORDINATOR", "NERF_NUM_PROCESSES",
                 "NERF_PROCESS_ID"), trio)
            if not v
        ]
        raise RuntimeError(
            f"partial multi-process configuration: {missing} unset while "
            "the other NERF_* launch variables are set — set all three "
            "(docs/DISTRIBUTED.md) or none"
        )

    if coordinator and num_procs and proc_id:
        # Multi-process CPU runs (tests, local sims) need a cross-host CPU
        # collectives backend; gloo ships with jaxlib.  Must be set before
        # backend init — harmless for TPU meshes, which ignore it.
        # Platform detection must consult jax.config, NOT only the env
        # var: in this repo's own recommended launch style the platform
        # is pinned via --platform cpu -> jax.config.update (CLAUDE.md:
        # the env var alone does not stick when a plugin registers
        # eagerly), so the env var is often unset for CPU runs.
        platforms = os.environ.get("JAX_PLATFORMS") or ""
        try:
            platforms = jax.config.jax_platforms or platforms
        except AttributeError:
            pass
        if str(platforms).startswith("cpu"):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(num_procs),
            process_id=int(proc_id),
        )
        _initialized = True
        return True

    # Cloud TPU pods: JAX auto-discovers everything from metadata.  Only
    # attempt it when the environment smells like a pod (multiple workers),
    # because initialize() on a single host with no coordinator blocks.
    if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") >= 1:
        jax.distributed.initialize()
        _initialized = True
        return True

    return False


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) on a single host."""
    return jax.process_index(), jax.process_count()


def shard_dataset_for_process(dataset):
    """Give each host its contiguous ray shard (pipeline.RayDataset).

    With per-host input sharding + the shared epoch seed in
    ``iterate_batches``, every host feeds its own slice of the global batch
    and ``jax.make_array_from_process_local_data`` (or plain device_put on
    the host-local mesh section) assembles the global array.
    """
    idx, count = process_info()
    if count == 1:
        return dataset
    return dataset.process_slice(idx, count)
