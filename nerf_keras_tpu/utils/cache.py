"""Persistent XLA compilation cache wiring.

The flagship train step takes minutes to compile cold (two Pallas kernel
instances per pass); a persistent cache makes every process after the
first start in seconds on normal TPU runtimes.  The reference has no
equivalent (TF manages its own function cache per process).

Opt-in via ``NERF_COMPILATION_CACHE=<dir>`` (all CLIs call
:func:`maybe_enable_compilation_cache` at startup) or programmatically.

Caveat: the axon development tunnel compiles through a remote helper and
bypasses the local cache — this pays off on real TPU runtimes.
"""

from __future__ import annotations

import os


def enable_compilation_cache(
    cache_dir: str, min_compile_time_secs: float = 1.0
) -> bool:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns True if the cache was enabled (False on JAX versions without
    the config knobs — the run proceeds uncached).
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            min_compile_time_secs,
        )
        return True
    except Exception:
        return False


def maybe_enable_compilation_cache() -> bool:
    """Enable the cache iff ``NERF_COMPILATION_CACHE`` is set (to a dir)."""
    cache_dir = os.environ.get("NERF_COMPILATION_CACHE")
    if not cache_dir:
        return False
    return enable_compilation_cache(os.path.expanduser(cache_dir))
