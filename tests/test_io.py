"""Storage abstraction: local paths + gs:// path handling (no network)."""

import numpy as np

from nerf_keras_tpu.utils import io


def test_join_local_and_remote():
    assert io.join("a", "b", "c").endswith("a/b/c".replace("/", __import__("os").sep))
    assert io.join("gs://bucket/dir", "x", "y.png") == "gs://bucket/dir/x/y.png"
    assert io.join("gs://bucket/", "z") == "gs://bucket/z"


def test_local_roundtrip(tmp_path):
    p = str(tmp_path / "sub" / "file.bin")
    with io.open_file(p, "wb") as f:  # auto-creates parent dirs
        f.write(b"hello")
    assert io.exists(p)
    with io.open_file(p, "rb") as f:
        assert f.read() == b"hello"
    assert "file.bin" in io.listdir(str(tmp_path / "sub"))


def test_makedirs_idempotent(tmp_path):
    d = str(tmp_path / "x" / "y")
    io.makedirs(d)
    io.makedirs(d)
    assert io.exists(d)


def test_compilation_cache_wiring(tmp_path, monkeypatch):
    """NERF_COMPILATION_CACHE points JAX's persistent cache at the dir;
    unset means untouched; enable_compilation_cache survives odd JAX
    versions by returning False instead of raising."""
    import jax

    from nerf_keras_tpu.utils.cache import (
        enable_compilation_cache,
        maybe_enable_compilation_cache,
    )

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        monkeypatch.delenv("NERF_COMPILATION_CACHE", raising=False)
        assert maybe_enable_compilation_cache() is False

        cache_dir = str(tmp_path / "xla-cache")
        monkeypatch.setenv("NERF_COMPILATION_CACHE", cache_dir)
        assert maybe_enable_compilation_cache() is True
        assert jax.config.jax_compilation_cache_dir == cache_dir

        assert enable_compilation_cache(str(tmp_path / "other")) is True
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "other")
    finally:
        # restore global config: cache state must not leak into the suite
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min
        )
