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
