"""Storage abstraction: local filesystem or GCS (``gs://``) paths.

Replaces the reference's ``WITH_GCS``-gated ``tf.io.gfile`` dual-pathing
(train_lego.py:58-69, :200-249; fern_data_utils.py:192-248) with one
fsspec-backed API — every call site takes a plain path string and works for
both schemes.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import IO, Iterator


def _is_remote(path: str) -> bool:
    return "://" in path


def _fs(path: str):
    import fsspec

    return fsspec.core.url_to_fs(path)[0]


def exists(path: str) -> bool:
    if _is_remote(path):
        return _fs(path).exists(path)
    return os.path.exists(path)


def makedirs(path: str) -> None:
    if _is_remote(path):
        _fs(path).makedirs(path, exist_ok=True)
    else:
        os.makedirs(path, exist_ok=True)


def listdir(path: str) -> list[str]:
    if _is_remote(path):
        # detail=False is load-bearing: several fsspec backends default to
        # detail=True and return dict records, not path strings (caught by
        # the memory:// round-trip tests — would have crashed on GCS).
        return sorted(
            os.path.basename(p.rstrip("/"))
            for p in _fs(path).ls(path, detail=False)
        )
    return sorted(os.listdir(path))


def join(*parts: str) -> str:
    head = parts[0]
    if _is_remote(head):
        return "/".join([head.rstrip("/")] + [p.strip("/") for p in parts[1:]])
    return os.path.join(*parts)


@contextmanager
def open_file(path: str, mode: str = "rb") -> Iterator[IO]:
    if _is_remote(path):
        import fsspec

        with fsspec.open(path, mode) as f:
            yield f
    else:
        if "w" in mode or "a" in mode:
            parent = os.path.dirname(path)
            if parent:
                os.makedirs(parent, exist_ok=True)
        with open(path, mode) as f:
            yield f
