"""Native C++ batcher: correctness of gathers, shuffling and epoch reshuffle.

Falls back cleanly when no toolchain is present (load_library() -> None).
"""

import numpy as np
import pytest

from nerf_keras_tpu.data.native import NativeRayBatcher, load_library
from nerf_keras_tpu.data.pipeline import RayDataset


def _dataset(n=256):
    rng = np.random.default_rng(0)
    # pixels[i] encodes the row index so gathers are verifiable
    pixels = np.tile(np.arange(n, dtype=np.float32)[:, None], (1, 3))
    return RayDataset(
        pixels=pixels,
        origins=rng.normal(size=(n, 3)).astype(np.float32),
        directions=rng.normal(size=(n, 3)).astype(np.float32),
        near=2.0, far=6.0, focal=10.0, height=16, width=16,
    )


pytestmark = pytest.mark.skipif(
    load_library() is None, reason="no C++ toolchain"
)


def test_batches_are_consistent_gathers():
    ds = _dataset()
    b = NativeRayBatcher(ds, batch_size=32, seed=1)
    assert b.steps_per_epoch == 8
    px, og, dr = next(b)
    assert px.shape == og.shape == dr.shape == (32, 3)
    idx = px[:, 0].astype(int)
    np.testing.assert_array_equal(og, ds.origins[idx])
    np.testing.assert_array_equal(dr, ds.directions[idx])
    b.close()


def test_epoch_covers_all_rays_once():
    ds = _dataset(n=128)
    b = NativeRayBatcher(ds, batch_size=32, seed=2)
    seen = []
    for _ in range(b.steps_per_epoch):
        px, _, _ = next(b)
        seen.extend(px[:, 0].astype(int).tolist())
    assert sorted(seen) == list(range(128))
    # next epoch: full cover again, different order
    seen2 = []
    for _ in range(b.steps_per_epoch):
        px, _, _ = next(b)
        seen2.extend(px[:, 0].astype(int).tolist())
    assert sorted(seen2) == list(range(128))
    assert seen != seen2  # reshuffled
    b.close()


def test_prefetch_keeps_producing():
    ds = _dataset(n=64)
    b = NativeRayBatcher(ds, batch_size=16, seed=3)
    for _ in range(25):  # several epochs worth, exercises the ring
        px, _, _ = next(b)
        assert px.shape == (16, 3)
    b.close()


def test_batch_larger_than_dataset_rejected():
    ds = _dataset(n=64)
    with pytest.raises(ValueError, match="batch_size"):
        NativeRayBatcher(ds, batch_size=256, seed=0)
    with pytest.raises(ValueError, match="batch_size"):
        NativeRayBatcher(ds, batch_size=0, seed=0)


def test_next_after_close_raises():
    ds = _dataset(n=64)
    b = NativeRayBatcher(ds, batch_size=16, seed=0)
    next(b)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        next(b)


def test_matches_numpy_pipeline_order():
    """Native and numpy paths share one RNG: identical batches per epoch."""
    from nerf_keras_tpu.data.pipeline import iterate_batches

    ds = _dataset(n=128)
    b = NativeRayBatcher(ds, batch_size=32, seed=7)
    for epoch in range(3):
        for ref in iterate_batches(ds, 32, shuffle=True, seed=7, epoch=epoch):
            got = next(b)
            for g, r in zip(got, ref):
                np.testing.assert_array_equal(g, r)
    b.close()


def test_start_epoch_resumes_order():
    """A batcher created at start_epoch=k reproduces the continuous run's
    batches from epoch k (resume-order determinism)."""
    ds = _dataset(n=96)
    cont = NativeRayBatcher(ds, batch_size=32, seed=5)
    spe = cont.steps_per_epoch
    for _ in range(2 * spe):  # consume epochs 0-1
        next(cont)
    resumed = NativeRayBatcher(ds, batch_size=32, seed=5, start_epoch=2)
    for _ in range(spe + 1):  # epoch 2 plus one step into epoch 3
        a, c = next(cont), next(resumed)
        for x, y in zip(a, c):
            np.testing.assert_array_equal(x, y)
    cont.close()
    resumed.close()
