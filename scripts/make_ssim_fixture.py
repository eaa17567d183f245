"""Generate the tf.image.ssim golden fixture for tests/test_image_metrics.py.

Runs REAL tensorflow (importable in this image) on seeded image pairs
spanning the regimes the metric sees in practice — identical, noisy,
blurred, non-square, batched — and records tf.image.ssim's outputs.
The committed npz keeps the test suite tensorflow-free.

    python scripts/make_ssim_fixture.py
"""

from __future__ import annotations

import os

import numpy as np

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "ssim_golden.npz"
)


def main() -> None:
    import tensorflow as tf  # noqa: import heavy, script-only

    rng = np.random.default_rng(1234)
    cases = {}

    def add(name, a, b, max_val=1.0):
        v = tf.image.ssim(
            tf.constant(a), tf.constant(b), max_val=max_val
        ).numpy()
        cases[f"{name}__a"] = a
        cases[f"{name}__b"] = b
        cases[f"{name}__maxval"] = np.float32(max_val)
        cases[f"{name}__ssim"] = np.asarray(v, np.float32)

    a = rng.uniform(size=(24, 32, 3)).astype(np.float32)
    add("noise", a, np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32))
    add("identical", a, a.copy())

    img = rng.uniform(size=(40, 28, 3)).astype(np.float32)
    blurred = img.copy()
    for _ in range(3):  # crude box blur
        blurred = 0.25 * (
            np.roll(blurred, 1, 0) + np.roll(blurred, -1, 0)
            + np.roll(blurred, 1, 1) + np.roll(blurred, -1, 1)
        )
    add("blur_nonsquare", img, blurred.astype(np.float32))

    batch_a = rng.uniform(size=(3, 16, 16, 3)).astype(np.float32)
    batch_b = np.clip(
        batch_a + rng.normal(0, [[[[0.02]]], [[[0.1]]], [[[0.3]]]]), 0, 1
    ).astype(np.float32)
    add("batch", batch_a, batch_b)

    g = rng.uniform(0, 255, size=(24, 24, 1)).astype(np.float32)
    add("gray255", g, np.clip(g + rng.normal(0, 12, g.shape), 0, 255).astype(np.float32),
        max_val=255.0)

    np.savez_compressed(OUT, **cases)
    names = sorted({k.split("__")[0] for k in cases})
    print(f"wrote {OUT}: {names}")


if __name__ == "__main__":
    main()
