#!/usr/bin/env python
"""Generate the keras-parity test fixture (tests/fixtures/).

Builds the reference architecture (reference models.py:24-62 /
create_nerf_complete_model, held by a NeRFTrainer-shaped container with
``coarse_model``/``fine_model`` attributes, models.py:67-68), randomizes
every variable, saves genuine Keras ``.weights.h5`` files, and records
golden inference-mode forward outputs on fixed inputs.

Run in an environment with keras+tensorflow (this image has keras 3.13);
the resulting files are committed so the importer's parity tests run
everywhere with only h5py.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("KERAS_BACKEND", "tensorflow")

import numpy as np

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)

# Small but structurally complete: 6 trunk layers makes the skip-concat
# fire at i=4 (i % 4 == 0 and i > 0), real encoding widths.
ARCH = dict(num_layers=6, hidden_dim=32, skip_layer=4, lxyz=10, ldir=4)


def build_reference_model(num_layers, hidden_dim, skip_layer, lxyz, ldir, bn):
    """The reference's functional MLP graph (models.py:24-62)."""
    import keras
    from keras import layers

    ray_input = keras.Input(shape=(None, 2 * 3 * lxyz + 3))
    dir_input = keras.Input(shape=(None, 2 * 3 * ldir + 3))
    x = ray_input
    for i in range(num_layers):
        if bn:
            x = layers.Dense(hidden_dim)(x)
            x = layers.BatchNormalization()(x)
            x = layers.ReLU()(x)
        else:
            x = layers.Dense(hidden_dim, activation="relu")(x)
        if i % skip_layer == 0 and i > 0:
            x = layers.concatenate([x, ray_input], axis=-1)
    sigma = layers.Dense(1)(x)
    feature = layers.Dense(hidden_dim)(x)
    feature = layers.concatenate([feature, dir_input], axis=-1)
    if bn:
        x = layers.Dense(hidden_dim // 2)(feature)
        x = layers.BatchNormalization()(x)
        x = layers.ReLU()(x)
    else:
        x = layers.Dense(hidden_dim // 2, activation="relu")(feature)
    rgb = layers.Dense(3)(x)
    outputs = layers.concatenate([rgb, sigma], axis=-1)
    return keras.Model(inputs=[ray_input, dir_input], outputs=outputs)


def make_trainer(bn: bool):
    import keras

    class RefTrainer(keras.Model):
        """Attribute names match the reference trainer (models.py:67-68)
        so save_weights produces the same top-level h5 groups."""

        def __init__(self, coarse_model, fine_model):
            super().__init__()
            self.coarse_model = coarse_model
            self.fine_model = fine_model

        def call(self, inputs):
            return self.coarse_model(inputs), self.fine_model(inputs)

    return RefTrainer(
        build_reference_model(bn=bn, **ARCH),
        build_reference_model(bn=bn, **ARCH),
    )


def randomize(model, seed: int) -> None:
    rng = np.random.default_rng(seed)
    for v in model.weights:
        shape = tuple(v.shape)
        if v.name.endswith("moving_variance") or "variance" in v.path:
            v.assign(rng.uniform(0.5, 2.0, shape).astype(np.float32))
        else:
            v.assign(rng.normal(0, 0.5, shape).astype(np.float32))


def main() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rng = np.random.default_rng(42)
    xyz_dim = 3 + 2 * 3 * ARCH["lxyz"]
    dir_dim = 3 + 2 * 3 * ARCH["ldir"]
    x_enc = rng.normal(0, 1, (4, 5, xyz_dim)).astype(np.float32)
    d_enc = rng.normal(0, 1, (4, 5, dir_dim)).astype(np.float32)

    golden = {"x_enc": x_enc, "d_enc": d_enc}
    for bn, tag in ((False, "plain"), (True, "bn")):
        t = make_trainer(bn)
        t([x_enc, d_enc])  # build
        randomize(t, seed=7 if bn else 3)
        out_c, out_f = t([x_enc, d_enc], training=False)
        golden[f"out_coarse_{tag}"] = np.asarray(out_c)
        golden[f"out_fine_{tag}"] = np.asarray(out_f)
        path = os.path.join(FIXTURE_DIR, f"ref_tiny_{tag}.weights.h5")
        t.save_weights(path)
        print("wrote", path)

    np.savez(os.path.join(FIXTURE_DIR, "ref_tiny_golden.npz"), **golden)
    print("wrote", os.path.join(FIXTURE_DIR, "ref_tiny_golden.npz"))


if __name__ == "__main__":
    sys.exit(main())
