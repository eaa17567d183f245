#!/usr/bin/env python
"""Train NeRF on the Blender-synthetic tiny-Lego scene (single accelerator).

TPU-native counterpart of reference train_lego.py: same CLI
(``--config config/lego_batch_debug.json``), same config schema, same
outputs (per-eval checkpoint, 3-panel PNG, history JSON).
"""

from nerf_keras_tpu.cli.train import run_training
from nerf_keras_tpu.data.lego import prepare_lego_data


def prepare(height, width, data_dir=None):
    return prepare_lego_data(height, width, path=data_dir)


if __name__ == "__main__":
    run_training(prepare, "config/lego_batch_debug.json", default_eval_every=1)
