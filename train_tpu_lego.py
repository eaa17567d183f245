#!/usr/bin/env python
"""Train NeRF on Lego across all available TPU chips.

TPU-native counterpart of reference train_tpu_lego.py.  Where the reference
wires TPUClusterResolver + TPUStrategy (train_tpu_lego.py:72-82), here the
same training code runs over an explicit ``jax.sharding.Mesh`` spanning
every device — a 1-chip host degenerates gracefully (the reference crashes
with NameError when TPU init fails, SURVEY.md §5).  Eval cadence defaults
to every 50 epochs (reference train_tpu_lego.py:197).
"""

from nerf_keras_tpu.cli.train import run_training
from nerf_keras_tpu.data.lego import prepare_lego_data


def prepare(height, width, data_dir=None):
    return prepare_lego_data(height, width, path=data_dir)


if __name__ == "__main__":
    run_training(prepare, "config/lego_batch_h256_tpu.json", default_eval_every=50)
