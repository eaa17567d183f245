#!/usr/bin/env python
"""Train NeRF on Fern across all available TPU chips.

TPU-native counterpart of reference train_tpu_fern.py; eval cadence
defaults to every 10 epochs (reference train_tpu_fern.py:199).
"""

from nerf_keras_tpu.cli.train import run_training
from nerf_keras_tpu.data.llff import prepare_fern_data


def prepare(height, width, data_dir=None):
    return prepare_fern_data(height, width, basedir=data_dir)


if __name__ == "__main__":
    run_training(prepare, "config/fern_batch_h256_tpu.json", default_eval_every=10)
