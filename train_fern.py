#!/usr/bin/env python
"""Train NeRF on the LLFF forward-facing Fern scene (single accelerator).

TPU-native counterpart of reference train_fern.py (and fixes its 3-vs-4
unpack crash at train_fern.py:73 by construction).
"""

from nerf_keras_tpu.cli.train import run_training
from nerf_keras_tpu.data.llff import prepare_fern_data


def prepare(height, width, data_dir=None):
    return prepare_fern_data(height, width, basedir=data_dir)


if __name__ == "__main__":
    run_training(prepare, "config/fern_batch_debug.json", default_eval_every=1)
