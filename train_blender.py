#!/usr/bin/env python
"""Train NeRF on a full Blender ``nerf_synthetic`` scene (transforms json
+ PNGs — the published dataset layout, not the tiny-npz subset).

Beyond the reference: its only synthetic loader is the 100x100
``tiny_nerf_data.npz`` subset (lego_data_utils.py:8-51).  This entry
consumes the original Blender export directly:

    python train_blender.py --config config/lego_batch_h256_tpu.json \
        --data-dir /data/nerf_synthetic/lego

Scene selection: point --data-dir at the scene directory (the one holding
transforms_train.json), or point it (or $NERF_DATA_DIR) at the dataset
root and pick with --scene (default 'lego').  Background compositing
follows the config's WHITE_BKGD.
"""

from nerf_keras_tpu.cli.train import run_training
from nerf_keras_tpu.data.blender import prepare_blender_data


def prepare(height, width, data_dir=None, config=None, scene="lego"):
    return prepare_blender_data(
        height,
        width,
        path=data_dir,
        scene=scene,
        white_bkgd=bool(config.white_bkgd) if config is not None else True,
    )


if __name__ == "__main__":
    run_training(prepare, "config/lego_batch_h256_tpu.json",
                 default_eval_every=5)
