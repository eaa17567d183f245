#!/usr/bin/env python
"""Train NeRF on the procedural sphere scene (no dataset files needed).

Not in the reference — a zero-egress end-to-end driver used by tests,
benchmarks and smoke runs.  Same CLI and outputs as train_lego.py.
"""

from nerf_keras_tpu.cli.train import run_training
from nerf_keras_tpu.data.synthetic import prepare_synthetic_data


def prepare(height, width, data_dir=None, scene="sphere", num_views=12):
    # --scene sphere (default) | spheres (multi-object occlusion variant)
    # --views N: multi-object scenes need more than the 12-view default
    #            at some seeds (docs/TRAINING.md, spheres_scene_quality)
    return prepare_synthetic_data(height, width, scene=scene,
                                  num_views=num_views)


if __name__ == "__main__":
    run_training(prepare, "config/lego_batch_debug.json", default_eval_every=5)
