#!/usr/bin/env python
"""Encode the per-epoch training panels into a progress video.

TPU-native counterpart of reference visualization.py:22-37.
"""

import argparse

from nerf_keras_tpu.config import config_name
from nerf_keras_tpu.utils.viz import frames_to_video

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="config/lego_batch_h256.json")
    p.add_argument("--image-dir", type=str, default=None,
                   help="panel directory (default: images/models/<config>-best)")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    name = config_name(args.config)
    image_dir = args.image_dir or f"images/models/{name}-best"
    out = args.out or f"{name}_training.mp4"
    written = frames_to_video(image_dir, out, fps=30)
    print(f"video saved to {written}")
