#!/usr/bin/env python
"""Render a spiral-path novel-view video from a trained checkpoint.

TPU-native counterpart of reference inference.py (spherical orbit,
theta in [-45, 45), 30 frames @ 30 fps).
"""

from nerf_keras_tpu.cli.infer import run_inference

if __name__ == "__main__":
    run_inference()
