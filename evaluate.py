#!/usr/bin/env python
"""Score a trained checkpoint on a dataset split (per-view PSNR/SSIM).

Beyond-reference: the reference can only report ray-batch PSNR inside
its training loop; this renders every held-out view from a checkpoint
and writes the standard NeRF paper-table metrics as JSON.

    python evaluate.py --config config/lego_batch_h256.json \
        --checkpoint models/<run>/ --data synthetic --split val
"""

from nerf_keras_tpu.cli.evaluate import run_evaluation

if __name__ == "__main__":
    run_evaluation()
