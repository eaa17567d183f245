#!/usr/bin/env python
"""Export a checkpoint to the reference's Keras .weights.h5 format.

Beyond-reference interop (inverse of inference.py --reference-weights):
a model trained here loads verbatim into the reference's own
NeRFTrainer.load_weights (reference inference.py:158-170).

    python export_keras.py --config config/lego_batch_h256.json \
        --checkpoint models/<run> --out lego.weights.h5
"""

from nerf_keras_tpu.cli.export_keras import run_export

if __name__ == "__main__":
    run_export()
