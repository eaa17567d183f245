"""Export a trained checkpoint to the reference's ``.weights.h5`` format.

Beyond-reference interop, the inverse of ``--reference-weights``: a model
trained in this framework becomes a file the reference's own tooling
loads verbatim (``NeRFTrainer.load_weights``, reference
inference.py:158-170) — so a reference user can adopt this trainer
without abandoning their downstream pipeline, and parity claims can be
spot-checked inside the reference itself.

    python export_keras.py --config config/lego_batch_h256.json \
        --checkpoint models/<run>/ --out lego.weights.h5

EMA checkpoints export the EMA (serving) weights — the same parameters
every other inference path here reads.
"""

from __future__ import annotations

import argparse

from nerf_keras_tpu.config import load_config
from nerf_keras_tpu.utils.checkpoint import (
    resolve_checkpoint,
    resolve_infer_config,
)


def run_export(argv: list[str] | None = None) -> str:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True,
                   help="a .ckpt.npz file or a run dir (latest is used)")
    p.add_argument("--out", type=str, required=True,
                   help="output path (.weights.h5 by reference convention)")
    p.add_argument("--platform", type=str, default="cpu",
                   help="JAX platform for the (host-only) load; exporting "
                        "needs no accelerator")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.utils.keras_export import export_reference_weights

    to_np = lambda tree: jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), tree
    )

    cfg = load_config(args.config)

    ckpt = args.checkpoint
    if not ckpt.endswith(".npz"):
        found = resolve_checkpoint(ckpt)
        if found is None:
            raise FileNotFoundError(f"no .ckpt.npz under {ckpt}")
        ckpt = found

    # Sidecar arch/EMA fields win over the passed config (same resolution
    # every inference path uses); near/far are irrelevant to the weights.
    cfg, notes = resolve_infer_config(cfg, ckpt)
    for note in notes:
        print(f"[nerf-tpu] {note}")
    if cfg.train_sampler == "proposal":
        raise SystemExit(
            "TRAIN_SAMPLER='proposal' checkpoints have no coarse MLP; the "
            "reference format requires the coarse+fine pair — retrain with "
            "the parity step to export"
        )

    trainer = Trainer(cfg, 2.0, 6.0)
    trainer.restore(ckpt)
    state = trainer._eval_state()  # EMA shadow when trained with EMA_DECAY
    export_reference_weights(
        args.out, to_np(state.params), cfg,
        bn_state=None if state.bn is None else to_np(state.bn),
    )
    print(f"[nerf-tpu] exported {ckpt} -> {args.out} "
          f"(reference .weights.h5 layout)")
    return args.out
