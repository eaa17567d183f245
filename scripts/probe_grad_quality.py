"""Train-step gradient-quality probe vs f32 ground truth (real TPU).

Measures the relative L2 error and cosine of the bf16 train-step
gradients (XLA path and the fused Pallas megakernel) against an
XLA-float32 ground truth on identical params/batch/keys.  This is the
probe that exposed the Mosaic f32-dot truncation (pallas rel-L2 0.0316
vs XLA 0.0081 before the fix; 0.0067 after — docs/PERF.md round-3
precision-fix section).

    python scripts/probe_grad_quality.py        # on the TPU (~20 min, two
                                                # flagship-shape compiles)
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from nerf_keras_tpu.config import NeRFConfig
from nerf_keras_tpu.engine.step import init_train_state, make_train_step

B = 1024
base = dict(batch_size=B, ns_coarse=64, ns_fine=128, num_layers=8,
            hidden_dim=256, skip_layer=4, l_xyz=10, l_dir=4)
cfgs = {
    "f32_truth": NeRFConfig(use_pallas=False, compute_dtype="float32", **base).validate(),
    "xla_bf16":  NeRFConfig(use_pallas=False, compute_dtype="bfloat16", **base).validate(),
    "pal_bf16":  NeRFConfig(use_pallas=True,  compute_dtype="bfloat16", **base).validate(),
}
rng = np.random.default_rng(0)
images = rng.uniform(0, 1, (B, 3)).astype(np.float32)
origins = np.tile(np.array([0, 0, 4.0], np.float32), (B, 1))
dirs = rng.normal(size=(B, 3)).astype(np.float32)
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
batch = (jnp.asarray(images), jnp.asarray(origins), jnp.asarray(dirs))
key = jax.random.PRNGKey(7)
state0 = init_train_state(jax.random.PRNGKey(0), cfgs["f32_truth"])
print(f"backend={jax.default_backend()} B={B}", flush=True)

grads = {}
for name, cfg in cfgs.items():
    step = jax.jit(make_train_step(cfg, 2.0, 6.0))
    s1, m = step(jax.device_put(state0), batch, key)
    mu = None
    for piece in jax.tree_util.tree_leaves(
        s1.opt_state, is_leaf=lambda x: hasattr(x, "mu")
    ):
        if hasattr(piece, "mu"):
            mu = piece.mu
            break
    grads[name] = jax.tree_util.tree_map(
        lambda m_: np.asarray(m_, np.float64) / 0.1, mu
    )
    print(f"{name}: loss={float(m['loss']):.6f}", flush=True)

truth = jax.tree_util.tree_leaves(grads["f32_truth"])
for name in ("xla_bf16", "pal_bf16"):
    flat_g = jax.tree_util.tree_leaves(grads[name])
    num = sum(float(np.sum((a - b) ** 2)) for a, b in zip(flat_g, truth))
    den = sum(float(np.sum(b ** 2)) for b in truth)
    cos_num = sum(float(np.sum(a * b)) for a, b in zip(flat_g, truth))
    cos_den = np.sqrt(sum(float(np.sum(a ** 2)) for a in flat_g) * den)
    print(f"{name}: rel_l2={np.sqrt(num/den):.5f} cos={cos_num/cos_den:.6f}",
          flush=True)
