"""Pallas TPU kernels — the hand-scheduled performance layer.

Every kernel here has a jnp reference implementation elsewhere in
``nerf_keras_tpu.ops`` / ``nerf_keras_tpu.models``; parity tests pin the two
together (tests/test_pallas.py).  The kernels exist for the cases where XLA's
automatic fusion cannot keep the working set in VMEM — most importantly the
NeRF MLP applied per ray sample, where inter-layer activations of shape
(rays*samples, hidden) would otherwise round-trip HBM eight times per MLP.
"""

from nerf_keras_tpu.ops.pallas.fused_mlp import apply_nerf_mlp_pallas

__all__ = ["apply_nerf_mlp_pallas"]
