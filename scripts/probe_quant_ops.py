"""Probe: do the int8 quantize-glue ops lower in compiled Mosaic on TPU?

Checks, in ONE small kernel: jnp.round (nearest-even), jnp.floor,
f32->int8 convert after clip, int8 concatenate, and the int8 x int8 ->
int32 dot.  Run on the real chip; prints per-op max error vs numpy.
"""
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 256


def kern(x_ref, w_ref, qr_ref, qf_ref, dot_ref):
    x = x_ref[:]
    # round-to-nearest-even path
    qr = jnp.clip(jnp.round(x * 13.5), -127.0, 127.0).astype(jnp.int8)
    qr_ref[:] = qr
    # floor(x + 0.5) path
    qf = jnp.clip(jnp.floor(x * 13.5 + 0.5), -127.0, 127.0).astype(jnp.int8)
    qf_ref[:] = qf
    # int8 concat + int8 dot -> int32
    q2 = jnp.concatenate([qr[:, :64], qf[:, 64:]], axis=1)
    dot_ref[:] = jax.lax.dot_general(
        q2, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(T, 128)) * 5, jnp.float32)
w = jnp.asarray(rng.integers(-127, 127, (128, 128)), jnp.int8)
outs = pl.pallas_call(
    kern,
    in_specs=[pl.BlockSpec((T, 128), memory_space=pltpu.VMEM),
              pl.BlockSpec((128, 128), memory_space=pltpu.VMEM)],
    out_specs=[pl.BlockSpec((T, 128), memory_space=pltpu.VMEM)] * 2
    + [pl.BlockSpec((T, 128), memory_space=pltpu.VMEM)],
    out_shape=[jax.ShapeDtypeStruct((T, 128), jnp.int8)] * 2
    + [jax.ShapeDtypeStruct((T, 128), jnp.int32)],
)(x, w)
xn = np.asarray(x, np.float64)
qr_ref = np.clip(np.round(xn * 13.5), -127, 127).astype(np.int8)
qf_ref = np.clip(np.floor(xn * 13.5 + 0.5), -127, 127).astype(np.int8)
q2 = np.concatenate([qr_ref[:, :64], qf_ref[:, 64:]], axis=1).astype(np.int32)
dot_ref = q2 @ np.asarray(w, np.int32)
print("round err:", np.abs(np.asarray(outs[0], np.int32) - qr_ref).max())
print("floor err:", np.abs(np.asarray(outs[1], np.int32) - qf_ref).max())
print("dot   err:", np.abs(np.asarray(outs[2]) - dot_ref).max())
