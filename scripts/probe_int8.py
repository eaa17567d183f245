import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 512
def kern(x_ref, w_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = acc

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(-127, 127, (T, 256)), jnp.int8)
w = jnp.asarray(rng.integers(-127, 127, (256, 256)), jnp.int8)
out = pl.pallas_call(
    kern,
    in_specs=[pl.BlockSpec((T, 256), memory_space=pltpu.VMEM),
              pl.BlockSpec((256, 256), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((T, 256), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((T, 256), jnp.int32),
)(x, w)
ref = np.asarray(x, np.int32) @ np.asarray(w, np.int32)
print("int8 dot ok, max err:", np.abs(np.asarray(out) - ref).max())
