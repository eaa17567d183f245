import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from nerf_keras_tpu.utils.profiling import StepTimer

T, iters, grid = 1536, 16, 128
f32 = jnp.float32
timer = StepTimer(warmup=2, steps=10)
rng = np.random.default_rng(0)

def measure(name, kern, ops, flops):
    def cmap(nd):
        return lambda i, _n=nd: (0,) * _n
    fn = jax.jit(lambda *a: jnp.sum(pl.pallas_call(
        kern, grid=(grid,),
        in_specs=[pl.BlockSpec(o.shape, cmap(o.ndim), memory_space=pltpu.VMEM) for o in ops],
        out_specs=pl.BlockSpec((8, 128), cmap(2), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), f32),
    )(*a)))
    try:
        stats = timer.measure(lambda: fn(*ops))
    except Exception as e:
        print(f"{name:28s} FAILED {type(e).__name__}: {str(e).splitlines()[0][:100]}", flush=True)
        return
    ms = stats["step_ms"]
    print(f"{name:28s} {ms:7.2f} ms  {flops/(ms*1e-3)/1e12:6.1f} T(FL)OP/s", flush=True)

flops = 2 * T * 256 * 256 * iters * grid

# bf16 baseline: matmul + relu chain
def k_bf16(x_ref, w_ref, o_ref):
    h = x_ref[:]
    for i in range(iters):
        m = jax.lax.dot_general(h, w_ref[i % 8], (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
        h = jnp.maximum(m, 0.0).astype(jnp.bfloat16)
    o_ref[:] = jnp.sum(h.astype(f32)) * jnp.ones((8, 128), f32)

xb = jnp.asarray(rng.normal(size=(T, 256)) * 0.1, jnp.bfloat16)
wb = jnp.asarray(rng.normal(size=(8, 256, 256)) * 0.05, jnp.bfloat16)
measure("bf16 matmul+relu x16", k_bf16, [xb, wb], flops)

# int8 chain: matmul(int8,int8)->int32, dequant f32, relu, requant int8
def k_int8(x_ref, w_ref, o_ref):
    h = x_ref[:]
    acc_sum = jnp.zeros((), f32)
    for i in range(iters):
        m = jax.lax.dot_general(h, w_ref[i % 8], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        fm = m.astype(f32) * jnp.float32(1e-4)     # dequant (per-tensor)
        fm = jnp.maximum(fm, 0.0)                  # relu
        q = jnp.clip(fm * jnp.float32(32.0) + 0.5, 0, 127)  # requant
        h = q.astype(jnp.int8)
    o_ref[:] = jnp.sum(h.astype(f32)) * jnp.ones((8, 128), f32)

xi = jnp.asarray(rng.integers(-127, 127, (T, 256)), jnp.int8)
wi = jnp.asarray(rng.integers(-127, 127, (8, 256, 256)), jnp.int8)
measure("int8 mm+deq/relu/req x16", k_int8, [xi, wi], flops)

# int8 matmul only (no quant glue) to isolate MXU rate
def k_int8_raw(x_ref, w_ref, o_ref):
    h = x_ref[:]
    for i in range(iters):
        m = jax.lax.dot_general(h, w_ref[i % 8], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # cheap dep: wrap to int8 without f32 roundtrip
        h = (m & 127).astype(jnp.int8)
    o_ref[:] = jnp.sum(h.astype(f32)) * jnp.ones((8, 128), f32)

measure("int8 matmul only x16", k_int8_raw, [xi, wi], flops)
