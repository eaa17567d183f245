"""Probe: XLA gather throughput for occupancy-grid sigma lookups on TPU.

Design gate for the grid importance sampler (ops/grid.py): at the
production 16384-ray render chunk with 64 march samples per ray, the
sampler needs ~1M random lookups from a res^3 sigma table.  If a
nearest-neighbor gather chain (index math + take + volume weights)
costs well under the coarse Pallas pass it replaces (~14.8 ms at this
chunk), the design pays; trilinear (8 gathers + lerp) is the quality
upgrade if it stays cheap.

Usage: python scripts/probe_grid_gather.py [--res 128] [--rays 16384]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nerf_keras_tpu.utils.profiling import StepTimer


def nearest_weights(grid, bbox_min, inv_cell, origins, dirs, t_vals):
    """sigma = grid[nearest voxel] along each ray; -> compositing weights."""
    pts = origins[:, None, :] + dirs[:, None, :] * t_vals[..., None]
    idx = jnp.clip(
        ((pts - bbox_min) * inv_cell).astype(jnp.int32), 0, grid.shape[0] - 1
    )
    flat = (idx[..., 0] * grid.shape[1] + idx[..., 1]) * grid.shape[2] + idx[..., 2]
    sigma = jnp.take(grid.reshape(-1), flat, axis=0)
    # standard alpha compositing (ops/volume.py semantics, weights only)
    deltas = jnp.concatenate(
        [t_vals[..., 1:] - t_vals[..., :-1],
         jnp.full(t_vals.shape[:-1] + (1,), 1e10, t_vals.dtype)], -1)
    alpha = 1.0 - jnp.exp(-sigma.astype(jnp.float32) * deltas)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], -1)
    return alpha * trans


def trilinear_weights(grid, bbox_min, inv_cell, origins, dirs, t_vals):
    pts = origins[:, None, :] + dirs[:, None, :] * t_vals[..., None]
    f = (pts - bbox_min) * inv_cell - 0.5
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, grid.shape[0] - 2)
    w = jnp.clip(f - i0, 0.0, 1.0)
    g = grid.reshape(-1)
    res = grid.shape[0]
    sigma = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                idx = ((i0[..., 0] + dx) * res + i0[..., 1] + dy) * res \
                    + i0[..., 2] + dz
                ww = (jnp.where(dx, w[..., 0], 1 - w[..., 0])
                      * jnp.where(dy, w[..., 1], 1 - w[..., 1])
                      * jnp.where(dz, w[..., 2], 1 - w[..., 2]))
                sigma = sigma + ww * jnp.take(g, idx, axis=0)
    deltas = jnp.concatenate(
        [t_vals[..., 1:] - t_vals[..., :-1],
         jnp.full(t_vals.shape[:-1] + (1,), 1e10, t_vals.dtype)], -1)
    alpha = 1.0 - jnp.exp(-sigma.astype(jnp.float32) * deltas)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], -1)
    return alpha * trans


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--rays", type=int, default=16384)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    res, B, S = args.res, args.rays, args.samples
    grid = jax.random.uniform(key, (res, res, res), jnp.float32)
    if args.dtype == "bfloat16":
        grid = grid.astype(jnp.bfloat16)
    origins = jnp.tile(jnp.float32([0, 0, 4.0]), (B, 1))
    dirs = jax.random.normal(key, (B, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    t_vals = jnp.linspace(2.0, 6.0, S)[None, :] * jnp.ones((B, 1))
    bbox_min = jnp.float32([-2, -2, -2])
    inv_cell = jnp.float32(res / 4.0)

    for name, fn in (("nearest", nearest_weights),
                     ("trilinear", trilinear_weights)):
        f = jax.jit(functools.partial(fn, grid, bbox_min, inv_cell))
        timer = StepTimer(warmup=3, steps=20)
        stats = timer.measure(lambda: f(origins, dirs, t_vals))
        print(f"{name} res={res} B={B} S={S} dtype={args.dtype}: "
              f"{stats['step_ms']:.2f} ms")


if __name__ == "__main__":
    main()
