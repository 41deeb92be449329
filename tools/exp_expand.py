#!/usr/bin/env python
"""Probe Mosaic support + cost of in-kernel row-expansion strategies.

Question: cheapest way to turn per-ray data into per-(ray,sample) rows inside
a Pallas TPU kernel, replacing the HIGHEST-precision one-hot matmuls of the
first fused ray-march kernel (measured 2x slower than the enc-input kernel).

Sample-major row layout (row = s * R_t + r):
  A. per-sample scalars: reshape a transposed (S, R_t) f32 block -> (S*R_t, 1)
  B. per-ray attrs: pltpu.repeat((R_t, X), S, axis=0) -> (S*R_t, X)  [tile]
  C. both combined into the real encode shape (rows, 33/24 lanes)
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_T, S = 64, 64
ROWS = R_T * S
K = 50


def bench(fn, *args):
    @jax.jit
    def run(c, xs):
        def body(c, _):
            return c + fn(*args, c), None
        return jax.lax.scan(body, c, xs)[0]

    xs = jnp.zeros((K,))
    out = run(jnp.float32(0.0), xs)
    float(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = run(jnp.float32(0.0), xs)
    float(out)
    return (time.perf_counter() - t0) / (3 * K)


def probe_a():
    def kernel(zt_ref, out_ref):
        z = zt_ref[:].reshape(ROWS, 1)  # (S, R_t) -> (rows, 1)
        out_ref[:] = z + 1.0

    zt = jax.random.normal(jax.random.PRNGKey(0), (S, R_T), jnp.float32)

    def fn(zt, c):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, 1), jnp.float32),
        )(zt + c)
        return jnp.sum(out)

    return bench(fn, zt)


def probe_b():
    def kernel(rd_ref, out_ref):
        out_ref[:] = pltpu.repeat(rd_ref[:], S, axis=0) * 2.0

    rd = jax.random.normal(jax.random.PRNGKey(0), (R_T, 8), jnp.float32)

    def fn(rd, c):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, 8), jnp.float32),
        )(rd + c)
        return jnp.sum(out)

    return bench(fn, rd)


def probe_c():
    """Full encode-shaped probe: 3 coord reshapes + viewcomp repeat + theta
    matmul + sin + two small matmuls, grid over 16 tiles (64k rows)."""
    T = 114

    def kernel(px_ref, py_ref, pz_ref, vc_ref, sc_ref, gx_ref, out_ref):
        pts = jnp.concatenate(
            [r[:].reshape(ROWS, 1) for r in (px_ref, py_ref, pz_ref)], axis=1
        )
        vc = pltpu.repeat(vc_ref[:], S, axis=0)
        u = jnp.concatenate([pts, vc], axis=1)
        theta = jnp.dot(u, sc_ref[:], precision=jax.lax.Precision.HIGHEST)
        SC = jnp.sin(theta)
        enc = jnp.dot(SC, gx_ref[:], precision=jax.lax.Precision.HIGHEST)
        out_ref[:] = enc

    n_tiles = 16
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    px = jax.random.normal(keys[0], (n_tiles * S, R_T), jnp.float32)
    py = jax.random.normal(keys[1], (n_tiles * S, R_T), jnp.float32)
    pz = jax.random.normal(keys[2], (n_tiles * S, R_T), jnp.float32)
    vc = jax.random.normal(keys[3], (n_tiles * R_T, 3), jnp.float32)
    sc = jax.random.normal(keys[4], (6, T), jnp.float32)
    gx = jax.random.normal(keys[5], (T, 33), jnp.float32)

    def fn(px, py, pz, vc, sc, gx, c):
        row = lambda w: pl.BlockSpec((S, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                row(R_T), row(R_T), row(R_T),
                pl.BlockSpec((R_T, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((6, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, 33), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ROWS, 33), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * ROWS, 33), jnp.float32),
        )(px + c, py, pz, vc, sc, gx)
        return jnp.sum(out)

    return bench(fn, px, py, pz, vc, sc, gx)


def main():
    # semantics check in interpret mode off-TPU happens in tests; here: compile.
    for name, probe in [("A reshape", probe_a), ("B repeat", probe_b), ("C encode", probe_c)]:
        try:
            t = probe()
            print(f"{name}: {t*1e6:9.1f} us/iter", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
