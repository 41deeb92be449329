#!/usr/bin/env python
"""Pure-MXU probe: sustained rate of (M,256)@(256,256) bf16 dots inside one
pallas grid step, no HBM DMA in the timed loop (input generated in-kernel).

- chain:  D dependent dots (h = dot(h, w))
- indep4: 4 independent chains of D/4 dots each, interleaved in program order
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CD = jnp.bfloat16


def make_kernel(m, depth, n_chains):
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    def kernel(w_ref, out_ref):
        w = w_ref[:]
        hs = [
            (jax.lax.broadcasted_iota(jnp.int32, (m, 256), 1).astype(jnp.float32) * (0.001 * (c + 1))).astype(CD)
            for c in range(n_chains)
        ]
        for _ in range(depth // n_chains):
            hs = [dot(h, w).astype(CD) * CD(0.01) for h in hs]
        acc = hs[0].astype(jnp.float32)
        for h in hs[1:]:
            acc = acc + h.astype(jnp.float32)
        out_ref[:] = jnp.broadcast_to(jnp.sum(acc, axis=0, keepdims=True), (8, 256))

    return kernel


def run(m, depth, n_chains, steps=8):
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 256), jnp.float32).astype(CD)
    f = pl.pallas_call(
        make_kernel(m, depth, n_chains),
        grid=(steps,),
        in_specs=[pl.BlockSpec((256, 256), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * 8, 256), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * 256 * 256 * depth * steps, bytes_accessed=256 * 256 * 2,
            transcendentals=0,
        ),
    )
    g = jax.jit(lambda w: f(w))
    out = g(w)
    float(out.sum())
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(w)
    float(out.sum())
    dt = (time.perf_counter() - t0) / n
    flops = 2 * m * 256 * 256 * depth * steps
    print(f"M={m:5d} depth={depth:2d} chains={n_chains}  {dt*1e3:7.3f} ms  "
          f"{flops/dt/1e12:6.1f} TF/s  ({flops/197e12/dt*100:5.1f}%)", flush=True)


def main():
    for m, depth, chains in [
        (2048, 32, 1),
        (2048, 32, 4),
        (8192, 32, 1),
        (512, 32, 4),
        (2048, 8, 1),
    ]:
        try:
            run(m, depth, chains)
        except Exception as e:  # noqa: BLE001
            print(f"M={m} depth={depth} chains={chains} FAILED {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
