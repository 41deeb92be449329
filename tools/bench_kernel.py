#!/usr/bin/env python
"""Microbenchmark for the fused Pallas MLP kernel (fwd and fwd+bwd).

Sweeps row-tile sizes to quantify per-grid-step overhead against the MXU
roofline. Timing is fenced with host materialization (``float(...)``) —
``block_until_ready`` returns early on the tunneled PJRT backend (CLAUDE.md).

Usage:
    python tools/bench_kernel.py [--tiles 2048,4096,8192] [--bwd-tiles 512,1024,2048]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def bench(fn, *args, n=10):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())  # compile + fence
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="2048,4096,8192")
    ap.add_argument("--bwd-tiles", default="512,1024,2048")
    ap.add_argument("--rows", type=int, default=786432)  # 4096 rays * 192 samples
    args = ap.parse_args()

    from nerf_and_dietnerf_tpu.models.mlp import MLPConfig, init_params
    from nerf_and_dietnerf_tpu.ops import raymarch_pallas as rp

    config = MLPConfig()
    params = init_params(jax.random.PRNGKey(0), config)
    n = args.rows
    kx, kd = jax.random.split(jax.random.PRNGKey(1))
    enc_xyz = jax.random.normal(kx, (n, config.xyz_dim), jnp.float32)
    enc_dir = jax.random.normal(kd, (n, config.dir_dim), jnp.float32)

    flops_fwd = rp._mlp_flops(config, n)
    peak = 197e12  # v5e bf16 peak
    print(f"rows={n}  fwd_flops={flops_fwd/1e9:.1f} GF  "
          f"fwd_roofline={flops_fwd/peak*1e3:.2f} ms  "
          f"bwd(3x)_roofline={3*flops_fwd/peak*1e3:.2f} ms")

    fwd = jax.jit(lambda p, x, d: rp.apply_mlp_fused(p, config, x, d))

    def loss(p, x, d):
        return jnp.sum(rp.apply_mlp_fused(p, config, x, d) ** 2)

    grad = jax.jit(jax.grad(loss))

    default_fwd = rp.TILE_ROWS
    for t in [int(s) for s in args.tiles.split(",")]:
        rp.TILE_ROWS = t
        try:
            dt = bench(fwd, params, enc_xyz, enc_dir)
        except Exception as e:  # noqa: BLE001 — sweep survives OOM configs
            print(f"fwd  tile={t:5d}  FAILED: {str(e)[:120]}", flush=True)
            continue
        print(f"fwd  tile={t:5d}  {dt*1e3:7.2f} ms  "
              f"{flops_fwd/dt/1e12:5.1f} TF/s  ({flops_fwd/peak/dt*100:4.1f}% peak)",
              flush=True)

    rp.TILE_ROWS = default_fwd
    for t in [int(s) for s in args.bwd_tiles.split(",")]:
        rp.TILE_ROWS_BWD = t
        try:
            dt = bench(grad, params, enc_xyz, enc_dir)
        except Exception as e:  # noqa: BLE001
            print(f"grad tile_bwd={t:5d}  FAILED: {str(e)[:120]}", flush=True)
            continue
        print(f"grad tile_bwd={t:5d}  {dt*1e3:7.2f} ms  "
              f"{4*flops_fwd/dt/1e12:5.1f} TF/s eff", flush=True)


if __name__ == "__main__":
    main()
