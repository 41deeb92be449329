#!/usr/bin/env python
"""Tile-size sweep with IN-SCAN timing (per-call timing on this backend hides
everything under ~3 ms dispatch overhead — tools/exp_mxu.py)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

K = 20


def bench_scan(body, init, n_calls=3):
    keys = jax.random.split(jax.random.PRNGKey(42), K)

    @jax.jit
    def run(init, keys):
        carry, _ = jax.lax.scan(body, init, keys)
        return carry

    out = run(init, keys)
    float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n_calls):
        out = run(init, keys)
    float(jax.tree.leaves(out)[0].sum())
    return (time.perf_counter() - t0) / (n_calls * K)


def main():
    from nerf_and_dietnerf_tpu.models import mlp as m
    from nerf_and_dietnerf_tpu.ops import raymarch_pallas as rp

    cfg = m.MLPConfig()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    n = 786432
    kx, kd = jax.random.split(jax.random.PRNGKey(1))
    enc_xyz = jax.random.normal(kx, (n, cfg.xyz_dim), jnp.float32)
    enc_dir = jax.random.normal(kd, (n, cfg.dir_dim), jnp.float32)
    flops = rp._mlp_flops(cfg, n)

    for t in (2048, 4096, 8192):
        rp.TILE_ROWS = t

        def body(c, key):
            out = rp.apply_mlp_fused(params, cfg, enc_xyz + c, enc_dir)
            return jnp.mean(out), None

        try:
            dt = bench_scan(body, jnp.float32(0.0))
        except Exception as e:  # noqa: BLE001
            print(f"fwd tile={t}: FAILED {str(e)[:110]}", flush=True)
            continue
        print(f"fwd  tile={t:5d}  {dt*1e3:6.2f} ms  {flops/dt/1e12:5.1f} TF/s", flush=True)

    rp.TILE_ROWS = 2048
    for t in (512, 1024, 2048):
        rp.TILE_ROWS_BWD = t

        def body(c, key):
            g = jax.grad(
                lambda p: jnp.mean(rp.apply_mlp_fused(p, cfg, enc_xyz + c, enc_dir) ** 2)
            )(params)
            return jnp.mean(jax.tree.leaves(g)[0]), None

        try:
            dt = bench_scan(body, jnp.float32(0.0))
        except Exception as e:  # noqa: BLE001
            print(f"grad tile_bwd={t}: FAILED {str(e)[:110]}", flush=True)
            continue
        print(f"grad tile_bwd={t:5d}  {dt*1e3:6.2f} ms  "
              f"{4*flops/dt/1e12:5.1f} TF/s eff", flush=True)


if __name__ == "__main__":
    main()
