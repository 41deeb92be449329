#!/usr/bin/env python
"""In-scan timing of the fused ray-march kernel vs the enc-input kernel,
flagship shapes (4096 rays, 64 and 128 samples)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

K = 20


def bench_scan(body, init=jnp.float32(0.0), n_calls=3):
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
    from nerf_and_dietnerf_tpu.core import cameras
    from nerf_and_dietnerf_tpu.models import mlp as m
    from nerf_and_dietnerf_tpu.ops import raymarch_pallas as rp
    from nerf_and_dietnerf_tpu.ops import research_kernels as rk

    cfg = m.MLPConfig()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    n_rays = 4096
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    orig = jax.random.normal(k1, (n_rays, 4))
    dirs = jax.random.normal(k2, (n_rays, 4))
    vc = cameras.view_direction_components(dirs, cfg.n_angles)

    for S in (64, 128):
        z = jax.random.uniform(jax.random.PRNGKey(2), (n_rays, S), minval=2.0, maxval=6.0)

        def fwd_body(c, key):
            out = rk.apply_raymarch_fused(params, cfg, orig, dirs, vc, z + c, jnp.bfloat16)
            return jnp.mean(out), None

        def grad_body(c, key):
            g = jax.grad(
                lambda p: jnp.mean(
                    rk.apply_raymarch_fused(p, cfg, orig, dirs, vc, z + c, jnp.bfloat16) ** 2
                )
            )(params)
            return jnp.mean(jax.tree.leaves(g)[0]), None

        try:
            tf = bench_scan(fwd_body)
            tg = bench_scan(grad_body)
            print(f"raymarch S={S:3d}: fwd {tf*1e3:6.2f} ms  grad {tg*1e3:6.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"raymarch S={S}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
