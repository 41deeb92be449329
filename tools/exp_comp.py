#!/usr/bin/env python
"""Bisect the composited-kernel train-path regression (round-1 VERDICT #1).

Times, each as ONE jitted lax.scan of K iterations (per-call dispatch on the
tunneled backend is ~3 ms, so per-call timing lies):

  comp_fwd_c / comp_fwd_f   : composited kernel forward, coarse/fine shapes
  comp_grad_c / comp_grad_f : composited kernel fwd+bwd
  nc_fwd_c / nc_grad_c      : non-composited raymarch kernel, same shapes
  step_comp                 : full train step, fuse_compositing=True
  step_nocomp               : full train step, fuse_compositing=False
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

K = 20


def bench_scan(make_body, n_calls=3):
    init, body = make_body()
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
    from nerf_and_dietnerf_tpu.models import mlp as mlp_lib
    from nerf_and_dietnerf_tpu.models import nerf
    from nerf_and_dietnerf_tpu.models.mlp import MLPConfig
    from nerf_and_dietnerf_tpu.models.nerf import NeRFConfig
    from nerf_and_dietnerf_tpu.ops import raymarch_pallas as rp
    from nerf_and_dietnerf_tpu.ops import research_kernels as rk
    from nerf_and_dietnerf_tpu.train import train_step as ts

    batch = 4096
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    orig = jnp.zeros((batch, 4), jnp.float32).at[:, 3].set(1.0)
    dirs = jnp.concatenate(
        [jax.random.normal(k1, (batch, 3)), jnp.zeros((batch, 1))], axis=-1
    )
    rgb = jax.random.uniform(k2, (batch, 3))

    mlp_cfg = MLPConfig()
    mlp_params = mlp_lib.init_params(jax.random.PRNGKey(0), mlp_cfg)
    comps = jax.random.normal(jax.random.PRNGKey(3), (batch, mlp_cfg.n_angles + 1))

    for S, tag in ((64, "c"), (128, "f")):
        z = jnp.sort(
            jax.random.uniform(jax.random.PRNGKey(4), (batch, S), minval=2.0, maxval=6.0),
            axis=1,
        )

        def mk_comp_fwd():
            def body(c, key):
                px, w = rk.apply_raymarch_composited(
                    mlp_params, mlp_cfg, orig, dirs, comps, z + c * 0.0
                )
                return jnp.mean(px) + c * 0.0, None
            return jnp.float32(0.0), body

        def mk_comp_grad():
            def body(c, key):
                def loss(p):
                    px, w = rk.apply_raymarch_composited(p, mlp_cfg, orig, dirs, comps, z)
                    return jnp.mean(px**2) + jnp.mean(w**2)
                g = jax.grad(loss)(mlp_params)
                return c + jnp.mean(jax.tree.leaves(g)[0]), None
            return jnp.float32(0.0), body

        def mk_nc_fwd():
            def body(c, key):
                raw = rk.apply_raymarch_fused(mlp_params, mlp_cfg, orig, dirs, comps, z)
                return jnp.mean(raw) + c * 0.0, None
            return jnp.float32(0.0), body

        def mk_nc_grad():
            def body(c, key):
                def loss(p):
                    raw = rk.apply_raymarch_fused(p, mlp_cfg, orig, dirs, comps, z)
                    return jnp.mean(raw**2)
                g = jax.grad(loss)(mlp_params)
                return c + jnp.mean(jax.tree.leaves(g)[0]), None
            return jnp.float32(0.0), body

        print(f"comp_fwd_{tag}  {bench_scan(mk_comp_fwd)*1e3:7.2f} ms", flush=True)
        print(f"comp_grad_{tag} {bench_scan(mk_comp_grad)*1e3:7.2f} ms", flush=True)
        print(f"nc_fwd_{tag}    {bench_scan(mk_nc_fwd)*1e3:7.2f} ms", flush=True)
        print(f"nc_grad_{tag}   {bench_scan(mk_nc_grad)*1e3:7.2f} ms", flush=True)

    for name, config in [
        ("step_comp", NeRFConfig(backend="pallas")),
        ("step_nocomp", NeRFConfig(backend="pallas", fuse_compositing=False)),
    ]:
        opt = ts.make_optimizer(5e-4)
        state = ts.init_train_state(jax.random.PRNGKey(0), config, opt)

        def mk_step(cfg=config, s=state, o=opt):
            def body(st, key):
                st, _ = ts.train_step(st, key, (orig, dirs, rgb), config=cfg, optimizer=o)
                return st, None
            return s, body

        print(f"{name:12s} {bench_scan(mk_step)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
