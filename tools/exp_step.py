#!/usr/bin/env python
"""Decompose the 4096-ray train step's device time.

Every measurement wraps K iterations in ONE jitted ``lax.scan`` — this
backend has a ~3 ms fixed dispatch cost per jit call (measured with a
constant-work pallas probe, tools/exp_mxu.py), so per-call timing lies.

Pieces:
  kfwd   : fused kernel forward only, 786432 rows (coarse+fine row count)
  kgrad  : fused kernel fwd+bwd only
  fwd    : full training_losses forward
  grad   : value_and_grad(training_losses)
  step   : full train step (grad + Adam)
  gradz  : grad with stop_fine_z_grad=True (isolates the resample VJP)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

K = 20


def bench_scan(make_body, n_calls=3):
    """make_body() -> (init_carry, body_fn). Times one jitted scan of K
    iterations; returns seconds per iteration."""
    init, body = make_body()
    keys = jax.random.split(jax.random.PRNGKey(42), K)

    @jax.jit
    def run(init, keys):
        carry, _ = jax.lax.scan(body, init, keys)
        return carry

    out = run(init, keys)
    float(jax.tree.leaves(out)[0].sum())  # compile + fence
    t0 = time.perf_counter()
    for _ in range(n_calls):
        out = run(init, keys)
    float(jax.tree.leaves(out)[0].sum())
    return (time.perf_counter() - t0) / (n_calls * K)


def main():
    from nerf_and_dietnerf_tpu.models import nerf
    from nerf_and_dietnerf_tpu.models.mlp import MLPConfig
    from nerf_and_dietnerf_tpu.models.nerf import NeRFConfig
    from nerf_and_dietnerf_tpu.ops import raymarch_pallas as rp
    from nerf_and_dietnerf_tpu.train import train_step as ts

    batch = 4096
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    orig = jnp.zeros((batch, 4), jnp.float32).at[:, 3].set(1.0)
    dirs = jnp.concatenate(
        [jax.random.normal(k1, (batch, 3)), jnp.zeros((batch, 1))], axis=-1
    )
    rgb = jax.random.uniform(k2, (batch, 3))

    mlp_cfg = MLPConfig()
    n_rows = batch * 192
    kx, kd = jax.random.split(jax.random.PRNGKey(2))
    enc_xyz = jax.random.normal(kx, (n_rows, mlp_cfg.xyz_dim), jnp.float32)
    enc_dir = jax.random.normal(kd, (n_rows, mlp_cfg.dir_dim), jnp.float32)
    mlp_params = __import__(
        "nerf_and_dietnerf_tpu.models.mlp", fromlist=["init_params"]
    ).init_params(jax.random.PRNGKey(0), mlp_cfg)

    def make_kfwd():
        def body(c, key):
            out = rp.apply_mlp_fused(mlp_params, mlp_cfg, enc_xyz + c, enc_dir)
            return jnp.mean(out), None
        return jnp.float32(0.0), body

    def make_kgrad():
        def body(c, key):
            g = jax.grad(
                lambda p: jnp.mean(
                    rp.apply_mlp_fused(p, mlp_cfg, enc_xyz + c, enc_dir) ** 2
                )
            )(mlp_params)
            return jnp.mean(jax.tree.leaves(g)[0]), None
        return jnp.float32(0.0), body

    print(f"kfwd  {bench_scan(make_kfwd)*1e3:7.2f} ms", flush=True)
    print(f"kgrad {bench_scan(make_kgrad)*1e3:7.2f} ms", flush=True)

    for name, config in [
        ("pallas", NeRFConfig(backend="pallas")),
        ("pallas_stopz", NeRFConfig(backend="pallas", stop_fine_z_grad=True)),
        ("xla", NeRFConfig(backend="xla")),
    ]:
        params = nerf.init_params(jax.random.PRNGKey(0), config)
        opt = ts.make_optimizer(5e-4)
        state = ts.init_train_state(jax.random.PRNGKey(0), config, opt)

        def make_fwd(cfg=config, p=params):
            def body(c, key):
                loss, _ = nerf.training_losses(p, cfg, key, orig, dirs, rgb)
                return c + loss, None
            return jnp.float32(0.0), body

        def make_grad(cfg=config, p=params):
            def body(c, key):
                g = jax.grad(
                    lambda q: nerf.training_losses(q, cfg, key, orig, dirs, rgb)[0]
                )(p)
                return c + jnp.mean(jax.tree.leaves(g)[0]), None
            return jnp.float32(0.0), body

        def make_step(cfg=config, s=state, o=opt):
            def body(st, key):
                st, _ = ts.train_step(st, key, (orig, dirs, rgb), config=cfg, optimizer=o)
                return st, None
            return s, body

        try:
            t_f = bench_scan(make_fwd)
            t_g = bench_scan(make_grad)
            t_s = bench_scan(make_step)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {str(e)[:150]}", flush=True)
            continue
        print(
            f"{name:13s} fwd={t_f*1e3:6.2f}  grad={t_g*1e3:6.2f}  "
            f"step={t_s*1e3:6.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
