#!/usr/bin/env python
"""Bench fuse_fine_loss (apply_mlp_loss_composited) on the real chip.

Times the production whole-epoch scan (train_step.make_epoch_fn, 40 steps of
4096 rays, 64c+128f, 256-wide) with the fused fine-pass loss kernel off vs
on. Timing fenced with host materialization (float(loss)); per CLAUDE.md,
block_until_ready lies on this backend.
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp


def bench(config, label):
    from nerf_and_dietnerf_tpu.train import train_step as ts

    batch, steps = 4096, 40
    optimizer = ts.make_optimizer(5e-4)
    state = ts.init_train_state(jax.random.PRNGKey(0), config, optimizer)
    n_rays = batch * steps
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    orig = jnp.zeros((n_rays, 4), jnp.float32).at[:, 3].set(1.0)
    dirs = jnp.concatenate(
        [jax.random.normal(k1, (n_rays, 3)), jnp.zeros((n_rays, 1))], axis=-1
    )
    rgb = jax.random.uniform(k2, (n_rays, 3))
    epoch_fn = ts.make_epoch_fn(config, optimizer, steps, batch)
    t0 = time.perf_counter()
    state, metrics = epoch_fn(state, jax.random.PRNGKey(2), orig, dirs, rgb)
    float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    n_calls = 3
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, metrics = epoch_fn(state, jax.random.PRNGKey(3 + i), orig, dirs, rgb)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    ms_per_step = dt / (n_calls * steps) * 1e3
    rays_s = batch * steps * n_calls / dt
    print(
        f"{label:24s} {ms_per_step:7.2f} ms/step  {rays_s/1e3:7.1f}k rays/s  "
        f"(compile {compile_s:.0f}s, loss {float(metrics['loss']):.4f})",
        flush=True,
    )
    return {"ms_per_step": ms_per_step, "rays_per_sec": rays_s}


def main():
    from nerf_and_dietnerf_tpu.models.nerf import NeRFConfig

    assert jax.default_backend() == "tpu"
    out = {}
    base = NeRFConfig(backend="pallas")
    out["fuse_off"] = bench(base, "pallas fuse_fine_loss=0")
    out["fuse_on"] = bench(
        dataclasses.replace(base, fuse_fine_loss=True), "pallas fuse_fine_loss=1"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
