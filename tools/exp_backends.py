#!/usr/bin/env python
"""Head-to-head train-step timing of the MLP-evaluation backends.

Variants (flagship workload: 4096 rays, 64+128 samples, 256-wide MLP, bf16):
  pallas_mlp : enc-input Pallas kernel; encoding + compositing in XLA
  raymarch   : fully fused point-gen/encode kernel; compositing in XLA
  composited : fully fused kernel incl. compositing (current "pallas")
  xla        : everything XLA

K steps inside ONE jitted lax.scan (per-call dispatch ~3 ms on this
backend; float() fences)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

K = 20


def main():
    from nerf_and_dietnerf_tpu.models import nerf
    from nerf_and_dietnerf_tpu.models.nerf import NeRFConfig
    from nerf_and_dietnerf_tpu.train import train_step as ts

    batch = 4096
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    orig = jnp.zeros((batch, 4), jnp.float32).at[:, 3].set(1.0)
    dirs = jnp.concatenate(
        [jax.random.normal(k1, (batch, 3)), jnp.zeros((batch, 1))], axis=-1
    )
    rgb = jax.random.uniform(k2, (batch, 3))

    def time_variant(config, patch_no_comp=False):
        orig_fn = nerf.render_rays_train
        if patch_no_comp:
            def no_comp(mlp_params, cfg, ro, rd, z):
                r = nerf.render_rays(mlp_params, cfg, ro, rd, z)
                return r.rgb, r.weights
            nerf.render_rays_train = no_comp
        try:
            opt = ts.make_optimizer(5e-4)
            state = ts.init_train_state(jax.random.PRNGKey(0), config, opt)

            @jax.jit
            def run(state, keys):
                def body(s, k):
                    return ts.train_step(s, k, (orig, dirs, rgb), config=config, optimizer=opt)
                return jax.lax.scan(body, state, keys)

            keys = jax.random.split(jax.random.PRNGKey(42), K)
            state2, m = run(state, keys)
            float(m["loss"][-1])
            t0 = time.perf_counter()
            n = 3
            for _ in range(n):
                state2, m = run(state2, keys)
            float(m["loss"][-1])
            return (time.perf_counter() - t0) / (n * K)
        finally:
            nerf.render_rays_train = orig_fn

    for name, cfg, patch in [
        ("composited", NeRFConfig(backend="pallas"), False),
        ("raymarch  ", NeRFConfig(backend="pallas"), True),
        ("pallas_mlp", NeRFConfig(backend="pallas_mlp"), False),
        ("xla       ", NeRFConfig(backend="xla"), False),
    ]:
        try:
            t = time_variant(cfg, patch)
            print(f"{name}: {t*1e3:7.2f} ms/step  {batch/t/1e3:7.1f}k rays/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
