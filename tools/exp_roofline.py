#!/usr/bin/env python
"""Speed-of-light decomposition of the fused MLP kernels (VERDICT r2 #3).

Measures, all at the flagship fine-pass-scale row count (786432 rows =
4096 rays x 192 samples, bf16), each wrapped in one jitted lax.scan of K
iterations (the ~3 ms/dispatch tunnel tax makes per-call timing lie):

  fwd            production forward kernel (TILE_ROWS)
  fwd@T          forward at alternative row-tile sizes
  fwd_id         forward with LeakyReLU monkeypatched to identity
                 (isolates the VPU activation cost serialized with the MXU)
  fwd_mm         matmul-chain only (no bias, no activation, no concat)
                 -- the in-kernel MXU speed of light
  fwd_bf16out    matmuls emit bf16 (preferred_element_type), bias+leaky in
                 bf16 -- halves the inter-layer VPU bytes
  bwd            production backward kernel (TILE_ROWS_BWD)
  bwd@T          backward at alternative tile sizes

Prints ms per iteration plus the analytic MXU-bound time for comparison.
v5e bf16 peak: ~197 TFLOP/s (MXU), so t_mxu = flops / 197e12.
"""

from __future__ import annotations

import functools
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
    float(jax.tree.leaves(out)[0].sum())  # compile + fence
    t0 = time.perf_counter()
    for _ in range(n_calls):
        out = run(init, keys)
    float(jax.tree.leaves(out)[0].sum())
    return (time.perf_counter() - t0) / (n_calls * K)


def main():
    from nerf_and_dietnerf_tpu.models import mlp as mlp_lib
    from nerf_and_dietnerf_tpu.models.mlp import MLPConfig
    from nerf_and_dietnerf_tpu.ops import raymarch_pallas as rp

    cfg = MLPConfig()
    n_rows = 4096 * 192
    kx, kd = jax.random.split(jax.random.PRNGKey(2))
    enc_xyz = jax.random.normal(kx, (n_rows, cfg.xyz_dim), jnp.bfloat16)
    enc_dir = jax.random.normal(kd, (n_rows, cfg.dir_dim), jnp.bfloat16)
    params = mlp_lib.init_params(jax.random.PRNGKey(0), cfg)
    g = jax.random.normal(jax.random.PRNGKey(3), (n_rows, 4), jnp.float32)

    flops_fwd = rp._mlp_flops(cfg, n_rows)
    t_mxu = flops_fwd / 197e12
    print(f"rows={n_rows}  fwd_flops={flops_fwd/1e9:.1f} GFLOP  "
          f"mxu-bound={t_mxu*1e3:.2f} ms (197 TFLOP/s bf16)", flush=True)

    def fwd_body(c, k):
        out = rp.apply_mlp_fused(params, cfg, enc_xyz + c, enc_dir)
        return jnp.mean(out).astype(jnp.bfloat16), None

    def run_fwd(label):
        t = bench_scan(fwd_body, jnp.bfloat16(0.0))
        print(f"{label:14s} {t*1e3:7.2f} ms   ({flops_fwd/t/1e12:.1f} TFLOP/s)",
              flush=True)
        return t

    run_fwd("fwd")
    for tile in (2048, 8192, 16384, 32768):
        old = rp.TILE_ROWS
        rp.TILE_ROWS = tile
        try:
            run_fwd(f"fwd@{tile}")
        except Exception as e:  # noqa: BLE001
            print(f"fwd@{tile}: FAILED {str(e)[:120]}", flush=True)
        finally:
            rp.TILE_ROWS = old

    # Identity activation: isolates VPU leaky cost.
    real_leaky = rp._leaky
    rp._leaky = lambda x, a: x
    try:
        run_fwd("fwd_id")
    finally:
        rp._leaky = real_leaky

    # max-form LeakyReLU: for 0 <= alpha < 1, max(x, alpha*x) == leaky(x)
    # exactly (2 VPU passes instead of cmp+mul+select).
    rp._leaky = lambda x, a: jnp.maximum(x, a * x)
    try:
        run_fwd("fwd_max")
    finally:
        rp._leaky = real_leaky

    # Matmul-only chain: pure MXU ceiling inside the same kernel scaffold.
    real_tile_fn = rp._forward_tile

    def mm_tile(config, cd, x, d, ws, bs):
        dot = functools.partial(jnp.dot, preferred_element_type=cd)
        wi = 0
        h = x
        from nerf_and_dietnerf_tpu.models.mlp import N_TRUNK_LAYERS, SKIP_AFTER
        for layer in range(N_TRUNK_LAYERS):
            if layer == SKIP_AFTER:
                h = (dot(x, ws[wi]) + dot(h, ws[wi + 1])).astype(cd)
                wi += 2
            else:
                h = dot(h, ws[wi]).astype(cd)
                wi += 1
        rgb_h = (dot(h, ws[wi]) + dot(d, ws[wi + 1])).astype(cd)
        rgb = jnp.dot(rgb_h, ws[wi + 2], preferred_element_type=jnp.float32)
        sigma = (jnp.dot(h, ws[wi + 3], preferred_element_type=jnp.float32)
                 + jnp.dot(d, ws[wi + 4], preferred_element_type=jnp.float32))
        out = jnp.concatenate([rgb, sigma], axis=-1)
        return out, []

    rp._forward_tile = mm_tile
    try:
        run_fwd("fwd_mm")
    finally:
        rp._forward_tile = real_tile_fn

    # bf16-out variant: matmuls emit bf16; bias + leaky in bf16.
    def bf16_tile(config, cd, x, d, ws, bs):
        from nerf_and_dietnerf_tpu.models.mlp import N_TRUNK_LAYERS, SKIP_AFTER
        alpha = config.leaky_relu_alpha
        dot = functools.partial(jnp.dot, preferred_element_type=cd)
        bs = [b.astype(cd) for b in bs]
        wi = 0
        h = x
        for layer in range(N_TRUNK_LAYERS):
            if layer == SKIP_AFTER:
                pre = dot(x, ws[wi]) + dot(h, ws[wi + 1]) + bs[layer]
                wi += 2
            else:
                pre = dot(h, ws[wi]) + bs[layer]
                wi += 1
            h = rp._leaky(pre, alpha)
        b = N_TRUNK_LAYERS
        rgb_h = rp._leaky(dot(h, ws[wi]) + dot(d, ws[wi + 1]) + bs[b], alpha)
        rgb = (jnp.dot(rgb_h, ws[wi + 2], preferred_element_type=jnp.float32)
               + bs[b + 1].astype(jnp.float32))
        sigma = (jnp.dot(h, ws[wi + 3], preferred_element_type=jnp.float32)
                 + jnp.dot(d, ws[wi + 4], preferred_element_type=jnp.float32)
                 + bs[b + 2].astype(jnp.float32))
        out = jnp.concatenate([rgb, sigma], axis=-1)
        return out, []

    rp._forward_tile = bf16_tile
    try:
        run_fwd("fwd_bf16out")
        rp._leaky = lambda x, a: jnp.maximum(x, a * x)
        run_fwd("fwd_bf16out_max")
    finally:
        rp._forward_tile = real_tile_fn
        rp._leaky = real_leaky

    # Backward kernel.
    def bwd_body(c, k):
        dparams, dx, dd = rp._backward_pallas(
            params, cfg, enc_xyz + c, enc_dir, jnp.bfloat16, g
        )
        return jnp.mean(dx).astype(jnp.bfloat16), None

    def run_bwd(label):
        t = bench_scan(bwd_body, jnp.bfloat16(0.0))
        print(f"{label:14s} {t*1e3:7.2f} ms   "
              f"({3*flops_fwd/t/1e12:.1f} TFLOP/s eff)", flush=True)
        return t

    run_bwd("bwd")
    rp._leaky = lambda x, a: jnp.maximum(x, a * x)
    try:
        run_bwd("bwd_max")
    finally:
        rp._leaky = real_leaky
    for tile in (1024, 4096, 8192):
        old = rp.TILE_ROWS_BWD
        rp.TILE_ROWS_BWD = tile
        try:
            run_bwd(f"bwd@{tile}")
        except Exception as e:  # noqa: BLE001
            print(f"bwd@{tile}: FAILED {str(e)[:120]}", flush=True)
        finally:
            rp.TILE_ROWS_BWD = old


if __name__ == "__main__":
    main()
