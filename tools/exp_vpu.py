#!/usr/bin/env python
"""Experiment: is the fused forward VPU-bound?

V0 baseline = current kernel. V1 = matmuls only (no bias/activation; dot
emits bf16 directly) — if V1 is ~2x faster, the elementwise epilogue
dominates. V2 = dot emits bf16, bias+leaky in bf16 via max(x, a*x) (2 VPU
passes instead of ~4). V3 = f32 accumulate, max-form leaky, cast.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_and_dietnerf_tpu.models.mlp import (
    MLPConfig, N_TRUNK_LAYERS, SKIP_AFTER, init_params,
)
from nerf_and_dietnerf_tpu.ops import raymarch_pallas as rp

CD = jnp.bfloat16
TILE = 2048


def make_fwd(config, n_w, n_b, variant):
    alpha = config.leaky_relu_alpha

    def kernel(*refs):
        x_ref, d_ref = refs[0], refs[1]
        ws = [w[:] for w in refs[2 : 2 + n_w]]
        bs_f32 = [b[:] for b in refs[2 + n_w : 2 + n_w + n_b]]
        out_ref = refs[-1]

        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        if variant == "v1":  # matmul + cast only — isolates MXU cost
            def act(p, b):
                return p.astype(CD)
        elif variant == "v5":  # cast first, then bias+leaky in bf16
            bs = [b.astype(CD) for b in bs_f32]

            def act(p, b):
                p = p.astype(CD) + b
                return jnp.maximum(p, CD(alpha) * p)
        else:  # v3: f32 epilogue, max-form leaky
            def act(p, b):
                p = p + b
                return jnp.maximum(p, alpha * p).astype(CD)
        if variant != "v5":
            bs = bs_f32

        x = x_ref[:].astype(CD)
        d = d_ref[:].astype(CD)
        h = x
        wi = 0
        for layer in range(N_TRUNK_LAYERS):
            if layer == SKIP_AFTER:
                pre = dot(x, ws[wi]) + dot(h, ws[wi + 1])
                wi += 2
            else:
                pre = dot(h, ws[wi])
                wi += 1
            h = act(pre, bs[layer])

        b = N_TRUNK_LAYERS
        rgb_h = act(dot(h, ws[wi]) + dot(d, ws[wi + 1]), bs[b])
        rgb = dot(rgb_h, ws[wi + 2]) + bs[b + 1]
        sigma = dot(h, ws[wi + 3]) + dot(d, ws[wi + 4]) + bs[b + 2]
        out_ref[:] = jnp.concatenate([rgb, sigma], axis=-1).astype(jnp.float32)

    return kernel


def fwd_pallas(params, config, enc_xyz, enc_dir, variant):
    x = rp._pad_rows(enc_xyz.astype(jnp.float32), TILE)
    d = rp._pad_rows(enc_dir.astype(jnp.float32), TILE)
    ws, bs = rp._flatten_params(params, config, CD)
    inputs = [x, d, *ws, *bs]
    in_specs = [
        pl.BlockSpec((TILE, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, d.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for t in (*ws, *bs)]
    out = pl.pallas_call(
        make_fwd(config, len(ws), len(bs), variant),
        grid=(x.shape[0] // TILE,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=rp._mlp_flops(config, x.shape[0]),
            bytes_accessed=x.size * 4, transcendentals=0,
        ),
    )(*inputs)
    return out[: enc_xyz.shape[0]]


def bench(fn, *args, n=10):
    out = fn(*args)
    float(out.sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(out.sum())
    return (time.perf_counter() - t0) / n


def main():
    config = MLPConfig()
    params = init_params(jax.random.PRNGKey(0), config)
    n = 786432
    kx, kd = jax.random.split(jax.random.PRNGKey(1))
    enc_xyz = jax.random.normal(kx, (n, config.xyz_dim), jnp.float32)
    enc_dir = jax.random.normal(kd, (n, config.dir_dim), jnp.float32)
    flops = rp._mlp_flops(config, n)

    ref = jax.jit(lambda p, x, d: rp.apply_mlp_fused(p, config, x, d))
    refout = ref(params, enc_xyz, enc_dir)
    dt = bench(ref, params, enc_xyz, enc_dir)
    print(f"v0 baseline   {dt*1e3:6.2f} ms  {flops/dt/1e12:5.1f} TF/s", flush=True)

    for variant in ("v1", "v5", "v3"):
        f = jax.jit(lambda p, x, d, v=variant: fwd_pallas(p, config, x, d, v))
        try:
            out = f(params, enc_xyz, enc_dir)
            err = float(jnp.max(jnp.abs(out - refout)))
            dt = bench(f, params, enc_xyz, enc_dir)
        except Exception as e:  # noqa: BLE001
            print(f"{variant}  FAILED {str(e)[:100]}", flush=True)
            continue
        print(f"{variant}           {dt*1e3:6.2f} ms  {flops/dt/1e12:5.1f} TF/s  "
              f"maxerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
