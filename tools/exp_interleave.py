#!/usr/bin/env python
"""Experiment: does interleaving independent row-chains in the fused forward
kernel fill MXU pipeline bubbles? Variant A = current single chain per tile;
variant B/C = 2/4 chains in lockstep (independent dots adjacent in program
order so Mosaic can overlap them)."""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_and_dietnerf_tpu.models.mlp import MLPConfig, init_params
from nerf_and_dietnerf_tpu.ops import raymarch_pallas as rp

CD = jnp.bfloat16


def make_fwd(config, n_w, n_b, tile, n_chains):
    sub = tile // n_chains

    def kernel(*refs):
        x_ref, d_ref = refs[0], refs[1]
        w_refs = refs[2 : 2 + n_w]
        b_refs = refs[2 + n_w : 2 + n_w + n_b]
        out_ref = refs[-1]
        ws = [w[:] for w in w_refs]
        bs = [b[:] for b in b_refs]
        alpha = config.leaky_relu_alpha
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

        xs = [x_ref[i * sub : (i + 1) * sub, :].astype(CD) for i in range(n_chains)]
        dd = [d_ref[i * sub : (i + 1) * sub, :].astype(CD) for i in range(n_chains)]
        hs = list(xs)
        from nerf_and_dietnerf_tpu.models.mlp import N_TRUNK_LAYERS, SKIP_AFTER

        wi = 0
        for layer in range(N_TRUNK_LAYERS):
            if layer == SKIP_AFTER:
                pres = [dot(x, ws[wi]) + dot(h, ws[wi + 1]) + bs[layer]
                        for x, h in zip(xs, hs)]
                step = 2
            else:
                pres = [dot(h, ws[wi]) + bs[layer] for h in hs]
                step = 1
            wi += step
            hs = [rp._leaky(p, alpha).astype(CD) for p in pres]

        b = N_TRUNK_LAYERS
        rgb_hs = [rp._leaky(dot(h, ws[wi]) + dot(d, ws[wi + 1]) + bs[b], alpha).astype(CD)
                  for h, d in zip(hs, dd)]
        rgbs = [dot(rh, ws[wi + 2]) + bs[b + 1] for rh in rgb_hs]
        sigmas = [dot(h, ws[wi + 3]) + dot(d, ws[wi + 4]) + bs[b + 2]
                  for h, d in zip(hs, dd)]
        for i in range(n_chains):
            out_ref[i * sub : (i + 1) * sub, :] = jnp.concatenate(
                [rgbs[i], sigmas[i]], axis=-1
            ).astype(jnp.float32)

    return kernel


def fwd_pallas(params, config, enc_xyz, enc_dir, tile, n_chains):
    x = rp._pad_rows(enc_xyz.astype(jnp.float32), tile)
    d = rp._pad_rows(enc_dir.astype(jnp.float32), tile)
    ws, bs = rp._flatten_params(params, config, CD)
    inputs = [x, d, *ws, *bs]
    in_specs = [
        pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, d.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for t in (*ws, *bs)]
    out = pl.pallas_call(
        make_fwd(config, len(ws), len(bs), tile, n_chains),
        grid=(x.shape[0] // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
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

    ref = jax.jit(lambda p, x, d: rp.apply_mlp_fused(p, config, x, d))(
        params, enc_xyz, enc_dir
    )

    for tile, chains in [(2048, 1), (2048, 2), (4096, 2), (2048, 4), (4096, 4), (8192, 4)]:
        f = jax.jit(lambda p, x, d, t=tile, c=chains: fwd_pallas(p, config, x, d, t, c))
        try:
            out = f(params, enc_xyz, enc_dir)
            err = float(jnp.max(jnp.abs(out - ref)))
            dt = bench(f, params, enc_xyz, enc_dir)
        except Exception as e:  # noqa: BLE001
            print(f"tile={tile} chains={chains}  FAILED {str(e)[:100]}", flush=True)
            continue
        print(f"tile={tile:5d} chains={chains}  {dt*1e3:6.2f} ms  "
              f"{flops/dt/1e12:5.1f} TF/s ({flops/197e12/dt*100:4.1f}%)  maxerr={err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
