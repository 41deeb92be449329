#!/usr/bin/env python
"""Isolate the raymarch kernel's in-kernel-encoding cost on the real chip.

Monkeypatches ``_encode_tile`` with degraded variants and times the fused
raymarch forward (in one jitted lax.scan, K iterations) at coarse/fine shapes:

  full     : production encode (repeat + z gather + theta FMAs + sin)
  nosin    : theta computed, sin skipped (SC = theta)
  notheta  : expansion only (repeat + z_row + pts), enc = broadcast fill
  noexpand : constant enc tile (kernel = MLP only) — floor
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
    from jax.experimental.pallas import tpu as pltpu

    from nerf_and_dietnerf_tpu.models import mlp as mlp_lib
    from nerf_and_dietnerf_tpu.models.mlp import MLPConfig
    from nerf_and_dietnerf_tpu.ops import raymarch_pallas as rp
    from nerf_and_dietnerf_tpu.ops import research_kernels as rk

    batch = 4096
    k1, _ = jax.random.split(jax.random.PRNGKey(1))
    orig = jnp.zeros((batch, 4), jnp.float32).at[:, 3].set(1.0)
    dirs = jnp.concatenate(
        [jax.random.normal(k1, (batch, 3)), jnp.zeros((batch, 1))], axis=-1
    )
    mlp_cfg = MLPConfig()
    mlp_params = mlp_lib.init_params(jax.random.PRNGKey(0), mlp_cfg)
    comps = jax.random.normal(jax.random.PRNGKey(3), (batch, mlp_cfg.n_angles + 1))

    orig_encode = rp._encode_tile

    def enc_nosin(config, lay, rd, z, F2, masks, offs, S):
        has_dir = config.uses_view_dirs
        D, T, nx = lay["D"], lay["T"], lay["nx"]
        rdr = pltpu.repeat(rd, S, axis=0)
        zr = pltpu.repeat(z, S, axis=0)
        z_row = jnp.sum(zr * F2, axis=1, keepdims=True)
        o = rdr[:, 0:3]
        dvec = rdr[:, 3:6]
        pts = o + z_row * dvec
        theta = jnp.broadcast_to(offs, (pts.shape[0], offs.shape[1]))
        for c in range(3):
            theta = theta + pts[:, c : c + 1] * masks[c : c + 1, :]
        for c in range(D):
            theta = theta + rdr[:, 6 + c : 7 + c] * masks[3 + c : 4 + c, :]
        SC = theta * 0.125  # NO sin
        enc = jnp.concatenate([pts, SC[:, : 2 * nx]], axis=1) if nx else pts
        encd = SC[:, 2 * nx : T] if has_dir else None
        return enc, encd, dvec, theta

    def enc_notheta(config, lay, rd, z, F2, masks, offs, S):
        has_dir = config.uses_view_dirs
        T, nx = lay["T"], lay["nx"]
        rdr = pltpu.repeat(rd, S, axis=0)
        zr = pltpu.repeat(z, S, axis=0)
        z_row = jnp.sum(zr * F2, axis=1, keepdims=True)
        o = rdr[:, 0:3]
        dvec = rdr[:, 3:6]
        pts = o + z_row * dvec
        rows = pts.shape[0]
        SC = jnp.broadcast_to(pts[:, 0:1] * 0.125, (rows, max(T, 1)))
        enc = jnp.concatenate([pts, SC[:, : 2 * nx]], axis=1) if nx else pts
        encd = SC[:, 2 * nx : T] if has_dir else None
        theta = SC
        return enc, encd, dvec, theta

    def enc_noexpand(config, lay, rd, z, F2, masks, offs, S):
        has_dir = config.uses_view_dirs
        T, nx = lay["T"], lay["nx"]
        rows = rd.shape[0] * S
        base = jnp.broadcast_to(rd[0:1, 0:1] * 0.125, (rows, 1))
        pts = jnp.broadcast_to(base, (rows, 3))
        SC = jnp.broadcast_to(base, (rows, max(T, 1)))
        enc = jnp.concatenate([pts, SC[:, : 2 * nx]], axis=1) if nx else pts
        encd = SC[:, 2 * nx : T] if has_dir else None
        dvec = pts
        return enc, encd, dvec, SC

    variants = [
        ("full", orig_encode),
        ("nosin", enc_nosin),
        ("notheta", enc_notheta),
        ("noexpand", enc_noexpand),
    ]

    for S, tag in ((64, "c"), (128, "f")):
        z = jnp.sort(
            jax.random.uniform(
                jax.random.PRNGKey(4), (batch, S), minval=2.0, maxval=6.0
            ),
            axis=1,
        )
        for name, fn in variants:
            rp._encode_tile = fn

            def mk():
                def body(c, key):
                    raw = rk.apply_raymarch_fused(
                        mlp_params, mlp_cfg, orig, dirs, comps, z
                    )
                    return jnp.mean(raw) + c * 0.0, None
                return jnp.float32(0.0), body

            try:
                t = bench_scan(mk)
                print(f"{tag} fwd {name:9s} {t*1e3:7.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{tag} fwd {name:9s} FAILED {str(e)[:120]}", flush=True)
        rp._encode_tile = orig_encode


if __name__ == "__main__":
    main()
