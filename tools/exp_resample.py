#!/usr/bin/env python
"""Micro-bench: hierarchical resampling, round-2 (4 one-hots) vs round-3
(single shared one-hot + stacked gather einsum) formulation, fwd and grad,
at the flagship shape. Scan-wrapped (tunnel dispatch tax)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

K_ITERS = 20


def bench(body, init, n_calls=3):
    keys = jax.random.split(jax.random.PRNGKey(42), K_ITERS)

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
    return (time.perf_counter() - t0) / (n_calls * K_ITERS)


def old_resample(key, weights, z_values, n_new):
    from nerf_and_dietnerf_tpu.core import sampling

    weights = jnp.asarray(weights, jnp.float32)
    z_values = jnp.asarray(z_values, jnp.float32)
    n_coarse = weights.shape[-1]
    pdf = weights / (jnp.sum(weights, axis=-1, keepdims=True) + sampling.CDF_EPS)
    cdf = jnp.cumsum(pdf, axis=-1)
    u = sampling.sorted_uniforms(key, weights.shape[:-1], n_new)
    idx = sampling._batched_searchsorted(cdf, u)
    lo = jnp.maximum(0, idx - 1)
    hi = jnp.minimum(n_coarse - 1, idx)
    grid = jax.lax.broadcasted_iota(jnp.int32, (*idx.shape, n_coarse), idx.ndim)
    cdf_lo = sampling._pick((grid == lo[..., None]).astype(jnp.float32), cdf)
    cdf_hi = sampling._pick((grid == hi[..., None]).astype(jnp.float32), cdf)
    z_mid = 0.5 * (z_values[..., 1:] + z_values[..., :-1])
    grid_z = grid[..., : n_coarse - 1]
    lo_z = jnp.clip(lo, 0, n_coarse - 2)
    hi_z = jnp.clip(hi, 0, n_coarse - 2)
    z_lo = sampling._pick((grid_z == lo_z[..., None]).astype(jnp.float32), z_mid)
    z_hi = sampling._pick((grid_z == hi_z[..., None]).astype(jnp.float32), z_mid)
    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < sampling.DENOM_CLAMP, sampling.DENOM_CLAMP, denom)
    t = (u - cdf_lo) / denom
    return z_lo + t * (z_hi - z_lo)


def main():
    from nerf_and_dietnerf_tpu.core import sampling

    R, K, N = 4096, 64, 128
    w = jax.random.gamma(jax.random.PRNGKey(0), 0.3, (R, K)).astype(jnp.float32)
    z = jnp.cumsum(
        jax.random.uniform(jax.random.PRNGKey(1), (R, K), minval=0.01, maxval=0.1), -1
    ) + 2.0

    for name, fn in (("old", old_resample), ("new", sampling.resample_z_from_weights)):
        def fwd_body(c, k, fn=fn):
            return jnp.sum(fn(k, w + c, z, N)), None

        def grad_body(c, k, fn=fn):
            g = jax.grad(lambda ww: jnp.sum(jnp.sin(fn(k, ww, z, N))))(w + c)
            return jnp.sum(g), None

        t_f = bench(fwd_body, jnp.float32(0.0))
        t_g = bench(grad_body, jnp.float32(0.0))
        print(f"{name}: fwd={t_f*1e3:6.3f} ms  grad={t_g*1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
