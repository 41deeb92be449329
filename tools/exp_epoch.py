#!/usr/bin/env python
"""Epoch-scan data-feed experiment: is the per-step index gather from the HBM
ray table the gap between the ~30 ms in-scan train step (tools/exp_step.py)
and the ~66 ms/step the epoch program was measured at?

Variants (all: one jitted scan of 40 steps, 4096 rays/step):
  gather   : current make_epoch_fn — permutation indices, per-step row gather
  prepermute: permute the whole table once per epoch, contiguous slice/step
  noshuffle : contiguous slices, no permutation (lower bound)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def bench(fn, state, key, *tables, n=3):
    # make_epoch_fn donates the state argument: thread the returned state
    # back in (and never reuse the initial one across calls).
    state, metrics = fn(state, key, *tables)
    float(jax.tree.leaves(metrics)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = fn(state, key, *tables)
    float(jax.tree.leaves(metrics)[0].sum())
    return (time.perf_counter() - t0) / n


def main():
    from nerf_and_dietnerf_tpu.models.nerf import NeRFConfig
    from nerf_and_dietnerf_tpu.train import train_step as ts

    config = NeRFConfig(backend="pallas")
    batch, steps = 4096, 40
    opt = ts.make_optimizer(5e-4)
    state0 = ts.init_train_state(jax.random.PRNGKey(0), config, opt)

    n_rays = batch * steps
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    orig = jnp.zeros((n_rays, 4), jnp.float32).at[:, 3].set(1.0)
    dirs = jnp.concatenate(
        [jax.random.normal(k1, (n_rays, 3)), jnp.zeros((n_rays, 1))], axis=-1
    )
    rgb = jax.random.uniform(k2, (n_rays, 3))

    # (a) current path
    epoch_gather = ts.make_epoch_fn(config, opt, steps, batch)

    # (b) permute once, then contiguous slices
    def epoch_prepermute(state, key, origins, dirs_, rgb_):
        k_perm, k_steps = jax.random.split(key)
        perm = jax.random.permutation(k_perm, origins.shape[0])
        tables = tuple(t[perm] for t in (origins, dirs_, rgb_))
        keys = jax.random.split(k_steps, steps)

        def body(st, inp):
            i, k = inp
            batch_ = tuple(
                jax.lax.dynamic_slice_in_dim(t, i * batch, batch) for t in tables
            )
            return ts.train_step(st, k, batch_, config=config, optimizer=opt)

        state, metrics = jax.lax.scan(body, state, (jnp.arange(steps), keys))
        return state, jax.tree.map(jnp.mean, metrics)

    # (c) no shuffle at all
    def epoch_noshuffle(state, key, origins, dirs_, rgb_):
        keys = jax.random.split(key, steps)

        def body(st, inp):
            i, k = inp
            batch_ = tuple(
                jax.lax.dynamic_slice_in_dim(t, i * batch, batch)
                for t in (origins, dirs_, rgb_)
            )
            return ts.train_step(st, k, batch_, config=config, optimizer=opt)

        state, metrics = jax.lax.scan(body, state, (jnp.arange(steps), keys))
        return state, jax.tree.map(jnp.mean, metrics)

    for name, fn in [
        ("gather", epoch_gather),
        ("prepermute", jax.jit(epoch_prepermute)),
        ("noshuffle", jax.jit(epoch_noshuffle)),
    ]:
        try:
            state0 = ts.init_train_state(jax.random.PRNGKey(0), config, opt)
            dt = bench(fn, state0, jax.random.PRNGKey(3), orig, dirs, rgb)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {str(e)[:120]}", flush=True)
            continue
        print(
            f"{name:11s} {dt*1e3:8.1f} ms/epoch-call  {dt/steps*1e3:6.2f} ms/step  "
            f"{batch*steps/dt:,.0f} rays/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
