#!/usr/bin/env python
"""Bisect the in-kernel encode cost of the fused ray-march kernel (v2).

Known: full v2 fwd @S=64 (262k rows) = 4.63 ms; MLP-only (enc-input kernel,
same rows) = ~2.5 ms. Where do the extra ~2 ms go? Each probe runs the same
grid/tile structure with the encode pipeline truncated at a different stage.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_and_dietnerf_tpu.models.mlp import MLPConfig
from nerf_and_dietnerf_tpu.ops import raymarch_pallas as rp

S, R_T = 64, 64
ROWS = R_T * S
N_TILES = 64  # 262144 rows, the flagship coarse pass
K = 20


def bench(fn, *args):
    @jax.jit
    def run(c, xs):
        def body(c, _):
            return c + fn(*args, c), None
        return jax.lax.scan(body, c, xs)[0]

    xs = jnp.zeros((K,))
    out = run(jnp.float32(0.0), xs)
    float(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = run(jnp.float32(0.0), xs)
    float(out)
    return (time.perf_counter() - t0) / (3 * K)


def make_probe(stage: str):
    cfg = MLPConfig()
    lay = rp._enc_layout(cfg)
    F2, _ = rp._expand_consts(R_T, S, need_m1=False)
    masks = jnp.asarray(lay["masks"])
    offs = jnp.asarray(lay["offs"])
    D = lay["D"]

    def kernel(rd_ref, z_ref, f2_ref, m_ref, o_ref, out_ref):
        rd, z, F2 = rd_ref[:], z_ref[:], f2_ref[:]
        if stage == "dma":
            out_ref[:] = jnp.zeros((ROWS, 4), jnp.float32) + rd[0, 0] + z[0, 0]
            return
        rdr = pltpu.repeat(rd, S, axis=0)
        zr = pltpu.repeat(z, S, axis=0)
        if stage == "repeat":
            out_ref[:] = rdr[:, 0:4] + zr[:, 0:4]
            return
        z_row = jnp.sum(zr * F2, axis=1, keepdims=True)
        pts = rdr[:, 0:3] + z_row * rdr[:, 3:6]
        if stage == "pts":
            out_ref[:] = jnp.concatenate([pts, z_row], axis=1)
            return
        theta = jnp.broadcast_to(o_ref[:], (ROWS, offs.shape[1]))
        for c in range(3):
            theta = theta + pts[:, c : c + 1] * m_ref[c : c + 1, :]
        for c in range(D):
            theta = theta + rdr[:, 6 + c : 7 + c] * m_ref[3 + c : 4 + c, :]
        if stage == "theta":
            out_ref[:] = theta[:, 0:4]
            return
        SC = jnp.sin(theta)
        if stage == "sin":
            out_ref[:] = SC[:, 0:4]
            return
        enc = jnp.concatenate([pts, SC[:, : 2 * lay["nx"]]], axis=1).astype(jnp.bfloat16)
        encd = SC[:, 2 * lay["nx"] :].astype(jnp.bfloat16)
        out_ref[:] = (
            jnp.zeros((ROWS, 4), jnp.float32)
            + enc[:, 0:1].astype(jnp.float32)
            + encd[:, 0:1].astype(jnp.float32)
        )

    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    rd = jax.random.normal(keys[0], (N_TILES * R_T, 6 + D), jnp.float32)
    z = jax.random.uniform(keys[1], (N_TILES * R_T, S), minval=2.0, maxval=6.0)

    def fn(rd, z, c):
        return jnp.sum(
            pl.pallas_call(
                kernel,
                grid=(N_TILES,),
                in_specs=[
                    pl.BlockSpec((R_T, 6 + D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((R_T, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    rp._const_spec(F2),
                    rp._const_spec(masks),
                    rp._const_spec(offs),
                ],
                out_specs=pl.BlockSpec((ROWS, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N_TILES * ROWS, 4), jnp.float32),
                compiler_params=rp._compiler_params(),
            )(rd + c, z, F2, masks, offs)
        )

    return fn, (rd, z)


def main():
    for stage in ("dma", "repeat", "pts", "theta", "sin", "enc"):
        fn, args = make_probe(stage)
        try:
            t = bench(fn, *args)
            print(f"{stage:7s}: {t*1e3:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{stage:7s}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
