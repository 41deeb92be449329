"""Fused radiance-MLP Pallas kernel (forward + custom-VJP backward).

The hot op of the whole framework: evaluating the 8-layer trunk + heads on
``rays x samples`` points (reference graph: a chain of Keras ``Dense`` calls,
``src/NeRF.py:248-340``, executed layer-by-layer with every activation round-
tripping through HBM). Here one ``pallas_call`` runs the **entire network per
row-tile with all weights and activations resident in VMEM**:

- grid over row tiles of the flattened ``(rays * samples, features)`` batch;
- weights (~1 MB bf16) are broadcast to every grid step (constant index_map —
  Mosaic keeps them in VMEM across steps);
- matmuls hit the MXU in ``compute_dtype`` with float32 accumulation
  (``preferred_element_type``), elementwise LeakyReLU on the VPU, nothing
  spills to HBM between layers;
- backward: recompute-in-tile. The backward kernel re-runs the forward for
  its tile (activations never hit HBM), then walks the chain in reverse.
  Weight gradients accumulate across grid steps into VMEM-resident f32
  accumulators (constant out index_map, initialized at step 0).

Skip/concat handling: every ``concat([a, b]) @ W`` of the reference is a
split dense ``a @ W_a + b @ W_b`` on pre-split weight blocks, so all MXU
shapes are static (see ``models/mlp.py``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_and_dietnerf_tpu.core.rendering import TERMINAL_DELTA
from nerf_and_dietnerf_tpu.models.mlp import (
    MLPConfig,
    N_TRUNK_LAYERS,
    SKIP_AFTER,
)

Params = Dict[str, Any]

TILE_ROWS = 4096      # rows (= ray-samples) per forward grid step — best of
                      # the in-scan sweep (tools/exp_tiles2.py: 7.51 ms vs
                      # 7.61 @ 2048, 8.44 @ 8192 for 786k rows on v5e)
TILE_ROWS_BWD = 2048  # backward re-materializes activations in-tile (VMEM
                      # ~4x forward's); needs the raised vmem limit below
                      # (sweep: 23.06 ms vs 24.24 @ 512 for fwd+bwd)

# v5e has 128 MiB of physical VMEM; Mosaic's default scoped-vmem limit is
# 16 MiB, which caps the row tiles at the sizes above. Raise it so bigger
# tiles (fewer grid steps => fewer pipeline bubbles) compile.
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)


def _interpret() -> bool:
    """Run in interpreter mode off-TPU so the CPU test suite exercises the
    same kernel code path."""
    return jax.default_backend() != "tpu"


def _leaky(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _leaky_bwd(post, g, alpha):
    """LeakyReLU preserves sign, so the post-activation's sign recovers the
    pre-activation branch (>= 0 ties match TF's grad-at-0 convention).
    The compare runs in f32 — Mosaic on v5e has no bf16 ``cmpf``."""
    return jnp.where(post.astype(jnp.float32) >= 0, g, alpha * g)


# --------------------------------------------------------------------------- #
# Parameter flattening: fixed leaf order shared by fwd/bwd kernels.           #
#                                                                             #
# Leaves (view-dir variant):                                                  #
#   w0, (w4x, w4h as the split skip layer), w1..w7, wrh_h, wrh_d, wro,        #
#   wsig_h, wsig_d, then all biases as (1, d) rows.                           #
# --------------------------------------------------------------------------- #

def _flatten_params(params: Params, config: MLPConfig, dtype):
    xyz = config.xyz_dim
    hid = config.hidden_dim
    ws, bs = [], []
    for layer in range(N_TRUNK_LAYERS):
        p = params["trunk"][layer]
        w = p["kernel"]
        if layer == SKIP_AFTER:
            ws += [w[:xyz].astype(dtype), w[xyz:].astype(dtype)]
        else:
            ws.append(w.astype(dtype))
        bs.append(p["bias"].reshape(1, -1).astype(jnp.float32))

    if config.uses_view_dirs:
        wrh = params["rgb_hidden"]["kernel"]
        wsig = params["sigma_out"]["kernel"]
        ws += [
            wrh[:hid].astype(dtype), wrh[hid:].astype(dtype),
            params["rgb_out"]["kernel"].astype(dtype),
            wsig[:hid].astype(dtype), wsig[hid:].astype(dtype),
        ]
    else:
        ws += [
            params["rgb_hidden0"]["kernel"].astype(dtype),
            params["rgb_hidden"]["kernel"].astype(dtype),
            params["rgb_out"]["kernel"].astype(dtype),
            params["sigma_out"]["kernel"].astype(dtype),
        ]
    for name in (
        ("rgb_hidden", "rgb_out", "sigma_out")
        if config.uses_view_dirs
        else ("rgb_hidden0", "rgb_hidden", "rgb_out", "sigma_out")
    ):
        bs.append(params[name]["bias"].reshape(1, -1).astype(jnp.float32))
    return ws, bs


def _unflatten_grads(ws_grads, bs_grads, params: Params, config: MLPConfig):
    """Rebuild the parameter-pytree structure from flat kernel/bias grads."""
    out = {"trunk": []}
    i = 0
    for layer in range(N_TRUNK_LAYERS):
        if layer == SKIP_AFTER:
            kernel = jnp.concatenate([ws_grads[i], ws_grads[i + 1]], axis=0)
            i += 2
        else:
            kernel = ws_grads[i]
            i += 1
        out["trunk"].append({"kernel": kernel, "bias": bs_grads[layer].reshape(-1)})
    b = N_TRUNK_LAYERS
    if config.uses_view_dirs:
        out["rgb_hidden"] = {
            "kernel": jnp.concatenate([ws_grads[i], ws_grads[i + 1]], axis=0),
            "bias": bs_grads[b].reshape(-1),
        }
        out["rgb_out"] = {"kernel": ws_grads[i + 2], "bias": bs_grads[b + 1].reshape(-1)}
        out["sigma_out"] = {
            "kernel": jnp.concatenate([ws_grads[i + 3], ws_grads[i + 4]], axis=0),
            "bias": bs_grads[b + 2].reshape(-1),
        }
    else:
        out["rgb_hidden0"] = {"kernel": ws_grads[i], "bias": bs_grads[b].reshape(-1)}
        out["rgb_hidden"] = {"kernel": ws_grads[i + 1], "bias": bs_grads[b + 1].reshape(-1)}
        out["rgb_out"] = {"kernel": ws_grads[i + 2], "bias": bs_grads[b + 2].reshape(-1)}
        out["sigma_out"] = {"kernel": ws_grads[i + 3], "bias": bs_grads[b + 3].reshape(-1)}
    return out


# --------------------------------------------------------------------------- #
# Forward                                                                     #
# --------------------------------------------------------------------------- #

def _forward_tile(config: MLPConfig, cd, x, d, ws, bs):
    """Run the full network on one row tile; returns (out, activations)."""
    alpha = config.leaky_relu_alpha
    acts = []
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    wi = 0
    h = x
    for layer in range(N_TRUNK_LAYERS):
        if layer == SKIP_AFTER:
            pre = dot(x, ws[wi]) + dot(h, ws[wi + 1]) + bs[layer]
            wi += 2
        else:
            pre = dot(h, ws[wi]) + bs[layer]
            wi += 1
        h = _leaky(pre, alpha).astype(cd)
        acts.append(h)

    b = N_TRUNK_LAYERS
    if config.uses_view_dirs:
        rgb_h = _leaky(dot(h, ws[wi]) + dot(d, ws[wi + 1]) + bs[b], alpha).astype(cd)
        rgb = dot(rgb_h, ws[wi + 2]) + bs[b + 1]
        sigma = dot(h, ws[wi + 3]) + dot(d, ws[wi + 4]) + bs[b + 2]
        acts.append(rgb_h)
    else:
        r0 = _leaky(dot(h, ws[wi]) + bs[b], alpha).astype(cd)
        rgb_h = _leaky(dot(r0, ws[wi + 1]) + bs[b + 1], alpha).astype(cd)
        rgb = dot(rgb_h, ws[wi + 2]) + bs[b + 2]
        sigma = dot(h, ws[wi + 3]) + bs[b + 3]
        acts += [r0, rgb_h]
    out = jnp.concatenate([rgb, sigma], axis=-1).astype(jnp.float32)
    return out, acts


def _make_forward(config: MLPConfig, cd, n_w, n_b, has_dir):
    def kernel(*refs):
        x_ref = refs[0]
        d_ref = refs[1] if has_dir else None
        w_refs = refs[1 + has_dir : 1 + has_dir + n_w]
        b_refs = refs[1 + has_dir + n_w : 1 + has_dir + n_w + n_b]
        out_ref = refs[-1]

        x = x_ref[:].astype(cd)
        d = d_ref[:].astype(cd) if has_dir else None
        ws = [w[:] for w in w_refs]
        bs = [b[:] for b in b_refs]
        out, _ = _forward_tile(config, cd, x, d, ws, bs)
        out_ref[:] = out

    return kernel


def _pad_rows(a, tile):
    n = a.shape[0]
    pad = (-n) % tile
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, a.shape[1]), a.dtype)], axis=0)
    return a


def _mlp_flops(config: MLPConfig, n_rows: int) -> int:
    xyz, hid, last = config.xyz_dim, config.hidden_dim, config.last_hidden_dim
    macs = xyz * hid + 6 * hid * hid + (xyz + hid) * hid
    if config.uses_view_dirs:
        feat = hid + config.dir_dim
        macs += feat * last + last * 3 + feat
    else:
        macs += hid * hid + hid * last + last * 3 + hid
    return 2 * macs * n_rows


def _input_dtype(cd):
    """Feed encodings in the compute dtype when it is narrower than f32: the
    kernel's first op is .astype(compute_dtype), so pre-casting in XLA gives
    bit-identical kernel inputs while halving the lane-padded HBM traffic."""
    return jnp.bfloat16 if cd == jnp.bfloat16 else jnp.float32


def _forward_pallas(params, config: MLPConfig, enc_xyz, enc_dir, cd):
    n = enc_xyz.shape[0]
    has_dir = config.uses_view_dirs
    x = _pad_rows(enc_xyz.astype(_input_dtype(cd)), TILE_ROWS)
    inputs = [x]
    in_specs = [
        pl.BlockSpec((TILE_ROWS, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    if has_dir:
        d = _pad_rows(enc_dir.astype(_input_dtype(cd)), TILE_ROWS)
        inputs.append(d)
        in_specs.append(
            pl.BlockSpec((TILE_ROWS, d.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
    ws, bs = _flatten_params(params, config, cd)
    for t in (*ws, *bs):
        inputs.append(t)
        in_specs.append(
            pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    grid = x.shape[0] // TILE_ROWS
    out = pl.pallas_call(
        _make_forward(config, cd, len(ws), len(bs), has_dir),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (TILE_ROWS, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=_mlp_flops(config, x.shape[0]),
            bytes_accessed=x.size * 4 + x.shape[0] * 16,
            transcendentals=0,
        ),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(*inputs)
    return out[:n]


# --------------------------------------------------------------------------- #
# Backward (recompute-in-tile)                                                #
# --------------------------------------------------------------------------- #

def _make_backward(config: MLPConfig, cd, n_w, n_b, has_dir):
    alpha = config.leaky_relu_alpha
    xyz = config.xyz_dim
    dotT = functools.partial(  # g @ W^T : contract last dims
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dotA = functools.partial(  # a^T @ g : contract rows -> weight grad
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    def kernel(*refs):
        x_ref = refs[0]
        d_ref = refs[1] if has_dir else None
        w_refs = refs[1 + has_dir : 1 + has_dir + n_w]
        b_refs = refs[1 + has_dir + n_w : 1 + has_dir + n_w + n_b]
        g_ref = refs[1 + has_dir + n_w + n_b]
        # outputs: dx, (dd), dws..., dbs...
        outs = refs[2 + has_dir + n_w + n_b :]
        dx_ref = outs[0]
        dd_ref = outs[1] if has_dir else None
        dw_refs = outs[1 + has_dir : 1 + has_dir + n_w]
        db_refs = outs[1 + has_dir + n_w :]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in (*dw_refs, *db_refs):
                r[:] = jnp.zeros_like(r)

        x = x_ref[:].astype(cd)
        d = d_ref[:].astype(cd) if has_dir else None
        ws = [w[:] for w in w_refs]
        bs = [b[:] for b in b_refs]
        g = g_ref[:]  # (tile, 4) f32
        g_x, g_d = _backward_tile(config, cd, x, d, g, ws, bs, dw_refs, db_refs)
        dx_ref[:] = g_x
        if has_dir:
            dd_ref[:] = g_d

    return kernel


def _backward_tile(config: MLPConfig, cd, x, d, g, ws, bs, dw_refs, db_refs,
                   acts=None):
    """Shared backward body: recompute the forward in-tile, accumulate weight
    and bias grads into the VMEM-resident refs, and return the input
    cotangents ``(g_x, g_d)`` as values (``g_d`` is None for xyz-only nets).

    :param acts: optionally the forward activations already computed this
        tile (the compositing-fused backward needs the forward ``out`` too,
        so it runs :func:`_forward_tile` itself and passes ``acts`` in).
    """
    alpha = config.leaky_relu_alpha
    xyz = config.xyz_dim
    has_dir = config.uses_view_dirs
    n_w = len(ws)
    dotT = functools.partial(  # g @ W^T : contract last dims
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dotA = functools.partial(  # a^T @ g : contract rows -> weight grad
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    if acts is None:
        _, acts = _forward_tile(config, cd, x, d, ws, bs)
    grgb = g[:, 0:3]
    gsig = g[:, 3:4]

    h8 = acts[N_TRUNK_LAYERS - 1]
    b = N_TRUNK_LAYERS
    g_d = None
    if has_dir:
        rgb_h = acts[-1]
        wi = n_w - 5  # wrh_h, wrh_d, wro, wsig_h, wsig_d
        # rgb_out
        dw_refs[wi + 2][:] += dotA(rgb_h, grgb)
        db_refs[b + 1][:] += jnp.sum(grgb, axis=0, keepdims=True)
        g_rgb_h = _leaky_bwd(rgb_h, dotT(grgb, ws[wi + 2]).astype(cd), alpha)
        # rgb_hidden (split over [h8, d])
        dw_refs[wi][:] += dotA(h8, g_rgb_h)
        dw_refs[wi + 1][:] += dotA(d, g_rgb_h)
        db_refs[b][:] += jnp.sum(g_rgb_h, axis=0, keepdims=True).astype(jnp.float32)
        # sigma_out (split over [h8, d])
        dw_refs[wi + 3][:] += dotA(h8, gsig)
        dw_refs[wi + 4][:] += dotA(d, gsig)
        db_refs[b + 2][:] += jnp.sum(gsig, axis=0, keepdims=True)
        g_h = dotT(g_rgb_h, ws[wi]) + dotT(gsig.astype(cd), ws[wi + 3])
        g_d = dotT(g_rgb_h, ws[wi + 1]) + dotT(gsig.astype(cd), ws[wi + 4])
    else:
        r0, rgb_h = acts[-2], acts[-1]
        wi = n_w - 4  # wrh0, wrh, wro, wsig
        dw_refs[wi + 2][:] += dotA(rgb_h, grgb)
        db_refs[b + 2][:] += jnp.sum(grgb, axis=0, keepdims=True)
        g_rgb_h = _leaky_bwd(rgb_h, dotT(grgb, ws[wi + 2]).astype(cd), alpha)
        dw_refs[wi + 1][:] += dotA(r0, g_rgb_h)
        db_refs[b + 1][:] += jnp.sum(g_rgb_h, axis=0, keepdims=True).astype(jnp.float32)
        g_r0 = _leaky_bwd(r0, dotT(g_rgb_h, ws[wi + 1]).astype(cd), alpha)
        dw_refs[wi][:] += dotA(h8, g_r0)
        db_refs[b][:] += jnp.sum(g_r0, axis=0, keepdims=True).astype(jnp.float32)
        dw_refs[wi + 3][:] += dotA(h8, gsig)
        db_refs[b + 3][:] += jnp.sum(gsig, axis=0, keepdims=True)
        g_h = dotT(g_r0, ws[wi]) + dotT(gsig.astype(cd), ws[wi + 3])

    # Trunk, reversed. Weight index of trunk layer l start:
    #   l < SKIP_AFTER: wi = l ; l == SKIP_AFTER: (wi, wi+1) ; l > : l + 1
    g_x = jnp.zeros((x.shape[0], xyz), jnp.float32)
    for layer in reversed(range(N_TRUNK_LAYERS)):
        post = acts[layer]
        g_pre = _leaky_bwd(post, g_h, alpha).astype(cd)
        prev = acts[layer - 1] if layer > 0 else x
        if layer == SKIP_AFTER:
            dw_refs[layer][:] += dotA(x, g_pre)
            dw_refs[layer + 1][:] += dotA(prev, g_pre)
            db_refs[layer][:] += jnp.sum(g_pre, axis=0, keepdims=True).astype(jnp.float32)
            g_x += dotT(g_pre, ws[layer])
            g_h = dotT(g_pre, ws[layer + 1])
        else:
            widx = layer if layer < SKIP_AFTER else layer + 1
            dw_refs[widx][:] += dotA(prev, g_pre)
            db_refs[layer][:] += jnp.sum(g_pre, axis=0, keepdims=True).astype(jnp.float32)
            g_h = dotT(g_pre, ws[widx])
    return g_x + g_h, g_d  # layer-0 contribution arrives via g_h


def _backward_pallas(params, config: MLPConfig, enc_xyz, enc_dir, cd, g):
    n = enc_xyz.shape[0]
    has_dir = config.uses_view_dirs
    x = _pad_rows(enc_xyz.astype(_input_dtype(cd)), TILE_ROWS_BWD)
    g = _pad_rows(g.astype(jnp.float32), TILE_ROWS_BWD)
    inputs = [x]
    row_spec = lambda width: pl.BlockSpec(
        (TILE_ROWS_BWD, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [row_spec(x.shape[1])]
    if has_dir:
        d = _pad_rows(enc_dir.astype(_input_dtype(cd)), TILE_ROWS_BWD)
        inputs.append(d)
        in_specs.append(row_spec(d.shape[1]))
    ws, bs = _flatten_params(params, config, cd)
    for t in (*ws, *bs):
        inputs.append(t)
        in_specs.append(pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    inputs.append(g)
    in_specs.append(row_spec(4))

    out_shapes = [jax.ShapeDtypeStruct(x.shape, jnp.float32)]
    out_specs = [row_spec(x.shape[1])]
    if has_dir:
        out_shapes.append(jax.ShapeDtypeStruct(d.shape, jnp.float32))
        out_specs.append(row_spec(d.shape[1]))
    for t in (*ws, *bs):
        out_shapes.append(jax.ShapeDtypeStruct(t.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))

    grid = x.shape[0] // TILE_ROWS_BWD
    outs = pl.pallas_call(
        _make_backward(config, cd, len(ws), len(bs), has_dir),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=3 * _mlp_flops(config, x.shape[0]),
            bytes_accessed=2 * x.size * 4,
            transcendentals=0,
        ),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(*inputs)

    dx = outs[0][:n]
    idx = 1
    dd = None
    if has_dir:
        dd = outs[1][:n]
        idx = 2
    dws = outs[idx : idx + len(ws)]
    dbs = outs[idx + len(ws) :]
    dparams = _unflatten_grads(dws, dbs, params, config)
    return dparams, dx, dd


# --------------------------------------------------------------------------- #
# custom_vjp wrapper — drop-in for models.mlp.apply_mlp                       #
# --------------------------------------------------------------------------- #

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def _fused_mlp(params, config: MLPConfig, enc_xyz, enc_dir, cd):
    return _forward_pallas(params, config, enc_xyz, enc_dir, cd)


def _fused_fwd(params, config, enc_xyz, enc_dir, cd):
    out = _forward_pallas(params, config, enc_xyz, enc_dir, cd)
    return out, (params, enc_xyz, enc_dir)


def _fused_bwd(config, cd, res, g):
    params, enc_xyz, enc_dir = res
    dparams, dx, dd = _backward_pallas(params, config, enc_xyz, enc_dir, cd, g)
    # Match the params pytree: cast each grad leaf to its primal leaf's dtype.
    dparams = jax.tree.map(lambda p, dp: dp.astype(p.dtype), params, dparams)
    return dparams, dx, dd


_fused_mlp.defvjp(_fused_fwd, _fused_bwd)


def apply_mlp_fused(
    params: Params,
    config: MLPConfig,
    enc_xyz: jnp.ndarray,
    enc_dir: jnp.ndarray | None = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fused-kernel drop-in for :func:`models.mlp.apply_mlp` (same contract:
    pre-encoded inputs in, ``(n, 4)`` float32 raw radiance out)."""
    if config.uses_view_dirs and enc_dir is None:
        raise ValueError("this MLP config requires encoded view directions")
    if not config.uses_view_dirs:
        enc_dir = None
    return _fused_mlp(params, config, enc_xyz, enc_dir, compute_dtype)


# --------------------------------------------------------------------------- #
# shard_map wrapper — mesh-parallel fused kernel                              #
#                                                                             #
# pallas_call has no GSPMD partitioning rule, so under a sharded jit the      #
# plain kernel would force an all-gather of the row batch onto every chip.    #
# Here the kernel is shard_mapped over the mesh's data axis: rows split       #
# across chips, weights replicated, and the backward psums the weight/bias    #
# cotangents over ICI explicitly (the transpose of replication).             #
# --------------------------------------------------------------------------- #


def _row_shard(n_rows: int, mesh, axis: str) -> int:
    n_dev = mesh.shape[axis]
    if n_rows % n_dev:
        raise ValueError(
            f"row count {n_rows} not divisible by mesh axis {axis!r} ({n_dev})"
        )
    return n_dev


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6))
def _fused_mlp_sharded(params, config: MLPConfig, enc_xyz, enc_dir, cd, mesh, axis):
    return _sharded_forward(params, config, enc_xyz, enc_dir, cd, mesh, axis)


def _sharded_forward(params, config, enc_xyz, enc_dir, cd, mesh, axis):
    from jax.sharding import PartitionSpec as P

    _row_shard(enc_xyz.shape[0], mesh, axis)
    has_dir = enc_dir is not None
    row = P(axis)
    f = jax.shard_map(
        lambda p, x, d: _forward_pallas(p, config, x, d if has_dir else None, cd),
        mesh=mesh,
        in_specs=(P(), row, row if has_dir else P()),
        out_specs=row,
        check_vma=False,
    )
    return f(params, enc_xyz, enc_dir if has_dir else jnp.zeros((), jnp.float32))


def _sharded_fwd(params, config, enc_xyz, enc_dir, cd, mesh, axis):
    out = _sharded_forward(params, config, enc_xyz, enc_dir, cd, mesh, axis)
    return out, (params, enc_xyz, enc_dir)


def _sharded_bwd(config, cd, mesh, axis, res, g):
    from jax.sharding import PartitionSpec as P

    params, enc_xyz, enc_dir = res
    has_dir = enc_dir is not None
    row = P(axis)

    def body(p, x, d, gg):
        dparams, dx, dd = _backward_pallas(p, config, x, d if has_dir else None, cd, gg)
        # Weight/bias cotangents: every shard holds a partial sum over its
        # rows — reduce over the data axis (ICI all-reduce).
        dparams = jax.lax.psum(dparams, axis)
        return dparams, dx, (dd if has_dir else jnp.zeros((), jnp.float32))

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), row, row if has_dir else P(), row),
        out_specs=(P(), row, row if has_dir else P()),
        check_vma=False,
    )
    dparams, dx, dd = f(
        params, enc_xyz, enc_dir if has_dir else jnp.zeros((), jnp.float32), g
    )
    dparams = jax.tree.map(lambda p, dp: dp.astype(p.dtype), params, dparams)
    return dparams, dx, (dd if has_dir else None)


_fused_mlp_sharded.defvjp(_sharded_fwd, _sharded_bwd)


def apply_mlp_fused_sharded(
    params: Params,
    config: MLPConfig,
    enc_xyz: jnp.ndarray,
    enc_dir: jnp.ndarray | None = None,
    compute_dtype=jnp.bfloat16,
    *,
    mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """Mesh-parallel :func:`apply_mlp_fused`: rows sharded over ``axis``,
    params replicated, weight-grad psum over ICI in the backward."""
    if config.uses_view_dirs and enc_dir is None:
        raise ValueError("this MLP config requires encoded view directions")
    if not config.uses_view_dirs:
        enc_dir = None
    return _fused_mlp_sharded(params, config, enc_xyz, enc_dir, compute_dtype, mesh, axis)


