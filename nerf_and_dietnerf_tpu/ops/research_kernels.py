"""Research kernels: measured-slower fused variants, quarantined from production.

Three kernel families live here, all OFF by default and selectable only via
explicit config flags. Each was built to test a traffic/fusion hypothesis on
the v5e, measured end-to-end against the production path, and LOST; the
numbers and the why are recorded in ``benchmarks/ROOFLINE.md`` (negative
results). They are kept — tested, chip-benchmarked, grad-parity-proven — as
the evidence base for those conclusions and as starting points if the
hardware balance changes (e.g. a future chip where HBM bandwidth, not VPU
lane occupancy, binds this model), but the production kernel module
(``raymarch_pallas.py``) stays readable without them.

- ``backend="pallas_rm"`` (``apply_raymarch_fused[_sharded]``): point-gen +
  positional encoding in-kernel from per-ray data. Saves ~800 MB/step of
  HBM traffic but pays VPU time on 128-lane-padded row tiles — slower than
  XLA's packed encoding (tools/exp_enc2.py decomposition).
- ``fuse_compositing=True`` (``apply_raymarch_composited[_sharded]``,
  ``apply_mlp_composited[_sharded]``): alpha-compositing inside the kernel;
  the row<->(rays, samples) layout conversions cost more than the XLA
  composite they replace (38.7 vs 28.4 ms/step at flagship shape).
- ``fuse_fine_loss=True`` (``apply_mlp_loss_composited``): forward + MSE +
  full backward in ONE kernel with VMEM-resident activations (no recompute).

Shared low-level helpers (tiling, param flattening, leaky-relu, interpret
gating) are imported from the production module.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from nerf_and_dietnerf_tpu.core.rendering import TERMINAL_DELTA
from nerf_and_dietnerf_tpu.models.mlp import (
    MLPConfig,
    N_TRUNK_LAYERS,
    SKIP_AFTER,
)
from nerf_and_dietnerf_tpu.ops.raymarch_pallas import (
    TILE_ROWS,
    TILE_ROWS_BWD,
    VMEM_LIMIT_BYTES,
    Params,
    _backward_tile,
    _compiler_params,
    _flatten_params,
    _forward_tile,
    _input_dtype,
    _interpret,
    _leaky,
    _leaky_bwd,
    _mlp_flops,
    _pad_rows,
    _row_shard,
    _unflatten_grads,
)

# --------------------------------------------------------------------------- #
# Fully fused ray-march kernel: point-gen + positional encoding in-kernel     #
#                                                                             #
# The enc-input kernels above still stream (N, 33) + (N, 24) encodings from  #
# HBM — which lane-pad to 128, costing ~805 MB per flagship step — and leave  #
# the encoding (and its VJP) to XLA. Here the kernel instead takes per-RAY    #
# data (origin, direction, view components: (R, 9)) plus the (R, S) z table  #
# (~4 MB/step total) and builds points and both encodings in VMEM.           #
#                                                                             #
# Row expansion (the hard part on TPU — no gathers, no generic reshapes in    #
# Mosaic) uses a SAMPLE-MAJOR row layout within each ray tile                 #
# (row = s * R_t + r), because then every expansion is cheap and exact:       #
#                                                                             #
# - per-ray attrs: ``pltpu.repeat(rd, S, axis=0)`` (= jnp.tile): row picks    #
#   ray ``row % R_t``  — exact f32, no matmul;                                #
# - per-sample z:  ``repeat(z, S, axis=0) * F2`` + lane-reduce, where F2 is   #
#   the constant one-hot ``F2[row, s] = (row // R_t == s)`` — exact f32.      #
#                                                                             #
# (A first version expanded rows with one-hot matmuls at HIGHEST precision —  #
# measured 2x slower than the enc-input kernel: every small matmul costs a    #
# full 128-lane MXU pass x6 for HIGHEST. This version has NO expansion        #
# matmuls at all.)                                                            #
#                                                                             #
# The encoding itself is VPU-only: theta columns are just ``f_k * coord``,    #
# built with per-channel broadcast-FMAs against constant frequency masks      #
# (cos columns get a pi/2 phase offset so ONE sin pass produces everything,   #
# and the backward's d(sin)/d(cos) is uniformly ``cos(theta)``). The          #
# reference's coordinate-major feature interleave (core/encoding.py) is NOT   #
# materialized in-kernel: the kernel uses its own [identity | sin | cos]      #
# block order and the first-layer / view-branch weight ROWS are permuted to   #
# match on the host (exact, free) — see ``_enc_layout`` / ``_flatten_params_rays``.
# --------------------------------------------------------------------------- #

RAY_TILE_TARGET_ROWS = 4096

# Mosaic supports only DEFAULT (1-pass bf16, lossy) and HIGHEST (6-pass f32)
# matmul precision; the dz scatter-back matmul keeps f32 gradient accuracy.
_HI = jax.lax.Precision.HIGHEST


def _ray_tile(S: int) -> int:
    """Rays per grid step: multiple of 8 (f32 sublane), rows ~= target."""
    return 8 * max(1, RAY_TILE_TARGET_ROWS // (8 * S))


def _enc_layout(config: MLPConfig):
    """Kernel-internal encoding layout + the weight-row permutation onto it.

    Theta columns (``T = 2 * (nx + nd)`` of them, all produced by one sin):
    ``[xyz-sin (nx) | xyz-cos (nx) | dir-sin (nd) | dir-cos (nd)]`` with
    ``nx = 3 * L_xyz`` (c-major: col c*L+k) and ``nd = D * L_dir``.

    Kernel enc feature order: ``[x, y, z | theta-sin-x | theta-cos-x]`` and
    ``encd = [theta-sin-dir | theta-cos-dir]``; ``perm_xyz`` / ``perm_dir``
    map kernel feature j -> the reference's coordinate-major column
    (``core/encoding.py``), i.e. ``W_kernel = W_ref[perm]``.
    """
    import math

    import numpy as np

    L = config.n_freq_xyz
    has_dir = config.uses_view_dirs
    Ld = config.n_freq_dir if has_dir else 0
    D = (config.n_angles + 1) if has_dir else 0
    nx = 3 * L
    nd = D * Ld
    T = 2 * (nx + nd)

    masks = np.zeros((3 + D, max(T, 1)), np.float32)
    offs = np.zeros((1, max(T, 1)), np.float32)
    for c in range(3):
        for k in range(L):
            f = math.pi * (2.0 ** k)
            masks[c, c * L + k] = f
            masks[c, nx + c * L + k] = f
            offs[0, nx + c * L + k] = math.pi / 2.0
    for c in range(D):
        for k in range(Ld):
            f = math.pi * (2.0 ** k)
            masks[3 + c, 2 * nx + c * Ld + k] = f
            masks[3 + c, 2 * nx + nd + c * Ld + k] = f
            offs[0, 2 * nx + nd + c * Ld + k] = math.pi / 2.0

    # Kernel xyz feature j -> reference column (identity at c*(1+2L), then
    # sin/cos interleaved per octave).
    perm_xyz = np.zeros((3 + 2 * nx,), np.int64)
    for j in range(3):
        perm_xyz[j] = j * (1 + 2 * L)
    for c in range(3):
        for k in range(L):
            perm_xyz[3 + c * L + k] = c * (1 + 2 * L) + 1 + 2 * k
            perm_xyz[3 + nx + c * L + k] = c * (1 + 2 * L) + 2 + 2 * k

    perm_dir = np.zeros((2 * nd,), np.int64)
    for c in range(D):
        for k in range(Ld):
            perm_dir[c * Ld + k] = c * 2 * Ld + 2 * k
            perm_dir[nd + c * Ld + k] = c * 2 * Ld + 2 * k + 1

    return {
        "masks": masks, "offs": offs, "T": T, "nx": nx, "nd": nd, "D": D,
        "perm_xyz": perm_xyz, "perm_dir": perm_dir,
    }


def _ray_perm_indices(config: MLPConfig):
    """ws-list indices whose kernels have encoding-feature ROWS, with the
    permutation each needs (see ``_flatten_params`` for the list layout)."""
    lay = _enc_layout(config)
    px, pd = lay["perm_xyz"], lay["perm_dir"]
    idx = {0: px, SKIP_AFTER: px}  # w0 and the skip layer's xyz block
    if config.uses_view_dirs:
        n_trunk_ws = N_TRUNK_LAYERS + 1  # skip layer contributes two entries
        idx[n_trunk_ws + 1] = pd  # wrh_d
        idx[n_trunk_ws + 4] = pd  # wsig_d
    return idx


def _flatten_params_rays(params: Params, config: MLPConfig, dtype):
    """``_flatten_params`` + row-permutation of the encoding-input weights
    into the kernel's enc layout (exact — a host-side gather)."""
    ws, bs = _flatten_params(params, config, dtype)
    ws = list(ws)
    for i, perm in _ray_perm_indices(config).items():
        ws[i] = ws[i][perm]
    return ws, bs


def _unflatten_grads_rays(ws_grads, bs_grads, params: Params, config: MLPConfig):
    """Inverse of the row permutation, then the shared unflatten."""
    import numpy as np

    ws_grads = list(ws_grads)
    for i, perm in _ray_perm_indices(config).items():
        ws_grads[i] = ws_grads[i][np.argsort(perm)]
    return _unflatten_grads(ws_grads, bs_grads, params, config)


def _expand_consts(R_t: int, S: int, need_m1: bool):
    """F2[row, s] = (row // R_t == s); M1[row, r] = (row % R_t == r)."""
    import numpy as np

    rows = R_t * S
    r = np.arange(rows)
    F2 = (r[:, None] // R_t == np.arange(S)[None, :]).astype(np.float32)
    M1 = (
        (r[:, None] % R_t == np.arange(R_t)[None, :]).astype(np.float32)
        if need_m1
        else None
    )
    return jnp.asarray(F2), (jnp.asarray(M1) if need_m1 else None)


def _encode_tile(config: MLPConfig, lay, rd, z, F2, masks, offs, S: int):
    """Expand one ray tile to sample-major rows and encode, all in VMEM.

    :param rd: ``(R_t, 6 + D)`` = [origin3 | dir3 | viewcomps] f32.
    :param z: ``(R_t, S)`` f32.
    :param F2: ``(R_t * S, S)`` one-hot sample picker.
    :return: ``(enc, encd | None, dvec, theta | None)`` — theta is reused by
        the backward (d sin = cos(theta), the pi/2 offsets included).
    """
    has_dir = config.uses_view_dirs
    D = lay["D"]
    T, nx = lay["T"], lay["nx"]

    rdr = pltpu.repeat(rd, S, axis=0)           # (rows, 6+D): row -> ray row%R_t
    zr = pltpu.repeat(z, S, axis=0)             # (rows, S)
    z_row = jnp.sum(zr * F2, axis=1, keepdims=True)  # z[row%R_t, row//R_t]
    o = rdr[:, 0:3]
    dvec = rdr[:, 3:6]
    pts = o + z_row * dvec                      # (rows, 3) f32

    if T == 0:
        return pts, None, dvec, None

    theta = jnp.broadcast_to(offs, (pts.shape[0], offs.shape[1]))
    for c in range(3):
        theta = theta + pts[:, c : c + 1] * masks[c : c + 1, :]
    for c in range(D):
        theta = theta + rdr[:, 6 + c : 7 + c] * masks[3 + c : 4 + c, :]
    SC = jnp.sin(theta)                         # ONE transcendental pass

    enc = jnp.concatenate([pts, SC[:, : 2 * nx]], axis=1) if nx else pts
    encd = SC[:, 2 * nx : T] if has_dir else None
    return enc, encd, dvec, theta


def _make_forward_rays(config: MLPConfig, cd, n_w, n_b, S, lay):
    T = lay["T"]

    def kernel(*refs):
        rd_ref, z_ref, f2_ref = refs[0], refs[1], refs[2]
        w_refs = refs[3 : 3 + n_w]
        b_refs = refs[3 + n_w : 3 + n_w + n_b]
        masks = refs[3 + n_w + n_b][:] if T else None
        offs = refs[4 + n_w + n_b][:] if T else None
        out_ref = refs[-1]

        enc, encd, _, _ = _encode_tile(
            config, lay, rd_ref[:], z_ref[:], f2_ref[:], masks, offs, S
        )
        ws = [w[:] for w in w_refs]
        bs = [b[:] for b in b_refs]
        out, _ = _forward_tile(
            config, cd, enc.astype(cd),
            encd.astype(cd) if encd is not None else None, ws, bs,
        )
        out_ref[:] = out

    return kernel


def _make_backward_rays(config: MLPConfig, cd, n_w, n_b, S, lay):
    has_dir = config.uses_view_dirs
    T, nx = lay["T"], lay["nx"]
    dotM = functools.partial(  # M1^T @ x : contract rows, one-hot scatter-back
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=_HI,
        preferred_element_type=jnp.float32,
    )

    def kernel(*refs):
        rd_ref, z_ref, f2_ref, m1_ref = refs[0], refs[1], refs[2], refs[3]
        w_refs = refs[4 : 4 + n_w]
        b_refs = refs[4 + n_w : 4 + n_w + n_b]
        k = 4 + n_w + n_b
        masks = refs[k][:] if T else None
        offs = refs[k + 1][:] if T else None
        g_ref = refs[k + (2 if T else 0)]
        outs = refs[k + (3 if T else 1) :]
        dz_ref = outs[0]
        dw_refs = outs[1 : 1 + n_w]
        db_refs = outs[1 + n_w :]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in (*dw_refs, *db_refs):
                r[:] = jnp.zeros_like(r)

        F2 = f2_ref[:]
        enc, encd, dvec, theta = _encode_tile(
            config, lay, rd_ref[:], z_ref[:], F2, masks, offs, S
        )
        ws = [w[:] for w in w_refs]
        bs = [b[:] for b in b_refs]
        g_x, g_d = _backward_tile(
            config, cd, enc.astype(cd),
            encd.astype(cd) if encd is not None else None,
            g_ref[:], ws, bs, dw_refs, db_refs,
        )

        # Encoding VJP down to dz (the only live input cotangent — it feeds
        # the fine-sampling CDF). theta already embeds the pi/2 offsets, so
        # d(all sin/cos columns)/d(theta) is uniformly cos(theta).
        if T:
            if nx and has_dir:
                dSC = jnp.concatenate([g_x[:, 3:], g_d], axis=1)
            elif nx:
                dSC = g_x[:, 3:]
            else:
                dSC = g_d
            dtheta = dSC * jnp.cos(theta)
            dpts = [
                jnp.sum(dtheta * masks[c : c + 1, :], axis=1, keepdims=True)
                + g_x[:, c : c + 1]
                for c in range(3)
            ]
        else:
            dpts = [g_x[:, c : c + 1] for c in range(3)]
        dz_row = sum(dpts[c] * dvec[:, c : c + 1] for c in range(3))  # (rows, 1)
        dz_ref[:] = dotM(m1_ref[:], dz_row * F2)  # (R_t, S): row s*R_t+r -> (r, s)

    return kernel


def _pack_ray_data(config: MLPConfig, orig3, dirs3, viewcomps, z, R_t: int):
    parts = [orig3, dirs3]
    if config.uses_view_dirs:
        parts.append(viewcomps)
    rd = jnp.concatenate([p.astype(jnp.float32) for p in parts], axis=1)
    return _pad_rows(rd, R_t), _pad_rows(z.astype(jnp.float32), R_t)


def _untile_rows(out, R_p: int, R_t: int, S: int):
    """Kernel output (tile-then-sample-major rows, 4) -> ray-major (R_p, S, 4)."""
    n_tiles = R_p // R_t
    return out.reshape(n_tiles, S, R_t, 4).swapaxes(1, 2).reshape(R_p, S, 4)


def _tile_rows(g, R_p: int, R_t: int, S: int):
    """Ray-major cotangent (R_p, S, 4) -> the kernel's tiled row layout."""
    n_tiles = R_p // R_t
    return g.reshape(n_tiles, R_t, S, 4).swapaxes(1, 2).reshape(R_p * S, 4)


def _raymarch_flops(config: MLPConfig, n_rows: int) -> int:
    # MLP flops dominate; add the theta/encode VPU work for the scheduler.
    lay = _enc_layout(config)
    return _mlp_flops(config, n_rows) + 2 * n_rows * 6 * max(lay["T"], 1)


def _const_spec(t):
    return pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _forward_rays_pallas(params, config: MLPConfig, rd, z, S: int, R_t: int, cd):
    R_p = rd.shape[0]
    rows = R_t * S
    lay = _enc_layout(config)
    F2, _ = _expand_consts(R_t, S, need_m1=False)
    ws, bs = _flatten_params_rays(params, config, cd)

    inputs = [rd, z, F2, *ws, *bs]
    in_specs = [
        pl.BlockSpec((R_t, rd.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R_t, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _const_spec(F2),
        *[_const_spec(t) for t in (*ws, *bs)],
    ]
    if lay["T"]:
        masks, offs = jnp.asarray(lay["masks"]), jnp.asarray(lay["offs"])
        inputs += [masks, offs]
        in_specs += [_const_spec(masks), _const_spec(offs)]

    grid = R_p // R_t
    out = pl.pallas_call(
        _make_forward_rays(config, cd, len(ws), len(bs), S, lay),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_p * S, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=_raymarch_flops(config, R_p * S),
            bytes_accessed=(rd.size + z.size) * 4 + R_p * S * 16,
            transcendentals=R_p * S * lay["T"],
        ),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(*inputs)
    return _untile_rows(out, R_p, R_t, S)  # (R_p, S, 4)


def _backward_rays_pallas(params, config: MLPConfig, rd, z, S, R_t, cd, g):
    """:param g: ray-major cotangent ``(R_p, S, 4)`` f32."""
    R_p = rd.shape[0]
    rows = R_t * S
    lay = _enc_layout(config)
    F2, M1 = _expand_consts(R_t, S, need_m1=True)
    ws, bs = _flatten_params_rays(params, config, cd)

    inputs = [rd, z, F2, M1, *ws, *bs]
    in_specs = [
        pl.BlockSpec((R_t, rd.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R_t, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _const_spec(F2),
        _const_spec(M1),
        *[_const_spec(t) for t in (*ws, *bs)],
    ]
    if lay["T"]:
        masks, offs = jnp.asarray(lay["masks"]), jnp.asarray(lay["offs"])
        inputs += [masks, offs]
        in_specs += [_const_spec(masks), _const_spec(offs)]
    inputs.append(_tile_rows(g, R_p, R_t, S))
    in_specs.append(pl.BlockSpec((rows, 4), lambda i: (i, 0), memory_space=pltpu.VMEM))

    out_shapes = [jax.ShapeDtypeStruct((R_p, S), jnp.float32)]
    out_specs = [pl.BlockSpec((R_t, S), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    for t in (*ws, *bs):
        out_shapes.append(jax.ShapeDtypeStruct(t.shape, jnp.float32))
        out_specs.append(_const_spec(t))

    grid = R_p // R_t
    outs = pl.pallas_call(
        _make_backward_rays(config, cd, len(ws), len(bs), S, lay),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=3 * _raymarch_flops(config, R_p * S),
            bytes_accessed=2 * (rd.size + z.size) * 4 + R_p * S * 16,
            transcendentals=2 * R_p * S * lay["T"],
        ),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(*inputs)
    dz = outs[0]
    dws = outs[1 : 1 + len(ws)]
    dbs = outs[1 + len(ws) :]
    return dz, _unflatten_grads_rays(dws, dbs, params, config)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 6))
def _fused_raymarch(params, config: MLPConfig, orig3, dirs3, viewcomps, z, cd):
    # z: (n_rays, S). Returns raw (n_rays, S, 4) float32.
    return _fused_raymarch_fwd(params, config, orig3, dirs3, viewcomps, z, cd)[0]


def _fused_raymarch_fwd(params, config, orig3, dirs3, viewcomps, z, cd):
    n_rays, S = z.shape
    R_t = _ray_tile(S)
    rd, z_p = _pack_ray_data(config, orig3, dirs3, viewcomps, z, R_t)
    out = _forward_rays_pallas(params, config, rd, z_p, S, R_t, cd)
    return out[:n_rays], (params, rd, z_p, (n_rays, S, R_t))


def _fused_raymarch_bwd(config, cd, res, g):
    params, rd, z_p, (n_rays, S, R_t) = res
    R_p = rd.shape[0]
    g_full = jnp.zeros((R_p, S, 4), jnp.float32)
    g_full = g_full.at[:n_rays].set(g.astype(jnp.float32))
    dz, dparams = _backward_rays_pallas(params, config, rd, z_p, S, R_t, cd, g_full)
    dparams = jax.tree.map(lambda p, dp: dp.astype(p.dtype), params, dparams)
    dz = dz[:n_rays]
    zeros3 = jnp.zeros((n_rays, 3), jnp.float32)
    dvc = (
        jnp.zeros((n_rays, config.n_angles + 1), jnp.float32)
        if config.uses_view_dirs
        else None
    )
    return dparams, zeros3, zeros3, dvc, dz


_fused_raymarch.defvjp(
    lambda params, config, orig3, dirs3, viewcomps, z, cd: _fused_raymarch_fwd(
        params, config, orig3, dirs3, viewcomps, z, cd
    ),
    _fused_raymarch_bwd,
)


def apply_raymarch_fused(
    params: Params,
    config: MLPConfig,
    rays_orig: jnp.ndarray,
    rays_dirs: jnp.ndarray,
    viewcomps: jnp.ndarray | None,
    z_values: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fully fused ray-march MLP evaluation.

    :param rays_orig: ``(n_rays, >=3)`` ray origins (homogeneous ok).
    :param rays_dirs: ``(n_rays, >=3)`` unnormalized ray directions.
    :param viewcomps: ``(n_rays, n_angles + 1)`` view-direction components
        (``core/cameras.view_direction_components``), or None for xyz-only.
    :param z_values: ``(n_rays, S)``.
    :return: raw radiance ``(n_rays, S, 4)`` float32.

    Differentiable w.r.t. ``params`` and ``z_values`` (the live paths);
    origin/direction/viewcomp cotangents are structurally zero.
    """
    if config.uses_view_dirs and viewcomps is None:
        raise ValueError("this MLP config requires view-direction components")
    return _fused_raymarch(
        params, config,
        rays_orig[:, :3], rays_dirs[:, :3],
        viewcomps if config.uses_view_dirs else None,
        z_values.astype(jnp.float32), compute_dtype,
    )


# --------------------------------------------------------------------------- #
# shard_map wrapper for the fused ray-march kernel (mesh runs)                #
# --------------------------------------------------------------------------- #


def _raymarch_fwd_shard(params, config: MLPConfig, orig3, dirs3, vc, z, cd):
    n_rays, S = z.shape
    R_t = _ray_tile(S)
    rd, z_p = _pack_ray_data(config, orig3, dirs3, vc, z, R_t)
    return _forward_rays_pallas(params, config, rd, z_p, S, R_t, cd)[:n_rays]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 6, 7, 8))
def _fused_raymarch_sharded(params, config: MLPConfig, orig3, dirs3, vc, z, cd, mesh, axis):
    return _sharded_raymarch_forward(params, config, orig3, dirs3, vc, z, cd, mesh, axis)


def _sharded_raymarch_forward(params, config, orig3, dirs3, vc, z, cd, mesh, axis):
    from jax.sharding import PartitionSpec as P

    _row_shard(z.shape[0], mesh, axis)
    has_dir = config.uses_view_dirs
    row = P(axis)
    f = jax.shard_map(
        lambda p, o, d, v, zz: _raymarch_fwd_shard(
            p, config, o, d, v if has_dir else None, zz, cd
        ),
        mesh=mesh,
        in_specs=(P(), row, row, row if has_dir else P(), row),
        out_specs=row,
        check_vma=False,
    )
    return f(params, orig3, dirs3, vc if has_dir else jnp.zeros((), jnp.float32), z)


def _sharded_raymarch_fwd(params, config, orig3, dirs3, vc, z, cd, mesh, axis):
    out = _sharded_raymarch_forward(params, config, orig3, dirs3, vc, z, cd, mesh, axis)
    return out, (params, orig3, dirs3, vc, z)


def _sharded_raymarch_bwd(config, cd, mesh, axis, res, g):
    from jax.sharding import PartitionSpec as P

    params, orig3, dirs3, vc, z = res
    has_dir = config.uses_view_dirs
    row = P(axis)

    def body(p, o, d, v, zz, gg):
        n_rays, S = zz.shape
        R_t = _ray_tile(S)
        rd, z_p = _pack_ray_data(config, o, d, v if has_dir else None, zz, R_t)
        g_full = jnp.zeros((rd.shape[0], S, 4), jnp.float32)
        g_full = g_full.at[:n_rays].set(gg.astype(jnp.float32))
        dz, dparams = _backward_rays_pallas(p, config, rd, z_p, S, R_t, cd, g_full)
        dparams = jax.lax.psum(dparams, axis)
        return dparams, dz[:n_rays]

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), row, row, row if has_dir else P(), row, row),
        out_specs=(P(), row),
        check_vma=False,
    )
    dparams, dz = f(
        params, orig3, dirs3, vc if has_dir else jnp.zeros((), jnp.float32), z, g
    )
    dparams = jax.tree.map(lambda p, dp: dp.astype(p.dtype), params, dparams)
    zeros3 = jnp.zeros_like(orig3)
    dvc = jnp.zeros_like(vc) if has_dir else None
    return dparams, zeros3, jnp.zeros_like(dirs3), dvc, dz


_fused_raymarch_sharded.defvjp(_sharded_raymarch_fwd, _sharded_raymarch_bwd)


def apply_raymarch_fused_sharded(
    params: Params,
    config: MLPConfig,
    rays_orig: jnp.ndarray,
    rays_dirs: jnp.ndarray,
    viewcomps: jnp.ndarray | None,
    z_values: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    *,
    mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """Mesh-parallel :func:`apply_raymarch_fused`: rays sharded over ``axis``,
    params replicated, weight-grad psum over ICI in the backward."""
    if config.uses_view_dirs and viewcomps is None:
        raise ValueError("this MLP config requires view-direction components")
    return _fused_raymarch_sharded(
        params, config,
        rays_orig[:, :3], rays_dirs[:, :3],
        viewcomps if config.uses_view_dirs else None,
        z_values.astype(jnp.float32), compute_dtype, mesh, axis,
    )


# --------------------------------------------------------------------------- #
# Fused ray-march + ALPHA-COMPOSITING kernel (the train fast path)            #
#                                                                             #
# The rays kernel above still writes the raw (rays * S, 4) radiance to HBM    #
# and leaves alpha-compositing (core/rendering.composite, reference           #
# src/UtilsNeuralRadianceField.py:88-115) plus its VJP to XLA — a full f32    #
# round-trip of the largest tensor in the step and the cumprod scan's VJP     #
# in glue. Here compositing runs INSIDE the kernel on the sample-major rows:  #
# outputs shrink to per-ray (R, 3) pixels + (R, S) weights (what the train    #
# objective and the hierarchical resampler actually consume).                 #
#                                                                             #
# Cross-sample ops in the sample-major row layout:                            #
# - rows -> (R_t, S) "2D" form: one-hot scatter matmul dotM(M1, x_row * F2)   #
#   at HIGHEST precision (exact: each output element is a sum with exactly    #
#   one nonzero term);                                                        #
# - (R_t, S) -> rows: pltpu.repeat + F2 lane-reduce (exact, no matmul);       #
# - the exclusive transmittance cumprod runs along LANES with a log-step      #
#   shift-multiply (Hillis-Steele) scan;                                      #
# - its backward is the affine reverse recurrence                             #
#       dT_s = gW_s * a_s + dT_{s+1} * (1 - a_s);   da_s = (gW_s - dT_{s+1}) * T_s #
#   evaluated as an unrolled lane-slice loop — division-free, so rays whose   #
#   transmittance underflows to exactly 0 (opaque scenes) stay NaN-free       #
#   (the closed form divides by T_s).                                         #
# --------------------------------------------------------------------------- #

_dotM = functools.partial(  # M1^T @ x : one-hot scatter rows -> (R_t, ...)
    jax.lax.dot_general,
    dimension_numbers=(((0,), (0,)), ((), ())),
    precision=_HI,
    preferred_element_type=jnp.float32,
)


def _shift_right_lanes(x, k, fill):
    """``out[:, j] = x[:, j-k]`` for ``j >= k``, else ``fill`` — one
    tpu.rotate + iota select. Mosaic rejects some pad-and-concat lane shifts
    ("result/input offset mismatch on non-concat dimension"), and a rotate
    avoids the relayout entirely."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= k, pltpu.roll(x, k, axis=1), fill)


def _shift_left_lanes(x, k, fill):
    """``out[:, j] = x[:, j+k]`` for ``j < S-k``, else ``fill``."""
    S = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < S - k, pltpu.roll(x, S - k, axis=1), fill)


def _exclusive_cumprod_lanes(v):
    """Exclusive prefix product along the lane axis: ``[1, v0, v0*v1, ...]``.

    Log-step shift-multiply scan (S is static); multiplication reassociation
    vs a serial cumprod is exact for the common all-{0,1} tails and within
    float rounding otherwise.
    """
    R, S = v.shape
    x = _shift_right_lanes(v, 1, 1.0)
    k = 1
    while k < S:
        x = x * _shift_right_lanes(x, k, 1.0)
        k *= 2
    return x


def _suffix_affine_scan(M, U):
    """Log-step suffix scan of the affine recurrence ``C_s = U_s + M_s * C_{s+1}``
    (``C_S = 0``): returns the array whose column ``s`` is ``C_s``.

    The affine maps compose associatively — ``(m1, u1) ∘ (m2, u2) =
    (m1 * m2, u1 + m1 * u2)`` — so the suffix composition runs in ``log2(S)``
    full-width (R, S) VPU passes instead of ``S`` serial (R, 1) column ops
    (each of which occupies a whole 128-lane vreg)."""
    R, S = M.shape
    k = 1
    while k < S:
        U = U + M * _shift_left_lanes(U, k, 0.0)
        M = M * _shift_left_lanes(M, k, 1.0)
        k *= 2
    return U


def _rows_to_2d(x_row, F2, M1):
    """Exact one-hot scatter of a (rows, 1) column to (R_t, S) — works for
    both row layouts (the layout lives in the F2/M1 contents)."""
    return _dotM(M1, x_row * F2)


def _2d_to_rows(x2d, F2, S):
    """Exact gather of (R_t, S) back to sample-major (rows, 1)."""
    return jnp.sum(pltpu.repeat(x2d, S, axis=0) * F2, axis=1, keepdims=True)


def _split_hi_lo(v):
    """Exact f32 -> (bf16 hi, bf16 lo) split: ``hi + lo`` recovers ``v`` to
    ~2^-17 relative. Lets one-hot matmuls run as two DEFAULT-precision bf16
    MXU passes (exact: the one-hot operand is exactly representable) instead
    of HIGHEST's 6 passes + f32 operand-splitting VPU work."""
    v = v.astype(jnp.float32)
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _ray_expand_rm(M1b, x_ray):
    """Ray-major broadcast of per-ray values ``(R_t, k)`` to ``(rows, k)``:
    exact one-hot gather as two bf16 matmuls (``M1b`` is the bf16 one-hot;
    rows are ray-major — row // S = ray — so ``pltpu.repeat``'s whole-block
    tiling does not apply)."""
    hi, lo = _split_hi_lo(x_ray)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dot(M1b, hi) + dot(M1b, lo)


def _ray_reduce_rm(M1b, x_rows):
    """Ray-major per-ray sum of row values ``(rows, k)`` -> ``(R_t, k)``:
    exact one-hot contraction over rows as two bf16 matmuls."""
    hi, lo = _split_hi_lo(x_rows)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dot(M1b, hi) + dot(M1b, lo)


def _composite_tile(out, z, F2, M1, S):
    """In-kernel alpha compositing over one ray tile (all f32, semantics of
    ``core/rendering.composite`` / reference src/UtilsNeuralRadianceField.py:88-115).

    :param out: ``(rows, 4)`` raw radiance, sample-major rows
        (``row % R_t = ray``). For the ray-major layout see
        :func:`_composite_tile_rm`.
    :param z: ``(R_t, S)`` sample depths.
    :return: dict of fwd values + everything the backward reuses.
    """
    g2r = lambda x2d: _2d_to_rows(x2d, F2, S)
    sigma_row = jnp.maximum(out[:, 3:4], 0.0)
    c_row = 1.0 / (1.0 + jnp.exp(-out[:, 0:3]))  # sigmoid, rendering.jax_sigmoid
    S_z = z.shape[1]
    delta2d = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) < S_z - 1,
        _shift_left_lanes(z, 1, 0.0) - z,
        TERMINAL_DELTA,
    )
    delta_row = g2r(delta2d)
    alpha_row = 1.0 - jnp.exp(-sigma_row * delta_row)
    alpha2d = _rows_to_2d(alpha_row, F2, M1)
    T2d = _exclusive_cumprod_lanes(1.0 - alpha2d)
    w2d = alpha2d * T2d
    w_row = g2r(w2d)
    pixel = _dotM(M1, w_row * c_row)  # (R_t, 3) = sum_s w_s * rgb_s
    return dict(
        sigma_row=sigma_row, c_row=c_row, delta_row=delta_row,
        alpha_row=alpha_row, alpha2d=alpha2d, T2d=T2d, w2d=w2d, w_row=w_row,
        pixel=pixel,
    )


def _composite_tile_bwd(comp, out, F2, M1, S, g_rgb, g_w):
    """VJP of :func:`_composite_tile` w.r.t. the raw radiance and z.

    :param g_rgb: ``(R_t, 3)`` pixel cotangent.
    :param g_w: ``(R_t, S)`` weights cotangent (the coarse pass feeds the
        hierarchical resampler, so weights carry real gradients).
    :return: ``(g_rows, dz2d)`` — raw-radiance cotangent (rows, 4) and the
        compositing contribution to dz (R_t, S).
    """
    alpha2d, T2d = comp["alpha2d"], comp["T2d"]
    R_t = alpha2d.shape[0]
    rep = lambda x_ray: pltpu.repeat(x_ray, S, axis=0)
    g2r = lambda x2d: _2d_to_rows(x2d, F2, S)

    g_rgb_row = rep(g_rgb)                                       # (rows, 3)
    gw_pix_row = jnp.sum(comp["c_row"] * g_rgb_row, axis=1, keepdims=True)
    gW2d = g_w + _rows_to_2d(gw_pix_row, F2, M1)                 # d/dw total
    dc_row = comp["w_row"] * g_rgb_row

    # Reverse affine recurrence over samples (C_s = dL/dT_{s+1} chain),
    # parallelized as a log-step suffix scan instead of S serial column ops.
    U = _suffix_affine_scan(1.0 - alpha2d, gW2d * alpha2d)  # U[:, s] = C_s
    C_next = _shift_left_lanes(U, 1, 0.0)
    da2d = (gW2d - C_next) * T2d

    # alpha = 1 - exp(-sigma * delta):  d/dsigma = delta * (1 - alpha),
    # d/ddelta = sigma * (1 - alpha). The terminal delta is a constant.
    om2d = 1.0 - alpha2d
    sigma2d = _rows_to_2d(comp["sigma_row"], F2, M1)
    ddelta2d = da2d * sigma2d * om2d
    not_last = (
        jax.lax.broadcasted_iota(jnp.int32, (R_t, S), 1) < S - 1
    ).astype(jnp.float32)
    dd = ddelta2d * not_last
    dz2d = _shift_right_lanes(dd, 1, 0.0) - dd

    da_row = g2r(da2d)
    g_sig_raw = jnp.where(
        out[:, 3:4] > 0.0,
        da_row * comp["delta_row"] * (1.0 - comp["alpha_row"]),
        0.0,
    )
    g_rgb_raw = dc_row * comp["c_row"] * (1.0 - comp["c_row"])  # sigmoid'
    return jnp.concatenate([g_rgb_raw, g_sig_raw], axis=1), dz2d


def _make_forward_rays_comp(config: MLPConfig, cd, n_w, n_b, S, lay):
    T = lay["T"]

    def kernel(*refs):
        rd_ref, z_ref, f2_ref, m1_ref = refs[0], refs[1], refs[2], refs[3]
        w_refs = refs[4 : 4 + n_w]
        b_refs = refs[4 + n_w : 4 + n_w + n_b]
        masks = refs[4 + n_w + n_b][:] if T else None
        offs = refs[5 + n_w + n_b][:] if T else None
        rgb_ref, w_ref = refs[-2], refs[-1]

        z = z_ref[:]
        enc, encd, _, _ = _encode_tile(
            config, lay, rd_ref[:], z, f2_ref[:], masks, offs, S
        )
        ws = [w[:] for w in w_refs]
        bs = [b[:] for b in b_refs]
        out, _ = _forward_tile(
            config, cd, enc.astype(cd),
            encd.astype(cd) if encd is not None else None, ws, bs,
        )
        comp = _composite_tile(out, z, f2_ref[:], m1_ref[:], S)
        rgb_ref[:] = comp["pixel"]
        w_ref[:] = comp["w2d"]

    return kernel


def _make_backward_rays_comp(config: MLPConfig, cd, n_w, n_b, S, lay):
    has_dir = config.uses_view_dirs
    T, nx = lay["T"], lay["nx"]

    def kernel(*refs):
        rd_ref, z_ref, f2_ref, m1_ref = refs[0], refs[1], refs[2], refs[3]
        w_refs = refs[4 : 4 + n_w]
        b_refs = refs[4 + n_w : 4 + n_w + n_b]
        k = 4 + n_w + n_b
        masks = refs[k][:] if T else None
        offs = refs[k + 1][:] if T else None
        k += 2 if T else 0
        g_rgb_ref, g_w_ref = refs[k], refs[k + 1]
        outs = refs[k + 2 :]
        dz_ref = outs[0]
        dw_refs = outs[1 : 1 + n_w]
        db_refs = outs[1 + n_w :]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in (*dw_refs, *db_refs):
                r[:] = jnp.zeros_like(r)

        F2, M1, z = f2_ref[:], m1_ref[:], z_ref[:]
        enc, encd, dvec, theta = _encode_tile(
            config, lay, rd_ref[:], z, F2, masks, offs, S
        )
        ws = [w[:] for w in w_refs]
        bs = [b[:] for b in b_refs]
        enc_cd = enc.astype(cd)
        encd_cd = encd.astype(cd) if encd is not None else None
        out, acts = _forward_tile(config, cd, enc_cd, encd_cd, ws, bs)

        comp = _composite_tile(out, z, F2, M1, S)
        g_rows, dz2d_comp = _composite_tile_bwd(
            comp, out, F2, M1, S, g_rgb_ref[:], g_w_ref[:]
        )

        g_x, g_d = _backward_tile(
            config, cd, enc_cd, encd_cd, g_rows, ws, bs, dw_refs, db_refs,
            acts=acts,
        )

        # Encoding VJP down to dz (same as _make_backward_rays).
        if T:
            if nx and has_dir:
                dSC = jnp.concatenate([g_x[:, 3:], g_d], axis=1)
            elif nx:
                dSC = g_x[:, 3:]
            else:
                dSC = g_d
            dtheta = dSC * jnp.cos(theta)
            dpts = [
                jnp.sum(dtheta * masks[c : c + 1, :], axis=1, keepdims=True)
                + g_x[:, c : c + 1]
                for c in range(3)
            ]
        else:
            dpts = [g_x[:, c : c + 1] for c in range(3)]
        dz_row = sum(dpts[c] * dvec[:, c : c + 1] for c in range(3))
        dz_ref[:] = dz2d_comp + _dotM(m1_ref[:], dz_row * F2)

    return kernel


def _forward_rays_comp_pallas(params, config: MLPConfig, rd, z, S, R_t, cd):
    R_p = rd.shape[0]
    lay = _enc_layout(config)
    F2, M1 = _expand_consts(R_t, S, need_m1=True)
    ws, bs = _flatten_params_rays(params, config, cd)

    inputs = [rd, z, F2, M1, *ws, *bs]
    in_specs = [
        pl.BlockSpec((R_t, rd.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R_t, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _const_spec(F2),
        _const_spec(M1),
        *[_const_spec(t) for t in (*ws, *bs)],
    ]
    if lay["T"]:
        masks, offs = jnp.asarray(lay["masks"]), jnp.asarray(lay["offs"])
        inputs += [masks, offs]
        in_specs += [_const_spec(masks), _const_spec(offs)]

    grid = R_p // R_t
    rgb, w = pl.pallas_call(
        _make_forward_rays_comp(config, cd, len(ws), len(bs), S, lay),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((R_t, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_t, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R_p, 3), jnp.float32),
            jax.ShapeDtypeStruct((R_p, S), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=_raymarch_flops(config, R_p * S),
            bytes_accessed=(rd.size + 2 * z.size) * 4 + R_p * 12,
            transcendentals=R_p * S * (lay["T"] + 2),
        ),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(*inputs)
    return rgb, w


def _backward_rays_comp_pallas(params, config: MLPConfig, rd, z, S, R_t, cd, g_rgb, g_w):
    R_p = rd.shape[0]
    lay = _enc_layout(config)
    F2, M1 = _expand_consts(R_t, S, need_m1=True)
    ws, bs = _flatten_params_rays(params, config, cd)

    inputs = [rd, z, F2, M1, *ws, *bs]
    in_specs = [
        pl.BlockSpec((R_t, rd.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R_t, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _const_spec(F2),
        _const_spec(M1),
        *[_const_spec(t) for t in (*ws, *bs)],
    ]
    if lay["T"]:
        masks, offs = jnp.asarray(lay["masks"]), jnp.asarray(lay["offs"])
        inputs += [masks, offs]
        in_specs += [_const_spec(masks), _const_spec(offs)]
    inputs += [g_rgb, g_w]
    in_specs += [
        pl.BlockSpec((R_t, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R_t, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]

    out_shapes = [jax.ShapeDtypeStruct((R_p, S), jnp.float32)]
    out_specs = [pl.BlockSpec((R_t, S), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    for t in (*ws, *bs):
        out_shapes.append(jax.ShapeDtypeStruct(t.shape, jnp.float32))
        out_specs.append(_const_spec(t))

    grid = R_p // R_t
    outs = pl.pallas_call(
        _make_backward_rays_comp(config, cd, len(ws), len(bs), S, lay),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=3 * _raymarch_flops(config, R_p * S),
            bytes_accessed=2 * (rd.size + z.size) * 4 + R_p * 12,
            transcendentals=2 * R_p * S * (lay["T"] + 2),
        ),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(*inputs)
    dz = outs[0]
    dws = outs[1 : 1 + len(ws)]
    dbs = outs[1 + len(ws) :]
    return dz, _unflatten_grads_rays(dws, dbs, params, config)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 6))
def _fused_raymarch_comp(params, config: MLPConfig, orig3, dirs3, viewcomps, z, cd):
    return _fused_raymarch_comp_fwd(params, config, orig3, dirs3, viewcomps, z, cd)[0]


def _fused_raymarch_comp_fwd(params, config, orig3, dirs3, viewcomps, z, cd):
    n_rays, S = z.shape
    R_t = _ray_tile(S)
    rd, z_p = _pack_ray_data(config, orig3, dirs3, viewcomps, z, R_t)
    rgb, w = _forward_rays_comp_pallas(params, config, rd, z_p, S, R_t, cd)
    return (rgb[:n_rays], w[:n_rays]), (params, rd, z_p, (n_rays, S, R_t))


def _fused_raymarch_comp_bwd(config, cd, res, g):
    params, rd, z_p, (n_rays, S, R_t) = res
    g_rgb, g_w = g
    R_p = rd.shape[0]
    g_rgb_full = jnp.zeros((R_p, 3), jnp.float32).at[:n_rays].set(
        g_rgb.astype(jnp.float32)
    )
    g_w_full = jnp.zeros((R_p, S), jnp.float32).at[:n_rays].set(
        g_w.astype(jnp.float32)
    )
    dz, dparams = _backward_rays_comp_pallas(
        params, config, rd, z_p, S, R_t, cd, g_rgb_full, g_w_full
    )
    dparams = jax.tree.map(lambda p, dp: dp.astype(p.dtype), params, dparams)
    dz = dz[:n_rays]
    zeros3 = jnp.zeros((n_rays, 3), jnp.float32)
    dvc = (
        jnp.zeros((n_rays, config.n_angles + 1), jnp.float32)
        if config.uses_view_dirs
        else None
    )
    return dparams, zeros3, zeros3, dvc, dz


_fused_raymarch_comp.defvjp(
    lambda params, config, orig3, dirs3, viewcomps, z, cd: _fused_raymarch_comp_fwd(
        params, config, orig3, dirs3, viewcomps, z, cd
    ),
    _fused_raymarch_comp_bwd,
)


def apply_raymarch_composited(
    params: Params,
    config: MLPConfig,
    rays_orig: jnp.ndarray,
    rays_dirs: jnp.ndarray,
    viewcomps: jnp.ndarray | None,
    z_values: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
):
    """Fully fused ray-march + alpha-compositing (the train fast path).

    Same inputs as :func:`apply_raymarch_fused`; returns
    ``(rgb (n_rays, 3), weights (n_rays, S))`` float32 — exactly what the
    training objective (MSE on pixels) and the hierarchical resampler
    (coarse weights) consume. Differentiable w.r.t. ``params`` and
    ``z_values`` (through both the points and the compositing deltas).

    .. warning:: Cotangents for ``rays_orig`` / ``rays_dirs`` / ``viewcomps``
        are structurally ZERO (the XLA backend propagates real gradients
        there). Training only differentiates params and z, so this is exact
        for the train path — but do NOT use this op for pose optimization or
        anything else that differentiates w.r.t. the rays; use the "xla" or
        "pallas" (``apply_mlp_composited``) backends, whose ray gradients
        flow through the XLA encoding VJP.
    """
    if config.uses_view_dirs and viewcomps is None:
        raise ValueError("this MLP config requires view-direction components")
    return _fused_raymarch_comp(
        params, config,
        rays_orig[:, :3], rays_dirs[:, :3],
        viewcomps if config.uses_view_dirs else None,
        z_values.astype(jnp.float32), compute_dtype,
    )


# shard_map wrapper (mesh runs) ---------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 6, 7, 8))
def _fused_raymarch_comp_sharded(params, config: MLPConfig, orig3, dirs3, vc, z, cd, mesh, axis):
    return _sharded_raymarch_comp_forward(
        params, config, orig3, dirs3, vc, z, cd, mesh, axis
    )


def _sharded_raymarch_comp_forward(params, config, orig3, dirs3, vc, z, cd, mesh, axis):
    from jax.sharding import PartitionSpec as P

    _row_shard(z.shape[0], mesh, axis)
    has_dir = config.uses_view_dirs
    row = P(axis)

    def body(p, o, d, v, zz):
        n_rays, S = zz.shape
        R_t = _ray_tile(S)
        rd, z_p = _pack_ray_data(config, o, d, v if has_dir else None, zz, R_t)
        rgb, w = _forward_rays_comp_pallas(p, config, rd, z_p, S, R_t, cd)
        return rgb[:n_rays], w[:n_rays]

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), row, row, row if has_dir else P(), row),
        out_specs=(row, row),
        check_vma=False,
    )
    return f(params, orig3, dirs3, vc if has_dir else jnp.zeros((), jnp.float32), z)


def _sharded_raymarch_comp_fwd(params, config, orig3, dirs3, vc, z, cd, mesh, axis):
    out = _sharded_raymarch_comp_forward(
        params, config, orig3, dirs3, vc, z, cd, mesh, axis
    )
    return out, (params, orig3, dirs3, vc, z)


def _sharded_raymarch_comp_bwd(config, cd, mesh, axis, res, g):
    from jax.sharding import PartitionSpec as P

    params, orig3, dirs3, vc, z = res
    g_rgb, g_w = g
    has_dir = config.uses_view_dirs
    row = P(axis)

    def body(p, o, d, v, zz, gr, gw):
        n_rays, S = zz.shape
        R_t = _ray_tile(S)
        rd, z_p = _pack_ray_data(config, o, d, v if has_dir else None, zz, R_t)
        R_p = rd.shape[0]
        gr_full = jnp.zeros((R_p, 3), jnp.float32).at[:n_rays].set(
            gr.astype(jnp.float32)
        )
        gw_full = jnp.zeros((R_p, S), jnp.float32).at[:n_rays].set(
            gw.astype(jnp.float32)
        )
        dz, dparams = _backward_rays_comp_pallas(
            p, config, rd, z_p, S, R_t, cd, gr_full, gw_full
        )
        dparams = jax.lax.psum(dparams, axis)
        return dparams, dz[:n_rays]

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), row, row, row if has_dir else P(), row, row, row),
        out_specs=(P(), row),
        check_vma=False,
    )
    dparams, dz = f(
        params, orig3, dirs3, vc if has_dir else jnp.zeros((), jnp.float32), z,
        g_rgb, g_w,
    )
    dparams = jax.tree.map(lambda p, dp: dp.astype(p.dtype), params, dparams)
    dvc = jnp.zeros_like(vc) if has_dir else None
    return dparams, jnp.zeros_like(orig3), jnp.zeros_like(dirs3), dvc, dz


_fused_raymarch_comp_sharded.defvjp(
    _sharded_raymarch_comp_fwd, _sharded_raymarch_comp_bwd
)


def apply_raymarch_composited_sharded(
    params: Params,
    config: MLPConfig,
    rays_orig: jnp.ndarray,
    rays_dirs: jnp.ndarray,
    viewcomps: jnp.ndarray | None,
    z_values: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    *,
    mesh,
    axis: str = "data",
):
    """Mesh-parallel :func:`apply_raymarch_composited`: rays sharded over
    ``axis``, params replicated, weight-grad psum over ICI in the backward."""
    if config.uses_view_dirs and viewcomps is None:
        raise ValueError("this MLP config requires view-direction components")
    return _fused_raymarch_comp_sharded(
        params, config,
        rays_orig[:, :3], rays_dirs[:, :3],
        viewcomps if config.uses_view_dirs else None,
        z_values.astype(jnp.float32), compute_dtype, mesh, axis,
    )


# --------------------------------------------------------------------------- #
# Fused MLP + compositing kernel over XLA-computed encodings (ray-major rows) #
#                                                                             #
# The production train fast path (backend="pallas", fuse_compositing=True).   #
# Measured on v5e (tools/exp_enc2.py): computing the positional encoding      #
# inside the kernel costs more VPU time (the sin pass + theta broadcast-FMAs  #
# run on 128-lane-padded tiles, and the backward recomputes them) than the    #
# HBM traffic it saves — XLA evaluates the same encoding on packed logical    #
# shapes for a fraction of the cost. So: encodings stay in XLA, while the     #
# MLP *and* the alpha-compositing (+ its VJP) run fused in one kernel — the   #
# raw (rays*samples, 4) radiance and its cotangent never touch HBM.          #
#                                                                             #
# Row layout here is RAY-major (row // S = ray): it matches the natural      #
# reshape of XLA's (rays, samples, feat) encoding arrays, so no relayout      #
# happens outside the kernel. In-kernel (rows,·)<->(R_t,S) layout changes go  #
# through exact one-hot matmuls (MXU, ~2% of tile flops).                     #
# --------------------------------------------------------------------------- #


def _expand_consts_rm(R_t: int, S: int):
    """Ray-major one-hots: F2[row, s] = (row % S == s); M1[row, r] = (row // S == r)."""
    import numpy as np

    rows = R_t * S
    r = np.arange(rows)
    F2 = (r[:, None] % S == np.arange(S)[None, :]).astype(np.float32)
    M1 = (r[:, None] // S == np.arange(R_t)[None, :]).astype(np.float32)
    return jnp.asarray(F2), jnp.asarray(M1)


def _composite_tile_rm(out, z, S):
    """Ray-major in-kernel alpha compositing (semantics of
    ``core/rendering.composite`` / reference src/UtilsNeuralRadianceField.py:88-115).

    Rows are the row-major linearization of ``(R_t, S)``, so every
    ``(rows, 1) <-> (R_t, S)`` layout change is a pure ``reshape`` and ALL
    elementwise math runs on fully-packed (R_t, S) tiles — zero one-hot
    matmuls, zero 128-lane-padded row passes (the sample-major variant's
    measured overhead).

    :param out: ``(rows, 4)`` raw radiance, ray-major (``row // S = ray``).
    :param z: ``(R_t, S)`` sample depths.
    """
    R_t = z.shape[0]
    sigma2d = jnp.maximum(out[:, 3:4], 0.0).reshape(R_t, S)
    c2d = [
        1.0 / (1.0 + jnp.exp(-out[:, k : k + 1].reshape(R_t, S)))  # sigmoid
        for k in range(3)
    ]
    delta2d = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) < S - 1,
        _shift_left_lanes(z, 1, 0.0) - z,
        TERMINAL_DELTA,
    )
    alpha2d = 1.0 - jnp.exp(-sigma2d * delta2d)
    T2d = _exclusive_cumprod_lanes(1.0 - alpha2d)
    w2d = alpha2d * T2d
    pixel = jnp.concatenate(
        [jnp.sum(w2d * c, axis=1, keepdims=True) for c in c2d], axis=1
    )
    return dict(
        sigma2d=sigma2d, c2d=c2d, delta2d=delta2d, alpha2d=alpha2d,
        T2d=T2d, w2d=w2d, pixel=pixel,
    )


def _composite_tile_rm_bwd(comp, S, g_rgb, g_w):
    """VJP of :func:`_composite_tile_rm` w.r.t. the raw radiance and z.

    :param g_rgb: ``(R_t, 3)`` pixel cotangent.
    :param g_w: ``(R_t, S)`` weights cotangent.
    :return: ``(g_rows (rows, 4) ray-major, dz2d (R_t, S))``.
    """
    alpha2d, T2d, w2d = comp["alpha2d"], comp["T2d"], comp["w2d"]
    R_t = alpha2d.shape[0]
    rows = R_t * S

    gW2d = g_w + sum(
        comp["c2d"][k] * g_rgb[:, k : k + 1] for k in range(3)
    )

    # Reverse affine recurrence (C_s = dL/dT_{s+1} chain) as a log-step
    # suffix scan on the packed (R_t, S) tile.
    U = _suffix_affine_scan(1.0 - alpha2d, gW2d * alpha2d)
    C_next = _shift_left_lanes(U, 1, 0.0)
    da2d = (gW2d - C_next) * T2d

    om2d = 1.0 - alpha2d
    ddelta2d = da2d * comp["sigma2d"] * om2d
    not_last = (
        jax.lax.broadcasted_iota(jnp.int32, (R_t, S), 1) < S - 1
    ).astype(jnp.float32)
    dd = ddelta2d * not_last
    dz2d = _shift_right_lanes(dd, 1, 0.0) - dd

    # relu' on the raw sigma: relu(x) > 0 <=> x > 0, so sigma2d carries it.
    g_sig2d = jnp.where(
        comp["sigma2d"] > 0.0, da2d * comp["delta2d"] * om2d, 0.0
    )
    g_cols = [
        (
            w2d * g_rgb[:, k : k + 1] * comp["c2d"][k] * (1.0 - comp["c2d"][k])
        ).reshape(rows, 1)
        for k in range(3)
    ]
    g_rows = jnp.concatenate([*g_cols, g_sig2d.reshape(rows, 1)], axis=1)
    return g_rows, dz2d


def _make_forward_mlp_comp(config: MLPConfig, cd, n_w, n_b, S, has_dir):
    def kernel(*refs):
        x_ref, z_ref = refs[0], refs[1]
        idx = 2
        m1_ref = d_ref = None
        if has_dir:
            m1_ref, d_ref = refs[idx], refs[idx + 1]
            idx += 2
        w_refs = refs[idx : idx + n_w]
        b_refs = refs[idx + n_w : idx + n_w + n_b]
        rgb_ref, w_ref = refs[-2], refs[-1]

        x = x_ref[:].astype(cd)
        d = None
        if has_dir:
            # Per-ray view-dir encodings expanded to rows in-VMEM (exact
            # bf16 one-hot gather) — the (rows, dir_dim) broadcast never
            # hits HBM.
            d = _ray_expand_rm(m1_ref[:], d_ref[:]).astype(cd)
        ws = [w[:] for w in w_refs]
        bs = [b[:] for b in b_refs]
        out, _ = _forward_tile(config, cd, x, d, ws, bs)
        comp = _composite_tile_rm(out, z_ref[:], S)
        rgb_ref[:] = comp["pixel"]
        w_ref[:] = comp["w2d"]

    return kernel


def _make_backward_mlp_comp(config: MLPConfig, cd, n_w, n_b, S, has_dir):
    def kernel(*refs):
        x_ref, z_ref = refs[0], refs[1]
        idx = 2
        m1_ref = d_ref = None
        if has_dir:
            m1_ref, d_ref = refs[idx], refs[idx + 1]
            idx += 2
        w_refs = refs[idx : idx + n_w]
        b_refs = refs[idx + n_w : idx + n_w + n_b]
        g_rgb_ref = refs[idx + n_w + n_b]
        g_w_ref = refs[idx + n_w + n_b + 1]
        outs = refs[idx + n_w + n_b + 2 :]
        denc_ref = outs[0]
        k = 1
        dencd_ref = None
        if has_dir:
            dencd_ref = outs[k]
            k += 1
        dz_ref = outs[k]
        dw_refs = outs[k + 1 : k + 1 + n_w]
        db_refs = outs[k + 1 + n_w :]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in (*dw_refs, *db_refs):
                r[:] = jnp.zeros_like(r)

        z = z_ref[:]
        x = x_ref[:].astype(cd)
        d = None
        if has_dir:
            d = _ray_expand_rm(m1_ref[:], d_ref[:]).astype(cd)
        ws = [w[:] for w in w_refs]
        bs = [b[:] for b in b_refs]
        out, acts = _forward_tile(config, cd, x, d, ws, bs)

        comp = _composite_tile_rm(out, z, S)
        g_rows, dz2d = _composite_tile_rm_bwd(comp, S, g_rgb_ref[:], g_w_ref[:])
        g_x, g_d = _backward_tile(
            config, cd, x, d, g_rows, ws, bs, dw_refs, db_refs, acts=acts
        )
        denc_ref[:] = g_x
        if has_dir:
            # Per-ray cotangent: sum the per-row dir grads over each ray's
            # S rows (exact bf16 one-hot contraction).
            dencd_ref[:] = _ray_reduce_rm(m1_ref[:], g_d)
        dz_ref[:] = dz2d

    return kernel


def _forward_mlp_comp_pallas(params, config: MLPConfig, enc, encd, z, S, R_t, cd):
    R_p = z.shape[0]
    rows = R_t * S
    has_dir = config.uses_view_dirs
    ws, bs = _flatten_params(params, config, cd)

    inputs = [enc, z]
    in_specs = [
        pl.BlockSpec((rows, enc.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R_t, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    if has_dir:
        _, M1 = _expand_consts_rm(R_t, S)
        inputs += [M1.astype(jnp.bfloat16), encd]
        in_specs += [
            _const_spec(M1),
            pl.BlockSpec((R_t, encd.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
    inputs += [*ws, *bs]
    in_specs += [_const_spec(t) for t in (*ws, *bs)]

    grid = R_p // R_t
    rgb, w = pl.pallas_call(
        _make_forward_mlp_comp(config, cd, len(ws), len(bs), S, has_dir),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((R_t, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_t, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R_p, 3), jnp.float32),
            jax.ShapeDtypeStruct((R_p, S), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=_mlp_flops(config, R_p * S),
            bytes_accessed=enc.size * enc.dtype.itemsize + z.size * 4 + R_p * 12,
            transcendentals=R_p * S * 2,
        ),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(*inputs)
    return rgb, w


def _backward_mlp_comp_pallas(params, config: MLPConfig, enc, encd, z, S, R_t, cd,
                              g_rgb, g_w):
    R_p = z.shape[0]
    rows = R_t * S
    has_dir = config.uses_view_dirs
    ws, bs = _flatten_params(params, config, cd)

    inputs = [enc, z]
    in_specs = [
        pl.BlockSpec((rows, enc.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R_t, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    if has_dir:
        _, M1 = _expand_consts_rm(R_t, S)
        inputs += [M1.astype(jnp.bfloat16), encd]
        in_specs += [
            _const_spec(M1),
            pl.BlockSpec((R_t, encd.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
    inputs += [*ws, *bs, g_rgb, g_w]
    in_specs += [_const_spec(t) for t in (*ws, *bs)]
    in_specs += [
        pl.BlockSpec((R_t, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R_t, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]

    out_shapes = [jax.ShapeDtypeStruct((R_p * S, enc.shape[1]), jnp.float32)]
    out_specs = [
        pl.BlockSpec((rows, enc.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    if has_dir:
        out_shapes.append(jax.ShapeDtypeStruct((R_p, encd.shape[1]), jnp.float32))
        out_specs.append(
            pl.BlockSpec((R_t, encd.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
    out_shapes.append(jax.ShapeDtypeStruct((R_p, S), jnp.float32))
    out_specs.append(
        pl.BlockSpec((R_t, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )
    for t in (*ws, *bs):
        out_shapes.append(jax.ShapeDtypeStruct(t.shape, jnp.float32))
        out_specs.append(_const_spec(t))

    grid = R_p // R_t
    outs = pl.pallas_call(
        _make_backward_mlp_comp(config, cd, len(ws), len(bs), S, has_dir),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=3 * _mlp_flops(config, R_p * S),
            bytes_accessed=2 * enc.size * enc.dtype.itemsize + z.size * 8,
            transcendentals=2 * R_p * S * 2,
        ),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(*inputs)
    denc = outs[0]
    k = 1
    dencd = None
    if has_dir:
        dencd = outs[k]
        k += 1
    dz = outs[k]
    dws = outs[k + 1 : k + 1 + len(ws)]
    dbs = outs[k + 1 + len(ws) :]
    return denc, dencd, dz, _unflatten_grads(dws, dbs, params, config)


def _pad_mlp_comp(config: MLPConfig, enc, encd, z, R_t: int, cd):
    enc_p = _pad_rows(enc.astype(_input_dtype(cd)), R_t * z.shape[1])
    z_p = _pad_rows(z.astype(jnp.float32), R_t)
    encd_p = (
        _pad_rows(encd.astype(jnp.float32), R_t)
        if config.uses_view_dirs
        else None
    )
    return enc_p, encd_p, z_p


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5))
def _mlp_comp(params, config: MLPConfig, enc, encd, z, cd):
    return _mlp_comp_fwd(params, config, enc, encd, z, cd)[0]


def _ray_tile_bwd(S: int) -> int:
    """Backward rays per grid step: the recompute-in-tile backward holds ~4x
    the forward's VMEM (all activations + f32 grad accumulators), so it runs
    at TILE_ROWS_BWD rows (the MLP-kernel sweep optimum). Always divides
    :func:`_ray_tile`'s result, so forward padding satisfies the backward."""
    return 8 * max(1, TILE_ROWS_BWD // (8 * S))


def _mlp_comp_fwd(params, config, enc, encd, z, cd):
    R, S = z.shape
    R_t = _ray_tile(S)
    enc_p, encd_p, z_p = _pad_mlp_comp(config, enc, encd, z, R_t, cd)
    rgb, w = _forward_mlp_comp_pallas(params, config, enc_p, encd_p, z_p, S, R_t, cd)
    return (rgb[:R], w[:R]), (params, enc_p, encd_p, z_p, (R, S, R_t))


def _mlp_comp_bwd(config, cd, res, g):
    params, enc_p, encd_p, z_p, (R, S, _) = res
    R_t = _ray_tile_bwd(S)
    g_rgb, g_w = g
    R_p = z_p.shape[0]
    g_rgb_full = jnp.zeros((R_p, 3), jnp.float32).at[:R].set(g_rgb.astype(jnp.float32))
    g_w_full = jnp.zeros((R_p, S), jnp.float32).at[:R].set(g_w.astype(jnp.float32))
    denc, dencd, dz, dparams = _backward_mlp_comp_pallas(
        params, config, enc_p, encd_p, z_p, S, R_t, cd, g_rgb_full, g_w_full
    )
    dparams = jax.tree.map(lambda p, dp: dp.astype(p.dtype), params, dparams)
    denc = denc[: R * S]
    dencd = dencd[:R] if config.uses_view_dirs else None
    return dparams, denc, dencd, dz[:R]


_mlp_comp.defvjp(
    lambda params, config, enc, encd, z, cd: _mlp_comp_fwd(
        params, config, enc, encd, z, cd
    ),
    _mlp_comp_bwd,
)


def apply_mlp_composited(
    params: Params,
    config: MLPConfig,
    enc_xyz: jnp.ndarray,
    enc_dir_ray: jnp.ndarray | None,
    z_values: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
):
    """Fused MLP + alpha-compositing over XLA-computed encodings.

    The production train fast path: XLA produces the per-sample xyz
    encodings (cheap on packed shapes) and the **per-ray** view-dir
    encodings; the kernel evaluates the full network and composites in-tile,
    so the raw ``(rays * samples, 4)`` radiance (and its cotangent) never
    round-trips HBM, and the per-sample broadcast of the view-dir encoding
    happens in VMEM.

    Reference semantics: MLP ``src/NeRF.py:290-340``, compositing
    ``src/UtilsNeuralRadianceField.py:88-115``.

    :param enc_xyz: ``(n_rays * S, xyz_dim)`` positional encodings in
        **ray-major** row order (the natural reshape of ``(rays, S, feat)``),
        reference/coordinate-major feature layout (``core/encoding.py``).
    :param enc_dir_ray: ``(n_rays, dir_dim)`` per-ray view-dir encodings
        (NOT broadcast over samples), or None for xyz-only nets.
    :param z_values: ``(n_rays, S)``.
    :return: ``(rgb (n_rays, 3), weights (n_rays, S))`` float32.
        Differentiable w.r.t. ``params``, ``enc_xyz``, ``enc_dir_ray`` and
        ``z_values`` (the z grad covers the compositing-delta path; the
        point-position path flows through ``enc_xyz``'s cotangent into the
        XLA encoding VJP).
    """
    if config.uses_view_dirs and enc_dir_ray is None:
        raise ValueError("this MLP config requires per-ray view-dir encodings")
    return _mlp_comp(
        params, config, enc_xyz,
        enc_dir_ray if config.uses_view_dirs else None,
        z_values.astype(jnp.float32), compute_dtype,
    )


# shard_map wrapper (mesh runs) ----------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6, 7))
def _mlp_comp_sharded(params, config: MLPConfig, enc, encd, z, cd, mesh, axis):
    return _sharded_mlp_comp_forward(params, config, enc, encd, z, cd, mesh, axis)


def _sharded_mlp_comp_forward(params, config, enc, encd, z, cd, mesh, axis):
    from jax.sharding import PartitionSpec as P

    _row_shard(z.shape[0], mesh, axis)
    has_dir = config.uses_view_dirs
    row = P(axis)

    def body(p, e, d, zz):
        R, S = zz.shape
        R_t = _ray_tile(S)
        enc_p, encd_p, z_p = _pad_mlp_comp(config, e, d if has_dir else None, zz, R_t, cd)
        rgb, w = _forward_mlp_comp_pallas(p, config, enc_p, encd_p, z_p, S, R_t, cd)
        return rgb[:R], w[:R]

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), row, row if has_dir else P(), row),
        out_specs=(row, row),
        check_vma=False,
    )
    return f(params, enc, encd if has_dir else jnp.zeros((), jnp.float32), z)


def _sharded_mlp_comp_fwd(params, config, enc, encd, z, cd, mesh, axis):
    out = _sharded_mlp_comp_forward(params, config, enc, encd, z, cd, mesh, axis)
    return out, (params, enc, encd, z)


def _sharded_mlp_comp_bwd(config, cd, mesh, axis, res, g):
    from jax.sharding import PartitionSpec as P

    params, enc, encd, z = res
    g_rgb, g_w = g
    has_dir = config.uses_view_dirs
    row = P(axis)

    def body(p, e, d, zz, gr, gw):
        R, S = zz.shape
        enc_p, encd_p, z_p = _pad_mlp_comp(
            config, e, d if has_dir else None, zz, _ray_tile(S), cd
        )
        R_t = _ray_tile_bwd(S)
        R_p = z_p.shape[0]
        gr_full = jnp.zeros((R_p, 3), jnp.float32).at[:R].set(gr.astype(jnp.float32))
        gw_full = jnp.zeros((R_p, S), jnp.float32).at[:R].set(gw.astype(jnp.float32))
        denc, dencd, dz, dparams = _backward_mlp_comp_pallas(
            p, config, enc_p, encd_p, z_p, S, R_t, cd, gr_full, gw_full
        )
        dparams = jax.lax.psum(dparams, axis)
        dencd_out = dencd[:R] if has_dir else jnp.zeros((), jnp.float32)
        return dparams, denc[: R * S], dencd_out, dz[:R]

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), row, row if has_dir else P(), row, row, row),
        out_specs=(P(), row, row if has_dir else P(), row),
        check_vma=False,
    )
    dparams, denc, dencd, dz = f(
        params, enc, encd if has_dir else jnp.zeros((), jnp.float32), z, g_rgb, g_w
    )
    dparams = jax.tree.map(lambda p, dp: dp.astype(p.dtype), params, dparams)
    denc = denc.astype(enc.dtype)
    return dparams, denc, (dencd if has_dir else None), dz


_mlp_comp_sharded.defvjp(_sharded_mlp_comp_fwd, _sharded_mlp_comp_bwd)


def apply_mlp_composited_sharded(
    params: Params,
    config: MLPConfig,
    enc_xyz: jnp.ndarray,
    enc_dir_ray: jnp.ndarray | None,
    z_values: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    *,
    mesh,
    axis: str = "data",
):
    """Mesh-parallel :func:`apply_mlp_composited`: rays sharded over ``axis``
    (``enc_xyz`` rows are ray-major, so its row sharding aligns with the ray
    sharding), params replicated, weight-grad psum over ICI in the backward."""
    if config.uses_view_dirs and enc_dir_ray is None:
        raise ValueError("this MLP config requires per-ray view-dir encodings")
    return _mlp_comp_sharded(
        params, config, enc_xyz,
        enc_dir_ray if config.uses_view_dirs else None,
        z_values.astype(jnp.float32), compute_dtype, mesh, axis,
    )


# --------------------------------------------------------------------------- #
# Fused fine-pass training kernel: forward + MSE + FULL backward in ONE       #
# kernel invocation (no forward recompute, no cotangent round-trip).          #
#                                                                             #
# The fine pass's loss cotangent is local — g_pixel = 2 (pixel - target) / N  #
# — so given the target pixels the kernel can run forward, composite, form    #
# the cotangent, and walk the whole backward while every activation is still  #
# in VMEM. Compared to the split design (fwd kernel + recompute-in-tile bwd   #
# kernel) this saves one full forward of MXU work (~25% of the fine pass).    #
#                                                                             #
# The z gradient's encoding path needs d(enc)/d(theta) = the *neighboring*    #
# sin/cos column of enc itself (d sin = cos and both are present in the       #
# reference's interleaved layout) — so the encoding VJP is two lane shifts +  #
# static frequency masks, NO transcendentals, and the kernel emits the TOTAL  #
# dz (compositing deltas + point-position path); the enc input gets a         #
# structural-zero cotangent.                                                  #
# --------------------------------------------------------------------------- #


def _enc_vjp_consts(config: MLPConfig):
    """Static masks for the in-kernel xyz-encoding VJP.

    Layout (core/encoding.py, reference src/UtilsNeuralRadianceField.py:68-85):
    per coordinate c at base b = c * (1 + 2L): [c, sin f0, cos f0, sin f1, ...]
    with f_k = pi * 2^k. Derivative w.r.t. the coordinate, per column j:
      identity: 1;   sin_k col: f_k * enc[j + 1];   cos_k col: -f_k * enc[j - 1]
    so  deriv = maskL * shiftL(enc) + maskR * shiftR(enc) + idmask.
    ``sel`` scatters each column to its coordinate: dpts = (g_x * deriv) @ sel.
    """
    import math

    import numpy as np

    L = config.n_freq_xyz
    dim = config.xyz_dim
    maskL = np.zeros((1, dim), np.float32)
    maskR = np.zeros((1, dim), np.float32)
    idmask = np.zeros((1, dim), np.float32)
    sel = np.zeros((dim, 3), np.float32)
    for c in range(3):
        b = c * (1 + 2 * L)
        idmask[0, b] = 1.0
        sel[b : b + 1 + 2 * L, c] = 1.0
        for k in range(L):
            f = math.pi * (2.0 ** k)
            maskL[0, b + 1 + 2 * k] = f    # sin col reads its cos neighbor
            maskR[0, b + 2 + 2 * k] = -f   # cos col reads its sin neighbor
    return maskL, maskR, idmask, sel


def _make_loss_mlp_comp(config: MLPConfig, cd, n_w, n_b, S, has_dir, inv_n):
    """inv_n = 1 / (n_real_rays * 3): the MSE mean's static normalizer."""

    def kernel(*refs):
        x_ref, z_ref, valid_ref, tgt_ref = refs[0], refs[1], refs[2], refs[3]
        dvec_ref, m1_ref = refs[4], refs[5]
        idx = 6
        d_ref = None
        if has_dir:
            d_ref = refs[idx]
            idx += 1
        k = idx
        maskL_ref, maskR_ref, idm_ref, sel_ref = refs[k : k + 4]
        k += 4
        w_refs = refs[k : k + n_w]
        b_refs = refs[k + n_w : k + n_w + n_b]
        outs = refs[k + n_w + n_b :]
        mse_ref, dz_ref = outs[0], outs[1]
        dw_refs = outs[2 : 2 + n_w]
        db_refs = outs[2 + n_w :]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            mse_ref[:] = jnp.zeros_like(mse_ref)
            for r in (*dw_refs, *db_refs):
                r[:] = jnp.zeros_like(r)

        z = z_ref[:]
        R_t = z.shape[0]
        x = x_ref[:].astype(cd)
        d = None
        if has_dir:
            d = _ray_expand_rm(m1_ref[:], d_ref[:]).astype(cd)
        ws = [w[:] for w in w_refs]
        bs = [b[:] for b in b_refs]
        out, acts = _forward_tile(config, cd, x, d, ws, bs)
        comp = _composite_tile_rm(out, z, S)

        # Local MSE cotangent + the tile's loss contribution.
        valid = valid_ref[:]                       # (R_t, 1) 1/0
        err = (comp["pixel"] - tgt_ref[:]) * valid # (R_t, 3)
        mse_ref[:] += jnp.full(mse_ref.shape, jnp.sum(err * err) * inv_n)
        g_pix = 2.0 * inv_n * err

        g_rows, dz2d = _composite_tile_rm_bwd(
            comp, S, g_pix, jnp.zeros((R_t, S), jnp.float32)
        )
        g_x, _ = _backward_tile(
            config, cd, x, d, g_rows, ws, bs, dw_refs, db_refs, acts=acts
        )

        # Encoding VJP -> dz, from enc's own sin/cos columns (no trig).
        # Lane shifts via tpu.rotate (Mosaic rejects the pad-and-concat
        # formulation here: "result/input offset mismatch on non-concat
        # dimension"). The wrapped-around lane of each rotate lands on a
        # column where the corresponding mask is structurally zero (col 0 is
        # the identity column, the last column is a cos column), so rotate
        # and shift agree after masking.
        enc_f = x_ref[:].astype(jnp.float32)
        W = enc_f.shape[1]
        E1 = pltpu.roll(enc_f, W - 1, axis=1)  # col j reads j+1 (shift left)
        E2 = pltpu.roll(enc_f, 1, axis=1)      # col j reads j-1 (shift right)
        deriv = maskL_ref[:] * E1 + maskR_ref[:] * E2 + idm_ref[:]
        P = g_x * deriv                            # (rows, xyz_dim)
        P_hi, P_lo = _split_hi_lo(P)
        dot = functools.partial(
            jnp.dot, preferred_element_type=jnp.float32
        )
        sel_b = sel_ref[:]                         # exact 0/1 one-hot, bf16
        dpts = dot(P_hi, sel_b) + dot(P_lo, sel_b)  # (rows, 3)
        dvec_rows = _ray_expand_rm(m1_ref[:], dvec_ref[:])
        dz_row = jnp.sum(dpts * dvec_rows, axis=1, keepdims=True)
        dz_ref[:] = dz2d + dz_row.reshape(R_t, S)

    return kernel


@functools.lru_cache(maxsize=None)
def _m1b_np(R_t: int, S: int):
    import numpy as np

    r = np.arange(R_t * S)
    return (r[:, None] // S == np.arange(R_t)[None, :]).astype(np.float32)


def _loss_mlp_comp_pallas(params, config: MLPConfig, enc, encd, z, dvec, valid,
                          target, n_real, S, R_t, cd):
    R_p = z.shape[0]
    rows = R_t * S
    has_dir = config.uses_view_dirs
    ws, bs = _flatten_params(params, config, cd)
    maskL, maskR, idmask, sel = _enc_vjp_consts(config)

    M1b = jnp.asarray(_m1b_np(R_t, S), jnp.bfloat16)
    inputs = [enc, z, valid, target, dvec, M1b]
    in_specs = [
        pl.BlockSpec((rows, enc.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R_t, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R_t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R_t, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R_t, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _const_spec(M1b),
    ]
    if has_dir:
        inputs += [encd]
        in_specs += [
            pl.BlockSpec((R_t, encd.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
    consts = [jnp.asarray(maskL), jnp.asarray(maskR), jnp.asarray(idmask),
              jnp.asarray(sel, jnp.bfloat16)]
    inputs += consts
    in_specs += [_const_spec(t) for t in consts]
    inputs += [*ws, *bs]
    in_specs += [_const_spec(t) for t in (*ws, *bs)]

    mse_shape = jax.ShapeDtypeStruct((1, 128), jnp.float32)
    out_shapes = [mse_shape, jax.ShapeDtypeStruct((R_p, S), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R_t, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for t in (*ws, *bs):
        out_shapes.append(jax.ShapeDtypeStruct(t.shape, jnp.float32))
        out_specs.append(_const_spec(t))

    inv_n = 1.0 / float(n_real * 3)
    grid = R_p // R_t
    outs = pl.pallas_call(
        _make_loss_mlp_comp(config, cd, len(ws), len(bs), S, has_dir, inv_n),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=3 * _mlp_flops(config, R_p * S),
            bytes_accessed=enc.size * enc.dtype.itemsize + z.size * 8,
            transcendentals=2 * R_p * S * 2,
        ),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(*inputs)
    mse = outs[0][0, 0]
    dz = outs[1]
    dws = outs[2 : 2 + len(ws)]
    dbs = outs[2 + len(ws) :]
    return mse, dz, _unflatten_grads(dws, dbs, params, config)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 7))
def _mlp_loss_comp(params, config: MLPConfig, enc, encd, z, dvec, target, cd):
    return _mlp_loss_comp_fwd(params, config, enc, encd, z, dvec, target, cd)[0]


def _mlp_loss_comp_fwd(params, config, enc, encd, z, dvec, target, cd):
    R, S = z.shape
    R_t = _ray_tile_bwd(S)
    enc_p, encd_p, z_p = _pad_mlp_comp(config, enc, encd, z, R_t, cd)
    R_p = z_p.shape[0]
    valid = jnp.zeros((R_p, 1), jnp.float32).at[:R].set(1.0)
    tgt_p = _pad_rows(target.astype(jnp.float32), R_t)
    dvec_p = _pad_rows(dvec.astype(jnp.float32), R_t)
    mse, dz, dparams = _loss_mlp_comp_pallas(
        params, config, enc_p, encd_p, z_p, dvec_p, valid, tgt_p, R, S, R_t, cd
    )
    dparams = jax.tree.map(lambda p, dp: dp.astype(p.dtype), params, dparams)
    res = (dparams, dz[:R], enc, encd, z, dvec, target)
    return mse, res


def _mlp_loss_comp_bwd(config, cd, res, g):
    dparams, dz, enc, encd, z, dvec, target = res
    g = g.astype(jnp.float32)
    dparams = jax.tree.map(lambda t: (t.astype(jnp.float32) * g).astype(t.dtype),
                           dparams)
    return (
        dparams,
        jnp.zeros_like(enc),
        (jnp.zeros_like(encd) if encd is not None else None),
        dz * g,
        jnp.zeros_like(dvec),
        jnp.zeros_like(target),
    )


_mlp_loss_comp.defvjp(_mlp_loss_comp_fwd, _mlp_loss_comp_bwd)


def apply_mlp_loss_composited(
    params: Params,
    config: MLPConfig,
    enc_xyz: jnp.ndarray,
    enc_dir_ray: jnp.ndarray | None,
    z_values: jnp.ndarray,
    ray_dirs3: jnp.ndarray,
    target_rgb: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fused fine-pass training objective: MSE(composite(MLP(enc)), target).

    One kernel runs forward + compositing + the MSE cotangent + the FULL
    backward with activations VMEM-resident (no recompute) and emits the
    TOTAL dz (compositing deltas + the point-position path via the in-kernel
    encoding VJP — see `_enc_vjp_consts`).

    Reference semantics: fine-pass MSE ``src/NeRF.py:151-156`` over the
    train-path resampled-only z.

    :param enc_xyz: ``(n_rays * S, xyz_dim)`` ray-major xyz encodings.
    :param enc_dir_ray: ``(n_rays, dir_dim)`` per-ray view-dir encodings.
    :param z_values: ``(n_rays, S)``.
    :param ray_dirs3: ``(n_rays, 3)`` unnormalized ray directions (the
        point-position chain d pts / d z).
    :param target_rgb: ``(n_rays, 3)``.
    :return: scalar ``mse`` (float32). Differentiable w.r.t. ``params`` and
        ``z_values`` — the live training paths. ``enc_xyz`` / ``enc_dir_ray``
        / ``ray_dirs3`` / ``target_rgb`` get structural-zero cotangents (the
        enc path is already folded into dz; do not differentiate w.r.t. rays
        or targets through this op).
    """
    if config.uses_view_dirs and enc_dir_ray is None:
        raise ValueError("this MLP config requires per-ray view-dir encodings")
    return _mlp_loss_comp(
        params, config, enc_xyz,
        enc_dir_ray if config.uses_view_dirs else None,
        z_values.astype(jnp.float32), ray_dirs3[:, :3].astype(jnp.float32),
        target_rgb, compute_dtype,
    )
