"""Tile-sharded full-frame rendering: one frame's rays split across chips.

The reference renders frames through a host-side python chunk loop on one GPU
(``src/NeRF.py:211-218``). Multi-chip eval here shards the ray axis of every
chunk over the mesh's ``data`` axis inside a single jitted call — each chip
renders its contiguous slice of pixels and the host reassembles the frame.
For N chips this is the "eval/render tile parallelism" component of SURVEY
§2b, and it is the production eval/video render path on mesh runs
(``train/trainer.py`` / ``tasks/runner.py`` route here when a mesh exists).

Backend routing: on the pallas backends the kernel has no GSPMD partitioning
rule, so the config is rewritten to carry the mesh and ``models/nerf`` routes
the MLP through the shard_mapped fused kernel
(``ops/raymarch_pallas.apply_mlp_fused_sharded``) — the same fast path the
sharded train step uses. Plain-XLA configs just inherit the input sharding
and let GSPMD partition the whole render.

RNG contract: chunking, padding, and key-splitting mirror
``models/nerf.render_image`` exactly, so a sharded render with the same key
and the same effective chunk size is *pixel-identical* to the single-device
render (asserted by ``tests/test_parallel_render.py``). The only deviation:
the chunk size is rounded up to a multiple of ``mesh.size`` so every chip
gets an equal tile.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from nerf_and_dietnerf_tpu.core import cameras
from nerf_and_dietnerf_tpu.core.rendering import RenderResult
from nerf_and_dietnerf_tpu.models import nerf
from nerf_and_dietnerf_tpu.models.nerf import NeRFConfig
from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib


def _round_up(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def render_image_sharded(
    params,
    config: NeRFConfig,
    mesh: Mesh,
    key,
    c2w,
    field_of_view,
    height: int,
    width: int,
    chunk_size: int = 16384,
    n_samples_coarse: Optional[int] = None,
    n_samples_fine: Optional[int] = None,
    diagnostics: bool = True,
) -> Tuple[RenderResult, jnp.ndarray]:
    """Full-frame render with each chunk's ray axis sharded over ``mesh``.

    Drop-in replacement for :func:`models.nerf.render_image` on mesh runs:
    same signature (plus ``mesh``), same ``(RenderResult (h, w, ...),
    z (h, w, S))`` return, same chunk/key schedule.

    :param chunk_size: rays per jitted call **across the whole mesh** (each
        chip renders ``chunk/mesh.size`` rays), rounded up to a multiple of
        ``mesh.size``.
    """
    if config.backend in ("pallas", "pallas_mlp", "pallas_rm") and config.mesh is None:
        # pallas_call has no GSPMD rule: carry the mesh so models/nerf routes
        # the MLP through the shard_mapped fused kernel.
        config = dataclasses.replace(
            config, mesh=mesh, mesh_axis=mesh_lib.DATA_AXIS
        )

    orig, dirs = cameras.rays_for_image(height, width, field_of_view, c2w)
    n_rays = orig.shape[0]
    chunk = _round_up(min(chunk_size, n_rays), mesh.size)
    n_chunks = -(-n_rays // chunk)
    pad = n_chunks * chunk - n_rays
    if pad:
        orig = jnp.concatenate([orig, jnp.broadcast_to(orig[-1:], (pad, 4))], axis=0)
        dirs = jnp.concatenate([dirs, jnp.broadcast_to(dirs[-1:], (pad, 4))], axis=0)

    data = mesh_lib.batch_sharding(mesh)
    repl = mesh_lib.replicated(mesh)
    params = jax.device_put(params, repl)

    keys = [None] * n_chunks if key is None else jax.random.split(key, n_chunks)
    parts = []
    for i in range(n_chunks):
        o = jax.device_put(orig[i * chunk:(i + 1) * chunk], data)
        d = jax.device_put(dirs[i * chunk:(i + 1) * chunk], data)
        parts.append(
            nerf._render_chunk(
                params, config, keys[i], o, d,
                n_samples_coarse, n_samples_fine, diagnostics,
            )
        )
    results = [p[0] for p in parts]
    zs = [p[1] for p in parts]
    merged = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0)[:n_rays], *results)
    z = jnp.concatenate(zs, axis=0)[:n_rays]
    if jax.process_count() > 1:
        # Multi-controller: the tiles live sharded across processes, and the
        # host-side reshape/np.asarray below needs the full frame. A jitted
        # identity with replicated out-sharding is the XLA all-gather; a
        # fully-replicated global array is host-readable on every process.
        gather = jax.jit(lambda t: t, out_shardings=repl)
        merged, z = gather((merged, z))
    return (
        RenderResult(
            rgb=merged.rgb.reshape(height, width, 3),
            weights=merged.weights.reshape(height, width, -1),
            cumprod=None if merged.cumprod is None
            else merged.cumprod.reshape(height, width, -1),
            alpha=None if merged.alpha is None
            else merged.alpha.reshape(height, width, -1),
            sample_rgb=None if merged.sample_rgb is None
            else merged.sample_rgb.reshape(
                height, width, merged.sample_rgb.shape[-2], 3
            ),
        ),
        z.reshape(height, width, -1),
    )


def render_frame(
    params,
    config: NeRFConfig,
    mesh: Optional[Mesh],
    key,
    c2w,
    field_of_view,
    height: int,
    width: int,
    chunk_size: int = 16384,
    n_samples_coarse: Optional[int] = None,
    n_samples_fine: Optional[int] = None,
    diagnostics: bool = True,
) -> Tuple[RenderResult, jnp.ndarray]:
    """Mesh-aware frame render: tile-sharded over ``mesh`` when one exists,
    the single-device chunk loop otherwise. The single routing point for all
    offline/eval renders (per-epoch PSNRs, videos, special plots)."""
    if mesh is not None and mesh.size > 1:
        return render_image_sharded(
            params, config, mesh, key, c2w, field_of_view, height, width,
            chunk_size=chunk_size, n_samples_coarse=n_samples_coarse,
            n_samples_fine=n_samples_fine, diagnostics=diagnostics,
        )
    return nerf.render_image(
        params, config, key, c2w, field_of_view, height, width,
        chunk_size=chunk_size, n_samples_coarse=n_samples_coarse,
        n_samples_fine=n_samples_fine, diagnostics=diagnostics,
    )
