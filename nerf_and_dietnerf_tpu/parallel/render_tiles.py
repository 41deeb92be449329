"""Tile-sharded full-frame rendering: one frame's rays split across chips.

The reference renders frames through a host-side python chunk loop on one GPU
(``src/NeRF.py:211-218``). Multi-chip eval here shards the ray axis of the
whole frame over the mesh's ``data`` axis inside a single jitted call — each
chip renders its contiguous slice of pixels, XLA gathers the replicated
output; the host reshapes to (h, w). For N chips this is the "eval/render
tile parallelism" component of SURVEY §2b.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from nerf_and_dietnerf_tpu.core import cameras
from nerf_and_dietnerf_tpu.models import nerf
from nerf_and_dietnerf_tpu.models.nerf import NeRFConfig
from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib


def _pad_to_multiple(a: jnp.ndarray, multiple: int) -> jnp.ndarray:
    pad = (-a.shape[0]) % multiple
    if pad:
        a = jnp.concatenate([a, jnp.broadcast_to(a[-1:], (pad, *a.shape[1:]))], axis=0)
    return a


@functools.partial(
    jax.jit, static_argnames=("config", "n_samples_coarse", "n_samples_fine")
)
def _render_rays_jit(params, config, key, orig, dirs, n_samples_coarse, n_samples_fine):
    result, z = nerf.render(
        params, config, key, orig, dirs, n_samples_coarse, n_samples_fine,
        diagnostics=False,
    )
    return result.rgb, (result.weights * z).sum(axis=-1)


def render_image_sharded(
    params,
    config: NeRFConfig,
    mesh: Mesh,
    key,
    c2w,
    field_of_view,
    height: int,
    width: int,
    n_samples_coarse: Optional[int] = None,
    n_samples_fine: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render a full frame with the ray axis sharded over the mesh.

    :return: ``(rgb (h, w, 3), depth (h, w))`` — depth is the expected
        termination depth used by the depth videos.
    """
    orig, dirs = cameras.rays_for_image(height, width, field_of_view, c2w)
    n_rays = orig.shape[0]
    orig = _pad_to_multiple(orig, mesh.size)
    dirs = _pad_to_multiple(dirs, mesh.size)

    data = mesh_lib.batch_sharding(mesh)
    repl = mesh_lib.replicated(mesh)
    orig, dirs = jax.device_put(orig, data), jax.device_put(dirs, data)
    params = jax.device_put(params, repl)

    rgb, depth = _render_rays_jit(
        params, config, key, orig, dirs,
        n_samples_coarse or config.n_samples_coarse,
        n_samples_fine or config.n_samples_fine,
    )
    rgb = rgb[:n_rays].reshape(height, width, 3)
    depth = depth[:n_rays].reshape(height, width)
    return rgb, depth
