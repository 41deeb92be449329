"""Camera / ray generation math (pure JAX, jit-friendly, static shapes).

Behavioral contract (matches the reference conventions exactly — parity of the
whole pipeline depends on these):

- Pixel centers at ``+0.5`` raster offsets, raster -> NDC -> screen space,
  scaled by ``tan(fov/2)``, camera looks down ``-z`` (reference
  ``src/UtilsCV.py:468-499``).
- Ray directions are homogeneous 4-vectors with ``w = 0``, rotated by the
  camera-to-world matrix, and **not normalized** (the volume renderer's deltas
  are therefore parameterized by z, not by arc length — reference
  ``src/UtilsNeuralRadianceField.py:104-106`` relies on this).
- Ray origins are the c2w translation column broadcast per pixel
  (reference ``src/NeRF.py:209``).
- View-direction features for the MLP are *components* of the unnormalized
  direction, not spherical angles: indices ``[0, 2]`` for the 1-angle model
  and ``[0, 1, 2]`` for the 2-angle model (reference ``src/UtilsCV.py:124-143``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_directions(height: int, width: int, field_of_view, c2w) -> jnp.ndarray:
    """Per-pixel world-space ray directions for a pinhole camera.

    :param height: image height in pixels (static).
    :param width: image width in pixels (static).
    :param field_of_view: full field of view in radians (scalar, traced ok).
    :param c2w: ``(4, 4)`` camera-to-world matrix.
    :return: ``(height, width, 4)`` unnormalized direction 4-vectors (w=0).

    Reference behavior: ``src/UtilsCV.py:468-499`` (``get_rays_directions``).
    """
    c2w = jnp.asarray(c2w, jnp.float32)
    fov = jnp.asarray(field_of_view, jnp.float32)
    # Raster coordinates at pixel centers.
    x = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width    # NDC in [0, 1)
    y = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    x_screen = 2.0 * x - 1.0          # [-1, 1), +x right
    y_screen = 1.0 - 2.0 * y          # (-1, 1], +y up
    tan_half_fov = jnp.tan(fov / 2.0)
    xs = jnp.broadcast_to(x_screen[None, :] * tan_half_fov, (height, width))
    ys = jnp.broadcast_to(y_screen[:, None] * tan_half_fov, (height, width))
    dirs_cam = jnp.stack(
        [xs, ys, -jnp.ones_like(xs), jnp.zeros_like(xs)], axis=-1
    )  # (h, w, 4); camera looks down -z, w=0 => rotation only.
    # Full f32 precision: ray geometry must not round through bf16 on the MXU.
    return jnp.einsum("ij,hwj->hwi", c2w, dirs_cam, precision=jax.lax.Precision.HIGHEST)


def rays_for_image(height: int, width: int, field_of_view, c2w):
    """Flattened rays for a full image: origins and directions.

    :return: ``(origins, directions)`` both ``(height * width, 4)``.

    Reference behavior: ``src/NeRF.py:207-209`` (origins = c2w translation
    column broadcast; directions from ``get_rays_directions`` flattened).
    """
    c2w = jnp.asarray(c2w, jnp.float32)
    dirs = ray_directions(height, width, field_of_view, c2w).reshape(-1, 4)
    origins = jnp.broadcast_to(c2w[:, 3], dirs.shape)
    return origins, dirs


def sample_points_along_rays(origins, directions, z_values) -> jnp.ndarray:
    """Sample 3D points ``o + z * d`` along each ray.

    :param origins: ``(..., 4)`` or ``(..., 3)`` ray origins.
    :param directions: same trailing dim as origins.
    :param z_values: ``(..., n_samples)`` distances along each ray.
    :return: ``(..., n_samples, dim)`` sample coordinates.

    Reference behavior: ``src/UtilsCV.py:585-599`` (``sample_along_rays``).
    """
    return origins[..., None, :] + directions[..., None, :] * z_values[..., None]


def view_direction_components(directions, n_angles: int) -> jnp.ndarray:
    """Select the direction components fed to the view-dependent MLP branch.

    ``n_angles == 1`` keeps components ``(x, z)``; ``n_angles == 2`` keeps
    ``(x, y, z)``. The input is the **unnormalized** homogeneous ray
    direction. Result has ``n_angles + 1`` features per ray.

    :param directions: ``(rays, 4)`` ray direction 4-vectors.
    :param n_angles: 1 or 2.
    :return: ``(rays, n_angles + 1)``.

    Reference behavior: ``src/UtilsCV.py:124-143`` (``get_view_directions``);
    there the components are broadcast per-sample before flattening — callers
    here broadcast explicitly where needed so the per-ray form stays compact.
    """
    if n_angles == 1:
        idx = (0, 2)
    elif n_angles == 2:
        idx = (0, 1, 2)
    else:
        raise ValueError("n_angles must be 1 or 2")
    return directions[..., jnp.array(idx)]
