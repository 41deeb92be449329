"""Ray generation and point sampling against hand-computed golden values."""

import jax.numpy as jnp
import numpy as np
import pytest

from nerf_and_dietnerf_tpu.core import cameras


def manual_ray_dirs(h, w, fov, c2w):
    """Independent NumPy restatement of the documented convention."""
    out = np.zeros((h, w, 4), np.float32)
    for i in range(h):
        for j in range(w):
            x = (2 * ((j + 0.5) / w) - 1) * np.tan(fov / 2)
            y = (1 - 2 * ((i + 0.5) / h)) * np.tan(fov / 2)
            out[i, j] = np.asarray(c2w, np.float32) @ np.array([x, y, -1.0, 0.0], np.float32)
    return out


def test_ray_directions_identity_camera():
    fov = np.pi / 2
    dirs = np.asarray(cameras.ray_directions(4, 6, fov, np.eye(4)))
    assert dirs.shape == (4, 6, 4)
    np.testing.assert_allclose(dirs, manual_ray_dirs(4, 6, fov, np.eye(4)), rtol=1e-6)
    # Camera looks down -z; w component stays 0; dirs are NOT normalized.
    assert np.all(dirs[..., 2] == -1.0)
    assert np.all(dirs[..., 3] == 0.0)
    norms = np.linalg.norm(dirs[..., :3], axis=-1)
    assert np.any(norms > 1.0)


def test_ray_directions_rotated_translated_camera():
    rng = np.random.default_rng(0)
    c2w = np.eye(4)
    # A rotation about y plus a translation.
    th = 0.7
    c2w[:3, :3] = [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
    c2w[:3, 3] = rng.normal(size=3)
    fov = 0.9
    dirs = np.asarray(cameras.ray_directions(3, 5, fov, c2w))
    np.testing.assert_allclose(dirs, manual_ray_dirs(3, 5, fov, c2w), rtol=1e-5, atol=1e-6)


def test_ray_directions_center_pixel_is_optical_axis():
    # Odd image size => middle pixel center maps to screen x=y=0 => dir = -z col.
    c2w = np.eye(4)
    dirs = np.asarray(cameras.ray_directions(3, 3, 1.1, c2w))
    np.testing.assert_allclose(dirs[1, 1], [0, 0, -1, 0], atol=1e-7)


def test_rays_for_image_origins_are_translation_column():
    c2w = np.eye(4)
    c2w[:3, 3] = [1.0, 2.0, 3.0]
    orig, dirs = cameras.rays_for_image(2, 3, 1.0, c2w)
    assert orig.shape == (6, 4) and dirs.shape == (6, 4)
    np.testing.assert_allclose(np.asarray(orig), np.tile([1, 2, 3, 1], (6, 1)))


def test_sample_points_along_rays():
    orig = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    dirs = jnp.array([[1.0, 2.0, -1.0, 0.0]])
    z = jnp.array([[0.5, 2.0]])
    pts = np.asarray(cameras.sample_points_along_rays(orig, dirs, z))
    np.testing.assert_allclose(
        pts, [[[0.5, 1.0, -0.5, 1.0], [2.0, 4.0, -2.0, 1.0]]], rtol=1e-6
    )


def test_view_direction_components():
    d = jnp.array([[1.0, 2.0, 3.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(cameras.view_direction_components(d, 1)), [[1.0, 3.0]]
    )
    np.testing.assert_allclose(
        np.asarray(cameras.view_direction_components(d, 2)), [[1.0, 2.0, 3.0]]
    )
    with pytest.raises(ValueError):
        cameras.view_direction_components(d, 3)
