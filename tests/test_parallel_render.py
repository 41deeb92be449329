"""Tile-sharded frame rendering matches the single-device chunked path.

The sharded render mirrors ``models/nerf.render_image``'s chunk/pad/key
schedule exactly, so with a chunk size that is already a multiple of the mesh
size the two paths draw identical RNG and must agree to float tolerance —
pixel equality, not just statistics (VERDICT r3 #2).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_and_dietnerf_tpu.models import nerf
from nerf_and_dietnerf_tpu.models.mlp import MLPConfig
from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib, render_tiles

TINY = nerf.NeRFConfig(
    mlp=MLPConfig(hidden_dim=16, last_hidden_dim=8, n_freq_xyz=2, n_freq_dir=2),
    n_samples_coarse=4, n_samples_fine=4,
    near=0.5, far=3.0, compute_dtype=jnp.float32,
)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_sharded_render_pixel_equal_to_single_device(backend):
    """Same key, chunk size a multiple of the mesh size => identical chunking
    and RNG on both paths => pixel-equal frames (rgb, z, weights). The pallas
    case runs the shard_mapped fused kernel (interpret mode off-TPU) — the
    production mesh eval path."""
    config = dataclasses.replace(TINY, backend=backend)
    params = nerf.init_params(jax.random.PRNGKey(0), config)
    c2w = jnp.eye(4).at[2, 3].set(2.0)
    h = w = 16  # 256 rays; chunk 128 => 2 chunks, both divisible by 8 devices
    key = jax.random.PRNGKey(1)
    mesh = mesh_lib.make_mesh()

    sharded, z_s = render_tiles.render_image_sharded(
        params, config, mesh, key, c2w, 0.8, h, w,
        chunk_size=128, diagnostics=False,
    )
    single, z_1 = nerf.render_image(
        params, config, key, c2w, 0.8, h, w,
        chunk_size=128, diagnostics=False,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.rgb), np.asarray(single.rgb), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_1), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sharded.weights), np.asarray(single.weights), atol=1e-5
    )


def test_sharded_render_padding_path_deterministic():
    """Ray counts not divisible by the mesh size pad up; in deterministic
    mode (key=None — RNG-free mid-bin sampling) padding can't perturb
    per-ray values, so the padded sharded frame still matches exactly."""
    params = nerf.init_params(jax.random.PRNGKey(0), TINY)
    c2w = jnp.eye(4).at[2, 3].set(2.0)
    h, w = 10, 10  # 100 rays -> chunk rounds up to 104 on an 8-device mesh
    mesh = mesh_lib.make_mesh()

    sharded, z_s = render_tiles.render_image_sharded(
        params, TINY, mesh, None, c2w, 0.8, h, w, diagnostics=False,
    )
    single, z_1 = nerf.render_image(
        params, TINY, None, c2w, 0.8, h, w, diagnostics=False,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.rgb), np.asarray(single.rgb), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_1), atol=1e-6)


def test_sharded_render_diagnostics():
    """diagnostics=True must produce the full RenderResult (the ray-value
    plot task renders through this path on mesh runs)."""
    params = nerf.init_params(jax.random.PRNGKey(0), TINY)
    c2w = jnp.eye(4).at[2, 3].set(2.0)
    h = w = 8
    mesh = mesh_lib.make_mesh()
    result, z = render_tiles.render_image_sharded(
        params, TINY, mesh, jax.random.PRNGKey(2), c2w, 0.8, h, w,
        diagnostics=True,
    )
    n_total = TINY.n_samples_coarse + TINY.n_samples_fine
    assert result.rgb.shape == (h, w, 3)
    assert result.alpha.shape == (h, w, n_total)
    assert result.cumprod.shape == (h, w, n_total)
    assert result.sample_rgb.shape == (h, w, n_total, 3)
    assert z.shape == (h, w, n_total)
    assert np.isfinite(np.asarray(result.rgb)).all()


def test_render_frame_routes_by_mesh():
    """render_frame is the single routing point: mesh => sharded, None =>
    single-device — outputs agree in deterministic mode."""
    params = nerf.init_params(jax.random.PRNGKey(0), TINY)
    c2w = jnp.eye(4).at[2, 3].set(2.0)
    h = w = 8
    mesh = mesh_lib.make_mesh()
    r_mesh, z_mesh = render_tiles.render_frame(
        params, TINY, mesh, None, c2w, 0.8, h, w, diagnostics=False
    )
    r_one, z_one = render_tiles.render_frame(
        params, TINY, None, None, c2w, 0.8, h, w, diagnostics=False
    )
    np.testing.assert_allclose(
        np.asarray(r_mesh.rgb), np.asarray(r_one.rgb), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(z_mesh), np.asarray(z_one), atol=1e-6)


def test_viz_helpers():
    from nerf_and_dietnerf_tpu.viz import image_ops, plots

    rng = np.random.default_rng(0)
    # Histogram equalization: output stays in [0, 1]-ish, monotone mapping.
    depth = rng.uniform(size=(16, 16))
    eq, h0, h1 = image_ops.histogram_equalize(depth)
    assert eq.shape == depth.shape
    assert eq.min() >= 0 and eq.max() <= 1.0 + 1e-9
    zero = np.zeros((4, 4))
    eq0, _, _ = image_ops.histogram_equalize(zero)
    np.testing.assert_array_equal(eq0, 0)

    # Re-binning conserves total weight and keeps alpha in [0, 1].
    n_rays, n_samples, n_bins = 2, 24, 6
    z = np.sort(rng.uniform(0.5, 3.0, size=(n_rays, n_samples)), axis=-1)
    weights = rng.uniform(size=(n_rays, n_samples))
    cumprod = rng.uniform(size=(n_rays, n_samples))
    alpha = rng.uniform(size=(n_rays, n_samples))
    rgb = rng.uniform(size=(n_rays, n_samples, 3))
    alpha_b, cum_b, rgb_b, w_b, centers = plots.rebin_ray_samples(
        n_bins, z, weights, cumprod, alpha, rgb
    )
    np.testing.assert_allclose(w_b.sum(axis=-1), weights.sum(axis=-1), atol=1e-9)
    assert (alpha_b <= 1.0).all() and (alpha_b >= 0).all()
    assert np.all(np.diff(centers, axis=-1) > 0)
