"""Tile-sharded frame rendering matches the single-device chunked path."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_and_dietnerf_tpu.models import nerf
from nerf_and_dietnerf_tpu.models.mlp import MLPConfig
from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib, render_tiles

TINY = nerf.NeRFConfig(
    mlp=MLPConfig(hidden_dim=16, last_hidden_dim=8, n_freq_xyz=2, n_freq_dir=2),
    n_samples_coarse=4, n_samples_fine=4,
    near=0.5, far=3.0, compute_dtype=jnp.float32,
)


def test_sharded_render_matches_chunked():
    params = nerf.init_params(jax.random.PRNGKey(0), TINY)
    c2w = jnp.eye(4).at[2, 3].set(2.0)
    h = w = 12  # 144 rays, not a multiple of 8 devices => padding path
    key = jax.random.PRNGKey(1)

    mesh = mesh_lib.make_mesh()
    rgb_sharded, depth_sharded = render_tiles.render_image_sharded(
        params, TINY, mesh, key, c2w, 0.8, h, w
    )
    # Same key, same full-frame ray batch, no sharding — identical RNG stream.
    from nerf_and_dietnerf_tpu.core import cameras

    orig, dirs = cameras.rays_for_image(h, w, 0.8, c2w)
    result, z = nerf.render(params, TINY, key, orig, dirs)
    np.testing.assert_allclose(
        np.asarray(rgb_sharded), np.asarray(result.rgb.reshape(h, w, 3)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(depth_sharded),
        np.asarray((result.weights * z).sum(-1).reshape(h, w)),
        atol=1e-5,
    )


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
