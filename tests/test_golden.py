"""Deterministic golden-tensor parity: conventions locked by allclose.

The PSNR-window parity tests (test_parity.py) discriminate convention
breakage from health but tolerate several dB. This locks the ENTIRE forward
pipeline — ray generation, positional encodings, MLP wiring, stratified +
hierarchical sampling, rank-merge, alpha compositing — bit-tight: the
committed tensors were rendered through the deterministic (RNG-free) mode
(``key=None``: mid-bin stratification, evenly spaced resampling quantiles)
from the reference's committed epoch-95 weights. Any change to any
convention shifts them.

Regenerate (only after an INTENTIONAL semantic change) with
``python tests/golden/regen.py``.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_and_dietnerf_tpu.core import cameras
from nerf_and_dietnerf_tpu.data import loaders
from nerf_and_dietnerf_tpu.models import nerf
from nerf_and_dietnerf_tpu.models.mlp import MLPConfig
from nerf_and_dietnerf_tpu.train import checkpoint as ckpt

ASSETS = "/root/reference/Assets/AlexanderColmap/50px_71pics"
H5 = (
    "/root/reference/Results/50px_alexander_71pics_sphere_nerf_save_dir_4/"
    "saved_weights/NeRF_model_epoch_095.h5"
)
GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "alexander50_fixedz.npz")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(H5) and os.path.exists(ASSETS)),
    reason="reference artifacts unavailable",
)


def test_deterministic_render_matches_golden():
    golden = np.load(GOLDEN)
    ds = loaders.load_colmap(ASSETS)
    cfg = nerf.NeRFConfig(
        mlp=MLPConfig(
            hidden_dim=256, last_hidden_dim=128, leaky_relu_alpha=0.05,
            n_freq_xyz=5, n_freq_dir=4, n_angles=2,
        ),
        n_samples_coarse=64, n_samples_fine=128,
        compute_dtype=jnp.float32, near=ds.near, far=ds.far,
    )
    params = ckpt.load_keras_h5(H5, cfg.mlp)
    orig, dirs = cameras.rays_for_image(
        ds.height, ds.width, ds.field_of_view, ds.camera_poses[0]
    )
    idx = golden["ray_indices"]
    result, z = nerf.render(params, cfg, None, orig[idx], dirs[idx])
    np.testing.assert_allclose(
        np.asarray(z), golden["z"], atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(result.rgb), golden["rgb"], atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(result.weights), golden["weights"], atol=1e-5, rtol=1e-4
    )


def test_deterministic_render_is_rng_free():
    """key=None must be exactly reproducible call-to-call (and must not
    secretly consume any RNG)."""
    ds = loaders.load_colmap(ASSETS)
    cfg = nerf.NeRFConfig(
        mlp=MLPConfig(
            hidden_dim=256, last_hidden_dim=128, leaky_relu_alpha=0.05,
            n_freq_xyz=5, n_freq_dir=4, n_angles=2,
        ),
        n_samples_coarse=8, n_samples_fine=8,
        compute_dtype=jnp.float32, near=ds.near, far=ds.far,
    )
    params = ckpt.load_keras_h5(H5, cfg.mlp)
    orig, dirs = cameras.rays_for_image(
        ds.height, ds.width, ds.field_of_view, ds.camera_poses[0]
    )
    a, za = nerf.render(params, cfg, None, orig[:8], dirs[:8])
    b, zb = nerf.render(params, cfg, None, orig[:8], dirs[:8])
    np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))
    np.testing.assert_array_equal(np.asarray(za), np.asarray(zb))
