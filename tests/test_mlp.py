"""MLP architecture: shapes, parameter counts vs the reference checkpoint,
concat-free equivalence, and dtype policies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_and_dietnerf_tpu.models import mlp
from nerf_and_dietnerf_tpu.models.mlp import MLPConfig

CFG_VIEWDIR = MLPConfig()  # reference defaults: 256/128, alpha .05, L=5/4, 2 angles
CFG_XYZ = MLPConfig(n_angles=0)


def test_param_count_matches_reference_checkpoint():
    """The committed reference run's .h5 holds 1,028,664 fp32 params for
    coarse+fine (verified by walking the HDF5 datasets) => 514,332 per net."""
    params = mlp.init_params(jax.random.PRNGKey(0), CFG_VIEWDIR)
    assert mlp.count_params(params) == 514_332


def test_forward_shapes_and_dtype():
    params = mlp.init_params(jax.random.PRNGKey(0), CFG_VIEWDIR)
    x = jnp.ones((10, CFG_VIEWDIR.xyz_dim))
    d = jnp.ones((10, CFG_VIEWDIR.dir_dim))
    out = mlp.apply_mlp(params, CFG_VIEWDIR, x, d)
    assert out.shape == (10, 4)
    assert out.dtype == jnp.float32


def test_xyz_only_forward():
    params = mlp.init_params(jax.random.PRNGKey(1), CFG_XYZ)
    x = jnp.ones((7, CFG_XYZ.xyz_dim))
    out = mlp.apply_mlp(params, CFG_XYZ, x)
    assert out.shape == (7, 4)


def test_missing_dirs_raises():
    params = mlp.init_params(jax.random.PRNGKey(0), CFG_VIEWDIR)
    with pytest.raises(ValueError):
        mlp.apply_mlp(params, CFG_VIEWDIR, jnp.ones((2, CFG_VIEWDIR.xyz_dim)))


def test_split_dense_equals_concat_dense():
    """a @ W[:da] + b @ W[da:] must equal concat([a,b]) @ W."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(12, 5)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
    got = mlp._split_dense({"kernel": w, "bias": b}, a, c, 8, jnp.float32)
    want = jnp.concatenate([a, c], -1) @ w + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_sigma_head_sees_view_dirs():
    """Reference quirk (src/NeRF.py:330-336): in the view-dir variant the sigma
    Dense consumes concat(h8, enc_dir) — changing dirs must change sigma."""
    params = mlp.init_params(jax.random.PRNGKey(2), CFG_VIEWDIR)
    x = jnp.ones((4, CFG_VIEWDIR.xyz_dim)) * 0.3
    d1 = jnp.zeros((4, CFG_VIEWDIR.dir_dim))
    d2 = jnp.ones((4, CFG_VIEWDIR.dir_dim))
    s1 = mlp.apply_mlp(params, CFG_VIEWDIR, x, d1)[:, 3]
    s2 = mlp.apply_mlp(params, CFG_VIEWDIR, x, d2)[:, 3]
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_leaky_relu_alpha():
    np.testing.assert_allclose(
        np.asarray(mlp.leaky_relu(jnp.array([-2.0, 3.0]), 0.05)), [-0.1, 3.0]
    )


def test_bf16_compute_close_to_f32():
    params = mlp.init_params(jax.random.PRNGKey(3), CFG_VIEWDIR)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (32, CFG_VIEWDIR.xyz_dim)).astype(np.float32))
    d = jnp.asarray(rng.uniform(-1, 1, (32, CFG_VIEWDIR.dir_dim)).astype(np.float32))
    f32 = mlp.apply_mlp(params, CFG_VIEWDIR, x, d, compute_dtype=jnp.float32)
    bf16 = mlp.apply_mlp(params, CFG_VIEWDIR, x, d, compute_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(f32), np.asarray(bf16), atol=0.15)


def test_glorot_init_statistics():
    params = mlp.init_params(jax.random.PRNGKey(4), CFG_VIEWDIR)
    w = np.asarray(params["trunk"][1]["kernel"])  # 256x256
    limit = np.sqrt(6.0 / (256 + 256))
    assert np.abs(w).max() <= limit
    assert np.abs(w).max() > 0.8 * limit
    np.testing.assert_allclose(np.asarray(params["trunk"][1]["bias"]), 0.0)


def test_sigma_bias_init_knob():
    """`sigma_bias_init` seeds the relu-density head with a positive bias
    (dead-init-lottery mitigation, runs/robot8_diet_ab_r05/RESULTS.md);
    0.0 stays reference-exact."""
    import jax
    import numpy as np

    from nerf_and_dietnerf_tpu.models import mlp as mlp_lib
    from nerf_and_dietnerf_tpu.models.mlp import MLPConfig

    ref = mlp_lib.init_params(jax.random.PRNGKey(0), MLPConfig())
    assert float(np.asarray(ref["sigma_out"]["bias"])) == 0.0

    biased = mlp_lib.init_params(
        jax.random.PRNGKey(0), MLPConfig(sigma_bias_init=0.5)
    )
    assert float(np.asarray(biased["sigma_out"]["bias"])) == 0.5
    # Only the sigma bias differs.
    np.testing.assert_array_equal(
        np.asarray(ref["sigma_out"]["kernel"]),
        np.asarray(biased["sigma_out"]["kernel"]),
    )
    for a, b in zip(jax.tree.leaves(ref["trunk"]), jax.tree.leaves(biased["trunk"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
