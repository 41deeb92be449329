"""NeRF model: render paths, training objective, gradients, image rendering."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_and_dietnerf_tpu.models import nerf
from nerf_and_dietnerf_tpu.models.mlp import MLPConfig

TINY = nerf.NeRFConfig(
    mlp=MLPConfig(hidden_dim=32, last_hidden_dim=16, n_freq_xyz=3, n_freq_dir=2),
    n_samples_coarse=8,
    n_samples_fine=12,
    compute_dtype=jnp.float32,
)


def make_rays(n, key=0):
    rng = np.random.default_rng(key)
    orig = np.concatenate([rng.normal(size=(n, 3)), np.ones((n, 1))], -1)
    dirs = np.concatenate([rng.normal(size=(n, 3)), np.zeros((n, 1))], -1)
    return jnp.asarray(orig, jnp.float32), jnp.asarray(dirs, jnp.float32)


def test_render_shapes_fine_path():
    params = nerf.init_params(jax.random.PRNGKey(0), TINY)
    orig, dirs = make_rays(16)
    result, z = nerf.render(params, TINY, jax.random.PRNGKey(1), orig, dirs)
    n_total = TINY.n_samples_coarse + TINY.n_samples_fine  # render path merges
    assert result.rgb.shape == (16, 3)
    assert result.weights.shape == (16, n_total)
    assert z.shape == (16, n_total)
    assert np.all(np.diff(np.asarray(z), axis=-1) >= 0)


def test_render_coarse_only():
    cfg = nerf.NeRFConfig(mlp=TINY.mlp, n_samples_coarse=8, n_samples_fine=0,
                          compute_dtype=jnp.float32)
    params = nerf.init_params(jax.random.PRNGKey(0), cfg)
    assert params["fine"] is None
    orig, dirs = make_rays(4)
    result, z = nerf.render(params, cfg, jax.random.PRNGKey(1), orig, dirs)
    assert result.weights.shape == (4, 8)


def test_training_losses_and_metrics():
    params = nerf.init_params(jax.random.PRNGKey(0), TINY)
    orig, dirs = make_rays(32)
    target = jnp.ones((32, 3)) * 0.5
    loss, metrics = nerf.training_losses(
        params, TINY, jax.random.PRNGKey(2), orig, dirs, target
    )
    assert np.isfinite(float(loss))
    assert set(metrics) == {"loss", "psnr_coarse", "psnr_fine"}
    assert float(metrics["loss"]) == float(loss)


def test_training_gradients_flow_to_both_networks():
    params = nerf.init_params(jax.random.PRNGKey(0), TINY)
    orig, dirs = make_rays(16)
    target = jnp.full((16, 3), 0.25)

    grads = jax.grad(
        lambda p: nerf.training_losses(p, TINY, jax.random.PRNGKey(3), orig, dirs, target)[0]
    )(params)
    for which in ("coarse", "fine"):
        total = sum(
            float(jnp.sum(jnp.abs(leaf))) for leaf in jax.tree.leaves(grads[which])
        )
        assert total > 0, f"no gradient reached the {which} network"


def test_fine_loss_gradient_reaches_coarse_through_resampling():
    """The exotic reference gradient path: fine z depends on coarse weights
    (resampling inside the tape, src/NeRF.py:155). With the coarse MSE removed,
    gradients must still reach the coarse net through the CDF."""
    params = nerf.init_params(jax.random.PRNGKey(0), TINY)
    # Lift the sigma bias so the coarse weight distribution is non-degenerate:
    # at default init almost all sigmas are <= 0, the CDF collapses into one
    # bin and the resampling is *locally constant* (finite differences confirm
    # zero derivative — the TF reference behaves identically there).
    params["coarse"]["sigma_out"]["bias"] = params["coarse"]["sigma_out"]["bias"] + 1.0
    orig, dirs = make_rays(8)
    target = jnp.full((8, 3), 0.25)

    from nerf_and_dietnerf_tpu.core import sampling

    def fine_only_loss(p):
        key = jax.random.PRNGKey(4)
        k1, k2 = jax.random.split(key)
        z = sampling.stratified_z_values(k1, TINY.near, TINY.far, (8,), TINY.n_samples_coarse)
        coarse = nerf.render_rays(p["coarse"], TINY, orig, dirs, z)
        z_fine = sampling.resample_z_from_weights(k2, coarse.weights, z, TINY.n_samples_fine)
        fine = nerf.render_rays(p["fine"], TINY, orig, dirs, z_fine)
        return jnp.mean(jnp.square(target - fine.rgb))

    grads = jax.grad(fine_only_loss)(params)
    coarse_grad = sum(
        float(jnp.sum(jnp.abs(leaf))) for leaf in jax.tree.leaves(grads["coarse"])
    )
    assert coarse_grad > 0


def test_render_image_shapes_and_padding():
    params = nerf.init_params(jax.random.PRNGKey(0), TINY)
    # 5x7 = 35 rays with chunk 16 => padding path exercised.
    result, z = nerf.render_image(
        params, TINY, jax.random.PRNGKey(5), np.eye(4), 1.0, 5, 7, chunk_size=16
    )
    n_total = TINY.n_samples_coarse + TINY.n_samples_fine
    assert result.rgb.shape == (5, 7, 3)
    assert result.weights.shape == (5, 7, n_total)
    assert result.sample_rgb.shape == (5, 7, n_total, 3)
    assert z.shape == (5, 7, n_total)
    assert np.isfinite(np.asarray(result.rgb)).all()


def test_render_image_sample_count_overrides():
    params = nerf.init_params(jax.random.PRNGKey(0), TINY)
    result, z = nerf.render_image(
        params, TINY, jax.random.PRNGKey(6), np.eye(4), 1.0, 4, 4,
        chunk_size=8, n_samples_coarse=5, n_samples_fine=6,
    )
    assert z.shape == (4, 4, 11)


def test_render_no_diagnostics_matches_full():
    """diagnostics=False must produce identical rgb/weights/z on both
    backends (it is the fast path used by videos, epoch evals, and the
    DietNeRF consistency render)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_and_dietnerf_tpu.models import mlp as m
    from nerf_and_dietnerf_tpu.models import nerf

    for backend in ("xla", "pallas"):
        config = nerf.NeRFConfig(
            mlp=m.MLPConfig(hidden_dim=32, last_hidden_dim=16, n_freq_xyz=2,
                            n_freq_dir=2, n_angles=2),
            n_samples_coarse=4, n_samples_fine=4,
            compute_dtype=jnp.float32, backend=backend,
        )
        params = nerf.init_params(jax.random.PRNGKey(0), config)
        rng = np.random.default_rng(0)
        orig = jnp.asarray(
            np.concatenate([rng.normal(size=(8, 3)), np.ones((8, 1))], -1),
            jnp.float32,
        )
        dirs = jnp.asarray(
            np.concatenate([rng.normal(size=(8, 3)), np.zeros((8, 1))], -1),
            jnp.float32,
        )
        full, z_full = nerf.render(params, config, jax.random.PRNGKey(1), orig, dirs)
        fast, z_fast = nerf.render(
            params, config, jax.random.PRNGKey(1), orig, dirs, diagnostics=False
        )
        assert fast.cumprod is None and fast.alpha is None and fast.sample_rgb is None
        np.testing.assert_allclose(np.asarray(z_fast), np.asarray(z_full), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(fast.rgb), np.asarray(full.rgb), atol=2e-4, rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(fast.weights), np.asarray(full.weights), atol=2e-4, rtol=2e-4
        )
