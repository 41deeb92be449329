"""Alpha compositing golden-value tests."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_and_dietnerf_tpu.core import rendering


def manual_composite(raw, z):
    raw = np.asarray(raw, np.float64)
    z = np.asarray(z, np.float64)
    sigma = np.maximum(raw[..., 3], 0)
    rgb = 1 / (1 + np.exp(-raw[..., :3]))
    delta = np.concatenate([np.diff(z, axis=-1), np.full((*z.shape[:-1], 1), 1e9)], -1)
    alpha = 1 - np.exp(-sigma * delta)
    t = np.cumprod(np.concatenate([np.ones((*alpha.shape[:-1], 1)), 1 - alpha[..., :-1]], -1), -1)
    w = alpha * t
    return (w[..., None] * rgb).sum(-2), w, t, alpha, rgb


def test_composite_matches_manual():
    rng = np.random.default_rng(0)
    raw = rng.normal(size=(5, 7, 4)).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, size=(5, 7)).astype(np.float32), axis=-1)
    got = rendering.composite(jnp.asarray(raw), jnp.asarray(z))
    want_rgb, want_w, want_t, want_a, want_srgb = manual_composite(raw, z)
    np.testing.assert_allclose(np.asarray(got.rgb), want_rgb, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.weights), want_w, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.cumprod), want_t, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.alpha), want_a, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.sample_rgb), want_srgb, rtol=1e-5, atol=1e-6)


def test_fully_transparent_ray_is_black():
    raw = np.zeros((1, 4, 4), np.float32)
    raw[..., 3] = -5.0  # relu(sigma) == 0 everywhere
    z = np.linspace(1, 2, 4, dtype=np.float32)[None]
    got = rendering.composite(jnp.asarray(raw), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got.rgb), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got.weights), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got.cumprod), 1.0, atol=1e-7)


def test_opaque_first_sample_takes_all_weight():
    raw = np.zeros((1, 3, 4), np.float32)
    raw[0, 0, 3] = 1e6  # effectively opaque at the first sample
    raw[0, 0, :3] = [10.0, -10.0, 0.0]  # sigmoid -> ~[1, 0, 0.5]
    z = np.array([[1.0, 1.5, 2.0]], np.float32)
    got = rendering.composite(jnp.asarray(raw), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got.weights)[0], [1.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.rgb)[0], [1.0, 0.0, 0.5], atol=1e-3)


def test_terminal_delta_catches_remaining_mass():
    # Any positive sigma at the last sample absorbs all remaining transmittance.
    raw = np.zeros((1, 2, 4), np.float32)
    raw[0, 1, 3] = 0.01
    z = np.array([[1.0, 2.0]], np.float32)
    got = rendering.composite(jnp.asarray(raw), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got.weights).sum(), 1.0, rtol=1e-5)


def test_exclusive_cumprod():
    x = jnp.array([[2.0, 3.0, 4.0]])
    np.testing.assert_allclose(
        np.asarray(rendering.exclusive_cumprod(x)), [[1.0, 2.0, 6.0]]
    )


def test_psnr():
    np.testing.assert_allclose(float(rendering.psnr_from_mse(jnp.asarray(0.01))), 20.0, rtol=1e-5)
    a = jnp.zeros((4, 4, 3))
    b = jnp.full((4, 4, 3), 0.1)
    np.testing.assert_allclose(float(rendering.psnr(a, b)), 20.0, rtol=1e-5)


def test_depth_from_weights():
    w = jnp.array([[0.25, 0.75]])
    z = jnp.array([[2.0, 4.0]])
    np.testing.assert_allclose(np.asarray(rendering.depth_from_weights(w, z)), [3.5])


def test_composite_gradients_finite_at_saturated_rgb_logits():
    """Cotangents through the compositing must stay finite for arbitrarily
    saturated rgb logits. The naive 1/(1+exp(-x)) sigmoid autodiffs to
    0 * inf = NaN for logits <= ~-89 — exactly what black-background scenes
    (Robot Blender) produce; one NaN gradient permanently poisons Adam
    (root-caused in runs/robot256_0angle_r04/RESULTS.md)."""
    n_rays, n_samples = 4, 8
    rng = np.random.default_rng(0)
    z = np.sort(rng.uniform(0.5, 3.0, size=(n_rays, n_samples)), axis=-1).astype(np.float32)
    raw = rng.normal(size=(n_rays, n_samples, 4)).astype(np.float32)
    raw[0, :, 0] = -120.0   # past f32 exp(-x) overflow
    raw[1, :, 1] = +120.0
    raw[2, :, 2] = -1e6
    raw = jnp.asarray(raw)

    def f(raw):
        result = rendering.composite(raw, jnp.asarray(z))
        return jnp.sum(jnp.square(result.rgb))

    val, grad = jax.value_and_grad(f)(raw)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all(), "NaN/inf cotangent through composite"


def test_composite_sigma_noise():
    """sigma_noise shifts the density preactivation before the relu; None is
    bit-identical to the no-noise composite (reference-exact default)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_and_dietnerf_tpu.core import rendering

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(size=(5, 7, 4)), jnp.float32)
    z = jnp.asarray(np.sort(rng.uniform(1, 3, size=(5, 7)), axis=-1), jnp.float32)

    base = rendering.composite(raw, z)
    again = rendering.composite(raw, z, sigma_noise=None)
    np.testing.assert_array_equal(np.asarray(base.rgb), np.asarray(again.rgb))

    noise = jnp.asarray(rng.normal(size=(5, 7)), jnp.float32)
    noisy = rendering.composite(raw, z, sigma_noise=noise)
    assert float(jnp.abs(noisy.rgb - base.rgb).max()) > 0.0
    # Equivalent to shifting the raw preactivation directly.
    shifted = rendering.composite(
        raw.at[..., 3].add(noise), z
    )
    np.testing.assert_allclose(
        np.asarray(noisy.rgb), np.asarray(shifted.rgb), atol=1e-6
    )


def test_sigma_noise_revives_dead_density_head():
    """A dead relu density head (all preactivations < 0) has zero density
    gradient; with sigma_noise_std > 0 the expected gradient is nonzero —
    the mechanism that makes the knob the reliable dead-init fix."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_and_dietnerf_tpu.models import nerf
    from nerf_and_dietnerf_tpu.models.mlp import MLPConfig

    cfg_dead = nerf.NeRFConfig(
        mlp=MLPConfig(hidden_dim=16, last_hidden_dim=8, n_freq_xyz=2,
                      n_freq_dir=2, sigma_bias_init=-100.0),
        n_samples_coarse=8, n_samples_fine=0, near=0.5, far=3.0,
        compute_dtype=jnp.float32,
    )
    params = nerf.init_params(jax.random.PRNGKey(0), cfg_dead)
    rng = np.random.default_rng(0)
    n = 32
    orig = jnp.asarray(
        np.concatenate([rng.normal(size=(n, 3)), np.ones((n, 1))], -1), jnp.float32)
    dirs = jnp.asarray(
        np.concatenate([rng.normal(size=(n, 3)), np.zeros((n, 1))], -1), jnp.float32)
    rgb = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)

    def sigma_grad_norm(config):
        def loss(p):
            return nerf.training_losses(p, config, jax.random.PRNGKey(1),
                                        orig, dirs, rgb)[0]
        g = jax.grad(loss)(params)
        return float(jnp.abs(g["coarse"]["sigma_out"]["kernel"]).max())

    assert sigma_grad_norm(cfg_dead) == 0.0  # relu' == 0 everywhere
    import dataclasses
    cfg_noise = dataclasses.replace(cfg_dead, sigma_noise_std=200.0)
    assert sigma_grad_norm(cfg_noise) > 0.0  # noise crosses zero => gradient
