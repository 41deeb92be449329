"""Stratified + hierarchical sampling: bounds, bin structure, CDF inversion."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_and_dietnerf_tpu.core import sampling


def test_stratified_bins():
    key = jax.random.PRNGKey(0)
    near, far, n = 2.0, 6.0, 8
    z = np.asarray(sampling.stratified_z_values(key, near, far, (128,), n))
    assert z.shape == (128, n)
    base = np.linspace(near, far, n)
    bin_w = (far - near) / n
    # Each sample sits within [base_i, base_i + bin_w).
    assert np.all(z >= base) and np.all(z < base + bin_w)
    # Monotone along the sample axis (bins don't overlap since spacing > width).
    assert np.all(np.diff(z, axis=-1) > 0)


def test_stratified_is_random_per_call():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    z1 = sampling.stratified_z_values(k1, 0.0, 1.0, (4,), 16)
    z2 = sampling.stratified_z_values(k2, 0.0, 1.0, (4,), 16)
    assert not np.allclose(np.asarray(z1), np.asarray(z2))


def test_batched_searchsorted_matches_numpy():
    rng = np.random.default_rng(0)
    cdf = np.sort(rng.random((5, 17)), axis=-1)
    u = rng.random((5, 9))
    got = np.asarray(sampling._batched_searchsorted(jnp.asarray(cdf), jnp.asarray(u)))
    want = np.stack([np.searchsorted(c, x, side="left") for c, x in zip(cdf, u)])
    np.testing.assert_array_equal(got, want)


def test_resample_concentrates_where_weights_are():
    key = jax.random.PRNGKey(2)
    n_coarse, n_new = 64, 512
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, n_coarse), (4, n_coarse))
    # All mass in bins around z ~ 4.0 (indices 30..34).
    w = np.zeros((4, n_coarse), np.float32)
    w[:, 30:35] = 1.0
    out = np.asarray(sampling.resample_z_from_weights(key, jnp.asarray(w), z, n_new))
    assert out.shape == (4, n_new)
    assert np.all(np.diff(out, axis=-1) >= 0)  # sorted
    z_np = np.asarray(z[0])
    lo, hi = z_np[28], z_np[36]
    assert (np.mean((out > lo) & (out < hi))) > 0.99


def test_resample_uniform_weights_spans_range():
    key = jax.random.PRNGKey(3)
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 32), (2, 32))
    w = jnp.ones((2, 32))
    out = np.asarray(sampling.resample_z_from_weights(key, w, z, 256))
    # Midpoint convention: samples live within [mid_0, mid_last].
    mids = 0.5 * (np.asarray(z[0])[1:] + np.asarray(z[0])[:-1])
    assert out.min() >= mids[0] - 1e-6 and out.max() <= mids[-1] + 1e-6
    assert np.std(out) > 0.2  # roughly spread out


def test_resample_is_differentiable_through_weights():
    """The reference computes the inverse CDF inside the gradient tape
    (src/NeRF.py:155) — gradients must flow from the new z into the weights."""
    key = jax.random.PRNGKey(4)
    z = jnp.linspace(1.0, 2.0, 16)[None, :]

    def f(w):
        return jnp.sum(sampling.resample_z_from_weights(key, w, z, 8))

    g = jax.grad(f)(jnp.linspace(0.5, 1.5, 16)[None, :])
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_merged_fine_z_is_sorted_and_contains_coarse():
    key = jax.random.PRNGKey(5)
    z = sampling.stratified_z_values(key, 2.0, 6.0, (3,), 16)
    w = jnp.ones((3, 16))
    merged = sampling.merged_fine_z_values(jax.random.PRNGKey(6), w, z, 24)
    assert merged.shape == (3, 40)
    m = np.asarray(merged)
    assert np.all(np.diff(m, axis=-1) >= 0)
    for row_m, row_z in zip(m, np.asarray(z)):
        assert set(np.round(row_z, 5)).issubset(set(np.round(row_m, 5)))


def test_merge_sorted_matches_sort():
    import numpy as np
    from nerf_and_dietnerf_tpu.core.sampling import merge_sorted

    rng = np.random.default_rng(0)
    a = np.sort(rng.uniform(0, 4, size=(16, 12)), axis=-1).astype(np.float32)
    b = np.sort(rng.uniform(0, 4, size=(16, 7)), axis=-1).astype(np.float32)
    merged = np.asarray(merge_sorted(jnp.asarray(a), jnp.asarray(b)))
    want = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
    np.testing.assert_allclose(merged, want, atol=0)

    # Ties across the two arrays must not lose elements.
    a2 = np.asarray([[1.0, 2.0, 2.0, 3.0]], np.float32)
    b2 = np.asarray([[2.0, 2.0]], np.float32)
    merged2 = np.asarray(merge_sorted(jnp.asarray(a2), jnp.asarray(b2)))
    np.testing.assert_allclose(
        merged2, np.sort(np.concatenate([a2, b2], -1), -1), atol=0
    )
