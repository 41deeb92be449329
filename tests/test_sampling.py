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


def test_resample_matches_searchsorted_reference():
    """The single-one-hot gather formulation must match a direct
    searchsorted+clamped-index reference — including
    all-zero weight rows, single-bin spikes, and uniforms past cdf[-1]
    (reference semantics: src/UtilsCV.py:502-539)."""
    import numpy as np

    from nerf_and_dietnerf_tpu.core import sampling

    rng = np.random.default_rng(0)
    R, K, N = 23, 16, 31
    for trial in range(4):
        w = rng.gamma(0.3, size=(R, K)).astype(np.float32)
        if trial == 1:
            w[0] = 0.0                       # all-zero row
        if trial == 2:
            w[1] = 0.0
            w[1, 5] = 3.0                    # single spike
        z = np.cumsum(
            rng.uniform(0.01, 0.1, size=(R, K)).astype(np.float32), -1
        ) + 2.0
        key = None if trial == 3 else jax.random.PRNGKey(trial)
        got = np.asarray(
            sampling.resample_z_from_weights(key, jnp.asarray(w), jnp.asarray(z), N)
        )

        pdf = w / (w.sum(-1, keepdims=True) + sampling.CDF_EPS)
        cdf = np.cumsum(pdf, -1)
        u = np.asarray(sampling.sorted_uniforms(key, (R,), N))
        z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
        want = np.empty((R, N), np.float32)
        for r in range(R):
            idx = np.searchsorted(cdf[r], u[r], side="left")
            lo = np.maximum(0, idx - 1)
            hi = np.minimum(K - 1, idx)
            cdf_lo, cdf_hi = cdf[r][lo], cdf[r][hi]
            z_lo = z_mid[r][np.clip(lo, 0, K - 2)]
            z_hi = z_mid[r][np.clip(hi, 0, K - 2)]
            denom = np.where(
                cdf_hi - cdf_lo < sampling.DENOM_CLAMP,
                sampling.DENOM_CLAMP,
                cdf_hi - cdf_lo,
            )
            want[r] = z_lo + (u[r] - cdf_lo) / denom * (z_hi - z_lo)
        # atol covers 1-ulp cumsum-order differences between XLA and numpy
        # flipping a boundary bin; the CDF inverse is continuous there, so
        # the z difference stays O(1e-5).
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
