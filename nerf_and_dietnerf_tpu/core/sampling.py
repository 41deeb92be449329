"""Stratified and hierarchical (inverse-CDF) z sampling with explicit PRNG keys.

The reference draws randomness from TF's global RNG (``src/UtilsCV.py:516,
:580``); here every sampler takes a ``jax.random`` key so steps are
reproducible, shardable, and jit-safe. The math matches the reference
bit-for-bit apart from the RNG stream:

- Stratified: ``linspace(near, far, N)`` (inclusive endpoints) plus a uniform
  jitter of up to one bin width ``(far - near) / N`` (``src/UtilsCV.py:566-581``)
  — note the jitter can push the last sample past ``far``; that is reference
  behavior and the renderer tolerates it.
- Hierarchical: inverse-transform sampling of the coarse weight distribution
  with searchsorted + linear interpolation between bin-midpoint z values and a
  ``1e-5`` clamp on the CDF denominator (``src/UtilsCV.py:502-539``). No
  stop-gradient is applied to the weights: the reference computes this inside
  the gradient tape (``src/NeRF.py:155``), so fine-loss gradients flow back
  into the coarse network through the CDF — we reproduce that path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CDF_EPS = 1e-7       # pdf normalization epsilon  (reference src/UtilsCV.py:30,:514)
DENOM_CLAMP = 1e-5   # cdf-range denominator clamp (reference src/UtilsCV.py:533)


def stratified_z_values(key, near, far, batch_shape, n_samples: int) -> jnp.ndarray:
    """Stratified z samples: even grid plus up-to-one-bin uniform jitter.

    :param key: PRNG key, or ``None`` for the deterministic golden-parity
        mode: fixed mid-bin offsets (RNG-free renders reproduce exactly, so
        conventions can be locked by ``allclose`` against committed tensors).
    :param near: near frustum boundary (scalar).
    :param far: far frustum boundary (scalar).
    :param batch_shape: leading shape tuple, e.g. ``(n_rays,)`` or ``(h, w)``.
    :param n_samples: samples per ray (static).
    :return: ``(*batch_shape, n_samples)`` float32 z values.

    Reference behavior: ``src/UtilsCV.py:566-581`` (``get_z_values``).
    """
    near = jnp.asarray(near, jnp.float32)
    far = jnp.asarray(far, jnp.float32)
    base = jnp.linspace(near, far, n_samples)
    if key is None:  # deterministic mode: fixed mid-bin offsets, no RNG
        return jnp.broadcast_to(
            base + 0.5 * (far - near) / n_samples,
            (*tuple(batch_shape), n_samples),
        )
    jitter = jax.random.uniform(key, (*tuple(batch_shape), n_samples)) * (
        (far - near) / n_samples
    )
    return base + jitter


def sorted_uniforms(key, batch_shape, n: int) -> jnp.ndarray:
    """``n`` ascending uniform order statistics per row, without a sort.

    Standard order-statistics construction: normalized partial sums of
    ``n + 1`` Exp(1) draws are distributed exactly as the sorted values of
    ``n`` iid U(0,1) draws. O(n) and sort-free — a TPU row-sort of the
    resampled z was a measured hotspot (~28 ms/step at 4096x128 on v5e).

    ``key=None`` selects the deterministic golden-parity mode: evenly spaced
    quantiles ``(i + 0.5) / n`` (still sorted, RNG-free).
    """
    if key is None:  # deterministic mode: evenly spaced quantiles (i+0.5)/n
        u = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
        return jnp.broadcast_to(u, (*tuple(batch_shape), n))
    e = jax.random.exponential(key, (*tuple(batch_shape), n + 1))
    return jnp.cumsum(e[..., :-1], axis=-1) / jnp.sum(e, axis=-1, keepdims=True)


def _pick(onehot, values):
    """Row-wise gather expressed as a 0/1 matmul (MXU) instead of
    ``take_along_axis`` (which lowers to slow serialized gathers on TPU,
    and whose VJP is a scatter)."""
    return jnp.einsum(
        "...fc,...c->...f", onehot, values, precision=jax.lax.Precision.HIGHEST
    )


def resample_z_from_weights(key, weights, z_values, n_new: int) -> jnp.ndarray:
    """Hierarchical sampling: draw new z values from the coarse weight PDF.

    Inverse-transform sampling: normalize ``weights`` into a PDF, build the
    CDF, draw uniforms, locate each with ``searchsorted``, then linearly
    interpolate between the z **bin midpoints** bracketing the hit. Output is
    sorted along the sample axis.

    Differentiable w.r.t. ``weights`` and ``z_values`` (no stop-gradient; see
    module docstring).

    TPU formulation (same math as the reference, different schedule):

    - uniforms are generated *already sorted* (:func:`sorted_uniforms`), and
      since the inverse CDF is monotone the output needs no sort — the
      searchsorted guarantee ``u in (cdf_lo, cdf_hi]`` bounds the
      interpolation factor in [0, 1] even under the reference's ``1e-5``
      denominator clamp, so monotonicity is exact, not approximate;
    - every ``take_along_axis`` is a one-hot einsum on the MXU, whose VJP is
      another einsum (no scatters).

    :param key: PRNG key.
    :param weights: ``(..., n_coarse)`` non-negative compositing weights.
    :param z_values: ``(..., n_coarse)`` z values the weights correspond to.
    :param n_new: number of samples to draw (static).
    :return: ``(..., n_new)`` sorted resampled z values.

    Reference behavior: ``src/UtilsCV.py:502-539``
    (``get_z_vals_from_prob_dist_func``).
    """
    weights = jnp.asarray(weights, jnp.float32)
    z_values = jnp.asarray(z_values, jnp.float32)
    n_coarse = weights.shape[-1]

    pdf = weights / (jnp.sum(weights, axis=-1, keepdims=True) + CDF_EPS)
    cdf = jnp.cumsum(pdf, axis=-1)
    u = sorted_uniforms(key, weights.shape[:-1], n_new)

    # searchsorted semantics: first index where cdf[i] >= u (TF default 'left').
    idx = _batched_searchsorted(cdf, u)
    lo = jnp.maximum(0, idx - 1)
    hi = jnp.minimum(n_coarse - 1, idx)

    grid = jax.lax.broadcasted_iota(jnp.int32, (*idx.shape, n_coarse), idx.ndim)
    onehot_lo = (grid == lo[..., None]).astype(jnp.float32)
    onehot_hi = (grid == hi[..., None]).astype(jnp.float32)
    cdf_lo = _pick(onehot_lo, cdf)
    cdf_hi = _pick(onehot_hi, cdf)

    z_mid = 0.5 * (z_values[..., 1:] + z_values[..., :-1])  # (..., n_coarse - 1)
    grid_z = grid[..., : n_coarse - 1]
    lo_z = jnp.clip(lo, 0, n_coarse - 2)
    hi_z = jnp.clip(hi, 0, n_coarse - 2)
    z_lo = _pick((grid_z == lo_z[..., None]).astype(jnp.float32), z_mid)
    z_hi = _pick((grid_z == hi_z[..., None]).astype(jnp.float32), z_mid)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < DENOM_CLAMP, DENOM_CLAMP, denom)
    t = (u - cdf_lo) / denom
    return z_lo + t * (z_hi - z_lo)


def _batched_searchsorted(cdf, u):
    """Vectorized left-bisect of ``u`` into rows of ``cdf``.

    Comparison-count formulation — XLA-friendly (one broadcasted compare +
    reduce, all static shapes) instead of a per-row ``jnp.searchsorted`` vmap.
    index = #{j : cdf[j] < u} for side='left'.
    """
    return jnp.sum((cdf[..., None, :] < u[..., :, None]).astype(jnp.int32), axis=-1)


def merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge two per-row **sorted** arrays into one sorted array, sort-free.

    Rank arithmetic: element ``a_i`` lands at ``i + #{j : b_j < a_i}``,
    ``b_i`` at ``i + #{j : a_j <= b_i}`` (the ``<=`` breaks ties so ranks are
    a permutation). Counts are a broadcast compare; placement is a one-hot
    einsum on the MXU — no TPU row sort, no scatters in the VJP.
    """
    na, nb = a.shape[-1], b.shape[-1]
    n = na + nb
    own_a = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    own_b = jax.lax.broadcasted_iota(jnp.int32, b.shape, b.ndim - 1)
    rank_a = own_a + jnp.sum(
        (b[..., None, :] < a[..., :, None]).astype(jnp.int32), axis=-1
    )
    rank_b = own_b + jnp.sum(
        (a[..., None, :] <= b[..., :, None]).astype(jnp.int32), axis=-1
    )
    grid = jax.lax.broadcasted_iota(jnp.int32, (*a.shape[:-1], n, 1), a.ndim - 1)
    scatter_a = (grid == rank_a[..., None, :]).astype(a.dtype)  # (..., n, na)
    scatter_b = (grid == rank_b[..., None, :]).astype(b.dtype)
    return _pick(scatter_a, a) + _pick(scatter_b, b)


def merged_fine_z_values(key, weights, z_coarse, n_fine: int) -> jnp.ndarray:
    """Render-path fine z values: resampled z merged with the coarse z, sorted.

    The reference uses *different* fine-sample sets at train vs. render time:
    at render the fine network sees ``sort(concat(z_resampled, z_coarse))``
    — ``n_coarse + n_fine`` samples (``src/NeRF.py:131-133``) — while at train
    it sees only the ``n_fine`` resampled values (``src/NeRF.py:155-156``).
    This helper is the render-path variant. Both inputs are already sorted,
    so the "sort" is a rank-merge (:func:`merge_sorted`).
    """
    z_new = resample_z_from_weights(key, weights, z_coarse, n_fine)
    return merge_sorted(z_new, z_coarse)
