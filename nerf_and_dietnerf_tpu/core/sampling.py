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

    :param key: PRNG key.
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
    jitter = jax.random.uniform(key, (*tuple(batch_shape), n_samples)) * (
        (far - near) / n_samples
    )
    return base + jitter


def resample_z_from_weights(key, weights, z_values, n_new: int) -> jnp.ndarray:
    """Hierarchical sampling: draw new z values from the coarse weight PDF.

    Inverse-transform sampling: normalize ``weights`` into a PDF, build the
    CDF, draw uniforms, locate each with ``searchsorted``, then linearly
    interpolate between the z **bin midpoints** bracketing the hit. Output is
    sorted along the sample axis.

    Differentiable w.r.t. ``weights`` and ``z_values`` (no stop-gradient; see
    module docstring).

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
    u = jax.random.uniform(key, (*weights.shape[:-1], n_new))

    # searchsorted semantics: first index where cdf[i] >= u (TF default 'left').
    idx = _batched_searchsorted(cdf, u)
    lo = jnp.maximum(0, idx - 1)
    hi = jnp.minimum(n_coarse - 1, idx)

    cdf_lo = jnp.take_along_axis(cdf, lo, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, hi, axis=-1)

    z_mid = 0.5 * (z_values[..., 1:] + z_values[..., :-1])  # (..., n_coarse - 1)
    lo_z = jnp.clip(lo, 0, n_coarse - 2)
    hi_z = jnp.clip(hi, 0, n_coarse - 2)
    z_lo = jnp.take_along_axis(z_mid, lo_z, axis=-1)
    z_hi = jnp.take_along_axis(z_mid, hi_z, axis=-1)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < DENOM_CLAMP, DENOM_CLAMP, denom)
    t = (u - cdf_lo) / denom
    z_new = z_lo + t * (z_hi - z_lo)
    return jnp.sort(z_new, axis=-1)


def _batched_searchsorted(cdf, u):
    """Vectorized left-bisect of ``u`` into rows of ``cdf``.

    Comparison-count formulation — XLA-friendly (one broadcasted compare +
    reduce, all static shapes) instead of a per-row ``jnp.searchsorted`` vmap.
    index = #{j : cdf[j] < u} for side='left'.
    """
    return jnp.sum((cdf[..., None, :] < u[..., :, None]).astype(jnp.int32), axis=-1)


def merged_fine_z_values(key, weights, z_coarse, n_fine: int) -> jnp.ndarray:
    """Render-path fine z values: resampled z merged with the coarse z, sorted.

    The reference uses *different* fine-sample sets at train vs. render time:
    at render the fine network sees ``sort(concat(z_resampled, z_coarse))``
    — ``n_coarse + n_fine`` samples (``src/NeRF.py:131-133``) — while at train
    it sees only the ``n_fine`` resampled values (``src/NeRF.py:155-156``).
    This helper is the render-path variant.
    """
    z_new = resample_z_from_weights(key, weights, z_coarse, n_fine)
    return jnp.sort(jnp.concatenate([z_new, z_coarse], axis=-1), axis=-1)
