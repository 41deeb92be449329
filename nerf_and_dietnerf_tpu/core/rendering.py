"""Volume rendering: alpha compositing along the per-ray sample axis.

Contract (reference ``src/UtilsNeuralRadianceField.py:88-115``):

- ``sigma = relu(raw[..., 3])``, ``rgb = sigmoid(raw[..., :3])`` in float32.
- ``delta_i = z_{i+1} - z_i`` with a ``1e9`` terminal delta. Deltas are **not**
  scaled by the ray-direction norm (directions are unnormalized by design).
- ``alpha = 1 - exp(-sigma * delta)``; transmittance ``T`` is the exclusive
  cumulative product of ``1 - alpha``; ``weights = alpha * T``; the pixel is
  ``sum(weights * rgb)`` over samples. Background is implicitly black.

The exclusive cumprod is the only cross-sample dependency in the whole model
(the "sequence axis" of this workload); it stays inside a single device's
VMEM-resident tile — it is never sharded across chips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TERMINAL_DELTA = 1e9  # reference src/UtilsNeuralRadianceField.py:105


class RenderResult(NamedTuple):
    """Full per-ray compositing diagnostics (reference keeps all five outputs —
    ``src/UtilsNeuralRadianceField.py:115`` — they feed the ray-visualization
    plots and depth maps)."""

    rgb: jnp.ndarray        # (..., 3) composited pixel color
    weights: jnp.ndarray    # (..., S) alpha * transmittance
    cumprod: jnp.ndarray    # (..., S) exclusive transmittance T
    alpha: jnp.ndarray      # (..., S) per-sample opacity
    sample_rgb: jnp.ndarray  # (..., S, 3) per-sample sigmoid(rgb)


def composite(
    raw: jnp.ndarray, z_values: jnp.ndarray, sigma_noise=None
) -> RenderResult:
    """Alpha-composite raw MLP outputs along the sample axis.

    :param raw: ``(..., S, 4)`` raw network output (rgb logits + sigma logit).
    :param z_values: ``(..., S)`` z of each sample.
    :param sigma_noise: optional ``(..., S)`` zero-mean noise added to the
        density preactivation before the relu (train-time only; the
        bmild/nerf ``raw_noise_std`` regularizer). None = reference-exact
        (``src/UtilsNeuralRadianceField.py:88-115`` has no noise). Besides
        regularizing, this is the principled fix for the dead-density init
        lottery: a dead relu head (all preactivations < 0) gets gradient
        whenever the noise pushes a sample across zero, so it cannot stay
        dead (measured: runs/robot8_diet_ab_r05/RESULTS.md).
    :return: :class:`RenderResult` (all float32).

    Reference behavior: ``src/UtilsNeuralRadianceField.py:88-115``
    (``ray_marching``).
    """
    raw = jnp.asarray(raw, jnp.float32)
    z_values = jnp.asarray(z_values, jnp.float32)

    sigma_preact = raw[..., 3]
    if sigma_noise is not None:
        sigma_preact = sigma_preact + sigma_noise
    sigma = jnp.maximum(sigma_preact, 0.0)
    sample_rgb = jax_sigmoid(raw[..., :3])

    delta = jnp.diff(z_values, axis=-1)
    delta = jnp.concatenate(
        [delta, jnp.full((*delta.shape[:-1], 1), TERMINAL_DELTA, delta.dtype)], axis=-1
    )

    alpha = 1.0 - jnp.exp(-sigma * delta)
    transmittance = exclusive_cumprod(1.0 - alpha)
    weights = alpha * transmittance
    rgb = jnp.sum(weights[..., None] * sample_rgb, axis=-2)
    return RenderResult(rgb, weights, transmittance, alpha, sample_rgb)


def exclusive_cumprod(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumulative product along the last axis: ``[1, x0, x0*x1, ...]``."""
    ones = jnp.ones((*x.shape[:-1], 1), x.dtype)
    return jnp.concatenate([ones, jnp.cumprod(x[..., :-1], axis=-1)], axis=-1)


def jax_sigmoid(x):
    """Logistic sigmoid with an AD-stable formulation (kept local so the
    fused kernel can mirror it).

    MUST be ``jax.nn.sigmoid``, not the naive ``1/(1+exp(-x))``: the naive
    form's forward is fine at any input (``1/inf == 0``) but its autodiff is
    ``d(1/(1+u)) * du`` with ``u = exp(-x) == inf`` for ``x <= ~-89`` (f32
    exp overflow), i.e. ``0 * inf == NaN``. One NaN gradient poisons Adam's
    moments permanently — measured: the 256px Robot 0-angle run (black
    background drives rgb logits that negative) went loss=NaN at epoch 5 in
    BOTH the pallas and plain-XLA backends, root-caused to this exact
    cotangent (runs/robot256_0angle_r04/RESULTS.md). The reference's
    ``tf.sigmoid`` registers the stable ``s*(1-s)`` gradient
    (src/UtilsNeuralRadianceField.py:100 never sees this), so the stable
    form IS reference-gradient parity. The fused kernels' hand-written
    VJPs already use ``s*(1-s)`` and were never affected."""
    return jax.nn.sigmoid(x)


def depth_from_weights(weights: jnp.ndarray, z_values: jnp.ndarray) -> jnp.ndarray:
    """Expected-termination depth ``sum(w * z)`` used for the depth videos
    (reference ``src/ExecutionRun.py:346``)."""
    return jnp.sum(weights * z_values, axis=-1)


def psnr_from_mse(mse):
    """PSNR in dB for signals with peak value 1
    (reference ``src/UtilsNeuralRadianceField.py:123-132``)."""
    mse = jnp.asarray(mse)
    return -10.0 * jnp.log(mse) / jnp.log(jnp.asarray(10.0, mse.dtype))


def psnr(image_a, image_b):
    """PSNR between two images (reference ``src/UtilsNeuralRadianceField.py:118``)."""
    return psnr_from_mse(jnp.mean(jnp.square(image_a - image_b)))
