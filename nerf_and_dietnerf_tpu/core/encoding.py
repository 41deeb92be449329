"""Positional (Fourier) encodings for positions and view directions.

Feature layout is load-bearing for weight-import parity with the reference:

- xyz encoding (``src/UtilsNeuralRadianceField.py:68-85``): per coordinate
  ``c`` the features are ``[c, sin(2^0 pi c), cos(2^0 pi c), sin(2^1 pi c),
  cos(2^1 pi c), ...]`` and the three coordinate groups are concatenated
  **coordinate-major**: all of x's features, then y's, then z's. Output dim is
  ``3 + 3 * 2 * L``. ``L == 0`` passes coordinates through unchanged.
- view-dir encoding (``src/UtilsNeuralRadianceField.py:52-65``): same
  component-major sin/cos interleave but **without** the identity feature.
  Output dim is ``D * 2 * L`` for ``D`` direction components.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _sin_cos_features(x: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """``(..., D) -> (..., D, 2 * n_freqs)``: [sin f0, cos f0, sin f1, ...].

    Computed as sin/cos at the base frequency (pi) followed by double-angle
    recurrences (``sin 2t = 2 sin t cos t``, ``cos 2t = 1 - 2 sin^2 t``)
    instead of 2L direct transcendentals. On the TPU VPU this is ~4x cheaper
    at L=5 (tools/exp_glue.py: 2.15 ms -> 0.48 ms for the 524k-row fine
    encoding) and *numerically equivalent*: the max abs error vs float64 is
    2.7e-5 at octave 4 for BOTH formulations, because direct f32 evaluation
    is itself limited by rounding of the scaled argument ``2^k * pi * x``.
    """
    theta0 = x * math.pi
    sin_k = jnp.sin(theta0)
    cos_k = jnp.cos(theta0)
    feats = [sin_k, cos_k]
    for _ in range(n_freqs - 1):
        sin_k, cos_k = 2.0 * sin_k * cos_k, 1.0 - 2.0 * sin_k * sin_k
        feats += [sin_k, cos_k]
    return jnp.stack(feats, axis=-1)


def encode_xyz(xyz: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """Positional encoding with identity concat, coordinate-major layout.

    :param xyz: ``(..., 3)`` coordinates.
    :param n_freqs: number of octaves L. ``0`` => identity passthrough.
    :return: ``(..., 3 + 3 * 2 * L)`` (or ``(..., 3)`` when L == 0).

    Reference behavior: ``src/UtilsNeuralRadianceField.py:68-85``.
    """
    if n_freqs == 0:
        return xyz
    per_coord = jnp.concatenate(
        [xyz[..., None], _sin_cos_features(xyz, n_freqs)], axis=-1
    )  # (..., 3, 1 + 2L)
    return per_coord.reshape(*xyz.shape[:-1], 3 * (1 + 2 * n_freqs))


def encode_view_dirs(dirs: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """sin/cos-only encoding of view-direction components (no identity term).

    :param dirs: ``(..., D)`` direction components (D = n_angles + 1).
    :param n_freqs: number of octaves L.
    :return: ``(..., D * 2 * L)``.

    Reference behavior: ``src/UtilsNeuralRadianceField.py:52-65``.
    """
    d = dirs.shape[-1]
    return _sin_cos_features(dirs, n_freqs).reshape(*dirs.shape[:-1], d * 2 * n_freqs)


def xyz_encoding_dim(n_freqs: int) -> int:
    """Input width of the MLP xyz branch (reference ``src/NeRF.py:266,:312``)."""
    return 3 + 3 * 2 * n_freqs


def view_encoding_dim(n_freqs: int, n_angles: int) -> int:
    """Input width of the view-dir branch (reference ``src/NeRF.py:313-314``)."""
    return n_freqs * 2 * (n_angles + 1)
