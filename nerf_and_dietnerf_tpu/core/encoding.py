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
    """``(..., D) -> (..., D, 2 * n_freqs)``: [sin f0, cos f0, sin f1, ...]."""
    freqs = (2.0 ** jnp.arange(n_freqs, dtype=jnp.float32)) * math.pi
    theta = x[..., None] * freqs  # (..., D, L)
    return jnp.stack([jnp.sin(theta), jnp.cos(theta)], axis=-1).reshape(
        *theta.shape[:-1], 2 * n_freqs
    )


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
