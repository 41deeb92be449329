"""The NeRF radiance-field MLP family, as explicit parameter pytrees.

Two architectures, selected by ``n_angles`` (reference ``src/NeRF.py:66-78``):

- **xyz-only** (``n_angles == 0``, reference ``src/NeRF.py:248-288``):
  8 x Dense(hidden, LeakyReLU(alpha)) with the encoded input re-concatenated
  after layer 4; sigma head = Dense(1) off the 8th activation; rgb branch =
  Dense(hidden, leaky) -> Dense(last_hidden, leaky) -> Dense(3).
- **xyz + view dirs** (``n_angles in (1, 2)``, reference ``src/NeRF.py:290-340``):
  same trunk; then ``feat = concat(h8, encoded_dirs)``; rgb branch =
  Dense(last_hidden, leaky)(feat) -> Dense(3); **sigma head = Dense(1)(feat)**
  — i.e. in this variant sigma *does* see the view-direction encoding. That is
  a quirk of the reference architecture (``src/NeRF.py:330-336``: the sigma
  Dense is applied to the post-concat tensor) and is reproduced deliberately;
  weight-import parity depends on it.

Parameters are plain nested dicts of ``jnp`` arrays (a pytree), not a Flax
module: the fused Pallas kernel consumes the same leaves directly, and the
Keras ``.h5`` importer writes into the same structure.

Concat-free formulation: every ``concat([a, b]) @ W`` in the reference is
expressed here as ``a @ W[:dim_a] + b @ W[dim_a:]`` — identical math, but it
keeps matmul shapes static and padding-friendly for the MXU and avoids
materializing concatenated activations.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from nerf_and_dietnerf_tpu.core import encoding

Params = Dict[str, Any]

N_TRUNK_LAYERS = 8
SKIP_AFTER = 4  # encoded input re-joins the trunk after this many layers


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    """Architecture hyperparameters (YAML ``neural_net`` section,
    reference ``src/ConfigurationKeys.py:64-92``)."""

    hidden_dim: int = 256
    last_hidden_dim: int = 128
    leaky_relu_alpha: float = 0.05
    n_freq_xyz: int = 5
    n_freq_dir: int = 4
    n_angles: int = 2
    # Initial bias of the relu-density head. 0.0 is the reference-exact
    # Keras default. On black-background frontal scenes a zero-bias draw can
    # be born with (near-)all-negative sigma preactivations — relu' kills the
    # density gradient and the net renders black forever (the init lottery:
    # 4 of 5 seeds dead on 256px robot 8-pic l_to_r,
    # runs/robot8_diet_ab_r05/RESULTS.md). A small positive bias keeps a
    # healthy fraction of the head alive for EVERY draw (YAML key
    # `sigma_bias_init`).
    sigma_bias_init: float = 0.0

    @property
    def xyz_dim(self) -> int:
        return encoding.xyz_encoding_dim(self.n_freq_xyz)

    @property
    def dir_dim(self) -> int:
        return encoding.view_encoding_dim(self.n_freq_dir, self.n_angles)

    @property
    def uses_view_dirs(self) -> bool:
        return self.n_angles > 0


def _glorot(key, shape):
    """Glorot-uniform init — the Keras ``Dense`` default, so freshly-initialized
    models are distribution-identical to the reference."""
    fan_in, fan_out = shape
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def _dense_params(key, d_in: int, d_out: int) -> Params:
    return {"kernel": _glorot(key, (d_in, d_out)), "bias": jnp.zeros((d_out,), jnp.float32)}


def init_params(key, config: MLPConfig) -> Params:
    """Initialize one radiance-field MLP (one of coarse / fine)."""
    keys = iter(jax.random.split(key, 16))
    h = config.hidden_dim
    xyz = config.xyz_dim

    trunk = []
    d_in = xyz
    for layer in range(N_TRUNK_LAYERS):
        if layer == SKIP_AFTER:
            d_in = xyz + h  # skip concat [enc_xyz, h4]  (reference src/NeRF.py:272,:324)
        trunk.append(_dense_params(next(keys), d_in, h))
        d_in = h

    params: Params = {"trunk": trunk}
    if config.uses_view_dirs:
        feat = h + config.dir_dim  # concat [h8, enc_dir]  (reference src/NeRF.py:330)
        params["rgb_hidden"] = _dense_params(next(keys), feat, config.last_hidden_dim)
        params["rgb_out"] = _dense_params(next(keys), config.last_hidden_dim, 3)
        params["sigma_out"] = _dense_params(next(keys), feat, 1)
    else:
        params["rgb_hidden0"] = _dense_params(next(keys), h, h)
        params["rgb_hidden"] = _dense_params(next(keys), h, config.last_hidden_dim)
        params["rgb_out"] = _dense_params(next(keys), config.last_hidden_dim, 3)
        params["sigma_out"] = _dense_params(next(keys), h, 1)
    if config.sigma_bias_init:
        params["sigma_out"]["bias"] = jnp.full((1,), config.sigma_bias_init, jnp.float32)
    return params


def leaky_relu(x, alpha: float):
    """LeakyReLU with the reference's alpha (0.05 by default,
    reference ``src/NeRF.py:264,:310``)."""
    return jnp.where(x >= 0, x, alpha * x)


def _dense(p: Params, x, dtype):
    return (
        jnp.dot(x, p["kernel"].astype(dtype), preferred_element_type=jnp.float32)
        + p["bias"]
    )


def _split_dense(p: Params, a, b, dim_a: int, dtype):
    """``concat([a, b]) @ W + bias`` without the concat."""
    w = p["kernel"].astype(dtype)
    return (
        jnp.dot(a, w[:dim_a], preferred_element_type=jnp.float32)
        + jnp.dot(b, w[dim_a:], preferred_element_type=jnp.float32)
        + p["bias"]
    )


def apply_mlp(
    params: Params,
    config: MLPConfig,
    enc_xyz: jnp.ndarray,
    enc_dir: jnp.ndarray | None = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Run the radiance MLP on pre-encoded inputs.

    :param enc_xyz: ``(n, xyz_dim)`` positional-encoded sample positions.
    :param enc_dir: ``(n, dir_dim)`` encoded view dirs (required iff the
        config uses them).
    :param compute_dtype: matmul operand dtype (``bfloat16`` for the fast
        path; accumulation is always float32 via ``preferred_element_type``).
    :return: ``(n, 4)`` float32 raw ``[rgb logits, sigma logit]``
        (the reference forces float32 outputs under mixed precision —
        ``src/NeRF.py:282-285``).
    """
    alpha = config.leaky_relu_alpha
    x = enc_xyz.astype(compute_dtype)
    h = x
    for layer in range(N_TRUNK_LAYERS):
        p = params["trunk"][layer]
        if layer == SKIP_AFTER:
            pre = _split_dense(p, x, h.astype(compute_dtype), config.xyz_dim, compute_dtype)
        else:
            pre = _dense(p, h.astype(compute_dtype), compute_dtype)
        h = leaky_relu(pre, alpha)

    if config.uses_view_dirs:
        if enc_dir is None:
            raise ValueError("this MLP config requires encoded view directions")
        d = enc_dir.astype(compute_dtype)
        hc = h.astype(compute_dtype)
        rgb_h = leaky_relu(
            _split_dense(params["rgb_hidden"], hc, d, config.hidden_dim, compute_dtype), alpha
        )
        rgb = _dense(params["rgb_out"], rgb_h.astype(compute_dtype), compute_dtype)
        sigma = _split_dense(params["sigma_out"], hc, d, config.hidden_dim, compute_dtype)
    else:
        hc = h.astype(compute_dtype)
        r = leaky_relu(_dense(params["rgb_hidden0"], hc, compute_dtype), alpha)
        r = leaky_relu(_dense(params["rgb_hidden"], r.astype(compute_dtype), compute_dtype), alpha)
        rgb = _dense(params["rgb_out"], r.astype(compute_dtype), compute_dtype)
        sigma = _dense(params["sigma_out"], hc, compute_dtype)

    return jnp.concatenate([rgb, sigma], axis=-1).astype(jnp.float32)


def count_params(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
