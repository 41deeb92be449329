"""Positional encodings: dimensions and the exact coordinate-major layout."""

import math

import jax.numpy as jnp
import numpy as np

from nerf_and_dietnerf_tpu.core import encoding


def test_xyz_encoding_layout():
    xyz = jnp.array([[0.1, -0.2, 0.3]])
    out = np.asarray(encoding.encode_xyz(xyz, 2))
    assert out.shape == (1, 3 + 3 * 2 * 2)
    expect = []
    for c in [0.1, -0.2, 0.3]:
        expect.append(c)
        for k in range(2):
            t = (2.0 ** k) * math.pi * c
            expect += [math.sin(t), math.cos(t)]
    np.testing.assert_allclose(out[0], expect, rtol=1e-5, atol=1e-6)


def test_xyz_encoding_zero_freqs_is_identity():
    xyz = jnp.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    out = np.asarray(encoding.encode_xyz(xyz, 0))
    np.testing.assert_array_equal(out, np.asarray(xyz))


def test_view_encoding_layout_no_identity():
    dirs = jnp.array([[0.5, -1.5]])
    out = np.asarray(encoding.encode_view_dirs(dirs, 3))
    assert out.shape == (1, 2 * 2 * 3)
    expect = []
    for c in [0.5, -1.5]:
        for k in range(3):
            t = (2.0 ** k) * math.pi * c
            expect += [math.sin(t), math.cos(t)]
    np.testing.assert_allclose(out[0], expect, rtol=1e-5, atol=1e-6)


def test_dims_match_reference_model_inputs():
    # 50px Alexander config: L_xyz=5, L_dir=4, n_angles=2
    assert encoding.xyz_encoding_dim(5) == 33
    assert encoding.view_encoding_dim(4, 2) == 24
    assert encoding.view_encoding_dim(4, 1) == 16


def test_recurrence_matches_float64_direct_at_full_depth():
    """The double-angle recurrence (core/encoding._sin_cos_features) must
    track float64 direct evaluation as tightly as direct f32 sin/cos does:
    both are limited by f32 rounding of the scaled argument ``2^k pi c``
    (~2.7e-5 abs at octave 4 for |c| <= 8). Wide range, flagship L=5."""
    rng = np.random.RandomState(7)
    xyz = rng.uniform(-8.0, 8.0, size=(4096, 3)).astype(np.float32)
    out = np.asarray(encoding.encode_xyz(jnp.asarray(xyz), 5))

    x64 = xyz.astype(np.float64)
    expect = [x64[..., :, None]]
    for k in range(5):
        t = (2.0**k) * math.pi * x64[..., :, None]
        expect += [np.sin(t), np.cos(t)]
    # already interleaved per coordinate: [c, sin f0, cos f0, sin f1, ...]
    expect = np.concatenate(expect, axis=-1).reshape(xyz.shape[0], 33)

    np.testing.assert_allclose(out, expect, atol=1e-4, rtol=0)
