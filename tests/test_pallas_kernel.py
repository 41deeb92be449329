"""Fused Pallas MLP kernel vs the plain-XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_and_dietnerf_tpu.models import mlp as m
from nerf_and_dietnerf_tpu.ops import raymarch_pallas as rp

CASES = [
    m.MLPConfig(hidden_dim=32, last_hidden_dim=16, n_freq_xyz=2, n_freq_dir=2, n_angles=2),
    m.MLPConfig(hidden_dim=32, last_hidden_dim=16, n_freq_xyz=2, n_angles=0),
]


def _inputs(cfg, n, key=1):
    kx, kd = jax.random.split(jax.random.PRNGKey(key))
    ex = jax.random.normal(kx, (n, cfg.xyz_dim), jnp.float32)
    ed = (
        jax.random.normal(kd, (n, cfg.dir_dim), jnp.float32)
        if cfg.uses_view_dirs
        else None
    )
    return ex, ed


@pytest.mark.parametrize("cfg", CASES, ids=["view_dirs", "xyz_only"])
def test_forward_matches_xla(cfg):
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    n = 130  # non-multiple of the tile => exercises padding
    ex, ed = _inputs(cfg, n)
    ref = m.apply_mlp(params, cfg, ex, ed, compute_dtype=jnp.float32)
    got = rp.apply_mlp_fused(params, cfg, ex, ed, compute_dtype=jnp.float32)
    assert got.shape == (n, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("cfg", CASES, ids=["view_dirs", "xyz_only"])
def test_backward_matches_xla(cfg):
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    n = 96
    ex, ed = _inputs(cfg, n)
    g = jax.random.normal(jax.random.PRNGKey(3), (n, 4), jnp.float32)

    def loss(apply, p, x, d):
        return jnp.sum(apply(p, cfg, x, d, compute_dtype=jnp.float32) * g)

    args = (params, ex, ed)
    argnums = (0, 1, 2) if cfg.uses_view_dirs else (0, 1)
    gr = jax.grad(lambda *a: loss(m.apply_mlp, *a), argnums=argnums)(*args)
    gg = jax.grad(lambda *a: loss(rp.apply_mlp_fused, *a), argnums=argnums)(*args)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gg)):
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-4
        )


def test_kernel_usable_inside_render(monkeypatch):
    """End-to-end: the pallas backend renders the same image as the XLA one."""
    from nerf_and_dietnerf_tpu.models import nerf

    base = dict(
        mlp=CASES[0], n_samples_coarse=4, n_samples_fine=4,
        compute_dtype=jnp.float32,
    )
    cfg_x = nerf.NeRFConfig(**base, backend="xla")
    cfg_p = nerf.NeRFConfig(**base, backend="pallas")
    params = nerf.init_params(jax.random.PRNGKey(0), cfg_x)
    rng = np.random.default_rng(0)
    orig = jnp.asarray(
        np.concatenate([rng.normal(size=(8, 3)), np.ones((8, 1))], -1), jnp.float32
    )
    dirs = jnp.asarray(
        np.concatenate([rng.normal(size=(8, 3)), np.zeros((8, 1))], -1), jnp.float32
    )
    ra, _ = nerf.render(params, cfg_x, jax.random.PRNGKey(1), orig, dirs)
    rb, _ = nerf.render(params, cfg_p, jax.random.PRNGKey(1), orig, dirs)
    np.testing.assert_allclose(np.asarray(rb.rgb), np.asarray(ra.rgb), atol=1e-4)
