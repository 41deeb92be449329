"""Fused Pallas MLP kernel vs the plain-XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_and_dietnerf_tpu.models import mlp as m
from nerf_and_dietnerf_tpu.ops import raymarch_pallas as rp
from nerf_and_dietnerf_tpu.ops import research_kernels as rk

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


# --------------------------------------------------------------------------- #
# shard_map-wrapped kernel on the virtual device mesh                          #
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("cfg", CASES, ids=["view_dirs", "xyz_only"])
def test_sharded_forward_and_grads_match_xla(cfg):
    """Mesh path: rows sharded over 'data', params replicated, weight-grad
    psum in the custom backward. Values and every grad leaf must match the
    plain-XLA path."""
    from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh()
    n_dev = mesh.shape[mesh_lib.DATA_AXIS]
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    n = 16 * n_dev
    ex, ed = _inputs(cfg, n)
    g = jax.random.normal(jax.random.PRNGKey(3), (n, 4), jnp.float32)

    def sharded(p, c, x, d, compute_dtype):
        return rp.apply_mlp_fused_sharded(
            p, c, x, d, compute_dtype, mesh=mesh, axis=mesh_lib.DATA_AXIS
        )

    ref = m.apply_mlp(params, cfg, ex, ed, compute_dtype=jnp.float32)
    got = jax.jit(lambda p, x, d: sharded(p, cfg, x, d, jnp.float32))(params, ex, ed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)

    def loss(apply, p, x, d):
        return jnp.sum(apply(p, cfg, x, d, compute_dtype=jnp.float32) * g)

    args = (params, ex, ed)
    argnums = (0, 1, 2) if cfg.uses_view_dirs else (0, 1)
    gr = jax.grad(lambda *a: loss(m.apply_mlp, *a), argnums=argnums)(*args)
    gg = jax.jit(jax.grad(lambda *a: loss(sharded, *a), argnums=argnums))(*args)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gg)):
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-4
        )


def test_sharded_training_step_runs_on_mesh():
    """End-to-end: backend='pallas' with config.mesh set trains on the
    virtual mesh (the trainer's multi-chip fused-kernel path)."""
    import dataclasses

    from nerf_and_dietnerf_tpu.models import nerf
    from nerf_and_dietnerf_tpu.models.nerf import NeRFConfig
    from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib
    from nerf_and_dietnerf_tpu.train import train_step as ts

    mesh = mesh_lib.make_mesh()
    n_dev = mesh.shape[mesh_lib.DATA_AXIS]
    config = NeRFConfig(
        mlp=m.MLPConfig(hidden_dim=32, last_hidden_dim=16, n_freq_xyz=2, n_freq_dir=2),
        n_samples_coarse=4,
        n_samples_fine=4,
        compute_dtype=jnp.float32,
        backend="pallas",
        mesh=mesh,
        mesh_axis=mesh_lib.DATA_AXIS,
    )
    opt = ts.make_optimizer(5e-4)
    state = ts.init_train_state(jax.random.PRNGKey(0), config, opt)
    n = 4 * n_dev
    orig = jnp.zeros((n, 4)).at[:, 3].set(1.0)
    dirs = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(1), (n, 3)), jnp.zeros((n, 1))], axis=-1
    )
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))

    step = ts.make_train_step(config, opt, mesh=mesh)
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    batch = mesh_lib.shard_batch(mesh, orig, dirs, rgb)
    state, metrics = step(state, jax.random.PRNGKey(3), batch)
    assert np.isfinite(float(metrics["loss"]))

    # Grad parity vs the same config on the xla backend.
    xla_config = dataclasses.replace(config, backend="xla", mesh=None)
    g_pallas = jax.grad(
        lambda p: nerf.training_losses(p, config, jax.random.PRNGKey(5), orig, dirs, rgb)[0]
    )(jax.device_get(state.params))
    g_xla = jax.grad(
        lambda p: nerf.training_losses(p, xla_config, jax.random.PRNGKey(5), orig, dirs, rgb)[0]
    )(jax.device_get(state.params))
    for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_pallas)):
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-3)


# --------------------------------------------------------------------------- #
# Fully fused ray-march kernel (point-gen + encoding in-kernel)               #
# --------------------------------------------------------------------------- #


def _rays(n_rays, S, key=1):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    orig = jax.random.normal(k1, (n_rays, 4))
    dirs = jax.random.normal(k2, (n_rays, 4))
    z = jax.random.uniform(k3, (n_rays, S), minval=1.0, maxval=5.0)
    return orig, dirs, z


def _xla_reference(cfg, params, orig, dirs, z):
    from nerf_and_dietnerf_tpu.core import cameras, encoding

    n_rays, S = z.shape
    pts = cameras.sample_points_along_rays(orig, dirs, z)[..., :3].reshape(-1, 3)
    ex = encoding.encode_xyz(pts, cfg.n_freq_xyz)
    ed = None
    if cfg.uses_view_dirs:
        vc = cameras.view_direction_components(dirs, cfg.n_angles)
        e = encoding.encode_view_dirs(vc, cfg.n_freq_dir)
        ed = jnp.broadcast_to(e[:, None, :], (n_rays, S, e.shape[-1])).reshape(
            n_rays * S, -1
        )
    return m.apply_mlp(params, cfg, ex, ed, compute_dtype=jnp.float32).reshape(
        n_rays, S, 4
    )


@pytest.mark.parametrize("cfg", CASES, ids=["view_dirs", "xyz_only"])
def test_raymarch_fused_matches_xla(cfg):
    """Fwd and grads (params AND z — the fine-sampling path) vs the XLA
    pipeline, with a ray count that is not a multiple of the ray tile."""
    from nerf_and_dietnerf_tpu.core import cameras

    params = m.init_params(jax.random.PRNGKey(0), cfg)
    n_rays, S = 13, 6
    orig, dirs, z = _rays(n_rays, S)
    vc = (
        cameras.view_direction_components(dirs, cfg.n_angles)
        if cfg.uses_view_dirs
        else None
    )

    ref = _xla_reference(cfg, params, orig, dirs, z)
    got = rk.apply_raymarch_fused(params, cfg, orig, dirs, vc, z, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4)

    g = jax.random.normal(jax.random.PRNGKey(5), (n_rays, S, 4))
    gr = jax.grad(
        lambda p, zz: jnp.sum(_xla_reference(cfg, p, orig, dirs, zz) * g),
        argnums=(0, 1),
    )(params, z)
    gn = jax.grad(
        lambda p, zz: jnp.sum(
            rk.apply_raymarch_fused(p, cfg, orig, dirs, vc, zz, jnp.float32) * g
        ),
        argnums=(0, 1),
    )(params, z)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gn)):
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-4
        )


def test_raymarch_fused_sharded_matches_single():
    from nerf_and_dietnerf_tpu.core import cameras
    from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib

    cfg = CASES[0]
    mesh = mesh_lib.make_mesh()
    n_dev = mesh.shape[mesh_lib.DATA_AXIS]
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    n_rays, S = 2 * n_dev, 6
    orig, dirs, z = _rays(n_rays, S)
    vc = cameras.view_direction_components(dirs, cfg.n_angles)

    ref = _xla_reference(cfg, params, orig, dirs, z)
    got = jax.jit(
        lambda p, o, d, v, zz: rk.apply_raymarch_fused_sharded(
            p, cfg, o, d, v, zz, jnp.float32, mesh=mesh, axis=mesh_lib.DATA_AXIS
        )
    )(params, orig, dirs, vc, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4)

    g = jax.random.normal(jax.random.PRNGKey(5), (n_rays, S, 4))
    gr = jax.grad(
        lambda p, zz: jnp.sum(_xla_reference(cfg, p, orig, dirs, zz) * g),
        argnums=(0, 1),
    )(params, z)
    gn = jax.jit(
        jax.grad(
            lambda p, zz: jnp.sum(
                rk.apply_raymarch_fused_sharded(
                    p, cfg, orig, dirs, vc, zz, jnp.float32,
                    mesh=mesh, axis=mesh_lib.DATA_AXIS,
                )
                * g
            ),
            argnums=(0, 1),
        )
    )(params, z)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gn)):
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-4
        )


# --------------------------------------------------------------------------- #
# Fused ray-march + compositing kernel (the train fast path)                  #
# --------------------------------------------------------------------------- #


def _xla_composited(cfg, params, orig, dirs, z):
    from nerf_and_dietnerf_tpu.core import rendering

    raw = _xla_reference(cfg, params, orig, dirs, z)
    res = rendering.composite(raw, z)
    return res.rgb, res.weights


@pytest.mark.parametrize("cfg", CASES, ids=["view_dirs", "xyz_only"])
def test_raymarch_composited_matches_xla(cfg):
    """Fwd (pixels + weights) and grads (params AND z, with cotangents on
    BOTH outputs — the coarse pass's weights feed the resampler) vs the XLA
    render_rays + composite pipeline."""
    from nerf_and_dietnerf_tpu.core import cameras

    params = m.init_params(jax.random.PRNGKey(0), cfg)
    n_rays, S = 13, 6
    orig, dirs, z = _rays(n_rays, S)
    vc = (
        cameras.view_direction_components(dirs, cfg.n_angles)
        if cfg.uses_view_dirs
        else None
    )

    rgb_ref, w_ref = _xla_composited(cfg, params, orig, dirs, z)
    rgb, w = rk.apply_raymarch_composited(params, cfg, orig, dirs, vc, z, jnp.float32)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=3e-4, rtol=3e-4)

    g_rgb = jax.random.normal(jax.random.PRNGKey(5), (n_rays, 3))
    g_w = jax.random.normal(jax.random.PRNGKey(6), (n_rays, S))

    def xla_loss(p, zz):
        r, ww = _xla_composited(cfg, p, orig, dirs, zz)
        return jnp.sum(r * g_rgb) + jnp.sum(ww * g_w)

    def kern_loss(p, zz):
        r, ww = rk.apply_raymarch_composited(p, cfg, orig, dirs, vc, zz, jnp.float32)
        return jnp.sum(r * g_rgb) + jnp.sum(ww * g_w)

    gr = jax.grad(xla_loss, argnums=(0, 1))(params, z)
    gn = jax.grad(kern_loss, argnums=(0, 1))(params, z)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gn)):
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-4
        )


def test_raymarch_composited_opaque_rays_nan_free():
    """Rays whose transmittance underflows to exactly 0 (huge sigma) must
    produce finite grads — the backward recurrence is division-free."""
    cfg = CASES[1]  # xyz-only
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    # Blow up the sigma head so alpha saturates to 1 on early samples.
    params = jax.tree.map(lambda x: x, params)
    params["sigma_out"]["bias"] = params["sigma_out"]["bias"] + 1e6
    n_rays, S = 4, 6
    orig, dirs, z = _rays(n_rays, S)
    z = jnp.sort(z, axis=-1)  # monotone depths: T underflows to exactly 0

    def loss(p, zz):
        r, ww = rk.apply_raymarch_composited(p, cfg, orig, dirs, None, zz, jnp.float32)
        return jnp.sum(r) + jnp.sum(ww)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(params, z)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_raymarch_composited_sharded_matches_single():
    from nerf_and_dietnerf_tpu.core import cameras
    from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib

    cfg = CASES[0]
    mesh = mesh_lib.make_mesh()
    n_dev = mesh.shape[mesh_lib.DATA_AXIS]
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    n_rays, S = 2 * n_dev, 6
    orig, dirs, z = _rays(n_rays, S)
    vc = cameras.view_direction_components(dirs, cfg.n_angles)

    rgb_ref, w_ref = _xla_composited(cfg, params, orig, dirs, z)
    rgb, w = jax.jit(
        lambda p, o, d, v, zz: rk.apply_raymarch_composited_sharded(
            p, cfg, o, d, v, zz, jnp.float32, mesh=mesh, axis=mesh_lib.DATA_AXIS
        )
    )(params, orig, dirs, vc, z)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=3e-4, rtol=3e-4)

    g_rgb = jax.random.normal(jax.random.PRNGKey(5), (n_rays, 3))
    g_w = jax.random.normal(jax.random.PRNGKey(6), (n_rays, S))

    def xla_loss(p, zz):
        r, ww = _xla_composited(cfg, p, orig, dirs, zz)
        return jnp.sum(r * g_rgb) + jnp.sum(ww * g_w)

    def kern_loss(p, zz):
        r, ww = rk.apply_raymarch_composited_sharded(
            p, cfg, orig, dirs, vc, zz, jnp.float32, mesh=mesh, axis=mesh_lib.DATA_AXIS
        )
        return jnp.sum(r * g_rgb) + jnp.sum(ww * g_w)

    gr = jax.grad(xla_loss, argnums=(0, 1))(params, z)
    gn = jax.jit(jax.grad(kern_loss, argnums=(0, 1)))(params, z)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gn)):
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-4
        )


# --------------------------------------------------------------------------- #
# Fused MLP + compositing kernel over XLA encodings (production train path)  #
# --------------------------------------------------------------------------- #


def _enc_inputs(cfg, orig, dirs, z):
    from nerf_and_dietnerf_tpu.core import cameras, encoding

    pts = cameras.sample_points_along_rays(orig, dirs, z)[..., :3].reshape(-1, 3)
    ex = encoding.encode_xyz(pts, cfg.n_freq_xyz)
    ed = None
    if cfg.uses_view_dirs:
        vc = cameras.view_direction_components(dirs, cfg.n_angles)
        ed = encoding.encode_view_dirs(vc, cfg.n_freq_dir)  # per-RAY
    return ex, ed


@pytest.mark.parametrize("cfg", CASES, ids=["view_dirs", "xyz_only"])
def test_mlp_composited_matches_xla(cfg):
    """Fwd (pixels + weights) and grads (params, encodings AND z with
    cotangents on both outputs) vs the XLA pipeline, non-multiple-of-tile
    ray count."""
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    n_rays, S = 13, 6
    orig, dirs, z = _rays(n_rays, S)

    rgb_ref, w_ref = _xla_composited(cfg, params, orig, dirs, z)

    def kernel_out(p, zz):
        ex, ed = _enc_inputs(cfg, orig, dirs, zz)
        return rk.apply_mlp_composited(p, cfg, ex, ed, zz, jnp.float32)

    rgb, w = kernel_out(params, z)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=3e-4, rtol=3e-4)

    g_rgb = jax.random.normal(jax.random.PRNGKey(5), (n_rays, 3))
    g_w = jax.random.normal(jax.random.PRNGKey(6), (n_rays, S))

    def xla_loss(p, zz):
        r, ww = _xla_composited(cfg, p, orig, dirs, zz)
        return jnp.sum(r * g_rgb) + jnp.sum(ww * g_w)

    def kern_loss(p, zz):
        r, ww = kernel_out(p, zz)
        return jnp.sum(r * g_rgb) + jnp.sum(ww * g_w)

    gr = jax.grad(xla_loss, argnums=(0, 1))(params, z)
    gn = jax.grad(kern_loss, argnums=(0, 1))(params, z)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gn)):
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-4
        )


def test_mlp_composited_backend_training_losses_match():
    """backend='pallas' + fuse_compositing trains with XLA-identical loss and
    grads (the full training objective, coarse+fine, resampling included)."""
    import dataclasses

    from nerf_and_dietnerf_tpu.models import nerf

    cfg_x = nerf.NeRFConfig(
        mlp=CASES[0], n_samples_coarse=5, n_samples_fine=7,
        compute_dtype=jnp.float32, backend="xla",
    )
    cfg_p = dataclasses.replace(cfg_x, backend="pallas", fuse_compositing=True)
    params = nerf.init_params(jax.random.PRNGKey(0), cfg_x)
    n = 9
    orig, dirs, _ = _rays(n, 4)
    rgb = jax.random.uniform(jax.random.PRNGKey(7), (n, 3))

    def loss(cfg, p):
        return nerf.training_losses(p, cfg, jax.random.PRNGKey(11), orig, dirs, rgb)[0]

    lx, gx = jax.value_and_grad(lambda p: loss(cfg_x, p))(params)
    lp, gp = jax.value_and_grad(lambda p: loss(cfg_p, p))(params)
    np.testing.assert_allclose(float(lp), float(lx), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-4
        )


def test_mlp_composited_sharded_matches_single():
    from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib

    cfg = CASES[0]
    mesh = mesh_lib.make_mesh()
    n_dev = mesh.shape[mesh_lib.DATA_AXIS]
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    n_rays, S = 2 * n_dev, 6
    orig, dirs, z = _rays(n_rays, S)

    rgb_ref, w_ref = _xla_composited(cfg, params, orig, dirs, z)

    def kernel_out(p, zz):
        ex, ed = _enc_inputs(cfg, orig, dirs, zz)
        return rk.apply_mlp_composited_sharded(
            p, cfg, ex, ed, zz, jnp.float32, mesh=mesh, axis=mesh_lib.DATA_AXIS
        )

    rgb, w = jax.jit(kernel_out)(params, z)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=3e-4, rtol=3e-4)

    g_rgb = jax.random.normal(jax.random.PRNGKey(5), (n_rays, 3))
    g_w = jax.random.normal(jax.random.PRNGKey(6), (n_rays, S))

    def xla_loss(p, zz):
        r, ww = _xla_composited(cfg, p, orig, dirs, zz)
        return jnp.sum(r * g_rgb) + jnp.sum(ww * g_w)

    def kern_loss(p, zz):
        r, ww = kernel_out(p, zz)
        return jnp.sum(r * g_rgb) + jnp.sum(ww * g_w)

    gr = jax.grad(xla_loss, argnums=(0, 1))(params, z)
    gn = jax.jit(jax.grad(kern_loss, argnums=(0, 1)))(params, z)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gn)):
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-4
        )


def test_mlp_composited_opaque_rays_nan_free():
    """Opaque rays (T underflows to exactly 0) must keep grads finite through
    the log-step suffix-scan backward."""
    cfg = CASES[1]
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    params["sigma_out"]["bias"] = params["sigma_out"]["bias"] + 1e6
    n_rays, S = 4, 6
    orig, dirs, z = _rays(n_rays, S)
    z = jnp.sort(z, axis=-1)

    def loss(p, zz):
        ex, ed = _enc_inputs(cfg, orig, dirs, zz)
        r, ww = rk.apply_mlp_composited(p, cfg, ex, ed, zz, jnp.float32)
        return jnp.sum(r) + jnp.sum(ww)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(params, z)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


# --------------------------------------------------------------------------- #
# Fused fine-pass loss kernel (fwd + MSE + full backward in one invocation)  #
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("cfg", CASES, ids=["view_dirs", "xyz_only"])
def test_mlp_loss_composited_matches_xla(cfg):
    """The one-kernel fine objective: value AND grads (params + z) must match
    mean((composite(MLP) - target)^2) through the XLA pipeline."""
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    n_rays, S = 13, 6
    orig, dirs, z = _rays(n_rays, S)
    target = jax.random.uniform(jax.random.PRNGKey(9), (n_rays, 3))

    def xla_loss(p, zz):
        r, _ = _xla_composited(cfg, p, orig, dirs, zz)
        return jnp.mean(jnp.square(r - target))

    def kern_loss(p, zz):
        ex, ed = _enc_inputs(cfg, orig, dirs, zz)
        return rk.apply_mlp_loss_composited(
            p, cfg, ex, ed, zz, dirs, target, jnp.float32
        )

    lx = float(xla_loss(params, z))
    lk = float(kern_loss(params, z))
    np.testing.assert_allclose(lk, lx, atol=1e-6, rtol=1e-5)

    gr = jax.grad(xla_loss, argnums=(0, 1))(params, z)
    gn = jax.grad(kern_loss, argnums=(0, 1))(params, z)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gn)):
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-4
        )


def test_fuse_fine_loss_training_losses_match():
    """backend='pallas' + fuse_fine_loss trains with XLA-identical loss and
    grads through the FULL objective (coarse + resample + fine)."""
    import dataclasses

    from nerf_and_dietnerf_tpu.models import nerf

    cfg_x = nerf.NeRFConfig(
        mlp=CASES[0], n_samples_coarse=5, n_samples_fine=7,
        compute_dtype=jnp.float32, backend="xla",
    )
    cfg_p = dataclasses.replace(cfg_x, backend="pallas", fuse_fine_loss=True)
    params = nerf.init_params(jax.random.PRNGKey(0), cfg_x)
    n = 9
    orig, dirs, _ = _rays(n, 4)
    rgb = jax.random.uniform(jax.random.PRNGKey(7), (n, 3))

    def loss(cfg, p):
        return nerf.training_losses(p, cfg, jax.random.PRNGKey(11), orig, dirs, rgb)[0]

    lx, gx = jax.value_and_grad(lambda p: loss(cfg_x, p))(params)
    lp, gp = jax.value_and_grad(lambda p: loss(cfg_p, p))(params)
    np.testing.assert_allclose(float(lp), float(lx), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-4
        )


def test_fuse_fine_loss_respects_stop_fine_z_grad():
    """With stop_fine_z_grad the coarse grads must match the XLA stop-z path
    (the resampler VJP is cut; only the coarse MSE reaches the coarse net)."""
    import dataclasses

    from nerf_and_dietnerf_tpu.models import nerf

    cfg_x = nerf.NeRFConfig(
        mlp=CASES[1], n_samples_coarse=5, n_samples_fine=7,
        compute_dtype=jnp.float32, backend="xla", stop_fine_z_grad=True,
    )
    cfg_p = dataclasses.replace(cfg_x, backend="pallas", fuse_fine_loss=True)
    params = nerf.init_params(jax.random.PRNGKey(0), cfg_x)
    n = 9
    orig, dirs, _ = _rays(n, 4)
    rgb = jax.random.uniform(jax.random.PRNGKey(7), (n, 3))

    def loss(cfg, p):
        return nerf.training_losses(p, cfg, jax.random.PRNGKey(11), orig, dirs, rgb)[0]

    gx = jax.grad(lambda p: loss(cfg_x, p))(params)
    gp = jax.grad(lambda p: loss(cfg_p, p))(params)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-4
        )
