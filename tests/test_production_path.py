"""Guards against silent production-path regressions (VERDICT r2 #7).

The headline number depends on the default config actually routing through
the fused Pallas kernel and on eval renders using the fast backend; a typo'd
backend string or a refactor that quietly falls back to plain XLA would still
be *correct*, just slow. These tests fail on any such routing change.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_and_dietnerf_tpu.models import mlp as mlp_lib, nerf
from nerf_and_dietnerf_tpu.models.mlp import MLPConfig
from nerf_and_dietnerf_tpu.ops import raymarch_pallas

TINY_MLP = MLPConfig(hidden_dim=32, last_hidden_dim=16, n_freq_xyz=2, n_freq_dir=2)


def test_pallas_backend_resolves_to_fused_kernel():
    """`backend="pallas"` (what bench.py and the flagship configs run) must
    dispatch the fused kernel, and the default backend must stay plain XLA."""
    assert (
        nerf._mlp_apply(nerf.NeRFConfig(backend="pallas"))
        is raymarch_pallas.apply_mlp_fused
    )
    assert (
        nerf._mlp_apply(nerf.NeRFConfig(backend="pallas_mlp"))
        is raymarch_pallas.apply_mlp_fused
    )
    assert nerf._mlp_apply(nerf.NeRFConfig()) is mlp_lib.apply_mlp


def test_bench_config_routes_through_fused_kernel(monkeypatch):
    """End-to-end spy: a training_losses call with the production backend must
    execute apply_mlp_fused (catches routing bugs deeper than _mlp_apply)."""
    calls = []
    real = raymarch_pallas.apply_mlp_fused

    def spy(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(raymarch_pallas, "apply_mlp_fused", spy)
    config = nerf.NeRFConfig(
        mlp=TINY_MLP, n_samples_coarse=4, n_samples_fine=4,
        backend="pallas", compute_dtype=jnp.float32,
    )
    params = nerf.init_params(jax.random.PRNGKey(0), config)
    n = 8
    orig = jnp.zeros((n, 4)).at[:, 3].set(1.0)
    dirs = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(1), (n, 3)), jnp.zeros((n, 1))], -1
    )
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
    loss, _ = nerf.training_losses(
        params, config, jax.random.PRNGKey(3), orig, dirs, rgb
    )
    assert np.isfinite(float(loss))
    assert calls, "production backend did not route through apply_mlp_fused"


def test_bench_py_uses_production_backend():
    """bench.py must benchmark the production (pallas) path."""
    with open("bench.py") as f:
        src = f.read()
    assert 'NeRFConfig(backend="pallas")' in src


def _tiny_dataset_and_run(backend: str):
    from nerf_and_dietnerf_tpu.data.loaders import Dataset
    from nerf_and_dietnerf_tpu.utils.config import RunConfig

    rng = np.random.default_rng(0)
    ds = Dataset(
        images=rng.uniform(size=(2, 8, 8, 3)).astype(np.float32),
        camera_poses=np.stack([np.eye(4, dtype=np.float32)] * 2),
        field_of_view=0.8,
        near=0.5, far=3.0,
        average_c2w_before_recenter=np.eye(4), scale=1.0,
    )
    run = RunConfig(
        hidden_layer_dim=8, last_hidden_layer_dim=4,
        n_pos_enc_dim_xyz=2, n_pos_enc_view_dir=2,
        n_render_samples_coarse=2, n_render_samples_fine=2,
        n_rays_in_batch_train=32, n_epochs=1,
        backend=backend,
    )
    return ds, run


def test_eval_config_inherits_fast_backend_single_device(tmp_path):
    """Single-device trainers must run eval renders on the configured (fast)
    backend in float32 (VERDICT r2 #4: the XLA eval pin cost ~20% of flagship
    epoch wall-clock)."""
    from nerf_and_dietnerf_tpu.train.trainer import Trainer

    ds, run = _tiny_dataset_and_run("pallas")
    trainer = Trainer(run, ds, tmp_path)
    assert trainer.eval_config.backend == "pallas"
    assert trainer.eval_config.compute_dtype == jnp.float32
    assert trainer.eval_config.mesh is None
    assert not trainer.eval_config.fuse_compositing
    assert not trainer.eval_config.fuse_fine_loss


def test_eval_config_mesh_runs_inherit_backend_and_shard(tmp_path, monkeypatch):
    """Mesh trainers keep the fast backend for eval AND route every eval
    render through the tile-sharded path (VERDICT r3 #2: mesh runs must not
    render on one device)."""
    from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib, render_tiles
    from nerf_and_dietnerf_tpu.train.trainer import Trainer

    ds, run = _tiny_dataset_and_run("pallas")
    mesh = mesh_lib.make_mesh()
    trainer = Trainer(run, ds, tmp_path, mesh=mesh)
    assert trainer.eval_config.backend == "pallas"
    assert trainer.eval_config.compute_dtype == jnp.float32
    # The eval config itself carries no mesh — render_frame injects it so the
    # kernel runs shard_mapped only on the sharded path.
    assert trainer.eval_config.mesh is None

    calls = []
    real = render_tiles.render_image_sharded

    def spy(*args, **kwargs):
        calls.append(args[2])  # the mesh argument
        return real(*args, **kwargs)

    monkeypatch.setattr(render_tiles, "render_image_sharded", spy)
    trainer.render_eval_images(0)
    assert calls and calls[0] is mesh, (
        "mesh trainer eval render did not go through the tile-sharded path"
    )


def test_render_path_pallas_f32_matches_xla(tmp_path):
    """The eval/video render (render path, diagnostics=False) must be
    backend-invariant at f32 — the check that justifies switching eval off
    the XLA pin."""
    config_x = nerf.NeRFConfig(
        mlp=TINY_MLP, n_samples_coarse=6, n_samples_fine=8,
        backend="xla", compute_dtype=jnp.float32,
    )
    config_p = dataclasses.replace(config_x, backend="pallas")
    params = nerf.init_params(jax.random.PRNGKey(0), config_x)
    n = 16
    orig = jnp.zeros((n, 4)).at[:, 3].set(1.0)
    dirs = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(1), (n, 3)), jnp.zeros((n, 1))], -1
    )
    key = jax.random.PRNGKey(4)
    rx, zx = nerf.render(params, config_x, key, orig, dirs, diagnostics=False)
    rp, zp = nerf.render(params, config_p, key, orig, dirs, diagnostics=False)
    np.testing.assert_allclose(np.asarray(zx), np.asarray(zp), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rx.rgb), np.asarray(rp.rgb), rtol=1e-4, atol=1e-5
    )
