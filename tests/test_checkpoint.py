"""Checkpoint interop: Keras .h5 roundtrip, Orbax state save/restore, PSNR files."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_and_dietnerf_tpu.models import mlp, nerf
from nerf_and_dietnerf_tpu.models.mlp import MLPConfig
from nerf_and_dietnerf_tpu.train import checkpoint as ckpt


@pytest.fixture(params=["viewdir", "xyz_only"])
def config(request):
    return MLPConfig() if request.param == "viewdir" else MLPConfig(n_angles=0)


def test_h5_roundtrip(tmp_path, config):
    nerf_cfg = nerf.NeRFConfig(mlp=config)
    params = nerf.init_params(jax.random.PRNGKey(0), nerf_cfg)
    path = tmp_path / "weights.h5"
    ckpt.save_keras_h5(path, params, config)
    loaded = ckpt.load_keras_h5(path, config)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, loaded,
    )


def test_h5_roundtrip_coarse_only(tmp_path):
    config = MLPConfig()
    nerf_cfg = nerf.NeRFConfig(mlp=config, n_samples_fine=0)
    params = nerf.init_params(jax.random.PRNGKey(1), nerf_cfg)
    assert params["fine"] is None
    path = tmp_path / "weights.h5"
    ckpt.save_keras_h5(path, params, config)
    loaded = ckpt.load_keras_h5(path, config)
    assert loaded["fine"] is None
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params["coarse"], loaded["coarse"],
    )


def test_load_reference_checkpoint():
    """Import the reference's committed epoch-95 Alexander weights."""
    path = (
        "/root/reference/Results/50px_alexander_71pics_sphere_nerf_save_dir_4/"
        "saved_weights/NeRF_model_epoch_095.h5"
    )
    import os

    if not os.path.exists(path):
        pytest.skip("reference checkpoint not available")
    config = MLPConfig()
    params = ckpt.load_keras_h5(path, config)
    assert params["coarse"]["trunk"][0]["kernel"].shape == (33, 256)
    assert params["coarse"]["trunk"][4]["kernel"].shape == (289, 256)
    assert params["fine"]["sigma_out"]["kernel"].shape == (280, 1)
    # Loaded weights must actually drive the MLP.
    out = mlp.apply_mlp(
        params["coarse"], config,
        jnp.zeros((2, config.xyz_dim)), jnp.zeros((2, config.dir_dim)),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_orbax_full_state_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "opt": {"mu": jnp.ones((2, 3)), "nu": jnp.full((2, 3), 2.0)},
        "step": jnp.asarray(7),
    }
    mgr = ckpt.CheckpointManager(tmp_path / "ckpts")
    mgr.save(3, state)
    assert mgr.latest_step() == 3
    restored = mgr.restore(template=state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state, restored,
    )


def test_psnr_history_roundtrip(tmp_path):
    ckpt.save_psnr_history(tmp_path, 5, [1.0, 2.0], [3.0, 4.0])
    test, train = ckpt.load_psnr_history(tmp_path, 5)
    assert test == [1.0, 2.0] and train == [3.0, 4.0]
    assert ckpt.load_psnr_history(tmp_path, 99) == ([], [])


def test_path_conventions(tmp_path):
    assert str(ckpt.nerf_h5_path(tmp_path, 7)).endswith(
        "saved_weights/NeRF_model_epoch_007.h5"
    )
    assert str(ckpt.psnr_path(tmp_path, 95)).endswith(
        "saved_test_train_psnrs/psnrs_train_test_095.npy"
    )
