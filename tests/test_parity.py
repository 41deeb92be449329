"""End-to-end parity harness vs the TF reference.

The reference repo commits a finished training run
(``Results/50px_alexander_71pics_sphere_nerf_save_dir_4``): epoch-95 weights
plus the PSNR history (test 27.83 dB / train 32.46 dB at epoch 95 — BASELINE.md).
Importing those exact weights and rendering through *our* pipeline must
reproduce those numbers: every convention along the way (ray generation,
encoding layout, MLP wiring, sampling, compositing) has to match or the PSNR
collapses. RNG streams differ from TF's, so tolerances allow the stratified /
hierarchical jitter noise (~±0.3 dB run-to-run).

Runs in float32 on CPU (the parity mode); bf16 is the fast path, benched
separately.
"""

import os

import jax
import numpy as np
import pytest

from nerf_and_dietnerf_tpu.core import rendering
from nerf_and_dietnerf_tpu.data import loaders
from nerf_and_dietnerf_tpu.models import nerf
from nerf_and_dietnerf_tpu.models.mlp import MLPConfig
from nerf_and_dietnerf_tpu.train import checkpoint as ckpt

RUN_DIR = "/root/reference/Results/50px_alexander_71pics_sphere_nerf_save_dir_4"
H5 = f"{RUN_DIR}/saved_weights/NeRF_model_epoch_095.h5"
PSNRS = f"{RUN_DIR}/saved_test_train_psnrs/psnrs_train_test_095.npy"
ASSETS = "/root/reference/Assets/AlexanderColmap/50px_71pics"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(H5) and os.path.exists(ASSETS)),
    reason="reference artifacts unavailable",
)

# Config of the committed run (config_files/50px_alexander_71pics_sphere_nerf.yaml).
CONFIG = nerf.NeRFConfig(
    mlp=MLPConfig(
        hidden_dim=256, last_hidden_dim=128, leaky_relu_alpha=0.05,
        n_freq_xyz=5, n_freq_dir=4, n_angles=2,
    ),
    n_samples_coarse=64,
    n_samples_fine=128,
    compute_dtype=jax.numpy.float32,
)


@pytest.fixture(scope="module")
def scene():
    ds = loaders.load_colmap(ASSETS)
    params = ckpt.load_keras_h5(H5, CONFIG.mlp)
    cfg = nerf.NeRFConfig(
        **{**CONFIG.__dict__, "near": ds.near, "far": ds.far}
    )
    return ds, params, cfg


def test_reference_weights_reproduce_test_psnr(scene):
    ds, params, cfg = scene
    test_idx = 0  # training.test_img_idx in the run's config
    result, _ = nerf.render_image(
        params, cfg, jax.random.PRNGKey(0),
        ds.camera_poses[test_idx], ds.field_of_view, ds.height, ds.width,
        chunk_size=2500,
    )
    got = float(rendering.psnr(result.rgb, ds.images[test_idx]))
    committed_test, _ = np.load(PSNRS)
    want = committed_test[-1]  # 27.83 dB
    # Our float32 render beats the reference's float16 mixed-precision eval
    # renders by ~1.8 dB with its own weights (29.59 dB measured); the window
    # is our own measured value +- stratified/hierarchical RNG noise. The
    # deterministic fixed-z goldens (tests/test_golden.py) lock the exact
    # conventions; this asserts end-to-end quality in the same regime.
    ours = 29.59
    assert got >= want - 0.3, f"test PSNR {got:.2f} below committed {want:.2f}"
    assert abs(got - ours) <= 0.4, (
        f"test PSNR {got:.2f} drifted from our measured f32 value {ours:.2f}"
    )


def test_reference_weights_reproduce_train_psnr(scene):
    ds, params, cfg = scene
    train_idx = 4  # training.idx_train_img_to_plot
    result, _ = nerf.render_image(
        params, cfg, jax.random.PRNGKey(1),
        ds.camera_poses[train_idx], ds.field_of_view, ds.height, ds.width,
        chunk_size=2500,
    )
    got = float(rendering.psnr(result.rgb, ds.images[train_idx]))
    _, committed_train = np.load(PSNRS)
    want = committed_train[-1]  # 32.46 dB
    assert abs(got - want) < 0.5, f"train PSNR {got:.2f} vs committed {want:.2f}"
