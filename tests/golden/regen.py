#!/usr/bin/env python
"""Regenerate the committed golden tensors (ONLY after an intentional
semantic change — these lock the pipeline's conventions)."""
import jax

jax.config.update("jax_platforms", "cpu")

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax.numpy as jnp
import numpy as np

from nerf_and_dietnerf_tpu.core import cameras
from nerf_and_dietnerf_tpu.data import loaders
from nerf_and_dietnerf_tpu.models import nerf
from nerf_and_dietnerf_tpu.models.mlp import MLPConfig
from nerf_and_dietnerf_tpu.train import checkpoint as ckpt

ASSETS = "/root/reference/Assets/AlexanderColmap/50px_71pics"
H5 = (
    "/root/reference/Results/50px_alexander_71pics_sphere_nerf_save_dir_4/"
    "saved_weights/NeRF_model_epoch_095.h5"
)

ds = loaders.load_colmap(ASSETS)
cfg = nerf.NeRFConfig(
    mlp=MLPConfig(hidden_dim=256, last_hidden_dim=128, leaky_relu_alpha=0.05,
                  n_freq_xyz=5, n_freq_dir=4, n_angles=2),
    n_samples_coarse=64, n_samples_fine=128,
    compute_dtype=jnp.float32, near=ds.near, far=ds.far,
)
params = ckpt.load_keras_h5(H5, cfg.mlp)
orig, dirs = cameras.rays_for_image(ds.height, ds.width, ds.field_of_view, ds.camera_poses[0])
idx = np.linspace(0, orig.shape[0] - 1, 64).astype(np.int64)
result, z = nerf.render(params, cfg, None, orig[idx], dirs[idx])
out = os.path.join(os.path.dirname(__file__), "alexander50_fixedz.npz")
np.savez(out, ray_indices=idx, rgb=np.asarray(result.rgb, np.float32),
         weights=np.asarray(result.weights, np.float32), z=np.asarray(z, np.float32))
print("regenerated", out)
