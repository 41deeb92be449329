"""TPU-native NeRF / DietNeRF framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Sahar-E/NeRF-and-DietNeRF reference (TensorFlow, single GPU):

- ``core``     — pure-JAX camera/ray math, stratified + hierarchical sampling,
                 positional encodings, volume rendering (alpha compositing).
- ``models``   — the NeRF MLP family (xyz-only and xyz+view-dir variants),
                 NeRF / DietNeRF training logic, JAX ViT-B/32 embedder.
- ``ops``      — fused Pallas TPU kernels for the ray-march hot path.
- ``parallel`` — device-mesh sharding: data-parallel ray batches for training,
                 tile-parallel full-frame rendering for eval/serving.
- ``data``     — Blender ``cam_data.json`` and COLMAP ``poses_bounds.npy``
                 loaders, on-device permuted ray pipeline.
- ``train``    — optax/orbax train state, epoch driver, checkpointing.
- ``tasks``    — YAML-config-driven task runner (train, videos, plots)
                 compatible with the reference's config schema.
- ``viz``      — epoch plots, per-ray diagnostics, video writers.
"""

__version__ = "0.1.0"
