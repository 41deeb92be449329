"""Multi-chip parallelism: device mesh, sharded training, tiled eval renders.

The reference is strictly single-GPU (SURVEY §2: no NCCL/MPI/horovod anywhere);
data parallelism over rays, tile-sharded frame rendering, and the ICI-backed
gradient all-reduce are first-class *new* components of the TPU build.
"""
