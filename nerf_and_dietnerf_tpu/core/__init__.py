from nerf_and_dietnerf_tpu.core import cameras, encoding, pose_math, rendering, sampling

__all__ = ["cameras", "encoding", "pose_math", "rendering", "sampling"]
