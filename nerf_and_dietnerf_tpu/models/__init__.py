from nerf_and_dietnerf_tpu.models import mlp, nerf

__all__ = ["mlp", "nerf"]
