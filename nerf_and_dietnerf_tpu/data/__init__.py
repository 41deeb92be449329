from nerf_and_dietnerf_tpu.data.loaders import Dataset, load_blender, load_colmap, load_dataset
from nerf_and_dietnerf_tpu.data.pipeline import RayDataset

__all__ = ["Dataset", "RayDataset", "load_blender", "load_colmap", "load_dataset"]
