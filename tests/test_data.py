"""Data loaders and the ray pipeline (uses the reference's bundled assets)."""

import os

import jax
import numpy as np
import pytest

from nerf_and_dietnerf_tpu.data import loaders, pipeline

ALEXANDER_50PX = "/root/reference/Assets/AlexanderColmap/50px_71pics"
ROBOT_100PX = "/root/reference/Assets/RobotBlender/image_views_sphere/100px_72pics"


def _require(path):
    if not os.path.exists(path):
        pytest.skip(f"asset not available: {path}")


def test_colmap_loader_invariants():
    _require(ALEXANDER_50PX)
    ds = loaders.load_colmap(ALEXANDER_50PX)
    assert ds.images.shape == (71, 50, 50, 3)
    assert ds.camera_poses.shape == (71, 4, 4)
    assert ds.images.dtype == np.float32
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    # Unit-sphere invariant: max camera radius == 1.
    radii = np.linalg.norm(ds.camera_poses[:, :3, 3], axis=-1)
    np.testing.assert_allclose(radii.max(), 1.0, rtol=1e-5)
    assert 0.0 < ds.near < ds.far
    assert 0.0 < ds.field_of_view < np.pi
    # Bottom row of every pose is [0,0,0,1].
    np.testing.assert_allclose(ds.camera_poses[:, 3], [[0, 0, 0, 1]] * 71, atol=1e-7)


def test_blender_loader_invariants():
    _require(ROBOT_100PX)
    ds = loaders.load_blender(ROBOT_100PX, near=2.0, far=6.0)
    assert ds.images.ndim == 4 and ds.images.shape[-1] == 3
    radii = np.linalg.norm(ds.camera_poses[:, :3, 3], axis=-1)
    np.testing.assert_allclose(radii.max(), 1.0, rtol=1e-5)
    # Bounds were scaled by the same unit-sphere factor.
    np.testing.assert_allclose(ds.near, 2.0 * ds.scale, rtol=1e-6)
    np.testing.assert_allclose(ds.far, 6.0 * ds.scale, rtol=1e-6)


def test_load_dataset_dispatch_and_windows_paths():
    _require(ALEXANDER_50PX)
    win_path = ALEXANDER_50PX.replace("/", "\\")
    ds = loaders.load_dataset("colmap", win_path)
    assert len(ds) == 71
    with pytest.raises(ValueError):
        loaders.load_dataset("nonsense", ALEXANDER_50PX)
    with pytest.raises(ValueError):
        loaders.load_dataset("blender", ALEXANDER_50PX)  # missing bounds


def test_train_test_split_indices():
    assert loaders.train_test_split_indices(5, 2) == [0, 1, 3, 4]
    assert loaders.train_test_split_indices(6, 0, subset_indices=[0, 2, 4]) == [2, 4]


def _tiny_scene(n=3, h=4, w=5):
    rng = np.random.default_rng(0)
    images = rng.random((n, h, w, 3)).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * n)
    poses[:, 0, 3] = np.arange(n)
    return images, poses


def test_ray_table_and_pixel_alignment():
    images, poses = _tiny_scene()
    orig, dirs, rgb = pipeline.build_ray_table(images, poses, 1.0)
    assert orig.shape == (60, 4) and dirs.shape == (60, 4) and rgb.shape == (60, 3)
    # rgb rows are the flattened pixels, image-major then row-major.
    np.testing.assert_array_equal(rgb, images.reshape(-1, 3))
    # origins of image i are its translation column.
    np.testing.assert_allclose(orig[:20, 0], 0.0)
    np.testing.assert_allclose(orig[20:40, 0], 1.0)


def test_ray_dataset_epoch_iteration():
    images, poses = _tiny_scene()
    ds = pipeline.RayDataset(images, poses, 1.0, batch_size=16)
    assert ds.batches_per_epoch == 60 // 16  # remainder dropped, matching ref
    batches = list(ds.epoch(jax.random.PRNGKey(0)))
    assert len(batches) == 3
    for o, d, r in batches:
        assert o.shape == (16, 4) and d.shape == (16, 4) and r.shape == (16, 3)
    # All rays within an epoch are distinct (true permutation, no replacement).
    seen = np.concatenate([r for _, _, r in batches])
    assert len(np.unique(seen, axis=0)) == len(seen) or images.size < len(seen)


def test_ray_dataset_epoch_determinism_and_freshness():
    images, poses = _tiny_scene()
    ds = pipeline.RayDataset(images, poses, 1.0, batch_size=16)
    a = next(iter(ds.epoch(jax.random.PRNGKey(7))))
    b = next(iter(ds.epoch(jax.random.PRNGKey(7))))
    c = next(iter(ds.epoch(jax.random.PRNGKey(8))))
    np.testing.assert_array_equal(a[2], b[2])
    assert not np.array_equal(a[2], c[2])


def test_ray_dataset_host_sharding_partitions_batch():
    images, poses = _tiny_scene()
    full = pipeline.RayDataset(images, poses, 1.0, batch_size=16)
    shard0 = pipeline.RayDataset(images, poses, 1.0, 16, process_index=0, process_count=2)
    shard1 = pipeline.RayDataset(images, poses, 1.0, 16, process_index=1, process_count=2)
    key = jax.random.PRNGKey(3)
    fb = next(iter(full.epoch(key)))
    s0 = next(iter(shard0.epoch(key)))
    s1 = next(iter(shard1.epoch(key)))
    np.testing.assert_array_equal(np.concatenate([s0[2], s1[2]]), fb[2])
    with pytest.raises(ValueError):
        pipeline.RayDataset(images, poses, 1.0, batch_size=15, process_count=2)


def test_ray_dataset_multihost_slicing():
    """Each host takes a disjoint, deterministic slice of every global batch;
    together they reconstruct it exactly (no communication needed)."""
    import jax
    from nerf_and_dietnerf_tpu.data.pipeline import RayDataset

    rng = np.random.default_rng(0)
    images = rng.uniform(size=(2, 4, 4, 3)).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
    poses[:, 2, 3] = [2.0, 2.5]

    hosts = [
        RayDataset(images, poses, 0.8, batch_size=16, process_index=i, process_count=4)
        for i in range(4)
    ]
    solo = RayDataset(images, poses, 0.8, batch_size=16)
    key = jax.random.PRNGKey(3)
    solo_batches = list(solo.epoch(key))
    host_batches = [list(h.epoch(key)) for h in hosts]
    assert len(solo_batches) == 2  # 32 rays / 16
    for b in range(len(solo_batches)):
        merged = np.concatenate([host_batches[i][b][2] for i in range(4)], axis=0)
        np.testing.assert_array_equal(merged, solo_batches[b][2])
        for i in range(4):
            assert host_batches[i][b][0].shape[0] == 4  # 16 / 4 hosts
