"""End-to-end Runner test: every task of a config executes on a tiny scene."""

import numpy as np
import pytest
import yaml

from nerf_and_dietnerf_tpu.data.loaders import Dataset
from nerf_and_dietnerf_tpu.tasks import runner as runner_lib
from nerf_and_dietnerf_tpu.viz import plots, video


def synthetic_dataset(n=4, h=10, w=10):
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(n, h, w, 3)).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * n)
    poses[:, 2, 3] = 2.0 + 0.2 * np.arange(n)
    poses[:, 0, 3] = 0.1 * np.arange(n)
    return Dataset(
        images=images, camera_poses=poses, field_of_view=0.8,
        near=0.5, far=3.0, average_c2w_before_recenter=np.eye(4), scale=1.0,
    )


CONFIG = {
    "dataset_type": "colmap",
    "dataset_location": "unused",
    "general_save_location": None,  # filled per test
    "tasks_to_perform": {
        "start_training": True,
        "render_and_save_test_left_to_right_video": True,
        "render_and_save_test_sphere_video": True,
        "render_and_save_test_path_video": True,
        "save_dataset_video": True,
        "save_plots_video": True,
        "create_plots_that_visualize_values_along_rays": True,
        "create_plot_that_visualize_rendering_between_2_images": True,
    },
    "neural_net": {
        "type_of_model": "NeRF",
        "hidden_layer_dim": 16,
        "last_hidden_layer_dim": 8,
        "n_pos_enc_dim_xyz": 2,
        "n_pos_enc_view_dir": 2,
        "n_angles_for_model": 2,
        "n_rays_in_batch_train": 60,
        "n_rays_in_batch_render": 100,
    },
    "render": {
        "n_render_samples_coarse": 4,
        "n_render_samples_fine": 4,
        "near_depth_render": 0.5,
        "far_depth_render": 3.0,
    },
    "training": {
        "n_epochs": 1,
        "optimizer_lr": 5.0e-4,
        "test_img_idx": 0,
        "idx_train_img_to_plot": 1,
    },
    "video": {
        "fps_plot_video": 2,
        "fps_render_video": 1,
        "fps_train_set_video": 2,
        "img_indices_for_path_video": [1, 2, 3],
    },
    "mesh": {"compute_dtype": "float32"},
}


@pytest.fixture
def patched_loader(monkeypatch):
    ds = synthetic_dataset()
    monkeypatch.setattr(
        runner_lib.loaders, "load_dataset", lambda *a, **k: ds
    )
    return ds


def test_runner_all_tasks(tmp_path, patched_loader):
    cfg = dict(CONFIG)
    cfg["general_save_location"] = str(tmp_path / "Results")
    config_path = tmp_path / "tiny_run.yaml"
    config_path.write_text(yaml.safe_dump(cfg))

    r = runner_lib.Runner(config_path)
    r.start()

    save = r.save_dir
    assert save.name == "tiny_run_save_dir_0"
    assert (save / "tiny_run.yaml").exists()  # config snapshot
    assert (save / "saved_weights" / "NeRF_model_epoch_001.h5").exists()
    assert (save / plots.PLOT_ITERATION_DIRNAME / "train_iteration_plots_001.jpg").exists()
    # Test-image snapshot at training start (reference src/ExecutionRun.py:177).
    assert (save / plots.PLOT_ITERATION_DIRNAME / plots.TEST_IMG_FILENAME).exists()
    vid = save / runner_lib.VIDEOS_DIRNAME
    for name in (
        video.FILENAME_RGB_L_TO_R, video.FILENAME_DEPTH_L_TO_R,
        video.FILENAME_RGB_SPHERE, video.FILENAME_DEPTH_SPHERE,
        video.FILENAME_RGB_PATH, video.FILENAME_DEPTH_PATH,
        video.FILENAME_TRAIN_SET, video.FILENAME_PLOTS,
    ):
        assert (vid / name).exists(), name
        assert (vid / name).stat().st_size > 0, name
    special = save / plots.SPECIAL_PLOTS_DIRNAME
    ray_plots = list(special.glob("ray_values_*.jpg"))
    assert len(ray_plots) == 3
    assert (special / "interpolation_between_2_images.jpg").exists()


def test_runner_resume_renders_without_training(tmp_path, patched_loader):
    """Rendering tasks load the epoch .h5 the way the reference's get_nerf
    does (src/ExecutionRun.py:216-232)."""
    cfg = dict(CONFIG)
    cfg["general_save_location"] = str(tmp_path / "Results")
    cfg["tasks_to_perform"] = {"start_training": True}
    config_path = tmp_path / "trainonly.yaml"
    config_path.write_text(yaml.safe_dump(cfg))
    r1 = runner_lib.Runner(config_path)
    r1.start()

    cfg2 = dict(cfg)
    cfg2["existing_save_dir_name"] = r1.save_dir.name
    cfg2["starting_epoch_number"] = 1
    cfg2["tasks_to_perform"] = {"save_dataset_video": True,
                                "render_and_save_test_left_to_right_video": True}
    cfg2["video"] = dict(CONFIG["video"])
    config_path2 = tmp_path / "trainonly2.yaml"
    config_path2.write_text(yaml.safe_dump(cfg2))
    r2 = runner_lib.Runner(config_path2)
    assert r2.save_dir == r1.save_dir
    r2.start()
    assert (r2.save_dir / runner_lib.VIDEOS_DIRNAME / video.FILENAME_RGB_L_TO_R).exists()


def test_plot_video_excludes_unnumbered_snapshot(tmp_path):
    """The plot video must include ONLY numbered epoch plots — the
    unnumbered test_img.jpg snapshot shares the directory and, if included,
    mis-sizes the writer so every real frame is silently dropped (reference
    filter: src/UtilsPlots.py:15,206-218). Caught by the end-to-end CLI
    drive: a 1-frame plots_video.avi."""
    import cv2

    plots_dir = tmp_path / "plot_iteration_images"
    plots_dir.mkdir()
    small = np.zeros((20, 30, 3), np.uint8)
    big = np.full((60, 90, 3), 128, np.uint8)
    cv2.imwrite(str(plots_dir / "test_img.jpg"), small)  # must be excluded
    cv2.imwrite(str(plots_dir / "train_iteration_plots_001.jpg"), big)
    cv2.imwrite(str(plots_dir / "train_iteration_plots_002.jpg"), big)

    assert video._numbered_images_in(plots_dir) == [
        "train_iteration_plots_001.jpg", "train_iteration_plots_002.jpg"
    ]
    out = tmp_path / "plots_video.avi"
    video.save_plot_video(2, plots_dir, out, downscale=1.0)
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 2
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 90


def test_mismatched_frame_sizes_fail_loudly(tmp_path):
    """cv2 silently drops wrong-sized frames; our writer must raise."""
    frames = [np.zeros((8, 8, 3)), np.zeros((16, 8, 3))]
    with pytest.raises(ValueError, match="frame size"):
        video.save_frames_as_video(tmp_path / "v.avi", frames, 2)


def test_runner_all_tasks_on_mesh(tmp_path, patched_loader, monkeypatch):
    """The full 8-task sweep on an 8-virtual-device mesh: training shards
    the ray batch, and every offline render (videos, ray-value diagnostics,
    interpolation) goes through the tile-sharded render path."""
    from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib, render_tiles

    cfg = dict(CONFIG)
    cfg["general_save_location"] = str(tmp_path / "Results")
    config_path = tmp_path / "tiny_mesh_run.yaml"
    config_path.write_text(yaml.safe_dump(cfg))

    sharded_calls = []
    real = render_tiles.render_image_sharded

    def spy(*args, **kwargs):
        sharded_calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(render_tiles, "render_image_sharded", spy)

    mesh = mesh_lib.make_mesh()
    r = runner_lib.Runner(config_path, mesh=mesh)
    r.start()

    save = r.save_dir
    vid = save / runner_lib.VIDEOS_DIRNAME
    for name in (
        video.FILENAME_RGB_SPHERE, video.FILENAME_DEPTH_SPHERE,
        video.FILENAME_RGB_PATH, video.FILENAME_TRAIN_SET, video.FILENAME_PLOTS,
    ):
        assert (vid / name).exists(), name
        assert (vid / name).stat().st_size > 0, name
    special = save / plots.SPECIAL_PLOTS_DIRNAME
    assert len(list(special.glob("ray_values_*.jpg"))) == 3
    assert (special / "interpolation_between_2_images.jpg").exists()
    # Eval renders + every video/plot frame must have gone through the
    # sharded path (l_to_r 2 + sphere 2 + path 2 + interpolation 16 +
    # ray-values 1 + per-epoch evals).
    assert len(sharded_calls) >= 23, len(sharded_calls)
