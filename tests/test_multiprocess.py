"""True multi-process distributed drill: 2 real `jax.distributed` processes.

Everything else in the suite simulates multi-chip with virtual devices inside
ONE process; these tests spawn real OS processes with a real coordination
service (CPU backend, 2 virtual devices per process => 4 global devices) and
assert:

- the sharded train step over `make_global_batch` produces the SAME loss
  trajectory as a single-process run on the same key (the per-rank
  `RayDataset` slices reassemble into the same global batch),
- both ranks observe identical metrics (replicated out-shardings),
- multi-process Orbax checkpointing works and a kill + fresh-process resume
  reproduces the straight-through run bit-for-bit (deterministic
  PRNGKey(epoch) design),
- the `--distributed` CLI flag boots the coordination service.

Reference analog: none — the reference is single-GPU by construction
(src/ExecutionRun.py:154-167 is file sync, not a distributed runtime).
SURVEY §2b row 1 makes this a first-class TPU-build deliverable.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tools" / "multiprocess_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env(local_devices: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        env.get("PYTHONPATH", "") + os.pathsep + str(REPO)
    ).lstrip(os.pathsep)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    return env


def _spawn_workers(out: Path, n_procs: int, local_devices: int, extra_args):
    port = _free_port()
    procs = []
    for rank in range(n_procs):
        cmd = [
            sys.executable, str(WORKER),
            "--coordinator", f"localhost:{port}",
            "--num-processes", str(n_procs),
            "--process-id", str(rank),
            "--out", str(out),
        ] + list(extra_args)
        procs.append(
            subprocess.Popen(
                cmd, env=_worker_env(local_devices), cwd=str(REPO),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for p, stdout in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{stdout[-4000:]}"
    return outputs


def _load(out: Path, name: str) -> dict:
    with open(out / name) as f:
        return json.load(f)


@pytest.mark.slow
def test_two_process_parity_and_resume(tmp_path):
    # Phase 1: 2 processes x 2 devices, train epochs 1-2, checkpoint, exit
    # (the "kill" — the processes genuinely die).
    _spawn_workers(tmp_path, 2, 2, ["--epochs", "2"])
    r0 = _load(tmp_path, "result_rank0.json")
    r1 = _load(tmp_path, "result_rank1.json")
    assert r0["global_devices"] == 4 and r1["global_devices"] == 4
    assert r0["epochs"] == [1, 2]
    assert r0["orbax_latest"] == 2

    # Both ranks must observe identical replicated metrics and params.
    np.testing.assert_array_equal(r0["losses"], r1["losses"])
    np.testing.assert_array_equal(r0["psnr_test"], r1["psnr_test"])
    assert r0["params_fingerprint"] == r1["params_fingerprint"]

    # Phase 2: FRESH processes resume from the multi-process Orbax/h5
    # checkpoint and train epoch 3.
    _spawn_workers(
        tmp_path, 2, 2, ["--epochs", "3", "--start-epoch", "2"]
    )
    res0 = _load(tmp_path, "result_rank0_from2.json")
    res1 = _load(tmp_path, "result_rank1_from2.json")
    assert res0["epochs"] == [3]
    np.testing.assert_array_equal(res0["losses"], res1["losses"])
    assert res0["params_fingerprint"] == res1["params_fingerprint"]

    # Single-process reference: 1 process x 4 devices (same global device
    # count), straight through epochs 1-3, separate artifact dir.
    sp_dir = tmp_path / "sp"
    sp_dir.mkdir()
    _spawn_workers(sp_dir, 1, 4, ["--epochs", "3"])
    sp = _load(sp_dir, "result_sp.json")
    assert sp["epochs"] == [1, 2, 3]

    # Multi-process epochs 1-2 must match the single-process trajectory, and
    # the resumed epoch 3 must match the straight-through epoch 3 — the
    # deterministic PRNGKey(epoch) design makes all of this exact on one
    # platform (any drift is a data-sharding or resume bug).
    np.testing.assert_allclose(r0["losses"], sp["losses"][:2], rtol=1e-6)
    np.testing.assert_allclose(r0["psnr_test"], sp["psnr_test"][:2], rtol=1e-5)
    np.testing.assert_allclose(res0["losses"], sp["losses"][2:], rtol=1e-6)
    np.testing.assert_allclose(res0["psnr_test"], sp["psnr_test"][2:], rtol=1e-5)

    # Bit-exact resume equivalence on the persisted PSNR history files
    # (written by rank 0): straight-through vs killed-and-resumed.
    mp_hist = np.load(
        tmp_path / "shared_run" / "saved_test_train_psnrs"
        / "psnrs_train_test_003.npy"
    )
    sp_hist = np.load(
        sp_dir / "shared_run" / "saved_test_train_psnrs"
        / "psnrs_train_test_003.npy"
    )
    np.testing.assert_allclose(mp_hist, sp_hist, rtol=1e-5)


@pytest.mark.slow
def test_cli_distributed_flag(tmp_path):
    """`main.py --distributed` boots the coordination service from the JAX_*
    env triple and runs a (tiny) 2-process training end to end."""
    import yaml

    # A tiny on-disk blender-format dataset so the real loader runs.
    data_dir = tmp_path / "scene"
    data_dir.mkdir()
    rng = np.random.default_rng(1)
    frames = []
    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 not available")
    for i in range(3):
        name = f"img_{i}.png"
        img = (rng.uniform(size=(10, 10, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(data_dir / name), img)
        c2w = np.eye(4)
        c2w[2, 3] = 2.0 + 0.2 * i
        frames.append(
            {"filename": name, "transformation_matrix": c2w.tolist()}
        )
    with open(data_dir / "cam_data.json", "w") as f:
        json.dump(
            {
                "focal_length": 50.0,
                "field_of_view": 0.8,
                "frames": frames,
            },
            f,
        )

    save_root = tmp_path / "Results"
    cfg = {
        "dataset_type": "blender",
        "dataset_location": str(data_dir),
        "general_save_location": str(save_root),
        "tasks_to_perform": {"start_training": True},
        "neural_net": {
            "hidden_layer_dim": 16, "last_hidden_layer_dim": 8,
            "n_pos_enc_dim_xyz": 2, "n_pos_enc_view_dir": 2,
            "n_rays_in_batch_train": 60, "n_rays_in_batch_render": 100,
        },
        "render": {
            "n_render_samples_coarse": 4, "n_render_samples_fine": 4,
            "near_depth_render": 0.5, "far_depth_render": 3.0,
        },
        "training": {"n_epochs": 1, "test_img_idx": 0,
                     "idx_train_img_to_plot": 1},
        "mesh": {"compute_dtype": "float32", "on_device_epoch": False},
    }
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    port = _free_port()
    procs = []
    for rank in range(2):
        env = _worker_env(local_devices=2)
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(rank)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "nerf_and_dietnerf_tpu.main",
                    str(cfg_path), "--distributed", "--platform", "cpu",
                ],
                env=env, cwd=str(REPO),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for p, stdout in zip(procs, outputs):
        assert p.returncode == 0, f"CLI worker failed:\n{stdout[-4000:]}"

    # Both ranks adopted the SAME auto-increment save dir; rank 0 wrote the
    # reference-format artifacts.
    save_dir = save_root / "tiny_save_dir_0"
    assert save_dir.is_dir()
    assert not (save_root / "tiny_save_dir_1").exists()
    assert (save_dir / "saved_weights" / "NeRF_model_epoch_001.h5").exists()
    assert (save_dir / "orbax").is_dir()


@pytest.mark.slow
def test_two_process_dietnerf(tmp_path):
    """The DietNeRF per-step dispatch path under a real 2-process mesh: the
    host-sampled novel pose, target embedding, and (frozen) vit_params all
    cross into the multihost-sharded diet step; both ranks must agree."""
    _spawn_workers(tmp_path, 2, 2, ["--epochs", "2", "--diet"])
    r0 = _load(tmp_path, "result_rank0.json")
    r1 = _load(tmp_path, "result_rank1.json")
    np.testing.assert_array_equal(r0["losses"], r1["losses"])
    assert r0["params_fingerprint"] == r1["params_fingerprint"]

    sp_dir = tmp_path / "sp"
    sp_dir.mkdir()
    _spawn_workers(sp_dir, 1, 4, ["--epochs", "2", "--diet"])
    sp = _load(sp_dir, "result_sp.json")
    np.testing.assert_allclose(r0["losses"], sp["losses"], rtol=1e-6)
