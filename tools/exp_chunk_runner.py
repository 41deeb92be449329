"""Measure the offline-render chunk fix through the PRODUCTION runner path.

VERDICT r04 weak #2: committed 256px video renders ran at the stock YAML
chunk (4096, sized for the reference's GPU memory, src/NeRF.py:211-218),
paying ~3 ms dispatch tax x 16 chunks/frame; BENCH_RENDER.json's optimum is
32768. The fix (utils/config.RunConfig.offline_chunk_size) auto-selects
32768 for eval/video renders. This drives `tasks/runner.Runner._render_frame`
— the exact code path videos use — over real sphere-orbit poses with the
committed RobotRed-256px epoch-51 weights, at the stock chunk vs the auto
chunk, and prints one JSON line per arm.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_chunk_runner.py
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time
from pathlib import Path

import jax
import numpy as np

REPO = Path(__file__).resolve().parent.parent
RUN_DIR = REPO / "runs" / "robotred256_r04"


def main() -> None:
    from nerf_and_dietnerf_tpu.tasks import runner as runner_lib
    from nerf_and_dietnerf_tpu.train import checkpoint

    tmp = Path(tempfile.mkdtemp(prefix="chunk_ab_"))
    save_dir = tmp / "Results" / "rr256_save_dir"
    (save_dir / "saved_weights").mkdir(parents=True)
    shutil.copy(
        RUN_DIR / "NeRF_model_epoch_051.h5",
        save_dir / "saved_weights" / "NeRF_model_epoch_051.h5",
    )

    # The committed run's config, retargeted at the prepared save dir.
    import yaml

    cfg = yaml.safe_load((RUN_DIR / "config.yaml").read_text())
    cfg["general_save_location"] = str(save_dir.parent)
    cfg["existing_save_dir_name"] = save_dir.name
    cfg["starting_epoch_number"] = 51
    cfg["tasks_to_perform"] = {k: False for k in cfg["tasks_to_perform"]}
    cfg_path = tmp / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    r = runner_lib.Runner(cfg_path)
    params = r.load_params()
    poses = r.sphere_path_matrices()[:10]
    key = jax.random.PRNGKey(0)

    results = []
    for label, chunk in (("stock_yaml", 4096), ("auto", None)):
        r.run.offline_render_chunk = chunk
        effective = r.run.offline_chunk_size()
        # Warm up / compile.
        res, z = r._render_frame(params, key, poses[0])
        float(np.asarray(res.rgb).sum())
        t0 = time.perf_counter()
        for i, c2w in enumerate(poses):
            res, z = r._render_frame(params, jax.random.fold_in(key, i), c2w)
            # Host materialization fence with the video path's actual
            # transfers: rgb frame + on-device-reduced expected depth
            # (tasks/runner.render_video) — NOT the raw (h,w,S) z tensor,
            # which would add a ~50 MB/frame tunnel transfer the production
            # path never pays.
            depth = (res.weights * z).sum(axis=-1)
            float(np.asarray(res.rgb).sum() + np.asarray(depth).sum())
        dt = (time.perf_counter() - t0) / len(poses)
        line = {
            "metric": "runner_256px_video_frame_seconds",
            "arm": label,
            "chunk_size": effective,
            "value": round(dt, 4),
            "unit": "s/frame",
            "rays_per_sec": round(256 * 256 / dt, 1),
        }
        results.append(line)
        print(json.dumps(line), flush=True)

    speedup = results[0]["value"] / results[1]["value"]
    print(json.dumps({"speedup_auto_vs_stock": round(speedup, 3)}))


if __name__ == "__main__":
    main()
