"""Worker for the multi-process distributed CPU drill.

One rank of an N-process `jax.distributed` run (CPU backend, a few virtual
devices per process). Exercises, with process_count > 1 for real, the paths
that single-process tests can only simulate (SURVEY §2b row 1; the reference
has no distributed runtime at all — its only cross-machine channel is
`gsutil rsync`, src/ExecutionRun.py:154-167):

- `jax.distributed.initialize` + a global mesh spanning both processes,
- `data.pipeline.RayDataset` per-rank slices fed through
  `parallel.mesh.make_global_batch` into the sharded train step,
- tile-sharded eval renders across processes (parallel/render_tiles),
- multi-process Orbax save/restore (every rank participates),
- kill + resume: phase "resume" starts fresh processes from the checkpoint.

Each rank writes `result_rank{i}.json` with its per-epoch metrics; the test
(tests/test_multiprocess.py) asserts rank parity, single-vs-multi-process
loss parity, and straight-vs-resumed bit-equality.

Usage (spawned by tests/test_multiprocess.py):
    python tools/multiprocess_worker.py --coordinator localhost:PORT \
        --num-processes 2 --process-id 0 --out DIR \
        --epochs 2 [--start-epoch 2] [--total-epochs 3]
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--out", required=True, help="shared artifact directory")
    p.add_argument("--epochs", type=int, default=2, help="train through this epoch")
    p.add_argument(
        "--start-epoch", type=int, default=-1,
        help=">=0: resume from this epoch's checkpoint (starting_epoch_number)",
    )
    p.add_argument(
        "--diet", action="store_true",
        help="DietNeRF trainer (tiny embedder, interval 3): exercises the "
        "per-step diet dispatch with vit_params/c2w/targets crossing into "
        "the multihost-sharded jit",
    )
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    assert jax.process_count() == args.num_processes, jax.process_count()

    import numpy as np

    from nerf_and_dietnerf_tpu.data.loaders import Dataset
    from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib
    from nerf_and_dietnerf_tpu.train.trainer import Trainer
    from nerf_and_dietnerf_tpu.utils.config import RunConfig

    # Deterministic synthetic scene — identical on every rank by seed.
    rng = np.random.default_rng(0)
    h = w = 12
    n_imgs = 5  # >= 4 so the DietNeRF slerp pose sampler has 3 train poses
    images = rng.uniform(size=(n_imgs, h, w, 3)).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * n_imgs)
    poses[:, 2, 3] = 2.0 + 0.2 * np.arange(n_imgs)
    poses[:, 0, 3] = 0.1 * np.arange(n_imgs)
    ds = Dataset(
        images=images, camera_poses=poses, field_of_view=0.8,
        near=0.5, far=3.0, average_c2w_before_recenter=np.eye(4), scale=1.0,
    )

    run = RunConfig(
        hidden_layer_dim=16, last_hidden_layer_dim=8,
        n_pos_enc_dim_xyz=2, n_pos_enc_view_dir=2,
        n_render_samples_coarse=4, n_render_samples_fine=4,
        near_depth_render=0.5, far_depth_render=3.0,
        n_rays_in_batch_train=64, n_rays_in_batch_render=128,
        n_epochs=args.epochs, test_img_idx=0, idx_train_img_to_plot=1,
        compute_dtype="float32",
        on_device_epoch=False,  # force the per-step make_global_batch path
        starting_epoch_number=args.start_epoch,
    )

    mesh = mesh_lib.make_mesh()  # all global devices, both processes
    save_dir = f"{args.out}/shared_run"
    if args.diet:
        from nerf_and_dietnerf_tpu.models import vit as vit_lib
        from nerf_and_dietnerf_tpu.models.dietnerf import DietConfig
        from nerf_and_dietnerf_tpu.train.diet_trainer import DietTrainer

        run = RunConfig(**{
            **run.__dict__, "type_of_model": "DietNeRF",
            "allow_random_embedder": True, "on_device_epoch": False,
        })
        tiny_diet = DietConfig(
            interval=3, cs_image_size=16, cs_samples=4, cs_chunk_rays=64,
            vit=vit_lib.ViTConfig(
                image_size=32, patch_size=16, hidden_dim=32, n_layers=2,
                n_heads=4, mlp_dim=64,
            ),
        )
        trainer = DietTrainer(run, ds, save_dir, mesh=mesh, diet=tiny_diet)
    else:
        trainer = Trainer(run, ds, save_dir, mesh=mesh)
    if args.start_epoch >= 0:
        assert trainer.start_epoch == args.start_epoch

    history = trainer.fit(log=None)

    # Params fingerprint for cross-rank equality checks.
    leaves = jax.tree.leaves(jax.device_get(trainer.state.params))
    fingerprint = float(sum(float(np.abs(l).sum()) for l in leaves))

    result = {
        "rank": args.process_id,
        "num_processes": args.num_processes,
        "global_devices": jax.device_count(),
        "epochs": [s.epoch for s in history],
        "losses": [s.loss for s in history],
        "psnr_test": [s.psnr_test for s in history],
        "psnr_train": [s.psnr_train for s in history],
        "params_fingerprint": fingerprint,
        "orbax_latest": trainer.ckpt.latest_step(),
    }
    tag = "sp" if args.num_processes == 1 else f"rank{args.process_id}"
    phase = f"_from{args.start_epoch}" if args.start_epoch >= 0 else ""
    with open(f"{args.out}/result_{tag}{phase}.json", "w") as f:
        json.dump(result, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
