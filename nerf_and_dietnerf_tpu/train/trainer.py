"""Epoch-loop training driver — the TPU-native ``_training`` task.

Replaces the reference's Keras ``model.fit`` epoch loop
(``src/ExecutionRun.py:169-201``): a host loop over epochs, a jitted (and
mesh-sharded) step over ray batches, per-epoch full-frame eval renders with
PSNR tracking, reference-format ``.h5`` + PSNR-npy artifacts, full-train-state
Orbax checkpoints, and per-epoch plots.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_and_dietnerf_tpu.data import loaders, pipeline
from nerf_and_dietnerf_tpu.data.loaders import Dataset
from nerf_and_dietnerf_tpu.models import nerf
from nerf_and_dietnerf_tpu.models.nerf import NeRFConfig
from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib
from nerf_and_dietnerf_tpu.train import checkpoint, train_step as ts
from nerf_and_dietnerf_tpu.utils.config import RunConfig


@dataclasses.dataclass
class EpochStats:
    epoch: int
    loss: float
    psnr_train: float
    psnr_test: float
    rays_per_sec: float
    seconds: float


class Trainer:
    """Drives training for one run config over one dataset.

    :param run: parsed YAML run config.
    :param dataset: loaded scene.
    :param save_dir: run artifact directory (weights, PSNR history, plots).
    :param mesh: optional device mesh; None => single-device jit.
    :param epoch_callback: called with (trainer, EpochStats) after each epoch
        (the task runner hooks plotting and GCS backup here, mirroring
        ``src/ExecutionRun.py:193-201``).
    """

    def __init__(
        self,
        run: RunConfig,
        dataset: Dataset,
        save_dir,
        mesh=None,
        epoch_callback: Optional[Callable] = None,
        make_losses=None,
    ):
        self.run = run
        self.dataset = dataset
        self.save_dir = Path(save_dir)
        self.mesh = mesh
        self.epoch_callback = epoch_callback

        # near/far come from the *loader*, not the YAML: spherification
        # rescales the scene and the bounds with it (reference passes the
        # rescaled bounds into the model, src/ExecutionRun.py:104-113).
        # Training with the raw YAML bounds samples mostly-empty space and
        # costs ~4 dB (measured on the 50px Alexander scene).
        self.config: NeRFConfig = dataclasses.replace(
            run.nerf_config(), near=dataset.near, far=dataset.far
        )
        if mesh is not None and self.config.backend in (
            "pallas", "pallas_mlp", "pallas_rm"
        ):
            # pallas_call has no GSPMD partitioning rule; on a mesh the fused
            # kernel runs shard_mapped over the data axis with an explicit
            # weight-grad psum (ops/raymarch_pallas.apply_mlp_fused_sharded).
            self.config = dataclasses.replace(
                self.config, mesh=mesh, mesh_axis=mesh_lib.DATA_AXIS
            )
        # Eval/PSNR renders always run in float32: bf16 forward costs ~3 dB
        # of PSNR on rendered frames (measured) for ~12% render speed — the
        # wrong trade everywhere except inside the train step. The *backend*
        # is inherited everywhere: the fused Pallas kernel supports f32 and is
        # the measured-fastest render path; on mesh runs the frame renders
        # tile-sharded over all chips (parallel/render_tiles.render_frame),
        # which re-injects the mesh so the kernel runs shard_mapped.
        self.eval_config = dataclasses.replace(
            self.config, compute_dtype=jnp.float32,
            mesh=None, fuse_compositing=False, fuse_fine_loss=False,
        )
        train_idx = loaders.train_test_split_indices(
            len(dataset), run.test_img_idx, run.pics_indices_to_use_in_dataset
        )
        self.train_indices = train_idx
        self.data = pipeline.RayDataset(
            dataset.images[train_idx],
            dataset.camera_poses[train_idx],
            dataset.field_of_view,
            run.n_rays_in_batch_train,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )

        # Built after the data pipeline: the optional lr schedule needs the
        # run's total step count (reference parity = constant lr; see
        # train_step.make_optimizer_with_schedule).
        self.optimizer = ts.make_optimizer_with_schedule(
            run.optimizer_lr,
            lr_final=run.optimizer_lr_final,
            total_steps=run.n_epochs * self.data.batches_per_epoch,
            grad_clip_norm=run.grad_clip_norm,
        )

        self.state = ts.init_train_state(
            jax.random.PRNGKey(run.init_seed), self.config, self.optimizer
        )
        self.start_epoch = 0
        self._maybe_resume()
        if mesh is not None:
            # Commit the state to the mesh's replicated sharding up front. In
            # multi-controller runs (process_count > 1) this is REQUIRED:
            # jit cannot re-place process-local arrays onto a sharding that
            # spans non-addressable devices, so freshly-initialized or
            # checkpoint-restored host-local state must be explicitly
            # device_put as a global replicated array. Round-trip through
            # host numpy: device_put of a device-committed array onto a
            # sharding spanning other processes is a cross-host *transfer*
            # (unsupported off-DCN), while a host value is replicated from
            # every process's own copy.
            self.state = jax.device_put(
                jax.device_get(self.state), mesh_lib.replicated(mesh)
            )

        self._step = ts.make_train_step(self.config, self.optimizer, mesh=mesh)
        self._epoch_fn = None
        self._device_tables = None
        self.ckpt = checkpoint.CheckpointManager(self.save_dir / "orbax")
        self._eval_render_cache = None
        self.psnrs_test: List[float] = []
        self.psnrs_train: List[float] = []
        if self.start_epoch > 0:
            self.psnrs_test, self.psnrs_train = checkpoint.load_psnr_history(
                self.save_dir, self.start_epoch
            )

    def _maybe_resume(self) -> None:
        """Resume semantics of the reference (``src/ExecutionRun.py:228-231``):
        a non-negative ``starting_epoch_number`` loads that epoch's ``.h5``.
        If an Orbax checkpoint exists for the same step, prefer it — it also
        restores the optimizer moments the ``.h5`` cannot carry."""
        epoch = self.run.starting_epoch_number
        if epoch is None or epoch < 0:
            return
        h5 = checkpoint.nerf_h5_path(self.save_dir, epoch)
        if h5.exists():
            params = checkpoint.load_keras_h5(
                h5, self.config.mlp, has_fine=self.config.has_fine
            )
            step = epoch * self.data.batches_per_epoch
            # The .h5 carries weights only, so Adam moments restart from zero
            # (matching the reference's resume, src/ExecutionRun.py:228-231)
            # — but the optimizer's internal step count must fast-forward:
            # with optimizer_lr_final set, a zero count would restart the
            # exponential lr schedule at the initial lr (up to lr0/lr_final x
            # the intended decayed lr) for the rest of the run.
            import optax.tree_utils as otu

            opt_state = self.optimizer.init(params)
            opt_state = otu.tree_set(
                opt_state, count=jnp.asarray(step, jnp.int32)
            )
            self.state = ts.TrainState(
                params=params,
                opt_state=opt_state,
                step=jnp.asarray(step, jnp.int32),
            )
        self.start_epoch = epoch
        mgr = checkpoint.CheckpointManager(self.save_dir / "orbax")
        if mgr.latest_step() == epoch:
            restored = mgr.restore(epoch, template=self.state)
            if restored is not None:
                self.state = restored

    # ------------------------------------------------------------------ #

    # On-device whole-epoch path: one jitted scan per epoch with the ray
    # table resident in HBM (see train_step.make_epoch_fn). Used when the
    # subclass doesn't need per-step host dispatch (DietTrainer does) and the
    # table fits comfortably on device.
    ON_DEVICE_TABLE_LIMIT_BYTES = 2 << 30

    def _supports_on_device_epoch(self) -> bool:
        table_bytes = (
            self.data.origins.nbytes + self.data.directions.nbytes + self.data.rgb.nbytes
        )
        return (
            type(self) is Trainer
            and self.run.on_device_epoch
            and jax.process_count() == 1
            and table_bytes <= self.ON_DEVICE_TABLE_LIMIT_BYTES
        )

    def _run_on_device_epoch(self, key):
        if self._epoch_fn is None:
            self._epoch_fn = ts.make_epoch_fn(
                self.config, self.optimizer,
                self.data.batches_per_epoch, self.run.n_rays_in_batch_train,
                mesh=self.mesh,
            )
            put = (
                (lambda a: jax.device_put(a, mesh_lib.replicated(self.mesh)))
                if self.mesh is not None
                else jnp.asarray
            )
            self._device_tables = tuple(
                put(a) for a in (self.data.origins, self.data.directions, self.data.rgb)
            )
            if self.mesh is not None:
                self.state = jax.device_put(self.state, mesh_lib.replicated(self.mesh))
        self.state, metrics = self._epoch_fn(self.state, key, *self._device_tables)
        return metrics

    def _put_batch(self, batch):
        orig, dirs, rgb = batch
        if self.mesh is not None:
            return mesh_lib.make_global_batch(self.mesh, orig, dirs, rgb)
        return (jnp.asarray(orig), jnp.asarray(dirs), jnp.asarray(rgb))

    def _dispatch_step(self, key, batch):
        """Run one optimization step. Subclasses may select among several
        jitted step functions (the DietNeRF trainer swaps in the
        consistency-loss step every K-th global step)."""
        return self._step(self.state, key, batch)

    def train_epoch(self, epoch: int) -> EpochStats:
        """One pass over the (permuted) ray table."""
        key = jax.random.PRNGKey(epoch)
        k_perm, k_steps = jax.random.split(key)
        # The eval-render memo is only valid for the params that produced it;
        # training below changes params, so drop any cached renders now (a
        # cache keyed on epoch alone would serve stale renders if fit() is
        # called twice on one Trainer, or if a caller rendered epoch N before
        # this train_epoch(N)).
        self._eval_render_cache = None
        t0 = time.perf_counter()
        n_batches = self.data.batches_per_epoch
        if n_batches == 0:
            raise ValueError(
                "batch size exceeds the number of training rays; nothing to train"
            )
        if self._supports_on_device_epoch():
            metrics = self._run_on_device_epoch(key)
        else:
            step_keys = jax.random.split(k_steps, n_batches)
            # One-batch lookahead: the next batch's host->device transfer is
            # dispatched before this step is consumed, so transfers overlap
            # with compute (JAX dispatch is async; without this every step
            # pays the full host round-trip).
            it = self.data.epoch(k_perm)
            pending = self._put_batch(next(it))
            i = 0
            for nxt in it:
                nxt = self._put_batch(nxt)
                self.state, metrics = self._dispatch_step(step_keys[i], pending)
                pending = nxt
                i += 1
            self.state, metrics = self._dispatch_step(step_keys[i], pending)
        # Host materialization as the timing fence — on remote PJRT backends
        # block_until_ready can return before execution completes.
        loss_value = float(jax.device_get(metrics["loss"]))
        dt = time.perf_counter() - t0

        psnr_train, psnr_test = self._eval_psnrs(epoch)
        self.psnrs_train.append(psnr_train)
        self.psnrs_test.append(psnr_test)
        stats = EpochStats(
            epoch=epoch,
            loss=loss_value,
            psnr_train=psnr_train,
            psnr_test=psnr_test,
            rays_per_sec=n_batches * self.run.n_rays_in_batch_train / dt,
            seconds=dt,
        )
        return stats

    def _eval_psnrs(self, epoch: int):
        """Full-frame train + test renders and their PSNRs
        (reference ``src/ExecutionRun.py:265-302``)."""
        from nerf_and_dietnerf_tpu.core import rendering

        ds = self.dataset
        renders = self.render_eval_images(epoch)
        out = []
        for name in ("train", "test"):
            idx, rgb = renders[name]
            out.append(
                float(rendering.psnr(jnp.asarray(ds.images[idx]), jnp.asarray(rgb)))
            )
        return out[0], out[1]

    def render_eval_images(self, epoch: int):
        """The two full-frame renders used for the per-epoch PSNRs AND the
        per-epoch plot. Memoized per epoch: the task runner's epoch callback
        re-requests the same (params, key) renders right after
        ``train_epoch`` computed the PSNRs — without the cache every epoch
        would render all frames twice (a measured ~2x eval tax)."""
        if self._eval_render_cache is not None and (
            self._eval_render_cache[0] == epoch
        ):
            return self._eval_render_cache[1]
        from nerf_and_dietnerf_tpu.parallel import render_tiles

        ds = self.dataset
        key = jax.random.PRNGKey(10_000 + epoch)
        renders = {}
        for name, idx in (
            ("train", self.run.idx_train_img_to_plot),
            ("test", self.run.test_img_idx),
        ):
            result, _ = render_tiles.render_frame(
                self.state.params, self.eval_config, self.mesh, key,
                ds.camera_poses[idx], ds.field_of_view, ds.height, ds.width,
                chunk_size=self.run.offline_chunk_size(),
                diagnostics=False,
            )
            renders[name] = (idx, np.asarray(result.rgb))
        self._eval_render_cache = (epoch, renders)
        return renders

    def save_epoch_artifacts(self, epoch: int) -> None:
        """Reference-format ``.h5`` weights + PSNR history, plus the Orbax
        full-state checkpoint (``src/ExecutionRun.py:558-575``)."""
        if jax.process_index() == 0:
            checkpoint.save_keras_h5(
                checkpoint.nerf_h5_path(self.save_dir, epoch),
                jax.device_get(self.state.params),
                self.config.mlp,
            )
            checkpoint.save_psnr_history(
                self.save_dir, epoch, self.psnrs_test, self.psnrs_train
            )
        self.ckpt.save(epoch, jax.device_get(self.state))

    def fit(self, n_epochs: Optional[int] = None, log=print) -> List[EpochStats]:
        """Run the full training task (``src/ExecutionRun.py:169-201``)."""
        n_epochs = n_epochs if n_epochs is not None else self.run.n_epochs
        history = []
        for epoch in range(self.start_epoch + 1, n_epochs + 1):
            stats = self.train_epoch(epoch)
            self.save_epoch_artifacts(epoch)
            if log is not None:
                log(
                    f"epoch {epoch}/{n_epochs}: loss={stats.loss:.5f} "
                    f"psnr_train={stats.psnr_train:.2f} psnr_test={stats.psnr_test:.2f} "
                    f"{stats.rays_per_sec:,.0f} rays/s ({stats.seconds:.1f}s)"
                )
            if self.epoch_callback is not None:
                self.epoch_callback(self, stats)
            history.append(stats)
        return history
