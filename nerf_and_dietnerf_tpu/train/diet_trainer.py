"""DietNeRF training driver: the Trainer plus the every-K-step diet step.

Reference behavior being reproduced (``src/DietNeRF.py:120-157, :224-236``):
a step counter gates the consistency loss — active when
``counter % 13 == 0`` **and** ``counter < 0.95 * total_steps``. The gating
runs on the host (two compiled executables, selected per step) instead of the
reference's ``tf.cond`` branch inside one graph.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_and_dietnerf_tpu.models import dietnerf, vit
from nerf_and_dietnerf_tpu.models.dietnerf import DietConfig, PoseSampler
from nerf_and_dietnerf_tpu.train import train_step as ts
from nerf_and_dietnerf_tpu.train.trainer import Trainer


class DietTrainer(Trainer):
    """Trainer with semantic-consistency regularization.

    :param vit_weights: optional path to public ViT-B/32 weights
        (``models/vit.py:load_pretrained`` formats). Without it the embedder
        is randomly initialized — still a consistency regularizer, but not a
        semantic one; a loud warning is printed.
    """

    def __init__(
        self,
        run,
        dataset,
        save_dir,
        mesh=None,
        epoch_callback=None,
        diet: DietConfig = DietConfig(),
        vit_weights: Optional[str] = None,
    ):
        super().__init__(run, dataset, save_dir, mesh=mesh, epoch_callback=epoch_callback)

        if vit_weights:
            # A checkpoint exported by vit.save_npz can carry its own
            # geometry (e.g. the scene-trained small embedder from
            # tools/train_scene_embedder.py); adopt it so --vit-weights works
            # for any backbone size, not just B/32.
            import dataclasses as _dc

            inferred = vit.infer_config(vit_weights)
            if inferred is not None and inferred != diet.vit:
                diet = _dc.replace(diet, vit=inferred)
        self.diet = diet

        if vit_weights:
            self.vit_params = vit.load_pretrained(vit_weights, diet.vit)
        elif not getattr(run, "allow_random_embedder", False):
            # Hard failure, not a warning: the random-init embedder measurably
            # LOSES quality (-1.83 dB test PSNR vs just turning the
            # consistency loss off, 50px few-shot A/B in
            # runs/diet_ab_50px/RESULTS.md), so a stock dietnerf YAML must
            # not silently train a worse-than-NeRF model.
            raise ValueError(
                "DietNeRF needs pretrained ViT weights for its semantic "
                "consistency loss. Without them the embedder is random and "
                "the consistency loss COSTS quality (measured -1.83 dB vs "
                "consistency-off, runs/diet_ab_50px/RESULTS.md). Pass "
                "--vit-weights <ViT-B/32 checkpoint>, or set "
                "`allow_random_embedder: true` in the YAML to run the "
                "degraded non-semantic mode anyway."
            )
        else:
            print(
                "[dietnerf] WARNING: allow_random_embedder=true — the "
                "consistency embedder is randomly initialized (non-semantic; "
                "measured -1.83 dB vs consistency-off). Pass "
                "vit_weights=<path> for DietNeRF-paper behavior."
            )
            self.vit_params = vit.init_params(jax.random.PRNGKey(7), diet.vit)

        # Precompute target embeddings of the training images once
        # (reference ctor, src/DietNeRF.py:84).
        embed = jax.jit(
            lambda p, imgs: vit.extract_features(p, vit.preprocess(imgs, diet.vit), diet.vit)
        )
        train_images = jnp.asarray(dataset.images[self.train_indices])
        self.target_embeddings = jax.device_get(embed(self.vit_params, train_images))

        self.pose_sampler = PoseSampler.from_dataset(
            dataset.camera_poses[self.train_indices], run.test_img_idx
        )
        self._embedding_rng = np.random.default_rng(11)

        self.consistency_budget = dietnerf.consistency_steps_budget(
            self.data.batches_per_epoch, run.n_epochs, self.start_epoch, diet
        )
        self._diet_step = dietnerf.make_diet_train_step(
            self.config, diet, self.optimizer, dataset.field_of_view, mesh=mesh
        )

    def _dispatch_step(self, key, batch):
        counter = int(self.state.step) + 1  # reference increments first (:129)
        use_cs = (
            counter % self.diet.interval == 0 and counter < self.consistency_budget
        )
        if not use_cs:
            return self._step(self.state, key, batch)
        c2w = jnp.asarray(self.pose_sampler.sample(), jnp.float32)
        target = jnp.asarray(
            self.target_embeddings[
                self._embedding_rng.integers(len(self.target_embeddings))
            ]
        )
        return self._diet_step(self.state, key, batch, c2w, target, self.vit_params)

    # ------------------------------------------------------------------ #
    # Interval-aware on-device epoch: 12-of-13 steps run at plain-NeRF     #
    # speed inside one lax.scan; the diet branch is selected by lax.cond   #
    # on the on-device counter. Kills the ~3 ms/step host-dispatch tax of  #
    # the two-executable design on tunneled backends.                      #
    # ------------------------------------------------------------------ #

    def _supports_on_device_epoch(self) -> bool:
        table_bytes = (
            self.data.origins.nbytes + self.data.directions.nbytes + self.data.rgb.nbytes
        )
        return (
            self.run.on_device_epoch
            and jax.process_count() == 1
            and table_bytes <= self.ON_DEVICE_TABLE_LIMIT_BYTES
        )

    def _presample_diet_inputs(self):
        """Per-epoch novel poses + target embeddings, sampled on the host at
        exactly the diet positions (the stateful samplers advance only on
        diet steps — identical stream to the per-step dispatch path)."""
        n = self.data.batches_per_epoch
        emb_dim = self.target_embeddings.shape[-1]
        c2ws = np.zeros((n, 4, 4), np.float32)
        targets = np.zeros((n, emb_dim), np.float32)
        step0 = int(self.state.step)
        for i in range(n):
            counter = step0 + i + 1
            if counter % self.diet.interval == 0 and counter < self.consistency_budget:
                c2ws[i] = self.pose_sampler.sample()
                targets[i] = self.target_embeddings[
                    self._embedding_rng.integers(len(self.target_embeddings))
                ]
        return jnp.asarray(c2ws), jnp.asarray(targets)

    def _run_on_device_epoch(self, key):
        from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib

        if self._epoch_fn is None:
            self._epoch_fn = dietnerf.make_diet_epoch_fn(
                self.config, self.diet, self.optimizer, self.dataset.field_of_view,
                self.data.batches_per_epoch, self.run.n_rays_in_batch_train,
                self.consistency_budget, mesh=self.mesh,
            )
            put = (
                (lambda a: jax.device_put(a, mesh_lib.replicated(self.mesh)))
                if self.mesh is not None
                else jax.device_put
            )
            self._device_tables = tuple(
                put(a) for a in (self.data.origins, self.data.directions, self.data.rgb)
            )
            self._vit_params_device = put(self.vit_params)
            if self.mesh is not None:
                self.state = jax.device_put(self.state, mesh_lib.replicated(self.mesh))
        c2ws, targets = self._presample_diet_inputs()
        self.state, metrics = self._epoch_fn(
            self.state, key, *self._device_tables, c2ws, targets,
            self._vit_params_device,
        )
        return metrics
