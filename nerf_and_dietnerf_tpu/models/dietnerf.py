"""DietNeRF: NeRF + semantic-consistency regularization for few-shot scenes.

Reference: ``src/DietNeRF.py``. Every 13th step the model renders a low-res
image from a random novel pose *inside the differentiated region* and pulls
its ViT embedding toward the embedding of a random training image:

- interval K = 13, weight 0.1, active for the first 95% of total steps
  (``src/DietNeRF.py:29-36``, step budget computed in
  ``src/ExecutionRun.py:245-247``);
- consistency render: 150x150, 55 coarse + 55 fine samples, render-path
  merged fine z (``src/DietNeRF.py:215-218`` calls ``render_image``);
- loss = ``0.1 * (1 - cos(source, target)) / 2`` (``src/DietNeRF.py:261-270``
  — Keras' ``cosine_similarity`` returns the *negative* cosine, so the
  reference's ``(1 + cos_loss)/2`` is ``(1 - cos)/2`` in math terms);
- random novel pose: spherical scenes jitter a sphere camera around the
  RANSAC point of interest; otherwise slerp-blend 3 dataset poses
  (``src/DietNeRF.py:238-259``).

TPU-native design differences (intentional, SURVEY §7):

- The reference's ``tf.cond`` inside one traced ``train_step`` bloats the
  graph with a full render+ViT branch evaluated for *predication* semantics.
  Here the diet step is a **separate jitted function** selected by a host
  counter — the common step stays small; the diet executable is compiled once.
- The reference calls ``np.random`` inside the traced step, freezing the
  "random" pose at trace time (SURVEY §2 quirk). Poses here are drawn on the
  host per diet step from a seeded generator — actually random, and
  reproducible.
- The ViT embedder is JAX (``models/vit.py``) living inside the same jit
  graph, not an out-of-graph TF-Hub call.
- The full 150x150 differentiable render is chunked through
  ``jax.checkpoint`` + ``lax.map`` so peak activation memory is one chunk
  (the reference materializes the whole render's graph).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_and_dietnerf_tpu.core import cameras, pose_math, sampling
from nerf_and_dietnerf_tpu.models import nerf, vit
from nerf_and_dietnerf_tpu.models.nerf import NeRFConfig

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DietConfig:
    """Consistency-loss hyperparameters (reference ``src/DietNeRF.py:26-36``)."""

    interval: int = 13
    weight: float = 0.1
    active_fraction: float = 0.95
    cs_image_size: int = 150
    cs_samples: int = 55          # coarse == fine count for the cs render
    cs_chunk_rays: int = 2500     # remat chunk for the differentiable render
    vit: vit.ViTConfig = vit.ViTConfig()


# --------------------------------------------------------------------------- #
# Differentiable low-res render (inside the loss)                              #
# --------------------------------------------------------------------------- #

def render_image_differentiable(
    params: Params,
    config: NeRFConfig,
    diet: DietConfig,
    key,
    c2w,
    field_of_view,
) -> jnp.ndarray:
    """Full-frame render used *inside* the consistency loss.

    Render-path semantics (fine z = merged sort, ``src/NeRF.py:131-133``) at
    ``cs_image_size`` px with ``cs_samples`` coarse + fine. Chunked with
    rematerialization: the backward pass recomputes each chunk instead of
    keeping ~10^8 activations live.
    """
    size = diet.cs_image_size
    orig, dirs = cameras.rays_for_image(size, size, field_of_view, c2w)
    n_rays = size * size
    chunk = diet.cs_chunk_rays
    n_chunks = -(-n_rays // chunk)
    pad = n_chunks * chunk - n_rays
    if pad:
        orig = jnp.concatenate([orig, jnp.broadcast_to(orig[-1:], (pad, 4))], 0)
        dirs = jnp.concatenate([dirs, jnp.broadcast_to(dirs[-1:], (pad, 4))], 0)
    orig = orig.reshape(n_chunks, chunk, 4)
    dirs = dirs.reshape(n_chunks, chunk, 4)
    keys = jax.random.split(key, n_chunks)

    @jax.checkpoint
    def render_chunk(args):
        k, o, d = args
        result, _ = nerf.render(
            params, config, k, o, d,
            n_samples_coarse=diet.cs_samples, n_samples_fine=diet.cs_samples,
            diagnostics=False,  # only rgb feeds the embedder
        )
        return result.rgb

    rgb = jax.lax.map(render_chunk, (keys, orig, dirs))
    return rgb.reshape(-1, 3)[:n_rays].reshape(size, size, 3)


def consistency_loss(
    params: Params,
    vit_params: Params,
    config: NeRFConfig,
    diet: DietConfig,
    key,
    c2w,
    field_of_view,
    target_embedding: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``weight * (1 - cos(render_emb, target_emb)) / 2`` plus the raw cosine.

    Gradients flow through the render into both MLPs; the embedder is frozen
    (``stop_gradient`` on its params — reference freezes the TF-Hub layer,
    ``src/DietNeRF.py:75-79``).
    """
    image = render_image_differentiable(params, config, diet, key, c2w, field_of_view)
    emb = vit.extract_features(
        jax.tree.map(jax.lax.stop_gradient, vit_params),
        vit.preprocess(image, diet.vit),
        diet.vit,
    )[0]
    cos = jnp.sum(emb * target_embedding) / (
        jnp.linalg.norm(emb) * jnp.linalg.norm(target_embedding) + 1e-8
    )
    return diet.weight * (1.0 - cos) / 2.0, cos


# --------------------------------------------------------------------------- #
# Pose sampling (host side, properly random — fixes the reference's           #
# trace-frozen np.random quirk)                                               #
# --------------------------------------------------------------------------- #

class PoseSampler:
    """Random novel-pose source for the consistency render
    (reference ``src/DietNeRF.py:238-259``, wiring ``src/ExecutionRun.py:250-256``).
    """

    def __init__(
        self,
        camera_poses: np.ndarray,
        point_of_interest: Optional[np.ndarray],
        front_rotation: Optional[np.ndarray],
        seed: int = 0,
    ):
        self.camera_poses = np.asarray(camera_poses)
        self.point_of_interest = point_of_interest
        self.front_rotation = front_rotation
        self.is_spherical = point_of_interest is not None
        self.rng = np.random.default_rng(seed)

    @classmethod
    def from_dataset(cls, camera_poses: np.ndarray, test_img_idx: int, seed: int = 0):
        """Reference wiring: RANSAC the scene point of interest; if the scene
        is spherical, aim the sampled sphere cameras using the *test* camera's
        rotation (``src/ExecutionRun.py:250-256``)."""
        poi, is_spherical = pose_math.estimate_point_of_interest(camera_poses)
        front = None
        if is_spherical:
            front = np.eye(4)
            front[:3, :3] = camera_poses[test_img_idx][:3, :3]
        return cls(camera_poses, poi if is_spherical else None, front, seed)

    def sample(self) -> np.ndarray:
        if self.is_spherical:
            radius = self.rng.uniform(0.7, 1.1)
            x_rot = self.rng.uniform(-90.0, 0.0)
            y_rot = self.rng.uniform(-180.0, 180.0)
            c2w = pose_math.sphere_c2w(radius, x_rot, y_rot, 0.0)
            c2w = self.front_rotation @ c2w
            c2w[:3, 3] += self.point_of_interest
            return c2w
        picks = self.rng.choice(len(self.camera_poses), 3, replace=False)
        a = self.rng.uniform(0.0, 1.0, 2)
        p1 = pose_math.interpolate_c2w(
            self.camera_poses[picks[0]], self.camera_poses[picks[1]], a[0]
        )
        return pose_math.interpolate_c2w(p1, self.camera_poses[picks[2]], a[1])


# --------------------------------------------------------------------------- #
# Train steps                                                                  #
# --------------------------------------------------------------------------- #

def make_diet_train_step(
    config: NeRFConfig,
    diet: DietConfig,
    optimizer,
    field_of_view: float,
    mesh=None,
):
    """The jitted every-13th-step function: rgb loss + consistency loss.

    Returned signature:
    ``step(state, key, batch, c2w, target_embedding, vit_params) ->
    (state, metrics)`` with the reference's metric names
    (``src/DietNeRF.py:174-190``): ``loss``, ``loss_for_rays``,
    ``cosine_similarity_loss``, ``psnr_coarse``, ``psnr_fine``.
    """
    import optax

    from nerf_and_dietnerf_tpu.train.train_step import TrainState

    def step(state, key, batch, c2w, target_embedding, vit_params):
        orig, dirs, rgb = batch
        k_rays, k_cs = jax.random.split(key)

        def loss_fn(params):
            ray_loss, metrics = nerf.training_losses(
                params, config, k_rays, orig, dirs, rgb
            )
            cs_loss, cos = consistency_loss(
                params, vit_params, config, diet, k_cs, c2w,
                field_of_view, target_embedding,
            )
            metrics = dict(metrics)
            metrics["loss_for_rays"] = ray_loss
            metrics["cosine_similarity_loss"] = cs_loss
            metrics["loss"] = ray_loss + cs_loss
            return ray_loss + cs_loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib

    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, repl, (data, data, data), repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def consistency_steps_budget(
    n_batches_per_epoch: int, n_epochs: int, start_epoch: int, diet: DietConfig
) -> int:
    """Number of initial steps for which the loss stays active
    (reference ``src/ExecutionRun.py:245-247``)."""
    total = n_batches_per_epoch * (n_epochs - start_epoch)
    return int(total * diet.active_fraction)


def make_diet_epoch_fn(
    config: NeRFConfig,
    diet: DietConfig,
    optimizer,
    field_of_view: float,
    n_batches: int,
    batch_size: int,
    budget: int,
    mesh=None,
):
    """One **entire DietNeRF epoch** as a single jitted program.

    The per-step host dispatch of the two-executable design costs ~3 ms per
    step on a tunneled chip — paid on *every* step, not just the every-13th
    diet step. Here the whole epoch runs as one ``lax.scan`` whose body picks
    the diet branch with ``lax.cond`` on the on-device step counter
    (reference gating ``src/DietNeRF.py:224-236``: active when
    ``counter % interval == 0`` and ``counter < budget``). XLA executes only
    the taken branch per iteration, so the 12-of-13 plain steps run at plain
    NeRF speed.

    Returned callable::

        epoch_fn(state, key, origins, dirs, rgb, c2ws, targets, vit_params)
            -> (state, mean_metrics)

    with ``c2ws (n_batches, 4, 4)`` / ``targets (n_batches, emb_dim)`` —
    host-presampled novel poses + target embeddings, consumed only at the
    diet positions (zeros elsewhere are fine).
    """
    import optax

    from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib
    from nerf_and_dietnerf_tpu.train.train_step import TrainState

    interval = diet.interval

    def epoch_fn(state, key, origins, dirs, rgb, c2ws, targets, vit_params):
        k_perm, k_steps = jax.random.split(key)
        perm = jax.random.permutation(k_perm, origins.shape[0])
        keys = jax.random.split(k_steps, n_batches)

        def body(state, xs):
            i, k, c2w, target = xs
            idx = jax.lax.dynamic_slice_in_dim(perm, i * batch_size, batch_size)
            batch = (origins[idx], dirs[idx], rgb[idx])
            if mesh is not None:
                sharding = mesh_lib.batch_sharding(mesh)
                batch = tuple(
                    jax.lax.with_sharding_constraint(b, sharding) for b in batch
                )
            orig_b, dirs_b, rgb_b = batch
            counter = state.step + 1  # reference increments first (:129)
            use_cs = jnp.logical_and(counter % interval == 0, counter < budget)

            def loss_fn(params, with_cs):
                # Key semantics match the two-executable dispatch path
                # exactly: the plain step consumes the step key unsplit
                # (train_step.train_step); only the diet step splits it
                # (make_diet_train_step).
                k_rays, k_cs = jax.random.split(k) if with_cs else (k, k)
                ray_loss, metrics = nerf.training_losses(
                    params, config, k_rays, orig_b, dirs_b, rgb_b
                )
                metrics = dict(metrics)
                metrics["loss_for_rays"] = ray_loss
                if with_cs:
                    cs_loss, _ = consistency_loss(
                        params, vit_params, config, diet, k_cs, c2w,
                        field_of_view, target,
                    )
                else:
                    cs_loss = jnp.float32(0.0)
                metrics["cosine_similarity_loss"] = cs_loss
                metrics["loss"] = ray_loss + cs_loss
                return ray_loss + cs_loss, metrics

            def run(with_cs, st):
                (_, metrics), grads = jax.value_and_grad(
                    lambda p: loss_fn(p, with_cs), has_aux=True
                )(st.params)
                updates, opt_state = optimizer.update(grads, st.opt_state, st.params)
                params = optax.apply_updates(st.params, updates)
                return TrainState(params, opt_state, st.step + 1), metrics

            return jax.lax.cond(
                use_cs,
                functools.partial(run, True),
                functools.partial(run, False),
                state,
            )

        state, metrics = jax.lax.scan(
            body, state, (jnp.arange(n_batches), keys, c2ws, targets)
        )
        return state, jax.tree.map(lambda x: jnp.mean(x), metrics)

    if mesh is None:
        return jax.jit(epoch_fn, donate_argnums=(0,))
    repl = mesh_lib.replicated(mesh)
    return jax.jit(
        epoch_fn,
        in_shardings=(repl,) * 8,
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
