"""Jitted training step: Adam on the coarse+fine MSE objective, DP over rays.

Replaces the reference's Keras ``train_step`` + ``model.fit`` machinery
(``src/NeRF.py:136-178``, ``src/ExecutionRun.py:190-192``) with a pure jitted
function over an explicit train state. bfloat16 matmuls with float32 master
weights replace the reference's float16 loss-scaling (``src/NeRF.py:159-167``)
— bf16 has the fp32 exponent range, so no loss scale is needed on TPU.

Sharding: the ray batch is split over the mesh's ``data`` axis; params and
optimizer state are replicated. With replicated out-shardings on the grads,
XLA inserts the gradient all-reduce (``psum`` over ICI) inside the step and
overlaps it with the backward pass.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from nerf_and_dietnerf_tpu.models import nerf
from nerf_and_dietnerf_tpu.models.nerf import NeRFConfig
from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib

Params = Dict[str, Any]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Full training state — all of it is checkpointed (the reference persists
    weights only, resetting Adam moments on resume; SURVEY §5)."""

    params: Params
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def make_optimizer(
    learning_rate: float = 5e-4,
    grad_clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam with the reference's defaults (``src/ExecutionRun.py:226``,
    lr from YAML ``training.optimizer_learning_rate``).

    :param grad_clip_norm: optional global-norm gradient clip applied before
        Adam. The reference trains unclipped; ``None`` (the default)
        reproduces that. Rationale for offering it: differentiating *through*
        the hierarchical resampling (the reference's semantics,
        ``src/NeRF.py:155``) makes the objective's gradient discontinuous in
        the coarse weights, and near convergence single batches can emit
        gradient spikes orders of magnitude above typical. A spike inflates
        Adam's second moments, which suppresses the effective lr for the
        rest of training — measured on the 256px flagship as a late-phase
        PSNR plateau ~1 dB below a spike-free trajectory and a 3.8 dB crash
        in the final epoch (runs/256px_alexander_nerf_r04/RESULTS.md).
        A generous threshold (~10x the healthy-step global norm) only fires
        on pathological steps and leaves healthy dynamics bit-unchanged on
        steps below it.
    """
    adam = optax.adam(learning_rate)
    if grad_clip_norm is None:
        return adam
    return optax.chain(optax.clip_by_global_norm(grad_clip_norm), adam)


def make_optimizer_with_schedule(
    learning_rate: float,
    lr_final: Optional[float] = None,
    total_steps: Optional[int] = None,
    grad_clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam with an optional exponential lr decay from ``learning_rate`` to
    ``lr_final`` over ``total_steps`` (matching the original bmild/nerf
    schedule shape: lr(t) = lr0 * (lr_final/lr0)^(t/T)).

    The Sahar-E reference trains at a CONSTANT lr — its config schema has
    decay keys (``epoch_num_to_reach_high_lr`` / ``optimizer_low_lr``) that
    are read nowhere (verified dead; utils/config.LEGACY_IGNORED_KEYS), so
    constant-lr is the parity default here too (``lr_final=None``). The
    schedule exists because constant 5e-4 measurably oscillates near
    convergence at the 256px flagship scale: per-step replay of the r04
    stock run's final epoch shows losses climbing 0.0028 -> 0.0061 over the
    last ~20 steps with no single spike (a divergence onset, not a bad
    batch), costing ~1 dB of late-phase PSNR and 3.8 dB in the final epoch
    (runs/256px_alexander_nerf_r04/RESULTS.md).
    """
    if lr_final is None:
        return make_optimizer(learning_rate, grad_clip_norm=grad_clip_norm)
    if not total_steps or total_steps <= 0:
        raise ValueError("lr_final requires a positive total_steps")
    schedule = optax.exponential_decay(
        init_value=learning_rate,
        transition_steps=total_steps,
        decay_rate=lr_final / learning_rate,
    )
    adam = optax.adam(schedule)
    if grad_clip_norm is None:
        return adam
    return optax.chain(optax.clip_by_global_norm(grad_clip_norm), adam)


def init_train_state(key, config: NeRFConfig, optimizer) -> TrainState:
    params = nerf.init_params(key, config)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def train_step(
    state: TrainState,
    key,
    batch: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    *,
    config: NeRFConfig,
    optimizer,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One SGD step on a ray batch ``(origins, directions, rgb)``."""
    orig, dirs, rgb = batch

    def loss_fn(params):
        return nerf.training_losses(params, config, key, orig, dirs, rgb)

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), metrics


def make_epoch_fn(
    config: NeRFConfig,
    optimizer,
    n_batches: int,
    batch_size: int,
    mesh: Optional[Mesh] = None,
):
    """One **entire epoch** as a single jitted program.

    The full ray table lives in HBM (a few hundred MB at the largest stock
    configs); the epoch permutation, per-step batch gather, and all
    ``n_batches`` optimization steps run inside one ``lax.scan`` — the host
    dispatches once per epoch instead of once per step. This is the
    properly TPU-native replacement for the reference's tf.data feed
    (``src/UtilsNeuralRadianceField.py:135-162``): measured ~7x faster than
    even a prefetching host loop on a tunneled chip, and it keeps pods busy
    without host round-trips.

    Returned callable: ``epoch_fn(state, key, origins, dirs, rgb) ->
    (state, mean_metrics)`` with the ray tables as ``(N, 4/4/3)`` arrays.
    """

    def epoch_fn(state: TrainState, key, origins, dirs, rgb):
        k_perm, k_steps = jax.random.split(key)
        perm = jax.random.permutation(k_perm, origins.shape[0])
        keys = jax.random.split(k_steps, n_batches)

        def body(state, step_inputs):
            i, k = step_inputs
            idx = jax.lax.dynamic_slice_in_dim(perm, i * batch_size, batch_size)
            batch = (origins[idx], dirs[idx], rgb[idx])
            if mesh is not None:
                sharding = mesh_lib.batch_sharding(mesh)
                batch = tuple(
                    jax.lax.with_sharding_constraint(b, sharding) for b in batch
                )
            return train_step(state, k, batch, config=config, optimizer=optimizer)

        state, metrics = jax.lax.scan(
            body, state, (jnp.arange(n_batches), keys)
        )
        return state, jax.tree.map(lambda x: jnp.mean(x), metrics)

    if mesh is None:
        return jax.jit(epoch_fn, donate_argnums=(0,))
    repl = mesh_lib.replicated(mesh)
    return jax.jit(
        epoch_fn,
        in_shardings=(repl, repl, repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_train_step(
    config: NeRFConfig,
    optimizer,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
):
    """Build the jitted (and, with a mesh, sharded) train step.

    With a mesh: batch in-shardings are split over ``data``; state is
    replicated in and out, which makes XLA reduce the gradients across chips
    (ICI all-reduce) before the replicated Adam update.
    """
    step = functools.partial(train_step, config=config, optimizer=optimizer)
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, repl, (data, data, data)),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
