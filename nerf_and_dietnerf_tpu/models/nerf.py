"""NeRF model: coarse/fine rendering and the training objective (functional).

The reference wraps this in a Keras ``Model`` with a custom ``train_step``
(``src/NeRF.py``); here it is a set of pure functions over a parameter pytree
``{"coarse": mlp_params, "fine": mlp_params | None}`` plus a frozen config —
the natural shape for ``jax.jit`` / ``shard_map`` and for swapping the MLP
evaluation between the plain-XLA path and the fused Pallas kernel.

Semantics reproduced exactly (they differ between train and render in the
reference, which matters for parity):

- Training (``src/NeRF.py:136-167``): fresh stratified coarse z per step;
  coarse MSE; fine z = **only** the ``n_fine`` values resampled from the
  coarse weights (no merge with coarse z, ``src/NeRF.py:155-156``); fine MSE;
  total loss = sum. The resampling is *inside* the differentiated region.
- Rendering (``src/NeRF.py:109-134``): fine pass sees
  ``sort(concat(z_resampled, z_coarse))`` — ``n_coarse + n_fine`` samples.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_and_dietnerf_tpu.core import cameras, encoding, rendering, sampling
from nerf_and_dietnerf_tpu.core.rendering import RenderResult
from nerf_and_dietnerf_tpu.models import mlp as mlp_lib
from nerf_and_dietnerf_tpu.models.mlp import MLPConfig

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    """Model + render hyperparameters (YAML ``neural_net`` / ``render``
    sections; reference ``src/ConfigurationKeys.py:64-111``)."""

    mlp: MLPConfig = MLPConfig()
    n_samples_coarse: int = 64
    n_samples_fine: int = 128   # 0 => no fine network
    near: float = 2.0
    far: float = 6.0
    compute_dtype: Any = jnp.bfloat16  # fast path; use float32 for parity tests
    # MLP evaluation backend:
    #   "xla"        — plain XLA ops end to end;
    #   "pallas"     — production fast path: positional encoding in XLA
    #                  (cheap on packed shapes), fused Pallas kernel for the
    #                  MLP, and (with ``fuse_compositing``) alpha-compositing
    #                  inside the kernel on the train path. Measured fastest
    #                  on v5e: the in-kernel encode of "pallas_rm" costs more
    #                  VPU time (sin + theta FMAs on 128-lane-padded tiles,
    #                  recomputed in bwd) than the HBM traffic it saves
    #                  (tools/exp_enc2.py decomposition).
    #   "pallas_mlp" — alias of "pallas" kept for config back-compat.
    #   "pallas_rm"  — fully fused ray-march kernel (point-gen + positional
    #                  encoding + MLP (+ compositing on the train path)
    #                  in-kernel from per-ray data); minimal HBM traffic,
    #                  best when HBM bandwidth (not VPU) is the binding
    #                  constraint.
    backend: str = "xla"
    # Stop gradients through the hierarchical-resampling CDF (the original
    # bmild/nerf behavior). The Sahar-E reference lets gradients flow there
    # (``src/NeRF.py:155`` computes the resampling inside the tape), so the
    # default is False for exact reference-gradient parity — with the
    # one-hot-einsum resampling VJP (no scatters) the flowing-gradient path
    # costs only ~7% (33.2 vs 30.9 ms/step measured on v5e).
    stop_fine_z_grad: bool = False
    # Train-time zero-mean gaussian noise on the density preactivation (the
    # bmild/nerf ``raw_noise_std`` regularizer; YAML key ``sigma_noise_std``).
    # 0.0 = reference-exact (the Sahar-E reference has no noise,
    # src/UtilsNeuralRadianceField.py:88-115). Besides regularizing, this is
    # the reliable fix for the dead-density init lottery on black-background
    # frontal scenes: seed redraws and sigma_bias_init only shift the draw
    # (measured 4/5 seeds dead at 256px robot 8-pic, bias rescues 1-2 of 4 —
    # runs/robot8_diet_ab_r05/RESULTS.md), while preactivation noise gives a
    # dead relu head gradient signal on every step. Applied only on the
    # training path (eval/offline renders are noise-free, as in bmild).
    sigma_noise_std: float = 0.0
    # Train fast path: run alpha-compositing inside the Pallas kernel
    # (``apply_mlp_composited`` for "pallas", ``apply_raymarch_composited``
    # for "pallas_rm") instead of XLA compositing on the raw
    # (rays*samples, 4) radiance. Consulted by the pallas backends only.
    # Default False: measured on v5e, the in-kernel compositing's
    # row<->(rays, samples) layout conversions (one-hot matmuls + lane
    # reductions on 128-lane-padded row tiles) cost more than the XLA
    # composite they replace (38.7 vs 28.4 ms/step at the flagship shape) —
    # XLA runs the same math on packed logical shapes. Kept for research:
    # value/grad parity is tested either way (tests/test_pallas_kernel.py).
    fuse_compositing: bool = False
    # Fine-pass training objective as ONE fused kernel (forward + MSE +
    # full backward with VMEM-resident activations — no recompute, total dz
    # emitted in-kernel; ``ops/research_kernels.apply_mlp_loss_composited``).
    # Only consulted by the pallas backends on single-chip runs (mesh runs
    # fall back to the split path).
    fuse_fine_loss: bool = False
    # Device mesh for the fused-kernel path. pallas_call has no GSPMD
    # partitioning rule, so on a mesh the kernel must be shard_mapped over
    # the data axis (``ops/raymarch_pallas.apply_mlp_fused_sharded``); the
    # plain-XLA backend ignores this and lets GSPMD shard everything.
    mesh: Any = None
    mesh_axis: str = "data"

    @property
    def has_fine(self) -> bool:
        return self.n_samples_fine > 0


def init_params(key, config: NeRFConfig) -> Params:
    k_coarse, k_fine = jax.random.split(key)
    params: Params = {"coarse": mlp_lib.init_params(k_coarse, config.mlp)}
    params["fine"] = mlp_lib.init_params(k_fine, config.mlp) if config.has_fine else None
    return params


def _mlp_apply(config: NeRFConfig):
    if config.backend in ("pallas", "pallas_mlp", "pallas_rm"):
        from nerf_and_dietnerf_tpu.ops import raymarch_pallas

        if config.mesh is not None:
            return functools.partial(
                raymarch_pallas.apply_mlp_fused_sharded,
                mesh=config.mesh,
                axis=config.mesh_axis,
            )
        return raymarch_pallas.apply_mlp_fused
    return mlp_lib.apply_mlp


def render_rays(
    mlp_params: Params,
    config: NeRFConfig,
    rays_orig: jnp.ndarray,
    rays_dirs: jnp.ndarray,
    z_values: jnp.ndarray,
    sigma_noise=None,
) -> RenderResult:
    """Evaluate one network along the given z samples and composite.

    :param rays_orig: ``(rays, 4)`` origins.
    :param rays_dirs: ``(rays, 4)`` unnormalized directions.
    :param z_values: ``(rays, samples)``.

    Reference behavior: ``src/UtilsNeuralRadianceField.py:181-211``
    (``render_rays``), including feeding the **per-ray** (not per-sample)
    direction components to the view branch, broadcast over samples.
    """
    n_rays, n_samples = z_values.shape

    if config.backend == "pallas_rm":
        # Fully fused path: point-gen + positional encoding happen inside the
        # kernel from per-ray data (~4 MB/step vs ~805 MB of lane-padded
        # per-sample encodings), see ops/research_kernels.apply_raymarch_fused.
        # NOTE: its VJP drops ray-input cotangents (rays_orig / rays_dirs /
        # view comps get structural zeros; dparams and dz are real) — fine for
        # training/rendering where rays are data, unusable for pose gradients.
        from nerf_and_dietnerf_tpu.ops import research_kernels

        comps = (
            cameras.view_direction_components(rays_dirs, config.mlp.n_angles)
            if config.mlp.uses_view_dirs
            else None
        )
        if config.mesh is not None:
            raw = research_kernels.apply_raymarch_fused_sharded(
                mlp_params, config.mlp, rays_orig, rays_dirs, comps, z_values,
                config.compute_dtype, mesh=config.mesh, axis=config.mesh_axis,
            )
        else:
            raw = research_kernels.apply_raymarch_fused(
                mlp_params, config.mlp, rays_orig, rays_dirs, comps, z_values,
                config.compute_dtype,
            )
        return rendering.composite(raw, z_values, sigma_noise=sigma_noise)

    points = cameras.sample_points_along_rays(rays_orig, rays_dirs, z_values)[..., :3]
    enc_xyz = encoding.encode_xyz(points.reshape(-1, 3), config.mlp.n_freq_xyz)

    enc_dir = None
    if config.mlp.uses_view_dirs:
        comps = cameras.view_direction_components(rays_dirs, config.mlp.n_angles)
        enc_d = encoding.encode_view_dirs(comps, config.mlp.n_freq_dir)  # (rays, D)
        enc_dir = jnp.broadcast_to(
            enc_d[:, None, :], (n_rays, n_samples, enc_d.shape[-1])
        ).reshape(n_rays * n_samples, -1)

    raw = _mlp_apply(config)(
        mlp_params, config.mlp, enc_xyz, enc_dir, compute_dtype=config.compute_dtype
    )
    return rendering.composite(
        raw.reshape(n_rays, n_samples, 4), z_values, sigma_noise=sigma_noise
    )


def render_rays_train(
    mlp_params: Params,
    config: NeRFConfig,
    rays_orig: jnp.ndarray,
    rays_dirs: jnp.ndarray,
    z_values: jnp.ndarray,
    noise_key=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Train-path evaluation of one network: ``(rgb, weights)`` only.

    The training objective needs just the composited pixels (MSE,
    ``src/NeRF.py:151``) and the coarse weights (hierarchical resampling,
    ``src/NeRF.py:155``) — none of the diagnostic intermediates. On the
    pallas backend this runs the fully fused ray-march + compositing kernel
    (``ops/research_kernels.apply_raymarch_composited``), so the raw
    ``(rays * samples, 4)`` radiance never touches HBM and the compositing
    VJP runs in-kernel.
    """
    sigma_noise = None
    if config.sigma_noise_std > 0.0 and noise_key is not None:
        if config.fuse_compositing or config.fuse_fine_loss:
            raise ValueError(
                "sigma_noise_std requires the XLA compositing path; disable "
                "fuse_compositing / fuse_fine_loss (research kernels "
                "composite in-kernel without a noise input)"
            )
        sigma_noise = config.sigma_noise_std * jax.random.normal(
            noise_key, z_values.shape, jnp.float32
        )
    if config.backend == "pallas_rm" and config.fuse_compositing:
        # NOTE: the fused raymarch kernels return structural-zero cotangents
        # for rays_orig / rays_dirs / view components (only dparams and dz are
        # real). Safe here: the training objective never differentiates w.r.t.
        # the ray tensors (they are input data), and the z cotangent — which
        # carries the fine-resampling gradient back into the coarse net — IS
        # propagated. Do not reuse this path for pose-optimization variants.
        from nerf_and_dietnerf_tpu.ops import research_kernels

        comps = (
            cameras.view_direction_components(rays_dirs, config.mlp.n_angles)
            if config.mlp.uses_view_dirs
            else None
        )
        if config.mesh is not None:
            return research_kernels.apply_raymarch_composited_sharded(
                mlp_params, config.mlp, rays_orig, rays_dirs, comps, z_values,
                config.compute_dtype, mesh=config.mesh, axis=config.mesh_axis,
            )
        return research_kernels.apply_raymarch_composited(
            mlp_params, config.mlp, rays_orig, rays_dirs, comps, z_values,
            config.compute_dtype,
        )
    if config.backend in ("pallas", "pallas_mlp") and config.fuse_compositing:
        # Opt-in research fused-compositing path (off by default — measured
        # SLOWER than the production pallas MLP path, 38.7 vs 28.4 ms/step;
        # kept quarantined in ops/research_kernels with its negative result).
        # XLA computes the packed encodings (per-sample
        # xyz in ray-major row order; view-dirs PER-RAY — never broadcast to
        # samples in HBM), the kernel fuses MLP + compositing + their VJPs.
        from nerf_and_dietnerf_tpu.ops import research_kernels

        points = cameras.sample_points_along_rays(rays_orig, rays_dirs, z_values)
        enc_xyz = encoding.encode_xyz(
            points[..., :3].reshape(-1, 3), config.mlp.n_freq_xyz
        )
        enc_dir = None
        if config.mlp.uses_view_dirs:
            comps = cameras.view_direction_components(rays_dirs, config.mlp.n_angles)
            enc_dir = encoding.encode_view_dirs(comps, config.mlp.n_freq_dir)
        if config.mesh is not None:
            return research_kernels.apply_mlp_composited_sharded(
                mlp_params, config.mlp, enc_xyz, enc_dir, z_values,
                config.compute_dtype, mesh=config.mesh, axis=config.mesh_axis,
            )
        return research_kernels.apply_mlp_composited(
            mlp_params, config.mlp, enc_xyz, enc_dir, z_values,
            config.compute_dtype,
        )
    result = render_rays(
        mlp_params, config, rays_orig, rays_dirs, z_values, sigma_noise=sigma_noise
    )
    return result.rgb, result.weights


def render(
    params: Params,
    config: NeRFConfig,
    key,
    rays_orig: jnp.ndarray,
    rays_dirs: jnp.ndarray,
    n_samples_coarse: Optional[int] = None,
    n_samples_fine: Optional[int] = None,
    diagnostics: bool = True,
) -> Tuple[RenderResult, jnp.ndarray]:
    """Render-path evaluation (eval / serving): coarse pass, then a fine pass
    over the merged+sorted sample set.

    :param diagnostics: when False, only ``rgb`` and ``weights`` are computed
        (``cumprod`` / ``alpha`` / ``sample_rgb`` are None) — on the pallas
        backend this runs the fully fused ray-march + compositing kernel.
        Only the ray-value visualization task needs the full diagnostics.
    :return: ``(result, z_values)`` where ``result`` is the fine result when a
        fine network exists, else the coarse result (matches
        ``src/NeRF.py:109-134``).
    """
    n_c = n_samples_coarse or config.n_samples_coarse
    n_f = n_samples_fine or config.n_samples_fine
    # key=None => deterministic golden-parity mode (RNG-free: mid-bin
    # stratification + even resampling quantiles, core/sampling.py).
    k_strat, k_resample = (
        (None, None) if key is None else jax.random.split(key)
    )

    z = sampling.stratified_z_values(
        k_strat, config.near, config.far, (rays_orig.shape[0],), n_c
    )
    if diagnostics:
        result = render_rays(params["coarse"], config, rays_orig, rays_dirs, z)
        if params.get("fine") is not None and n_f > 0:
            z = sampling.merged_fine_z_values(k_resample, result.weights, z, n_f)
            result = render_rays(params["fine"], config, rays_orig, rays_dirs, z)
        return result, z

    rgb, weights = render_rays_train(params["coarse"], config, rays_orig, rays_dirs, z)
    if params.get("fine") is not None and n_f > 0:
        z = sampling.merged_fine_z_values(k_resample, weights, z, n_f)
        rgb, weights = render_rays_train(
            params["fine"], config, rays_orig, rays_dirs, z
        )
    return RenderResult(rgb, weights, None, None, None), z


def _fine_mse(
    params_fine: Params,
    config: NeRFConfig,
    rays_orig: jnp.ndarray,
    rays_dirs: jnp.ndarray,
    z_fine: jnp.ndarray,
    target_rgb: jnp.ndarray,
    noise_key=None,
) -> jnp.ndarray:
    """Fine-pass MSE over the given z samples — the backend-branching part of
    the training objective, shared by :func:`training_losses` (production) and
    :func:`training_losses_fixed_z` (parity harness)."""
    if (
        config.backend in ("pallas", "pallas_mlp")
        and config.fuse_fine_loss
        and config.mesh is None
    ):
        # One fused kernel: forward + MSE + full backward, activations
        # VMEM-resident (saves the backward's forward recompute). The
        # kernel emits the TOTAL dz; enc gets a structural-zero cotangent.
        from nerf_and_dietnerf_tpu.ops import research_kernels

        points = cameras.sample_points_along_rays(rays_orig, rays_dirs, z_fine)
        enc_xyz = encoding.encode_xyz(
            points[..., :3].reshape(-1, 3), config.mlp.n_freq_xyz
        )
        enc_dir = None
        if config.mlp.uses_view_dirs:
            comps = cameras.view_direction_components(
                rays_dirs, config.mlp.n_angles
            )
            enc_dir = encoding.encode_view_dirs(comps, config.mlp.n_freq_dir)
        return research_kernels.apply_mlp_loss_composited(
            params_fine, config.mlp, enc_xyz, enc_dir, z_fine,
            rays_dirs, target_rgb, config.compute_dtype,
        )
    rgb_fine, _ = render_rays_train(
        params_fine, config, rays_orig, rays_dirs, z_fine, noise_key=noise_key
    )
    return jnp.mean(jnp.square(target_rgb - rgb_fine))


def training_losses(
    params: Params,
    config: NeRFConfig,
    key,
    rays_orig: jnp.ndarray,
    rays_dirs: jnp.ndarray,
    target_rgb: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Training objective: coarse MSE + fine MSE (fine over resampled-only z).

    :return: ``(loss, metrics)`` with metrics ``loss`` / ``psnr_coarse`` /
        ``psnr_fine`` matching the reference's train-step metric dict
        (``src/NeRF.py:169-178``).
    """
    k_strat, k_resample, k_noise_c, k_noise_f = jax.random.split(key, 4)
    # Noise keys are derived unconditionally but only *consumed* when
    # sigma_noise_std > 0, so the std=0 default is bit-identical in its
    # stratification/resampling stream regardless of the knob existing.
    noise_on = config.sigma_noise_std > 0.0
    z = sampling.stratified_z_values(
        k_strat, config.near, config.far, (rays_orig.shape[0],), config.n_samples_coarse
    )
    rgb_coarse, weights_coarse = render_rays_train(
        params["coarse"], config, rays_orig, rays_dirs, z,
        noise_key=k_noise_c if noise_on else None,
    )
    mse_coarse = jnp.mean(jnp.square(target_rgb - rgb_coarse))
    loss = mse_coarse
    metrics = {"psnr_coarse": rendering.psnr_from_mse(mse_coarse)}

    if params.get("fine") is not None:
        z_fine = sampling.resample_z_from_weights(
            k_resample, weights_coarse, z, config.n_samples_fine
        )
        if config.stop_fine_z_grad:
            z_fine = jax.lax.stop_gradient(z_fine)
        mse_fine = _fine_mse(
            params["fine"], config, rays_orig, rays_dirs, z_fine, target_rgb,
            noise_key=k_noise_f if noise_on else None,
        )
        loss = loss + mse_fine
        metrics["psnr_fine"] = rendering.psnr_from_mse(mse_fine)

    metrics["loss"] = loss
    return loss, metrics


def training_losses_fixed_z(
    params: Params,
    config: NeRFConfig,
    rays_orig: jnp.ndarray,
    rays_dirs: jnp.ndarray,
    target_rgb: jnp.ndarray,
    z_coarse: jnp.ndarray,
    z_fine: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """The training objective with caller-supplied z samples (no RNG and no
    inverse-CDF resampling inside the differentiated region).

    Exists for the on-chip gradient-parity harness (``tools/parity_tpu.py``):
    :func:`training_losses` differentiates *through* the hierarchical
    resampling, whose ``searchsorted`` bin assignment is discontinuous in the
    coarse weights — a 1-ulp forward difference between two backends can flip
    resampling bins and make per-leaf gradients diverge O(1) with no kernel
    bug at all. Pinning both z tensors makes the objective a smooth function
    of the parameters, so backends are comparable to float tolerance. Runs
    the identical backend code paths (:func:`render_rays_train` /
    :func:`_fine_mse`) as production training.
    """
    rgb_coarse, _ = render_rays_train(
        params["coarse"], config, rays_orig, rays_dirs, z_coarse
    )
    loss = jnp.mean(jnp.square(target_rgb - rgb_coarse))
    if params.get("fine") is not None and z_fine is not None:
        loss = loss + _fine_mse(
            params["fine"], config, rays_orig, rays_dirs, z_fine, target_rgb
        )
    return loss


@functools.partial(
    jax.jit,
    static_argnames=("config", "n_samples_coarse", "n_samples_fine", "diagnostics"),
)
def _render_chunk(
    params, config, key, orig, dirs, n_samples_coarse, n_samples_fine, diagnostics
):
    result, z = render(
        params, config, key, orig, dirs, n_samples_coarse, n_samples_fine,
        diagnostics=diagnostics,
    )
    return result, z


def render_image(
    params: Params,
    config: NeRFConfig,
    key,
    c2w,
    field_of_view,
    height: int,
    width: int,
    chunk_size: int = 16384,
    n_samples_coarse: Optional[int] = None,
    n_samples_fine: Optional[int] = None,
    diagnostics: bool = True,
) -> Tuple[RenderResult, jnp.ndarray]:
    """Full-frame render, chunked over rays to bound peak memory.

    Host-side chunk loop like the reference (``src/NeRF.py:190-246``), but over
    fixed-size chunks (the ray count is padded up) so every chunk reuses one
    compiled executable. For the sharded multi-chip version see
    ``parallel/render_tiles.py``.

    :return: ``(RenderResult with (h, w, ...) shapes, z_values (h, w, S))``.
    """
    orig, dirs = cameras.rays_for_image(height, width, field_of_view, c2w)
    n_rays = orig.shape[0]
    chunk = min(chunk_size, n_rays)
    n_chunks = -(-n_rays // chunk)
    pad = n_chunks * chunk - n_rays
    if pad:
        orig = jnp.concatenate([orig, jnp.broadcast_to(orig[-1:], (pad, 4))], axis=0)
        dirs = jnp.concatenate([dirs, jnp.broadcast_to(dirs[-1:], (pad, 4))], axis=0)

    keys = [None] * n_chunks if key is None else jax.random.split(key, n_chunks)
    parts = [
        _render_chunk(
            params, config, keys[i],
            jax.lax.dynamic_slice_in_dim(orig, i * chunk, chunk),
            jax.lax.dynamic_slice_in_dim(dirs, i * chunk, chunk),
            n_samples_coarse, n_samples_fine, diagnostics,
        )
        for i in range(n_chunks)
    ]
    results = [p[0] for p in parts]
    zs = [p[1] for p in parts]
    merged = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0)[:n_rays], *results)
    z = jnp.concatenate(zs, axis=0)[:n_rays]
    return (
        RenderResult(
            rgb=merged.rgb.reshape(height, width, 3),
            weights=merged.weights.reshape(height, width, -1),
            cumprod=None if merged.cumprod is None
            else merged.cumprod.reshape(height, width, -1),
            alpha=None if merged.alpha is None
            else merged.alpha.reshape(height, width, -1),
            sample_rgb=None if merged.sample_rgb is None
            else merged.sample_rgb.reshape(
                height, width, merged.sample_rgb.shape[-2], 3
            ),
        ),
        z.reshape(height, width, -1),
    )
