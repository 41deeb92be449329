"""Run configuration: the reference's YAML schema, parsed into typed objects.

Field names and sections are 1:1 with the reference's config files
(``src/ConfigurationKeys.py:10-146``) so every stock ``config_files/*.yaml``
loads unchanged. New, optional, TPU-specific section: ``mesh`` (data-parallel
device count; absent => all local devices).
"""

from __future__ import annotations

import dataclasses
import shutil
from pathlib import Path
from typing import List, Optional

import yaml

from nerf_and_dietnerf_tpu.models.mlp import MLPConfig
from nerf_and_dietnerf_tpu.models.nerf import NeRFConfig


@dataclasses.dataclass
class TasksConfig:
    """The 8 boolean task switches (``src/ConfigurationKeys.py:34-59``),
    executed in the reference's fixed order (``src/ExecutionRun.py:115-152``)."""

    start_training: bool = False
    render_and_save_test_left_to_right_video: bool = False
    render_and_save_test_sphere_video: bool = False
    render_and_save_test_path_video: bool = False
    save_dataset_video: bool = False
    save_plots_video: bool = False
    create_plots_that_visualize_values_along_rays: bool = False
    create_plot_that_visualize_rendering_between_2_images: bool = False


@dataclasses.dataclass
class VideoConfig:
    """``video`` section (``src/ConfigurationKeys.py:134-146``)."""

    fps_train_set_video: int = 5
    fps_render_video: int = 60
    fps_plot_video: int = 5
    img_indices_for_path_video: List[int] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class RunConfig:
    """One execution run == one YAML file (reference ``ExecutionRun`` ctor,
    ``src/ExecutionRun.py:53-113``)."""

    # General / dataset keys (src/ConfigurationKeys.py:10-29).
    dataset_type: str = "blender"
    dataset_location: str = ""
    general_save_location: str = "Results"
    existing_save_dir_name: Optional[str] = None
    starting_epoch_number: int = -1
    google_cloud_bucket_name: Optional[str] = None
    pics_indices_to_use_in_dataset: Optional[List[int]] = None

    # neural_net section.
    type_of_model: str = "NeRF"
    hidden_layer_dim: int = 256
    last_hidden_layer_dim: int = 128
    leaky_relu_alpha: float = 0.05
    n_pos_enc_dim_xyz: int = 5
    n_pos_enc_view_dir: int = 4
    n_angles_for_model: int = 2
    n_rays_in_batch_train: int = 4096
    n_rays_in_batch_render: int = 4096

    # render section.
    n_render_samples_coarse: int = 64
    n_render_samples_fine: int = 128
    near_depth_render: float = 2.0
    far_depth_render: float = 6.0

    # training section.
    n_epochs: int = 70
    optimizer_lr: float = 5e-4
    test_img_idx: int = 0
    idx_train_img_to_plot: int = 0

    tasks: TasksConfig = dataclasses.field(default_factory=TasksConfig)
    video: VideoConfig = dataclasses.field(default_factory=VideoConfig)

    # TPU-native extensions (no reference analog).
    mesh_data_devices: Optional[int] = None  # None => all local devices
    compute_dtype: str = "bfloat16"          # "float32" for parity runs
    backend: str = "xla"        # "xla" | "pallas" | "pallas_mlp" | "pallas_rm"
    on_device_epoch: bool = True             # whole-epoch lax.scan when it fits
    stop_fine_z_grad: bool = False           # True = bmild/nerf stop-gradient
    # Parameter-init PRNG seed. Matters more than it sounds: on
    # black-background frontal scenes (Robot l_to_r) the fine network's
    # relu-density head can be born (near-)dead — sigma preactivations
    # almost all negative => relu' kills the density gradient => the fine
    # pass renders black forever while the coarse net trains fine (measured:
    # runs/robot100_l_to_r_r04/RESULTS.md, two 50-100-epoch runs stuck at
    # exactly the all-black PSNR). The reference hardcodes its framework's
    # init draw; changing the seed redraws the lottery.
    init_seed: int = 0
    # Initial bias of the relu-density head (0.0 = reference-exact Keras
    # default). Opt-in robustness knob: a small positive value (e.g. 0.5)
    # removes the dead-density init lottery on black-background frontal
    # scenes entirely instead of redrawing it (see models/mlp.MLPConfig and
    # runs/robot8_diet_ab_r05/RESULTS.md).
    sigma_bias_init: float = 0.0
    # Train-time gaussian noise std on the density preactivation (bmild's
    # raw_noise_std; 0.0 = reference-exact). The RELIABLE dead-density fix:
    # unlike seed redraws / bias shifts it gives a dead relu head gradient
    # signal on every step (see models/nerf.NeRFConfig.sigma_noise_std and
    # runs/robot8_diet_ab_r05/RESULTS.md).
    sigma_noise_std: float = 0.0
    # Optional global-norm gradient clip (null = reference behavior, no
    # clipping). See train_step.make_optimizer for the measured rationale.
    grad_clip_norm: 'Optional[float]' = None
    # Optional exponential lr decay target (null = reference behavior,
    # constant lr). When set, lr decays from optimizer_lr to this value over
    # the run's total steps (the bmild/nerf schedule shape); fixes the
    # measured late-phase oscillation at constant lr on the 256px flagship
    # (see train_step.make_optimizer_with_schedule).
    optimizer_lr_final: 'Optional[float]' = None
    # Chunk size for OFFLINE full-frame renders (per-epoch eval, videos,
    # special plots). None = auto (32768, the measured-optimal f32 chunk on
    # one v5e: 0.343 s/frame at 32768 vs 0.372 at 16384, BENCH_RENDER.json —
    # and each halving below that pays an extra ~3 ms dispatch tax per
    # chunk). Decoupled from n_rays_in_batch_render, whose stock values are
    # sized for the reference's GPU memory (src/NeRF.py:211-218) and cost
    # minutes of avoidable dispatch on a 720-frame orbit.
    offline_render_chunk: 'Optional[int]' = None
    # DietNeRF without pretrained ViT weights is a measurably quality-LOSING
    # mode (random-init embedder: -1.83 dB vs consistency-off on the 50px
    # few-shot A/B, runs/diet_ab_50px/RESULTS.md). Refuse to train it unless
    # the config opts in explicitly (or --vit-weights supplies a checkpoint).
    allow_random_embedder: bool = False
    config_name: str = "run"                 # stem of the YAML file

    VALID_BACKENDS = ("xla", "pallas", "pallas_mlp", "pallas_rm")

    def __post_init__(self):
        # A typo'd backend would silently fall through to the plain-XLA path
        # in models/nerf._mlp_apply and benchmark the wrong implementation.
        if self.backend not in self.VALID_BACKENDS:
            raise ValueError(
                f"unknown backend {self.backend!r}; expected one of "
                f"{self.VALID_BACKENDS}"
            )
        if self.compute_dtype not in ("bfloat16", "float32"):
            raise ValueError(
                f"unknown compute_dtype {self.compute_dtype!r}; expected "
                "'bfloat16' or 'float32'"
            )

    def nerf_config(self) -> NeRFConfig:
        """The jit-static model/render config derived from this run config."""
        import jax.numpy as jnp

        return NeRFConfig(
            mlp=MLPConfig(
                hidden_dim=self.hidden_layer_dim,
                last_hidden_dim=self.last_hidden_layer_dim,
                leaky_relu_alpha=self.leaky_relu_alpha,
                n_freq_xyz=self.n_pos_enc_dim_xyz,
                n_freq_dir=self.n_pos_enc_view_dir,
                n_angles=self.n_angles_for_model,
                sigma_bias_init=self.sigma_bias_init,
            ),
            n_samples_coarse=self.n_render_samples_coarse,
            n_samples_fine=self.n_render_samples_fine,
            near=self.near_depth_render,
            far=self.far_depth_render,
            compute_dtype=jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32,
            backend=self.backend,
            stop_fine_z_grad=self.stop_fine_z_grad,
            sigma_noise_std=self.sigma_noise_std,
        )

    # Auto chunk for offline renders (see offline_render_chunk above).
    OFFLINE_RENDER_CHUNK_AUTO = 32768

    def offline_chunk_size(self) -> int:
        """Rays per jitted call for offline/eval full-frame renders."""
        if self.offline_render_chunk is not None:
            return self.offline_render_chunk
        return max(self.OFFLINE_RENDER_CHUNK_AUTO, self.n_rays_in_batch_render)

    @property
    def is_dietnerf(self) -> bool:
        return self.type_of_model.lower() == "dietnerf"


# Keys present in some stock reference configs but read nowhere in the
# reference code (verified absent from src/ConfigurationKeys.py) — accepted
# and ignored for config-file compatibility.
LEGACY_IGNORED_KEYS = {
    "video_total_x_distance_l_to_r",
    "video_z_closest_distance",
    "video_sphere_radius",
    "epoch_num_to_reach_high_lr",
    "epoch_num_to_reach_low_lr",
    "optimizer_low_lr",
}


def load_config(path) -> RunConfig:
    """Parse a reference-format YAML into a :class:`RunConfig`
    (reference ``src/UtilsFiles.py:182-194``). Unknown keys are rejected so
    typos fail loudly (the reference silently ignores them), except the
    known-dead legacy keys above."""
    path = Path(path)
    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    cfg = RunConfig(config_name=path.stem)
    sections = {
        "neural_net": None,
        "render": None,
        "training": None,
        "tasks_to_perform": "tasks",
        "video": "video",
        "mesh": None,
    }
    flat_fields = {f.name for f in dataclasses.fields(RunConfig)}

    def set_flat(key, value, where):
        if key in LEGACY_IGNORED_KEYS:
            return
        mapped = {"data_devices": "mesh_data_devices"}.get(key, key)
        if mapped not in flat_fields:
            raise ValueError(f"unknown config key {key!r} in {where} of {path}")
        setattr(cfg, mapped, value)

    for key, value in raw.items():
        if key in ("tasks_to_perform", "video"):
            target = getattr(cfg, sections[key])
            valid = {f.name for f in dataclasses.fields(target)}
            for k, v in (value or {}).items():
                if k in LEGACY_IGNORED_KEYS:
                    continue
                if k not in valid:
                    raise ValueError(f"unknown key {k!r} in section {key} of {path}")
                setattr(target, k, v)
        elif key in sections:
            for k, v in (value or {}).items():
                set_flat(k, v, key)
        else:
            set_flat(key, value, "top level")
    return cfg


def make_save_dir(config: RunConfig, config_path=None) -> Path:
    """Create (or reuse) the run's save directory.

    Matches the reference convention ``{general}/{config}_save_dir_{n}`` with
    auto-increment for fresh runs and reuse via ``existing_save_dir_name``
    (``src/UtilsFiles.py:232-281``); the config snapshot is copied in
    (``src/ExecutionRun.py:87``).
    """
    base = Path(config.general_save_location)
    base.mkdir(parents=True, exist_ok=True)
    if config.existing_save_dir_name:
        save_dir = base / config.existing_save_dir_name
        if not save_dir.is_dir():
            raise FileNotFoundError(f"existing_save_dir_name not found: {save_dir}")
        return save_dir

    def highest_n() -> int:
        n = 0
        while (base / f"{config.config_name}_save_dir_{n}").exists():
            n += 1
        return n

    import jax

    if jax.process_count() > 1:
        # Multi-controller: the auto-increment scan is racy across processes
        # (two ranks could claim different n and then deadlock in Orbax, which
        # requires every process to checkpoint into the SAME directory).
        # Process 0 creates the directory; everyone else barriers on the
        # coordination service, then adopts the newest existing dir.
        from jax.experimental import multihost_utils

        if jax.process_index() == 0:
            save_dir = base / f"{config.config_name}_save_dir_{highest_n()}"
            save_dir.mkdir(parents=True)
            if config_path is not None:
                shutil.copy(config_path, save_dir / Path(config_path).name)
        multihost_utils.sync_global_devices("make_save_dir")
        if jax.process_index() != 0:
            save_dir = base / f"{config.config_name}_save_dir_{highest_n() - 1}"
        return save_dir

    save_dir = base / f"{config.config_name}_save_dir_{highest_n()}"
    save_dir.mkdir(parents=True)
    if config_path is not None:
        shutil.copy(config_path, save_dir / Path(config_path).name)
    return save_dir
