"""CLI entry point: run one or more YAML configs end to end.

Replaces the reference's hard-coded config list (``main.py:16-36``) with a
proper CLI, plus flags for the TPU-native additions (mesh size, multi-host
init, ViT weights for DietNeRF).

Usage::

    python -m nerf_and_dietnerf_tpu.main config_files/50px_alexander.yaml \
        [more.yaml ...] [--vit-weights vit_b32.npz] [--save-root Results] \
        [--data-devices N] [--distributed]
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("configs", nargs="+", help="YAML run configs (reference schema)")
    p.add_argument("--save-root", default=None, help="override general_save_location")
    p.add_argument(
        "--vit-weights", default=None,
        help="path to public ViT-B/32 weights for DietNeRF (npz/safetensors/bin)",
    )
    p.add_argument(
        "--data-devices", type=int, default=None,
        help="devices on the data-parallel mesh axis (default: all local)",
    )
    p.add_argument(
        "--distributed", action="store_true",
        help="call jax.distributed.initialize() for multi-host pods",
    )
    p.add_argument(
        "--trace-dir", default=None,
        help="capture a jax.profiler trace of each run into this directory",
    )
    p.add_argument(
        "--nan-checks", action="store_true",
        help="enable jax_debug_nans (debug mode; recompiles, slower)",
    )
    p.add_argument(
        "--platform", default=None, choices=("cpu", "tpu"),
        help="force a JAX platform (e.g. cpu for debugging off-TPU); set "
        "through jax.config because JAX_PLATFORMS can be preempted by "
        "site configuration",
    )
    return p


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.distributed:
        # On TPU pods / SLURM / MPI jax auto-detects everything. Elsewhere
        # (e.g. hand-launched CPU processes) the standard JAX_* env triple
        # configures the coordination service explicitly.
        import os

        kwargs = {}
        for env, kw, cast in (
            ("JAX_COORDINATOR_ADDRESS", "coordinator_address", str),
            ("JAX_NUM_PROCESSES", "num_processes", int),
            ("JAX_PROCESS_ID", "process_id", int),
        ):
            value = os.environ.get(env)
            if value is not None:
                kwargs[kw] = cast(value)
        jax.distributed.initialize(**kwargs)

    import contextlib

    from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib
    from nerf_and_dietnerf_tpu.tasks.runner import Runner
    from nerf_and_dietnerf_tpu.utils import profiling

    if args.nan_checks:
        profiling.enable_nan_checks()

    devices = jax.devices()
    if args.data_devices:
        devices = devices[: args.data_devices]
    mesh = mesh_lib.make_mesh(devices) if len(devices) > 1 else None

    for config_path in args.configs:
        print(f"=== {config_path} ===")
        start = time.time()
        try:
            trace_ctx = (
                profiling.trace(args.trace_dir)
                if args.trace_dir
                else contextlib.nullcontext()
            )
            with trace_ctx:
                Runner(
                    config_path, mesh=mesh,
                    vit_weights=args.vit_weights, save_root=args.save_root,
                ).start()
        except Exception:
            traceback.print_exc()
            return 1
        print(f"Done with {config_path}. Took {time.time() - start:.5g} seconds.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
