#!/usr/bin/env python
"""Data-parallel scaling: what a single host can honestly measure.

BASELINE.json north-star metric #4 is ">= 0.9 rays/s scaling efficiency at
N >= 2 hosts". A real pod is not reachable from this environment, and a
*virtual* N-device CPU mesh cannot measure efficiency either: the N virtual
devices share one CPU's cores, so N-fold "weak scaling" just measures core
contention (measured 0.13 "efficiency" at 8 virtual devices — silicon
contention, not program overhead).

What the virtual mesh CAN measure is **absence of serialization**: the same
global batch stepped unsharded and sharded over N in {2, 4, 8} virtual
devices with replicated-gradient psum. Same total FLOPs on the same silicon —
if the partitioned program serialized anywhere (a bad collective schedule, a
replicated recompute), step time would GROW with N. It does not (the series
is flat-to-decreasing).

Why sharded can come out FASTER than unsharded here (round-3's confusing
0.643): all virtual devices share one host CPU with one XLA intra-op thread
pool. The unsharded program's ops often can't use every core, while N
partitioned per-shard programs execute concurrently and saturate the pool —
so the ratio mixes thread-pool utilization with partitioning overhead and is
reported only as evidence of non-serialization, never as efficiency.

For the real-pod number this prints an **analytic ICI model** from measured
quantities: per-step gradient all-reduce bytes (the only cross-chip traffic;
params are replicated) vs the committed single-chip step time. On v5e ICI
(~186 GB/s/link bidirectional, ring all-reduce moves 2*(N-1)/N * bytes), the
~4.2 MB gradient all-reduce overlaps with a ~28 ms backward — expected
efficiency is >0.99, far above the 0.9 target; the binding risk at scale is
input pipeline, not ICI. Run this script on a real pod slice to replace the
model with hardware numbers.

Prints one JSON line per metric.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    n_dev = int(os.environ.get("SCALING_BENCH_DEVICES", "8"))
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nerf_and_dietnerf_tpu.models import nerf
    from nerf_and_dietnerf_tpu.models.mlp import MLPConfig
    from nerf_and_dietnerf_tpu.parallel import mesh as mesh_lib
    from nerf_and_dietnerf_tpu.train import train_step as ts

    config = nerf.NeRFConfig(
        mlp=MLPConfig(hidden_dim=64, last_hidden_dim=32),
        n_samples_coarse=16, n_samples_fine=16, compute_dtype=jnp.float32,
    )
    opt = ts.make_optimizer(5e-4)
    global_batch = 4096

    def make_batch(n):
        orig = jnp.zeros((n, 4)).at[:, 3].set(1.0)
        dirs = jnp.concatenate(
            [jax.random.normal(jax.random.PRNGKey(1), (n, 3)), jnp.zeros((n, 1))], -1
        )
        rgb = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
        return orig, dirs, rgb

    def time_step(devices):
        """Seconds/step for the SAME global batch on 1 vs N devices."""
        batch = make_batch(global_batch)
        if devices == 1:
            state = ts.init_train_state(jax.random.PRNGKey(0), config, opt)
            step = ts.make_train_step(config, opt, donate=False)
        else:
            mesh = mesh_lib.make_mesh(jax.devices()[:devices])
            batch = mesh_lib.shard_batch(mesh, *batch)
            state = jax.device_put(
                ts.init_train_state(jax.random.PRNGKey(0), config, opt),
                mesh_lib.replicated(mesh),
            )
            step = ts.make_train_step(config, opt, mesh=mesh, donate=False)
        state, m = step(state, jax.random.PRNGKey(3), batch)
        float(m["loss"])  # host-materialization timing fence
        iters = 10
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step(state, jax.random.PRNGKey(i), batch)
        float(m["loss"])
        return (time.perf_counter() - t0) / iters

    series = {}
    ns = [1] + [n for n in (2, 4, 8) if n <= n_dev]
    for n in ns:
        series[n] = time_step(n)
    t1 = series[1]
    for n in ns:
        print(
            json.dumps(
                {
                    "metric": "same_batch_step_time_virtual_mesh",
                    "devices": n,
                    "value": round(series[n], 5),
                    "unit": f"s/step, same {global_batch}-ray global batch "
                            f"sharded over N virtual CPU devices",
                    "ratio_vs_unsharded": round(series[n] / t1, 3),
                    "note": (
                        "NOT a hardware number: virtual devices share one "
                        "CPU + one XLA thread pool, so N concurrent shard "
                        "programs can beat one under-parallelized unsharded "
                        "program (ratio < 1). The series only shows the "
                        "partitioned program adds no serialization (time "
                        "does not grow with N)."
                    ),
                }
            )
        )

    # Analytic ICI model for the real-pod efficiency (flagship shape).
    flagship = nerf.NeRFConfig()
    params = nerf.init_params(jax.random.PRNGKey(0), flagship)
    grad_bytes = sum(
        leaf.size * 4 for leaf in jax.tree.leaves(params)
    )  # f32 gradient all-reduce payload per step
    step_s = 0.0248  # committed single-chip step time (BENCH_r03: 165,414 rays/s @ 4096 rays = 24.8 ms)
    ici_bytes_per_s = 186e9  # v5e ICI per-link bidirectional
    for n in (2, 4, 8, 16, 64, 256):
        ring_bytes = 2 * (n - 1) / n * grad_bytes
        comm_s = ring_bytes / ici_bytes_per_s
        # Upper bound: zero overlap with backward. XLA overlaps in practice.
        eff = step_s / (step_s + comm_s)
        if n in (2, 8, 256):
            print(
                json.dumps(
                    {
                        "metric": "dp_scaling_efficiency_analytic",
                        "value": round(eff, 4),
                        "unit": f"modelled at {n} chips (no-overlap lower bound)",
                        "grad_allreduce_mbytes": round(ring_bytes / 1e6, 2),
                        "needs_real_pod": True,
                    }
                )
            )


if __name__ == "__main__":
    main()
