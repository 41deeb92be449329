#!/usr/bin/env python
"""Data-parallel scaling efficiency on a virtual device mesh.

BASELINE.json north-star metric #4 (>= 0.9 efficiency at N hosts). Real pods
aren't reachable from CI, so this measures the *sharded program* on N virtual
CPU devices: it validates that the step scales (per-device work shrinks as
1/N with replicated-gradient psum) and that efficiency accounting works; run
the same script on a real pod slice for hardware numbers.
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
    batch_per_dev = 512

    def run(devices):
        mesh = mesh_lib.make_mesh(jax.devices()[:devices])
        n = batch_per_dev * devices
        orig = jnp.zeros((n, 4)).at[:, 3].set(1.0)
        dirs = jnp.concatenate(
            [jax.random.normal(jax.random.PRNGKey(1), (n, 3)), jnp.zeros((n, 1))], -1
        )
        rgb = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
        batch = mesh_lib.shard_batch(mesh, orig, dirs, rgb)
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
        return n * iters / (time.perf_counter() - t0)

    base = run(1)
    full = run(n_dev)
    efficiency = full / (base * n_dev)
    print(
        json.dumps(
            {
                "metric": "dp_scaling_efficiency",
                "value": round(efficiency, 3),
                "unit": f"throughput ratio at {n_dev} devices (weak scaling)",
                "rays_per_sec_1dev": round(base, 1),
                f"rays_per_sec_{n_dev}dev": round(full, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
