"""Headline benchmark: training throughput in rays/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the production training path — the whole-epoch jitted program
(`train_step.make_epoch_fn`): ray table resident in HBM, on-device
permutation + batch gather + `lax.scan` over optimization steps. Workload per
step matches the reference's flagship config (4096 rays, 64 coarse + 128 fine
samples, 256-wide MLP; `config_files/256px_alexander_71pics_sphere_nerf.yaml`
equivalents).

The reference publishes no numbers (BASELINE.md): ``vs_baseline`` is reported
against a conservative analytic A100 estimate for the same workload — public
single-A100 TF implementations of this size sustain roughly 40-60k rays/s;
50k is used as the comparison point.
"""

from __future__ import annotations

import glob
import json
import re
import sys
import time

import jax
import jax.numpy as jnp


def _last_committed_value() -> float | None:
    """Throughput recorded in the newest committed BENCH_r*.json, if any."""
    best = None
    for path in glob.glob("BENCH_r*.json"):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                value = json.load(f).get("parsed", {}).get("value")
        except (OSError, json.JSONDecodeError):
            continue
        if value is not None and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), float(value))
    return best[1] if best else None


def main() -> None:
    from nerf_and_dietnerf_tpu.models.nerf import NeRFConfig
    from nerf_and_dietnerf_tpu.train import train_step as ts

    # Production single-chip config: fused Pallas kernel backend,
    # reference-exact gradient semantics.
    config = NeRFConfig(backend="pallas")
    batch = 4096
    steps_per_call = 40
    optimizer = ts.make_optimizer(5e-4)
    state = ts.init_train_state(jax.random.PRNGKey(0), config, optimizer)

    # Synthetic ray table (shapes/dtypes of the real pipeline).
    n_rays = batch * steps_per_call
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    orig = jnp.zeros((n_rays, 4), jnp.float32).at[:, 3].set(1.0)
    dirs = jnp.concatenate(
        [jax.random.normal(k1, (n_rays, 3)), jnp.zeros((n_rays, 1))], axis=-1
    )
    rgb = jax.random.uniform(k2, (n_rays, 3))

    epoch_fn = ts.make_epoch_fn(config, optimizer, steps_per_call, batch)

    # Warmup / compile. NOTE: timing fences use float(...) host materialization,
    # not block_until_ready — some remote PJRT runtimes return from
    # block_until_ready before execution completes.
    state, metrics = epoch_fn(state, jax.random.PRNGKey(2), orig, dirs, rgb)
    float(metrics["loss"])

    n_calls = 3
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, metrics = epoch_fn(state, jax.random.PRNGKey(3 + i), orig, dirs, rgb)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = batch * steps_per_call * n_calls / dt

    # Regression tripwire (stderr — stdout stays one JSON line): compare
    # against the newest committed BENCH_r*.json and complain loudly on a
    # significant drop so a silent routing/backend regression fails review.
    committed = _last_committed_value()
    if committed:
        delta = rays_per_sec / committed - 1.0
        msg = (
            f"[bench tripwire] {rays_per_sec:,.0f} rays/s vs last committed "
            f"{committed:,.0f} ({delta:+.1%})"
        )
        if delta < -0.05:
            msg += "  *** REGRESSION: >5% below the committed number ***"
        print(msg, file=sys.stderr)

    baseline = 50_000.0
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / baseline, 3),
                "baseline_note": (
                    "analytic single-A100 estimate (~50k rays/s) — the "
                    "reference publishes no numbers (BASELINE.md)"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
