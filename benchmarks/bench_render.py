#!/usr/bin/env python
"""Full-frame render benchmark: 256px Alexander-class frame time.

BASELINE.json north-star metric #2. Prints one JSON line per configuration:
the production render path (fused Pallas kernel, float32 — what eval/videos
use since r3) against the plain-XLA f32 path it replaced, at two chunk sizes.
Timing fences on host materialization (remote PJRT block_until_ready can
return early).
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from nerf_and_dietnerf_tpu.models import nerf
    from nerf_and_dietnerf_tpu.models.nerf import NeRFConfig

    params = nerf.init_params(
        jax.random.PRNGKey(0), NeRFConfig(compute_dtype=jnp.float32)
    )
    h = w = 256
    c2w = jnp.eye(4).at[2, 3].set(3.0)
    fov = 0.69

    # chunk 65536 at f32 OOMs the 16G HBM (merged fine pass = 12.6M rows of
    # lane-padded encodings, measured 18G); 16384 is the production render
    # chunk, 32768 probes the amortization headroom.
    for backend, chunks in (("pallas", (16384, 32768)), ("xla", (16384,))):
        config = NeRFConfig(compute_dtype=jnp.float32, backend=backend)
        for chunk in chunks:
            result, _ = nerf.render_image(
                params, config, jax.random.PRNGKey(1), c2w, fov, h, w,
                chunk_size=chunk, diagnostics=False,
            )
            float(result.rgb.sum())  # compile + fence
            n = 5
            t0 = time.perf_counter()
            for i in range(n):
                result, _ = nerf.render_image(
                    params, config, jax.random.PRNGKey(i), c2w, fov, h, w,
                    chunk_size=chunk, diagnostics=False,
                )
                float(result.rgb.sum())
            dt = (time.perf_counter() - t0) / n
            print(
                json.dumps(
                    {
                        "metric": "render_256px_frame_seconds",
                        "value": round(dt, 4),
                        "unit": "s/frame",
                        "backend": backend,
                        "chunk_size": chunk,
                        "rays_per_sec": round(h * w / dt, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
