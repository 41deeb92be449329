#!/usr/bin/env python
"""Full-frame render benchmark: 256px Alexander-class frame time.

BASELINE.json north-star metric #2. Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from nerf_and_dietnerf_tpu.models import nerf
    from nerf_and_dietnerf_tpu.models.nerf import NeRFConfig

    # Production render config: float32 compute (what videos/eval use).
    config = NeRFConfig(compute_dtype=jnp.float32)
    params = nerf.init_params(jax.random.PRNGKey(0), config)
    h = w = 256
    c2w = jnp.eye(4).at[2, 3].set(3.0)
    fov = 0.69

    for chunk in (16384, 65536):
        # Warmup/compile. Timing fences on host materialization (remote PJRT
        # block_until_ready can return early).
        result, _ = nerf.render_image(
            params, config, jax.random.PRNGKey(1), c2w, fov, h, w, chunk_size=chunk
        )
        float(result.rgb.sum())
        n = 5
        t0 = time.perf_counter()
        for i in range(n):
            result, _ = nerf.render_image(
                params, config, jax.random.PRNGKey(i), c2w, fov, h, w, chunk_size=chunk
            )
            float(result.rgb.sum())
        dt = (time.perf_counter() - t0) / n
        print(
            json.dumps(
                {
                    "metric": "render_256px_frame_seconds",
                    "value": round(dt, 4),
                    "unit": "s/frame",
                    "chunk_size": chunk,
                    "rays_per_sec": round(h * w / dt, 1),
                }
            )
        )


if __name__ == "__main__":
    main()
