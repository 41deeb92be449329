#!/usr/bin/env python
"""Flagship-shape kernel grad parity ON THE REAL CHIP (VERDICT round 1, #6).

The CPU suite checks the Pallas kernels in interpret mode on tiny shapes;
this tool compares the Mosaic-compiled kernels against the plain-XLA pipeline
at the production shape — 4096 rays, 64 coarse + 128 fine samples, 256-wide
MLP — loss AND every gradient leaf, in f32 and bf16.

Writes PARITY_TPU.json and prints a summary. Pass/fail thresholds:
max relative error < 1e-3 (f32) / < 1e-2 (bf16), relative to the max |grad|
of each leaf (reference train semantics: /root/reference/src/NeRF.py:136-167).
"""

from __future__ import annotations

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np


def max_rel_err(ref_tree, got_tree):
    worst = 0.0
    for a, b in zip(jax.tree.leaves(ref_tree), jax.tree.leaves(got_tree)):
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        err = float(jnp.max(jnp.abs(jnp.asarray(b) - jnp.asarray(a)))) / scale
        worst = max(worst, err)
    return worst


def main() -> None:
    from nerf_and_dietnerf_tpu.models import nerf
    from nerf_and_dietnerf_tpu.train import train_step as ts

    assert jax.default_backend() == "tpu", "this tool must run on the chip"

    batch = 4096
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    orig = jnp.zeros((batch, 4), jnp.float32).at[:, 3].set(1.0)
    dirs = jnp.concatenate(
        [jax.random.normal(k1, (batch, 3)), jnp.zeros((batch, 1))], axis=-1
    )
    rgb = jax.random.uniform(k2, (batch, 3))

    results = {}
    ok = True
    for dtype_name, dtype, tol in (("float32", jnp.float32, 1e-3),
                                   ("bfloat16", jnp.bfloat16, 1e-2)):
        cfg_x = nerf.NeRFConfig(backend="xla", compute_dtype=dtype)
        params = nerf.init_params(jax.random.PRNGKey(0), cfg_x)

        def loss_grads(cfg):
            f = jax.jit(
                lambda p: jax.value_and_grad(
                    lambda q: nerf.training_losses(
                        q, cfg, jax.random.PRNGKey(7), orig, dirs, rgb
                    )[0]
                )(p)
            )
            loss, grads = f(params)
            return float(loss), jax.device_get(grads)

        loss_ref, grads_ref = loss_grads(cfg_x)
        variants = (
            ("pallas", {}),
            ("pallas+fuse_fine_loss", {"backend": "pallas", "fuse_fine_loss": True}),
            ("pallas+fuse_compositing", {"backend": "pallas", "fuse_compositing": True}),
            ("pallas_rm", {}),
        )
        for name, overrides in variants:
            cfg = dataclasses.replace(
                cfg_x, **(overrides or {"backend": name})
            )
            backend = name
            loss_got, grads_got = loss_grads(cfg)
            rel_loss = abs(loss_got - loss_ref) / max(1e-6, abs(loss_ref))
            rel_grad = max_rel_err(grads_ref, grads_got)
            passed = rel_grad < tol and rel_loss < tol
            ok &= passed
            results[f"{backend}/{dtype_name}"] = {
                "loss_xla": loss_ref,
                "loss_kernel": loss_got,
                "rel_loss_err": rel_loss,
                "max_rel_grad_err": rel_grad,
                "tol": tol,
                "pass": passed,
            }
            print(
                f"{backend:10s} {dtype_name:8s} loss_err={rel_loss:.2e} "
                f"grad_err={rel_grad:.2e} tol={tol:.0e} "
                f"{'PASS' if passed else 'FAIL'}",
                flush=True,
            )

    out = {
        "shape": {"rays": batch, "coarse": 64, "fine": 128, "hidden": 256},
        "device": str(jax.devices()[0]),
        "results": results,
        "all_pass": ok,
    }
    with open("PARITY_TPU.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"all_pass": ok}))


if __name__ == "__main__":
    main()
