#!/usr/bin/env python
"""Flagship-shape kernel grad parity ON THE REAL CHIP — fixed-z methodology.

Why fixed z
-----------
Round 2 committed a harness that differentiated through the *full* training
objective (``nerf.training_losses``), i.e. through the hierarchical
inverse-CDF resampling. That objective is **discontinuous** in the coarse
weights: the resampling's ``searchsorted`` bin assignment
(``core/sampling.py:146-153``) flips under a 1-ulp forward difference, moving
fine samples to different z locations and making per-leaf gradients diverge
O(1) between two backends whose kernels agree perfectly. The committed
round-2 numbers (max rel grad err 0.94-4.4 with loss err ~2e-4) were exactly
that chaos, not a kernel bug — confirmed here by the ``bin_agreement``
diagnostic.

This harness instead differentiates ``nerf.training_losses_fixed_z``: the
same backend code paths as production training (coarse pass via
``render_rays_train``, fine pass via ``nerf._fine_mse`` including the fused
fine-loss kernel variant), but with both z tensors precomputed once and fed
to every backend as constants. The objective is then a smooth function of
the parameters and backends are comparable to float tolerance.

Why a HIGHEST-precision oracle
------------------------------
On TPU, "f32" matmuls at DEFAULT precision execute as truncated-bf16 MXU
passes — in *both* XLA and Mosaic, but with different pass/tiling structure,
so two correct f32-DEFAULT implementations legitimately differ by O(bf16)
per layer (measured ~7e-2 worst-leaf after the 9-layer backward). Bitwise
agreement at production precision is not a meaningful target; agreement at
HIGHEST precision is. Checks:

1. **exactness** — pallas f32 vs xla f32, BOTH under
   ``jax.default_matmul_precision('highest')`` (6-pass exact f32 on the MXU;
   Mosaic supports DEFAULT and HIGHEST): must agree to 1e-3 worst-leaf
   relative. Any excess is a real kernel bug.
2. **production accuracy** — every backend/dtype at production (DEFAULT)
   precision is judged against the HIGHEST-precision XLA-f32 oracle: pallas
   passes if its oracle error is <= 1.5x the same-dtype XLA path's oracle
   error + 1e-3 (it is as good an approximation of the true gradient as the
   XLA path it replaces).

Reference gradient contract: /root/reference/src/NeRF.py:136-167.
Writes PARITY_TPU.json and prints a summary.
"""

from __future__ import annotations

import dataclasses
import json

import jax
import jax.numpy as jnp


def max_rel_err(ref_tree, got_tree):
    worst = 0.0
    for a, b in zip(jax.tree.leaves(ref_tree), jax.tree.leaves(got_tree)):
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        err = float(jnp.max(jnp.abs(b - a))) / scale
        worst = max(worst, err)
    return worst


def bin_agreement(cfg_a, cfg_b, params, orig, dirs, z_coarse, n_fine):
    """Fraction of hierarchical-resampling bins on which two backends agree.

    Runs the coarse forward of each backend, converts the weights to the
    resampling CDF, and bisects the SAME sorted uniforms into both CDFs
    (``core/sampling`` internals). Any disagreement is a bin flip — the
    discontinuity that invalidated the round-2 full-pipeline comparison.
    """
    from nerf_and_dietnerf_tpu.core import sampling
    from nerf_and_dietnerf_tpu.models import nerf

    u = sampling.sorted_uniforms(
        jax.random.PRNGKey(21), (orig.shape[0],), n_fine
    )

    def bins(cfg):
        _, w = jax.jit(
            lambda p: nerf.render_rays_train(p, cfg, orig, dirs, z_coarse)
        )(params["coarse"])
        w = jnp.asarray(w, jnp.float32)
        pdf = w / (jnp.sum(w, axis=-1, keepdims=True) + sampling.CDF_EPS)
        cdf = jnp.cumsum(pdf, axis=-1)
        return sampling._batched_searchsorted(cdf, u)

    ia, ib = bins(cfg_a), bins(cfg_b)
    return float(jnp.mean((ia == ib).astype(jnp.float32)))


def main() -> None:
    from nerf_and_dietnerf_tpu.core import sampling
    from nerf_and_dietnerf_tpu.models import nerf

    assert jax.default_backend() == "tpu", "this tool must run on the chip"

    batch = 4096
    n_coarse, n_fine = 64, 128
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    orig = jnp.zeros((batch, 4), jnp.float32).at[:, 3].set(1.0)
    dirs = jnp.concatenate(
        [jax.random.normal(k1, (batch, 3)), jnp.zeros((batch, 1))], axis=-1
    )
    rgb = jax.random.uniform(k2, (batch, 3))

    cfg_f32_xla = nerf.NeRFConfig(backend="xla", compute_dtype=jnp.float32)
    params = nerf.init_params(jax.random.PRNGKey(0), cfg_f32_xla)

    # Fixed z tensors, computed ONCE and shared by every backend: stratified
    # coarse z + a fine set resampled from the oracle's coarse weights
    # (outside any differentiated region).
    z_coarse = sampling.stratified_z_values(
        jax.random.PRNGKey(5), cfg_f32_xla.near, cfg_f32_xla.far, (batch,), n_coarse
    )
    with jax.default_matmul_precision("highest"):
        _, w_oracle = jax.jit(
            lambda p: nerf.render_rays_train(p, cfg_f32_xla, orig, dirs, z_coarse)
        )(params["coarse"])
    z_fine = sampling.resample_z_from_weights(
        jax.random.PRNGKey(6), jax.lax.stop_gradient(w_oracle), z_coarse, n_fine
    )
    z_coarse, z_fine = jax.device_get((z_coarse, z_fine))
    z_coarse, z_fine = jnp.asarray(z_coarse), jnp.asarray(z_fine)

    def loss_grads(cfg, highest=False):
        def compute(p):
            return nerf.training_losses_fixed_z(
                p, cfg, orig, dirs, rgb, z_coarse, z_fine
            )

        if highest:
            with jax.default_matmul_precision("highest"):
                loss, grads = jax.jit(jax.value_and_grad(compute))(params)
        else:
            loss, grads = jax.jit(jax.value_and_grad(compute))(params)
        return float(loss), jax.device_get(grads)

    print("computing HIGHEST-precision f32 oracle (XLA)...", flush=True)
    loss_oracle, grads_oracle = loss_grads(cfg_f32_xla, highest=True)

    results = {}
    ok = True

    # Check 1: exactness — pallas vs xla, f32, HIGHEST precision.
    cfg_p32 = dataclasses.replace(cfg_f32_xla, backend="pallas")
    loss_hp, grads_hp = loss_grads(cfg_p32, highest=True)
    err_exact = max_rel_err(grads_oracle, grads_hp)
    rel_loss_exact = abs(loss_hp - loss_oracle) / max(1e-6, abs(loss_oracle))
    passed = err_exact < 1e-3 and rel_loss_exact < 1e-3
    ok &= passed
    results["pallas/float32/highest_precision"] = {
        "loss_xla_highest": loss_oracle,
        "loss_kernel_highest": loss_hp,
        "rel_loss_err": rel_loss_exact,
        "max_rel_grad_err": err_exact,
        "criterion": "exact f32: grad err < 1e-3 vs XLA-f32-HIGHEST",
        "pass": passed,
    }
    print(
        f"{'pallas (HIGHEST, f32)':28s} loss_err={rel_loss_exact:.2e} "
        f"grad_err={err_exact:.2e} {'PASS' if passed else 'FAIL'}",
        flush=True,
    )

    # Check 2: production precision, judged against the oracle.
    variants = (
        ("pallas", {"backend": "pallas"}),
        ("pallas+fuse_fine_loss", {"backend": "pallas", "fuse_fine_loss": True}),
        ("pallas+fuse_compositing", {"backend": "pallas", "fuse_compositing": True}),
        ("pallas_rm", {"backend": "pallas_rm"}),
    )
    for dtype_name, dtype in (("float32", jnp.float32), ("bfloat16", jnp.bfloat16)):
        cfg_x = nerf.NeRFConfig(backend="xla", compute_dtype=dtype)
        loss_ref, grads_ref = loss_grads(cfg_x)
        err_xla_oracle = max_rel_err(grads_oracle, grads_ref)
        for name, overrides in variants:
            cfg = dataclasses.replace(cfg_x, **overrides)
            loss_got, grads_got = loss_grads(cfg)
            rel_loss = abs(loss_got - loss_ref) / max(1e-6, abs(loss_ref))
            err_vs_xla = max_rel_err(grads_ref, grads_got)
            err_vs_oracle = max_rel_err(grads_oracle, grads_got)
            bound = 1.5 * err_xla_oracle + 1e-3
            passed = err_vs_oracle <= bound and rel_loss < 1e-2
            ok &= passed
            results[f"{name}/{dtype_name}"] = {
                "loss_xla": loss_ref,
                "loss_kernel": loss_got,
                "rel_loss_err": rel_loss,
                "max_rel_grad_err_vs_xla_same_dtype": err_vs_xla,
                "max_rel_grad_err_vs_f32_oracle": err_vs_oracle,
                "xla_same_dtype_err_vs_f32_oracle": err_xla_oracle,
                "criterion": (
                    "production precision: grad_err_vs_oracle <= "
                    f"1.5*xla_err+1e-3 (= {bound:.3e})"
                ),
                "pass": passed,
            }
            print(
                f"{name:24s} {dtype_name:8s} loss_err={rel_loss:.2e} "
                f"err_vs_xla={err_vs_xla:.2e} err_vs_oracle={err_vs_oracle:.2e} "
                f"(xla: {err_xla_oracle:.2e}) {'PASS' if passed else 'FAIL'}",
                flush=True,
            )

    # Diagnostic: how chaotic was the round-2 full-pipeline comparison?
    agree_f32 = bin_agreement(
        cfg_f32_xla, cfg_p32, params, orig, dirs, z_coarse, n_fine
    )
    agree_bf16 = bin_agreement(
        nerf.NeRFConfig(backend="xla", compute_dtype=jnp.bfloat16),
        nerf.NeRFConfig(backend="pallas", compute_dtype=jnp.bfloat16),
        params, orig, dirs, z_coarse, n_fine,
    )
    print(
        f"resampling bin agreement xla-vs-pallas: f32={agree_f32:.6f} "
        f"bf16={agree_bf16:.6f} (each disagreeing bin is an O(1) per-leaf "
        "gradient difference in a full-pipeline comparison)",
        flush=True,
    )

    out = {
        "methodology": (
            "fixed-z: both z tensors precomputed once and fed to every "
            "backend as constants; objective = nerf.training_losses_fixed_z "
            "(same render_rays_train/_fine_mse code paths as production "
            "training, no resampling discontinuity inside the differentiated "
            "region). Exactness is proven at HIGHEST matmul precision (on "
            "TPU, DEFAULT-precision 'f32' matmuls are truncated-bf16 MXU "
            "passes whose structure legitimately differs between XLA and "
            "Mosaic); production-precision paths are judged against the "
            "HIGHEST-precision XLA-f32 oracle with a 1.5x-of-XLA bound. "
            "Round-2's all_pass:false differentiated through the inverse-CDF "
            "resampling, whose searchsorted bins flip under 1-ulp forward "
            "differences — per-leaf grads then diverge O(1) with no kernel "
            "bug (losses matched to ~2e-4); bin_agreement quantifies that."
        ),
        "shape": {"rays": batch, "coarse": n_coarse, "fine": n_fine, "hidden": 256},
        "device": str(jax.devices()[0]),
        "results": results,
        "bin_agreement_xla_vs_pallas": {
            "float32": agree_f32,
            "bfloat16": agree_bf16,
        },
        "all_pass": ok,
    }
    with open("PARITY_TPU.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"all_pass": ok}))


if __name__ == "__main__":
    main()
