#!/usr/bin/env python
"""Bisect the ~4.4 ms of XLA forward glue around the fused kernels.

tools/exp_step.py measured training_losses fwd = 11.57 ms vs 7.19 ms of
kernel forwards at the flagship shape; tools/exp_resample.py puts the
inverse-CDF resample at 0.74 ms fwd / 0.90 ms fwd+grad. This times the
remaining pieces, each as its own jitted lax.scan of K iterations:

  gather      batch gather from the permuted HBM ray table (epoch-fn style)
  strat       stratified z PRNG (4096 x 64)
  enc_c       point-gen + xyz/view encode, coarse rows (262k)
  enc_f       point-gen + xyz/view encode, fine rows (524k)
  comp        alpha-compositing fwd, coarse + fine
  mse         the two MSEs + psnr metrics
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

K = 20


def bench(body, init, n_calls=3):
    keys = jax.random.split(jax.random.PRNGKey(42), K)

    @jax.jit
    def run(init, keys):
        carry, _ = jax.lax.scan(body, init, keys)
        return carry

    out = run(init, keys)
    float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n_calls):
        out = run(init, keys)
    float(jax.tree.leaves(out)[0].sum())
    return (time.perf_counter() - t0) / (n_calls * K)


def main():
    from nerf_and_dietnerf_tpu.core import cameras, encoding, rendering, sampling
    from nerf_and_dietnerf_tpu.models.mlp import MLPConfig

    cfg = MLPConfig()
    batch, n_c, n_f = 4096, 64, 128
    near, far = 2.0, 6.0

    n_table = batch * 40
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    t_orig = jnp.zeros((n_table, 4), jnp.float32).at[:, 3].set(1.0)
    t_dirs = jnp.concatenate(
        [jax.random.normal(k1, (n_table, 3)), jnp.zeros((n_table, 1))], axis=-1
    )
    t_rgb = jax.random.uniform(k2, (n_table, 3))
    orig, dirs, rgb = t_orig[:batch], t_dirs[:batch], t_rgb[:batch]

    def t_gather():
        perm = jax.random.permutation(jax.random.PRNGKey(3), n_table)

        def body(c, k):
            i = (c.astype(jnp.int32) % 40) * batch
            idx = jax.lax.dynamic_slice_in_dim(perm, i, batch)
            b = (t_orig[idx], t_dirs[idx], t_rgb[idx])
            return c + jnp.mean(b[0]) * 0, None

        return bench(body, jnp.float32(0))

    def t_strat():
        def body(c, k):
            z = sampling.stratified_z_values(k, near, far, (batch,), n_c)
            return c + jnp.mean(z) * 0, None

        return bench(body, jnp.float32(0))

    def make_enc(n_s):
        z0 = sampling.stratified_z_values(None, near, far, (batch,), n_s)

        def body(c, k):
            z = z0 + c
            points = cameras.sample_points_along_rays(orig, dirs, z)[..., :3]
            enc = encoding.encode_xyz(points.reshape(-1, 3), cfg.n_freq_xyz)
            comps = cameras.view_direction_components(dirs, cfg.n_angles)
            encd = encoding.encode_view_dirs(comps, cfg.n_freq_dir)
            encd = jnp.broadcast_to(
                encd[:, None, :], (batch, n_s, encd.shape[-1])
            ).reshape(batch * n_s, -1)
            # cast like the kernel input path
            s = jnp.mean(enc.astype(jnp.bfloat16)) + jnp.mean(
                encd.astype(jnp.bfloat16)
            )
            return s.astype(jnp.float32), None

        return bench(body, jnp.float32(0))

    def t_comp():
        raw_c = jax.random.normal(jax.random.PRNGKey(5), (batch, n_c, 4))
        raw_f = jax.random.normal(jax.random.PRNGKey(6), (batch, n_f, 4))
        z_c = sampling.stratified_z_values(None, near, far, (batch,), n_c)
        z_f = sampling.stratified_z_values(None, near, far, (batch,), n_f)

        def body(c, k):
            a = rendering.composite(raw_c + c, z_c)
            b = rendering.composite(raw_f + c, z_f)
            return jnp.mean(a.rgb) + jnp.mean(b.weights) + jnp.mean(b.rgb), None

        return bench(body, jnp.float32(0))

    def make_enc_variant(kind, n_s=n_f):
        """Bisect the encoding cost: transcendentals vs layout vs broadcast."""
        import math

        z0 = sampling.stratified_z_values(None, near, far, (batch,), n_s)
        freqs = (2.0 ** jnp.arange(cfg.n_freq_xyz, dtype=jnp.float32)) * math.pi

        def body(c, k):
            z = z0 + c
            points = cameras.sample_points_along_rays(orig, dirs, z)[..., :3]
            pts = points.reshape(-1, 3)
            theta = pts[..., None] * freqs  # (N, 3, L)
            if kind == "sin_only":
                s = jnp.sum(jnp.sin(theta).astype(jnp.bfloat16))
            elif kind == "sincos_only":
                s = jnp.sum(jnp.sin(theta).astype(jnp.bfloat16)) + jnp.sum(
                    jnp.cos(theta).astype(jnp.bfloat16)
                )
            elif kind == "layout_only":
                # the full stack/interleave/concat path with transcendentals
                # replaced by cheap ops
                sin_t, cos_t = theta * 0.5, theta * 0.25 + 1.0
                sc = jnp.stack([sin_t, cos_t], axis=-1).reshape(
                    *theta.shape[:-1], 2 * cfg.n_freq_xyz
                )
                per_coord = jnp.concatenate([pts[..., None], sc], axis=-1)
                enc = per_coord.reshape(pts.shape[0], -1)
                s = jnp.sum(enc.astype(jnp.bfloat16))
            elif kind == "recurrence":
                # sin/cos at base frequency + double-angle recurrence
                t0 = pts * math.pi
                sin_l = [jnp.sin(t0)]
                cos_l = [jnp.cos(t0)]
                for _ in range(cfg.n_freq_xyz - 1):
                    s_p, c_p = sin_l[-1], cos_l[-1]
                    sin_l.append(2.0 * s_p * c_p)
                    cos_l.append(1.0 - 2.0 * s_p * s_p)
                sc = jnp.stack(
                    [f for pair in zip(sin_l, cos_l) for f in pair], axis=-1
                )  # (N, 3, 2L)
                per_coord = jnp.concatenate([pts[..., None], sc], axis=-1)
                enc = per_coord.reshape(pts.shape[0], -1)
                s = jnp.sum(enc.astype(jnp.bfloat16))
            elif kind == "xyz_only":
                enc = encoding.encode_xyz(pts, cfg.n_freq_xyz)
                s = jnp.sum(enc.astype(jnp.bfloat16))
            elif kind == "points_only":
                s = jnp.sum(pts.astype(jnp.bfloat16))
            return (s.astype(jnp.float32) * 0 + c + 1e-6), None

        return bench(body, jnp.float32(0))

    def make_comp_variant(kind):
        """Bisect composite(): which piece of the 3.5 ms is the cumprod?"""
        raw_c = jax.random.normal(jax.random.PRNGKey(5), (batch, n_c, 4))
        raw_f = jax.random.normal(jax.random.PRNGKey(6), (batch, n_f, 4))
        z_c = sampling.stratified_z_values(None, near, far, (batch,), n_c)
        z_f = sampling.stratified_z_values(None, near, far, (batch,), n_f)

        def comp_one(raw, z, c):
            raw = raw + c
            sigma = jnp.maximum(raw[..., 3], 0.0)
            sample_rgb = rendering.jax_sigmoid(raw[..., :3])
            delta = jnp.diff(z, axis=-1)
            delta = jnp.concatenate(
                [delta, jnp.full((*delta.shape[:-1], 1), 1e9, delta.dtype)],
                axis=-1,
            )
            sd = sigma * delta
            if kind == "cumprod":  # production formulation
                alpha = 1.0 - jnp.exp(-sd)
                t = rendering.exclusive_cumprod(1.0 - alpha)
            elif kind == "nocum":  # everything except the scan
                alpha = 1.0 - jnp.exp(-sd)
                t = 1.0 - alpha
            elif kind == "expsum":  # T = exp(-exclusive_cumsum(sigma*delta))
                alpha = 1.0 - jnp.exp(-sd)
                csum = jnp.cumsum(sd[..., :-1], axis=-1)
                csum = jnp.concatenate(
                    [jnp.zeros((*sd.shape[:-1], 1), sd.dtype), csum], axis=-1
                )
                t = jnp.exp(-csum)
            elif kind == "matsum":  # exclusive cumsum as a triangular matmul
                alpha = 1.0 - jnp.exp(-sd)
                n_s = sd.shape[-1]
                tri = jnp.tril(jnp.ones((n_s, n_s), jnp.float32), k=-1)
                csum = jax.lax.dot_general(
                    sd, tri, (((sd.ndim - 1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                )
                t = jnp.exp(-csum)
            w = alpha * t
            return jnp.sum(w[..., None] * sample_rgb, axis=-2), w

        def body(c, k):
            a_rgb, _ = comp_one(raw_c, z_c, c)
            b_rgb, b_w = comp_one(raw_f, z_f, c)
            return jnp.mean(a_rgb) + jnp.mean(b_w) + jnp.mean(b_rgb), None

        return bench(body, jnp.float32(0))

    def t_mse():
        pc = jax.random.uniform(jax.random.PRNGKey(7), (batch, 3))
        pf = jax.random.uniform(jax.random.PRNGKey(8), (batch, 3))

        def body(c, k):
            m1 = jnp.mean(jnp.square(rgb - pc - c))
            m2 = jnp.mean(jnp.square(rgb - pf - c))
            return m1 + m2 + rendering.psnr_from_mse(m1) * 0, None

        return bench(body, jnp.float32(0))

    def make_comp_grad(kind):
        """fwd+grad cost of the compositing block (the cumprod VJP is the
        suspect: XLA lowers it as another scan + divide)."""
        raw_c = jax.random.normal(jax.random.PRNGKey(5), (batch, n_c, 4))
        raw_f = jax.random.normal(jax.random.PRNGKey(6), (batch, n_f, 4))
        z_c = sampling.stratified_z_values(None, near, far, (batch,), n_c)
        z_f = sampling.stratified_z_values(None, near, far, (batch,), n_f)

        def comp_one(raw, z):
            sigma = jnp.maximum(raw[..., 3], 0.0)
            sample_rgb = rendering.jax_sigmoid(raw[..., :3])
            delta = jnp.diff(z, axis=-1)
            delta = jnp.concatenate(
                [delta, jnp.full((*delta.shape[:-1], 1), 1e9, delta.dtype)],
                axis=-1,
            )
            sd = sigma * delta
            alpha = 1.0 - jnp.exp(-sd)
            if kind == "cumprod":
                t = rendering.exclusive_cumprod(1.0 - alpha)
            elif kind == "expsum":
                csum = jnp.cumsum(sd[..., :-1], axis=-1)
                csum = jnp.concatenate(
                    [jnp.zeros((*sd.shape[:-1], 1), sd.dtype), csum], axis=-1
                )
                t = jnp.exp(-csum)
            elif kind == "matsum":
                n_s = sd.shape[-1]
                tri = jnp.tril(jnp.ones((n_s, n_s), jnp.float32), k=-1)
                csum = jax.lax.dot_general(
                    sd, tri, (((sd.ndim - 1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                )
                t = jnp.exp(-csum)
            w = alpha * t
            return jnp.sum(w[..., None] * sample_rgb, axis=-2)

        def loss(rc, rf, c):
            a = comp_one(rc + c, z_c)
            b = comp_one(rf + c, z_f)
            return jnp.mean(jnp.square(a - rgb)) + jnp.mean(jnp.square(b - rgb))

        g = jax.grad(loss, argnums=(0, 1))

        def body(c, k):
            ga, gb = g(raw_c, raw_f, c)
            return c + jnp.mean(ga) * 0 + jnp.mean(gb) * 0, None

        return bench(body, jnp.float32(0))

    def t_floor():
        def body(c, k):
            return c + 1e-6, None

        return bench(body, jnp.float32(0))

    for name, fn in (
        ("floor", t_floor),
        ("gather", t_gather),
        ("strat", t_strat),
        ("enc_c", lambda: make_enc(n_c)),
        ("enc_f", lambda: make_enc(n_f)),
        ("enc_f/points", lambda: make_enc_variant("points_only")),
        ("enc_f/sin", lambda: make_enc_variant("sin_only")),
        ("enc_f/sincos", lambda: make_enc_variant("sincos_only")),
        ("enc_f/layout", lambda: make_enc_variant("layout_only")),
        ("enc_f/recur", lambda: make_enc_variant("recurrence")),
        ("enc_f/xyz", lambda: make_enc_variant("xyz_only")),
        ("comp", t_comp),
        ("comp/cumprod", lambda: make_comp_variant("cumprod")),
        ("comp/nocum", lambda: make_comp_variant("nocum")),
        ("comp/expsum", lambda: make_comp_variant("expsum")),
        ("comp/matsum", lambda: make_comp_variant("matsum")),
        ("mse", t_mse),
        ("compgrad/cumprod", lambda: make_comp_grad("cumprod")),
        ("compgrad/expsum", lambda: make_comp_grad("expsum")),
        ("compgrad/matsum", lambda: make_comp_grad("matsum")),
    ):
        if len(sys.argv) > 1 and not any(a in name for a in sys.argv[1:]):
            continue
        try:
            print(f"{name:14s} {fn()*1e3:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
