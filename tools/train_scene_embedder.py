"""Self-supervised (SimCLR-lite) training of a small ViT embedder on the
shipped scene corpus — an in-container substitute for the public ViT-B/32
checkpoint DietNeRF's consistency loss wants (zero-egress container, VERDICT
r04 next-step #2b).

The reference's embedder is a frozen TF-Hub ViT-B/32 feature extractor
(``/root/reference/src/DietNeRF.py:14-15,:72-79``). No public checkpoint can
be downloaded here, so this trains a *small* ViT on the ~520 images of the 8
shipped scenes with a standard contrastive objective (two augmented crops of
the same image are positives, everything else in the batch negatives,
NT-Xent loss on a 2-layer projection head). The resulting backbone maps
views to features that are invariant to crop/color/flip — the property the
consistency loss needs — and is exported in ``models/vit.py``'s npz format
(with embedded geometry metadata) for ``--vit-weights``.

Everything hot is jitted: augmentation (random-resized-crop via
``scale_and_translate``, flip, color jitter), the ViT forward, and the loss
all run on device; K steps per dispatch via ``lax.scan``.

Run (TPU, ~15 min at defaults):
    PYTHONPATH=/root/.axon_site:/root/repo python tools/train_scene_embedder.py \
        --out /tmp/scene_vit.npz --steps 3000
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# 256px image sets of all 8 shipped scenes (blender sphere sets + colmap).
DEFAULT_CORPUS = [
    "Assets/AlexanderColmap/256px_71pics",
    "Assets/DrillColmap3/256px_72pics",
    "Assets/FlowersColmap/256px_54pics",
    "Assets/GladiatorColmap2/256px_44pics",
    "Assets/PhoneColmap/256px_63pics",
    "Assets/RobotBlender/image_views_sphere/256px_72pics",
    "Assets/RobotRedBlender/image_views_sphere/256px_72pics",
    "Assets/FicusBlender/image_views_sphere/256px_72pics",
]


def load_corpus(dirs, size: int):
    """Returns (images (N,size,size,3), scene_id (N,) int32)."""
    import imageio.v2 as imageio
    import numpy as np

    images, scene_ids = [], []
    for sid, d in enumerate(dirs):
        d = Path(d) if Path(d).is_absolute() else REPO / d
        files = sorted(
            p for p in d.iterdir() if p.suffix.lower() in (".jpg", ".png")
        )
        for p in files:
            img = np.asarray(imageio.imread(p), np.float32)[..., :3] / 255.0
            images.append(img)
            scene_ids.append(sid)
    # Uniform square size so the corpus is one device array.
    import jax
    import jax.numpy as jnp

    resized = [
        np.asarray(
            jax.image.resize(jnp.asarray(im), (size, size, 3), "bilinear")
        )
        for im in images
    ]
    return np.stack(resized), np.asarray(scene_ids, np.int32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="output .npz (vit.save_npz format)")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32, help="image pairs per step")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--temp", type=float, default=0.2)
    ap.add_argument("--corpus-size", type=int, default=256)
    ap.add_argument("--scan-steps", type=int, default=50, help="steps per dispatch")
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    ap.add_argument("--scenes", nargs="*", default=None)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--mlp-dim", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--positives", choices=("augment", "view"), default="augment",
        help="'augment': SimCLR (two crops of the SAME image are the "
        "positive pair — instance discrimination, which SEPARATES views of "
        "one object). 'view': two DIFFERENT views of the same scene are the "
        "positive pair — trains exactly the view-invariant 'same object "
        "from any viewpoint' property DietNeRF's consistency loss assumes.",
    )
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from nerf_and_dietnerf_tpu.models import vit

    corpus, scene_ids = load_corpus(args.scenes or DEFAULT_CORPUS, args.corpus_size)
    print(
        f"corpus: {corpus.shape[0]} images @ {args.corpus_size}px, "
        f"{scene_ids.max() + 1} scenes, positives={args.positives}"
    )
    # Per-scene contiguous ranges for cross-view positive sampling.
    import numpy as _np

    n_scenes = int(scene_ids.max()) + 1
    scene_start = _np.asarray(
        [int(_np.searchsorted(scene_ids, s)) for s in range(n_scenes)], _np.int32
    )
    scene_count = _np.asarray(
        [int((scene_ids == s).sum()) for s in range(n_scenes)], _np.int32
    )

    cfg = vit.ViTConfig(
        image_size=224, patch_size=32, hidden_dim=args.hidden,
        n_layers=args.layers, n_heads=args.heads, mlp_dim=args.mlp_dim,
    )
    key = jax.random.PRNGKey(args.seed)
    key, k_init, k_proj = jax.random.split(key, 3)
    params = vit.init_params(k_init, cfg)

    def dense_init(k, d_in, d_out):
        return {
            "kernel": jax.random.normal(k, (d_in, d_out), jnp.float32)
            * (d_in ** -0.5),
            "bias": jnp.zeros((d_out,), jnp.float32),
        }

    k1, k2 = jax.random.split(k_proj)
    proj = {
        "h": dense_init(k1, cfg.hidden_dim, cfg.hidden_dim),
        "out": dense_init(k2, cfg.hidden_dim, 128),
    }
    all_params = {"vit": params, "proj": proj}

    size_in = args.corpus_size
    size_out = cfg.image_size

    def augment(k, img):
        """Random-resized-crop to 224 + flip + color jitter, all traced."""
        ks = jax.random.split(k, 6)
        scale = jax.random.uniform(ks[0], (), minval=0.4, maxval=1.0)
        win = scale * size_in  # square window, fractional is fine
        y0 = jax.random.uniform(ks[1], (), maxval=size_in - win)
        x0 = jax.random.uniform(ks[2], (), maxval=size_in - win)
        s = size_out / win
        out = jax.image.scale_and_translate(
            img, (size_out, size_out, 3), (0, 1),
            jnp.array([s, s]), jnp.array([-y0 * s, -x0 * s]),
            method="bilinear",
        )
        flip = jax.random.bernoulli(ks[3])
        out = jnp.where(flip, out[:, ::-1], out)
        brightness = jax.random.uniform(ks[4], (), minval=0.6, maxval=1.4)
        contrast = jax.random.uniform(ks[5], (), minval=0.6, maxval=1.4)
        out = out * brightness
        mean = out.mean(axis=(0, 1), keepdims=True)
        out = jnp.clip((out - mean) * contrast + mean, 0.0, 1.0)
        return out * 2.0 - 1.0  # embedder input range (vit.preprocess)

    def embed(p, imgs):
        feats = vit.extract_features(p["vit"], imgs, cfg, compute_dtype=jnp.bfloat16)
        h = jax.nn.relu(feats @ p["proj"]["h"]["kernel"] + p["proj"]["h"]["bias"])
        z = h @ p["proj"]["out"]["kernel"] + p["proj"]["out"]["bias"]
        return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)

    n_images = corpus.shape[0]
    temp = args.temp

    scene_of = jnp.asarray(scene_ids)
    starts = jnp.asarray(scene_start)
    counts = jnp.asarray(scene_count)

    def loss_fn(p, k, images):
        kb, kv, ka1, ka2 = jax.random.split(k, 4)
        idx = jax.random.randint(kb, (args.batch,), 0, n_images)
        if args.positives == "view":
            # Positive partner = a different (usually) view of the SAME
            # scene, drawn uniformly from that scene's contiguous range.
            s = scene_of[idx]
            offs = jax.random.randint(
                kv, (args.batch,), 0, 1_000_000
            ) % counts[s]
            idx2 = starts[s] + offs
        else:
            idx2 = idx
        v1 = jax.vmap(augment)(jax.random.split(ka1, args.batch), images[idx])
        v2 = jax.vmap(augment)(jax.random.split(ka2, args.batch), images[idx2])
        z = embed(p, jnp.concatenate([v1, v2], axis=0))  # (2B, 128)
        sim = (z @ z.T) / temp
        n = 2 * args.batch
        sim = sim - 1e9 * jnp.eye(n)  # mask self-similarity
        pos = jnp.concatenate(
            [jnp.arange(args.batch) + args.batch, jnp.arange(args.batch)]
        )
        logp = jax.nn.log_softmax(sim, axis=-1)
        loss = -logp[jnp.arange(n), pos].mean()
        acc = (sim.argmax(axis=-1) == pos).mean()
        return loss, acc

    opt = optax.adam(
        optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.1)
    )
    opt_state = opt.init(all_params)

    images_dev = jnp.asarray(corpus)

    # The corpus MUST be a traced argument, not a closure constant — a
    # closed-over (n, 256, 256, 3) array gets baked into the HLO as a
    # literal (hundreds of MB), which the remote compile server rejects
    # (HTTP 413) and which would bloat any compile cache.
    @jax.jit
    def run_scan(p, s, k, images):
        def step(carry, k):
            p, s = carry
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, k, images
            )
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), (loss, acc)

        keys = jax.random.split(k, args.scan_steps)
        (p, s), (losses, accs) = jax.lax.scan(step, (p, s), keys)
        return p, s, losses.mean(), accs[-1]

    t0 = time.time()
    done = 0
    while done < args.steps:
        key, k_round = jax.random.split(key)
        all_params, opt_state, mean_loss, last_acc = run_scan(
            all_params, opt_state, k_round, images_dev
        )
        # Host materialization as the timing/progress fence.
        mean_loss = float(mean_loss)
        done += args.scan_steps
        print(
            f"step {done}/{args.steps}: loss={mean_loss:.4f} "
            f"acc={float(last_acc):.3f} ({time.time() - t0:.0f}s)",
            flush=True,
        )

    vit.save_npz(args.out, jax.device_get(all_params["vit"]), config=cfg)
    print(f"saved backbone to {args.out} (config {dataclasses.asdict(cfg)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
