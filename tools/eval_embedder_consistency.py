"""Diagnostic: is an embedder's feature map view-consistent per scene?

DietNeRF's consistency loss assumes "same scene from any viewpoint => similar
embedding" (the paper's premise; reference src/DietNeRF.py:204-222). This
measures that property directly for a checkpoint: mean cosine similarity of
[CLS] features between (a) pairs of different VIEWS of the same scene and
(b) pairs from DIFFERENT scenes, over the shipped corpus. A useful embedder
needs within >> across; a random embedder gives within ~ across ~ high
(untrained features are dominated by shared low-level statistics).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/eval_embedder_consistency.py \
        [--weights scene_vit.npz] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import sys

from train_scene_embedder import DEFAULT_CORPUS, load_corpus


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None, help="npz (vit.save_npz); None = random init")
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    ap.add_argument("--corpus-size", type=int, default=256)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from nerf_and_dietnerf_tpu.models import vit

    corpus, scene_ids = load_corpus(DEFAULT_CORPUS, args.corpus_size)

    if args.weights:
        cfg = vit.infer_config(args.weights) or vit.ViTConfig()
        params = vit.load_pretrained(args.weights, cfg)
        label = args.weights
    else:
        cfg = vit.ViTConfig(
            image_size=224, patch_size=32, hidden_dim=256, n_layers=6,
            n_heads=8, mlp_dim=1024,
        )
        params = vit.init_params(jax.random.PRNGKey(7), cfg)
        label = "random-init"

    @jax.jit
    def embed(imgs):
        return vit.extract_features(
            params, vit.preprocess(imgs, cfg), cfg, compute_dtype=jnp.float32
        )

    feats = []
    for i in range(0, corpus.shape[0], 64):
        feats.append(np.asarray(embed(jnp.asarray(corpus[i : i + 64]))))
    z = np.concatenate(feats)
    z = z / np.linalg.norm(z, axis=-1, keepdims=True)
    sim = z @ z.T
    same = scene_ids[:, None] == scene_ids[None, :]
    off_diag = ~np.eye(len(z), dtype=bool)
    within = float(sim[same & off_diag].mean())
    across = float(sim[~same].mean())
    print(
        json.dumps(
            {
                "embedder": label,
                "within_scene_cos": round(within, 4),
                "across_scene_cos": round(across, 4),
                "separation": round(within - across, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
