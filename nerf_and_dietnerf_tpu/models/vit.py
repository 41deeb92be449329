"""ViT-B/32 image feature extractor in pure JAX (DietNeRF's frozen embedder).

The reference pulls ``sayakpaul/vit_b32_fe`` from TF-Hub at runtime
(``src/DietNeRF.py:14-15, :72-79``) — a ViT-B/32 returning the 768-d
pre-logits [CLS] feature. Here the same architecture is implemented natively
so the embedder lives **inside the jitted training graph** (the reference
calls it outside any compiled scope every 13th step) and runs on the MXU in
``compute_dtype``.

Weights: :func:`load_pretrained` imports the public checkpoint from a local
file (HF ``transformers`` ViT state dict via ``safetensors``/``torch``, or an
``npz``). This container is network-isolated, so when no file is supplied the
extractor initializes randomly — still a meaningful consistency regularizer
(random-feature projections preserve image similarity structure), but
documented loudly as non-semantic; pass ``vit_weights`` in production.

Architecture (ViT-Base/32, the TF-Hub ``vit_b32_fe`` layout): 224x224 input,
32x32 patches -> 7x7 = 49 tokens + [CLS]; 12 pre-LN transformer blocks,
hidden 768, 12 heads, MLP 3072, GELU; learned position embeddings; final
LayerNorm; feature = [CLS] row.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden_dim: int = 768
    n_layers: int = 12
    n_heads: int = 12
    mlp_dim: int = 3072
    ln_eps: float = 1e-6  # HF ViTConfig defaults to 1e-12; google JAX ViT 1e-6

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.n_heads


def init_params(key, config: ViTConfig = ViTConfig()) -> Params:
    """Random-init parameters (truncated-normal-free simple init; the real
    use is as a target structure for :func:`load_pretrained`)."""
    h, p = config.hidden_dim, config.patch_size
    keys = iter(jax.random.split(key, 4 + 8 * config.n_layers))

    def dense(k, d_in, d_out):
        scale = (d_in + d_out) ** -0.5
        return {
            "kernel": jax.random.normal(k, (d_in, d_out), jnp.float32) * scale,
            "bias": jnp.zeros((d_out,), jnp.float32),
        }

    def ln():
        return {"scale": jnp.ones((h,), jnp.float32), "bias": jnp.zeros((h,), jnp.float32)}

    params: Params = {
        "patch_embed": dense(next(keys), 3 * p * p, h),
        "cls_token": jax.random.normal(next(keys), (1, 1, h), jnp.float32) * 0.02,
        "pos_embed": jax.random.normal(
            next(keys), (1, config.n_patches + 1, h), jnp.float32
        ) * 0.02,
        "final_ln": ln(),
        "blocks": [],
    }
    for _ in range(config.n_layers):
        params["blocks"].append(
            {
                "ln1": ln(),
                "q": dense(next(keys), h, h),
                "k": dense(next(keys), h, h),
                "v": dense(next(keys), h, h),
                "proj": dense(next(keys), h, h),
                "ln2": ln(),
                "mlp1": dense(next(keys), h, config.mlp_dim),
                "mlp2": dense(next(keys), config.mlp_dim, h),
            }
        )
    return params


def _layer_norm(p, x, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dense(p, x, dtype):
    return (
        jnp.dot(x.astype(dtype), p["kernel"].astype(dtype), preferred_element_type=jnp.float32)
        + p["bias"]
    )


def _attention(block, x, config: ViTConfig, dtype):
    b, t, h = x.shape
    nh, hd = config.n_heads, config.head_dim
    q = _dense(block["q"], x, dtype).reshape(b, t, nh, hd)
    k = _dense(block["k"], x, dtype).reshape(b, t, nh, hd)
    v = _dense(block["v"], x, dtype).reshape(b, t, nh, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(dtype), v.astype(dtype)).reshape(b, t, h)
    return _dense(block["proj"], out, dtype)


def extract_features(
    params: Params,
    images: jnp.ndarray,
    config: ViTConfig = ViTConfig(),
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Image batch -> 768-d [CLS] features.

    :param images: ``(b, 224, 224, 3)`` preprocessed to ``[-1, 1]``
        (reference preprocessing ``src/DietNeRF.py:272-279``).
    :return: ``(b, hidden_dim)`` float32.
    """
    b = images.shape[0]
    p, h = config.patch_size, config.hidden_dim
    g = config.image_size // p
    # Patchify: (b, g, p, g, p, 3) -> (b, g*g, p*p*3).
    x = images.reshape(b, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(
        b, g * g, p * p * 3
    )
    x = _dense(params["patch_embed"], x, compute_dtype)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, h))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]

    eps = config.ln_eps
    for block in params["blocks"]:
        x = x + _attention(
            block, _layer_norm(block["ln1"], x, eps), config, compute_dtype
        )
        y = _layer_norm(block["ln2"], x, eps)
        # Exact (erf) GELU — what HF's "gelu" and the TF-Hub ViT use; the
        # tanh approximation drifts ~1e-3 per block.
        y = jax.nn.gelu(_dense(block["mlp1"], y, compute_dtype), approximate=False)
        x = x + _dense(block["mlp2"], y, compute_dtype)

    x = _layer_norm(params["final_ln"], x, eps)
    return x[:, 0].astype(jnp.float32)


def preprocess(images: jnp.ndarray, config: ViTConfig = ViTConfig()) -> jnp.ndarray:
    """Resize to the ViT input size and map [0,1] -> [-1,1]
    (reference ``src/DietNeRF.py:272-279``)."""
    size = config.image_size
    if images.ndim == 3:
        images = images[None]
    resized = jax.image.resize(
        images, (images.shape[0], size, size, 3), method="bilinear"
    )
    return resized * 2.0 - 1.0


# --------------------------------------------------------------------------- #
# Pretrained-weight import                                                    #
# --------------------------------------------------------------------------- #

def load_pretrained(path, config: ViTConfig = ViTConfig()) -> Params:
    """Import public ViT-B/32 weights from a local file.

    Supported layouts:
    - ``.npz``: flat dict using this module's naming
      (``blocks.{i}.q.kernel`` etc.) — our own export format.
    - HF ``transformers`` ``google/vit-base-patch32-224-in21k`` state dict
      (``.safetensors`` or torch ``.bin``): names like
      ``vit.encoder.layer.{i}.attention.attention.query.weight``.
    """
    path = str(path)
    if path.endswith(".npz"):
        flat = dict(np.load(path))
        params = init_params(jax.random.PRNGKey(0), config)
        leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
        out = []
        for keypath, leaf in leaves:
            name = ".".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
            out.append(jnp.asarray(flat[name]).reshape(leaf.shape))
        return jax.tree_util.tree_unflatten(treedef, out)
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
        return _from_hf_state_dict(sd, config)
    import torch

    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return _from_hf_state_dict(sd, config)


_CONFIG_KEY = "_vit_config"  # npz metadata: geometry of the saved backbone


def save_npz(path, params: Params, config: "ViTConfig | None" = None) -> None:
    """Export weights in this module's flat ``.npz`` layout.

    :param config: when given, the geometry is embedded in the file so
        loaders (e.g. a scene-trained small embedder via ``--vit-weights``)
        can reconstruct the right :class:`ViTConfig` without out-of-band
        knowledge."""
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    flat = {}
    for keypath, leaf in leaves:
        name = ".".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        flat[name] = np.asarray(leaf)
    if config is not None:
        flat[_CONFIG_KEY] = np.asarray(
            [config.image_size, config.patch_size, config.hidden_dim,
             config.n_layers, config.n_heads, config.mlp_dim], np.int64
        )
    np.savez(path, **flat)


def infer_config(path) -> "ViTConfig | None":
    """Read the geometry embedded by :func:`save_npz`, or None when the file
    is not an npz / carries no metadata (HF checkpoints are always B/32)."""
    path = str(path)
    if not path.endswith(".npz"):
        return None
    with np.load(path) as flat:
        if _CONFIG_KEY not in flat:
            return None
        vals = [int(v) for v in flat[_CONFIG_KEY]]
    return ViTConfig(
        image_size=vals[0], patch_size=vals[1], hidden_dim=vals[2],
        n_layers=vals[3], n_heads=vals[4], mlp_dim=vals[5],
    )


def _from_hf_state_dict(sd, config: ViTConfig) -> Params:
    """Map HF ``ViTModel`` parameter names onto our pytree."""
    pre = "vit." if any(k.startswith("vit.") for k in sd) else ""

    def t(name):  # torch Linear stores (out, in); we use (in, out)
        return jnp.asarray(np.asarray(sd[name]).T)

    def a(name):
        return jnp.asarray(np.asarray(sd[name]))

    h = config.hidden_dim
    conv = np.asarray(sd[f"{pre}embeddings.patch_embeddings.projection.weight"])
    # HF conv kernel (h, 3, p, p); our patch rows are (p, p, 3) flattened.
    patch_kernel = jnp.asarray(
        conv.transpose(2, 3, 1, 0).reshape(-1, h)
    )
    params: Params = {
        "patch_embed": {
            "kernel": patch_kernel,
            "bias": a(f"{pre}embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": a(f"{pre}embeddings.cls_token"),
        "pos_embed": a(f"{pre}embeddings.position_embeddings"),
        "final_ln": {
            "scale": a(f"{pre}layernorm.weight"),
            "bias": a(f"{pre}layernorm.bias"),
        },
        "blocks": [],
    }
    for i in range(config.n_layers):
        b = f"{pre}encoder.layer.{i}."
        params["blocks"].append(
            {
                "ln1": {"scale": a(b + "layernorm_before.weight"),
                        "bias": a(b + "layernorm_before.bias")},
                "q": {"kernel": t(b + "attention.attention.query.weight"),
                      "bias": a(b + "attention.attention.query.bias")},
                "k": {"kernel": t(b + "attention.attention.key.weight"),
                      "bias": a(b + "attention.attention.key.bias")},
                "v": {"kernel": t(b + "attention.attention.value.weight"),
                      "bias": a(b + "attention.attention.value.bias")},
                "proj": {"kernel": t(b + "attention.output.dense.weight"),
                         "bias": a(b + "attention.output.dense.bias")},
                "ln2": {"scale": a(b + "layernorm_after.weight"),
                        "bias": a(b + "layernorm_after.bias")},
                "mlp1": {"kernel": t(b + "intermediate.dense.weight"),
                         "bias": a(b + "intermediate.dense.bias")},
                "mlp2": {"kernel": t(b + "output.dense.weight"),
                         "bias": a(b + "output.dense.bias")},
            }
        )
    return params
