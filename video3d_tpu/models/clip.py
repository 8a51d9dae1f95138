"""CLIP vision tower (functional JAX) — the reference's alternative tower
family (multimodal_encoder/clip_encoder.py:12-124, SURVEY.md M4).

LLaVA semantics: run the CLIP ViT, take ``hidden_states[select_layer]``
(default -2, i.e. the penultimate encoder layer's output) and drop the CLS
token ('patch' feature select). Architecture vs SigLIP: prepended class
embedding, pre-layernorm after embeddings, quick-GELU MLP activation, and a
learned position embedding of length num_patches + 1.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from video3d_tpu.config import VisionConfig
from video3d_tpu.models.siglip import _layer_norm, attention, patchify

Params = Dict[str, Any]


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_encoder_layer(p: Params, x: jax.Array, cfg: VisionConfig) -> jax.Array:
    h = _layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], cfg.layer_norm_eps)
    x = x + attention(p["attn"], h, cfg.num_attention_heads)
    h = _layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], cfg.layer_norm_eps)
    h = quick_gelu(h @ p["mlp"]["w1"] + p["mlp"]["b1"]) @ p["mlp"]["w2"] + p["mlp"]["b2"]
    return x + h


@functools.partial(jax.jit, static_argnames=("cfg", "select_layer"))
def clip_tower_forward(params: Params, pixel_values: jax.Array,
                       cfg: VisionConfig, select_layer: int = -2) -> jax.Array:
    """(B, 3, S, S) -> (B, num_patches, D): hidden_states[select_layer]
    with the CLS token dropped (clip_encoder.py feature_select 'patch')."""
    B = pixel_values.shape[0]
    x = patchify(pixel_values, cfg.patch_size).astype(params["patch_embed"]["w"].dtype)
    x = x @ params["patch_embed"]["w"]          # CLIP conv has no bias
    cls = jnp.broadcast_to(params["class_embed"], (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"]
    x = _layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"],
                    cfg.layer_norm_eps)

    n_layers = len(params["layers"]) + select_layer + 1 if select_layer < 0 \
        else select_layer
    for lp in params["layers"][:n_layers]:
        x = clip_encoder_layer(lp, x, cfg)
    return x[:, 1:, :]                           # drop CLS


def convert_clip(state, cfg: VisionConfig, prefix: str = "vision_model.",
                 dtype=jnp.float32) -> Params:
    """HF CLIPVisionModel state dict -> clip tower pytree."""
    from video3d_tpu.models.weights import _to_np

    g = lambda k: _to_np(state[prefix + k])

    def lin(k):
        return jnp.asarray(g(k).T, dtype)

    def vec(k):
        return jnp.asarray(g(k), dtype)

    conv_w = g("embeddings.patch_embedding.weight")
    layers = []
    i = 0
    while f"{prefix}encoder.layers.{i}.layer_norm1.weight" in state:
        p = f"encoder.layers.{i}."
        layers.append({
            "ln1": {"scale": vec(p + "layer_norm1.weight"), "bias": vec(p + "layer_norm1.bias")},
            "attn": {
                "wq": lin(p + "self_attn.q_proj.weight"), "bq": vec(p + "self_attn.q_proj.bias"),
                "wk": lin(p + "self_attn.k_proj.weight"), "bk": vec(p + "self_attn.k_proj.bias"),
                "wv": lin(p + "self_attn.v_proj.weight"), "bv": vec(p + "self_attn.v_proj.bias"),
                "wo": lin(p + "self_attn.out_proj.weight"), "bo": vec(p + "self_attn.out_proj.bias"),
            },
            "ln2": {"scale": vec(p + "layer_norm2.weight"), "bias": vec(p + "layer_norm2.bias")},
            "mlp": {
                "w1": lin(p + "mlp.fc1.weight"), "b1": vec(p + "mlp.fc1.bias"),
                "w2": lin(p + "mlp.fc2.weight"), "b2": vec(p + "mlp.fc2.bias"),
            },
        })
        i += 1

    return {
        "patch_embed": {"w": jnp.asarray(conv_w.reshape(conv_w.shape[0], -1).T, dtype)},
        "class_embed": vec("embeddings.class_embedding").reshape(1, -1),
        "pos_embed": vec("embeddings.position_embedding.weight"),
        "pre_ln": {"scale": vec("pre_layrnorm.weight"),
                   "bias": vec("pre_layrnorm.bias")},
        "layers": layers,
    }
