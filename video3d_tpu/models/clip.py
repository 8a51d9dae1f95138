"""CLIP vision tower (functional JAX) — the reference's alternative tower
family (multimodal_encoder/clip_encoder.py:12-124, SURVEY.md M4).

LLaVA semantics: run the CLIP ViT, take ``hidden_states[select_layer]``
(default -2, i.e. the penultimate encoder layer's output) and drop the CLS
token ('patch' feature select). Architecture vs SigLIP: prepended class
embedding, pre-layernorm after embeddings, quick-GELU MLP activation, and a
learned position embedding of length num_patches + 1.

Also hosts ``clip_s2_forward``, the native CLIPVisionTowerS2 multi-scale
forward (clip_encoder.py:125-176 / s2wrapper ``multiscale_forward``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from video3d_tpu.config import VisionConfig
from video3d_tpu.models.siglip import _layer_norm, attention, patchify
from video3d_tpu.ops.resize import area_downsample, bicubic_resize

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


@functools.partial(jax.jit, static_argnames=("cfg", "scales", "select_layer"))
def clip_s2_forward(params: Params, pixel_values: jax.Array, cfg: VisionConfig,
                    scales: tuple = (336, 672, 1008),
                    select_layer: int = -2) -> jax.Array:
    """CLIPVisionTowerS2.forward (clip_encoder.py:125-176): s2wrapper's
    ``multiscale_forward`` with split_forward=True.

    Input is preprocessed at the largest scale (B, 3, S_max, S_max). Per
    scale s: bicubic-resize to (s, s) in f32, split into an n x n
    chessboard of base-size tiles (n = ceil(s / scales[0])), run the CLIP
    tower on all tiles ('patch' feature select), merge tile feature maps
    back into one (B, D, n*g, n*g) grid, area-downsample to the scale-0
    grid, and concatenate scales along channels -> (B, g*g, D * len(scales)).
    """
    B = pixel_values.shape[0]
    split = scales[0]
    if split != cfg.image_size:
        raise ValueError("s2 base scale must equal the tower image size")
    x32 = pixel_values.astype(jnp.float32)
    merged = []
    for s in scales:
        n = -(-s // split)                      # ceil, s2wrapper num_splits
        xs = bicubic_resize(x32, s, s).astype(pixel_values.dtype)
        h = s // n                              # == split for the ref scales
        tiles = xs.reshape(B, 3, n, h, n, h)
        # split_chessboard tile-major batch order: out[(i*n+j)*B + b]
        tiles = tiles.transpose(2, 4, 0, 1, 3, 5).reshape(n * n * B, 3, h, h)
        feats = clip_tower_forward(params, tiles, cfg, select_layer)
        feats = feats.astype(pixel_values.dtype)
        g = int(round(feats.shape[1] ** 0.5))
        d = feats.shape[-1]
        # 'b (h w) c -> b c h w' then merge_chessboard
        f = feats.reshape(n, n, B, g, g, d)
        f = f.transpose(2, 5, 0, 3, 1, 4).reshape(B, d, n * g, n * g)
        merged.append(f)
    out_size = merged[0].shape[-1]
    merged = [area_downsample(f.astype(jnp.float32), out_size).astype(f.dtype)
              for f in merged]
    out = jnp.concatenate(merged, axis=1)        # channel concat
    return out.reshape(B, out.shape[1], -1).transpose(0, 2, 1)


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
