"""Generic HF / OpenCLIP vision towers + the tower-family builder dispatch.

Covers the remaining reference tower wrappers (SURVEY.md M4):

  * ``HFVisionTower`` ("hf:" prefix, multimodal_encoder/hf_vision.py):
    wraps any HF vision model, selects ``hidden_states[select_layer]`` with
    feature modes patch / cls_patch / slicefour_patch / slicefour_cls_patch
    (hf_vision.py:45-60). Here: the CLIP / SigLIP architecture families run
    through our JAX towers with full hidden-state collection, and
    :func:`feature_select` reproduces the selection exactly.
  * ``OpenCLIPVisionTower`` ("open_clip_hub:" prefix,
    multimodal_encoder/open_clip_encoder.py): an OpenAI-layout ViT
    (fused in_proj attention, ln_pre, class+positional embeddings); weights
    convert from the open_clip state-dict naming. NB the reference's
    non-timm path returns per-block features in (tokens, batch, dim) layout
    and then slices ``[:, 1:]`` — the batch dim (open_clip_encoder.py:84,
    66-69, an upstream bug); we implement the evident intent: drop the CLS
    token.
  * ``ImageBindWrapper`` (multimodal_encoder/imagebind.py): the vision
    modality runs through the native trunk in models/imagebind.py — no
    external package needed, unlike the reference.

``build_vision_tower`` mirrors the reference dispatch rules
(multimodal_encoder/builder.py:13-38).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from video3d_tpu.config import VisionConfig
from video3d_tpu.models.clip import clip_encoder_layer
from video3d_tpu.models.siglip import _layer_norm, encoder_layer, patchify

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# hidden-state collection (the output_hidden_states=True equivalents)
# ---------------------------------------------------------------------------

def clip_hidden_states(params: Params, pixel_values: jax.Array,
                       cfg: VisionConfig) -> List[jax.Array]:
    """All hidden states of the HF CLIP vision transformer: entry 0 is the
    post-pre-layernorm embeddings (what HF's encoder sees), then one entry
    per layer — len == num_layers + 1."""
    B = pixel_values.shape[0]
    x = patchify(pixel_values, cfg.patch_size).astype(
        params["patch_embed"]["w"].dtype)
    x = x @ params["patch_embed"]["w"]
    cls = jnp.broadcast_to(params["class_embed"], (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]
    x = _layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"],
                    cfg.layer_norm_eps)
    states = [x]
    for lp in params["layers"]:
        x = clip_encoder_layer(lp, x, cfg)
        states.append(x)
    return states


def siglip_hidden_states(params: Params, pixel_values: jax.Array,
                         cfg: VisionConfig) -> List[jax.Array]:
    """All hidden states of the SigLIP tower (no CLS token): entry 0 is the
    embeddings output, then one per layer."""
    x = patchify(pixel_values, cfg.patch_size).astype(
        params["patch_embed"]["w"].dtype)
    x = x @ params["patch_embed"]["w"] + params["patch_embed"]["b"]
    x = x + params["pos_embed"]
    states = [x]
    for lp in params["layers"]:
        x = encoder_layer(lp, x, cfg)
        states.append(x)
    return states


# ---------------------------------------------------------------------------
# feature selection (hf_vision.py:45-60)
# ---------------------------------------------------------------------------

def feature_select(hidden_states: List[jax.Array], select_layer: int,
                   select_feature: str = "patch") -> jax.Array:
    """``hidden_states[select_layer]`` with the reference's feature modes;
    slicefour_* concatenates every (len//4)-th layer starting at
    ``len//4 + select_layer`` on the channel dim (hf_vision.py:48-51)."""
    if select_feature in ("slicefour_patch", "slicefour_cls_patch"):
        k = len(hidden_states) // 4
        feats = jnp.concatenate(
            [hidden_states[i]
             for i in range(k + select_layer, len(hidden_states), k)],
            axis=-1)
        select_feature = select_feature.replace("slicefour_", "")
    else:
        feats = hidden_states[select_layer]
    if select_feature == "patch":
        return feats[:, 1:]
    if select_feature == "cls_patch":
        return feats
    raise ValueError(f"Unexpected select feature: {select_feature}")


@functools.partial(jax.jit,
                   static_argnames=("cfg", "family", "select_layer",
                                    "select_feature"))
def hf_vision_tower_forward(params: Params, pixel_values: jax.Array,
                            cfg: VisionConfig, family: str = "clip",
                            select_layer: int = -2,
                            select_feature: str = "patch") -> jax.Array:
    """HFVisionTower.forward equivalent (hf_vision.py:62-74) for the CLIP /
    SigLIP architecture families."""
    collect = {"clip": clip_hidden_states,
               "siglip": siglip_hidden_states}[family]
    return feature_select(collect(params, pixel_values, cfg), select_layer,
                          select_feature)


# ---------------------------------------------------------------------------
# OpenCLIP (OpenAI-layout) ViT
# ---------------------------------------------------------------------------

def open_clip_encoder_layer(p: Params, x: jax.Array, cfg: VisionConfig,
                            quick_gelu: bool) -> jax.Array:
    """One open_clip ResidualAttentionBlock; identical math to the CLIP
    layer apart from the activation choice (open_clip uses exact GELU unless
    the model was built with quick_gelu, e.g. OpenAI-pretrained)."""
    if quick_gelu:
        return clip_encoder_layer(p, x, cfg)
    from video3d_tpu.models.siglip import attention

    h = _layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], cfg.layer_norm_eps)
    x = x + attention(p["attn"], h, cfg.num_attention_heads)
    h = _layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], cfg.layer_norm_eps)
    h = jax.nn.gelu(h @ p["mlp"]["w1"] + p["mlp"]["b1"],
                    approximate=False) @ p["mlp"]["w2"] + p["mlp"]["b2"]
    return x + h


@functools.partial(jax.jit,
                   static_argnames=("cfg", "select_layer", "select_feature",
                                    "quick_gelu"))
def open_clip_tower_forward(params: Params, pixel_values: jax.Array,
                            cfg: VisionConfig, select_layer: int = -2,
                            select_feature: str = "patch",
                            quick_gelu: bool = False) -> jax.Array:
    """OpenCLIPVisionTower.forward_visual + feature_select
    (open_clip_encoder.py:63-117): conv1 -> [CLS; patches] + pos -> ln_pre ->
    resblocks with per-block feature collection (len == num_layers — no
    embeddings entry, unlike the HF towers), then layer/token selection."""
    B = pixel_values.shape[0]
    x = patchify(pixel_values, cfg.patch_size).astype(
        params["patch_embed"]["w"].dtype)
    x = x @ params["patch_embed"]["w"]          # conv1 has no bias
    cls = jnp.broadcast_to(params["class_embed"], (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]
    x = _layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"],
                    cfg.layer_norm_eps)
    states = []
    for lp in params["layers"]:
        x = open_clip_encoder_layer(lp, x, cfg, quick_gelu)
        states.append(x)
    feats = states[select_layer]
    if select_feature == "patch":
        return feats[:, 1:]
    if select_feature == "cls_patch":
        return feats
    if select_feature == "conv_flatten":   # open_clip_encoder.py:70-71
        return feats
    raise ValueError(f"Unexpected select feature: {select_feature}")


def convert_open_clip(state, dtype=jnp.float32,
                      prefix: str = "visual.") -> Params:
    """open_clip visual state dict (conv1 / class_embedding /
    positional_embedding / ln_pre / transformer.resblocks.N.{ln_1,
    attn.in_proj_*, attn.out_proj, ln_2, mlp.c_fc, mlp.c_proj}) -> the same
    pytree layout as models/clip.py (fused in_proj split into q/k/v)."""
    from video3d_tpu.models.weights import _to_np

    g = lambda k: _to_np(state[prefix + k])
    vec = lambda k: jnp.asarray(g(k), dtype)

    conv_w = g("conv1.weight")                  # (D, 3, P, P)
    layers = []
    i = 0
    while f"{prefix}transformer.resblocks.{i}.ln_1.weight" in state:
        p = f"transformer.resblocks.{i}."
        in_w = g(p + "attn.in_proj_weight")     # (3D, D)
        in_b = g(p + "attn.in_proj_bias")
        D = in_w.shape[1]
        wq, wk, wv = in_w[:D], in_w[D:2 * D], in_w[2 * D:]
        bq, bk, bv = in_b[:D], in_b[D:2 * D], in_b[2 * D:]
        layers.append({
            "ln1": {"scale": vec(p + "ln_1.weight"), "bias": vec(p + "ln_1.bias")},
            "attn": {
                "wq": jnp.asarray(wq.T, dtype), "bq": jnp.asarray(bq, dtype),
                "wk": jnp.asarray(wk.T, dtype), "bk": jnp.asarray(bk, dtype),
                "wv": jnp.asarray(wv.T, dtype), "bv": jnp.asarray(bv, dtype),
                "wo": jnp.asarray(g(p + "attn.out_proj.weight").T, dtype),
                "bo": vec(p + "attn.out_proj.bias"),
            },
            "ln2": {"scale": vec(p + "ln_2.weight"), "bias": vec(p + "ln_2.bias")},
            "mlp": {
                "w1": jnp.asarray(g(p + "mlp.c_fc.weight").T, dtype),
                "b1": vec(p + "mlp.c_fc.bias"),
                "w2": jnp.asarray(g(p + "mlp.c_proj.weight").T, dtype),
                "b2": vec(p + "mlp.c_proj.bias"),
            },
        })
        i += 1

    return {
        "patch_embed": {"w": jnp.asarray(conv_w.reshape(conv_w.shape[0], -1).T,
                                         dtype)},
        "class_embed": vec("class_embedding").reshape(1, -1),
        "pos_embed": vec("positional_embedding"),
        "pre_ln": {"scale": vec("ln_pre.weight"), "bias": vec("ln_pre.bias")},
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# builder dispatch (multimodal_encoder/builder.py:13-38)
# ---------------------------------------------------------------------------

class VisionTower(NamedTuple):
    family: str                 # 'clip' | 'siglip' | 'hf' | 'open_clip'
    forward: Any                # fn(params, pixels) -> (B, N, D)
    convert: Any                # fn(state_dict) -> params
    cfg: Optional[VisionConfig]


def build_vision_tower(vision_tower: str, cfg: Optional[VisionConfig] = None,
                       select_layer: int = -2,
                       select_feature: str = "patch",
                       use_s2: bool = False,
                       s2_scales: str = "",
                       dtype=jnp.float32) -> VisionTower:
    """Name-based dispatch mirroring the reference builder
    (multimodal_encoder/builder.py:13-38): path-or-openai/laion/ShareGPT4V
    -> CLIP; 'siglip' substring -> SigLIP; 'hf:' prefix -> HF families;
    'open_clip_hub:' -> OpenCLIP; 'imagebind_huge' -> the native
    models/imagebind.py vision trunk (the reference needs the external
    imagebind package for it). EVA towers are commented out of the
    reference builder (builder.py:9-10,32-35)."""
    import os

    from video3d_tpu.models import clip as clip_mod
    from video3d_tpu.models import siglip as siglip_mod
    from video3d_tpu.models import weights as weights_mod

    name = vision_tower
    if "siglip" in name:
        c = cfg or VisionConfig()
        return VisionTower(
            "siglip",
            lambda p, x: siglip_mod.vision_tower_forward(p, x, c),
            lambda s: weights_mod.convert_siglip(s, c, prefix="vision_model.",
                                                 dtype=dtype),
            c)
    if name.startswith("hf:"):
        c = cfg or VisionConfig()
        # architecture family from the config/name; CLIP-like models carry a
        # class embedding, SigLIP-like do not
        family = "siglip" if "siglip" in name.lower() else "clip"
        conv = (lambda s: weights_mod.convert_siglip(
                    s, c, prefix="vision_model.", dtype=dtype)) \
            if family == "siglip" else \
            (lambda s: clip_mod.convert_clip(s, c, dtype=dtype))
        return VisionTower(
            "hf",
            lambda p, x: hf_vision_tower_forward(
                p, x, c, family=family, select_layer=select_layer,
                select_feature=select_feature),
            conv, c)
    if name.startswith("open_clip_hub"):
        c = cfg or VisionConfig()
        return VisionTower(
            "open_clip",
            lambda p, x: open_clip_tower_forward(
                p, x, c, select_layer=select_layer,
                select_feature=select_feature),
            lambda s: convert_open_clip(s, dtype=dtype), c)
    if name in ("imagebind_huge",):
        # native ImageBind-Huge vision path (multimodal_encoder/imagebind.py
        # ImageBindWrapper) — no external package needed; (B, 1, 1024)
        # L2-normalized joint embeddings, hidden_size 1024
        # (imagebind.py:71-73). Audio modality: models/imagebind.py header.
        from video3d_tpu.models import imagebind as ib

        c = ib.ImageBindConfig()
        return VisionTower(
            "imagebind",
            lambda p, x: ib.imagebind_vision_forward(p, x, c),
            lambda s: ib.convert_imagebind(s, c, dtype=dtype), None)
    if os.path.exists(name) or name.startswith("openai") \
            or name.startswith("laion") or "ShareGPT4V" in name:
        c = cfg or VisionConfig()
        if use_s2:
            # CLIPVisionTowerS2 (clip_encoder.py:125-176): native
            # multi-scale forward, s2wrapper semantics. Images must be
            # preprocessed at scales[-1]; hidden size is D * len(scales).
            scales = tuple(sorted(
                int(v) for v in (s2_scales or "336,672,1008").split(",")))
            return VisionTower(
                "clip_s2",
                lambda p, x: clip_mod.clip_s2_forward(
                    p, x, c, scales=scales, select_layer=select_layer),
                lambda s: clip_mod.convert_clip(s, c, dtype=dtype), c)
        return VisionTower(
            "clip",
            lambda p, x: clip_mod.clip_tower_forward(p, x, c,
                                                     select_layer=select_layer),
            lambda s: clip_mod.convert_clip(s, c, dtype=dtype), c)
    raise ValueError(f"Unknown vision tower: {vision_tower}")
