"""Full Video-3D-LLM assembly: vision tower -> projector -> 2D pool ->
3D position encoding -> grid-newline layout -> static splice -> Qwen2.

Reproduces the semantics of the reference model
(/root/reference/llava/model/llava_arch.py + llava_qwen.py) with a
TPU-first dataflow: every stage is a batched static-shape jnp transform;
the per-sample Python splicing of the reference is replaced by the
precomputed integer plan in :mod:`video3d_tpu.models.splice`.

Param pytree:
  vision:    siglip.py tree
  projector: {w1, b1, w2, b2}            (mlp2x_gelu, builder.py:47-55)
  image_newline: (D,)                     (llava_arch.py:66-70)
  llm:       qwen2.py tree
  ground_head (optional): {obj: mlp, query: mlp, zero_target: (D,)}
                                          (llava_qwen.py:92-111)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from video3d_tpu.config import (CoordPooling, GroundHeadType, ModelConfig,
                                NewlinePosition, ObjectFeatureType,
                                PosEmbedType)
from video3d_tpu.constants import IGNORE_INDEX
from video3d_tpu.models import qwen2, siglip
from video3d_tpu.models.splice import KIND_PAD, KIND_TEXT, KIND_VISION
from video3d_tpu.ops import geometry
from video3d_tpu.ops.pos_embed import mlp_position_embedding, sin3d_position_embedding

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Projector
# ---------------------------------------------------------------------------

def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale + bias


def project_features(p: Params, x: jax.Array) -> jax.Array:
    """mm projector variants (multimodal_projector/builder.py:32-65 +
    pooler_projector.py):

      * identity        — empty params
      * linear          — {w1, b1}
      * mlpNx_gelu      — {w1, b1, ..., wN, bN}; erf GELU between linears
      * mlpNx_resNx_gelu — mlp keys + ``res``: list of SimpleResBlock params
        {ln_s, ln_b, w1, b1, w2, b2}; out = ln(x) + Linear(GELU(Linear(ln(x))))
        (NB the residual uses the *normalized* input, builder.py:27-29)
      * pooler          — {conv_w (4*Cin, Cout), conv_b, w1, b1}: 2x2/s2 conv
        over the patch grid (as one reshape+matmul — MXU-friendly, identical
        to Conv2d k=2 s=2), GELU, Linear (pooler_projector.py:15-29)
    """
    if not p:                      # identity (builder.py 'identity')
        return x
    h = x
    if "conv_w" in p:              # pooler (pooler_projector.py)
        B, N, C = h.shape
        hw = int(round(N ** 0.5))
        out_hw = hw // 2           # Conv2d floor rule; odd grids drop last row/col
        h = h.reshape(B, hw, hw, C)[:, :2 * out_hw, :2 * out_hw]
        h = h.reshape(B, out_hw, 2, out_hw, 2, C).transpose(0, 1, 3, 2, 4, 5)
        h = h.reshape(B, out_hw * out_hw, 4 * C)
        h = h @ p["conv_w"] + p["conv_b"]
        h = jax.nn.gelu(h, approximate=False)
        return h @ p["w1"] + p["b1"]
    i = 1
    while f"w{i}" in p:            # linear / mlpNx_gelu chain
        if i > 1:
            h = jax.nn.gelu(h, approximate=False)
        h = h @ p[f"w{i}"] + p[f"b{i}"]
        i += 1
    for blk in p.get("res", ()):   # mlpNx_resNx_gelu tail (SimpleResBlock)
        hn = _layer_norm(h, blk["ln_s"], blk["ln_b"])
        inner = jax.nn.gelu(hn @ blk["w1"] + blk["b1"], approximate=False)
        h = hn + (inner @ blk["w2"] + blk["b2"])
    return h


def init_projector(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32,
                   projector_type: str = "mlp2x_gelu"):
    """Random params for any reference projector type string."""
    import re

    if projector_type == "identity":
        return {}
    if projector_type == "pooler":
        k1, k2 = jax.random.split(key)
        return {
            "conv_w": 0.02 * jax.random.normal(k1, (4 * in_dim, out_dim), dtype),
            "conv_b": jnp.zeros((out_dim,), dtype),
            "w1": 0.02 * jax.random.normal(k2, (out_dim, out_dim), dtype),
            "b1": jnp.zeros((out_dim,), dtype),
        }
    if projector_type == "linear":
        mlp_depth, res_depth = 1, 0
    else:
        m = re.match(r"^mlp(\d+)x(?:_res(\d+)x)?_gelu$", projector_type)
        if not m:
            raise ValueError(f"Unknown projector type: {projector_type}")
        mlp_depth, res_depth = int(m.group(1)), int(m.group(2) or 0)
    keys = jax.random.split(key, mlp_depth + 2 * res_depth)
    p: Params = {}
    for i in range(1, mlp_depth + 1):
        d_in = in_dim if i == 1 else out_dim
        p[f"w{i}"] = 0.02 * jax.random.normal(keys[i - 1], (d_in, out_dim), dtype)
        p[f"b{i}"] = jnp.zeros((out_dim,), dtype)
    if res_depth:
        p["res"] = [
            {"ln_s": jnp.ones((out_dim,), dtype), "ln_b": jnp.zeros((out_dim,), dtype),
             "w1": 0.02 * jax.random.normal(keys[mlp_depth + 2 * r], (out_dim, out_dim), dtype),
             "b1": jnp.zeros((out_dim,), dtype),
             "w2": 0.02 * jax.random.normal(keys[mlp_depth + 2 * r + 1], (out_dim, out_dim), dtype),
             "b2": jnp.zeros((out_dim,), dtype)}
            for r in range(res_depth)
        ]
    return p


# ---------------------------------------------------------------------------
# Vision pipeline
# ---------------------------------------------------------------------------

def pool_and_discretize_coords(world_coords: jax.Array, cfg: ModelConfig) -> jax.Array:
    """(B, V, H, W, 3) pixel coords -> (B, V, g, g, 3) per-patch voxel ids.

    avg pooling + voxel discretization (llava_arch.py:395-420 for the
    'avg-discrete' flagship path).
    """
    B, V = world_coords.shape[:2]
    # coord patch size: image px per pooled token (384//14 = 27 in prod)
    g = -(-cfg.vision.num_patches_per_side // cfg.spatial_pool_stride)
    ps = cfg.vision.image_size // g
    pool = {
        CoordPooling.AVG: lambda wc: geometry.average_coordinate_in_patch(wc, ps),
        CoordPooling.SAMPLE1: lambda wc: geometry.sample_n_points(wc, 1, ps),
    }[cfg.world_3d.pooling]
    wc = pool(world_coords.reshape(B * V, *world_coords.shape[2:]))
    wc = wc.reshape(B, V, *wc.shape[1:])
    if cfg.world_3d.discrete:
        vox = cfg.world_3d.voxel
        wc = geometry.discrete_coords(wc, vox.min_xyz_range, vox.max_xyz_range,
                                      vox.voxel_size)
    return wc


def world_position_embedding(params: Params, coords: jax.Array,
                             cfg: ModelConfig, n_points: int = 1) -> jax.Array:
    """Dispatch sin3d vs MLP world PE (llava_arch.py:48-65)."""
    if cfg.world_3d.pos_embed == PosEmbedType.SIN3D:
        return sin3d_position_embedding(coords, cfg.llm.hidden_size,
                                        cfg.world_3d.pe_temperature, n_points)
    if cfg.world_3d.pos_embed == PosEmbedType.MLP:
        return mlp_position_embedding(params["world_pe_mlp"], coords, n_points)
    raise ValueError(cfg.world_3d.pos_embed)


class VisionTokens(NamedTuple):
    spliceable: jax.Array   # (B, V*tokens_per_frame, D) grid+newline layout
    pooled: jax.Array       # (B, V, g*g, D) pooled projected features (+PE)
    raw: jax.Array          # (B, V, 729, D) projected pre-pool features


def encode_video_pooled(params: Params, cfg: ModelConfig, images: jax.Array,
                        remat: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Question-independent vision half: tower -> projector -> 2D pool.

    Args:
      images: (B, V, 3, S, S) normalized pixels.
    Returns:
      (pooled (B, V, g*g, D), raw (B, V, side*side, D)).

    This is the scene-cacheable boundary: everything here depends only on
    the scene's frames (the reference re-runs it for EVERY question on the
    same scene; the engine's scene cache amortizes it — see
    eval/drivers.py). World PE + newline layout live in
    :func:`finish_video_tokens`, which consumes the per-question geometry.
    """
    B, V = images.shape[:2]
    side = cfg.vision.num_patches_per_side              # 27

    flat = images.reshape(B * V, *images.shape[2:])
    feats = siglip.vision_tower_forward(
        params["vision"], flat, cfg.vision, remat=remat,
        pad_seq_to=cfg.vision.tower_pad_seq)             # (BV, 729, Dv)
    feats = project_features(params["projector"], feats)  # (BV, 729, D)
    raw = feats.reshape(B, V, side * side, -1)

    pooled = geometry.pool_2d_tokens(feats, side, cfg.spatial_pool_stride,
                                     cfg.spatial_pool_mode.value)  # (BV, g*g, D)
    g = -(-side // cfg.spatial_pool_stride)             # 14
    return pooled.reshape(B, V, g * g, -1), raw


def finish_video_tokens(params: Params, cfg: ModelConfig, pooled: jax.Array,
                        raw: jax.Array,
                        patch_coords: Optional[jax.Array] = None
                        ) -> VisionTokens:
    """World PE + newline layout on (possibly cached) pooled features."""
    B, V = pooled.shape[:2]
    side = cfg.vision.num_patches_per_side
    g = -(-side // cfg.spatial_pool_stride)

    if patch_coords is not None and cfg.world_3d.pos_embed in (
            PosEmbedType.SIN3D, PosEmbedType.MLP):
        n_points = cfg.world_3d.pooling.n_points
        coords = patch_coords.reshape(B, V * g * g, n_points, 3) \
            if n_points > 1 else patch_coords.reshape(B, V * g * g, 3)
        pe = world_position_embedding(params, jax.lax.stop_gradient(coords),
                                      cfg, n_points)
        pooled = pooled + pe.reshape(B, V, g * g, -1).astype(pooled.dtype)

    # Newline layout (llava_arch.py:307-334 + :534-569):
    #   GRID: one newline token per g-patch row (flagship, 210 tokens/frame)
    #   FRAME: one newline token after each frame
    #   ONE_TOKEN: single trailing newline token; NO_TOKEN: none.
    D = pooled.shape[-1]
    nl = params["image_newline"].astype(pooled.dtype)
    if cfg.newline_position == NewlinePosition.GRID:
        grid = pooled.reshape(B, V, g, g, D)
        newline = jnp.broadcast_to(nl, (B, V, g, 1, D))
        spliceable = jnp.concatenate([grid, newline], axis=3).reshape(B, -1, D)
    elif cfg.newline_position == NewlinePosition.FRAME:
        newline = jnp.broadcast_to(nl, (B, V, 1, D))
        spliceable = jnp.concatenate([pooled, newline], axis=2).reshape(B, -1, D)
    elif cfg.newline_position == NewlinePosition.ONE_TOKEN:
        flat = pooled.reshape(B, -1, D)
        spliceable = jnp.concatenate(
            [flat, jnp.broadcast_to(nl, (B, 1, D))], axis=1)
    else:  # NO_TOKEN
        spliceable = pooled.reshape(B, -1, D)
    return VisionTokens(spliceable=spliceable, pooled=pooled, raw=raw)


def encode_video(params: Params, cfg: ModelConfig,
                 images: jax.Array,
                 patch_coords: Optional[jax.Array] = None,
                 remat: bool = False) -> VisionTokens:
    """Vision side of the forward pass.

    Args:
      images: (B, V, 3, S, S) normalized pixels.
      patch_coords: (B, V, g, g, 3) pooled (possibly discretized) coords, or
        None to skip the additive world PE.
    Returns:
      VisionTokens; ``spliceable`` feeds the token splice.
    """
    pooled, raw = encode_video_pooled(params, cfg, images, remat=remat)
    return finish_video_tokens(params, cfg, pooled, raw, patch_coords)


def encode_video_llava3d(params: Params, cfg: ModelConfig,
                         images: jax.Array, patch_coords: jax.Array,
                         key: Optional[jax.Array] = None,
                         remat: bool = False) -> Tuple[jax.Array, jax.Array]:
    """'llava3d' PE variant (llava_arch.py:731-746): pooled patch features
    grouped by discrete voxel, meaned, and sampled to a fixed budget.

    The reference strips the grid-newline columns then dedups with a python
    defaultdict (B=1 only, dynamic output length); here the dedup is one
    jit (ops/voxel_dedup.py) with a static (budget, D) output.

    Args:
      images: (1, V, 3, S, S); patch_coords: (V, g, g, 3) DISCRETE voxels.
      key: PRNG key for the reference's random voxel subset (None ->
        deterministic first-voxels order).
    Returns:
      ((budget, D) vision tokens, (budget,) genuine-voxel mask).
    """
    from video3d_tpu.ops.voxel_dedup import voxel_dedup_features

    vt = encode_video(params, cfg, images, None, remat=remat)
    feats = vt.pooled[0].reshape(-1, vt.pooled.shape[-1])     # (V*g*g, D)
    coords = patch_coords.reshape(-1, 3)
    return voxel_dedup_features(feats, coords, cfg.world_3d.voxel.grid_dims,
                                budget=cfg.world_3d.llava3d_budget, key=key)


# ---------------------------------------------------------------------------
# Splice assembly (device side)
# ---------------------------------------------------------------------------

def assemble_embeds(params: Params, cfg: ModelConfig,
                    vision_tokens: jax.Array,
                    text_ids: jax.Array, kind: jax.Array,
                    vision_index: jax.Array,
                    coord_mask: Optional[jax.Array] = None,
                    box_input: Optional[jax.Array] = None) -> jax.Array:
    """Gather the final (B, L, D) input embeddings from the splice plan.

    Replaces llava_arch.py:672-836 with one gather + select. ``box_input``
    is the Scan2Cap <coord> center, already discretized, (B, 3); its PE is
    added at coord_mask slots (llava_arch.py:697-700).
    """
    text_emb = qwen2.embed_tokens(params["llm"], text_ids)        # (B, L, D)
    vis = jnp.take_along_axis(vision_tokens, vision_index[..., None], axis=1)
    embeds = jnp.where((kind == KIND_VISION)[..., None], vis, text_emb)
    embeds = jnp.where((kind == KIND_PAD)[..., None], 0.0, embeds)
    if coord_mask is not None and box_input is not None and \
            cfg.world_3d.pos_embed in (PosEmbedType.SIN3D, PosEmbedType.MLP):
        # <coord> input PE only under sin3d/mlp (llava_arch.py:697-700)
        pe = world_position_embedding(
            params, jax.lax.stop_gradient(box_input[:, None, :]), cfg)  # (B,1,D)
        embeds = embeds + coord_mask[..., None] * pe.astype(embeds.dtype)
    return embeds


# ---------------------------------------------------------------------------
# Grounding (object proposals)
# ---------------------------------------------------------------------------

def object_patch_masks(world_coords: jax.Array, boxes: jax.Array,
                       feature_type: ObjectFeatureType,
                       side: int = 27, patch_px: int = 14,
                       grid: int = 14, pool_px: int = 27) -> jax.Array:
    """Per-object patch membership masks from pixel world coords.

    Reference llava_arch.py:362-378 (production numbers in parens):
      patch14: the side^2 (729) SigLIP patches, patch_px^2 (14x14) px each;
        a patch belongs to an object if >=50% of its pixels fall inside the
        object AABB.
      patch27: the grid^2 (196) pooled tokens, pool_px^2 (27x27) px each;
        threshold >=25%.

    Args:
      world_coords: (V, H, W, 3) with H, W >= side*patch_px.
      boxes: (N, 6) center+size.
    Returns:
      (N, V, P) bool with P = side^2 (patch14) or grid^2 (patch27).
    """
    V = world_coords.shape[0]
    mn = (boxes[:, :3] - boxes[:, 3:] / 2)[:, None, None, None, :]  # (N,1,1,1,3)
    mx = (boxes[:, :3] + boxes[:, 3:] / 2)[:, None, None, None, :]

    if feature_type == ObjectFeatureType.PATCH14:
        crop = side * patch_px
        wc = world_coords[:, :crop, :crop, :]
        wcp = wc.reshape(V, side, patch_px, side, patch_px, 3).transpose(0, 1, 3, 2, 4, 5)
        wcp = wcp.reshape(V, side * side, patch_px * patch_px, 3)
        thresh = int(patch_px * patch_px * 0.5)
    else:
        crop = grid * pool_px
        wc = world_coords[:, :crop, :crop, :]
        wcp = wc.reshape(V, grid, pool_px, grid, pool_px, 3).transpose(0, 1, 3, 2, 4, 5)
        wcp = wcp.reshape(V, grid * grid, pool_px * pool_px, 3)
        thresh = int(pool_px * pool_px * 0.25)

    inside = jnp.all((wcp[None] >= mn) & (wcp[None] <= mx), axis=-1)  # (N,V,P,px)
    return inside.sum(axis=-1) >= thresh


def object_features_from_masks(feats: jax.Array, masks: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Masked mean of patch features per object (llava_arch.py:479-498).

    Args:
      feats: (V, P, D) projected features (raw 729 for patch14, pooled 196
        for patch27).
      masks: (N, V, P) bool.
    Returns:
      (obj_feats (N, D), valid (N,) bool — False means zero patches matched
      and the feature is zeros, as in the reference :492-496).
    """
    m = masks.astype(feats.dtype)
    counts = m.sum(axis=(1, 2))                                   # (N,)
    sums = jnp.einsum("nvp,vpd->nd", m, feats)
    valid = counts > 0
    return sums / jnp.maximum(counts, 1.0)[:, None], valid


def _layernorm(h, scale, bias):
    h32 = h.astype(jnp.float32)
    mean = h32.mean(-1, keepdims=True)
    var = ((h32 - mean) ** 2).mean(-1, keepdims=True)
    return ((h32 - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias).astype(h.dtype)


def _ground_mlp(p: Params, x: jax.Array) -> jax.Array:
    """Linear -> ReLU -> LayerNorm -> Linear (infonce/mlp heads,
    llava_qwen.py:66-71,100-111)."""
    h = jax.nn.relu(x @ p["w1"] + p["b1"])
    h = _layernorm(h, p["ln_scale"], p["ln_bias"])
    return h @ p["w2"] + p["b2"]


def _ground_mlp_ln_first(p: Params, x: jax.Array) -> jax.Array:
    """Linear -> LayerNorm -> ReLU -> Linear (score head, llava_qwen.py:74-91)."""
    h = x @ p["w1"] + p["b1"]
    h = jax.nn.relu(_layernorm(h, p["ln_scale"], p["ln_bias"]))
    return h @ p["w2"] + p["b2"]


def ground_scores(params: Params, query_hidden: jax.Array,
                  object_feats: jax.Array, object_valid: jax.Array,
                  cfg: ModelConfig) -> jax.Array:
    """Grounding scores by head type (llava_qwen.py:283-300).

    Args:
      query_hidden: (D,) hidden state at the <ground> token.
      object_feats: (N, D); object_valid: (N,) bool (padding mask).
    Returns:
      infonce: (N+1,) cosine scores, slot N = learned zero-target;
      mlp / score: (N,) raw scores. Invalid (padded) objects score -inf.
    """
    gh = params["ground_head"]
    if cfg.ground_head == GroundHeadType.INFONCE:
        feats = jnp.concatenate(
            [object_feats, gh["zero_target"][None].astype(object_feats.dtype)], axis=0)
        obj = _ground_mlp(gh["obj"], feats)
        qry = _ground_mlp(gh["query"], query_hidden[None])
        obj = obj / jnp.linalg.norm(obj.astype(jnp.float32), axis=-1,
                                    keepdims=True).astype(obj.dtype)
        qry = qry / jnp.linalg.norm(qry.astype(jnp.float32), axis=-1,
                                    keepdims=True).astype(qry.dtype)
        scores = (obj * qry).sum(-1)
        valid = jnp.concatenate([object_valid, jnp.ones((1,), bool)])
        return jnp.where(valid, scores, -jnp.inf)
    if cfg.ground_head == GroundHeadType.MLP:
        # hidden -> MLP -> dot with object features (llava_qwen.py:283-285)
        q = _ground_mlp(gh["query"], query_hidden[None])[0]
        scores = (object_feats * q).sum(-1)
        return jnp.where(object_valid, scores, -jnp.inf)
    if cfg.ground_head == GroundHeadType.SCORE:
        # obj/query MLPs -> elementwise product -> scoring MLP (:287-292)
        obj = _ground_mlp_ln_first(gh["obj"], object_feats)
        qry = _ground_mlp_ln_first(gh["query"], query_hidden[None])
        mul = obj * qry
        scores = (_ground_mlp_ln_first(gh["score"], mul))[:, 0]
        return jnp.where(object_valid, scores, -jnp.inf)
    raise ValueError(cfg.ground_head)


def bce_ground_loss(scores: jax.Array, target_multi_hot: jax.Array) -> jax.Array:
    """Weighted BCE for mlp/score heads (llava_qwen.py:313-322): positives
    reweighted by (N - P) / P."""
    valid = jnp.isfinite(scores)
    s = jnp.where(valid, scores, 0.0).astype(jnp.float32)
    t = target_multi_hot[: scores.shape[0]].astype(jnp.float32)
    n_pos = (t * valid).sum()
    n = valid.sum()
    weight = jnp.where(t > 0, jnp.where(n_pos > 0, (n - n_pos) / jnp.maximum(n_pos, 1), 1.0), 1.0)
    bce = jnp.maximum(s, 0) - s * t + jnp.log1p(jnp.exp(-jnp.abs(s)))
    return (bce * weight * valid).sum() / jnp.maximum(valid.sum(), 1)


def infonce_loss(scores: jax.Array, target_multi_hot: jax.Array,
                 temperature: float) -> jax.Array:
    """-log(sum_pos exp(s/t) / sum_all exp(s/t)) (llava_qwen.py:304-308),
    computed with a stable logsumexp. ``target_multi_hot`` is (N+1,) with the
    zero-target slot set when there is no positive object (:305-306)."""
    s = scores.astype(jnp.float32) / temperature
    log_all = jax.nn.logsumexp(jnp.where(jnp.isfinite(s), s, -1e30))
    log_pos = jax.nn.logsumexp(jnp.where(target_multi_hot > 0, s, -1e30))
    return log_all - log_pos


def init_ground_head(key: jax.Array, hidden: int, dtype=jnp.float32,
                     head_type: GroundHeadType = GroundHeadType.INFONCE) -> Params:
    ks = jax.random.split(key, 5)

    def mlp(k, din, dout):
        k1, k2 = jax.random.split(k)
        return {
            "w1": 0.02 * jax.random.normal(k1, (din, dout), dtype),
            "b1": jnp.zeros((dout,), dtype),
            "ln_scale": jnp.ones((dout,), dtype),
            "ln_bias": jnp.zeros((dout,), dtype),
            "w2": 0.02 * jax.random.normal(k2, (dout, dout), dtype),
            "b2": jnp.zeros((dout,), dtype),
        }

    if head_type == GroundHeadType.INFONCE:
        return {"obj": mlp(ks[0], hidden, hidden),
                "query": mlp(ks[1], hidden, hidden),
                "zero_target": jax.random.normal(ks[2], (hidden,), dtype)}
    if head_type == GroundHeadType.MLP:
        return {"query": mlp(ks[1], hidden, hidden)}
    if head_type == GroundHeadType.SCORE:
        head = {"obj": mlp(ks[0], hidden, 1024),
                "query": mlp(ks[1], hidden, 1024),
                "score": mlp(ks[2], 1024, 1024)}
        # scoring MLP projects to a single logit
        k1, _ = jax.random.split(ks[3])
        head["score"]["w2"] = 0.02 * jax.random.normal(k1, (1024, 1), dtype)
        head["score"]["b2"] = jnp.zeros((1,), dtype)
        return head
    raise ValueError(head_type)


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------

class Batch(NamedTuple):
    """Device-side batch (all static shapes). Produced by the data collator."""

    images: jax.Array                  # (B, V, 3, S, S)
    patch_coords: jax.Array            # (B, V, g, g, 3) pooled+discrete coords
    text_ids: jax.Array                # (B, L)
    kind: jax.Array                    # (B, L)
    vision_index: jax.Array            # (B, L)
    labels: jax.Array                  # (B, L)
    position_ids: jax.Array            # (B, L)
    mrope_position_ids: jax.Array      # (B, L, 3)
    seq_len: jax.Array                 # (B,)
    coord_mask: Optional[jax.Array] = None   # (B, L)
    box_input: Optional[jax.Array] = None    # (B, 3) discretized centers
    # 2D-image modality (train_3d.py:1146-1160 image branch): anyres tiles +
    # the static gather plan (models/anyres.py build_anyres_gather_plan)
    image_tiles: Optional[jax.Array] = None     # (B, maxT, 3, S, S)
    vision_gather: Optional[jax.Array] = None   # (B, Tv) int32
    vision_newline: Optional[jax.Array] = None  # (B, Tv) bool
    vision_valid: Optional[jax.Array] = None    # (B, Tv) bool


def _position_ids_3d(batch: Batch, cfg: ModelConfig) -> jax.Array:
    if cfg.world_3d.pos_embed == PosEmbedType.MROPE:
        return batch.mrope_position_ids
    return jnp.broadcast_to(batch.position_ids[..., None],
                            (*batch.position_ids.shape, 3))


def forward(params: Params, cfg: ModelConfig, batch: Batch,
            remat: bool = False) -> jax.Array:
    """Training/eval forward pass -> (B, L, vocab) logits.

    Right padding means causal + per-sample key length fully describes the
    mask, so attention runs on the Pallas flash path (no (B, L, L) mask
    tensor is ever built).
    """
    hidden, _ = forward_hidden(params, cfg, batch, remat=remat)
    return qwen2.lm_head(params["llm"], hidden)


def forward_hidden(params: Params, cfg: ModelConfig, batch: Batch,
                   remat: bool = False, scan_layers: bool = False
                   ) -> Tuple[jax.Array, Optional[VisionTokens]]:
    """Forward returning final hidden states (for the grounding head)."""
    if batch.image_tiles is not None:
        # 2D-image modality: batched anyres gather-plan encoder
        from video3d_tpu.models.anyres import encode_image_2d_batch

        spliceable = encode_image_2d_batch(
            params, cfg, batch.image_tiles, batch.vision_gather,
            batch.vision_newline, batch.vision_valid, remat=remat)
        vt = None
    else:
        vt = encode_video(params, cfg, batch.images, batch.patch_coords,
                          remat=remat)
        spliceable = vt.spliceable
    embeds = assemble_embeds(params, cfg, spliceable, batch.text_ids,
                             batch.kind, batch.vision_index,
                             batch.coord_mask, batch.box_input)
    hidden, _ = qwen2.qwen2_forward(params["llm"], cfg.llm, embeds,
                                    _position_ids_3d(batch, cfg),
                                    kv_len=batch.seq_len, remat=remat,
                                    scan_layers=scan_layers)
    return hidden, vt


def language_model_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Shifted cross-entropy with IGNORE_INDEX masking, mean over valid
    targets (qwen2/modeling_qwen2.py:1196-1207)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    mask = shift_labels != IGNORE_INDEX
    safe = jnp.where(mask, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1)


def chunked_language_model_loss(params: Params, hidden: jax.Array,
                                labels: jax.Array,
                                chunk: int = 1024) -> jax.Array:
    """Same loss as ``language_model_loss(lm_head(hidden), labels)`` but
    without ever materializing the (B, L, vocab) logits: a ``lax.scan``
    over length chunks computes each chunk's lm_head matmul + NLL inside
    ``jax.checkpoint``, so both forward and backward peak at
    (B, chunk, vocab) — at L=8k and the 151k Qwen2 vocab that is ~5 GB of
    f32 logits (plus the log_softmax copy) that never touches HBM.
    Numerics match the unchunked loss (golden test, tests/test_train.py)."""
    B, L, D = hidden.shape
    h = hidden[:, :-1]
    lab = labels[:, 1:]
    Lm = L - 1
    n = -(-Lm // chunk)
    pad = n * chunk - Lm
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        lab = jnp.pad(lab, ((0, 0), (0, pad)),
                      constant_values=IGNORE_INDEX)
    hs = h.reshape(B, n, chunk, D).transpose(1, 0, 2, 3)
    labs = lab.reshape(B, n, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_nll(head, hc, labc):
        logits = qwen2.lm_head({"lm_head": head}, hc).astype(jnp.float32)
        mask = labc != IGNORE_INDEX
        safe = jnp.where(mask, labc, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return (nll * mask).sum(), mask.sum()

    def body(carry, xs):
        s, c = carry
        ds, dc = chunk_nll(params["llm"]["lm_head"], *xs)
        return (s + ds, c + dc), None

    (total, count), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        (hs, labs))
    return total / jnp.maximum(count, 1)


def _grounding_object_features(params: Params, cfg: ModelConfig,
                               vt: VisionTokens, world_coords: jax.Array,
                               object_boxes: jax.Array) -> jax.Array:
    """(N, D) masked-mean object features (+ box-center PE) for one sample
    (llava_arch.py:351-378, :479-501). Question-independent: depends only on
    the scene's coords/features and its proposal boxes."""
    side = cfg.vision.num_patches_per_side
    g = -(-side // cfg.spatial_pool_stride)
    # patch/pool pixel sizes derive from the COORD image height (the
    # reference hardcodes 378 = 27x14px / 14x27px for its 384-res coords,
    # llava_arch.py:362-378; at 384 these are identical: 384//27 = 14,
    # 384//14 = 27)
    H = world_coords.shape[-3]
    masks = object_patch_masks(world_coords, object_boxes,
                               cfg.world_3d.object_feature_type,
                               side=side, patch_px=H // side,
                               grid=g, pool_px=H // g)
    feats = vt.raw[0] if cfg.world_3d.object_feature_type == ObjectFeatureType.PATCH14 \
        else vt.pooled[0]
    # Objects whose box covers no patch keep a zero feature vector and are
    # still scored (llava_arch.py:492-496); only PADDED slots are masked out.
    obj_feats, _ = object_features_from_masks(feats, masks)
    if cfg.world_3d.object_feature_use_pe and cfg.world_3d.pos_embed in (
            PosEmbedType.SIN3D, PosEmbedType.MLP):
        centers = object_boxes[:, :3]
        vox = cfg.world_3d.voxel
        if cfg.world_3d.discrete:
            centers = geometry.discrete_coords(centers, vox.min_xyz_range,
                                               vox.max_xyz_range, vox.voxel_size)
        pe = world_position_embedding(params, centers[None], cfg)[0]
        obj_feats = obj_feats + pe.astype(obj_feats.dtype)
    return obj_feats


@functools.partial(jax.jit, static_argnames=("cfg", "remat"))
def grounding_forward(params: Params, cfg: ModelConfig, batch: Batch,
                      world_coords: jax.Array, object_boxes: jax.Array,
                      object_valid: jax.Array, ground_slot: jax.Array,
                      remat: bool = False) -> jax.Array:
    """Discriminative grounding scores for one sample (B=1 contract, like
    the reference drivers, llava_arch.py:351-378 + llava_qwen.py:239-300).

    Args:
      world_coords: (V, H, W, 3) pixel world coords.
      object_boxes: (N, 6) padded proposals; object_valid (N,) mask.
      ground_slot: () index of the <ground> token in the spliced layout.
    Returns:
      (N+1,) scores (last = zero-target).
    """
    hidden, vt = forward_hidden(params, cfg, batch, remat=remat)
    obj_feats = _grounding_object_features(params, cfg, vt, world_coords,
                                           object_boxes)
    query = hidden[0, ground_slot]
    return ground_scores(params, query, obj_feats, object_valid, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "max_cache_len",
                                             "cache_dtype"))
def grounding_forward_cached(params: Params, cfg: ModelConfig, batch: Batch,
                             world_coords: jax.Array, object_boxes: jax.Array,
                             object_valid: jax.Array, ground_slot: jax.Array,
                             max_cache_len: int, cache_dtype=jnp.bfloat16):
    """:func:`grounding_forward` that additionally fills a KV cache during
    the prefill and returns the question-independent object features — the
    scene-prefix harvest for the engine's grounding prefix cache
    (eval/drivers.py). Scores are numerically identical to
    grounding_forward (the cached prefill attends on the same raw K/V
    flash path).

    Returns:
      (scores (N+1,), cache qwen2.KVCache, obj_feats (N, D))
    """
    vt = encode_video(params, cfg, batch.images, batch.patch_coords)
    embeds = assemble_embeds(params, cfg, vt.spliceable, batch.text_ids,
                             batch.kind, batch.vision_index,
                             batch.coord_mask, batch.box_input)
    B, L = batch.text_ids.shape
    cache = qwen2.KVCache.zeros(cfg.llm, B, max_cache_len, dtype=cache_dtype)
    pos3 = _position_ids_3d(batch, cfg)
    cache_positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    hidden, cache = qwen2.qwen2_forward(
        params["llm"], cfg.llm, embeds, pos3, kv_cache=cache,
        cache_positions=cache_positions, kv_len=batch.seq_len, prefill=True)
    obj_feats = _grounding_object_features(params, cfg, vt, world_coords,
                                           object_boxes)
    query = hidden[0, ground_slot]
    scores = ground_scores(params, query, obj_feats, object_valid, cfg)
    return scores, cache, obj_feats


@functools.partial(jax.jit, static_argnames=("cfg", "remat"))
def grounding_forward_batch(params: Params, cfg: ModelConfig, batch: Batch,
                            world_coords: jax.Array, object_boxes: jax.Array,
                            object_valid: jax.Array, ground_slot: jax.Array,
                            remat: bool = False) -> jax.Array:
    """Batched :func:`grounding_forward`: B questions in one prefill.

    The reference grounds one query at a time (model_scanrefer.py); batching
    amortizes the prefill (HBM-bound weight reads) across queries — typically
    many per scene in ScanRefer/Multi3DRefer.

    Args:
      world_coords: (B, V, H, W, 3); object_boxes: (B, N, 6);
      object_valid: (B, N); ground_slot: (B,).
    Returns:
      (B, N+1) scores (infonce; (B, N) for mlp/score heads).
    """
    hidden, vt = forward_hidden(params, cfg, batch, remat=remat)
    side = cfg.vision.num_patches_per_side
    g = -(-side // cfg.spatial_pool_stride)
    H = world_coords.shape[-3]   # coord-image px per patch (see
    masks = jax.vmap(lambda wc, ob: object_patch_masks(  # _grounding_object_features)
        wc, ob, cfg.world_3d.object_feature_type, side=side,
        patch_px=H // side, grid=g,
        pool_px=H // g))(world_coords, object_boxes)
    feats = vt.raw if cfg.world_3d.object_feature_type == ObjectFeatureType.PATCH14 \
        else vt.pooled                                        # (B, V, P, D)
    obj_feats, _ = jax.vmap(object_features_from_masks)(feats, masks)
    if cfg.world_3d.object_feature_use_pe and cfg.world_3d.pos_embed in (
            PosEmbedType.SIN3D, PosEmbedType.MLP):
        centers = object_boxes[..., :3]
        vox = cfg.world_3d.voxel
        if cfg.world_3d.discrete:
            centers = geometry.discrete_coords(centers, vox.min_xyz_range,
                                               vox.max_xyz_range, vox.voxel_size)
        pe = world_position_embedding(params, centers, cfg)
        obj_feats = obj_feats + pe.astype(obj_feats.dtype)
    query = jnp.take_along_axis(hidden, ground_slot[:, None, None],
                                axis=1)[:, 0]                 # (B, D)
    return jax.vmap(lambda q, f, v: ground_scores(params, q, f, v, cfg))(
        query, obj_feats, object_valid)


def init_model(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> Params:
    """Random init of the full assembly (tests / from-scratch training)."""
    ks = jax.random.split(key, 5)
    params: Params = {
        "vision": siglip.init_vision_tower(ks[0], cfg.vision, dtype),
        "projector": init_projector(ks[1], cfg.vision.hidden_size,
                                    cfg.llm.hidden_size, dtype,
                                    cfg.projector.projector_type),
        "image_newline": 0.02 * jax.random.normal(ks[2], (cfg.llm.hidden_size,), dtype),
        "llm": qwen2.init_qwen2(ks[3], cfg.llm, dtype),
    }
    if cfg.ground_head != GroundHeadType.NONE:
        params["ground_head"] = init_ground_head(ks[4], cfg.llm.hidden_size,
                                                 dtype, cfg.ground_head)
    if cfg.world_3d.pos_embed == PosEmbedType.MLP:
        from video3d_tpu.ops.pos_embed import init_mlp_position_embedding
        params["world_pe_mlp"] = init_mlp_position_embedding(
            jax.random.fold_in(key, 7), cfg.llm.hidden_size, dtype=dtype)
    return params
