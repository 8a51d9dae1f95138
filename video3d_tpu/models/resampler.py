"""Vision resamplers — the reference's multimodal_resampler/ family.

The reference builds one of five resamplers from ``mm_resampler_type``
(multimodal_resampler/builder.py:21-32): identity (default — and the only
one the 3D recipe routes through; encode_images has the resampler call
commented out, llava_arch.py:277), ``spatial_pool`` (spatial_pool.py),
``masked_drop`` (masked_drop.py), ``perceiver`` (perceiver.py, the
flamingo-pytorch resampler), and ``qformer`` (qformer.py, a BLIP-2-style
query-only BERT-base with cross-attention every k layers).

Implemented here as pure functions over param pytrees (repo style). Pooling
convs are expressed as reshape+matmul (MXU-friendly, exactly equal to
Conv2d k=s); randomness is passed in explicitly so behavior is reproducible
under jit.

Golden tests: tests/test_resamplers.py builds the reference torch modules,
converts their state_dicts, and compares outputs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale + bias


# ---------------------------------------------------------------------------
# spatial_pool (spatial_pool.py:6-45)
# ---------------------------------------------------------------------------

def spatial_pool(p: Params, image_features: jax.Array,
                 images_hw: Tuple[int, int], mode: str = "average",
                 stride: int = 2) -> jax.Array:
    """Pool the token grid by ``stride`` (spatial_pool.py:23-32).

    Args:
      image_features: (B, N, F) tower tokens.
      images_hw: (H, W) pixel shape of the input images — the reference
        derives the token grid from it: ``ori_W = int(sqrt(N * W // H))``,
        ``ori_H = ori_W * H // W`` (spatial_pool.py:24-25; NB it then
        reshapes with ori_H twice, so non-square inputs only work when the
        derived grid is square — we reproduce the ori_H x ori_H view).
      mode: 'average' | 'max' | 'conv' ('conv' needs p = {conv_w, conv_b}).
    Returns:
      (B, (ori_H//stride)**2, F_out) pooled tokens.
    """
    H, W = images_hw
    B, N, F = image_features.shape
    ori_w = int((N * W // H) ** 0.5)
    ori_h = ori_w * H // W
    x = image_features.reshape(B, ori_h, ori_h, F)
    out = ori_h // stride                       # torch pooling floor rule
    x = x[:, :out * stride, :out * stride]
    x = x.reshape(B, out, stride, out, stride, F)
    if mode == "average":
        x = x.mean(axis=(2, 4))
    elif mode == "max":
        x = x.max(axis=(2, 4))
    elif mode == "conv":
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, out, out, stride * stride * F)
        x = x @ p["conv_w"] + p["conv_b"]
    else:
        raise ValueError(f"Unknown pooling mode: {mode}")
    return x.reshape(B, out * out, -1)


def init_spatial_pool(key: jax.Array, hidden_size: int, out_channels: int,
                      stride: int = 2, mode: str = "conv",
                      dtype=jnp.float32) -> Params:
    if mode != "conv":
        return {}
    return {
        "conv_w": 0.02 * jax.random.normal(
            key, (stride * stride * hidden_size, out_channels), dtype),
        "conv_b": jnp.zeros((out_channels,), dtype),
    }


# ---------------------------------------------------------------------------
# masked_drop (masked_drop.py:7-80)
# ---------------------------------------------------------------------------

def random_masking(x: jax.Array, len_keep: int,
                   noise: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-sample random token subset by argsort of noise
    (masked_drop.py:57-80). ``noise`` is (B, L) uniform [0,1) — passed in
    explicitly so the torch and JAX paths can be compared on shared draws.

    Returns (x_masked (B, len_keep, D), mask (B, L) with 0 = kept,
    ids_restore (B, L))."""
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    mask = jnp.ones(noise.shape, x.dtype).at[:, :len_keep].set(0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_masked, mask, ids_restore


def masked_drop(image_features: jax.Array, rng: Optional[jax.Array] = None,
                mode: str = "fixed", ratio: float = 0.5,
                training: bool = True,
                num_keep: Optional[int] = None) -> jax.Array:
    """Training-time token dropping (masked_drop.py:17-43).

    Eval (or a skip draw, which the reference takes host-side with
    ``random.random() < skip_percentage`` — callers replicate that host-side)
    returns the input unchanged. ``mode='range'`` in the reference draws
    ``num_keep`` per call host-side; pass it via ``num_keep``.
    """
    if not training:
        return image_features
    if mode == "cls_only":
        return image_features[:, :1]
    if mode not in ("fixed", "range"):
        raise ValueError(f"Unexpected masked drop mode: {mode}")
    n_tokens = image_features.shape[1]
    keep = num_keep if num_keep is not None else int(n_tokens * ratio)
    noise = jax.random.uniform(rng, image_features.shape[:2])
    return random_masking(image_features, keep, noise)[0]


# ---------------------------------------------------------------------------
# perceiver (perceiver.py — flamingo-pytorch PerceiverResampler)
# ---------------------------------------------------------------------------

def _perceiver_attention(p: Params, x: jax.Array, latents: jax.Array,
                         heads: int) -> jax.Array:
    """PerceiverAttention.forward (perceiver.py:44-71): latents query a
    concat of [media, latents]; biasless linears; LN eps 1e-5 (torch
    default); softmax over the stabilized scores."""
    x = _layer_norm(x, p["ln_media_s"], p["ln_media_b"], 1e-5)
    lat = _layer_norm(latents, p["ln_latents_s"], p["ln_latents_b"], 1e-5)
    inner = p["to_q"].shape[1]
    dim_head = inner // heads
    q = lat @ p["to_q"]                                       # (B, n, inner)
    kv_in = jnp.concatenate([x, lat], axis=-2)
    k, v = jnp.split(kv_in @ p["to_kv"], 2, axis=-1)

    def split_heads(t):
        B, n = t.shape[:2]
        return t.reshape(B, n, heads, dim_head).transpose(0, 2, 1, 3)

    q, k, v = map(split_heads, (q, k, v))
    q = q * (dim_head ** -0.5)
    sim = jnp.einsum("bhid,bhjd->bhij", q, k)
    sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v)
    B, _, n, _ = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(B, n, inner)
    return out @ p["to_out"]


def perceiver_resampler(p: Params, image_features: jax.Array,
                        heads: int = 8) -> jax.Array:
    """PerceiverResampler.forward (perceiver.py:120-155) for the builder's
    configuration: T = F = 1 (x[:, None, None] then squeeze), no frame/media
    time embeddings (the builder passes neither max_num_frames nor
    max_num_media). Returns (B, num_latents, D)."""
    B = image_features.shape[0]
    latents = jnp.broadcast_to(p["latents"], (B, *p["latents"].shape))
    for layer in p["layers"]:
        latents = _perceiver_attention(layer["attn"], image_features, latents,
                                       heads) + latents
        ff = layer["ff"]
        h = _layer_norm(latents, ff["ln_s"], ff["ln_b"], 1e-5)
        h = jax.nn.gelu(h @ ff["w1"], approximate=False) @ ff["w2"]
        latents = h + latents
    return _layer_norm(latents, p["norm_s"], p["norm_b"], 1e-5)


def init_perceiver(key: jax.Array, dim: int, depth: int = 3,
                   num_latents: int = 32, ff_mult: int = 4,
                   dim_head: int = 64, heads: int = 8,
                   dtype=jnp.float32) -> Params:
    inner = dim_head * heads
    keys = jax.random.split(key, depth * 4 + 1)
    layers = []
    for i in range(depth):
        k = keys[i * 4:(i + 1) * 4]
        layers.append({
            "attn": {
                "ln_media_s": jnp.ones((dim,), dtype),
                "ln_media_b": jnp.zeros((dim,), dtype),
                "ln_latents_s": jnp.ones((dim,), dtype),
                "ln_latents_b": jnp.zeros((dim,), dtype),
                "to_q": 0.02 * jax.random.normal(k[0], (dim, inner), dtype),
                "to_kv": 0.02 * jax.random.normal(k[1], (dim, 2 * inner), dtype),
                "to_out": 0.02 * jax.random.normal(k[2], (inner, dim), dtype),
            },
            "ff": {
                "ln_s": jnp.ones((dim,), dtype),
                "ln_b": jnp.zeros((dim,), dtype),
                "w1": 0.02 * jax.random.normal(k[3], (dim, dim * ff_mult), dtype),
                "w2": 0.02 * jax.random.normal(
                    jax.random.fold_in(k[3], 1), (dim * ff_mult, dim), dtype),
            },
        })
    return {
        "latents": jax.random.normal(keys[-1], (num_latents, dim), dtype),
        "layers": layers,
        "norm_s": jnp.ones((dim,), dtype),
        "norm_b": jnp.zeros((dim,), dtype),
    }


# ---------------------------------------------------------------------------
# qformer (qformer.py — BLIP-2 query-only BERT-base resampler)
# ---------------------------------------------------------------------------

_BERT_EPS = 1e-12


def _bert_attention(p: Params, h: jax.Array, kv: jax.Array,
                    num_heads: int) -> jax.Array:
    """BertAttention: self or cross attention + BertSelfOutput
    (qformer.py:107-263): dense(context) residual-added and LayerNorm'd."""
    B, L, D = h.shape
    dh = D // num_heads

    def split_heads(t):
        return t.reshape(B, -1, num_heads, dh).transpose(0, 2, 1, 3)

    q = split_heads(h @ p["wq"] + p["bq"])
    k = split_heads(kv @ p["wk"] + p["bk"])
    v = split_heads(kv @ p["wv"] + p["bv"])
    scores = jnp.einsum("bhid,bhjd->bhij", q, k) / (dh ** 0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhij,bhjd->bhid", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, D)
    out = ctx @ p["wo"] + p["bo"]
    return _layer_norm(out + h, p["ln_s"], p["ln_b"], _BERT_EPS)


def qformer_resampler(p: Params, image_features: jax.Array,
                      num_heads: int = 12) -> jax.Array:
    """Qformer.forward (qformer.py Qformer class): ln_vision on the tower
    tokens, learned query tokens through a query-only BERT (word/position
    embeddings deleted; per layer: self-attn over queries, cross-attn to the
    vision tokens on layers with one, query FFN). Returns
    (B, num_latents, 768)."""
    x = _layer_norm(image_features, p["ln_vision_s"], p["ln_vision_b"], 1e-5)
    B = x.shape[0]
    h = jnp.broadcast_to(p["query_tokens"], (B, *p["query_tokens"].shape))
    h = _layer_norm(h, p["emb_ln_s"], p["emb_ln_b"], _BERT_EPS)
    for layer in p["layers"]:
        h = _bert_attention(layer["self"], h, h, num_heads)
        if "cross" in layer:
            h = _bert_attention(layer["cross"], h, x, num_heads)
        ffn = layer["ffn"]
        inter = jax.nn.gelu(h @ ffn["w1"] + ffn["b1"], approximate=False)
        h = _layer_norm(inter @ ffn["w2"] + ffn["b2"] + h,
                        ffn["ln_s"], ffn["ln_b"], _BERT_EPS)
    return h


def init_qformer(key: jax.Array, encoder_width: int, num_latents: int = 32,
                 cross_attention_freq: int = 2, num_layers: int = 12,
                 hidden: int = 768, intermediate: int = 3072,
                 dtype=jnp.float32) -> Params:
    """Random init mirroring build_Qformer (qformer.py Qformer class):
    bert-base geometry, cross-attention on layers where
    ``layer % cross_attention_freq == 0``."""
    def attn_params(k, kv_dim):
        ks = jax.random.split(k, 4)
        return {
            "wq": 0.02 * jax.random.normal(ks[0], (hidden, hidden), dtype),
            "bq": jnp.zeros((hidden,), dtype),
            "wk": 0.02 * jax.random.normal(ks[1], (kv_dim, hidden), dtype),
            "bk": jnp.zeros((hidden,), dtype),
            "wv": 0.02 * jax.random.normal(ks[2], (kv_dim, hidden), dtype),
            "bv": jnp.zeros((hidden,), dtype),
            "wo": 0.02 * jax.random.normal(ks[3], (hidden, hidden), dtype),
            "bo": jnp.zeros((hidden,), dtype),
            "ln_s": jnp.ones((hidden,), dtype),
            "ln_b": jnp.zeros((hidden,), dtype),
        }

    keys = jax.random.split(key, num_layers * 3 + 1)
    layers = []
    for i in range(num_layers):
        layer = {
            "self": attn_params(keys[3 * i], hidden),
            "ffn": {
                "w1": 0.02 * jax.random.normal(keys[3 * i + 1],
                                               (hidden, intermediate), dtype),
                "b1": jnp.zeros((intermediate,), dtype),
                "w2": 0.02 * jax.random.normal(
                    jax.random.fold_in(keys[3 * i + 1], 1),
                    (intermediate, hidden), dtype),
                "b2": jnp.zeros((hidden,), dtype),
                "ln_s": jnp.ones((hidden,), dtype),
                "ln_b": jnp.zeros((hidden,), dtype),
            },
        }
        if i % cross_attention_freq == 0:
            layer["cross"] = attn_params(keys[3 * i + 2], encoder_width)
        layers.append(layer)
    return {
        "ln_vision_s": jnp.ones((encoder_width,), dtype),
        "ln_vision_b": jnp.zeros((encoder_width,), dtype),
        "query_tokens": jnp.zeros((num_latents, hidden), dtype),
        "emb_ln_s": jnp.ones((hidden,), dtype),
        "emb_ln_b": jnp.zeros((hidden,), dtype),
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# dispatch (builder.py:21-32)
# ---------------------------------------------------------------------------

def apply_resampler(resampler_type: Optional[str], p: Params,
                    image_features: jax.Array, *,
                    images_hw: Tuple[int, int] = (384, 384),
                    mode: Optional[str] = None, stride: int = 2,
                    rng: Optional[jax.Array] = None, ratio: float = 0.5,
                    training: bool = False) -> jax.Array:
    """build_vision_resampler dispatch; ``None`` -> identity.

    ``mode`` namespaces differ per resampler: spatial_pool defaults to
    'average' (mm_spatial_pool_mode) and masked_drop to 'fixed'
    (mm_mask_drop_mode) — matching each reference module's default."""
    if resampler_type in (None, "identity"):
        return image_features
    if resampler_type == "spatial_pool":
        return spatial_pool(p, image_features, images_hw, mode or "average",
                            stride)
    if resampler_type == "masked_drop":
        return masked_drop(image_features, rng, mode=mode or "fixed",
                           ratio=ratio, training=training)
    if resampler_type == "perceiver":
        return perceiver_resampler(p, image_features)
    if resampler_type == "qformer":
        return qformer_resampler(p, image_features)
    raise ValueError(f"Unknown resampler type: {resampler_type}")
