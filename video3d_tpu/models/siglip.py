"""SigLIP vision tower (so400m-patch14-384) as pure-functional JAX.

Mirrors the behavior of the reference tower (/root/reference/llava/model/
multimodal_encoder/siglip_encoder.py): 27-layer ViT with the last encoder
layer deleted (:570-571), returning the raw hidden state of the final kept
layer — no post-layernorm, no pooling head (:576-589). Patch embedding is a
14x14/stride-14 conv, which we lower to a single patchify-reshape + matmul so
the whole embed step is one large MXU matmul instead of a convolution.

Param pytree layout (all matrices stored (in, out) for ``x @ w``):
  patch_embed: {w: (patch*patch*3, D) flattened in (c, kh, kw) order, b: (D,)}
  pos_embed: (num_patches, D)
  layers: list of dicts:
    ln1: {scale, bias}; attn: {wq,bq,wk,bk,wv,bv,wo,bo}; ln2; mlp: {w1,b1,w2,b2}
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from video3d_tpu.config import VisionConfig

Params = Dict[str, Any]


def _layer_norm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def gelu_tanh(x):
    """'gelu_pytorch_tanh' activation (siglip_encoder.py hidden_act)."""
    return jax.nn.gelu(x, approximate=True)


def patchify(pixel_values: jax.Array, patch_size: int) -> jax.Array:
    """(B, 3, H, W) NCHW -> (B, num_patches, 3*ps*ps) in (c, kh, kw) order,
    matching an HF conv kernel flattened as (out, in*kh*kw). A stride-ps
    valid conv ignores trailing pixels when ps doesn't divide H (384 -> 27
    patches of 14, last 6 px dropped), so crop first."""
    B, C, H, W = pixel_values.shape
    gh, gw = H // patch_size, W // patch_size
    x = pixel_values[:, :, : gh * patch_size, : gw * patch_size]
    x = x.reshape(B, C, gh, patch_size, gw, patch_size)
    x = x.transpose(0, 2, 4, 1, 3, 5)              # (B, gh, gw, C, ps, ps)
    return x.reshape(B, gh * gw, C * patch_size * patch_size)


def attention(p: Params, x: jax.Array, num_heads: int,
              key_bias: jax.Array | None = None) -> jax.Array:
    """Bidirectional MHA over the patch tokens.

    The attention core keeps the XLA einsum form. Measured negative result
    (scripts/bench/tower_profile.py, r3, on chip): routing this through the
    Pallas flash kernel with the head dim lane-padded 72 -> 128 ran the
    8-frame tower batch at 69.4 ms vs 47.0 ms for the einsum — the 1.8x
    padded-FLOP overhead at hd = 72 outweighs keeping the (B, H, N, N)
    score tensor out of HBM at N = 729. (pad_seq_to=768 and fused QKV were
    also measured slower: 52.7 / 49.1 ms.) The einsum also lets GSPMD
    partition the tower freely under a training mesh. Projections route
    through quant.matmul so the tower supports int8 / w8a8 serving.

    ``key_bias`` (N,) is an additive pre-softmax score bias used by the
    padded-sequence path to mask pad keys (-1e30 -> exp == 0).
    """
    from video3d_tpu.models.quant import matmul as _mm

    B, N, D = x.shape
    hd = D // num_heads
    q = (_mm(x, p["wq"]) + p["bq"]).reshape(B, N, num_heads, hd)
    k = (_mm(x, p["wk"]) + p["bk"]).reshape(B, N, num_heads, hd)
    v = (_mm(x, p["wv"]) + p["bv"]).reshape(B, N, num_heads, hd)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
    scores = scores.astype(jnp.float32)
    if key_bias is not None:
        scores = scores + key_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, N, D)
    return _mm(out, p["wo"]) + p["bo"]


def encoder_layer(p: Params, x: jax.Array, cfg: VisionConfig,
                  key_bias: jax.Array | None = None) -> jax.Array:
    from video3d_tpu.models.quant import matmul as _mm

    h = _layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], cfg.layer_norm_eps)
    x = x + attention(p["attn"], h, cfg.num_attention_heads, key_bias)
    h = _layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], cfg.layer_norm_eps)
    h = _mm(gelu_tanh(_mm(h, p["mlp"]["w1"]) + p["mlp"]["b1"]), p["mlp"]["w2"]) + p["mlp"]["b2"]
    return x + h


@functools.partial(jax.jit, static_argnames=("cfg", "remat", "pad_seq_to"))
def vision_tower_forward(params: Params, pixel_values: jax.Array,
                         cfg: VisionConfig, remat: bool = False,
                         pad_seq_to: int | None = None) -> jax.Array:
    """Run the tower.

    Args:
      pixel_values: (B, 3, image_size, image_size), normalized.
      pad_seq_to: optional MXU-aligned sequence length (e.g. 768 for the
        729-patch so400m). The patch sequence is zero-padded to this length
        before the encoder stack and sliced back after; pad keys are masked
        out of every softmax (-1e30 bias), so real-token outputs equal the
        unpadded run (exp(pad) == 0 exactly; pad-key matmul columns
        contribute exact zeros — the MXU pads contractions to lane
        multiples internally either way). tests/test_siglip_pad.py asserts
        equality on the unpadded slice.
    Returns:
      (B, num_patches, hidden) features of the last kept encoder layer
      (reference: hidden_states[-1] with the 27th layer removed).
    """
    x = patchify(pixel_values, cfg.patch_size).astype(params["patch_embed"]["w"].dtype)
    x = x @ params["patch_embed"]["w"] + params["patch_embed"]["b"]
    x = x + params["pos_embed"]

    key_bias = None
    n_real = x.shape[1]
    if pad_seq_to is not None and pad_seq_to > n_real:
        x = jnp.pad(x, ((0, 0), (0, pad_seq_to - n_real), (0, 0)))
        key_bias = jnp.where(jnp.arange(pad_seq_to) < n_real, 0.0, -1e30)

    layer_fn = encoder_layer
    if remat:
        layer_fn = jax.checkpoint(encoder_layer, static_argnums=(2,))
    for lp in params["layers"]:
        x = layer_fn(lp, x, cfg, key_bias)
    return x[:, :n_real] if x.shape[1] != n_real else x


def init_vision_tower(key: jax.Array, cfg: VisionConfig, dtype=jnp.float32) -> Params:
    """Random init with HF-compatible shapes (for tests / from-scratch)."""
    D, I = cfg.hidden_size, cfg.intermediate_size
    pdim = 3 * cfg.patch_size * cfg.patch_size
    keys = jax.random.split(key, 2 + cfg.num_hidden_layers)

    def linear(k, din, dout):
        lim = (1.0 / din) ** 0.5
        return jax.random.uniform(k, (din, dout), dtype, -lim, lim)

    def layer(k):
        ks = jax.random.split(k, 6)
        return {
            "ln1": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
            "attn": {
                "wq": linear(ks[0], D, D), "bq": jnp.zeros((D,), dtype),
                "wk": linear(ks[1], D, D), "bk": jnp.zeros((D,), dtype),
                "wv": linear(ks[2], D, D), "bv": jnp.zeros((D,), dtype),
                "wo": linear(ks[3], D, D), "bo": jnp.zeros((D,), dtype),
            },
            "ln2": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
            "mlp": {
                "w1": linear(ks[4], D, I), "b1": jnp.zeros((I,), dtype),
                "w2": linear(ks[5], I, D), "b2": jnp.zeros((D,), dtype),
            },
        }

    return {
        "patch_embed": {"w": linear(keys[0], pdim, D), "b": jnp.zeros((D,), dtype)},
        "pos_embed": 0.02 * jax.random.normal(keys[1], (cfg.num_patches, D), dtype),
        "layers": [layer(keys[2 + i]) for i in range(cfg.num_hidden_layers)],
    }
