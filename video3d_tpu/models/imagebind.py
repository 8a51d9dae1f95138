"""Native ImageBind-Huge vision tower.

The reference wraps the external ``imagebind`` package
(multimodal_encoder/imagebind.py:27-33: ``imagebind_model.imagebind_huge``)
and exposes its VISION embedding through the tower interface
(imagebind.py:41-57): images in, a single L2-normalized 1024-dim joint
embedding per image out, shaped ``(B, 1, 1024)`` (the wrapper unsqueezes
the 2-D embedding; hidden_size property == 1024, imagebind.py:71-73).

This module re-implements that vision path natively so the tower works
without the external package. Architecture (from the public
facebookresearch/ImageBind model definition, ``imagebind_huge``):

  * preprocessor: images are padded to a 2-frame clip (PadIm2Video
    ``repeat``), patchified by a bias-free ``Conv3d(3→1280, k=(2,14,14),
    s=(2,14,14))``, a CLS token is prepended and a learned (1, 257, 1280)
    spatio-temporal pos-embedding added.
  * trunk: ``LayerNorm(1280)`` pre-layer, then 32 pre-norm blocks of
    ``nn.MultiheadAttention`` (packed in_proj) + exact-GELU MLP (4x),
    width 1280 / 16 heads, eps 1e-6, no layer-scale.
  * head: ``LayerNorm(1280) → token 0 → Linear(1280→1024, bias=False)``,
    postprocessed by L2 normalization (the VISION postprocessor).

TPU note: because the two "video" frames are identical copies of the image,
the temporal Conv3d collapses exactly to a 2-D patchify with the kernel
summed over its temporal axis — the converter folds
``w3d.sum(time)`` so the forward is a single MXU matmul over patches, with
no 5-D conv anywhere.

The audio modality path (imagebind.py:43-48) additionally needs
torchaudio mel-clip preprocessing (``load_and_transform_audio_data``) and
the audio trunk; it is only reachable through a dict-input branch no
Video-3D-LLM config exercises and stays unimplemented (explicit raise).

Numerical parity with the released ImageBind checkpoint cannot be verified
in this environment (the package and weights are absent — true for the
reference too); instead the whole chain is golden-tested against a torch
twin built from torch primitives only, using the official state-dict
naming (tests/test_imagebind.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass(frozen=True)
class ImageBindConfig:
    """imagebind_huge vision trunk dimensions."""

    hidden_size: int = 1280
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    mlp_ratio: int = 4
    patch_size: int = 14
    image_size: int = 224
    out_dim: int = 1024
    layer_norm_eps: float = 1e-6

    @classmethod
    def tiny(cls) -> "ImageBindConfig":
        return cls(hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=4, patch_size=14, image_size=28,
                   out_dim=16)


def _ln(x, p, eps):
    from video3d_tpu.models.siglip import _layer_norm

    return _layer_norm(x, p["scale"], p["bias"], eps)


def _block(p: Params, x: jax.Array, cfg: ImageBindConfig) -> jax.Array:
    """One SimpleTransformer BlockWithMasking (pre-norm, no layer-scale)."""
    from video3d_tpu.models.siglip import attention

    h = _ln(x, p["ln1"], cfg.layer_norm_eps)
    x = x + attention(p["attn"], h, cfg.num_attention_heads)
    h = _ln(x, p["ln2"], cfg.layer_norm_eps)
    h = jax.nn.gelu(h @ p["mlp"]["w1"] + p["mlp"]["b1"],
                    approximate=False) @ p["mlp"]["w2"] + p["mlp"]["b2"]
    return x + h


@functools.partial(jax.jit, static_argnames=("cfg",))
def imagebind_vision_forward(params: Params, pixel_values: jax.Array,
                             cfg: ImageBindConfig) -> jax.Array:
    """(B, 3, H, W) images -> (B, 1, out_dim) L2-normalized joint embedding
    (the ImageBindWrapper.forward vision branch, imagebind.py:49-54 with the
    2-D ``unsqueeze(1)`` applied)."""
    from video3d_tpu.models.siglip import patchify

    B = pixel_values.shape[0]
    x = patchify(pixel_values, cfg.patch_size).astype(
        params["patch_embed"]["w"].dtype)
    x = x @ params["patch_embed"]["w"]                    # folded Conv3d
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]
    x = _ln(x, params["pre_ln"], cfg.layer_norm_eps)
    for lp in params["layers"]:
        x = _block(lp, x, cfg)
    x = _ln(x, params["head_ln"], cfg.layer_norm_eps)
    emb = x[:, 0] @ params["head_proj"]["w"]              # SelectElement(0)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb[:, None, :]


def convert_imagebind(state, cfg: ImageBindConfig = ImageBindConfig(),
                      dtype=jnp.float32) -> Params:
    """Official ImageBind state-dict (``modality_preprocessors.vision.*`` /
    ``modality_trunks.vision.*`` / ``modality_heads.vision.*``) -> our
    pytree. The Conv3d stem weight (D, 3, 2, P, P) is summed over its
    temporal axis (exact: both frames are repeats of the image) and
    flattened to the patchify matmul layout; packed attention in_proj is
    split into q/k/v."""
    from video3d_tpu.models.weights import _to_np

    g = lambda k: _to_np(state[k])
    vec = lambda k: jnp.asarray(g(k), dtype)
    pre = "modality_preprocessors.vision."
    trunk = "modality_trunks.vision."
    head = "modality_heads.vision."

    w3d = g(pre + "rgbt_stem.proj.1.weight")      # (D, 3, 2, P, P)
    w2d = w3d.sum(axis=2)                         # (D, 3, P, P)
    D = w3d.shape[0]

    layers = []
    i = 0
    while f"{trunk}blocks.{i}.norm_1.weight" in state:
        p = f"{trunk}blocks.{i}."
        in_w = g(p + "attn.in_proj_weight")       # (3D, D)
        in_b = g(p + "attn.in_proj_bias")
        wq, wk, wv = in_w[:D], in_w[D:2 * D], in_w[2 * D:]
        bq, bk, bv = in_b[:D], in_b[D:2 * D], in_b[2 * D:]
        layers.append({
            "ln1": {"scale": vec(p + "norm_1.weight"),
                    "bias": vec(p + "norm_1.bias")},
            "attn": {
                "wq": jnp.asarray(wq.T, dtype), "bq": jnp.asarray(bq, dtype),
                "wk": jnp.asarray(wk.T, dtype), "bk": jnp.asarray(bk, dtype),
                "wv": jnp.asarray(wv.T, dtype), "bv": jnp.asarray(bv, dtype),
                "wo": jnp.asarray(g(p + "attn.out_proj.weight").T, dtype),
                "bo": vec(p + "attn.out_proj.bias"),
            },
            "ln2": {"scale": vec(p + "norm_2.weight"),
                    "bias": vec(p + "norm_2.bias")},
            "mlp": {
                "w1": jnp.asarray(g(p + "mlp.fc1.weight").T, dtype),
                "b1": vec(p + "mlp.fc1.bias"),
                "w2": jnp.asarray(g(p + "mlp.fc2.weight").T, dtype),
                "b2": vec(p + "mlp.fc2.bias"),
            },
        })
        i += 1

    return {
        "patch_embed": {"w": jnp.asarray(w2d.reshape(D, -1).T, dtype)},
        "cls_token": vec(pre + "cls_token").reshape(1, -1),
        "pos_embed": vec(pre + "pos_embedding_helper.pos_embed"),
        "pre_ln": {"scale": vec(trunk + "pre_transformer_layer.0.weight"),
                   "bias": vec(trunk + "pre_transformer_layer.0.bias")},
        "layers": layers,
        "head_ln": {"scale": vec(head + "0.weight"),
                    "bias": vec(head + "0.bias")},
        "head_proj": {"w": jnp.asarray(g(head + "2.weight").T, dtype)},
    }


def init_imagebind(rng, cfg: ImageBindConfig, dtype=jnp.float32) -> Params:
    """Random init (testing / random-weight benches)."""
    import numpy as np

    rs = np.random.RandomState(int(jax.random.randint(rng, (), 0, 2**31 - 1)))
    D, M = cfg.hidden_size, cfg.hidden_size * cfg.mlp_ratio
    n_tok = (cfg.image_size // cfg.patch_size) ** 2 + 1

    def w(*shape, scale=0.02):
        return jnp.asarray(rs.normal(0, scale, shape), dtype)

    def ln():
        return {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)}

    def layer():
        return {
            "ln1": ln(),
            "attn": {"wq": w(D, D), "bq": jnp.zeros((D,), dtype),
                     "wk": w(D, D), "bk": jnp.zeros((D,), dtype),
                     "wv": w(D, D), "bv": jnp.zeros((D,), dtype),
                     "wo": w(D, D), "bo": jnp.zeros((D,), dtype)},
            "ln2": ln(),
            "mlp": {"w1": w(D, M), "b1": jnp.zeros((M,), dtype),
                    "w2": w(M, D), "b2": jnp.zeros((D,), dtype)},
        }

    return {
        "patch_embed": {"w": w(3 * cfg.patch_size ** 2, D)},
        "cls_token": w(1, D),
        "pos_embed": w(1, n_tok, D),
        "pre_ln": ln(),
        "layers": [layer() for _ in range(cfg.num_hidden_layers)],
        "head_ln": ln(),
        "head_proj": {"w": w(D, cfg.out_dim)},
    }
