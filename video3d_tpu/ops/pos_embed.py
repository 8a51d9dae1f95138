"""3D sinusoidal world-position embedding.

Reproduces ``PositionEmbeddingSine3D`` (/root/reference/llava/model/
position_encoding.py:5-49) as a pure function: per-axis sin/cos over
``num_feats = D // (3 * n_points)`` frequencies, interleaved
[sin(p0), cos(p1), sin(p2), ...], concatenated [x, y, z] (xyz blocks per
point for n_points > 1), zero-padded up to the embedding size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _interleave_sin_cos(pos: jax.Array, num_feats: int) -> jax.Array:
    """pos: (..., num_feats) scaled positions -> (..., out) interleaved.

    Matches torch.stack((p[..., 0::2].sin(), p[..., 1::2].cos()), -1).flatten:
    out[2k] = sin(p[2k]), out[2k+1] = cos(p[2k+1]). For odd num_feats the
    reference zero-pads p to even length, interleaves, then drops the last
    element, yielding an odd-length output ending in sin(p[-1]).
    """
    if num_feats % 2 != 0:
        pad = jnp.zeros(pos.shape[:-1] + (1,), dtype=pos.dtype)
        p = jnp.concatenate([pos, pad], axis=-1)
        out = jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1)
        out = out.reshape(pos.shape[:-1] + (num_feats + 1,))
        return out[..., :-1]
    out = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1)
    return out.reshape(pos.shape[:-1] + (num_feats,))


@functools.partial(jax.jit, static_argnames=("embedding_size", "temperature", "n_points"))
def sin3d_position_embedding(coords: jax.Array, embedding_size: int,
                             temperature: float = 10000.0,
                             n_points: int = 1) -> jax.Array:
    """Compute the sinusoidal 3D position embedding.

    Args:
      coords: (B, N, 3) for n_points == 1, or (B, N, n_points, 3).
      embedding_size: target hidden size D (e.g. 3584).
    Returns:
      (B, N, D) float embedding; the first 3*n_points*num_feats channels hold
      the PE, the remainder is zero (reference zero-pads, :46-47).
    """
    num_feats = embedding_size // (3 * n_points)
    if n_points > 1:
        coords = coords.reshape(coords.shape[0], -1, 3)  # (B, N*n_points, 3)
    coords = coords.astype(jnp.float32)
    B, N, _ = coords.shape

    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)

    parts = []
    for axis in range(3):
        pos = coords[:, :, axis][..., None] / dim_t      # (B, N, num_feats)
        parts.append(_interleave_sin_cos(pos, num_feats))
    pe = jnp.concatenate(parts, axis=-1)                  # (B, N, 3*num_feats)

    if n_points > 1:
        pe = pe.reshape(B, N // n_points, n_points * 3 * num_feats)

    pad = embedding_size - pe.shape[-1]
    if pad > 0:
        pe = jnp.pad(pe, ((0, 0), (0, 0), (0, pad)))
    return pe


def mlp_position_embedding(params, coords: jax.Array, n_points: int = 1) -> jax.Array:
    """``PositionEmbeddingMLP`` (position_encoding.py:52-84): 3 -> 512
    Linear, LayerNorm, ReLU, 512 -> D Linear.

    Args:
      params: dict with w1 (3,512), b1 (512,), ln_scale, ln_bias (512,),
              w2 (512,D), b2 (D,).
      coords: (B, N, 3).
    Returns:
      (B, N, D).
    """
    if n_points > 1:
        coords = coords.reshape(coords.shape[0], -1, 3)
    h = coords.astype(params["w1"].dtype) @ params["w1"] + params["b1"]
    mean = h.mean(axis=-1, keepdims=True)
    var = ((h - mean) ** 2).mean(axis=-1, keepdims=True)
    h = (h - mean) * jax.lax.rsqrt(var + 1e-5) * params["ln_scale"] + params["ln_bias"]
    h = jax.nn.relu(h)
    return h @ params["w2"] + params["b2"]


def init_mlp_position_embedding(key: jax.Array, embedding_size: int,
                                hidden_size: int = 512, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    lim1 = 1.0 / jnp.sqrt(3.0)
    lim2 = 1.0 / jnp.sqrt(hidden_size)
    return {
        "w1": jax.random.uniform(k1, (3, hidden_size), dtype, -lim1, lim1),
        "b1": jnp.zeros((hidden_size,), dtype),
        "ln_scale": jnp.ones((hidden_size,), dtype),
        "ln_bias": jnp.zeros((hidden_size,), dtype),
        "w2": jax.random.uniform(k2, (hidden_size, embedding_size), dtype, -lim2, lim2),
        "b2": jnp.zeros((embedding_size,), dtype),
    }
