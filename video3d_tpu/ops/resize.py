"""Torch-semantics image resizes as precomputed weight matrices.

The reference's S2 multi-scale tower (clip_encoder.py:125-176) resizes
images with ``F.interpolate(mode='bicubic')`` (align_corners=False, no
antialias) and merges feature maps with ``F.interpolate(mode='area')``
(the s2wrapper ``multiscale_forward`` recipe). Both are separable linear
maps for static sizes, so on TPU we precompute the (out, in) weight
matrix once per size pair and apply the resize as two matmuls —
MXU-friendly and bit-matching torch's CPU kernels to float tolerance.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch's cubic_convolution weights (upsample_bicubic2d, A=-0.75)."""
    x = np.abs(x)
    out = np.zeros_like(x)
    m1 = x <= 1.0
    out[m1] = ((a + 2.0) * x[m1] - (a + 3.0)) * x[m1] * x[m1] + 1.0
    m2 = (x > 1.0) & (x < 2.0)
    out[m2] = ((a * x[m2] - 5.0 * a) * x[m2] + 8.0 * a) * x[m2] - 4.0 * a
    return out


@functools.lru_cache(maxsize=64)
def bicubic_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) f32 matrix reproducing torch
    ``F.interpolate(mode='bicubic', align_corners=False)`` along one axis
    (edge taps clamped, i.e. replicate padding)."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    o = np.arange(out_size, dtype=np.float64)
    center = (o + 0.5) * scale - 0.5
    idx = np.floor(center).astype(np.int64)
    t = center - idx
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for k in range(-1, 3):
        tap = np.clip(idx + k, 0, in_size - 1)
        wk = _cubic_kernel(k - t)
        np.add.at(w, (np.arange(out_size), tap), wk)
    return w.astype(np.float32)


def bicubic_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bicubic-resize the trailing two axes of ``x`` (..., H, W) with torch
    ``F.interpolate(mode='bicubic')`` semantics. Computes in f32."""
    h, w = x.shape[-2], x.shape[-1]
    wh = jnp.asarray(bicubic_resize_matrix(h, out_h))
    ww = jnp.asarray(bicubic_resize_matrix(w, out_w))
    y = jnp.einsum("oh,...hw->...ow", wh, x.astype(jnp.float32))
    return jnp.einsum("pw,...hw->...hp", ww, y)


def area_downsample(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """torch ``F.interpolate(mode='area')`` on the trailing two (square)
    axes for an integer downsample factor — exactly mean pooling."""
    h = x.shape[-1]
    if h == out_size:
        return x
    if h % out_size != 0:
        raise ValueError(f"area_downsample needs an integer factor, got {h}->{out_size}")
    f = h // out_size
    shape = x.shape[:-2] + (out_size, f, out_size, f)
    return x.reshape(shape).mean(axis=(-3, -1))
