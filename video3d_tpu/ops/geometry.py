"""Pure-jnp 3D geometry: depth back-projection, coordinate resizing, patch
pooling, and voxel discretization.

These are the load-bearing numerics of the scene-as-video pipeline. Each
function documents the reference formula it reproduces (file:line into
/root/reference/). All functions are shape-polymorphic pure jnp, jit- and
vmap-friendly, and run on both CPU (tests) and TPU.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def compose_poses(axis_align_matrix: jax.Array, cam2world: jax.Array) -> jax.Array:
    """Compose the scene axis-alignment with per-frame camera-to-world poses.

    Reference: llava/video_utils.py:227 (``axis_align_matrix @ pose``).

    Args:
      axis_align_matrix: (4, 4)
      cam2world: (V, 4, 4) per-frame poses.
    Returns:
      (V, 4, 4) world-from-camera transforms in axis-aligned frame.
    """
    return jnp.einsum("ij,vjk->vik", axis_align_matrix, cam2world,
                      precision=jax.lax.Precision.HIGHEST)


def unproject(intrinsics: jax.Array, poses: jax.Array, depths: jax.Array,
              depth_scale: float = 1000.0) -> jax.Array:
    """Pinhole back-projection of depth maps to world xyz.

    Reference: llava/video_utils.py:38-68 —
      z = d / 1000; x = (u - cx) z / fx; y = (v - cy) z / fy;
      world = pose @ [x, y, z, 1]; divide by w.

    Args:
      intrinsics: (V, 4, 4) or (4, 4) depth camera intrinsics.
      poses: (V, 4, 4) world-from-camera (already axis-aligned).
      depths: (V, H, W) raw depth in millimeters (uint16/int32/float ok).
    Returns:
      (V, H, W, 3) float32 world coordinates. Zero-depth pixels map to the
      camera origin column of the pose, exactly as in the reference.
    """
    depths = depths.astype(jnp.float32)
    V, H, W = depths.shape
    if intrinsics.ndim == 2:
        intrinsics = jnp.broadcast_to(intrinsics, (V, 4, 4))
    intrinsics = intrinsics.astype(jnp.float32)
    poses = poses.astype(jnp.float32)

    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)  # column index
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)  # row index

    fx = intrinsics[:, 0, 0][:, None, None]
    fy = intrinsics[:, 1, 1][:, None, None]
    cx = intrinsics[:, 0, 2][:, None, None]
    cy = intrinsics[:, 1, 2][:, None, None]

    z = depths / depth_scale                        # (V, H, W)
    x = (u[None] - cx) * z / fx
    y = (v[None] - cy) * z / fy

    cam = jnp.stack([x, y, z, jnp.ones_like(z)], axis=-1)      # (V, H, W, 4)
    # Geometry demands true f32: force full-precision accumulation on the MXU.
    world = jnp.einsum("vij,vhwj->vhwi", poses, cam,
                       precision=jax.lax.Precision.HIGHEST)    # (V, H, W, 4)
    return world[..., :3] / world[..., 3:4]


def resize_nearest(arr: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize matching OpenCV ``INTER_NEAREST``.

    Reference: llava/video_utils.py:295,300 uses
    ``cv2.resize(coords, (w, h), interpolation=cv2.INTER_NEAREST)``, whose
    source index rule is ``src = floor(dst * src_size / dst_size)`` (no +0.5
    center offset), clipped to the valid range.

    Args:
      arr: (..., H, W, C) or (H, W, C) array (channels last).
      out_hw: (new_h, new_w).
    Returns:
      array resized over the two spatial dims.
    """
    *lead, H, W, C = arr.shape
    new_h, new_w = out_hw
    src_rows = jnp.clip((jnp.arange(new_h) * H) // new_h, 0, H - 1)
    src_cols = jnp.clip((jnp.arange(new_w) * W) // new_w, 0, W - 1)
    out = jnp.take(arr, src_rows, axis=-3)
    out = jnp.take(out, src_cols, axis=-2)
    return out


def center_crop(arr: jax.Array, crop_hw: Tuple[int, int]) -> jax.Array:
    """Center crop over the (-3, -2) spatial dims (channels last).

    Reference crop-box arithmetic: llava/video_utils.py:302-308 —
    ``left = (new_width - crop)//2``, ``top = (new_height - crop)//2``.
    """
    *lead, H, W, C = arr.shape
    ch, cw = crop_hw
    top = (H - ch) // 2
    left = (W - cw) // 2
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(arr, top, top + ch, axis=-3), left, left + cw, axis=-2)


def average_coordinate_in_patch(world_coords: jax.Array, patch_size: int = 27) -> jax.Array:
    """Reduce per-pixel world coords to per-patch means.

    Reference: llava_arch.py:213-223 — trim (H, W) to multiples of
    ``patch_size`` by dropping the last 6 rows/cols (384 -> 378), then
    avg-pool k=27 s=27 to a 14x14 grid.

    Args:
      world_coords: (V, H, W, 3).
    Returns:
      (V, H//ps, W//ps, 3) after trimming H, W down to multiples of ps.
    """
    V, H, W, D = world_coords.shape
    gh, gw = H // patch_size, W // patch_size
    wc = world_coords[:, : gh * patch_size, : gw * patch_size, :]
    wc = wc.reshape(V, gh, patch_size, gw, patch_size, D)
    return wc.mean(axis=(2, 4))


def minmax_coordinate_in_patch(world_coords: jax.Array, patch_size: int = 27) -> jax.Array:
    """Per-patch (min, max) coordinate pair. Reference: llava_arch.py:225-239.

    Returns:
      (V, gh, gw, 2, 3) with [..., 0, :]=min and [..., 1, :]=max.
    """
    V, H, W, D = world_coords.shape
    gh, gw = H // patch_size, W // patch_size
    wc = world_coords[:, : gh * patch_size, : gw * patch_size, :]
    wc = wc.reshape(V, gh, patch_size, gw, patch_size, D)
    mx = wc.max(axis=(2, 4))
    mn = wc.min(axis=(2, 4))
    return jnp.stack([mn, mx], axis=3)


def sample_n_points(world_coords: jax.Array, n_points: int = 9,
                    patch_size: int = 27) -> jax.Array:
    """Sample a sparse grid of coordinates per patch.

    Reference: llava_arch.py:241-257 — within each 27x27 patch take the 3x3
    grid at offsets 4::9 (9 points); n=5 keeps every other of those; n=1
    keeps the center point.

    Returns:
      (V, gh, gw, n_points, 3) for n in {9, 5}; (V, gh, gw, 3) for n=1.
    """
    V, H, W, D = world_coords.shape
    gh, gw = H // patch_size, W // patch_size
    wc = world_coords[:, : gh * patch_size, : gw * patch_size, :]
    wc = wc.reshape(V, gh, patch_size, gw, patch_size, D).transpose(0, 1, 3, 2, 4, 5)
    nine = wc[:, :, :, 4::9, 4::9, :].reshape(V, gh, gw, 9, D)
    if n_points == 9:
        return nine
    if n_points == 5:
        return nine[:, :, :, 0::2, :]
    if n_points == 1:
        return nine[:, :, :, 4, :]
    raise NotImplementedError(f"n_points={n_points}")


def discrete_coords(world_coords: jax.Array,
                    min_xyz_range: Sequence[float],
                    max_xyz_range: Sequence[float],
                    voxel_size: float) -> jax.Array:
    """Clamp to the scene range and discretize into voxel indices.

    Reference: llava_arch.py:259-272 —
      clamp(coords, min, max); ((coords - min) / voxel_size).round()
    Returned as float (the reference keeps float tensors of rounded values),
    gradient-stopped like the reference's ``.detach()``.
    """
    mn = jnp.asarray(min_xyz_range, dtype=world_coords.dtype)
    mx = jnp.asarray(max_xyz_range, dtype=world_coords.dtype)
    wc = jnp.clip(world_coords, mn, mx)
    return jax.lax.stop_gradient(jnp.round((wc - mn) / voxel_size))


def bilinear_pool_2d(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize matching ``F.interpolate(mode='bilinear')`` with
    ``align_corners=False``: src = (dst + 0.5) * (in/out) - 0.5, edge-clamped.

    Reference: llava_arch.py:201-204 (the 27x27 -> 14x14 token pooling).

    Args:
      x: (..., H, W, C) channels-last.
    Returns:
      (..., out_h, out_w, C).
    """
    *lead, H, W, C = x.shape
    out_h, out_w = out_hw

    def axis_weights(in_size: int, out_size: int):
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (in_size / out_size) - 0.5
        src = jnp.clip(src, 0.0, in_size - 1.0)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_size - 1)
        w_hi = src - lo.astype(jnp.float32)
        return lo, hi, w_hi

    r_lo, r_hi, r_w = axis_weights(H, out_h)
    c_lo, c_hi, c_w = axis_weights(W, out_w)

    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    top = jnp.take(x, r_lo, axis=-3)
    bot = jnp.take(x, r_hi, axis=-3)
    rows = top + (bot - top) * r_w[:, None, None]
    left = jnp.take(rows, c_lo, axis=-2)
    right = jnp.take(rows, c_hi, axis=-2)
    return (left + (right - left) * c_w[:, None]).astype(in_dtype)


def pool_2d_tokens(tokens: jax.Array, side: int, stride: int = 2,
                   mode: str = "bilinear") -> jax.Array:
    """Pool per-frame patch tokens on their 2D grid (729 -> 196).

    Reference: llava_arch.py:191-210 (``get_2dPool``): view (V, 27, 27, D),
    pool with the given mode; bilinear uses ceil(27/2)=14 output.

    Args:
      tokens: (V, side*side, D).
    Returns:
      (V, out*out, D) with out = ceil(side/stride) for bilinear, or
      side//stride for avg/max (matching torch pooling semantics).
    """
    V, N, D = tokens.shape
    x = tokens.reshape(V, side, side, D)
    if mode == "bilinear":
        out = -(-side // stride)
        y = bilinear_pool_2d(x, (out, out))
    elif mode == "average":
        out = side // stride
        y = x[:, : out * stride, : out * stride, :].reshape(V, out, stride, out, stride, D).mean(axis=(2, 4))
    elif mode == "max":
        out = side // stride
        y = x[:, : out * stride, : out * stride, :].reshape(V, out, stride, out, stride, D).max(axis=(2, 4))
    else:
        raise ValueError(f"Unexpected pool mode: {mode}")
    return y.reshape(V, -1, D)
