"""Fused depth -> world-xyz -> patch-pool -> voxelize Pallas kernel.

This is the reference's per-sample CPU hot loop (video_utils.py:196-238 +
llava_arch.py:213-272, SURVEY.md §3.1 "hot host path") turned into one TPU
kernel: each grid step owns one frame, keeps the resized depth tile in VMEM,
computes per-pixel camera-space coordinates on the VPU, reduces them to
per-patch means *before* the pose transform (the pose is affine, so
``mean(pose @ cam) == pose @ mean(cam)`` — 27x27x less matmul work and no
(V, 384, 384, 3) world-coordinate tensor ever touches HBM), applies the 4x4
pose on the MXU, then clamps/quantizes to voxel indices.

The nearest-neighbor resize + center-crop indexing (video_utils.py:296-308)
is folded in by computing source pixel coordinates in-kernel from iota with
the same ``floor(dst * src/dst_size)`` rule; the depth gather itself happens
outside the kernel (one cheap XLA gather on int32).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video3d_tpu.ops import geometry


def _src_maps(H: int, W: int, crop: int) -> Tuple[jax.Array, jax.Array]:
    """Source row/col (original-image pixel indices) for each cropped-resized
    output pixel, per the cv2 INTER_NEAREST + center-crop rule."""
    new_w = int(W * (crop / H))
    left = (new_w - crop) // 2
    rows = jnp.minimum(jnp.arange(crop) * H // crop, H - 1)          # (crop,)
    cols = jnp.minimum((jnp.arange(crop) + left) * W // new_w, W - 1)
    return rows.astype(jnp.int32), cols.astype(jnp.int32)


def _fused_kernel(scalars_ref, depth_ref, out_ref, *,
                  crop: int, patch: int, grid: int,
                  src_h: int, src_w: int, depth_scale: float,
                  min_xyz: Tuple[float, float, float],
                  max_xyz: Tuple[float, float, float], voxel: float,
                  discretize: bool):
    """One frame: depth (crop, crop) -> voxel ids (3, grid, grid).

    Everything stays rank-2 (Mosaic has no 2D<->4D reshapes): pooling is two
    MXU matmuls against an indicator matrix, the 4x4 pose transform is four
    scalar-broadcast linear combinations of the pooled channel tiles.
    """
    f = pl.program_id(0)
    fx = scalars_ref[f, 0]
    fy = scalars_ref[f, 1]
    cx = scalars_ref[f, 2]
    cy = scalars_ref[f, 3]

    def pose(i, j):
        return scalars_ref[f, 4 + 4 * i + j]

    new_w = int(src_w * (crop / src_h))
    left = (new_w - crop) // 2

    # original-image pixel coordinates of each resized pixel (floor rule)
    i = jax.lax.broadcasted_iota(jnp.int32, (crop, crop), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (crop, crop), 1)
    v = jnp.minimum(i * src_h // crop, src_h - 1).astype(jnp.float32)
    u = jnp.minimum((j + left) * src_w // new_w, src_w - 1).astype(jnp.float32)

    z = depth_ref[0].astype(jnp.float32) / depth_scale           # (crop, crop)
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy

    # Per-patch mean via P^T @ a @ P with indicator matrix
    # P[i, g] = 1/patch where i // patch == g (inside the pooled area);
    # the affine pose commutes with the mean, so pool first.
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (crop, grid), 0)
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (crop, grid), 1)
    P = jnp.where((rows_i // patch == cols_g) & (rows_i < grid * patch),
                  1.0 / patch, 0.0).astype(jnp.float32)          # (crop, grid)

    def pool(a):                                                 # -> (grid, grid)
        # HIGHEST precision: geometry needs true-f32 matmuls (the MXU
        # otherwise truncates f32 inputs to bf16 passes)
        ap = jax.lax.dot_general(a, P, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        return jax.lax.dot_general(P, ap, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    px, py, pz = pool(x), pool(y), pool(z)                       # (grid, grid)

    def affine(row):
        return (pose(row, 0) * px + pose(row, 1) * py
                + pose(row, 2) * pz + pose(row, 3))

    ww = affine(3)
    for a, wa in enumerate((affine(0), affine(1), affine(2))):
        w = wa / ww
        if discretize:
            w = jnp.clip(w, min_xyz[a], max_xyz[a])
            w = jnp.round((w - min_xyz[a]) / voxel)
        out_ref[0, a] = w


def fused_patch_voxel_coords(depths, intrinsic, poses, crop: int = 384,
                             grid: int = 14,
                             min_xyz: Tuple[float, float, float] = (-15, -15, -5),
                             max_xyz: Tuple[float, float, float] = (15, 15, 5),
                             voxel: float = 0.1, discretize: bool = True,
                             interpret: Optional[bool] = None) -> jax.Array:
    """(V, H, W) raw depths -> (V, grid, grid, 3) per-patch voxel indices.

    Equivalent to unproject -> resize_nearest -> center_crop ->
    average_coordinate_in_patch -> discrete_coords, fused per frame.
    Runs the Pallas kernel compiled on TPU; interpret mode on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fused_patch_voxel_coords(depths, intrinsic, poses, crop, grid,
                                     tuple(min_xyz), tuple(max_xyz), voxel,
                                     discretize, interpret)


@functools.partial(jax.jit, static_argnames=("crop", "grid", "discretize",
                                             "min_xyz", "max_xyz", "voxel",
                                             "interpret"))
def _fused_patch_voxel_coords(depths: jax.Array, intrinsic: jax.Array,
                              poses: jax.Array, crop: int, grid: int,
                              min_xyz, max_xyz, voxel: float,
                              discretize: bool, interpret: bool) -> jax.Array:
    V, H, W = depths.shape
    patch = crop // grid
    rows, cols = _src_maps(H, W, crop)
    dsel = jnp.take(jnp.take(depths, rows, axis=1), cols, axis=2)  # (V, crop, crop)
    dsel = dsel.astype(jnp.float32)

    if intrinsic.ndim == 2:
        intrinsic = jnp.broadcast_to(intrinsic, (V, 4, 4))
    # one SMEM scalar table per frame: fx, fy, cx, cy, then the 16 pose entries
    scalars = jnp.concatenate([
        jnp.stack([intrinsic[:, 0, 0], intrinsic[:, 1, 1],
                   intrinsic[:, 0, 2], intrinsic[:, 1, 2]], axis=1),
        poses.reshape(V, 16),
    ], axis=1).astype(jnp.float32)                                # (V, 20)

    kernel = functools.partial(
        _fused_kernel, crop=crop, patch=patch, grid=grid, src_h=H, src_w=W,
        depth_scale=1000.0, min_xyz=tuple(min_xyz), max_xyz=tuple(max_xyz),
        voxel=voxel, discretize=discretize)
    out = pl.pallas_call(
        kernel,
        grid=(V,),
        in_specs=[
            # full (V, 20) scalar table in SMEM, indexed by program id
            # (per-row SMEM blocks don't lower on Mosaic)
            pl.BlockSpec((V, 20), lambda v: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, crop, crop), lambda v: (v, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, grid, grid), lambda v: (v, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((V, 3, grid, grid), jnp.float32),
        interpret=interpret,
    )(scalars, dsel)
    return out.transpose(0, 2, 3, 1)                              # (V, g, g, 3)


def reference_patch_voxel_coords(depths, intrinsic, poses, crop=384, grid=14,
                                 min_xyz=(-15, -15, -5), max_xyz=(15, 15, 5),
                                 voxel=0.1, discretize=True):
    """Composed-ops ground truth for the fused kernel (and CPU fallback)."""
    V, H, W = depths.shape
    wc = geometry.unproject(intrinsic, poses, depths)
    new_w = int(W * (crop / H))
    wc = geometry.center_crop(geometry.resize_nearest(wc, (crop, new_w)),
                              (crop, crop))
    pooled = geometry.average_coordinate_in_patch(wc, patch_size=crop // grid)
    if discretize:
        pooled = geometry.discrete_coords(pooled, min_xyz, max_xyz, voxel)
    return pooled
