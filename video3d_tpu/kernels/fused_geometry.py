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


def _fused_kernel(scalars_ref, depth_ref, pose_ref, out_ref, *,
                  crop: int, patch: int, grid: int,
                  src_h: int, src_w: int, depth_scale: float,
                  min_xyz: Tuple[float, float, float],
                  max_xyz: Tuple[float, float, float], voxel: float,
                  discretize: bool):
    """One frame: depth (crop, crop) -> voxel ids (grid*grid, 3 padded)."""
    fx = scalars_ref[0, 0]
    fy = scalars_ref[0, 1]
    cx = scalars_ref[0, 2]
    cy = scalars_ref[0, 3]

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

    # per-patch means of camera-space coords (affine pose commutes with mean)
    def pool(a):
        return a[: grid * patch, : grid * patch].reshape(
            grid, patch, grid, patch).mean(axis=(1, 3))          # (grid, grid)

    cam = jnp.stack([pool(x).reshape(-1), pool(y).reshape(-1),
                     pool(z).reshape(-1),
                     jnp.ones((grid * grid,), jnp.float32)], axis=1)  # (G, 4)

    pose = pose_ref[0]                                           # (4, 4)
    world4 = jax.lax.dot_general(cam, pose, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (G, 4)
    world = world4[:, :3] / world4[:, 3:4]

    if discretize:
        # per-axis scalar clamps (array constants can't be captured in-kernel)
        cols = []
        for a in range(3):
            w = jnp.clip(world[:, a], min_xyz[a], max_xyz[a])
            cols.append(jnp.round((w - min_xyz[a]) / voxel))
        world = jnp.stack(cols, axis=1)

    out = jnp.zeros_like(out_ref[0])
    out_ref[0] = out.at[:, :3].set(world)


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
    scalars = jnp.stack([intrinsic[:, 0, 0], intrinsic[:, 1, 1],
                         intrinsic[:, 0, 2], intrinsic[:, 1, 2]],
                        axis=1).astype(jnp.float32)               # (V, 4)

    out_pad = 128   # lane-aligned output row
    kernel = functools.partial(
        _fused_kernel, crop=crop, patch=patch, grid=grid, src_h=H, src_w=W,
        depth_scale=1000.0, min_xyz=tuple(min_xyz), max_xyz=tuple(max_xyz),
        voxel=voxel, discretize=discretize)
    out = pl.pallas_call(
        kernel,
        grid=(V,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda v: (v, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, crop, crop), lambda v: (v, 0, 0)),
            pl.BlockSpec((1, 4, 4), lambda v: (v, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, grid * grid, out_pad), lambda v: (v, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((V, grid * grid, out_pad), jnp.float32),
        interpret=interpret,
    )(scalars, dsel, poses.astype(jnp.float32))
    return out[:, :, :3].reshape(V, grid, grid, 3)


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
