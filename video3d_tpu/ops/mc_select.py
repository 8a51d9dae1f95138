"""On-device greedy maximum-coverage frame selection.

The reference precomputes the greedy set-cover order offline with Python
sets over voxel tuples (max_coverage_sampling.py:68-94) — minutes per scene
on CPU. Here the whole selection runs jitted on the TPU: voxel tuples are
spatial-hashed into a fixed-size occupancy bitmap per frame (V, TABLE) and
the greedy loop is a ``lax.fori_loop`` of masked popcount-argmax steps —
O(max_frames * V * TABLE) vectorized bit math instead of Python set algebra.

Deviation from the reference: ties are broken by lowest frame index instead
of uniformly at random (identical coverage quality, deterministic), and hash
collisions can merge distinct voxels (TABLE = 2^20 makes this negligible for
ScanNet-scale scenes; the test cross-checks against exact host set-cover).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

TABLE_BITS = 20
TABLE = 1 << TABLE_BITS

_PRIMES = (73856093, 19349663, 83492791)  # standard 3D spatial hash


def hash_voxels(vox: jax.Array, table_bits: int = TABLE_BITS) -> jax.Array:
    """(..., 3) int voxel ids -> (...,) bucket in [0, 2^table_bits)."""
    v = vox.astype(jnp.int32)
    h = (v[..., 0] * _PRIMES[0]) ^ (v[..., 1] * _PRIMES[1]) ^ (v[..., 2] * _PRIMES[2])
    return (h & (jnp.int32((1 << table_bits) - 1))).astype(jnp.int32)


def occupancy_bitmap(vox: jax.Array, valid: jax.Array = None,
                     table_bits: int = TABLE_BITS) -> jax.Array:
    """(N, 3) voxels -> (2^bits,) bool occupancy (optionally masked)."""
    buckets = hash_voxels(vox.reshape(-1, 3), table_bits)
    updates = jnp.ones(buckets.shape, bool) if valid is None \
        else valid.reshape(-1)
    occ = jnp.zeros((1 << table_bits,), bool)
    return occ.at[buckets].max(updates)


@functools.partial(jax.jit, static_argnames=("max_frames", "table_bits"))
def greedy_select_frames(frame_vox: jax.Array, scene_vox: jax.Array,
                         max_frames: int = 32,
                         scene_valid: jax.Array = None,
                         table_bits: int = TABLE_BITS
                         ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Greedy max-coverage ordering on device.

    Args:
      frame_vox: (V, N, 3) per-frame voxel ids (N = all pixels; duplicates
        are fine — the bitmap dedups).
      scene_vox: (M, 3) scene point-cloud voxel ids (the cover universe).
      scene_valid: optional (M,) mask for padded scene voxels.
    Returns:
      (order (max_frames,) int32 frame indices,
       gains (max_frames,) int32 newly covered voxels per pick,
       num_all int32 total coverable voxels = |union(frames) ∩ scene|).
    """
    V = frame_vox.shape[0]
    scene_occ = occupancy_bitmap(scene_vox, scene_valid, table_bits)
    frame_occ = jax.vmap(
        lambda fv: occupancy_bitmap(fv, table_bits=table_bits))(frame_vox)
    frame_occ = frame_occ & scene_occ[None]          # ∩ scene cloud

    num_all = jnp.any(frame_occ, axis=0).sum().astype(jnp.int32)

    def body(i, state):
        used, taken, order, gains = state
        new = frame_occ & ~used[None]                # (V, T)
        counts = new.sum(axis=1).astype(jnp.int32)   # (V,)
        counts = jnp.where(taken, -1, counts)
        pick = jnp.argmax(counts).astype(jnp.int32)  # first of ties
        used = used | frame_occ[pick]
        taken = taken.at[pick].set(True)
        order = order.at[i].set(pick)
        gains = gains.at[i].set(counts[pick])
        return used, taken, order, gains

    init = (jnp.zeros((1 << table_bits,), bool),
            jnp.zeros((V,), bool),
            jnp.full((max_frames,), -1, jnp.int32),
            jnp.zeros((max_frames,), jnp.int32))
    _, _, order, gains = jax.lax.fori_loop(0, min(max_frames, V), body, init)
    return order, gains, num_all


def select_prefix_by_ratio(order, gains, num_all, ratio: float):
    """Host-side prefix cut (video_utils.py:142-151): keep picks until the
    cumulative gain reaches ratio * num_all, then sort chronologically."""
    import numpy as np

    order = np.asarray(order)
    gains = np.asarray(gains)
    total = float(num_all)
    out, cc = [], 0
    for f, g in zip(order, gains):
        if f < 0:
            break
        out.append(int(f))
        cc += int(g)
        if cc >= total * ratio:
            break
    return sorted(out)
