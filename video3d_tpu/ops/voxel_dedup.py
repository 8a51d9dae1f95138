"""Voxel-deduplicated scene tokens (the reference's 'llava3d' PE variant).

llava_arch.py:731-746: strip the grid newline columns, group patch features
by their discrete voxel coordinate, mean the duplicates, and randomly sample
up to 3096 unique voxels as the video's token block. The reference does this
with a python ``defaultdict`` of tensor lists — inherently dynamic — and
only supports batch size 1.

TPU-native formulation (static shapes, one jit):
  * voxel ids linearized to int32, ``jnp.unique(size=P)`` + ``segment_sum``
    compute per-voxel mean features without any host loop;
  * the random subset is a masked shuffle: argsort of uniform keys with
    invalid slots pushed to the end picks ``budget`` valid voxels uniformly
    at random — exactly the reference's ``randperm[:3096]`` semantics;
  * scenes with fewer than ``budget`` unique voxels cycle their valid
    features to fill the block (the reference emits a shorter sequence;
    static shapes require a fixed block, and duplicated voxel tokens are
    semantically neutral for attention).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def linearize_voxels(coords: jax.Array, grid_dims: Tuple[int, int, int]) -> jax.Array:
    """(..., 3) integer voxel coords -> (...,) unique int32 ids."""
    gx, gy, gz = grid_dims
    c = coords.astype(jnp.int32)
    return (c[..., 0] * gy + c[..., 1]) * gz + c[..., 2]


def voxel_dedup_features(feats: jax.Array, coords: jax.Array,
                         grid_dims: Tuple[int, int, int],
                         budget: int = 3096,
                         key: jax.Array | None = None
                         ) -> Tuple[jax.Array, jax.Array]:
    """Mean features per unique voxel, randomly sampled to ``budget``.

    Args:
      feats: (P, D) patch features; coords: (P, 3) discrete voxel coords.
      grid_dims: voxel grid extents (for id linearization).
      budget: output token count (reference: 3096).
      key: PRNG key for the voxel subset; None -> first-voxels deterministic.
    Returns:
      (budget, D) features and (budget,) bool mask of genuinely unique slots
      (False marks cycled fill when the scene has < budget unique voxels).
    """
    P, D = feats.shape
    ids = linearize_voxels(coords.reshape(-1, 3), grid_dims)
    uniq, inv = jnp.unique(ids, size=P, fill_value=jnp.int32(-1),
                           return_inverse=True)
    sums = jax.ops.segment_sum(feats.astype(jnp.float32),
                               inv.reshape(-1), num_segments=P)
    counts = jax.ops.segment_sum(jnp.ones((P,), jnp.float32),
                                 inv.reshape(-1), num_segments=P)
    means = (sums / jnp.maximum(counts, 1.0)[:, None]).astype(feats.dtype)
    valid = counts > 0

    if key is None:
        order_key = jnp.arange(P, dtype=jnp.float32)
    else:
        order_key = jax.random.uniform(key, (P,))
    # valid voxels first, in random (or index) order
    order = jnp.argsort(jnp.where(valid, order_key, order_key + 1e9))
    n_valid = valid.sum()
    take = jnp.minimum(n_valid, budget)
    slots = jnp.arange(budget)
    # cycle the valid prefix when the scene has fewer uniques than budget
    picked = order[slots % jnp.maximum(take, 1)]
    return means[picked], slots < take
