"""On-device greedy maximum-coverage frame selection — EXACT.

The reference precomputes the greedy set-cover order offline with Python
sets over voxel tuples (max_coverage_sampling.py:68-94) — minutes per scene
on CPU. Here the whole selection runs jitted on the TPU: the cover universe
is the scene point-cloud voxel list itself, frame coverage is an exact
membership bitmap over that list (linearized voxel ids + tagged
merge-by-sort — a perfect, collision-free mapping, unlike the spatial
hash this replaced, with no TPU scatters or gathers), and the greedy loop
is a ``lax.while_loop`` of masked popcount-argmax steps — O(max_frames * V * M) vectorized bit math instead
of Python set algebra, with M = |scene voxels| (typically 10-500k, far
smaller than a hash table sized for a low collision rate).

Deviation from the reference: ties are broken by lowest frame index instead
of uniformly at random (identical coverage quality, deterministic). The
membership itself is exact — device picks match the host set-cover
bit-for-bit (tests/test_lora_dpo_mc.py cross-checks, including voxel pairs
that collided under the old 2^20 spatial hash).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_SENTINEL = jnp.int32(2**31 - 1)  # padded/invalid scene slots sort last


def _linear_ids(vox: jax.Array, lo: jax.Array, sizes: jax.Array
                ) -> jax.Array:
    """(..., 3) voxels -> (...,) exact linear id in the scene's bounding
    grid, or -1 for voxels outside it (they cannot be scene members).

    Exact as long as the scene bounding grid has < 2^30 cells (the
    membership merge-by-sort packs a tag bit next to the id) — ScanNet at
    0.1 m voxels is ~300^3 = 2.7e7, orders of magnitude under the limit.
    """
    rel = vox.astype(jnp.int32) - lo
    inside = jnp.all((rel >= 0) & (rel < sizes), axis=-1)
    ids = (rel[..., 0] * sizes[1] + rel[..., 1]) * sizes[2] + rel[..., 2]
    return jnp.where(inside, ids, jnp.int32(-1))


def scene_universe(scene_vox: jax.Array, scene_valid: jax.Array = None
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(M, 3) scene voxels -> (sorted linear ids (M,), lo (3,), sizes (3,)).

    Padded/invalid entries become the int32 max sentinel, so they sort to
    the tail and can never equal a frame pixel's id (frame ids are -1 or a
    valid in-grid id < sizes-product). Duplicate scene voxels occupy
    duplicate slots, but ``searchsorted`` (side='left') always resolves to
    the FIRST slot, so each distinct voxel is counted exactly once.
    """
    flat = scene_vox.reshape(-1, 3).astype(jnp.int32)
    if scene_valid is None:
        valid = jnp.ones(flat.shape[:1], bool)
    else:
        valid = scene_valid.reshape(-1)
    big = jnp.int32(2**30)
    masked = jnp.where(valid[:, None], flat, big)
    lo = masked.min(axis=0)
    hi = jnp.where(valid[:, None], flat, -big).max(axis=0)
    sizes = jnp.maximum(hi - lo + 1, 1)
    ids = jnp.where(valid, _linear_ids(flat, lo, sizes), _SENTINEL)
    # lax.sort(is_stable=False): pure key sort — stability is
    # meaningless for equal int keys and the stable network is ~2x
    # the comparators on TPU
    return jax.lax.sort(ids, is_stable=False), lo, sizes


def membership_bitmap(vox: jax.Array, sorted_ids: jax.Array,
                      lo: jax.Array, sizes: jax.Array) -> jax.Array:
    """(N, 3) voxels -> (M,) bool: which scene-universe slots they cover.

    Merge-by-sort membership: sorts are the ONLY bulk primitive this
    touches — no scatters (TPU scatters serialize: the r2
    scatter-per-frame formulation cost ~2.5 s for a 64-frame pool) and
    no gathers (r4: searchsorted's gather steps were ~520 ms of the
    occupancy build). Duplicate scene slots are masked to their first
    occurrence so each distinct voxel is still counted exactly once.
    """
    pids = _linear_ids(vox.reshape(-1, 3), lo, sizes)
    M = sorted_ids.shape[0]
    # Membership with ZERO gathers (TPU gathers, not sorts, were the cost:
    # searchsorted 'scan' = log2(N) sequential gather steps, ~520 of the
    # 543 ms on-chip occupancy build; method='sort' still gathers
    # internally — 422 ms. BENCH_NOTES r4 mc-profile). Merge-by-sort:
    #   key = (id << 1) | tag   (tag 1 = scene query, 0 = frame pixel;
    #                            exact while the grid has < 2^30 cells —
    #                            ScanNet at 0.1 m is ~2.7e7)
    # After ONE key sort, a pixel with the same id sorts immediately
    # before its queries, so "query whose left neighbor shares its id" is
    # exactly membership (a query preceded by an equal QUERY is a
    # duplicate scene slot — masked by the `first` dedup below). A second
    # stable partition sort by (1 - tag) compacts the query bits back
    # into sorted_ids order (queries keep their relative order: they were
    # already sorted). Everything is shifts, compares and two sorts.
    qk = jnp.where(sorted_ids == _SENTINEL, _SENTINEL,
                   (sorted_ids << 1) | 1)
    pk = pids << 1                           # -1 -> -2: sorts first, tag 0
    sk = jax.lax.sort(jnp.concatenate([qk, pk]), is_stable=False)
    tag = sk & 1
    ids = sk >> 1
    prev = jnp.concatenate([jnp.full((1,), -(2 ** 30), sk.dtype), ids[:-1]])
    member = ((tag == 1) & (ids == prev)).astype(jnp.int32)
    _, bits = jax.lax.sort((1 - tag, member), is_stable=True, num_keys=1)
    hit = (bits[:M] == 1) & (sorted_ids != _SENTINEL)
    # dedup: only the first of equal adjacent scene slots counts
    first = jnp.concatenate([jnp.ones((1,), bool),
                             sorted_ids[1:] != sorted_ids[:-1]])
    return hit & first


def frame_occupancy_mm(frame_vox: jax.Array, sorted_ids: jax.Array,
                       lo: jax.Array, sizes: jax.Array) -> jax.Array:
    """(V, N, 3) voxels -> (V, M) bool occupancy — sort-free, MXU-based.

    Alternative formulation to :func:`membership_bitmap` (kept as a
    documented NEGATIVE result: measured 2.6x slower in-chain on chip —
    its per-pixel searchsorted gathers dominate; BENCH_NOTES r4). The
    pixels are never sorted:

      1. each pixel binary-searches the ONE sorted scene table
         (M ~ 1e4-5e5 ints — KBs, VMEM-resident) for its slot, or the
         overflow bin on a miss;
      2. per frame, slot presence is an exact 2D histogram over
         (slot // 128, slot % 128) computed as ONE bf16 matmul on the
         MXU: P[h, l] = sum_p [hi_p == h][lo_p == l]. Products are
         exactly 0/1 in bf16 and the f32 accumulation of <= N <= 2^24
         of them is exact, so P > 0 is exact presence.

    ``searchsorted(side='left')`` resolves duplicate scene slots to the
    FIRST occurrence, so the bitmap is already deduplicated — identical
    semantics to ``membership_bitmap``'s hit & first masking (asserted
    bit-for-bit in tests/test_lora_dpo_mc.py::TestOccupancyImpls).
    Frames are processed sequentially (lax.map) to bound the (Hp, N)
    one-hot temp to one frame.
    """
    V, N = frame_vox.shape[0], frame_vox.reshape(frame_vox.shape[0], -1,
                                                 3).shape[1]
    M = sorted_ids.shape[0]
    Mp = -(-M // 128) * 128
    Hp = Mp // 128 + 1                     # +1 row: the overflow/miss bin

    pids = _linear_ids(frame_vox.reshape(V, N, 3), lo, sizes)     # (V, N)
    idx = jnp.searchsorted(sorted_ids, pids.reshape(-1))
    idxc = jnp.minimum(idx, M - 1)
    hit = (sorted_ids[idxc] == pids.reshape(-1)) & (pids.reshape(-1) >= 0)
    slot = jnp.where(hit, idxc, Mp).reshape(V, N)   # miss -> bin Mp

    rows = jnp.arange(Hp, dtype=jnp.int32)
    lanes = jnp.arange(128, dtype=jnp.int32)

    def one(slots_f):
        hi = slots_f // 128
        lo_ = slots_f % 128
        a = (hi[None, :] == rows[:, None]).astype(jnp.bfloat16)   # (Hp, N)
        b = (lo_[:, None] == lanes[None, :]).astype(jnp.bfloat16)  # (N, 128)
        p = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (p > 0.5).reshape(-1)[:M]           # drop pad + miss bins

    return jax.lax.map(one, slot)


# A/B escape hatch (scripts/bench/flagship32.py mc-chain --occ-impl):
# read at TRACE time. "sort" = the per-frame sort + searchsorted
# formulation (default), "mm" = the sort-free MXU histogram. Measured
# on chip r4: "mm" is 2.6x SLOWER in the 64-frame chain (3848 vs
# 1472 ms — the 20M-query searchsorted gathers dominate), so it stays a
# documented negative result; the bit-exactness tests keep both honest.
OCC_IMPL = "sort"


@functools.partial(jax.jit, static_argnames=("max_frames", "ratio"))
def greedy_select_frames(frame_vox: jax.Array, scene_vox: jax.Array,
                         max_frames: int = 32,
                         scene_valid: jax.Array = None,
                         ratio: float = 1.0
                         ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Greedy max-coverage ordering on device (exact membership).

    Args:
      frame_vox: (V, N, 3) per-frame voxel ids (N = all pixels; duplicates
        are fine — the membership bitmap dedups).
      scene_vox: (M, 3) scene point-cloud voxel ids (the cover universe).
      scene_valid: optional (M,) mask for padded scene voxels.
      ratio: early-exit threshold — stop picking once the cumulative gain
        reaches ``ratio * num_all`` (the reference stops there,
        video_utils.py:142-151 / max_coverage_sampling.py's ratio cut);
        the remaining ``order`` slots stay -1. ``ratio=1.0`` keeps the
        full max_frames ordering (prefix cuts then happen on the host in
        :func:`select_prefix_by_ratio` — identical picks either way, the
        early exit just skips the dead iterations).
    Returns:
      (order (max_frames,) int32 frame indices (-1 past the stop),
       gains (max_frames,) int32 newly covered voxels per pick,
       num_all int32 total coverable voxels = |union(frames) ∩ scene|).
    """
    V = frame_vox.shape[0]
    sorted_ids, lo, sizes = scene_universe(scene_vox, scene_valid)
    if OCC_IMPL == "mm":
        frame_occ = frame_occupancy_mm(frame_vox, sorted_ids, lo, sizes)
    else:
        frame_occ = jax.vmap(
            lambda fv: membership_bitmap(fv, sorted_ids, lo, sizes))(frame_vox)

    num_all = jnp.any(frame_occ, axis=0).sum().astype(jnp.int32)
    target = jnp.ceil(ratio * num_all.astype(jnp.float32)).astype(jnp.int32)

    def cond(state):
        i, covered, *_ = state
        stop = covered >= target if ratio < 1.0 else jnp.zeros((), bool)
        return (i < min(max_frames, V)) & ~stop

    def body(state):
        i, covered, used, taken, order, gains = state
        new = frame_occ & ~used[None]                # (V, M)
        counts = new.sum(axis=1).astype(jnp.int32)   # (V,)
        counts = jnp.where(taken, -1, counts)
        pick = jnp.argmax(counts).astype(jnp.int32)  # first of ties
        used = used | frame_occ[pick]
        taken = taken.at[pick].set(True)
        order = order.at[i].set(pick)
        gains = gains.at[i].set(counts[pick])
        return (i + 1, covered + counts[pick], used, taken, order, gains)

    init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            jnp.zeros(frame_occ.shape[1:], bool),
            jnp.zeros((V,), bool),
            jnp.full((max_frames,), -1, jnp.int32),
            jnp.zeros((max_frames,), jnp.int32))
    _, _, _, _, order, gains = jax.lax.while_loop(cond, body, init)
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
