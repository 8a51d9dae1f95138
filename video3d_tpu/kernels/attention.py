"""Attention entry point: Pallas flash kernel on TPU, jnp reference on CPU.

Replaces the reference's flash-attention-2 dependency
(/root/reference/llava/train/train_3d.py:183, qwen2/modeling_qwen2.py:330-632)
with a TPU-native path. All callers go through :func:`mha`, which picks the
implementation by backend and shape; the jnp path is also the numerical
ground truth the Pallas kernel is tested against.

Semantics:
  * GQA — kv heads are broadcast to query heads (groups = H // KV).
  * softmax in float32, output in query dtype.
  * causal masking by absolute position: with a KV cache, cache slot index
    equals absolute sequence position, so query at position p attends to
    slots s <= p (and s < kv_len when given).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp

NEG_INF = -1e30

# set while tracing inside a shard_map body (parallel/pipeline.py): data is
# already device-local there, so mha must not open a nested shard_map — it
# may still call the pallas kernel directly
_MANUAL_MODE = False

# benchmarking escape hatch: force the XLA decode path
_DISABLE_DECODE_KERNEL = False

# perf-bisection hatch (scripts/bench only): return zeros instead of
# running decode attention, isolating the non-attention step cost
import os as _os  # noqa: E402

_BISECT_SKIP_DECODE_ATTN = bool(_os.environ.get("V3D_BISECT_SKIP_DECODE_ATTN"))
_BISECT_SKIP_SP_ATTN = bool(_os.environ.get("V3D_BISECT_SKIP_SP_ATTN"))


@contextlib.contextmanager
def manual_sharding():
    """Mark the enclosed trace as inside a shard_map body."""
    global _MANUAL_MODE
    prev, _MANUAL_MODE = _MANUAL_MODE, True
    try:
        yield
    finally:
        _MANUAL_MODE = prev


def _broadcast_kv(k: jax.Array, num_q_heads: int) -> jax.Array:
    """(B, S, KV, hd) -> (B, S, H, hd) by repeating each kv head."""
    B, S, KV, hd = k.shape
    groups = num_q_heads // KV
    if groups == 1:
        return k
    return jnp.repeat(k, groups, axis=2)


def mha_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                  mask: Optional[jax.Array] = None,
                  causal: bool = True,
                  q_positions: Optional[jax.Array] = None,
                  kv_len: Optional[jax.Array] = None,
                  score_bias: Optional[jax.Array] = None) -> jax.Array:
    """Plain-jnp attention (ground truth; used on CPU).

    Args:
      q: (B, L, H, hd); k, v: (B, S, KV, hd).
      mask: optional (B, L, S) boolean, True = may attend. Combined with the
        causal/positional rule if both given.
      q_positions: optional (B, L) absolute positions of the queries (KV-cache
        path, where S is the cache capacity and slot index == position).
      kv_len: optional (B,) count of valid cache slots.
      score_bias: optional (H, S) per-head key-position bias added to the
        pre-softmax scores (ALiBi, qwen2.py alibi_bias).
    Returns:
      (B, L, H, hd) in q.dtype.
    """
    B, L, H, hd = q.shape
    S = k.shape[1]
    k = _broadcast_kv(k, H)
    v = _broadcast_kv(v, H)

    scores = jnp.einsum("blhd,bshd->bhls", q, k).astype(jnp.float32) * (hd ** -0.5)
    if score_bias is not None:
        scores = scores + score_bias.astype(jnp.float32)[None, :, None, :]

    allow = jnp.ones((B, L, S), bool)
    slots = jnp.arange(S)[None, None, :]
    if q_positions is not None:
        allow = slots <= q_positions[:, :, None]
    elif causal:
        allow = (jnp.arange(S)[None, None, :] <= jnp.arange(L)[None, :, None] + (S - L))
        allow = jnp.broadcast_to(allow, (B, L, S))
    if kv_len is not None:
        allow = allow & (slots < kv_len[:, None, None])
    if mask is not None:
        allow = allow & mask

    scores = jnp.where(allow[:, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhls,bshd->blhd", probs, v)


def mha(q: jax.Array, k: jax.Array, v: jax.Array,
        mask: Optional[jax.Array] = None,
        causal: bool = True,
        q_positions: Optional[jax.Array] = None,
        kv_len: Optional[jax.Array] = None,
        k_scale: Optional[jax.Array] = None,
        v_scale: Optional[jax.Array] = None,
        score_bias: Optional[jax.Array] = None) -> jax.Array:
    """Backend-dispatching attention; see :func:`mha_reference` for args.

    The Pallas flash path handles the production prefill/training case:
    causal, right-padded (per-sample ``kv_len``), no arbitrary dense mask.
    Under an active multi-device mesh the kernel is wrapped in ``shard_map``
    (batch over dp/fsdp, heads over tp) — XLA cannot SPMD-partition a
    pallas_call by itself and would otherwise gather inputs and run it
    replicated on every chip.
    """
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except RuntimeError:
        on_tpu = False
    B, L, H = q.shape[0], q.shape[1], q.shape[2]
    S, KV, hd = k.shape[1], k.shape[2], k.shape[3]
    if (score_bias is None and mask is None and q_positions is not None
            and (L == 1 or L >= 64) and kv_len is not None
            and not _MANUAL_MODE):
        # tensor/data-parallel decode AND cached multi-token chunks
        # (chunked prefill / suffix-over-prefix; q_positions is only ever
        # passed on inference cache-read paths, qwen2.py:288-296, so no
        # VJP flows here) for the eval/drivers.py InferenceEngine
        # mesh= path: heads over
        # tp, batch over dp/fsdp. GQA stays shard-local (q heads
        # [i*H/tp:(i+1)*H/tp) attend kv heads [i*KV/tp:(i+1)*KV/tp) —
        # contiguous blocks, same grouping _broadcast_kv uses), so the
        # whole per-token attention runs without any collective; only the
        # surrounding projections reduce over tp. Inside the shard_map the
        # recursive mha call picks the fused kernel on TPU and the jnp
        # reference on CPU meshes.
        mesh = _active_mesh()
        if mesh is not None:
            batch_axes = tuple(a for a in ("dp", "fsdp") if a in mesh.shape)
            n_batch = int(np.prod([mesh.shape[a] for a in batch_axes])) \
                if batch_axes else 1
            n_tp = mesh.shape.get("tp", 1)
            if ((n_batch > 1 or n_tp > 1) and B % max(n_batch, 1) == 0
                    and H % n_tp == 0 and KV % n_tp == 0):
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                bspec = batch_axes if len(batch_axes) > 1 else \
                    (batch_axes[0] if batch_axes else None)
                tp = "tp" if n_tp > 1 else None
                hspec = P(bspec, None, tp, None)
                # None args are empty pytrees: P() placeholder spec is fine
                sspec = P() if k_scale is None else hspec

                def local(qs, ks, vs, qp, kl, kss, vss):
                    with manual_sharding():
                        return mha(qs, ks, vs, causal=causal,
                                   q_positions=qp, kv_len=kl,
                                   k_scale=kss, v_scale=vss)

                return shard_map(
                    local, mesh=mesh,
                    in_specs=(hspec, hspec, hspec, P(bspec, None),
                              P(bspec), sspec, sspec),
                    out_specs=hspec, check_vma=False)(
                        q, k, v, q_positions, kv_len, k_scale, v_scale)
    if (on_tpu and not _DISABLE_DECODE_KERNEL and score_bias is None
            and mask is None and q_positions is not None and L == 1
            and kv_len is not None and hd % 128 == 0 and S % 128 == 0
            and (_MANUAL_MODE or _active_mesh() is None)):
        # single-token decode over the cache: one fused kernel instead of
        # ~10 small HBM-bound XLA ops; int8 caches stream quantized
        # (kernels/decode_attention.py)
        if _BISECT_SKIP_DECODE_ATTN:
            return jnp.zeros_like(q)
        from video3d_tpu.kernels.decode_attention import decode_attention

        eff_len = jnp.minimum(q_positions[:, 0] + 1, kv_len)
        return decode_attention(q, k, v, eff_len,
                                k_scale=k_scale, v_scale=v_scale)
    if (on_tpu and causal and score_bias is None and mask is None
            and q_positions is not None and L >= 64 and kv_len is not None
            and hd % 128 == 0 and (_MANUAL_MODE or _active_mesh() is None)):
        # multi-token chunk over a KV cache (chunked prefill / suffix
        # prefill): the dense path materializes a (B, H, L, S) score tensor
        # — 7 GB and an OOM at the 4096-chunk x 32k-cache flagship scale
        # (BENCH_NOTES r3) — so route through the flash kernel with
        # per-row absolute query offsets, with the GQA group FOLDED into
        # the query rows so each KV head streams from HBM once, not
        # H // KV times (the suffix-over-prefix forward was KV-stream
        # bound: BENCH_NOTES r3), and int8 caches streamed raw (dequant in
        # VMEM). Caller contract (every cached
        # multi-token call site in models/: generate._prefill_chunk,
        # start_decode_prefix, speculative verify): ``q_positions`` rows
        # are contiguous ranges q_positions[b, r] == q_positions[b, 0] + r,
        # and none of them differentiate (the folded kernel has no VJP).
        from video3d_tpu.kernels import flash_attention as fa

        return fa.flash_attention_gqa_folded(q, k, v, lengths=kv_len,
                                             q_offsets=q_positions[:, 0],
                                             k_scale=k_scale,
                                             v_scale=v_scale,
                                             block_q=fa.GQF_BLOCK_Q,
                                             block_k=fa.GQF_BLOCK_K)
    if k_scale is not None:
        # quantized cache on a non-kernel path: dequantize here
        k = k.astype(q.dtype) * k_scale.astype(q.dtype)
        v = v.astype(q.dtype) * v_scale.astype(q.dtype)
    if (on_tpu and mask is None and q_positions is None and causal
            and score_bias is None
            and L == S and L >= 256 and L % 128 == 0 and hd % 128 == 0):
        from video3d_tpu.kernels import flash_attention as fa
        from video3d_tpu.kernels.flash_attention import flash_attention

        mesh = None if _MANUAL_MODE else _active_mesh()
        if mesh is not None and mesh.shape.get("sp", 1) > 1:
            # sequence-parallel activations: let GSPMD partition the jnp path
            # (all-gather K/V over sp); the shard_map wrapper below assumes
            # the token dim is unsharded
            return mha_reference(q, k, v, mask=mask, causal=causal,
                                 q_positions=q_positions, kv_len=kv_len,
                                 score_bias=score_bias)
        if mesh is not None:
            batch_axes = tuple(a for a in ("dp", "fsdp") if a in mesh.shape)
            n_batch = int(np.prod([mesh.shape[a] for a in batch_axes])) \
                if batch_axes else 1
            n_tp = mesh.shape.get("tp", 1)
            if ((n_batch > 1 or n_tp > 1)
                    and B % max(n_batch, 1) == 0
                    and H % n_tp == 0 and KV % n_tp == 0):
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                bspec = batch_axes if len(batch_axes) > 1 else \
                    (batch_axes[0] if batch_axes else None)
                qkv_spec = P(bspec, None, "tp" if n_tp > 1 else None, None)
                len_spec = P(bspec)

                def local(qs, ks, vs, ls):
                    return flash_attention(qs, ks, vs, lengths=ls,
                                           causal=True,
                                           block_q=fa.FA_BLOCK_Q,
                                           block_k=fa.FA_BLOCK_K)

                kv_len_arr = kv_len if kv_len is not None else \
                    jnp.full((B,), S, jnp.int32)
                return shard_map(local, mesh=mesh,
                                 in_specs=(qkv_spec, qkv_spec, qkv_spec,
                                           len_spec),
                                 out_specs=qkv_spec,
                                 check_vma=False)(q, k, v, kv_len_arr)
        return flash_attention(q, k, v, lengths=kv_len, causal=True,
                               block_q=fa.FA_BLOCK_Q, block_k=fa.FA_BLOCK_K)
    return mha_reference(q, k, v, mask=mask, causal=causal,
                         q_positions=q_positions, kv_len=kv_len,
                         score_bias=score_bias)


def mha_shared_prefix(q: jax.Array, pk: jax.Array, pv: jax.Array,
                      sk: jax.Array, sv: jax.Array,
                      suffix_lens: jax.Array,
                      pk_scale: Optional[jax.Array] = None,
                      pv_scale: Optional[jax.Array] = None) -> jax.Array:
    """Suffix-over-SHARED-prefix attention dispatch (scene-grouped batched
    suffix prefill: every batch row attends the same immutable scene
    prefix). TPU: the split-softmax kernel pair streams the prefix KV once
    for all rows (kernels/flash_attention.flash_attention_shared_prefix).
    CPU/meshes: the jnp oracle below (also the parity ground truth).

    Args:
      q: (B, L, H, hd) — query r of row b at absolute position P + r.
      pk, pv: (P, KV, hd) shared prefix K/V (int8 with scales (P, KV, 1)).
      sk, sv: (B, Ls, KV, hd) per-row suffix K/V, full precision.
      suffix_lens: (B,) valid suffix key counts.
    """
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except RuntimeError:
        on_tpu = False
    if on_tpu and (_MANUAL_MODE or _active_mesh() is None):
        if _BISECT_SKIP_SP_ATTN:
            return jnp.zeros_like(q)
        from video3d_tpu.kernels import flash_attention as fa

        return fa.flash_attention_shared_prefix(
            q, pk, pv, sk, sv, suffix_lens,
            pk_scale=pk_scale, pv_scale=pv_scale,
            block_q_prefix=fa.SP_BLOCK_Q, block_k=fa.SP_BLOCK_K)
    return mha_shared_prefix_reference(q, pk, pv, sk, sv, suffix_lens,
                                       pk_scale=pk_scale,
                                       pv_scale=pv_scale)


def mha_shared_prefix_reference(q, pk, pv, sk, sv, suffix_lens,
                                pk_scale=None, pv_scale=None):
    """jnp oracle for :func:`mha_shared_prefix`: broadcast the prefix to
    every row, concatenate with the suffix K/V, and run the plain cached
    path (q_positions = P + r, kv_len = P + suffix_lens)."""
    B, L = q.shape[0], q.shape[1]
    P = pk.shape[0]
    pkb = jnp.broadcast_to(pk[None], (B,) + pk.shape)
    pvb = jnp.broadcast_to(pv[None], (B,) + pv.shape)
    if pk_scale is not None:
        pkb = pkb.astype(q.dtype) * jnp.broadcast_to(
            pk_scale[None], (B,) + pk_scale.shape).astype(q.dtype)
        pvb = pvb.astype(q.dtype) * jnp.broadcast_to(
            pv_scale[None], (B,) + pv_scale.shape).astype(q.dtype)
    k = jnp.concatenate([pkb.astype(q.dtype), sk.astype(q.dtype)], axis=1)
    v = jnp.concatenate([pvb.astype(q.dtype), sv.astype(q.dtype)], axis=1)
    q_positions = P + jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    kv_len = P + suffix_lens
    return mha_reference(q, k, v, q_positions=q_positions, kv_len=kv_len)


def mha_cached_stacked(q: jax.Array, k_all: jax.Array, v_all: jax.Array,
                       layer: int, kv_heads: int, q_positions: jax.Array,
                       kv_len: jax.Array,
                       k_scale: Optional[jax.Array] = None,
                       v_scale: Optional[jax.Array] = None,
                       score_bias: Optional[jax.Array] = None) -> jax.Array:
    """Cache attention against the STACKED flat (layers, B, S, KV*hd)
    cache (models/qwen2.py KVCache).

    The TPU single-token decode path hands the whole stacked cache to the
    fused kernel, whose BlockSpec index map selects the layer — zero
    per-layer slice copies (models/qwen2.py threads one cache buffer
    through the layer loop; slicing + restacking re-wrote the entire
    cache every step, BENCH_NOTES r5 32k-decode section). Every other
    path (CPU reference, meshes, multi-token chunks) slices the layer
    out and head-splits it — a copy, but those paths either run on CPU
    or amortize it over a whole chunk. ``k_scale``/``v_scale`` are THIS
    layer's (B, S, KV, 1) scales (tiny; the caller slices them).
    """
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except RuntimeError:
        on_tpu = False
    B, L, H, hd = q.shape
    S = k_all.shape[2]
    if (on_tpu and not _DISABLE_DECODE_KERNEL and score_bias is None
            and L == 1 and kv_len is not None and hd % 128 == 0
            and S % 128 == 0 and (_MANUAL_MODE or _active_mesh() is None)):
        if _BISECT_SKIP_DECODE_ATTN:
            return jnp.zeros_like(q)
        from video3d_tpu.kernels.decode_attention import decode_attention

        eff_len = jnp.minimum(q_positions[:, 0] + 1, kv_len)
        return decode_attention(q, k_all, v_all, eff_len, k_scale=k_scale,
                                v_scale=v_scale, layer=layer,
                                kv_heads=kv_heads)
    kl = k_all[layer].reshape(B, S, kv_heads, hd)
    vl = v_all[layer].reshape(B, S, kv_heads, hd)
    if k_scale is None and kl.dtype != q.dtype:
        kl, vl = kl.astype(q.dtype), vl.astype(q.dtype)
    return mha(q, kl, vl, causal=True, q_positions=q_positions,
               kv_len=kv_len, k_scale=k_scale, v_scale=v_scale,
               score_bias=score_bias)


def paged_mha(q: jax.Array, k_pages: jax.Array, v_pages: jax.Array,
              page_table: jax.Array, kv_len: jax.Array,
              k_scale: Optional[jax.Array] = None,
              v_scale: Optional[jax.Array] = None,
              layer=None) -> jax.Array:
    """Backend-dispatching paged decode attention (L == 1).

    TPU: the scalar-prefetch pallas kernel streams each slot's pages from
    the shared pool without materializing a gathered copy; with ``layer``
    given the pools are the WHOLE STACKED (layers, P, KV, page, hd)
    buffers and the kernel addresses them by layer id (the r5
    stacked-threading path — per-layer slicing + restacking re-wrote the
    pools every step). CPU / meshes: the gather-based jnp oracle
    (kernels/paged_attention.py) on the layer's slice. Serving is
    single-chip (serve/batcher.py), so no shard_map wrapper here.
    """
    from video3d_tpu.kernels.paged_attention import (
        paged_attention_reference, paged_decode_attention)

    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except RuntimeError:
        on_tpu = False
    hd = q.shape[-1]
    # flat pools (r5): stacked (layers, P, page, KV*hd) vs per-layer
    # (P, page, KV*hd)
    stacked = k_pages.ndim == 4
    page = k_pages.shape[2] if stacked else k_pages.shape[1]
    kv_heads = k_pages.shape[-1] // hd
    if (on_tpu and not _DISABLE_DECODE_KERNEL and hd % 128 == 0
            and page % 128 == 0 and _active_mesh() is None):
        if _BISECT_SKIP_DECODE_ATTN:
            return jnp.zeros_like(q)
        return paged_decode_attention(q, k_pages, v_pages, page_table,
                                      kv_len, k_scale=k_scale,
                                      v_scale=v_scale, layer=layer,
                                      kv_heads=kv_heads)
    if stacked:
        k_pages, v_pages = k_pages[layer], v_pages[layer]
        if k_scale is not None:
            k_scale, v_scale = k_scale[layer], v_scale[layer]
    return paged_attention_reference(q, k_pages, v_pages, page_table,
                                     kv_len, k_scale=k_scale,
                                     v_scale=v_scale, kv_heads=kv_heads)


def _active_mesh():
    """The ambient Mesh context (``with mesh:``), or None."""
    from video3d_tpu.parallel.mesh import active_mesh

    return active_mesh()
