"""Paged single-token decode attention: KV pages + per-slot page tables.

The dense decode cache (models/qwen2.py KVCache) reserves ``num_slots *
max_cache_len`` positions even when most slots hold short sequences — at
28 layers x 32k x 8 slots that is 7.5 GB of int8 HBM for capacity that is
mostly air (BENCH_NOTES.md). Here the cache is a shared pool of fixed-size
pages; each slot owns just the pages its tokens occupy, so HBM scales with
TOTAL LIVE TOKENS, not slots x max-length, and heterogeneous slot lengths
pack tightly. This is the serving-side analogue of vLLM's PagedAttention,
designed TPU-first: the kernel walks each slot's page table via scalar
prefetch (the table lives in SMEM and drives the BlockSpec index_map, so
pages stream HBM->VMEM exactly once, no gathered copy is ever
materialized) and reduces across pages with the same online softmax as
kernels/flash_attention.py.

The reference has no analogue (HF transformers dense cache,
qwen2/modeling_qwen2.py:330-632); this replaces it for the continuous
batching serve path (serve/batcher.py).

Mosaic notes (see .claude/skills/verify/SKILL.md): pool layout puts
(page_size, head_dim) minor so every block is a contiguous (1, 1, page,
hd) slab; scale pools store (.., 1, page) so their blocks keep the lane
dim >= page; ``pl.program_id`` is only read at kernel top level; scratch
accumulators use (G, 128) lane-broadcast layouts like the flash kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _paged_kernel(table_ref, len_ref, q_ref, k_ref, v_ref, o_ref,
                  m_scr, l_scr, acc_scr, *, kv_heads: int, page: int,
                  num_pages_per_slot: int):
    i = pl.program_id(0)              # flattened (slot, kv head)
    j = pl.program_id(1)              # page index within the slot
    b = i // kv_heads
    kv_len = len_ref[b]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # positions this page covers; mask past the slot's length
    base = j * page
    live = base < kv_len              # page has any valid token

    @pl.when(live)
    def _step():
        q = q_ref[0].astype(jnp.float32)              # (G, hd)
        k = k_ref[0, 0].astype(jnp.float32)           # (page, hd)
        v = v_ref[0, 0].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)      # (G, page)
        pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < kv_len, s, NEG_INF)

        m_prev = m_scr[:, :1]                         # (G, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == num_pages_per_slot - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _paged_kernel_int8(table_ref, len_ref, q_ref, k_ref, v_ref, ks_ref,
                       vs_ref, o_ref, m_scr, l_scr, acc_scr, *,
                       kv_heads: int, page: int, num_pages_per_slot: int):
    """int8 pool variant: HBM streams int8 pages + (1, page) f32 scales;
    dequant folds into the score row scale / the p.V weights exactly as in
    kernels/decode_attention.py."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    b = i // kv_heads
    kv_len = len_ref[b]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    base = j * page
    live = base < kv_len

    @pl.when(live)
    def _step():
        q = q_ref[0].astype(jnp.float32)              # (G, hd)
        k = k_ref[0, 0].astype(jnp.float32)           # (page, hd) from int8
        v = v_ref[0, 0].astype(jnp.float32)
        k_scale = ks_ref[0, 0]                        # (1, page) f32
        v_scale = vs_ref[0, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) * k_scale
        pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < kv_len, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p * v_scale, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == num_pages_per_slot - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _ragged_kernel(slot_ref, pid_ref, jj_ref, npages_ref, len_ref,
                   q_ref, k_ref, v_ref, *rest, kv_heads: int, page: int,
                   quantized: bool):
    """Ragged-worklist variant: the grid walks LIVE pages only.

    The full grid (B*KV, maxp) burns a grid step per DEAD page too — at
    32k budgets (maxp = 256) with mostly-short slots that is ~7x more
    steps than live pages, and the step overhead dominated the measured
    51 ms/step (BENCH_NOTES r4 32k-decode section). Here the wrapper
    compacts (slot, page-within-slot) pairs of live pages into a
    worklist bounded by the POOL size (every live page is an allocated
    pool page, so sum(live) <= P by construction); the kernel streams
    exactly those. Slot runs are contiguous, so the online-softmax
    scratch carries across a slot's pages and finalizes on its last
    page; padding steps (jj < 0) keep the previous indices (fetches
    elide) and touch nothing.
    """
    if quantized:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    w = pl.program_id(0)
    j = jj_ref[w]
    b = slot_ref[w]
    valid = j >= 0
    kv_len = len_ref[b]
    last = valid & (j == npages_ref[b] - 1)
    G = q_ref.shape[2]

    @pl.when(valid & (j == 0))
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(valid)
    def _step():
        # ALL kv heads of this page in one program (4x fewer grid steps:
        # the per-program overhead dominated the decode step at 32k
        # budgets — BENCH_NOTES r4 32k-decode section). The head loop is
        # a python unroll over the block's kv dim; scratch rows
        # [kv*G, (kv+1)*G) carry each head's online-softmax state.
        for kv in range(kv_heads):
            q = q_ref[0, kv].astype(jnp.float32)          # (G, hd)
            k = k_ref[0, kv].astype(jnp.float32)          # (page, hd)
            v = v_ref[0, kv].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)      # (G, page)
            if quantized:
                s = s * ks_ref[0, kv]
            pos = j * page + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(pos < kv_len, s, NEG_INF)
            rows = pl.ds(kv * G, G)
            m_prev = m_scr[rows, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            m_scr[rows, :] = jnp.broadcast_to(m_new, (G, 128))
            l_scr[rows, :] = l_scr[rows, :] * alpha \
                + jnp.sum(p, axis=-1, keepdims=True)
            if quantized:
                p = p * vs_ref[0, kv]
            p = jnp.where(pos < kv_len, p, 0.0)  # kill 0*stale products
            acc_scr[rows, :] = acc_scr[rows, :] * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    @pl.when(last)
    def _finish():
        for kv in range(kv_heads):
            rows = pl.ds(kv * G, G)
            o_ref[0, kv] = (acc_scr[rows, :]
                            / jnp.maximum(l_scr[rows, :1], 1e-30)) \
                .astype(o_ref.dtype)


# escape hatch for A/B (scripts/bench/paged_batcher.py --full-grid)
RAGGED_GRID = True


def paged_decode_attention(q: jax.Array, k_pages: jax.Array,
                           v_pages: jax.Array, page_table: jax.Array,
                           kv_len: jax.Array,
                           sm_scale: float | None = None,
                           k_scale: jax.Array | None = None,
                           v_scale: jax.Array | None = None,
                           interpret: bool = False) -> jax.Array:
    """Fused paged attention for one decode step (one layer).

    Args:
      q: (B, 1, H, hd) single-position queries (B = slot count).
      k_pages, v_pages: (P, KV, page, hd) shared page pool for this layer;
        int8 when k_scale/v_scale are given.
      page_table: (B, maxp) int32 page ids per slot, allocated in order;
        entries past ceil(len/page) are ignored (keep them in [0, P)).
      kv_len: (B,) valid token count per slot (AFTER this step's append).
      k_scale, v_scale: optional (P, KV, 1, page) f32 dequant scale pools.
    Returns:
      (B, 1, H, hd) in q.dtype.
    """
    B, L, H, hd = q.shape
    assert L == 1, "paged decode kernel is single-token"
    P, KV, page, _ = k_pages.shape
    maxp = page_table.shape[1]
    G = H // KV
    scale = sm_scale if sm_scale is not None else hd ** -0.5

    qg = (q[:, 0] * jnp.asarray(scale, q.dtype)).reshape(B, KV, G, hd)
    qg = qg.transpose(0, 1, 2, 3).reshape(B * KV, G, hd)
    lens = kv_len.astype(jnp.int32)
    table = page_table.astype(jnp.int32)

    if RAGGED_GRID:
        # ---- compacted live-page worklist ----
        # The worklist enumerates (slot, page-within-slot) PAIRS, so its
        # true bound is sum_b ceil(kv_len[b]/page) <= B * maxp. The pool
        # size P only bounds that sum when no pool page is referenced by
        # more than one slot — which vLLM-style prefix sharing
        # (serve/batcher.py share_prefix_pages) deliberately violates:
        # slots on one scene alias the SAME prefix pages, each still doing
        # real attention work over them. Work items past W would be
        # silently dropped (garbage output blocks for the truncated
        # slots), so: when P already covers the worst case, run one
        # kernel at W = B*maxp (same thing); otherwise lax.cond between
        # the tight pool-sized worklist (common un-aliased mixes — padding
        # steps elide fetches, so fewer grid steps is pure win) and the
        # full pair-count worklist (aliased mixes).
        npages = (lens + page - 1) // page                  # (B,)
        csum = jnp.cumsum(npages)
        total = csum[-1]

        def _ragged_call(W: int):
            w = jnp.arange(W, dtype=jnp.int32)
            b_of = jnp.searchsorted(csum, w, side="right").astype(jnp.int32)
            bc = jnp.minimum(b_of, B - 1)
            starts = csum - npages                          # exclusive
            j_of = w - starts[bc]
            valid = w < total
            # padding steps repeat the LAST valid work item's indices so
            # their block fetches elide and no state is touched (jj = -1)
            lb = jnp.searchsorted(csum, total - 1, side="right") \
                .astype(jnp.int32)
            lb = jnp.minimum(lb, B - 1)
            lj = (total - 1) - starts[lb]
            wl_slot = jnp.where(valid, bc, lb)
            wl_j = jnp.where(valid, j_of, -1)
            jt = jnp.clip(jnp.where(valid, j_of, lj), 0, maxp - 1)
            wl_pid = table[wl_slot, jt]

            def rq_index(w_, sl, pid, jj, np_, ln):
                return (sl[w_], 0, 0, 0)

            def rkv_index(w_, sl, pid, jj, np_, ln):
                return (pid[w_], 0, 0, 0)

            scratch = [
                pltpu.VMEM((KV * G, 128), jnp.float32),
                pltpu.VMEM((KV * G, 128), jnp.float32),
                pltpu.VMEM((KV * G, hd), jnp.float32),
            ]
            quantized = k_scale is not None
            in_specs = [
                pl.BlockSpec((1, KV, G, hd), rq_index),
                pl.BlockSpec((1, KV, page, hd), rkv_index),
                pl.BlockSpec((1, KV, page, hd), rkv_index),
            ]
            extra = []
            if quantized:
                in_specs += [pl.BlockSpec((1, KV, 1, page), rkv_index),
                             pl.BlockSpec((1, KV, 1, page), rkv_index)]
                extra = [k_scale.astype(jnp.float32),
                         v_scale.astype(jnp.float32)]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(W,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, KV, G, hd), rq_index),
                scratch_shapes=scratch,
            )
            return pl.pallas_call(
                functools.partial(_ragged_kernel, kv_heads=KV, page=page,
                                  quantized=quantized),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
                interpret=interpret,
            )(wl_slot, wl_pid, wl_j, npages.astype(jnp.int32), lens,
              qg.reshape(B, KV, G, hd), k_pages, v_pages, *extra)

        W_full = B * maxp
        if P >= W_full:
            out = _ragged_call(W_full)
        else:
            out = jax.lax.cond(total <= P,
                               lambda: _ragged_call(P),
                               lambda: _ragged_call(W_full))
        # a lens == 0 slot appears in no work item, so its out block is
        # never written — zero it deterministically (the old full grid
        # produced NaN there; dead slots are masked by callers either way)
        out = jnp.where((lens > 0)[:, None, None, None], out,
                        jnp.zeros((), out.dtype))
        return out.reshape(B, KV * G, 1, hd).transpose(0, 2, 1, 3)

    def q_index(i, j, tbl, ln):
        return (i, 0, 0)

    def kv_index(i, j, tbl, ln):
        return (tbl[i // KV, j], i % KV, 0, 0)

    def o_index(i, j, tbl, ln):
        return (i, 0, 0)

    scratch = [
        pltpu.VMEM((G, 128), jnp.float32),
        pltpu.VMEM((G, 128), jnp.float32),
        pltpu.VMEM((G, hd), jnp.float32),
    ]
    common = dict(
        out_shape=jax.ShapeDtypeStruct((B * KV, G, hd), q.dtype),
        interpret=interpret,
    )
    if k_scale is not None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B * KV, maxp),
            in_specs=[
                pl.BlockSpec((1, G, hd), q_index),
                pl.BlockSpec((1, 1, page, hd), kv_index),
                pl.BlockSpec((1, 1, page, hd), kv_index),
                pl.BlockSpec((1, 1, 1, page), kv_index),
                pl.BlockSpec((1, 1, 1, page), kv_index),
            ],
            out_specs=pl.BlockSpec((1, G, hd), o_index),
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            functools.partial(_paged_kernel_int8, kv_heads=KV, page=page,
                              num_pages_per_slot=maxp),
            grid_spec=grid_spec, **common,
        )(table, lens, qg, k_pages, v_pages,
          k_scale.astype(jnp.float32), v_scale.astype(jnp.float32))
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B * KV, maxp),
            in_specs=[
                pl.BlockSpec((1, G, hd), q_index),
                pl.BlockSpec((1, 1, page, hd), kv_index),
                pl.BlockSpec((1, 1, page, hd), kv_index),
            ],
            out_specs=pl.BlockSpec((1, G, hd), o_index),
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            functools.partial(_paged_kernel, kv_heads=KV, page=page,
                              num_pages_per_slot=maxp),
            grid_spec=grid_spec, **common,
        )(table, lens, qg, k_pages, v_pages)
    return out.reshape(B, KV * G, 1, hd).transpose(0, 2, 1, 3)


def paged_attention_reference(q, k_pages, v_pages, page_table, kv_len,
                              sm_scale=None, k_scale=None, v_scale=None):
    """Pure-jnp oracle: gather each slot's pages densely, run masked
    attention. Used by tests to pin the kernel down bit-for-bit-ish."""
    B, _, H, hd = q.shape
    P, KV, page, _ = k_pages.shape
    maxp = page_table.shape[1]
    G = H // KV
    scale = sm_scale if sm_scale is not None else hd ** -0.5

    def dense(pool, spool):
        # (B, maxp, KV, page, hd) -> (B, KV, maxp*page, hd)
        g = pool[page_table]                          # gather pages
        g = g.transpose(0, 2, 1, 3, 4).reshape(B, KV, maxp * page, hd)
        g = g.astype(jnp.float32)
        if spool is not None:
            s = spool[page_table]                     # (B, maxp, KV, 1, page)
            s = s.transpose(0, 2, 1, 4, 3).reshape(B, KV, maxp * page, 1)
            g = g * s
        return g

    k = dense(k_pages, k_scale)
    v = dense(v_pages, v_scale)
    qf = q[:, 0].astype(jnp.float32).reshape(B, KV, G, hd) * scale
    s = jnp.einsum("bkgd,bksd->bkgs", qf, k)
    pos = jnp.arange(maxp * page)[None, None, None, :]
    s = jnp.where(pos < kv_len[:, None, None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgs,bksd->bkgd", p, v)
    return o.reshape(B, 1, H, hd).astype(q.dtype)


def paged_attention_multi(q, k_pages, v_pages, page_table, q_positions,
                          sm_scale=None, k_scale=None, v_scale=None):
    """Multi-query paged attention: L queries per slot with per-query
    causal lengths (query at global position p attends keys 0..p). The
    speculative verify forward uses this for its K+1-token block
    (models/speculative.py paged path) — the block is appended first, so
    key validity is exactly ``s <= q_position``.

    Gather-based (one dense copy of each slot's pages): the KV read itself
    is unavoidable; the extra copy costs ~2x KV traffic, which is noise
    next to the weight reads that dominate verify at 7B scale
    (BENCH_NOTES full-depth section). A scalar-prefetch multi-query kernel
    can replace this without changing the call site.

    q: (B, L, H, hd); q_positions: (B, L) global token positions.
    """
    B, L, H, hd = q.shape
    P, KV, page, _ = k_pages.shape
    maxp = page_table.shape[1]
    G = H // KV
    scale = sm_scale if sm_scale is not None else hd ** -0.5

    def dense(pool, spool):
        g = pool[page_table]                          # (B, maxp, KV, page, hd)
        g = g.transpose(0, 2, 1, 3, 4).reshape(B, KV, maxp * page, hd)
        g = g.astype(jnp.float32)
        if spool is not None:
            s = spool[page_table]                     # (B, maxp, KV, 1, page)
            s = s.transpose(0, 2, 1, 4, 3).reshape(B, KV, maxp * page, 1)
            g = g * s
        return g

    k = dense(k_pages, k_scale)
    v = dense(v_pages, v_scale)
    qf = q.astype(jnp.float32).reshape(B, L, KV, G, hd) * scale
    s = jnp.einsum("blkgd,bksd->blkgs", qf, k)     # (B, L, KV, G, S)
    pos = jnp.arange(maxp * page)[None, None, None, None, :]
    ok = pos <= q_positions[:, :, None, None, None]
    s = jnp.where(ok, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("blkgs,bksd->blkgd", p, v)
    return o.reshape(B, L, H, hd).astype(q.dtype)
