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

r5 redesign, mirroring kernels/decode_attention.py:

  * **Flat page layout** (layers, P, page, KV*hd): heads stored FLAT per
    token row. The default XLA layout of this shape is the layout the
    pallas custom-call mandates, so the WHOLE stacked pool threads
    through every layer's dus-append + kernel-read with zero copies
    (head-split (.., KV, page, hd) pools got a custom XLA layout and the
    stacked-threading step relayout-copied 1.08 GiB per layer call —
    164 ms/step measured at the 32k mix).
  * **Block-diagonal head fold**: one dot pair per page for ALL kv heads
    (queries packed block-diagonal (KV*G, KV*hd); context extracted from
    the diagonal slices), replacing the per-head unrolled loop.
  * **Layer id on the scalar-prefetch channel**: all layers share one
    compiled kernel; the BlockSpec index map selects (layer, page).
  * bf16 MXU inputs + f32 accumulation (int cache values exact in bf16).

The ragged live-page worklist (r4) is retained: the grid walks
(slot, page) pairs of LIVE pages only, sized by the pair count when
prefix-page sharing can alias pool pages across slots (r4 advisor fix).

The reference has no analogue (HF transformers dense cache,
qwen2/modeling_qwen2.py:330-632); this replaces it for the continuous
batching serve path (serve/batcher.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _head_rows(x, KV: int, G: int):
    """(KV, page) -> (KV*G, page), each head's row repeated G times in
    head-major order (``pltpu.repeat`` tiles, so build from slices)."""
    return jnp.concatenate(
        [x[kv:kv + 1] for kv in range(KV) for _ in range(G)], axis=0)


def _ragged_kernel(meta_ref, slot_ref, pid_ref, jj_ref, npages_ref,
                   len_ref, q_ref, kf_ref, vf_ref, *rest, kv_heads: int,
                   group: int, head_dim: int, page: int, quantized: bool):
    """Ragged-worklist paged attention over flat pages.

    Work item w = (slot, page-within-slot); slot runs are contiguous so
    the online-softmax scratch carries across a slot's pages and
    finalizes on its last page; padding steps (jj < 0) repeat the last
    valid indices (fetches elide) and touch nothing.
    """
    if quantized:
        ks_ref, vs_ref, o_ref, qb_scr, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, qb_scr, m_scr, l_scr, acc_scr = rest
    w = pl.program_id(0)
    j = jj_ref[w]
    b = slot_ref[w]
    valid = j >= 0
    kv_len = len_ref[b]
    last = valid & (j == npages_ref[b] - 1)
    KV, G, hd = kv_heads, group, head_dim

    fast = kf_ref.dtype != jnp.float32
    cdt = jnp.bfloat16 if fast else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)

    @pl.when(valid & (j == 0))
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        qb_scr[:] = jnp.zeros_like(qb_scr)
        for kv in range(KV):
            qb_scr[kv * G:(kv + 1) * G, kv * hd:(kv + 1) * hd] = \
                q_ref[0, kv].astype(qb_scr.dtype)

    @pl.when(valid)
    def _step():
        kf = kf_ref[0, 0].astype(cdt)                     # (page, KV*hd)
        s = jax.lax.dot_general(
            qb_scr[...].astype(cdt), kf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                               # (KV*G, page)
        if quantized:
            s = s * _head_rows(ks_ref[0, 0, :, 0, :], KV, G)
        pos = j * page + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < kv_len, s, NEG_INF)
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * _head_rows(vs_ref[0, 0, :, 0, :], KV, G)
        # reused pool pages hold stale but FINITE values (zeros-init,
        # int8/bf16 garbage) — masked p entries are exactly 0
        p = jnp.where(pos < kv_len, p, 0.0)
        vf = vf_ref[0, 0].astype(cdt)
        o_all = jax.lax.dot_general(
            p.astype(cdt), vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                               # (KV*G, KV*hd)
        acc_scr[:] = acc_scr[:] * alpha
        for kv in range(KV):
            rows = pl.ds(kv * G, G)
            acc_scr[rows, :] = acc_scr[rows, :] + \
                o_all[kv * G:(kv + 1) * G, kv * hd:(kv + 1) * hd]

    @pl.when(last)
    def _finish():
        for kv in range(KV):
            rows = pl.ds(kv * G, G)
            o_ref[0, kv] = (acc_scr[rows, :]
                            / jnp.maximum(l_scr[rows, :1], 1e-30)) \
                .astype(o_ref.dtype)


# escape hatch for A/B (scripts/bench/paged_batcher.py --full-grid):
# False routes through the gather-based reference (the r3/r4 head-sliced
# full-grid kernels are retired with the flat-page layout; their A/B
# numbers live in BENCH_NOTES r4)
RAGGED_GRID = True


def paged_decode_attention(q: jax.Array, k_pages: jax.Array,
                           v_pages: jax.Array, page_table: jax.Array,
                           kv_len: jax.Array,
                           sm_scale: float | None = None,
                           k_scale: jax.Array | None = None,
                           v_scale: jax.Array | None = None,
                           layer: jax.Array | int | None = None,
                           kv_heads: int | None = None,
                           interpret: bool = False) -> jax.Array:
    """Fused paged attention for one decode step (one layer).

    Args:
      q: (B, 1, H, hd) single-position queries (B = slot count).
      k_pages, v_pages: flat page pools — (P, page, KV*hd) for one layer,
        or the whole STACKED (layers, P, page, KV*hd) pools with
        ``layer`` selecting the layer via the scalar-prefetch channel;
        int8 when k_scale/v_scale are given.
      page_table: (B, maxp) int32 page ids per slot, allocated in order;
        entries past ceil(len/page) are ignored (keep them in [0, P)).
      kv_len: (B,) valid token count per slot (AFTER this step's append).
      k_scale, v_scale: optional (.., P, KV, 1, page) f32 dequant pools.
      kv_heads: the KV head count (the flat last dim can't express it).
    Returns:
      (B, 1, H, hd) in q.dtype.
    """
    B, L, H, hd = q.shape
    assert L == 1, "paged decode kernel is single-token"
    stacked = k_pages.ndim == 4
    if not stacked:
        k_pages, v_pages = k_pages[None], v_pages[None]   # free views
        if k_scale is not None:
            k_scale, v_scale = k_scale[None], v_scale[None]
        layer = 0
    NL, P, page, C = k_pages.shape
    KV = kv_heads if kv_heads is not None else C // hd
    maxp = page_table.shape[1]
    G = H // KV
    scale = sm_scale if sm_scale is not None else hd ** -0.5

    qg = (q[:, 0] * jnp.asarray(scale, q.dtype)).reshape(B, KV, G, hd)
    lens = kv_len.astype(jnp.int32)
    table = page_table.astype(jnp.int32)

    if not RAGGED_GRID:
        kl, vl = k_pages[layer], v_pages[layer]
        ksl = vsl = None
        if k_scale is not None:
            ksl, vsl = k_scale[layer], v_scale[layer]
        return paged_attention_reference(q, kl, vl, page_table, kv_len,
                                         sm_scale=sm_scale, k_scale=ksl,
                                         v_scale=vsl, kv_heads=KV)

    # ---- compacted live-page worklist ----
    # Work items are (slot, page-within-slot) PAIRS, so the true bound is
    # sum_b ceil(kv_len[b]/page) <= B * maxp. The pool size P only bounds
    # that sum when no pool page is aliased across slots — which
    # vLLM-style prefix sharing (serve/batcher.py share_prefix_pages)
    # deliberately violates. Dropped work items would silently corrupt the
    # truncated slots, so: one kernel at W = B*maxp when P covers it,
    # otherwise lax.cond between the tight pool-sized worklist and the
    # full pair-count worklist (r4 advisor fix).
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

        def rq_index(w_, m, sl, pid, jj, np_, ln):
            return (sl[w_], 0, 0, 0)

        def rkv_index(w_, m, sl, pid, jj, np_, ln):
            return (m[0], pid[w_], 0, 0)

        def rsc_index(w_, m, sl, pid, jj, np_, ln):
            return (m[0], pid[w_], 0, 0, 0)

        qb_dtype = (jnp.float32 if k_pages.dtype == jnp.float32
                    else jnp.bfloat16)
        scratch = [
            pltpu.VMEM((KV * G, KV * hd), qb_dtype),
            pltpu.VMEM((KV * G, 128), jnp.float32),
            pltpu.VMEM((KV * G, 128), jnp.float32),
            pltpu.VMEM((KV * G, hd), jnp.float32),
        ]
        quantized = k_scale is not None
        in_specs = [
            pl.BlockSpec((1, KV, G, hd), rq_index),
            pl.BlockSpec((1, 1, page, C), rkv_index),
            pl.BlockSpec((1, 1, page, C), rkv_index),
        ]
        extra = []
        if quantized:
            in_specs += [pl.BlockSpec((1, 1, KV, 1, page), rsc_index),
                         pl.BlockSpec((1, 1, KV, 1, page), rsc_index)]
            extra = [k_scale.astype(jnp.float32),
                     v_scale.astype(jnp.float32)]
        meta = jnp.asarray([0 if layer is None else layer], jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(W,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, KV, G, hd), rq_index),
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            functools.partial(_ragged_kernel, kv_heads=KV, group=G,
                              head_dim=hd, page=page, quantized=quantized),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
            interpret=interpret,
        )(meta, wl_slot, wl_pid, wl_j, npages.astype(jnp.int32), lens,
          qg, k_pages, v_pages, *extra)

    W_full = B * maxp
    if P >= W_full:
        out = _ragged_call(W_full)
    else:
        out = jax.lax.cond(total <= P,
                           lambda: _ragged_call(P),
                           lambda: _ragged_call(W_full))
    # a lens == 0 slot appears in no work item, so its out block is
    # never written — zero it deterministically (dead slots are masked
    # by callers either way)
    out = jnp.where((lens > 0)[:, None, None, None], out,
                    jnp.zeros((), out.dtype))
    return out.reshape(B, KV * G, 1, hd).transpose(0, 2, 1, 3)


def _dense_from_pages(pool, spool, page_table, KV):
    """Gather a flat page pool into (B, S, KV, hd) f32 rows (oracle)."""
    B, maxp = page_table.shape
    P, page, C = pool.shape
    g = pool[page_table]                           # (B, maxp, page, C)
    g = g.reshape(B, maxp * page, KV, C // KV).astype(jnp.float32)
    if spool is not None:
        s = spool[page_table]                      # (B, maxp, KV, 1, page)
        s = s.transpose(0, 1, 4, 2, 3).reshape(B, maxp * page, KV, 1)
        g = g * s
    return g


def paged_attention_reference(q, k_pages, v_pages, page_table, kv_len,
                              sm_scale=None, k_scale=None, v_scale=None,
                              kv_heads=None):
    """Pure-jnp oracle over ONE layer's flat pools: gather each slot's
    pages densely, run masked attention. Pins the kernel down in tests."""
    B, _, H, hd = q.shape
    P, page, C = k_pages.shape
    KV = kv_heads if kv_heads is not None else C // hd
    maxp = page_table.shape[1]
    G = H // KV
    scale = sm_scale if sm_scale is not None else hd ** -0.5

    k = _dense_from_pages(k_pages, k_scale, page_table, KV)
    v = _dense_from_pages(v_pages, v_scale, page_table, KV)
    k = k.transpose(0, 2, 1, 3)                    # (B, KV, S, hd)
    v = v.transpose(0, 2, 1, 3)
    qf = q[:, 0].astype(jnp.float32).reshape(B, KV, G, hd) * scale
    s = jnp.einsum("bkgd,bksd->bkgs", qf, k)
    pos = jnp.arange(maxp * page)[None, None, None, :]
    s = jnp.where(pos < kv_len[:, None, None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgs,bksd->bkgd", p, v)
    return o.reshape(B, 1, H, hd).astype(q.dtype)


def paged_attention_multi(q, k_pages, v_pages, page_table, q_positions,
                          sm_scale=None, k_scale=None, v_scale=None,
                          kv_heads=None):
    """Multi-query paged attention over ONE layer's flat pools: L queries
    per slot with per-query causal lengths (query at global position p
    attends keys 0..p). The speculative verify forward uses this for its
    K+1-token block (models/speculative.py paged path) — the block is
    appended first, so key validity is exactly ``s <= q_position``.

    Gather-based (one dense copy of each slot's pages): the KV read
    itself is unavoidable; the extra copy costs ~2x KV traffic, which is
    noise next to the weight reads that dominate verify at 7B scale.

    q: (B, L, H, hd); q_positions: (B, L) global token positions.
    """
    B, L, H, hd = q.shape
    P, page, C = k_pages.shape
    KV = kv_heads if kv_heads is not None else C // hd
    maxp = page_table.shape[1]
    G = H // KV
    scale = sm_scale if sm_scale is not None else hd ** -0.5

    k = _dense_from_pages(k_pages, k_scale, page_table, KV) \
        .transpose(0, 2, 1, 3)                     # (B, KV, S, hd)
    v = _dense_from_pages(v_pages, v_scale, page_table, KV) \
        .transpose(0, 2, 1, 3)
    qf = q.astype(jnp.float32).reshape(B, L, KV, G, hd) * scale
    s = jnp.einsum("blkgd,bksd->blkgs", qf, k)     # (B, L, KV, G, S)
    pos = jnp.arange(maxp * page)[None, None, None, None, :]
    ok = pos <= q_positions[:, :, None, None, None]
    s = jnp.where(ok, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("blkgs,bksd->blkgd", p, v)
    return o.reshape(B, L, H, hd).astype(q.dtype)
