"""Paged KV cache: shared page pool + per-slot page tables.

Replaces the dense per-slot cache (models/qwen2.py KVCache, which reserves
num_slots x max_len for every slot) for the continuous-batching serve path:
HBM scales with total live tokens, so 8 slots where one holds 32k tokens
and seven hold 2k cost ~46k tokens of pool instead of 8 x 32k = 256k. The
reference's HF dense cache (qwen2/modeling_qwen2.py:330-632) has no
analogue; this is the TPU-first equivalent of vLLM's paged KV.

Device side: ``PagedKVCache`` (pools + table + lens) with jitted
``append_decode_kv`` / ``write_prefill`` scatters and the scalar-prefetch
attention kernel (kernels/paged_attention.py). Host side: ``PageAllocator``
(free-list) decides which pages each slot owns; allocation happens on the
scheduler thread BETWEEN jitted chunks, so the device never sees dynamic
shapes — the table is a fixed (num_slots, max_pages) int32 array and
capacity for a decode chunk is reserved up front (``pages_needed``).

Pool layout is FLAT (layers, P, page, KV*hd) — each token row stores its
heads contiguously, mirroring the dense KVCache (r5): the flat shape's
default XLA layout equals the pallas operand layout, so the stacked pools
thread through every layer's append + kernel read with zero relayout
copies (the head-split (.., KV, page, hd) layout measured 164 ms/step at
the 32k mix when threaded). Scale pools (int8) store
(layers, P, KV, 1, page) keeping the page dim on lanes.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from video3d_tpu.config import LLMConfig
from video3d_tpu.models.qwen2 import QUANT_KV_DTYPES


class PagedKVCache(NamedTuple):
    """k/v: (layers, P, page, KV*hd) FLAT pools; int8 pools add
    (layers, P, KV, 1, page) f32 scale pools. page_table: (S, maxp) int32
    (entries past a slot's allocation must stay in [0, P) — unused ones
    are length-masked, never dereferenced out of bounds). lens: (S,)
    valid tokens per slot."""

    k: jax.Array
    v: jax.Array
    page_table: jax.Array
    lens: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]

    @property
    def num_slots(self) -> int:
        return self.page_table.shape[0]

    @property
    def max_pages(self) -> int:
        return self.page_table.shape[1]

    @classmethod
    def zeros(cls, cfg: LLMConfig, num_pages: int, page_size: int,
              num_slots: int, max_pages: int, dtype=jnp.bfloat16):
        shape = (cfg.num_hidden_layers, num_pages, page_size,
                 cfg.num_key_value_heads * cfg.head_dim)
        table = jnp.zeros((num_slots, max_pages), jnp.int32)
        lens = jnp.zeros((num_slots,), jnp.int32)
        if dtype in QUANT_KV_DTYPES:
            sshape = shape[:2] + (cfg.num_key_value_heads, 1, page_size)
            return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                       table, lens,
                       jnp.zeros(sshape, jnp.float32),
                       jnp.zeros(sshape, jnp.float32))
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   table, lens)


class PageAllocator:
    """Host-side free-list over the pool's page ids (scheduler thread).

    Page 0 is reserved as the always-valid filler for unused page-table
    entries (the kernel's index_map dereferences every entry, so they must
    be in range; length masking makes the loaded data irrelevant)."""

    def __init__(self, num_pages: int):
        self._free: List[int] = list(range(num_pages - 1, 0, -1))
        self.num_pages = num_pages

    @property
    def available(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise MemoryError(
                f"page pool exhausted: want {n}, have {len(self._free)}")
        out = [self._free.pop() for _ in range(n)]
        return out

    def free(self, pages: List[int]) -> None:
        for p in pages:
            if not 0 < p < self.num_pages:
                raise ValueError(f"bad page id {p}")
        self._free.extend(pages)


def pages_needed(num_tokens: int, page_size: int) -> int:
    return -(-num_tokens // page_size)


def set_slot_pages(cache: PagedKVCache, slot: int,
                   pages: List[int]) -> PagedKVCache:
    """Host-side: install a slot's page list (padding with page 0)."""
    row = pages + [0] * (cache.max_pages - len(pages))
    assert len(row) == cache.max_pages, "too many pages for table width"
    table = cache.page_table.at[slot].set(jnp.asarray(row, jnp.int32))
    return cache._replace(page_table=table)


def _scatter_dense_pages(cache: PagedKVCache, dense, pages: jax.Array,
                         n_pages: int, skip_pages: int = 0) -> PagedKVCache:
    """Pool-only scatter: copy dense positions [skip*page, n_pages*page)
    of a B=1 dense cache into the ``n_pages - skip_pages`` pool pages
    listed in ``pages`` (int8 caches copy values AND scales — no
    requantization). Table/lens untouched (callers own those)."""
    page = cache.page_size
    L = dense.k.shape[2]
    assert L >= n_pages * page, (L, n_pages, page)
    n = n_pages - skip_pages

    def scat_flat(pool, dn):
        # dense FLAT (layers, 1, L, C) -> (layers, n, page, C) pages:
        # a straight reshape, no transpose (both sides are flat, r5)
        lay = dn.shape[0]
        blk = dn[:, 0, skip_pages * page:n_pages * page].reshape(
            lay, n, page, -1)
        return pool.at[:, pages].set(blk.astype(pool.dtype))

    def scat_scale(pool, dn):
        # dense scales (layers, 1, L, KV, 1) -> (layers, n, KV, 1, page)
        lay, KV = dn.shape[0], dn.shape[3]
        blk = dn[:, 0, skip_pages * page:n_pages * page].reshape(
            lay, n, page, KV, 1)
        blk = blk.transpose(0, 1, 3, 4, 2)            # -> (lay,n,KV,1,page)
        return pool.at[:, pages].set(blk.astype(pool.dtype))

    out = cache._replace(k=scat_flat(cache.k, dense.k),
                         v=scat_flat(cache.v, dense.v))
    if cache.k_scale is not None:
        out = out._replace(
            k_scale=scat_scale(cache.k_scale, dense.k_scale),
            v_scale=scat_scale(cache.v_scale, dense.v_scale))
    return out


def transplant_dense(cache: PagedKVCache, dense, slot, page_row: jax.Array,
                     n_pages: int, length,
                     skip_pages: int = 0) -> PagedKVCache:
    """Copy a freshly-prefilled B=1 dense cache (models/qwen2.py KVCache)
    into ``slot``'s pages ``skip_pages..n_pages`` verbatim (int8 caches
    transplant values AND scales — no requantization), install the page
    row and set ``lens[slot] = length``. Shared by the plain paged insert
    (models/generate.py insert_paged_slot) and the paged speculative
    insert (models/speculative.py).

    ``skip_pages > 0`` is the shared-prefix path (serve/batcher.py): the
    row's first ``skip_pages`` entries reference immutable scene-prefix
    pages already holding identical KV (scatter_shared_prefix), so only
    the boundary page (prefix tail + suffix) and later pages are copied.
    """
    pages = page_row[skip_pages:n_pages]
    out = _scatter_dense_pages(cache, dense, pages, n_pages, skip_pages)
    return out._replace(
        page_table=out.page_table.at[slot].set(page_row),
        lens=out.lens.at[slot].set(length))


def scatter_shared_prefix(cache: PagedKVCache, prefix,
                          pages: jax.Array, n_pages: int) -> PagedKVCache:
    """Write a scene-prefix dense KV slice (layers, 1, P, KV, hd — the
    engine's _PrefixEntry.cache) into ``n_pages`` pool pages, once per
    scene. Later admissions on the scene reference these pages in their
    table rows instead of carrying a private copy (transplant_dense
    ``skip_pages``) — vLLM-style prefix block sharing: S concurrent
    requests on one scene hold one copy of the ~1700-token prefix KV
    instead of S. The pages are immutable by construction: every write
    lands at positions >= the owner's prefill length > n_pages * page."""
    return _scatter_dense_pages(cache, prefix, pages, n_pages, 0)


def _quantize_kv(x: jax.Array, dtype=jnp.int8):
    """(..., hd) -> int8/int4 values + (..., 1) f32 scales (same symmetric
    per-token-per-head rule as models/qwen2.py:_quantize_kv)."""
    qmax = 7.0 if dtype == jnp.int4 else 127.0
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / qmax,
                        1e-8)
    q = jnp.clip(jnp.round(xf / scale), -qmax, qmax).astype(dtype)
    return q, scale


def write_prefill(cache: PagedKVCache, layer: int, k_seq: jax.Array,
                  v_seq: jax.Array, slot: int | jax.Array,
                  start_page_idx: int = 0) -> PagedKVCache:
    """Scatter a prefilled (L, KV, hd) sequence into the slot's pages.

    L must be a multiple of page_size (right-pad K/V with anything; the
    padded tail is length-masked at attention time). The slot's page table
    row must already hold the target page ids (set_slot_pages).
    """
    L, KV, hd = k_seq.shape
    page = cache.page_size
    assert L % page == 0, (L, page)
    n = L // page

    def to_pages(x):
        # (L, KV, hd) -> flat (n, page, KV*hd): a straight reshape (r5)
        return x.reshape(n, page, KV * hd)

    pages = jax.lax.dynamic_slice_in_dim(
        cache.page_table[slot], start_page_idx, n)

    def scat(pool, new):
        return pool.at[layer, pages].set(new.astype(pool.dtype))

    if cache.k_scale is not None:
        kq, ks = _quantize_kv(k_seq, cache.k.dtype)
        vq, vs = _quantize_kv(v_seq, cache.k.dtype)
        return cache._replace(
            k=scat(cache.k, to_pages(kq)),
            v=scat(cache.v, to_pages(vq)),
            # (L, KV, 1) -> (n, KV, 1, page)
            k_scale=cache.k_scale.at[layer, pages].set(
                ks.reshape(n, page, KV, 1).transpose(0, 2, 3, 1)),
            v_scale=cache.v_scale.at[layer, pages].set(
                vs.reshape(n, page, KV, 1).transpose(0, 2, 3, 1)))
    return cache._replace(k=scat(cache.k, to_pages(k_seq)),
                          v=scat(cache.v, to_pages(v_seq)))


def append_positions(cache: PagedKVCache,
                     active: Optional[jax.Array] = None):
    """(pids, off) scatter coordinates for appending one token per slot at
    position ``lens[s]``. ``active`` (S,) bool redirects dead slots to the
    reserved scratch page 0 offset 0 — a sacrificial location never covered
    by any slot's length (PageAllocator never hands out page 0)."""
    page = cache.page_size
    pidx = cache.lens // page                       # (S,)
    off = cache.lens % page
    pids = jnp.take_along_axis(cache.page_table, pidx[:, None],
                               axis=1)[:, 0]        # (S,)
    if active is not None:
        pids = jnp.where(active, pids, 0)
        off = jnp.where(active, off, 0)
    return pids, off


def append_positions_multi(cache: PagedKVCache, L: int,
                           active: Optional[jax.Array] = None):
    """(pids, off) scatter coordinates, both (S, L), for appending ``L``
    consecutive tokens per slot at positions ``lens[s] .. lens[s]+L-1``
    (page boundaries inside the block are handled per token). Dead slots
    redirect to the scratch page like :func:`append_positions`. Used by
    the speculative verify forward, which writes its K+1-token block in
    one pass (models/speculative.py paged path)."""
    page = cache.page_size
    pos = cache.lens[:, None] + jnp.arange(L)[None]     # (S, L)
    pidx = jnp.minimum(pos // page, cache.max_pages - 1)
    off = pos % page
    pids = jnp.take_along_axis(cache.page_table, pidx, axis=1)   # (S, L)
    if active is not None:
        pids = jnp.where(active[:, None], pids, 0)
        off = jnp.where(active[:, None], off, 0)
    return pids, off


def append_layer_kv(pools, k_new: jax.Array, v_new: jax.Array,
                    pids: jax.Array, off: jax.Array, layer=None):
    """Append new tokens into the pools.

    ``layer=None`` (legacy / tests): pools are ONE layer's FLAT views
    with k_pages (P, page, KV*hd); the write is an advanced-index scatter.

    ``layer=i`` (the r5 stacked-threading decode path): pools are the
    WHOLE stacked flat (layers, P, page, KV*hd) buffers and the write is
    a chain of per-(slot, token) ``dynamic_update_slice``s at
    (layer, pid, off) — XLA lowers the batched scatter to select
    fusions that re-write the ENTIRE pool per layer per step (the same
    disease the dense cache had, BENCH_NOTES r5 32k-decode section), and
    per-layer slicing + restacking of the pools re-writes them again.

    k_new/v_new: (S, KV, hd) with pids/off (S,) from
    :func:`append_positions` — or (S, L, KV, hd) with (S, L) coordinates
    from :func:`append_positions_multi`. Returns the updated 4-tuple.
    """
    k_pages, v_pages, ks_pages, vs_pages = pools
    quant = ks_pages is not None
    if quant:
        kq, ks = _quantize_kv(k_new, k_pages.dtype)
        vq, vs = _quantize_kv(v_new, k_pages.dtype)
    KV = k_new.shape[-2]
    if layer is None:
        # flat per-layer pools (P, page, C): flatten the token rows
        kf = (kq if quant else k_new.astype(k_pages.dtype)) \
            .reshape(*k_new.shape[:-2], KV * k_new.shape[-1])
        vf = (vq if quant else v_new.astype(v_pages.dtype)) \
            .reshape(*v_new.shape[:-2], KV * v_new.shape[-1])
        if quant:
            return (k_pages.at[pids, off].set(kf),
                    v_pages.at[pids, off].set(vf),
                    ks_pages.at[pids, :, 0, off].set(ks[..., 0]),
                    vs_pages.at[pids, :, 0, off].set(vs[..., 0]))
        return (k_pages.at[pids, off].set(kf),
                v_pages.at[pids, off].set(vf), None, None)

    li = jnp.asarray(layer, jnp.int32)
    multi = pids.ndim == 2
    S = pids.shape[0]
    Lb = pids.shape[1] if multi else 1
    pid2 = pids.reshape(S, Lb)
    off2 = off.reshape(S, Lb)
    if not quant:
        kq, vq = k_new, v_new
        ks = vs = None
    C = KV * k_new.shape[-1]
    kq3 = kq.reshape(S, Lb, C)
    vq3 = vq.reshape(S, Lb, C)

    def write(pool, val, scale_pool=False):
        def body(i, p):
            s, l = i // Lb, i % Lb
            pid = pid2[s, l].astype(jnp.int32)
            o = off2[s, l].astype(jnp.int32)
            if scale_pool:
                # pool (layers, P, KV, 1, page); val (S, Lb, KV)
                row = jax.lax.dynamic_slice(val, (s, l, 0), (1, 1, KV))
                upd = row.reshape(1, 1, KV, 1, 1)
                idx = (li, pid, jnp.int32(0), jnp.int32(0), o)
            else:
                # pool (layers, P, page, C); val (S, Lb, C)
                row = jax.lax.dynamic_slice(val, (s, l, 0), (1, 1, C))
                upd = row.reshape(1, 1, 1, C)
                idx = (li, pid, o, jnp.int32(0))
            return jax.lax.dynamic_update_slice(p, upd.astype(p.dtype), idx)

        return jax.lax.fori_loop(0, S * Lb, body, pool)

    out = (write(k_pages, kq3), write(v_pages, vq3))
    if quant:
        out += (write(ks_pages, ks.reshape(S, Lb, KV), True),
                write(vs_pages, vs.reshape(S, Lb, KV), True))
    else:
        out += (None, None)
    return out


def append_decode_kv(cache: PagedKVCache, layer: int, k_new: jax.Array,
                     v_new: jax.Array,
                     active: Optional[jax.Array] = None) -> PagedKVCache:
    """Append one token per slot into one layer of the full cache (test /
    single-layer convenience; the decode stack uses :func:`append_layer_kv`
    on per-layer views and restacks). Callers bump ``lens`` once per step
    via :func:`advance_lens` (NOT per layer)."""
    pids, off = append_positions(cache, active)
    k_p, v_p, ks_p, vs_p = append_layer_kv(
        layer_view(cache, layer), k_new, v_new, pids, off)
    out = cache._replace(k=cache.k.at[layer].set(k_p),
                         v=cache.v.at[layer].set(v_p))
    if ks_p is not None:
        out = out._replace(k_scale=cache.k_scale.at[layer].set(ks_p),
                           v_scale=cache.v_scale.at[layer].set(vs_p))
    return out


def advance_lens(cache: PagedKVCache,
                 active: Optional[jax.Array] = None) -> PagedKVCache:
    """+1 token on every (active) slot — once per decode step."""
    inc = 1 if active is None else active.astype(jnp.int32)
    return cache._replace(lens=cache.lens + inc)


def layer_view(cache: PagedKVCache, layer: int):
    """The per-layer tuple decoder layers consume: (k_pages, v_pages,
    k_scale_pages|None, v_scale_pages|None)."""
    if cache.k_scale is not None:
        return (cache.k[layer], cache.v[layer],
                cache.k_scale[layer], cache.v_scale[layer])
    return (cache.k[layer], cache.v[layer], None, None)
