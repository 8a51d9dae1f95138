"""Paged KV cache: kernel vs oracle, paged decode vs dense decode, pool
management. The serving-side replacement for the dense per-slot cache —
reference has no analogue (HF dense cache, qwen2/modeling_qwen2.py:330-632).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.config import LLMConfig


def tiny_cfg(**kw):
    base = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2, head_dim=16,
                vocab_size=97, max_position_embeddings=512,
                rope_theta=10000.0, mrope_section=(4, 2, 2))
    base.update(kw)
    return LLMConfig(**base)


def random_pool(rng, P, KV, page, hd, int8=False):
    # r5 flat page layout: (P, page, KV*hd); scales stay (P, KV, 1, page)
    k = rng.standard_normal((P, page, KV, hd)).astype(np.float32)
    v = rng.standard_normal((P, page, KV, hd)).astype(np.float32)
    if not int8:
        return (jnp.asarray(k.reshape(P, page, KV * hd), jnp.bfloat16),
                jnp.asarray(v.reshape(P, page, KV * hd), jnp.bfloat16),
                None, None)
    ks = np.abs(k).max(axis=-1, keepdims=True) / 127.0 + 1e-8
    vs = np.abs(v).max(axis=-1, keepdims=True) / 127.0 + 1e-8
    kq = np.clip(np.round(k / ks), -127, 127).astype(np.int8)
    vq = np.clip(np.round(v / vs), -127, 127).astype(np.int8)
    # values flat; scales (P, page, KV, 1) -> (P, KV, 1, page)
    return (jnp.asarray(kq.reshape(P, page, KV * hd)),
            jnp.asarray(vq.reshape(P, page, KV * hd)),
            jnp.asarray(ks.transpose(0, 2, 3, 1)),
            jnp.asarray(vs.transpose(0, 2, 3, 1)))


class TestPagedKernel:
    @pytest.mark.parametrize("int8", [False, True])
    def test_interpret_matches_oracle(self, int8):
        """Pallas kernel (interpret) == gather-based jnp oracle on random
        pools, shuffled page tables, heterogeneous lengths."""
        from video3d_tpu.kernels.paged_attention import (
            paged_attention_reference, paged_decode_attention)

        rng = np.random.default_rng(0)
        B, H, KV, hd, page, P, maxp = 3, 4, 2, 128, 128, 7, 3
        q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.bfloat16)
        k_p, v_p, ks_p, vs_p = random_pool(rng, P, KV, page, hd, int8=int8)
        # distinct pages per slot, shuffled order
        table = np.stack([rng.permutation(P - 1)[:maxp] + 1
                          for _ in range(B)]).astype(np.int32)
        lens = jnp.asarray([1, page + 7, maxp * page], jnp.int32)

        out = paged_decode_attention(q, k_p, v_p, jnp.asarray(table), lens,
                                     k_scale=ks_p, v_scale=vs_p,
                                     interpret=True)
        ref = paged_attention_reference(q, k_p, v_p, jnp.asarray(table),
                                        lens, k_scale=ks_p, v_scale=vs_p)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2)

    def test_oracle_matches_dense_mha(self):
        """The paged oracle itself == dense mha_reference when pages are
        laid out contiguously (ties paged semantics to the proven dense
        attention)."""
        from video3d_tpu.kernels.attention import mha_reference
        from video3d_tpu.kernels.paged_attention import (
            paged_attention_reference)

        rng = np.random.default_rng(1)
        B, H, KV, hd, page, maxp = 2, 4, 2, 16, 8, 4
        S = page * maxp
        q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, S, KV, hd)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, S, KV, hd)), jnp.float32)
        lens = jnp.asarray([5, S], jnp.int32)

        # contiguous page layout: slot b owns pages [b*maxp .. b*maxp+maxp)
        P = B * maxp
        k_pool = k.reshape(P, page, KV * hd)
        v_pool = v.reshape(P, page, KV * hd)
        table = jnp.asarray(
            np.arange(P, dtype=np.int32).reshape(B, maxp))

        paged = paged_attention_reference(q, k_pool, v_pool, table, lens)
        dense = mha_reference(q, k, v, q_positions=(lens - 1)[:, None],
                              kv_len=lens)
        np.testing.assert_allclose(np.asarray(paged), np.asarray(dense),
                                   atol=1e-5, rtol=1e-5)


class TestPagedDecodeStack:
    @pytest.mark.parametrize("kv_dtype", ["bfloat16", "int8", "int4"])
    def test_matches_dense_decode(self, kv_dtype):
        """Full qwen2 stack: paged decode == dense-cache decode, step by
        step, with heterogeneous prefill lengths and shuffled pages.
        Quantized pools (int8/int4) transplant the SAME quantized values +
        scales the dense cache holds, so parity is exact per step."""
        from video3d_tpu.models import paged_kv, qwen2

        cfg = tiny_cfg()
        rng = np.random.default_rng(2)
        key = jax.random.PRNGKey(0)
        params = qwen2.init_qwen2(key, cfg, dtype=jnp.float32)
        dtype = {"int8": jnp.int8, "int4": jnp.int4,
                 "bfloat16": jnp.bfloat16}[kv_dtype]
        int8 = kv_dtype != "bfloat16"

        B, page, maxp = 2, 8, 6
        prefill_lens = [11, 24]
        max_len = page * maxp
        D = cfg.hidden_size

        # ---- dense prefill (ground truth) ----
        L0 = max(prefill_lens)
        embeds = jnp.asarray(rng.standard_normal((B, L0, D)) * 0.1,
                             jnp.float32)
        pos = jnp.broadcast_to(jnp.arange(L0)[None, :, None], (B, L0, 3))
        dense = qwen2.KVCache.zeros(cfg, B, max_len, dtype=dtype)
        kv_len = jnp.asarray(prefill_lens, jnp.int32)
        h_dense, dense = qwen2.qwen2_forward(
            params, cfg, embeds, pos, kv_cache=dense,
            cache_positions=jnp.broadcast_to(jnp.arange(L0)[None], (B, L0)),
            kv_len=kv_len, prefill=True)

        # ---- paged cache, transplanted from the SAME quantized data ----
        cache = paged_kv.PagedKVCache.zeros(
            cfg, num_pages=B * maxp + 3, page_size=page, num_slots=B,
            max_pages=maxp, dtype=dtype)
        alloc = paged_kv.PageAllocator(cache.num_pages)
        pages = {}
        for b in range(B):
            pages[b] = alloc.alloc(maxp)       # full table; tail unused
            rng.shuffle(pages[b])
            cache = paged_kv.set_slot_pages(cache, b, pages[b])

        def transplant(pool, dense_rows, scale=False):
            # r5 flat layouts: dense rows (layers, B, max_len, C) -> flat
            # (layers, page, C) page blocks; scales transpose to
            # (layers, KV, 1, page)
            out = pool
            for b in range(B):
                rows = dense_rows[:, b]
                for j in range(maxp):
                    chunk = rows[:, j * page:(j + 1) * page]
                    if scale:                  # (layers, page, KV, 1)
                        blk = chunk.transpose(0, 2, 3, 1)
                    else:                      # (layers, page, C) already
                        blk = chunk
                    out = out.at[:, pages[b][j]].set(blk)
            return out

        cache = cache._replace(
            k=transplant(cache.k, dense.k), v=transplant(cache.v, dense.v),
            lens=kv_len)
        if int8:
            cache = cache._replace(
                k_scale=transplant(cache.k_scale, dense.k_scale, scale=True),
                v_scale=transplant(cache.v_scale, dense.v_scale, scale=True))

        # ---- decode steps through both paths ----
        pos_d = kv_len
        for step in range(page + 2):           # cross a page boundary
            x = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.1,
                            jnp.float32)
            p3 = jnp.broadcast_to(pos_d[:, None, None], (B, 1, 3))
            h_ref, dense = qwen2.qwen2_forward(
                params, cfg, x, p3, kv_cache=dense,
                cache_positions=pos_d[:, None], kv_len=pos_d + 1)
            h_paged, cache = qwen2.qwen2_forward(
                params, cfg, x, p3, paged_cache=cache)
            np.testing.assert_allclose(
                np.asarray(h_paged), np.asarray(h_ref), atol=1e-4,
                rtol=1e-4, err_msg=f"step {step}")
            assert np.array_equal(np.asarray(cache.lens),
                                  np.asarray(pos_d) + 1)
            pos_d = pos_d + 1

    def test_active_mask_freezes_dead_slot(self):
        from video3d_tpu.models import paged_kv, qwen2

        cfg = tiny_cfg(num_hidden_layers=1)
        params = qwen2.init_qwen2(jax.random.PRNGKey(1), cfg,
                                  dtype=jnp.float32)
        rng = np.random.default_rng(3)
        B, page, maxp = 2, 8, 2
        cache = paged_kv.PagedKVCache.zeros(
            cfg, num_pages=8, page_size=page, num_slots=B, max_pages=maxp)
        alloc = paged_kv.PageAllocator(8)
        for b in range(B):
            cache = paged_kv.set_slot_pages(cache, b, alloc.alloc(maxp))
        cache = cache._replace(lens=jnp.asarray([3, 5], jnp.int32))
        before = np.asarray(cache.k)

        x = jnp.asarray(rng.standard_normal((B, 1, cfg.hidden_size)),
                        jnp.float32)
        p3 = jnp.broadcast_to(cache.lens[:, None, None], (B, 1, 3))
        active = jnp.asarray([False, True])
        _, cache = qwen2.qwen2_forward(params, cfg, x, p3,
                                       paged_cache=cache,
                                       paged_active=active)
        assert np.asarray(cache.lens).tolist() == [3, 6]
        # dead slot's pages untouched (only scratch page 0 may change)
        after = np.asarray(cache.k)
        tbl = np.asarray(cache.page_table)
        for j in range(maxp):
            np.testing.assert_array_equal(after[:, tbl[0, j]],
                                          before[:, tbl[0, j]])


class TestPoolManagement:
    def test_allocator(self):
        from video3d_tpu.models.paged_kv import PageAllocator, pages_needed

        a = PageAllocator(5)                   # pages 1..4 usable
        assert a.available == 4
        got = a.alloc(3)
        assert len(set(got)) == 3 and 0 not in got
        with pytest.raises(MemoryError):
            a.alloc(2)
        a.free(got[:2])
        assert a.available == 3
        with pytest.raises(ValueError):
            a.free([0])
        assert pages_needed(1, 8) == 1
        assert pages_needed(8, 8) == 1
        assert pages_needed(9, 8) == 2

    def test_write_prefill_roundtrip(self):
        """write_prefill + paged attention == dense attention over the same
        sequence (per layer)."""
        from video3d_tpu.kernels.attention import mha_reference
        from video3d_tpu.kernels.paged_attention import (
            paged_attention_reference)
        from video3d_tpu.models import paged_kv

        cfg = tiny_cfg(num_hidden_layers=1)
        rng = np.random.default_rng(4)
        KV, hd, page = cfg.num_key_value_heads, cfg.head_dim, 8
        L, maxp = 16, 3
        cache = paged_kv.PagedKVCache.zeros(
            cfg, num_pages=6, page_size=page, num_slots=1, max_pages=maxp)
        alloc = paged_kv.PageAllocator(6)
        pages = alloc.alloc(maxp)
        cache = paged_kv.set_slot_pages(cache, 0, pages)

        k_seq = jnp.asarray(rng.standard_normal((L, KV, hd)), jnp.float32)
        v_seq = jnp.asarray(rng.standard_normal((L, KV, hd)), jnp.float32)
        cache = paged_kv.write_prefill(cache, 0, k_seq, v_seq, slot=0)
        cache = cache._replace(lens=jnp.asarray([L - 3], jnp.int32))

        H = cfg.num_attention_heads
        q = jnp.asarray(rng.standard_normal((1, 1, H, hd)), jnp.float32)
        out = paged_attention_reference(
            q, cache.k[0], cache.v[0], cache.page_table, cache.lens)
        dense = mha_reference(
            q, k_seq[None].astype(jnp.bfloat16).astype(jnp.float32),
            v_seq[None].astype(jnp.bfloat16).astype(jnp.float32),
            q_positions=jnp.asarray([[L - 4]]),
            kv_len=jnp.asarray([L - 3]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                                   atol=1e-2, rtol=1e-2)


class TestRaggedGrid:
    """r4 ragged-worklist paged decode kernel: the grid covers LIVE pages
    only (bounded by the pool size). Must equal the full-grid kernel and
    the oracle across heterogeneous mixes, pool-tight worklists, and
    padding-heavy tails."""

    @pytest.mark.parametrize("int8", [False, True])
    @pytest.mark.parametrize("lens_case", ["hetero", "all_short",
                                           "all_full", "tight"])
    def test_ragged_vs_full_grid_and_oracle(self, int8, lens_case):
        from video3d_tpu.kernels import paged_attention as pa

        rng = np.random.default_rng(13)
        B, H, KV, hd, page, maxp = 4, 4, 2, 128, 128, 4
        P = 1 + B * maxp if lens_case != "tight" else 1 + B  # tight pool
        q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.bfloat16)
        k_p, v_p, ks_p, vs_p = random_pool(rng, P, KV, page, hd, int8=int8)
        table = np.stack([rng.permutation(P - 1)[:maxp] + 1
                          for _ in range(B)]).astype(np.int32)
        lens = {
            "hetero": [1, page + 7, 3 * page, maxp * page],
            "all_short": [5, 9, 2, page],
            "all_full": [maxp * page] * B,
            "tight": [page, page - 3, 1, page],
        }[lens_case]
        lens = jnp.asarray(lens, jnp.int32)

        outs = {}
        for ragged in (True, False):
            pa.RAGGED_GRID = ragged
            try:
                outs[ragged] = np.asarray(pa.paged_decode_attention(
                    q, k_p, v_p, jnp.asarray(table), lens,
                    k_scale=ks_p, v_scale=vs_p, interpret=True), np.float32)
            finally:
                pa.RAGGED_GRID = True
        ref = np.asarray(pa.paged_attention_reference(
            q, k_p, v_p, jnp.asarray(table), lens, k_scale=ks_p,
            v_scale=vs_p), np.float32)
        np.testing.assert_allclose(outs[True], ref, atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(outs[True], outs[False],
                                   atol=2e-2, rtol=2e-2)

    @pytest.mark.parametrize("int8", [False, True])
    def test_aliased_tables_exceeding_pool(self, int8):
        """Prefix-page sharing regression (r4 advisor high): when slots
        alias the SAME pool pages (serve/batcher.py share_prefix_pages),
        the live (slot, page) pair count exceeds the pool size, so a
        worklist sized W = P silently drops the tail slots' work. The
        kernel must dispatch to the full pair-count worklist and stay
        exact vs the oracle."""
        from video3d_tpu.kernels import paged_attention as pa

        rng = np.random.default_rng(29)
        B, H, KV, hd, page, maxp = 4, 4, 2, 128, 128, 4
        shared, private = 2, 2                 # per-slot table layout
        # pool holds page 0 (spare) + 2 shared prefix pages + B*2 private
        P = 1 + shared + B * private           # = 11 < B * maxp = 16
        q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.bfloat16)
        k_p, v_p, ks_p, vs_p = random_pool(rng, P, KV, page, hd, int8=int8)
        table = np.zeros((B, maxp), np.int32)
        for b in range(B):
            table[b, :shared] = [1, 2]         # aliased prefix pages
            table[b, shared:] = [3 + b * private + i
                                 for i in range(private)]
        # full tables: pair count = B * maxp = 16 > P = 11
        lens = jnp.asarray([maxp * page, maxp * page,
                            maxp * page, 3 * page + 5], jnp.int32)
        out = np.asarray(pa.paged_decode_attention(
            q, k_p, v_p, jnp.asarray(table), lens,
            k_scale=ks_p, v_scale=vs_p, interpret=True), np.float32)
        ref = np.asarray(pa.paged_attention_reference(
            q, k_p, v_p, jnp.asarray(table), lens, k_scale=ks_p,
            v_scale=vs_p), np.float32)
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)
