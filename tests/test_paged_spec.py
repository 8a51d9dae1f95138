"""Paged KV + speculative decoding composition.

Unit level: the multi-token paged forward (qwen2_forward paged L>1 —
the speculative verify pass) must equal the dense cache path exactly.
Serve level: the paged speculative batcher (serve/batcher.py paged=True
with a draft) must equal sequential greedy bit-for-bit, account pages
through the request lifecycle, and keep the K+2 verify write-ahead inside
its page reservation. Neither paging nor speculation exists in the
reference (HF dense cache, one token per forward)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.config import DataConfig, LLMConfig, ModelConfig
from video3d_tpu.data.image_processor import SigLipImageProcessor
from video3d_tpu.data.video_processor import VideoProcessor
from video3d_tpu.eval.drivers import EngineConfig, InferenceEngine
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models import qwen2
from video3d_tpu.serve.batcher import ContinuousBatcher

from fixtures import FakeTokenizer, make_fake_scene

CFG = ModelConfig.tiny()


class TestPagedMultiTokenForward:
    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.int8])
    def test_block_matches_dense(self, dtype):
        """A K+1-token block through the paged path == the dense
        cache_positions path (same prefix, same appended block)."""
        from video3d_tpu.models.paged_kv import (PagedKVCache,
                                                 transplant_dense)

        cfg = LLMConfig.tiny()
        rng = jax.random.PRNGKey(0)
        params = qwen2.init_qwen2(rng, cfg)
        S, L0, K1, page = 2, 40, 4, 16
        emb0 = jax.random.normal(jax.random.PRNGKey(1), (S, L0, cfg.hidden_size))
        pos0 = jnp.broadcast_to(jnp.arange(L0)[None, :, None], (S, L0, 3))
        kv_len0 = jnp.asarray([L0, L0 - 5])

        dense = qwen2.KVCache.zeros(cfg, S, 128, dtype=dtype)
        _, dense = qwen2.qwen2_forward(
            params, cfg, emb0, pos0, kv_cache=dense,
            cache_positions=jnp.broadcast_to(jnp.arange(L0)[None], (S, L0)),
            kv_len=kv_len0, prefill=True)

        # paged copy: per-slot transplant of each row's true length
        n_pages = 128 // page
        paged = PagedKVCache.zeros(cfg, 2 * n_pages + 1, page, S, n_pages,
                                   dtype=dtype)
        for s in range(S):
            row = jnp.asarray([1 + s * n_pages + i for i in range(n_pages)],
                              jnp.int32)
            one = jax.tree.map(lambda x: x[:, s:s + 1], dense)
            paged = transplant_dense(paged, one, s, row, n_pages,
                                     kv_len0[s])

        # the verify block: K+1 new tokens at per-row positions
        emb1 = jax.random.normal(jax.random.PRNGKey(2),
                                 (S, K1, cfg.hidden_size))
        bpos = kv_len0[:, None] + jnp.arange(K1)[None]
        pos3 = jnp.broadcast_to(bpos[..., None], (S, K1, 3))

        h_dense, _ = qwen2.qwen2_forward(
            params, cfg, emb1, pos3, kv_cache=dense,
            cache_positions=bpos, kv_len=kv_len0 + K1)
        h_paged, new_cache = qwen2.qwen2_forward(
            params, cfg, emb1, pos3, paged_cache=paged)

        np.testing.assert_allclose(np.asarray(h_paged),
                                   np.asarray(h_dense),
                                   rtol=2e-2 if dtype == jnp.int8 else 2e-5,
                                   atol=2e-2 if dtype == jnp.int8 else 2e-5)
        np.testing.assert_array_equal(np.asarray(new_cache.lens),
                                      np.asarray(kv_len0 + K1))

    def test_dead_slots_append_to_scratch(self):
        """paged_active=False rows write only the scratch page and their
        lens freeze."""
        from video3d_tpu.models.paged_kv import PagedKVCache

        cfg = LLMConfig.tiny()
        params = qwen2.init_qwen2(jax.random.PRNGKey(0), cfg)
        S, K1, page = 2, 3, 16
        paged = PagedKVCache.zeros(cfg, 5, page, S, 2)
        paged = paged._replace(
            page_table=jnp.asarray([[1, 2], [3, 4]], jnp.int32),
            lens=jnp.asarray([4, 7]))
        emb = jax.random.normal(jax.random.PRNGKey(1),
                                (S, K1, cfg.hidden_size))
        bpos = paged.lens[:, None] + jnp.arange(K1)[None]
        pos3 = jnp.broadcast_to(bpos[..., None], (S, K1, 3))
        _, cache = qwen2.qwen2_forward(
            params, cfg, emb, pos3, paged_cache=paged,
            paged_active=jnp.asarray([True, False]))
        assert np.asarray(cache.lens).tolist() == [7, 7]
        # dead row's pages untouched (all writes went to scratch page 0)
        np.testing.assert_array_equal(np.asarray(cache.k[:, 3:5]),
                                      np.zeros_like(cache.k[:, 3:5]))


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    info = make_fake_scene(root, n_frames=3)
    data_cfg = DataConfig(video_folder=root,
                          annotation_dir=os.path.join(root, "embodiedscan"),
                          metadata_dir=os.path.join(root, "metadata"),
                          frames_upbound=3)
    tok = FakeTokenizer()
    params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
    engine = InferenceEngine(
        params, CFG, tok, VideoProcessor(data_cfg),
        SigLipImageProcessor(size=(CFG.vision.image_size,) * 2),
        EngineConfig(max_new_tokens=6, eos_token_id=tok.eos_token_id,
                     max_frames=3, buckets=(256,), stop_str=""))
    return info, engine, tok


def _record(info, question):
    return {
        "video": info["sample_idx"],
        "conversations": [{"from": "human", "value": f"<image>\n{question}"},
                          {"from": "gpt", "value": None}],
    }


def _spec_engine(engine, tok, k=1, spec_k=2, kv_dtype="bfloat16"):
    from dataclasses import replace as dc_replace

    return InferenceEngine(
        engine.params, CFG, tok, engine.vp, engine.ip,
        dc_replace(engine.ecfg, speculative_draft_layers=k,
                   speculative_k=spec_k, kv_cache_dtype=kv_dtype))


class TestPagedSpecBatcher:
    def test_matches_sequential_greedy(self, env):
        """3 requests through 2 paged speculative slots == the plain
        engine's one-at-a-time greedy answers, and every page returns to
        the pool."""
        info, engine, tok = env
        records = [_record(info, q) for q in
                   ("what color is the chair", "how many tables",
                    "where is the lamp")]
        want = [engine.generate_answer(r) for r in records]

        spec_engine = _spec_engine(engine, tok)
        batcher = ContinuousBatcher(spec_engine, num_slots=2, chunk=2,
                                    paged=True, page_size=128)
        try:
            assert batcher.spec and batcher.paged
            full = batcher._alloc.available
            handles = [batcher.submit(r) for r in records]
            got = [h.result(spec_engine._decode_text, timeout=300)
                   for h in handles]
            assert got == want
            import time
            deadline = 50
            while batcher._alloc.available != full and deadline:
                time.sleep(0.1)
                deadline -= 1
            assert batcher._alloc.available == full
            assert all(p is None for p in batcher._slot_pages)
        finally:
            batcher.shutdown()

    def test_int8_kv_matches_sequential(self, env):
        """int8 paged pools + speculation still equal the int8 sequential
        engine (the transplant carries scales verbatim)."""
        info, engine, tok = env
        rec = _record(info, "describe the scene")
        ref = _spec_engine(engine, tok, kv_dtype="int8")
        want = ref.generate_answer(rec)
        batcher = ContinuousBatcher(ref, num_slots=1, chunk=2,
                                    paged=True, page_size=128)
        try:
            got = batcher.submit(rec).result(ref._decode_text, timeout=300)
        finally:
            batcher.shutdown()
        assert got == want

    def test_deferred_admission_under_page_pressure(self, env):
        """A pool sized for ~one request defers the second admission until
        the first completes — never errors, both answers correct."""
        info, engine, tok = env
        records = [_record(info, q) for q in ("what color is the chair",
                                              "how many tables")]
        want = [engine.generate_answer(r) for r in records]
        spec_engine = _spec_engine(engine, tok)
        # one request needs pages for 256-bucket + 6 new + K+2 overshoot
        # at page 128 -> 3 pages; pool of 4 (1 scratch + 3) fits exactly one
        batcher = ContinuousBatcher(spec_engine, num_slots=2, chunk=2,
                                    paged=True, page_size=128,
                                    total_pages=4)
        try:
            handles = [batcher.submit(r) for r in records]
            got = [h.result(spec_engine._decode_text, timeout=300)
                   for h in handles]
        finally:
            batcher.shutdown()
        assert got == want
