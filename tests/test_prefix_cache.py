"""Scene-prefix KV cache (EngineConfig.prefix_cache_scenes): every question
on a scene shares the spliced prefix (system + user header + vision block),
so its KV is question-independent and later questions prefill only their
suffix (models/generate.py start_decode_prefix). Tests: answers identical
with and without the cache, video IO + tower genuinely skipped on hits, the
per-question <coord> box PE still applied in the suffix, LRU eviction, and
fallback paths."""

import os

import numpy as np
import pytest

import jax

from video3d_tpu.config import DataConfig, ModelConfig, PosEmbedType, replace
from video3d_tpu.data.image_processor import SigLipImageProcessor
from video3d_tpu.data.video_processor import VideoProcessor
from video3d_tpu.eval.drivers import EngineConfig, InferenceEngine
from video3d_tpu.models import llava_video3d as lv3d

from fixtures import FakeTokenizer, make_fake_scene

CFG = ModelConfig.tiny()


def _question(info, text="what color is the chair", i=0):
    return {
        "id": f"q{i}_0", "video": info["sample_idx"],
        "conversations": [
            {"from": "human", "value": f"<image>\n{text}"},
            {"from": "gpt", "value": "brown"}],
        "metadata": {"dataset": "scanqa", "question_type": "what"},
    }


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    infos = [make_fake_scene(root, scene_id=f"scene{i:04d}_00", n_frames=3,
                             extend=(i > 0)) for i in range(3)]
    data_cfg = DataConfig(video_folder=root,
                          annotation_dir=os.path.join(root, "embodiedscan"),
                          metadata_dir=os.path.join(root, "metadata"),
                          frames_upbound=3)
    return infos, data_cfg


def _engine(data_cfg, prefix_scenes, cfg=CFG, **ecfg_kw):
    tok = FakeTokenizer()
    params = lv3d.init_model(jax.random.PRNGKey(0), cfg)
    return InferenceEngine(
        params, cfg, tok, VideoProcessor(data_cfg),
        SigLipImageProcessor(size=(cfg.vision.image_size,) * 2),
        EngineConfig(max_new_tokens=4, eos_token_id=tok.eos_token_id,
                     max_frames=3, buckets=(256,), stop_str="",
                     suffix_buckets=(32, 64),
                     prefix_cache_scenes=prefix_scenes, **ecfg_kw))


class TestPrefixCache:
    def test_answers_identical_and_work_skipped(self, scene, monkeypatch):
        infos, data_cfg = scene
        plain = _engine(data_cfg, 0)
        cached = _engine(data_cfg, 4)

        calls = {"tower": 0, "io": 0}
        orig_tower = lv3d.encode_video_pooled
        orig_io = VideoProcessor.process_3d_video

        def counting_tower(*a, **k):
            calls["tower"] += 1
            return orig_tower(*a, **k)

        def counting_io(*a, **k):
            calls["io"] += 1
            return orig_io(*a, **k)

        monkeypatch.setattr(lv3d, "encode_video_pooled", counting_tower)
        monkeypatch.setattr(VideoProcessor, "process_3d_video", counting_io)

        qs = [_question(infos[0], text=t, i=i) for i, t in enumerate(
            ["what color is the chair", "how many tables are there",
             "where is the lamp"])]
        plain_answers = [plain.generate_answer(q) for q in qs]
        calls["tower"] = calls["io"] = 0
        cached_answers = [cached.generate_answer(q) for q in qs]
        assert cached_answers == plain_answers
        # full work only for the first question; hits skip IO AND the tower
        # (tower counted at trace time only — <= 1 keeps this robust to
        # jit-cache reuse across test orderings)
        assert calls["tower"] <= 1
        assert calls["io"] <= 1
        assert cached.prefix_cache_stats == [2, 1]

    def test_mrope_answers_identical(self, scene):
        infos, data_cfg = scene
        cfg = replace(CFG, world_3d=replace(CFG.world_3d,
                                            pos_embed=PosEmbedType.MROPE))
        plain = _engine(data_cfg, 0, cfg=cfg)
        cached = _engine(data_cfg, 4, cfg=cfg)
        qs = [_question(infos[0], text=t, i=i) for i, t in enumerate(
            ["what is left of the bed", "is the door open"])]
        assert [cached.generate_answer(q) for q in qs] == \
            [plain.generate_answer(q) for q in qs]
        assert cached.prefix_cache_stats == [1, 1]

    def test_sampled_answers_identical(self, scene):
        """Sampled decode folds the same rng key by step in both paths."""
        infos, data_cfg = scene
        plain = _engine(data_cfg, 0, temperature=0.9, top_k=5)
        cached = _engine(data_cfg, 4, temperature=0.9, top_k=5)
        qs = [_question(infos[0], text=t, i=i) for i, t in enumerate(
            ["what color is the chair", "how many tables are there"])]
        assert [cached.generate_answer(q) for q in qs] == \
            [plain.generate_answer(q) for q in qs]

    def test_coord_box_applied_in_suffix(self, scene):
        """Scan2Cap: the <coord> token sits in the question suffix, so its
        per-question box PE must flow through the prefix-cached path —
        different boxes, (potentially) different answers, and exact
        agreement with the uncached engine."""
        infos, data_cfg = scene
        plain = _engine(data_cfg, 0)
        cached = _engine(data_cfg, 4)
        for eng in (plain, cached):
            eng.tokenizer.add_tokens(["<coord>"], special_tokens=True)
        coord_id = plain.tokenizer.vocab["<coord>"]
        q = _question(infos[0], text="describe the object at <coord>")
        b1 = np.asarray([0.0, 0.0, 0.0], np.float32)
        b2 = np.asarray([3.0, 3.0, 1.0], np.float32)
        # first call misses (harvests prefix), second hits
        a1 = cached.generate_answer(q, box_input=b1, coord_token_id=coord_id)
        a2 = cached.generate_answer(q, box_input=b2, coord_token_id=coord_id)
        assert cached.prefix_cache_stats == [1, 1]
        assert a1 == plain.generate_answer(q, box_input=b1,
                                           coord_token_id=coord_id)
        assert a2 == plain.generate_answer(q, box_input=b2,
                                           coord_token_id=coord_id)

    def test_streaming_matches(self, scene):
        infos, data_cfg = scene
        cached = _engine(data_cfg, 4)
        q0 = _question(infos[0])
        full = cached.generate_answer(q0)
        q1 = _question(infos[0], text="how many tables are there", i=1)
        expect = cached.generate_answer(q1)
        # stream the same question through the prefix-hit path
        chunks = list(cached.generate_answer_stream(q1, chunk=2))
        assert chunks[-1] == expect
        assert cached.prefix_cache_stats[0] >= 2

    def test_lru_eviction(self, scene):
        infos, data_cfg = scene
        eng = _engine(data_cfg, 2)
        for info in infos:                   # 3 distinct scenes -> evict 1st
            eng.generate_answer(_question(info))
        assert len(eng._prefix_cache) == 2
        assert infos[0]["sample_idx"] not in eng._prefix_cache
        eng.generate_answer(_question(infos[0]))
        assert eng.prefix_cache_stats == [0, 4]
        eng.generate_answer(_question(infos[0]))
        assert eng.prefix_cache_stats == [1, 4]

    def test_prompt_prefix_mismatch_falls_back(self, scene):
        """A question whose PRE-image tokens differ (e.g. extra_prompt
        changed between calls) must not reuse the stored prefix."""
        infos, data_cfg = scene
        eng = _engine(data_cfg, 2)
        eng.generate_answer(_question(infos[0]))
        eng.ecfg.extra_prompt = "Answer briefly. "
        # the pre-image ids now differ only if extra_prompt precedes <image>;
        # with <image> first the prefix still matches — craft a record whose
        # image token is NOT first instead
        q = _question(infos[0], i=1)
        q["conversations"][0]["value"] = "look carefully\n<image>\nwhere"
        eng.generate_answer(q)
        assert eng.prefix_cache_stats[1] == 2     # second was a miss too

    def test_oversized_suffix_falls_back(self, scene):
        infos, data_cfg = scene
        eng = _engine(data_cfg, 2)
        eng.generate_answer(_question(infos[0]))
        q = _question(infos[0], text="why " * 80, i=1)   # > largest bucket
        eng.generate_answer(q)                            # falls back, works
        assert eng.prefix_cache_stats == [0, 2]

    def test_grounding_matches(self, scene):
        """ground() through the prefix path (cached prefix KV + cached
        object features + suffix-only forward) == the plain path's scores;
        the second query on a scene is a hit with no video IO."""
        infos, data_cfg = scene
        plain = _engine(data_cfg, 0)
        cached = _engine(data_cfg, 4)
        for eng in (plain, cached):
            eng.ecfg.ground_token_id = eng.tokenizer.vocab["<ground>"]
            eng.ecfg.max_objects = 8
        qs = [{
            "id": f"g{i}", "video": infos[0]["sample_idx"],
            "conversations": [
                {"from": "human", "value": f"<image>\nfind object {i}"},
                {"from": "gpt", "value": "<ground>"}],
            "metadata": {"dataset": "scanrefer", "question_type": "unique"},
        } for i in range(3)]
        want = [plain.ground(q) for q in qs]
        got = [cached.ground(q) for q in qs]
        assert cached.prefix_cache_stats == [2, 1]
        for (s1, o1), (s2, o2) in zip(want, got):
            np.testing.assert_array_equal(o1, o2)
            # cache-precision agreement: the prefix path reads the
            # bf16-stored prefix KV, the plain grounding forward attends
            # raw (f32 in this fixture) K/V without a cache
            np.testing.assert_allclose(s2, s1, rtol=2e-3, atol=1e-4)
            assert int(np.argmax(s2)) == int(np.argmax(s1))

    def test_generative_then_grounding_share_prefix(self, scene):
        """A generative miss harvests the prefix; a grounding query on the
        same scene still needs its own object features but can reuse the
        prefix KV when the pre-image ids match (and vice versa) — at
        minimum it must stay correct when both paths interleave."""
        infos, data_cfg = scene
        plain = _engine(data_cfg, 0)
        cached = _engine(data_cfg, 4)
        for eng in (plain, cached):
            eng.ecfg.ground_token_id = eng.tokenizer.vocab["<ground>"]
            eng.ecfg.max_objects = 8
        gq = {
            "id": "g0", "video": infos[0]["sample_idx"],
            "conversations": [
                {"from": "human", "value": "<image>\nfind the chair"},
                {"from": "gpt", "value": "<ground>"}],
            "metadata": {"dataset": "scanrefer", "question_type": "unique"},
        }
        q = _question(infos[0])
        assert cached.generate_answer(q) == plain.generate_answer(q)
        s_plain, o_plain = plain.ground(gq)
        s_cached, o_cached = cached.ground(gq)
        np.testing.assert_array_equal(o_plain, o_cached)
        np.testing.assert_allclose(s_cached, s_plain, rtol=2e-3, atol=1e-4)

    def test_batched_suffix_matches_sequential(self, scene, monkeypatch):
        """Scene-grouped batched suffix decode: one B-row suffix prefill
        against the broadcast prefix == per-record sequential answers, and
        a same-scene chunk without a cached prefix harvests it from its
        first record (1 full + B-1 suffixed)."""
        infos, data_cfg = scene
        plain = _engine(data_cfg, 0)
        cached = _engine(data_cfg, 4)
        qs = [_question(infos[0], text=t, i=i) for i, t in enumerate(
            ["what color is the chair", "how many tables are there",
             "where is the lamp"])]
        want = [plain.generate_answer(q) for q in qs]

        # count host video IO (eager) — the tower itself runs inside the
        # prefill jit, whose python body only executes on first trace
        calls = {"io": 0}
        orig = VideoProcessor.process_3d_video

        def counting(*a, **k):
            calls["io"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(VideoProcessor, "process_3d_video", counting)
        got = cached.generate_answers_batch_prefix(qs)
        assert got == want
        assert calls["io"] == 1         # video loaded once (the harvest)
        assert cached.prefix_cache_stats == [2, 1]
        # a second chunk on the same scene is one pure suffix batch
        got2 = cached.generate_answers_batch_prefix(qs)
        assert got2 == want
        assert calls["io"] == 1
        assert cached.prefix_cache_stats == [5, 1]

    def test_run_generative_batched_prefix(self, scene, tmp_path):
        """run_generative with batch_size>1 + prefix cache groups by scene
        and produces the same answer set as the plain engine."""
        import json as _json

        from video3d_tpu.eval.drivers import run_generative

        infos, data_cfg = scene
        plain = _engine(data_cfg, 0)
        cached = _engine(data_cfg, 4)
        qs = []
        for si in range(2):
            for i in range(2):
                q = _question(infos[si], text=f"question {i} about it", i=i)
                q["id"] = f"s{si}_q{i}_0"
                qs.append(q)
        want = {q["id"]: plain.generate_answer(q) for q in qs}
        afile = str(tmp_path / "answers.jsonl")
        run_generative(cached, qs, afile, batch_size=2)
        got = {r["sample_id"]: r["pred_response"]
               for r in map(_json.loads, open(afile))}
        assert got == want

    def test_speculative_prefix_matches_vanilla_greedy(self, scene):
        """Self-draft speculation + prefix cache: both caches seed from the
        stored scene prefix (spec_start_prefix) and greedy output stays
        bit-identical to vanilla greedy decoding without either feature."""
        infos, data_cfg = scene
        plain = _engine(data_cfg, 0)
        spec_pre = _engine(data_cfg, 4, speculative_draft_layers=1,
                           speculative_k=3)
        qs = [_question(infos[0], text=t, i=i) for i, t in enumerate(
            ["what color is the chair", "how many tables are there",
             "where is the lamp"])]
        want = [plain.generate_answer(q) for q in qs]
        got = [spec_pre.generate_answer(q) for q in qs]
        assert got == want
        assert spec_pre.prefix_cache_stats == [2, 1]

    def test_spec_batcher_prefix_matches(self, scene):
        """Speculative continuous batching with self-draft + prefix cache:
        admissions seed both caches from the scene prefix and answers still
        equal the plain engine's."""
        from video3d_tpu.serve.batcher import ContinuousBatcher

        infos, data_cfg = scene
        plain = _engine(data_cfg, 0)
        eng = _engine(data_cfg, 4, speculative_draft_layers=1,
                      speculative_k=3)
        qs = [_question(infos[0], text=t, i=i) for i, t in enumerate(
            ["what color is the chair", "how many tables are there",
             "where is the lamp"])]
        want = [plain.generate_answer(q) for q in qs]
        batcher = ContinuousBatcher(eng, num_slots=2, chunk=2)
        try:
            assert batcher.spec and batcher._self_draft_spec
            handles = [batcher.submit(q) for q in qs]
            got = [h.result(eng._decode_text, timeout=300) for h in handles]
        finally:
            batcher.shutdown()
        assert got == want
        assert eng.prefix_cache_stats[0] >= 2

    def test_spec_paged_prefix_batcher_matches(self, scene):
        """Triple composition: self-draft speculation + paged KV pool +
        scene-prefix cache in one batcher still equals the plain engine."""
        from video3d_tpu.serve.batcher import ContinuousBatcher

        infos, data_cfg = scene
        plain = _engine(data_cfg, 0)
        eng = _engine(data_cfg, 4, speculative_draft_layers=1,
                      speculative_k=3)
        qs = [_question(infos[0], text=t, i=i) for i, t in enumerate(
            ["what color is the chair", "how many tables are there",
             "where is the lamp"])]
        want = [plain.generate_answer(q) for q in qs]
        batcher = ContinuousBatcher(eng, num_slots=2, chunk=2, paged=True,
                                    page_size=128)
        try:
            assert batcher.spec and batcher.paged \
                and batcher._self_draft_spec
            # sequential first request so its admission harvests the prefix
            h0 = batcher.submit(qs[0])
            got = [h0.result(eng._decode_text, timeout=300)]
            handles = [batcher.submit(q) for q in qs[1:]]
            got += [h.result(eng._decode_text, timeout=300)
                    for h in handles]
        finally:
            batcher.shutdown()
        assert got == want
        assert eng.prefix_cache_stats[0] >= 2

    @pytest.mark.parametrize("kv_dtype", ["int8", "int4"])
    def test_quantized_kv_prefix_runs(self, scene, kv_dtype):
        """int8/int4 KV: the prefix is reused quantized (same values decode
        reads); the path must run and produce a plausible answer."""
        infos, data_cfg = scene
        eng = _engine(data_cfg, 4, kv_cache_dtype=kv_dtype)
        qs = [_question(infos[0], text=t, i=i) for i, t in enumerate(
            ["what color is the chair", "how many tables are there"])]
        answers = [eng.generate_answer(q) for q in qs]
        assert eng.prefix_cache_stats == [1, 1]
        assert all(isinstance(a, str) for a in answers)


class TestGroundSuffixBatched:
    def test_per_row_ground_slots_match_single_rows(self):
        """Scene-grouped batched grounding: each row's <ground> token sits
        at a DIFFERENT suffix position; the batched call must score each
        row at its own slot, equal to per-row B=1 calls (regression for
        the shared-scalar-slot bug)."""
        import jax.numpy as jnp

        from video3d_tpu.models import generate as gen
        from video3d_tpu.models import qwen2

        cfg = CFG
        params = lv3d.init_model(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        lcfg = cfg.llm
        P, Ls, B, N = 8, 8, 2, 3
        D = lcfg.hidden_size

        pref_shape = (lcfg.num_hidden_layers, 1, P,
                      lcfg.num_key_value_heads * lcfg.head_dim)
        prefix = qwen2.KVCache(
            jnp.asarray(rng.normal(size=pref_shape), jnp.float32),
            jnp.asarray(rng.normal(size=pref_shape), jnp.float32))

        text_ids = rng.integers(10, lcfg.vocab_size - 2, (B, Ls))
        pos = P + np.arange(Ls)
        batch = lv3d.Batch(
            images=None, patch_coords=None,
            text_ids=jnp.asarray(text_ids),
            kind=jnp.zeros((B, Ls), jnp.int32),
            vision_index=jnp.zeros((B, Ls), jnp.int32),
            labels=jnp.full((B, Ls), -100, jnp.int32),
            position_ids=jnp.asarray(np.broadcast_to(pos, (B, Ls))),
            mrope_position_ids=jnp.asarray(
                np.broadcast_to(pos[None, :, None], (B, Ls, 3)).copy()),
            seq_len=jnp.full((B,), P + Ls, jnp.int32))

        obj_feats = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
        valid = jnp.ones((N,), bool)
        slots = jnp.asarray([P + 2, P + 5], jnp.int32)

        batched = np.asarray(gen.ground_suffix(
            params, cfg, batch, prefix, prefix_len=P, max_cache_len=P + Ls,
            cache_dtype=jnp.float32, obj_feats=obj_feats,
            object_valid=valid, ground_slot=slots))
        assert batched.shape == (B, N + 1)

        for r in range(B):
            row = jax.tree.map(lambda x: x[r:r + 1], batch)
            single = np.asarray(gen.ground_suffix(
                params, cfg, row, prefix, prefix_len=P,
                max_cache_len=P + Ls, cache_dtype=jnp.float32,
                obj_feats=obj_feats, object_valid=valid,
                ground_slot=slots[r]))
            np.testing.assert_allclose(batched[r], single,
                                       rtol=1e-5, atol=1e-5)
        # the two rows must NOT be identical (different slots + tokens)
        assert np.abs(batched[0] - batched[1]).max() > 1e-6
