"""Continuous batching (serve/batcher.py): a persistent S-slot decode loop
must produce exactly what the sequential engine produces, across admission,
slot reuse, streaming, and request-level failures."""

import os

import pytest

import jax

from video3d_tpu.config import DataConfig, ModelConfig
from video3d_tpu.data.image_processor import SigLipImageProcessor
from video3d_tpu.data.video_processor import VideoProcessor
from video3d_tpu.eval.drivers import EngineConfig, InferenceEngine
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.serve.batcher import ContinuousBatcher

from fixtures import FakeTokenizer, make_fake_scene

CFG = ModelConfig.tiny()


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
                     max_frames=3, buckets=(256,), stop_str="",
                     ground_token_id=tok.vocab["<ground>"], max_objects=8))
    return info, engine, tok


def _record(info, question):
    return {
        "video": info["sample_idx"],
        "conversations": [{"from": "human", "value": f"<image>\n{question}"},
                          {"from": "gpt", "value": None}],
    }


class TestContinuousBatcher:
    def test_matches_sequential_with_slot_reuse(self, env):
        """3 requests through 2 slots (one must wait for a free slot) ==
        the engine's one-at-a-time answers."""
        info, engine, tok = env
        records = [_record(info, q) for q in
                   ("what color is the chair", "how many tables",
                    "where is the lamp")]
        want = [engine.generate_answer(r) for r in records]

        batcher = ContinuousBatcher(engine, num_slots=2, chunk=2)
        try:
            handles = [batcher.submit(r) for r in records]
            got = [h.result(engine._decode_text, timeout=300)
                   for h in handles]
        finally:
            batcher.shutdown()
        assert got == want

    def test_streaming_is_progressive_and_final(self, env):
        info, engine, tok = env
        record = _record(info, "describe the scene")
        want = engine.generate_answer(record)
        batcher = ContinuousBatcher(engine, num_slots=1, chunk=2)
        try:
            chunks = list(batcher.generate_stream(record))
        finally:
            batcher.shutdown()
        assert chunks, "stream yielded nothing"
        assert chunks[-1] == want
        # cumulative: each yield extends (or equals) the previous text
        for a, b in zip(chunks, chunks[1:]):
            assert b.startswith(a)

    def test_prefix_cache_matches_sequential(self, env, tmp_path_factory):
        """Batched answers with the scene-prefix KV cache (dense and paged
        admission through engine.start_request) == the plain engine's."""
        info, engine, tok = env
        import dataclasses

        records = [_record(info, q) for q in
                   ("what color is the chair", "how many tables",
                    "where is the lamp", "is the door open")]
        want = [engine.generate_answer(r) for r in records]

        pengine = InferenceEngine(
            engine.params, engine.cfg, tok, engine.vp, engine.ip,
            dataclasses.replace(engine.ecfg, prefix_cache_scenes=2,
                                suffix_buckets=(32, 64)))
        for paged in (False, True):
            batcher = ContinuousBatcher(pengine, num_slots=2, chunk=2,
                                        paged=paged)
            try:
                handles = [batcher.submit(r) for r in records]
                got = [h.result(pengine._decode_text, timeout=300)
                       for h in handles]
            finally:
                batcher.shutdown()
            assert got == want, f"paged={paged}"
        # at least one admission reused the prefix across the two rounds
        assert pengine.prefix_cache_stats[0] >= 2

    def test_bad_request_fails_without_poisoning_slots(self, env):
        info, engine, tok = env
        batcher = ContinuousBatcher(engine, num_slots=1, chunk=2)
        try:
            bad = batcher.submit(_record({"sample_idx": "scannet/missing"},
                                         "hi") | {"video": "scannet/missing"})
            with pytest.raises(Exception):
                bad.result(engine._decode_text, timeout=120)
            ok = batcher.submit(_record(info, "what color is the chair"))
            assert ok.result(engine._decode_text, timeout=300) \
                == engine.generate_answer(_record(info,
                                                  "what color is the chair"))
        finally:
            batcher.shutdown()


class TestSpeculativeBatcher:
    def test_spec_batcher_matches_sequential(self, env):
        """Continuous batching WITH speculative decoding (early-exit
        self-draft): still bit-identical to the sequential engine (greedy
        verification), across 3 requests through 2 slots."""
        from dataclasses import replace as dc_replace

        info, engine, tok = env
        records = [_record(info, q) for q in
                   ("what color is the chair", "how many tables",
                    "where is the lamp")]
        want = [engine.generate_answer(r) for r in records]

        spec_engine = InferenceEngine(
            engine.params, CFG, tok, engine.vp, engine.ip,
            dc_replace(engine.ecfg, speculative_draft_layers=1,
                       speculative_k=3),
            device_geometry=engine.device_geometry)
        batcher = ContinuousBatcher(spec_engine, num_slots=2, chunk=2)
        assert batcher.spec
        try:
            handles = [batcher.submit(r) for r in records]
            got = [h.result(engine._decode_text, timeout=300)
                   for h in handles]
        finally:
            batcher.shutdown()
        assert got == want

    def test_spec_batcher_streaming(self, env):
        from dataclasses import replace as dc_replace

        info, engine, tok = env
        record = _record(info, "describe the scene")
        want = engine.generate_answer(record)
        spec_engine = InferenceEngine(
            engine.params, CFG, tok, engine.vp, engine.ip,
            dc_replace(engine.ecfg, speculative_draft_layers=1,
                       speculative_k=2),
            device_geometry=engine.device_geometry)
        batcher = ContinuousBatcher(spec_engine, num_slots=1, chunk=1)
        try:
            chunks = list(batcher.generate_stream(record))
        finally:
            batcher.shutdown()
        assert chunks and chunks[-1] == want
        for a, b in zip(chunks, chunks[1:]):
            assert b.startswith(a)


class TestRoutedBatcher:
    def test_routes_by_footprint_and_matches_sequential(self, env):
        from video3d_tpu.serve.router import RoutedBatcher

        info, engine, tok = env
        records = [_record(info, q) for q in
                   ("what color is the chair", "how many tables")]
        want = [engine.generate_answer(r) for r in records]
        router = RoutedBatcher(engine, pools=((128, 1), (512, 2)), chunk=2)
        try:
            # tiny fixture prompts exceed the 128 pool (frame budget), so
            # both land in the 512 pool
            need, _bucket = router._footprint(records[0])
            assert need > 128
            handles = [router.submit(r) for r in records]
            got = [h.result(engine._decode_text, timeout=300)
                   for h in handles]
        finally:
            router.shutdown()
        assert got == want

    def test_short_pool_preferred(self, env):
        from video3d_tpu.serve.router import RoutedBatcher

        info, engine, tok = env
        router = RoutedBatcher(engine, pools=((4096, 1), (8192, 1)), chunk=2)
        try:
            r = _record(info, "hi")
            assert router._footprint(r)[0] <= 4096
            h = router.submit(r)
            out = h.result(engine._decode_text, timeout=300)
            assert out == engine.generate_answer(r)
            # ran in the small pool: its slot emitted tokens, the big
            # pool's never did (emitted persists after release)
            assert router.pools[0].emitted[0] > 0
            assert router.pools[1].emitted == [0]
        finally:
            router.shutdown()

    def test_oversized_prompt_fails_loudly(self, env):
        """A prompt bucket larger than the pool's cache rows raises into
        the request instead of silently answering with an empty string."""
        info, engine, tok = env
        batcher = ContinuousBatcher(engine, num_slots=1, chunk=2,
                                    max_cache_len=64)   # < 256 bucket
        try:
            h = batcher.submit(_record(info, "hello"))
            with pytest.raises(Exception, match="does not fit"):
                h.result(engine._decode_text, timeout=120)
        finally:
            batcher.shutdown()


    def test_giant_prompt_rejected_at_submit(self, env):
        from video3d_tpu.serve.router import RoutedBatcher

        info, engine, tok = env
        router = RoutedBatcher(engine, pools=((128, 1),), chunk=2)
        try:
            h = router.submit(_record(info, "hello"))
            with pytest.raises(Exception, match="exceeds the largest pool"):
                h.result(engine._decode_text, timeout=60)
        finally:
            router.shutdown()


class TestSpecBatcherGuard:
    def test_low_acceptance_demotes_to_plain(self, env):
        """A never-right 1-layer draft + a high min-acceptance threshold:
        the batcher demotes itself to plain decoding at an idle boundary,
        and answers stay identical before and after."""
        import time as _time
        from dataclasses import replace as dc_replace

        info, engine, tok = env
        record = _record(info, "what color is the chair")
        want = engine.generate_answer(record)
        spec_engine = InferenceEngine(
            engine.params, CFG, tok, engine.vp, engine.ip,
            dc_replace(engine.ecfg, speculative_draft_layers=1,
                       speculative_k=3, speculative_min_acceptance=0.99),
            device_geometry=engine.device_geometry)
        batcher = ContinuousBatcher(spec_engine, num_slots=1, chunk=4)
        try:
            assert batcher.spec
            # requests accumulate offered slots until the guard trips
            for _ in range(30):
                assert batcher.generate(record) == want
                if batcher._spec_demote:
                    break
            assert batcher._spec_demote, (batcher._spec_offered,
                                          batcher._spec_accepted)
            # wait for the idle-boundary demotion, then serve again
            for _ in range(100):
                if not batcher.spec:
                    break
                _time.sleep(0.1)
            assert not batcher.spec
            assert batcher.generate(record) == want
        finally:
            batcher.shutdown()


class TestRouterSpecComposition:
    def test_routed_pools_inherit_speculation(self, env):
        """RoutedBatcher pools built from a speculative engine config run
        spec mode and still match the sequential answer exactly."""
        from dataclasses import replace as dc_replace

        from video3d_tpu.serve.router import RoutedBatcher

        info, engine, tok = env
        record = _record(info, "what color is the chair")
        want = engine.generate_answer(record)
        spec_engine = InferenceEngine(
            engine.params, CFG, tok, engine.vp, engine.ip,
            dc_replace(engine.ecfg, speculative_draft_layers=1,
                       speculative_k=2),
            device_geometry=engine.device_geometry)
        router = RoutedBatcher(spec_engine, pools=((512, 1), (1024, 1)),
                               chunk=2)
        try:
            assert all(p.spec for p in router.pools)
            assert router.generate(record) == want
        finally:
            router.shutdown()


class TestConcurrencyStress:
    def test_many_streaming_consumers_two_slots(self, env):
        """8 requests, 2 slots, each consumed by its own streaming thread:
        no deadlock, every stream terminates with the exact sequential
        answer."""
        import threading

        info, engine, tok = env
        records = [_record(info, f"question number {i}") for i in range(8)]
        want = [engine.generate_answer(r) for r in records]
        batcher = ContinuousBatcher(engine, num_slots=2, chunk=3)
        results = [None] * 8

        def consume(i, handle):
            last = ""
            for text in handle.text_stream(engine._decode_text):
                assert text.startswith(last[: len(text)]) or last == ""
                last = text
            results[i] = last

        try:
            handles = [batcher.submit(r) for r in records]
            threads = [threading.Thread(target=consume, args=(i, h))
                       for i, h in enumerate(handles)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
                assert not t.is_alive(), "stream consumer deadlocked"
        finally:
            batcher.shutdown()
        assert results == want


class TestCancellation:
    """cancel() — the worker's client-disconnect path: an abandoned
    request must release its slot (and pages) instead of decoding its
    full budget for nobody."""

    def test_cancel_releases_slot_mid_stream(self, env):
        import time as _time
        from dataclasses import replace as dc_replace

        info, engine, tok = env
        long_engine = InferenceEngine(
            engine.params, CFG, tok, engine.vp, engine.ip,
            dc_replace(engine.ecfg, max_new_tokens=64, eos_token_id=-1))
        batcher = ContinuousBatcher(long_engine, num_slots=2, chunk=2,
                                    paged=True, page_size=64)
        try:
            full = batcher._alloc.available
            req = batcher.submit(_record(info, "what color is the chair"))
            stream = req.text_stream(long_engine._decode_text)
            next(stream)                      # decoding started
            req.cancel()
            deadline = _time.time() + 120
            while _time.time() < deadline and any(
                    r is not None for r in batcher.slots):
                _time.sleep(0.05)
            assert all(r is None for r in batcher.slots)
            assert len(req.tokens) < 64       # released before the budget
            assert batcher._alloc.available == full
            # the loop keeps serving
            out = batcher.generate(_record(info, "how many tables"))
            assert isinstance(out, str)
        finally:
            batcher.shutdown()

    def test_cancel_queued_request_never_takes_a_slot(self, env):
        info, engine, tok = env
        want = engine.generate_answer(_record(info, "what color is the chair"))
        batcher = ContinuousBatcher(engine, num_slots=1, chunk=2)
        try:
            r1 = batcher.submit(_record(info, "what color is the chair"))
            r2 = batcher.submit(_record(info, "how many tables"))
            r2.cancel()
            assert r1.result(engine._decode_text, timeout=300) == want
            assert r2.result(engine._decode_text, timeout=300) == ""
            assert r2.tokens == []
        finally:
            batcher.shutdown()
