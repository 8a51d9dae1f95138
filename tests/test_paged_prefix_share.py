"""Shared-prefix paged KV blocks (serve/batcher.py share_prefix_pages):
with the engine's scene-prefix cache on, a paged batcher writes each
scene's full prefix pages into the pool ONCE (models/generate.py
write_shared_prefix) and every admission on that scene references them in
its page-table row (insert skip_pages) instead of carrying a private copy
— the vLLM prefix-block-sharing idea on the TPU paged cache. S concurrent
requests on one scene hold one prefix KV footprint instead of S.

Tests: answers identical to the unshared path, page accounting through
admission/finish/eviction, and composition with self-draft speculation.
"""

import os
import time

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
PAGE = 8   # small pages so the tiny prefix spans several full pages


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    infos = [make_fake_scene(root, scene_id=f"scene{i:04d}_00", n_frames=3,
                             extend=(i > 0)) for i in range(2)]
    data_cfg = DataConfig(video_folder=root,
                          annotation_dir=os.path.join(root, "embodiedscan"),
                          metadata_dir=os.path.join(root, "metadata"),
                          frames_upbound=3)
    return infos, data_cfg


def _engine(data_cfg, prefix_scenes, **ecfg_kw):
    tok = FakeTokenizer()
    params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
    return InferenceEngine(
        params, CFG, tok, VideoProcessor(data_cfg),
        SigLipImageProcessor(size=(CFG.vision.image_size,) * 2),
        EngineConfig(max_new_tokens=4, eos_token_id=tok.eos_token_id,
                     max_frames=3, buckets=(256,), stop_str="",
                     suffix_buckets=(32, 64),
                     prefix_cache_scenes=prefix_scenes, **ecfg_kw))


def _record(info, question, i=0):
    return {
        "id": f"q{i}", "video": info["sample_idx"],
        "conversations": [{"from": "human", "value": f"<image>\n{question}"},
                          {"from": "gpt", "value": None}],
    }


def _wait(pred, seconds=30):
    deadline = time.time() + seconds
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.05)
    return pred()


QUESTIONS = ("what color is the chair", "how many tables are there",
             "where is the lamp")


class TestSharedPrefixPages:
    def test_answers_identical_and_pages_shared(self, scene):
        infos, data_cfg = scene
        plain = _engine(data_cfg, 0)
        records = [_record(infos[0], q, i) for i, q in enumerate(QUESTIONS)]
        want = [plain.generate_answer(r) for r in records]

        eng = _engine(data_cfg, 4)
        batcher = ContinuousBatcher(eng, num_slots=2, chunk=2,
                                    paged=True, page_size=PAGE)
        try:
            full = batcher._alloc.available
            # first request misses (harvests the prefix), later ones share
            got = [batcher.submit(records[0]).result(eng._decode_text,
                                                     timeout=300)]
            handles = [batcher.submit(r) for r in records[1:]]
            got += [h.result(eng._decode_text, timeout=300) for h in handles]
            assert got == want

            key = records[0]["video"]
            assert batcher.prefix_share_stats[1] == 1     # one creation
            assert batcher.prefix_share_stats[0] == 2     # two shared admits
            sh = batcher._shared[key]
            n_full = eng._prefix_cache[key].prefix_len // PAGE
            assert n_full >= 2 and len(sh["pages"]) == n_full

            # all requests done: private pages return, shared pages stay
            # held by the cache (refs == 1) until the engine LRU evicts
            assert _wait(lambda: all(p is None for p in batcher._slot_pages))
            assert _wait(lambda: sh["refs"] == 1)
            assert batcher._alloc.available == full - n_full
        finally:
            batcher.shutdown()

    def test_eviction_frees_shared_pages(self, scene):
        infos, data_cfg = scene
        eng = _engine(data_cfg, 1)          # LRU of ONE scene
        batcher = ContinuousBatcher(eng, num_slots=2, chunk=2,
                                    paged=True, page_size=PAGE)
        try:
            full = batcher._alloc.available
            r0 = _record(infos[0], QUESTIONS[0])
            batcher.generate(r0)                          # miss: harvest
            batcher.generate(_record(infos[0], QUESTIONS[1]))  # hit: share
            key0 = r0["video"]
            assert key0 in batcher._shared

            # scene1 through the ENGINE evicts scene0's prefix entry and
            # fires the batcher's eviction hook; the next batcher request
            # drains it on the scheduler thread
            eng.generate_answer(_record(infos[1], QUESTIONS[0]))
            batcher.generate(_record(infos[1], QUESTIONS[1]))  # hit scene1
            key1 = infos[1]["sample_idx"]
            assert _wait(lambda: key0 not in batcher._shared)
            assert key1 in batcher._shared
            n1 = len(batcher._shared[key1]["pages"])
            # scene0's shared pages freed; only scene1's remain held
            assert _wait(lambda: batcher._alloc.available == full - n1)
        finally:
            batcher.shutdown()

    def test_disabled_sharing_matches(self, scene):
        infos, data_cfg = scene
        eng = _engine(data_cfg, 4)
        records = [_record(infos[0], q, i) for i, q in enumerate(QUESTIONS)]
        off = ContinuousBatcher(eng, num_slots=2, chunk=2, paged=True,
                                page_size=PAGE, share_prefix_pages=False)
        try:
            full = off._alloc.available
            base = [off.generate(r) for r in records]
            assert off.prefix_share_stats == [0, 0]
            assert _wait(lambda: off._alloc.available == full)
        finally:
            off.shutdown()

        eng2 = _engine(data_cfg, 4)
        on = ContinuousBatcher(eng2, num_slots=2, chunk=2, paged=True,
                               page_size=PAGE)
        try:
            assert [on.generate(r) for r in records] == base
        finally:
            on.shutdown()

    def test_capacity_win_no_deferral(self, scene):
        """The HBM-capacity point of sharing: a pool sized BELOW 2 full
        unshared footprints still admits 2 same-scene requests
        concurrently (each reserves only its private remainder), where
        the unshared batcher must defer the second admission."""
        infos, data_cfg = scene
        eng = _engine(data_cfg, 4)
        # warm the prefix entry through the engine (no batcher involved)
        eng.generate_answer(_record(infos[0], QUESTIONS[0]))
        n_full = eng._prefix_cache[infos[0]["sample_idx"]].prefix_len // PAGE

        # per-request footprint (batcher _admit): bucket 256 + mnt 4 +
        # chunk 2 -> need pages; pool = shared + 2 private remainders + 1
        # scratch — strictly less than 2 full footprints
        from video3d_tpu.models.paged_kv import pages_needed
        need = pages_needed(256 + 4 + 2, PAGE)
        total = 1 + n_full + 2 * (need - n_full)
        assert total < 1 + 2 * need
        batcher = ContinuousBatcher(eng, num_slots=2, chunk=2, paged=True,
                                    page_size=PAGE, total_pages=total)
        try:
            records = [_record(infos[0], q, i)
                       for i, q in enumerate(QUESTIONS[:2])]
            handles = [batcher.submit(r) for r in records]
            # both must occupy slots SIMULTANEOUSLY at some point
            both = _wait(lambda: all(s is not None for s in batcher.slots),
                         seconds=60)
            results = [h.result(eng._decode_text, timeout=300)
                       for h in handles]
            assert len(results) == 2
            assert both, "sharing should fit both requests concurrently"
            assert batcher.prefix_share_stats[0] == 2
            assert not batcher._deferred
        finally:
            batcher.shutdown()

    def test_stale_prep_does_not_leak_shared_pages(self, scene,
                                                   monkeypatch):
        """A prep that captured a prefix entry BEFORE the engine evicted
        the scene must not mint a shared entry: its cache-hold ref could
        only be released by a future eviction that may never come. The
        admission falls back to an unshared transplant and every page
        returns to the pool."""
        infos, data_cfg = scene
        eng = _engine(data_cfg, 4)
        key = infos[0]["sample_idx"]
        eng.generate_answer(_record(infos[0], QUESTIONS[0]))   # harvest
        stale_prep = eng.prepare_request(_record(infos[0], QUESTIONS[1]))
        assert stale_prep["mode"] == "prefix"
        # the race: eviction lands after prep, before admission (the
        # batcher's hook queue would drain it as a no-op)
        with eng._cache_lock:
            eng._prefix_cache.pop(key)
        monkeypatch.setattr(eng, "prepare_request",
                            lambda *a, **k: stale_prep)

        batcher = ContinuousBatcher(eng, num_slots=2, chunk=2,
                                    paged=True, page_size=PAGE)
        try:
            full = batcher._alloc.available
            out = batcher.generate(_record(infos[0], QUESTIONS[1]))
            assert isinstance(out, str)
            assert batcher._shared == {}                  # nothing minted
            assert batcher.prefix_share_stats == [0, 0]
            assert _wait(lambda: batcher._alloc.available == full)
        finally:
            batcher.shutdown()

    def test_churn_accounting_invariant(self, scene):
        """Scheduler stress: 12 requests over 2 scenes through 2 slots
        and a tight pool, with a few cancellations — page accounting must
        balance at quiescence (free + shared-held == total-1, no leaked
        private pages) and surviving answers must match the engine."""
        import random

        infos, data_cfg = scene
        eng = _engine(data_cfg, 4)
        recs, want = [], {}
        for i in range(12):
            info = infos[i % 2]
            q = QUESTIONS[i % len(QUESTIONS)]
            r = _record(info, q, i)
            recs.append(r)
            key = (info["sample_idx"], q)
            if key not in want:
                want[key] = eng.generate_answer(r)

        batcher = ContinuousBatcher(eng, num_slots=2, chunk=2,
                                    paged=True, page_size=PAGE)
        try:
            full = batcher._alloc.available
            rng = random.Random(0)
            handles = []
            for i, r in enumerate(recs):
                h = batcher.submit(r)
                handles.append((i, h, rng.random() < 0.25))
            for i, h, cancel in handles:
                if cancel:
                    h.cancel()
            results = {}
            for i, h, cancel in handles:
                try:
                    results[i] = h.result(eng._decode_text, timeout=600)
                except Exception:   # noqa: BLE001 — cancelled mid-flight
                    results[i] = None

            # non-cancelled answers are exact
            for i, h, cancel in handles:
                if not cancel:
                    info = infos[i % 2]
                    key = (info["sample_idx"], QUESTIONS[i % len(QUESTIONS)])
                    assert results[i] == want[key], i

            # quiescence: slots empty, private pages all back, only the
            # shared prefix pages (refs == 1 cache hold each) outstanding
            assert _wait(lambda: all(s is None for s in batcher.slots))
            held = sum(len(sh["pages"]) for sh in batcher._shared.values())
            assert _wait(
                lambda: batcher._alloc.available + held == full), (
                batcher._alloc.available, held, full)
            assert all(sh["refs"] == 1 and not sh["dead"]
                       for sh in batcher._shared.values())
            assert len(batcher._shared) <= 2
            assert not batcher._deferred
        finally:
            batcher.shutdown()

    def test_speculative_composition(self, scene):
        """Self-draft speculation + paged KV + shared prefix pages: the
        target cache shares prefix pages (insert_paged_spec_slot
        skip_pages); answers equal the sequential engine."""
        infos, data_cfg = scene
        plain = _engine(data_cfg, 0)
        records = [_record(infos[0], q, i) for i, q in enumerate(QUESTIONS)]
        want = [plain.generate_answer(r) for r in records]

        eng = _engine(data_cfg, 4, speculative_draft_layers=1,
                      speculative_k=2)
        batcher = ContinuousBatcher(eng, num_slots=2, chunk=2,
                                    paged=True, page_size=PAGE)
        try:
            assert batcher.spec
            got = [batcher.submit(records[0]).result(eng._decode_text,
                                                     timeout=300)]
            handles = [batcher.submit(r) for r in records[1:]]
            got += [h.result(eng._decode_text, timeout=300) for h in handles]
            assert got == want
            assert batcher.prefix_share_stats[0] >= 1
        finally:
            batcher.shutdown()
