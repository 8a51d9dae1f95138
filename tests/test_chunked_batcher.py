"""Chunked-prefill admissions in the continuous batcher
(ContinuousBatcher(chunked_prefill=N) -> models/generate.py
ChunkedPrefill): cold FULL-mode admissions run N prompt tokens per
scheduler iteration between shared decode chunks instead of stalling the
decode loop for the whole prefill. Answers must equal the sequential
engine; prefix-mode admissions stay atomic; decode keeps flowing while a
job is in progress; cancellation drops queued jobs."""

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


def _engine(data_cfg, prefix_scenes=0, **kw):
    tok = FakeTokenizer()
    params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
    return InferenceEngine(
        params, CFG, tok, VideoProcessor(data_cfg),
        SigLipImageProcessor(size=(CFG.vision.image_size,) * 2),
        EngineConfig(max_new_tokens=4, eos_token_id=tok.eos_token_id,
                     max_frames=3, buckets=(256,), stop_str="",
                     suffix_buckets=(32, 64),
                     prefix_cache_scenes=prefix_scenes, **kw))


def _record(info, question, i=0):
    return {
        "id": f"q{i}", "video": info["sample_idx"],
        "conversations": [{"from": "human", "value": f"<image>\n{question}"},
                          {"from": "gpt", "value": None}],
    }


QS = ("what color is the chair", "how many tables are there",
      "where is the lamp")


class TestChunkedBatcher:
    @pytest.mark.parametrize("paged", [False, True])
    def test_matches_sequential(self, scene, paged):
        """Cold admissions through the chunk pipeline == the engine's
        one-at-a-time answers (tuple preps: prefix cache off)."""
        infos, data_cfg = scene
        eng = _engine(data_cfg, 0)
        records = [_record(infos[0], q, i) for i, q in enumerate(QS)]
        want = [eng.generate_answer(r) for r in records]
        batcher = ContinuousBatcher(eng, num_slots=2, chunk=2, paged=paged,
                                    page_size=8, chunked_prefill=64)
        try:
            assert batcher.chunk_prefill == 64
            handles = [batcher.submit(r) for r in records]
            got = [h.result(eng._decode_text, timeout=600) for h in handles]
            assert got == want
            assert batcher._job is None and not batcher._chunkq
        finally:
            batcher.shutdown()

    def test_prefix_hits_stay_atomic_and_harvest(self, scene):
        """With the prefix cache on: the first (cold) admission chunks
        AND harvests the scene prefix (finish_chunked); later same-scene
        admissions take the atomic prefix path."""
        infos, data_cfg = scene
        plain = _engine(data_cfg, 0)
        records = [_record(infos[0], q, i) for i, q in enumerate(QS)]
        want = [plain.generate_answer(r) for r in records]

        eng = _engine(data_cfg, 4)
        batcher = ContinuousBatcher(eng, num_slots=2, chunk=2, paged=True,
                                    page_size=8, chunked_prefill=64)
        try:
            got = [batcher.submit(records[0]).result(eng._decode_text,
                                                     timeout=600)]
            assert eng.prefix_cache_stats[1] == 1       # harvested by job
            handles = [batcher.submit(r) for r in records[1:]]
            got += [h.result(eng._decode_text, timeout=600)
                    for h in handles]
            assert got == want
            assert eng.prefix_cache_stats[0] >= 2       # later ones hit
            assert batcher.prefix_share_stats[0] >= 2   # and shared pages
        finally:
            batcher.shutdown()

    def test_decode_flows_during_job(self, scene):
        """The point of chunking: an in-flight stream keeps emitting
        while a cold admission runs its chunks."""
        from dataclasses import replace as dc_replace

        infos, data_cfg = scene
        eng = _engine(data_cfg, 0)
        eng.ecfg = dc_replace(eng.ecfg, max_new_tokens=96,
                              eos_token_id=-1)
        batcher = ContinuousBatcher(eng, num_slots=2, chunk=2,
                                    chunked_prefill=16)
        try:
            r1 = batcher.submit(_record(infos[0], QS[0], 0))
            s1 = r1.text_stream(eng._decode_text)
            next(s1)                       # r1 decoding
            n_before = len(r1.tokens)
            r2 = batcher.submit(_record(infos[1], QS[1], 1))
            r2.result(eng._decode_text, timeout=600)
            # r1 advanced while r2's ~16-chunk job ran
            assert len(r1.tokens) > n_before
            r1.cancel()
        finally:
            batcher.shutdown()

    def test_cancel_queued_job(self, scene):
        infos, data_cfg = scene
        eng = _engine(data_cfg, 0)
        batcher = ContinuousBatcher(eng, num_slots=1, chunk=2,
                                    chunked_prefill=32)
        try:
            r1 = batcher.submit(_record(infos[0], QS[0], 0))
            r2 = batcher.submit(_record(infos[1], QS[1], 1))
            r2.cancel()
            out1 = r1.result(eng._decode_text, timeout=600)
            assert isinstance(out1, str)
            assert r2.result(eng._decode_text, timeout=600) == ""
            deadline = time.time() + 30
            while time.time() < deadline and (batcher._job is not None
                                              or batcher._chunkq):
                time.sleep(0.05)
            assert batcher._job is None and not batcher._chunkq
        finally:
            batcher.shutdown()
