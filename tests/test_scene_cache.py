"""Scene-level vision-feature cache (EngineConfig.scene_cache_scenes):
answers identical with and without the cache, the tower genuinely skipped
on hits, LRU eviction, and composition with Scan2Cap's per-question
<coord> box input (which must NOT be cached)."""

import os

import numpy as np
import pytest

import jax

from video3d_tpu.config import DataConfig, ModelConfig
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


def _engine(data_cfg, cache_scenes):
    tok = FakeTokenizer()
    params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
    return InferenceEngine(
        params, CFG, tok, VideoProcessor(data_cfg),
        SigLipImageProcessor(size=(CFG.vision.image_size,) * 2),
        EngineConfig(max_new_tokens=4, eos_token_id=tok.eos_token_id,
                     max_frames=3, buckets=(256,), stop_str="",
                     scene_cache_scenes=cache_scenes))


class TestSceneCache:
    def test_answers_identical_and_tower_skipped(self, scene, monkeypatch):
        infos, data_cfg = scene
        plain = _engine(data_cfg, 0)
        cached = _engine(data_cfg, 4)

        calls = {"n": 0}
        orig = lv3d.encode_video_pooled

        def counting(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(lv3d, "encode_video_pooled", counting)

        qs = [_question(infos[0], i=i) for i in range(3)]
        plain_answers = [plain.generate_answer(q) for q in qs]
        calls["n"] = 0
        cached_answers = [cached.generate_answer(q) for q in qs]
        assert cached_answers == plain_answers
        # tower ran exactly once (the first question); hits for the rest
        assert calls["n"] == 1
        assert cached.scene_cache_stats == [2, 1]

    def test_lru_eviction(self, scene):
        infos, data_cfg = scene
        eng = _engine(data_cfg, 2)           # room for two scenes
        for info in infos:                   # 3 distinct scenes -> evict 1st
            eng.generate_answer(_question(info))
        assert len(eng._scene_cache) == 2
        assert infos[0]["sample_idx"] not in eng._scene_cache
        # revisiting the evicted scene is a miss, then cached again
        eng.generate_answer(_question(infos[0]))
        assert eng.scene_cache_stats == [0, 4]
        eng.generate_answer(_question(infos[0]))
        assert eng.scene_cache_stats == [1, 4]

    def test_box_input_not_cached(self, scene):
        """Scan2Cap's <coord> box is per-question: two questions on the SAME
        scene with different boxes must produce different batches even when
        the vision features come from the cache."""
        infos, data_cfg = scene
        eng = _engine(data_cfg, 2)
        tok = eng.tokenizer
        tok.add_tokens(["<coord>"], special_tokens=True)
        coord_id = tok.vocab["<coord>"]
        q = _question(infos[0], text="describe the object at <coord>")
        b1, f1 = eng._prepare_generation(q, box_input=np.asarray(
            [0.0, 0.0, 0.0], np.float32), coord_token_id=coord_id)
        b2, f2 = eng._prepare_generation(q, box_input=np.asarray(
            [3.0, 3.0, 1.0], np.float32), coord_token_id=coord_id)
        assert eng.scene_cache_stats[0] >= 1          # second call hit
        assert not np.allclose(np.asarray(b1.box_input),
                               np.asarray(b2.box_input))
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2))

    def test_llava3d_path_bypasses_cache(self, scene):
        from video3d_tpu.config import replace
        infos, data_cfg = scene
        eng = _engine(data_cfg, 2)
        eng.cfg = replace(eng.cfg, world_3d=replace(
            eng.cfg.world_3d, llava3d=True))
        batch, feats = eng._prepare_generation(_question(infos[0]))
        assert eng.scene_cache_stats == [0, 0]
        assert len(eng._scene_cache) == 0
