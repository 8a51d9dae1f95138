"""End-to-end inference driver tests on the synthetic scene with the tiny
model: generative (ScanQA-style) and discriminative (ScanRefer-style) loops
produce well-formed jsonl records that feed the metric protocols."""

import json
import os

import numpy as np
import pytest

import jax

from video3d_tpu.config import DataConfig, ModelConfig
from video3d_tpu.data.image_processor import SigLipImageProcessor
from video3d_tpu.data.video_processor import VideoProcessor
from video3d_tpu.eval import protocols
from video3d_tpu.eval.drivers import (EngineConfig, InferenceEngine,
                                      run_multi3drefer, run_scanqa,
                                      run_scanrefer)
from video3d_tpu.models import llava_video3d as lv3d

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
        EngineConfig(max_new_tokens=4, eos_token_id=tok.eos_token_id,
                     max_frames=3, buckets=(256,), stop_str="",
                     ground_token_id=tok.vocab["<ground>"], max_objects=8))
    return info, engine, tok, str(tmp_path_factory.mktemp("results"))


def scanqa_question(info, i=0):
    return {
        "id": f"q{i}_0",
        "video": info["sample_idx"],
        "conversations": [
            {"from": "human", "value": "<image>\nwhat color is the chair"},
            {"from": "gpt", "value": "brown"},
        ],
        "metadata": {"dataset": "scanqa", "question_type": "what",
                     "answers": ["brown"]},
    }


class TestGenerativeDriver:
    def test_scanqa_roundtrip(self, env):
        info, engine, tok, outdir = env
        answer_file = os.path.join(outdir, "scanqa.jsonl")
        qs = [scanqa_question(info, i) for i in range(2)]
        times = run_scanqa(engine, qs, answer_file)
        assert len(times) == 2
        with open(answer_file) as f:
            records = [json.loads(l) for l in f]
        assert len(records) == 2
        for r in records:
            assert isinstance(r["pred_response"], str)
            assert r["gt_response"] == "brown"
        # metric protocol consumes the records
        id2ans = {"q0_0": ["brown"], "q1_0": ["brown"]}
        out = protocols.scanqa_metrics(records, id2ans)
        assert 0 <= out["EM"] <= 1 and "CIDEr" in out


class TestGroundingDriver:
    def _question(self, info, object_id=1):
        return {
            "id": "g0",
            "video": info["sample_idx"],
            "box": info["boxes"][object_id].tolist(),
            "conversations": [
                {"from": "human", "value": "<image>\nIdentify the brown chair"},
                {"from": "gpt", "value": "<ground>"},
            ],
            "metadata": {"dataset": "scanrefer", "question_type": "unique",
                         "object_id": object_id,
                         "gt_box": info["boxes"][object_id].tolist()},
        }

    def test_scanrefer_roundtrip(self, env):
        info, engine, tok, outdir = env
        answer_file = os.path.join(outdir, "scanrefer.jsonl")
        run_scanrefer(engine, [self._question(info)], answer_file)
        with open(answer_file) as f:
            rec = json.loads(f.readline())
        assert len(rec["pred_response"]) == 6
        out = protocols.scanrefer_metrics([rec])
        assert "all@0.25" in out

    def test_multi3drefer_roundtrip(self, env):
        info, engine, tok, outdir = env
        answer_file = os.path.join(outdir, "m3dr.jsonl")
        q = self._question(info)
        q["metadata"]["dataset"] = "multi3drefer"
        q["metadata"]["question_type"] = "st_w_d"
        q["box"] = [q["box"]]   # multi3drefer gt is a LIST of boxes
        run_multi3drefer(engine, [q], answer_file)
        with open(answer_file) as f:
            rec = json.loads(f.readline())
        assert len(rec["scores"]) == len(rec["objects"]) + 1
        out = protocols.multi3drefer_metrics([rec])
        assert "all@F1_0.25" in out


class TestDeviceGeometryPath:
    def test_device_geometry_answers_match_host(self, env):
        """device_geometry=True (fused kernel, interpret on CPU) produces the
        same greedy answer as the host path — the voxel ids agree."""
        from video3d_tpu.eval.drivers import EngineConfig, InferenceEngine

        info, host_engine, tok, outdir = env
        dev_engine = InferenceEngine(
            host_engine.params, CFG, tok, host_engine.vp, host_engine.ip,
            host_engine.ecfg, device_geometry=True)
        q = scanqa_question(info)
        a_host = host_engine.generate_answer(q)
        a_dev = dev_engine.generate_answer(q)
        assert a_dev == a_host

    def test_eval_during_training(self, env, tmp_path):
        from video3d_tpu.config import DataConfig
        from video3d_tpu.data.dataset import (Collator, CollatorConfig,
                                              SupervisedDataset)
        from video3d_tpu.data.image_processor import SigLipImageProcessor
        from video3d_tpu.train.optim import OptimConfig
        from video3d_tpu.train.trainer import Trainer, TrainingConfig
        from video3d_tpu.parallel.mesh import create_mesh
        from fixtures import make_fake_annotations
        import jax

        info, engine, tok, outdir = env
        root = os.path.dirname(os.path.dirname(
            engine.vp.cfg.annotation_dir.rstrip("/")))
        ann = make_fake_annotations(engine.vp.cfg.video_folder,
                                    info["sample_idx"], n=2)
        dc = engine.vp.cfg
        ds = SupervisedDataset(ann, tok, dc,
                               image_processor=SigLipImageProcessor(size=(56, 56)))
        col = Collator(CFG, CollatorConfig(max_len=160, frames_upbound=3))
        mesh = create_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
        trainer = Trainer(CFG, engine.params, ds, col,
                          OptimConfig(total_steps=2),
                          TrainingConfig(output_dir=str(tmp_path), bf16=False),
                          mesh=mesh)
        out = trainer.evaluate(max_batches=1)
        assert np.isfinite(out["eval_loss"]) and out["eval_batches"] == 1

    def test_run_vqa(self, env, tmp_path):
        from video3d_tpu.eval.drivers import run_vqa
        import json

        info, engine, tok, outdir = env
        q = {"id": "v0", "video": info["sample_idx"],
             "conversations": [{"from": "human", "value": "<image>\ndescribe"}]}
        f = str(tmp_path / "vqa.jsonl")
        run_vqa(engine, [q], f)
        rec = json.loads(open(f).readline())
        assert "pred_response" in rec and rec["gt_response"] is None


class TestBatchedGeneration:
    def test_batched_matches_single(self, env):
        """Batched generate == per-sample generate (right-padded batch)."""
        info, engine, tok, outdir = env
        q1 = scanqa_question(info, 0)
        q2 = scanqa_question(info, 1)
        q2["conversations"][0]["value"] = "<image>\nhow many chairs are there"
        singles = [engine.generate_answer(q1), engine.generate_answer(q2)]
        batched = engine.generate_answers_batch([q1, q2])
        assert batched == singles

    def test_run_generative_batch_mode(self, env, tmp_path):
        from video3d_tpu.eval.drivers import run_generative
        import json

        info, engine, tok, outdir = env
        qs = [scanqa_question(info, i) for i in range(3)]
        f = str(tmp_path / "batched.jsonl")
        times = run_generative(engine, qs, f, batch_size=2)
        assert len(times) == 3
        records = [json.loads(l) for l in open(f)]
        assert [r["sample_id"] for r in records] == ["q0_0", "q1_0", "q2_0"]


class TestMcSamplingEngine:
    def test_generate_with_mc_ratio90(self, env, tmp_path):
        """Max-coverage frame sampling flows through the engine end to end
        (video_utils.py:131-159 prefix selection + chronological sort)."""
        from video3d_tpu.config import DataConfig, FrameSampling, replace
        from video3d_tpu.data.video_processor import VideoProcessor
        from video3d_tpu.eval.drivers import InferenceEngine

        info, engine, tok, outdir = env
        mc_cfg = replace(engine.vp.cfg, frame_sampling=FrameSampling.MC_RATIO90)
        mc_engine = InferenceEngine(engine.params, CFG, tok,
                                    VideoProcessor(mc_cfg), engine.ip,
                                    engine.ecfg)
        q = scanqa_question(info)
        ans = mc_engine.generate_answer(q)
        assert isinstance(ans, str)
        # the mc selector must actually have been used
        frames = mc_engine.vp.select_frames(info["sample_idx"], True, 3)
        assert len(frames) <= 3 and frames == sorted(
            frames, key=lambda f: int(f.split("/")[-1].split(".")[0]))


class TestBatchedGrounding:
    def test_ground_batch_matches_single(self, env, tmp_path):
        """ground_batch == per-sample ground (one prefill, B queries)."""
        info, engine, tok, outdir = env
        qs = []
        for i, oid in enumerate((1, 2, 3)):
            qs.append({
                "id": f"g{i}", "video": info["sample_idx"],
                "box": info["boxes"][oid].tolist(),
                "conversations": [
                    {"from": "human", "value": f"<image>\nfind object {oid}"},
                    {"from": "gpt", "value": "<ground>"}],
                "metadata": {"dataset": "scanrefer", "question_type": "unique",
                             "object_id": oid,
                             "gt_box": info["boxes"][oid].tolist()}})
        singles = [engine.ground(q) for q in qs]
        batched = engine.ground_batch(qs)
        for (s1, o1), (s2, o2) in zip(singles, batched):
            np.testing.assert_array_equal(o1, o2)
            np.testing.assert_allclose(s2, s1, rtol=2e-5, atol=2e-5)

    def test_run_scanrefer_batched(self, env, tmp_path):
        from video3d_tpu.eval.drivers import run_scanrefer
        info, engine, tok, outdir = env
        q = {
            "id": "g0", "video": info["sample_idx"],
            "box": info["boxes"][1].tolist(),
            "conversations": [
                {"from": "human", "value": "<image>\nfind the chair"},
                {"from": "gpt", "value": "<ground>"}],
            "metadata": {"dataset": "scanrefer", "question_type": "unique",
                         "object_id": 1, "gt_box": info["boxes"][1].tolist()}}
        f1, f2 = str(tmp_path / "a.jsonl"), str(tmp_path / "b.jsonl")
        run_scanrefer(engine, [q, q], f1, batch_size=1)
        run_scanrefer(engine, [q, q], f2, batch_size=2)
        r1 = [json.loads(l)["pred_response"] for l in open(f1)]
        r2 = [json.loads(l)["pred_response"] for l in open(f2)]
        assert r1 == r2


class TestSpeculativeEngine:
    def test_spec_engine_matches_vanilla(self, env):
        """Engine dispatch: speculative_draft_layers > 0 routes through
        generate_speculative and yields identical answers (greedy exactness,
        models/speculative.py)."""
        from dataclasses import replace as dc_replace

        info, engine, tok, outdir = env
        q = scanqa_question(info, 0)
        vanilla = engine.generate_answer(q)

        spec_engine = InferenceEngine(
            engine.params, CFG, tok, engine.vp, engine.ip,
            dc_replace(engine.ecfg, speculative_draft_layers=1,
                       speculative_k=3),
            device_geometry=engine.device_geometry)
        spec = spec_engine.generate_answer(q)
        assert spec == vanilla

    def test_acceptance_guard_disables_bad_draft(self, env):
        """A 1-layer random draft accepts ~nothing; with a min-acceptance
        threshold the engine falls back to vanilla after a few requests,
        and answers stay identical throughout (speculation is never wrong)."""
        from dataclasses import replace as dc_replace

        info, engine, tok, outdir = env
        q = scanqa_question(info, 0)
        want = engine.generate_answer(q)
        spec_engine = InferenceEngine(
            engine.params, CFG, tok, engine.vp, engine.ip,
            dc_replace(engine.ecfg, speculative_draft_layers=1,
                       speculative_k=3, speculative_min_acceptance=0.99),
            device_geometry=engine.device_geometry)
        outs = [spec_engine.generate_answer(q) for _ in range(3)]
        assert all(o == want for o in outs)
        assert spec_engine._spec_disabled     # guard tripped
        assert spec_engine.spec_stats[1] > 0


class TestMultiTurnChat:
    """Multi-turn records (the reference serve/cli.py conversation loop,
    llava/serve/cli.py:58-86): every turn goes through the ChatML
    construction and the <image> splice stays anchored in turn 0."""

    def _multi(self, info):
        return {
            "video": info["sample_idx"],
            "conversations": [
                {"from": "human", "value": "<image>\nwhat is in the room"},
                {"from": "gpt", "value": "a chair"},
                {"from": "human", "value": "what color is it"},
                {"from": "gpt", "value": None},
            ],
        }

    def test_multi_turn_prompt_structure(self, env):
        """The multi-turn prompt: system + every history turn in ChatML +
        generation header; the <image> splice anchored in turn 0 so the
        single-turn prefix (the scene-prefix KV key) is preserved."""
        from video3d_tpu.constants import IMAGE_TOKEN_INDEX

        info, engine, tok, outdir = env
        rec = self._multi(info)
        ids = engine._tokenize_prompt(rec)
        single = engine._tokenize_prompt({
            "video": info["sample_idx"],
            "conversations": rec["conversations"][:1]
            + [{"from": "gpt", "value": None}]})

        # exactly one image sentinel, in the same spot as single-turn —
        # ids[:img+1] is the scene-prefix cache key, so history reuses it
        assert ids.count(IMAGE_TOKEN_INDEX) == 1
        img = ids.index(IMAGE_TOKEN_INDEX)
        assert ids[:img + 1] == single[:img + 1]

        # history words present exactly once each, in order
        im_start = tok.vocab["<|im_start|>"]
        a_chair = [tok.vocab["a"], tok.vocab["chair"]]
        q2 = [tok.vocab[w] for w in "what color is it".split()]
        s = list(ids)
        i_ans = next(i for i in range(len(s)) if s[i:i + 2] == a_chair)
        i_q2 = next(i for i in range(len(s)) if s[i:i + 4] == q2)
        assert img < i_ans < i_q2

        # ends with the assistant generation header, like single-turn
        header = [im_start] + list(tok("assistant\n").input_ids)
        assert s[-len(header):] == header and single[-len(header):] == header
        # and is strictly longer than single-turn by the history turns
        assert len(s) > len(single)

    def test_image_in_later_turn_not_doubled(self, env):
        """A reference-style history can anchor <image> in the turn that
        introduced the media; the engine must not inject a second
        sentinel (the splice plan is single-image)."""
        from video3d_tpu.constants import IMAGE_TOKEN_INDEX

        info, engine, tok, outdir = env
        ids = engine._tokenize_prompt({
            "video": info["sample_idx"],
            "conversations": [
                {"from": "human", "value": "hello"},
                {"from": "gpt", "value": "hi"},
                {"from": "human", "value": "<image>\nwhat is in the room"},
                {"from": "gpt", "value": None},
            ],
        })
        assert ids.count(IMAGE_TOKEN_INDEX) == 1

    def test_generate_and_prefix_hit(self, env):
        """Multi-turn generation runs end-to-end, and with the prefix
        cache on, the follow-up turn hits the scene prefix."""
        from dataclasses import replace as dc_replace

        info, engine, tok, outdir = env
        rec = self._multi(info)
        text = engine.generate_answer(rec)
        assert isinstance(text, str)

        cached = InferenceEngine(
            engine.params, CFG, tok, engine.vp, engine.ip,
            dc_replace(engine.ecfg, prefix_cache_scenes=2,
                       suffix_buckets=(64, 128)),
            device_geometry=engine.device_geometry)
        first = cached.generate_answer({
            "video": info["sample_idx"],
            "conversations": rec["conversations"][:1]
            + [{"from": "gpt", "value": None}]})
        follow = cached.generate_answer(rec)
        assert cached.prefix_cache_stats[0] >= 1      # the follow-up hit
        assert follow == engine.generate_answer(rec)
