"""Multi-chip inference: an InferenceEngine handed a Mesh must produce the
same answers as the single-device engine.

The reference has no sharded-inference path at all (every eval driver in
llava/eval/model_*.py binds one whole model to one GPU); serving a >16 GB
model on a v5e slice requires tensor-parallel inference, so the engine grows
a ``mesh=`` argument: params are laid out per parallel/mesh.py partition
rules, generation traces under the ambient mesh so kernels/attention.py can
route decode through its shard_map TP wrapper, and batch dims ride dp/fsdp
when they divide.

Runs on the virtual 8-device CPU platform (conftest)."""

import numpy as np
import pytest

import jax

from video3d_tpu.config import DataConfig, ModelConfig
from video3d_tpu.data.image_processor import SigLipImageProcessor
from video3d_tpu.data.video_processor import VideoProcessor
from video3d_tpu.eval.drivers import EngineConfig, InferenceEngine
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.parallel.mesh import create_mesh

from fixtures import FakeTokenizer, make_fake_scene

CFG = ModelConfig.tiny()


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    info = make_fake_scene(root, n_frames=3)
    data_cfg = DataConfig(video_folder=root,
                          annotation_dir=f"{root}/embodiedscan",
                          metadata_dir=f"{root}/metadata",
                          frames_upbound=3)
    tok = FakeTokenizer()
    params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
    ecfg = EngineConfig(max_new_tokens=4, eos_token_id=tok.eos_token_id,
                        max_frames=3, buckets=(256,), stop_str="",
                        ground_token_id=tok.vocab["<ground>"], max_objects=8)
    vp = VideoProcessor(data_cfg)
    ip = SigLipImageProcessor(size=(CFG.vision.image_size,) * 2)
    single = InferenceEngine(params, CFG, tok, vp, ip, ecfg)
    return info, params, tok, vp, ip, ecfg, single


def question(info, i=0):
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


def _mesh_engine(env, mesh):
    info, params, tok, vp, ip, ecfg, _ = env
    return InferenceEngine(params, CFG, tok, vp, ip, ecfg, mesh=mesh)


class TestTensorParallelInference:
    def test_tp_prefix_cache_matches_single(self, env):
        """Prefix cache under a tp=2 mesh: the miss-path prefill (traced
        under the mesh) harvests a SHARDED prefix KV; the hit's suffix
        prefill reuses it. Answers equal the single-device engine's for
        every question, and the second/third questions are hits."""
        import dataclasses

        info, params, tok, vp, ip, ecfg, single = env
        mesh = create_mesh(tp=2, devices=jax.devices()[:2])
        eng = InferenceEngine(
            params, CFG, tok, vp, ip,
            dataclasses.replace(ecfg, prefix_cache_scenes=2,
                                suffix_buckets=(32, 64)), mesh=mesh)
        qs = []
        for i, t in enumerate(["what color is the chair",
                               "how many tables", "where is the lamp"]):
            q = question(info, i=i)
            q["conversations"][0]["value"] = f"<image>\n{t}"
            qs.append(q)
        got = [eng.generate_answer(q) for q in qs]
        want = [single.generate_answer(q) for q in qs]
        assert got == want
        assert eng.prefix_cache_stats == [2, 1]

    def test_tp_answer_matches_single(self, env):
        """Pure-TP mesh (tp=2): heads split across 2 devices; the shard_map
        decode path in kernels/attention.py::mha is exercised (B=1 so no
        batch axis; n_tp=2 divides H=4 and KV=2)."""
        info, *_, single = env
        mesh = create_mesh(tp=2, devices=jax.devices()[:2])
        eng = _mesh_engine(env, mesh)
        assert eng.generate_answer(question(info)) == \
            single.generate_answer(question(info))

    def test_dp_tp_batch_matches_single(self, env):
        """dp=2 x tp=2 mesh over 4 devices: a 2-question batch shards its
        batch dim over dp and heads over tp."""
        info, *_, single = env
        mesh = create_mesh(dp=2, tp=2, devices=jax.devices()[:4])
        eng = _mesh_engine(env, mesh)
        qs = [question(info, 0), question(info, 1)]
        assert eng.generate_answers_batch(qs) == \
            single.generate_answers_batch(qs)

    def test_full_mesh_fsdp(self, env):
        """Default 8-device mesh (fsdp=8 with tp=1): params ZeRO-sharded;
        GSPMD all-gathers weights per layer. Pure capacity play — answers
        still match."""
        info, *_, single = env
        mesh = create_mesh()
        eng = _mesh_engine(env, mesh)
        assert eng.generate_answer(question(info)) == \
            single.generate_answer(question(info))

    def test_tp_ground_matches_single(self, env):
        """Discriminative path under TP sharding (grounding_forward runs
        via GSPMD on the sharded params)."""
        info, *_, single = env
        mesh = create_mesh(tp=2, devices=jax.devices()[:2])
        eng = _mesh_engine(env, mesh)
        rec = {
            "id": "g0",
            "video": info["sample_idx"],
            "box": info["boxes"][1].tolist(),
            "conversations": [
                {"from": "human", "value": "<image>\nIdentify the brown chair"},
                {"from": "gpt", "value": "<ground>"},
            ],
            "metadata": {"dataset": "scanrefer", "question_type": "unique",
                         "object_id": 1,
                         "gt_box": info["boxes"][1].tolist()},
        }
        s_scores, s_obj = single.ground(rec)
        m_scores, m_obj = eng.ground(rec)
        np.testing.assert_allclose(m_scores, s_scores, rtol=2e-2, atol=2e-2)
        np.testing.assert_array_equal(m_obj, s_obj)

    def test_tp_stream_matches_single(self, env):
        """Streaming decode under the mesh: chunked decode_chunk calls run
        inside the mesh context; final text matches."""
        info, *_, single = env
        mesh = create_mesh(tp=2, devices=jax.devices()[:2])
        eng = _mesh_engine(env, mesh)
        chunks = list(eng.generate_answer_stream(question(info), chunk=2))
        assert chunks[-1] == single.generate_answer(question(info))

    def test_tp_batcher_matches_single(self, env):
        """Continuous batching over a TP-sharded engine: the scheduler
        thread enters the mesh context, so admissions and the shared
        decode chunk trace under the mesh."""
        from video3d_tpu.serve.batcher import ContinuousBatcher

        info, *_, single = env
        mesh = create_mesh(tp=2, devices=jax.devices()[:2])
        eng = _mesh_engine(env, mesh)
        records = [question(info, 0), question(info, 1)]
        want = [single.generate_answer(r) for r in records]
        batcher = ContinuousBatcher(eng, num_slots=2, chunk=2)
        try:
            handles = [batcher.submit(r) for r in records]
            got = [h.result(eng._decode_text, timeout=300) for h in handles]
        finally:
            batcher.shutdown()
        assert got == want


class TestMeshComposition:
    def test_tp_int8_matches_single_int8(self, env):
        """int8 weight quantization composes with TP sharding: the
        {"q", "scale"} leaf dicts are ordinary pytrees, so shard_params
        lays the int8 matrices out by the same partition rules."""
        from video3d_tpu.models.quant import quantize_tree

        info, params, tok, vp, ip, ecfg, _ = env
        qparams = quantize_tree(params)
        single = InferenceEngine(qparams, CFG, tok, vp, ip, ecfg)
        mesh = create_mesh(tp=2, devices=jax.devices()[:2])
        eng = InferenceEngine(qparams, CFG, tok, vp, ip, ecfg, mesh=mesh)
        # the int8 payloads must be genuinely partitioned (the {q, scale}
        # nesting must inherit the weight's rule, not fall to replicate) —
        # tp serving of a >one-chip model depends on it
        wq = eng.params["llm"]["layers"][0]["attn"]["wq"]
        assert wq["q"].sharding.spec == jax.sharding.PartitionSpec(
            "fsdp", "tp")
        assert not wq["q"].sharding.is_fully_replicated
        assert eng.generate_answer(question(info)) == \
            single.generate_answer(question(info))

    def test_tp_int8_kv_matches_single(self, env):
        """int8 KV cache under TP: the per-token (B, S, KV, 1) scale
        tensors shard over tp on the kv-head dim inside the shard_map
        decode wrapper."""
        from dataclasses import replace as dc_replace

        info, params, tok, vp, ip, ecfg, single = env
        kv_ecfg = dc_replace(ecfg, kv_cache_dtype="int8")
        ref = InferenceEngine(params, CFG, tok, vp, ip, kv_ecfg)
        mesh = create_mesh(tp=2, devices=jax.devices()[:2])
        eng = InferenceEngine(params, CFG, tok, vp, ip, kv_ecfg, mesh=mesh)
        assert eng.generate_answer(question(info)) == \
            ref.generate_answer(question(info))

    def test_tp_spec_batcher_matches_single(self, env):
        """Speculative continuous batching under the mesh (spec_start /
        spec_decode_chunk trace inside the scheduler thread's mesh
        context) still equals sequential greedy."""
        from dataclasses import replace as dc_replace

        from video3d_tpu.serve.batcher import ContinuousBatcher

        info, params, tok, vp, ip, ecfg, single = env
        spec_ecfg = dc_replace(ecfg, speculative_draft_layers=1,
                               speculative_k=2)
        mesh = create_mesh(tp=2, devices=jax.devices()[:2])
        eng = InferenceEngine(params, CFG, tok, vp, ip, spec_ecfg, mesh=mesh)
        records = [question(info, 0), question(info, 1)]
        want = [single.generate_answer(r) for r in records]
        batcher = ContinuousBatcher(eng, num_slots=2, chunk=2)
        assert batcher.spec
        try:
            handles = [batcher.submit(r) for r in records]
            got = [h.result(eng._decode_text, timeout=300) for h in handles]
        finally:
            batcher.shutdown()
        assert got == want
