"""Multi-LoRA serving (beyond-reference; vLLM --lora-modules): one worker
serves the frozen base plus N LoRA adapters sharing the base's arrays —
requests pick an adapter via the wire/OpenAI ``model`` field, the
controller routes by the advertised model_names, and adapter requests
bypass the continuous batcher (its slot loop runs the base params)."""

import json
import os
import socket
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.config import DataConfig, ModelConfig
from video3d_tpu.data.image_processor import SigLipImageProcessor
from video3d_tpu.data.video_processor import VideoProcessor
from video3d_tpu.eval.drivers import EngineConfig, InferenceEngine
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models.quant import quantize_tree
from video3d_tpu.serve.model_worker import ModelWorker, serve_worker
from video3d_tpu.train.lora import LoraConfig, apply_lora, init_lora

from fixtures import FakeTokenizer, make_fake_scene

CFG = ModelConfig.tiny()
LCFG = LoraConfig(r=4, alpha=64)   # big scale so adapter outputs diverge


def _adapter_tree(key, base, magnitude=0.5):
    """LoRA tree with LARGE nonzero B so the adapted forward visibly
    diverges from the base (init_lora's B=0 is a no-op delta)."""
    lora = init_lora(key, base, LCFG, dtype=jnp.bfloat16)

    def bump(x):
        if isinstance(x, dict) and set(x) == {"A", "B"}:
            k = jax.random.fold_in(key, x["B"].shape[-1])
            return {"A": x["A"],
                    "B": magnitude * jax.random.normal(
                        k, x["B"].shape, x["B"].dtype)}
        return x

    return jax.tree.map(bump, lora,
                        is_leaf=lambda x: isinstance(x, dict)
                        and set(x) == {"A", "B"})


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    info = make_fake_scene(root, n_frames=2)
    data_cfg = DataConfig(video_folder=root,
                          annotation_dir=os.path.join(root, "embodiedscan"),
                          metadata_dir=os.path.join(root, "metadata"),
                          frames_upbound=2)
    tok = FakeTokenizer()
    vp = VideoProcessor(data_cfg)
    ip = SigLipImageProcessor(size=(CFG.vision.image_size,) * 2)
    ecfg = EngineConfig(max_new_tokens=4, eos_token_id=tok.eos_token_id,
                        max_frames=2, buckets=(256,), stop_str="")
    # QLoRA serving shape: int8 frozen base shared by every engine;
    # apply_lora keeps the base lazy (LoraAdapted), so the adapter
    # engines reference the SAME q/scale arrays
    base = quantize_tree(
        lv3d.init_model(jax.random.PRNGKey(0), CFG, dtype=jnp.bfloat16),
        bits=8)
    engines = {}
    for i, name in enumerate(("tuned-a", "tuned-b")):
        params_i = apply_lora(
            base, _adapter_tree(jax.random.PRNGKey(10 + i), base), LCFG)
        engines[name] = InferenceEngine(params_i, CFG, tok, vp, ip, ecfg)
    base_engine = InferenceEngine(base, CFG, tok, vp, ip, ecfg)
    worker = ModelWorker(base_engine, "video3d-tiny", adapters=engines)
    return info, worker, base


class TestWorkerMultiLora:
    def test_status_advertises_adapters(self, stack):
        _, worker, _ = stack
        assert worker.status()["model_names"] == [
            "video3d-tiny", "tuned-a", "tuned-b"]

    def test_adapter_params_share_base_arrays(self, stack):
        """The whole point: N adapters must not duplicate the frozen base
        in HBM. Every quantized leaf of an adapter engine's params is the
        SAME buffer as the base tree's."""
        _, worker, base = stack
        adapted = worker.adapters["tuned-a"].params
        q_base = base["llm"]["layers"][0]["attn"]["wq"]["q"]
        node = adapted["llm"]["layers"][0]["attn"]["wq"]
        # LoraAdapted wraps the base dict; unwrap to its base field
        q_adapted = node.base["q"] if hasattr(node, "base") else node["q"]
        assert q_adapted is q_base

    def test_adapter_selected_by_model_field(self, stack):
        info, worker, _ = stack
        req = {"prompt": "<image>\nwhat is here?", "video": info["sample_idx"]}
        out_base = worker.generate(dict(req))
        out_a = worker.generate(dict(req, model="tuned-a"))
        out_b = worker.generate(dict(req, model="tuned-b"))
        assert out_base["error_code"] == 0
        assert out_a["error_code"] == 0 and out_b["error_code"] == 0
        # magnitude-0.5 rank-4 deltas at alpha/r=16 swing the tiny
        # model's logits far past any greedy tie
        assert out_a["text"] != out_base["text"]
        assert out_a["text"] != out_b["text"]

    def test_base_name_and_absent_model_equivalent(self, stack):
        info, worker, _ = stack
        req = {"prompt": "<image>\ndescribe", "video": info["sample_idx"]}
        assert worker.generate(dict(req))["text"] == \
            worker.generate(dict(req, model="video3d-tiny"))["text"]

    def test_unknown_model_errors(self, stack):
        info, worker, _ = stack
        out = worker.generate({"prompt": "hi", "video": info["sample_idx"],
                               "model": "nope"})
        assert out["error_code"] == 1
        assert "unknown model" in out["error"]

    def test_ground_routes_by_model(self, stack):
        info, worker, _ = stack
        eng = worker.adapters["tuned-a"]
        # ground needs a ground token configured; the tiny fixture engine
        # leaves it None -> the worker must answer with a clean error for
        # BOTH base and adapter (routing happens before the check)
        out = worker.ground({"video": info["sample_idx"], "query": "chair",
                             "model": "tuned-a"})
        if eng.ecfg.ground_token_id is None:
            assert out["error_code"] == 1
            assert "ground token" in out["error"]
        out = worker.ground({"video": info["sample_idx"], "query": "chair",
                             "model": "nope"})
        assert out["error_code"] == 1 and "unknown model" in out["error"]


class TestBatcherBypass:
    def test_adapter_requests_bypass_the_batcher(self, stack):
        """The continuous batcher's slot loop decodes the BASE params;
        adapter requests must route around it (serialized by the bypass
        semaphore) and still answer, while base requests keep batching."""
        from video3d_tpu.serve.batcher import ContinuousBatcher

        info, worker, _ = stack
        batcher = ContinuousBatcher(worker.engine, num_slots=1, chunk=2)
        w = ModelWorker(worker.engine, "video3d-tiny", batcher=batcher,
                        adapters=worker.adapters)
        try:
            req = {"prompt": "<image>\nwhat?", "video": info["sample_idx"]}
            out_base = w.generate(dict(req))
            out_a = w.generate(dict(req, model="tuned-a"))
            assert out_base["error_code"] == 0 and out_a["error_code"] == 0
            assert out_a["text"] != out_base["text"]
        finally:
            batcher.shutdown()


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read()), r.status


class TestHttpMultiLora:
    @pytest.fixture(scope="class")
    def http(self, stack):
        info, worker, _ = stack
        port = _free_port()
        w, server = serve_worker(
            worker.engine, "video3d-tiny", port=port, background=True,
            heartbeat=False, adapters=worker.adapters)
        yield info, f"http://127.0.0.1:{port}"
        server.shutdown()

    def test_v1_models_lists_adapters(self, http):
        _, addr = http
        with urllib.request.urlopen(addr + "/v1/models", timeout=30) as r:
            data = json.loads(r.read())
        assert [m["id"] for m in data["data"]] == [
            "video3d-tiny", "tuned-a", "tuned-b"]

    def test_openai_adapter_roundtrip(self, http):
        info, addr = http
        payload = {"model": "tuned-a", "video": info["sample_idx"],
                   "messages": [{"role": "user", "content": "what?"}]}
        out, status = _post(addr + "/v1/chat/completions", payload)
        assert status == 200
        assert out["model"] == "tuned-a"
        assert out["choices"][0]["message"]["content"] is not None

    def test_openai_unknown_model_404(self, http):
        info, addr = http
        payload = {"model": "missing", "video": info["sample_idx"],
                   "messages": [{"role": "user", "content": "x"}]}
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(addr + "/v1/chat/completions", payload)
        assert e.value.code == 404
        body = json.loads(e.value.read())
        assert body["error"]["code"] == "model_not_found"

    def test_worker_generate_adapter_field(self, http):
        info, addr = http
        base, _ = _post(addr + "/worker_generate",
                        {"prompt": "<image>\nwhat", "video": info["sample_idx"]})
        tuned, _ = _post(addr + "/worker_generate",
                         {"prompt": "<image>\nwhat",
                          "video": info["sample_idx"], "model": "tuned-b"})
        assert base["error_code"] == 0 and tuned["error_code"] == 0
        assert base["text"] != tuned["text"]


class TestControllerRouting:
    def test_adapter_names_routable(self):
        from video3d_tpu.serve.controller import Controller

        c = Controller("shortest_queue")
        c.register_worker("http://w1", True,
                          {"model_names": ["base", "base-lora"],
                           "speed": 1, "queue_length": 0})
        assert c.get_worker_address("base-lora") == "http://w1"
        assert c.get_worker_address("base") == "http://w1"
        assert c.get_worker_address("other") == ""
