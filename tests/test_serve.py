"""End-to-end serving tests: controller + worker over real HTTP sockets,
full generate round-trip through the tiny engine on the synthetic scene."""

import json
import os
import socket
import time
import urllib.request

import pytest

import jax

from video3d_tpu.config import DataConfig, ModelConfig
from video3d_tpu.data.image_processor import SigLipImageProcessor
from video3d_tpu.data.video_processor import VideoProcessor
from video3d_tpu.eval.drivers import EngineConfig, InferenceEngine
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.serve.controller import _post_json, serve_controller
from video3d_tpu.serve.model_worker import serve_worker

from fixtures import FakeTokenizer, make_fake_scene

CFG = ModelConfig.tiny()


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    info = make_fake_scene(root, n_frames=2)
    data_cfg = DataConfig(video_folder=root,
                          annotation_dir=os.path.join(root, "embodiedscan"),
                          metadata_dir=os.path.join(root, "metadata"),
                          frames_upbound=2)
    tok = FakeTokenizer()
    engine = InferenceEngine(
        lv3d.init_model(jax.random.PRNGKey(0), CFG), CFG, tok,
        VideoProcessor(data_cfg),
        SigLipImageProcessor(size=(CFG.vision.image_size,) * 2),
        EngineConfig(max_new_tokens=3, eos_token_id=tok.eos_token_id,
                     max_frames=2, buckets=(256,), stop_str=""))

    cport, wport = free_port(), free_port()
    controller, cserver = serve_controller(port=cport, background=True)
    caddr = f"http://127.0.0.1:{cport}"
    worker, wserver = serve_worker(engine, "video3d-tiny", port=wport,
                                   controller_addr=caddr, background=True,
                                   heartbeat=False)
    yield info, caddr, f"http://127.0.0.1:{wport}", controller
    cserver.shutdown()
    wserver.shutdown()


def _get_text(url, timeout=60):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.headers.get("Content-Type", ""), r.read().decode()


class TestSceneAffinity:
    """scene_affinity dispatch (Controller, beyond reference): same-scene
    requests stick to the worker whose engine LRU holds the scene's
    feature/prefix caches, with a bounded-backlog rebalance guard."""

    def _c(self, **kw):
        from video3d_tpu.serve.controller import Controller

        c = Controller("scene_affinity", **kw)
        for w in ("http://w1", "http://w2"):
            c.register_worker(w, True, {"model_names": ["m"], "speed": 1,
                                        "queue_length": 0})
        return c

    def _reset_queues(self, c):
        c.receive_heart_beat("http://w1", 0)
        c.receive_heart_beat("http://w2", 0)

    def test_same_scene_sticks(self):
        c = self._c()
        first = c.get_worker_address("m", scene="scannet/scene0000_00")
        assert first
        for _ in range(5):
            self._reset_queues(c)     # stickiness, not queue noise, decides
            assert c.get_worker_address(
                "m", scene="scannet/scene0000_00") == first

    def test_distinct_scenes_balance(self):
        c = self._c()
        a = c.get_worker_address("m", scene="sA")   # bumps a's queue
        b = c.get_worker_address("m", scene="sB")   # shortest -> the other
        assert {a, b} == {"http://w1", "http://w2"}

    def test_overloaded_sticky_rebalances_and_resticks(self):
        c = self._c(affinity_max_backlog=2)
        a = c.get_worker_address("m", scene="sA")
        other = "http://w2" if a == "http://w1" else "http://w1"
        c.receive_heart_beat(a, 10)        # sticky backlog over threshold
        c.receive_heart_beat(other, 0)
        moved = c.get_worker_address("m", scene="sA")
        assert moved == other
        self._reset_queues(c)              # the scene re-stuck to `moved`
        assert c.get_worker_address("m", scene="sA") == moved

    def test_dead_sticky_worker_falls_back(self):
        c = self._c()
        a = c.get_worker_address("m", scene="sA")
        with c.lock:
            del c.workers[a]
        b = c.get_worker_address("m", scene="sA")
        assert b and b != a

    def test_no_scene_uses_shortest_queue(self):
        c = self._c()
        assert {c.get_worker_address("m"), c.get_worker_address("m")} \
            == {"http://w1", "http://w2"}

    def test_scene_map_is_lru_bounded(self):
        c = self._c(affinity_scenes=4)
        for i in range(10):
            c.get_worker_address("m", scene=f"s{i}")
        assert len(c._scene_worker) <= 4

    def test_backlog_guard_is_speed_normalized(self):
        """On heterogeneous-speed fleets the sticky premium is measured in
        queue/speed units (same as the shortest-queue choice): a 10x-fast
        sticky worker with raw backlog 10 carries a normalized wait of 1.0
        and stays sticky under max_backlog=2, even though its raw backlog
        exceeds the threshold."""
        from video3d_tpu.serve.controller import Controller

        c = Controller("scene_affinity", affinity_max_backlog=2)
        c.register_worker("http://fast", True,
                          {"model_names": ["m"], "speed": 10,
                           "queue_length": 0})
        c.register_worker("http://slow", True,
                          {"model_names": ["m"], "speed": 1,
                           "queue_length": 0})
        first = c.get_worker_address("m", scene="sA")
        sticky = first
        c.receive_heart_beat("http://fast", 10)   # normalized 1.0
        c.receive_heart_beat("http://slow", 0)
        if sticky != "http://fast":               # force the fast worker sticky
            with c.lock:
                c._scene_worker[("m", "sA")] = "http://fast"
        assert c.get_worker_address("m", scene="sA") == "http://fast"
        # and a SLOW sticky worker with the same raw backlog re-balances
        with c.lock:
            c._scene_worker[("m", "sB")] = "http://slow"
        c.receive_heart_beat("http://slow", 10)   # normalized 10.0 > 2
        c.receive_heart_beat("http://fast", 0)
        assert c.get_worker_address("m", scene="sB") == "http://fast"


class TestServe:
    def test_register_and_list_models(self, stack):
        info, caddr, waddr, controller = stack
        models = _post_json(caddr + "/list_models", {})["models"]
        assert models == ["video3d-tiny"]

    def test_dispatch(self, stack):
        info, caddr, waddr, controller = stack
        addr = _post_json(caddr + "/get_worker_address",
                          {"model": "video3d-tiny"})["address"]
        assert addr == waddr
        assert _post_json(caddr + "/get_worker_address",
                          {"model": "nope"})["address"] == ""

    def test_generate_roundtrip_through_controller(self, stack):
        info, caddr, waddr, controller = stack
        out = _post_json(caddr + "/worker_generate", {
            "model": "video3d-tiny",
            "video": info["sample_idx"],
            "prompt": "<image>\nwhat is in the room",
        }, timeout=300)
        assert out["error_code"] == 0
        assert isinstance(out["text"], str)
        assert out["inference_time"] > 0

    def test_cli_one_shot_message(self, stack, capsys):
        """serve/cli.py --message: the reference's test_message.py smoke
        client (list models -> resolve worker -> one generate -> print)."""
        from video3d_tpu.serve import cli

        info, caddr, waddr, controller = stack
        rc = cli.main(["--controller", caddr, "--model", "video3d-tiny",
                       "--video", info["sample_idx"],
                       "--max-new-tokens", "2",
                       "--message", "what is in the room"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "video3d-tiny" in out          # model listing
        assert waddr in out                   # resolved worker address

    def test_manual_register_worker(self, stack):
        """serve/register_worker.py: manual registration with
        worker_status=None (reference register_worker.py:19-26), then
        --refresh pulls the worker's real model list so the controller can
        dispatch to it again."""
        from video3d_tpu.serve import register_worker

        info, caddr, waddr, controller = stack
        with controller.lock:
            controller.workers.clear()        # simulate a controller restart
        assert _post_json(caddr + "/list_models", {})["models"] == []

        rc = register_worker.main(["--controller-address", caddr,
                                   "--worker-name", waddr,
                                   "--check-heart-beat", "--refresh"])
        assert rc == 0
        assert "video3d-tiny" in _post_json(caddr + "/list_models", {})["models"]
        assert _post_json(caddr + "/get_worker_address",
                          {"model": "video3d-tiny"})["address"] == waddr

    def test_openai_chat_completions(self, stack):
        """/v1/chat/completions: OpenAI request shape (messages with text +
        video_id content parts) -> standard completion response whose
        content equals the native endpoint's answer."""
        info, caddr, waddr, controller = stack
        native = _post_json(waddr + "/worker_generate", {
            "video": info["sample_idx"],
            "prompt": "<image>\nwhat is in the room",
        }, timeout=300)
        out = _post_json(waddr + "/v1/chat/completions", {
            "model": "video3d-tiny",
            "messages": [
                {"role": "system", "content": "You are a helpful assistant."},
                {"role": "user", "content": [
                    {"type": "video_id", "video_id": info["sample_idx"]},
                    # no <image> splice token: a standard OpenAI client
                    # doesn't know it; the worker injects it for scenes
                    {"type": "text", "text": "what is in the room"},
                ]},
            ],
        }, timeout=300)
        assert out["object"] == "chat.completion"
        assert out["choices"][0]["finish_reason"] == "stop"
        assert out["choices"][0]["message"]["content"] == native["text"]
        # plain-string content also works
        out2 = _post_json(waddr + "/v1/chat/completions", {
            "video": info["sample_idx"],
            "messages": [{"role": "user",
                          "content": "<image>\nwhat is in the room"}],
        }, timeout=300)
        assert out2["choices"][0]["message"]["content"] == native["text"]

    def test_generate_stream(self, stack):
        """/worker_generate_stream: \\0-separated cumulative-text JSON
        chunks (the reference worker's wire protocol)."""
        import urllib.request

        info, caddr, waddr, controller = stack
        req = urllib.request.Request(
            waddr + "/worker_generate_stream",
            data=json.dumps({
                "video": info["sample_idx"],
                "prompt": "<image>\nwhat is in the room",
                "stream_chunk": 2,
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            raw = resp.read()
        chunks = [json.loads(c) for c in raw.split(b"\0") if c]
        assert chunks, "no stream chunks received"
        assert all(c["error_code"] == 0 for c in chunks)
        # cumulative text: each chunk extends (or equals) the previous
        for a, b in zip(chunks, chunks[1:]):
            assert b["text"].startswith(a["text"][: len(b["text"])]) or \
                a["text"] == ""
        # final chunk agrees with the non-streaming answer path
        final = _post_json(waddr + "/worker_generate", {
            "video": info["sample_idx"],
            "prompt": "<image>\nwhat is in the room"}, timeout=300)
        assert chunks[-1]["text"] == final["text"]

    def test_heartbeat_and_expiry(self, stack):
        info, caddr, waddr, controller = stack
        assert _post_json(caddr + "/receive_heart_beat", {
            "worker_name": waddr, "queue_length": 0})["exist"]
        # unknown worker -> exist False
        assert not _post_json(caddr + "/receive_heart_beat", {
            "worker_name": "http://nope", "queue_length": 0})["exist"]
        # force expiry
        controller.workers[waddr].last_heart_beat = time.time() - 9999
        controller.remove_stale_workers()
        assert _post_json(caddr + "/list_models", {})["models"] == []
        # re-register for other tests
        _post_json(caddr + "/register_worker", {
            "worker_name": waddr, "check_heart_beat": True,
            "worker_status": {"model_names": ["video3d-tiny"], "speed": 1,
                              "queue_length": 0}})

    def test_multi_turn_history(self, stack):
        """Multi-turn chat over the wire: a ``conversations`` history on
        /worker_generate, and the same history as OpenAI messages, produce
        the same answer (the worker forwards full history; the engine
        re-prompts with it like the reference cli.py loop)."""
        info, caddr, waddr, controller = stack
        hist = [
            {"from": "human", "value": "<image>\nwhat is in the room"},
            {"from": "gpt", "value": "a chair"},
            {"from": "human", "value": "what color is it"},
        ]
        native = _post_json(waddr + "/worker_generate", {
            "video": info["sample_idx"], "conversations": hist},
            timeout=300)
        assert native["error_code"] == 0
        assert isinstance(native["text"], str)
        out = _post_json(waddr + "/v1/chat/completions", {
            "video": info["sample_idx"],
            "messages": [
                {"role": "user", "content": "what is in the room"},
                {"role": "assistant", "content": "a chair"},
                {"role": "user", "content": "what color is it"},
            ]}, timeout=300)
        assert out["choices"][0]["message"]["content"] == native["text"]

    def test_openai_stream_and_max_tokens(self, stack):
        """`"stream": true` serves SSE chat.completion.chunk events whose
        joined deltas equal the non-streaming answer; `max_tokens` caps
        the emission per request (no recompile — host-chunked stream)."""
        info, caddr, waddr, controller = stack
        native = _post_json(waddr + "/worker_generate", {
            "video": info["sample_idx"],
            "prompt": "<image>\nwhat is in the room"}, timeout=300)

        req = urllib.request.Request(
            waddr + "/v1/chat/completions",
            data=json.dumps({
                "stream": True, "video": info["sample_idx"],
                "messages": [{"role": "user",
                              "content": "what is in the room"}],
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"].startswith("text/event-stream")
            events = [ln[len("data: "):] for ln in
                      r.read().decode().split("\n\n")
                      if ln.startswith("data: ")]
        assert events[-1] == "[DONE]"
        chunks = [json.loads(e) for e in events[:-1]]
        assert all(c["object"] == "chat.completion.chunk" for c in chunks)
        assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
        assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
        text = "".join(c["choices"][0]["delta"].get("content", "")
                       for c in chunks)
        assert text == native["text"]

        # per-request cap: 1 token, exact on both surfaces
        capped = _post_json(waddr + "/worker_generate", {
            "video": info["sample_idx"],
            "prompt": "<image>\nwhat is in the room",
            "max_new_tokens": 1}, timeout=300)
        out = _post_json(waddr + "/v1/chat/completions", {
            "video": info["sample_idx"], "max_tokens": 1,
            "messages": [{"role": "user",
                          "content": "what is in the room"}]}, timeout=300)
        assert out["choices"][0]["message"]["content"] == capped["text"]
        assert len(capped["text"]) <= len(native["text"])

    def test_per_request_sampling_and_stop(self, stack):
        """Reference worker parity (llava/serve/model_worker.py:140-167):
        temperature/top_p/max_new_tokens/stop ride each request."""
        info, caddr, waddr, controller = stack
        base = {"video": info["sample_idx"],
                "prompt": "<image>\nwhat is in the room"}
        native = _post_json(waddr + "/worker_generate", base, timeout=300)
        assert native["error_code"] == 0

        # explicit defaults change nothing
        same = _post_json(waddr + "/worker_generate",
                          {**base, "temperature": 0.0}, timeout=300)
        assert same["text"] == native["text"]

        # a sampling override routes through the engine stream and works
        sampled = _post_json(waddr + "/worker_generate",
                             {**base, "temperature": 5.0, "top_k": 50},
                             timeout=300)
        assert sampled["error_code"] == 0
        assert isinstance(sampled["text"], str)

        # stop truncates at the first occurrence (string or list)
        if len(native["text"]) >= 2:
            s = native["text"][-1]
            want = native["text"][:native["text"].find(s)]
            out = _post_json(waddr + "/worker_generate",
                             {**base, "stop": s}, timeout=300)
            assert out["text"] == want
            out2 = _post_json(waddr + "/worker_generate",
                              {**base, "stop": ["zzz-never", s]},
                              timeout=300)
            assert out2["text"] == want
        # a stop that never occurs changes nothing
        out3 = _post_json(waddr + "/worker_generate",
                          {**base, "stop": "zzz-never"}, timeout=300)
        assert out3["text"] == native["text"]

    def test_openai_robustness(self, stack):
        """Null assistant content (tool-call style turns) must not crash;
        a request with no usable message gets an OpenAI error envelope
        with a 400 status, not a malformed chat.completion."""
        import urllib.error

        info, caddr, waddr, controller = stack
        out = _post_json(waddr + "/v1/chat/completions", {
            "video": info["sample_idx"],
            "messages": [
                {"role": "user", "content": "what is in the room"},
                {"role": "assistant", "content": None},
                {"role": "user", "content": [
                    "junk-non-dict-part",
                    {"type": "text", "text": "what color is it"},
                ]},
            ]}, timeout=300)
        assert out["choices"][0]["finish_reason"] == "stop"

        with pytest.raises(urllib.error.HTTPError) as ei:
            _post_json(waddr + "/v1/chat/completions", {
                "messages": [{"role": "system", "content": "hi"}]},
                timeout=60)
        assert ei.value.code == 400
        err = json.loads(ei.value.read())
        assert err["error"]["type"] == "invalid_request_error"

    def test_metrics_endpoints(self, stack):
        """POST /worker_metrics (JSON) and GET /metrics (Prometheus text):
        counters move with traffic, cache stats are exposed."""
        info, caddr, waddr, controller = stack
        _post_json(waddr + "/worker_generate", {
            "video": info["sample_idx"],
            "prompt": "<image>\nwhat is in the room"}, timeout=300)
        m = _post_json(waddr + "/worker_metrics", {})
        assert m["requests_total"] >= 1
        assert m["errors_total"] == 0
        assert m["queue_length"] == 0
        assert m["inference_seconds_total"] > 0
        assert {"scene_cache_hits_total", "prefix_cache_misses_total",
                "speculative_offered_total"} <= set(m)
        ctype, text = _get_text(waddr + "/metrics")
        assert ctype.startswith("text/plain")
        assert "# TYPE video3d_requests_total counter" in text
        assert 'video3d_requests_total{model="video3d-tiny"}' in text
        assert "# TYPE video3d_queue_length gauge" in text



class TestGroundWorker:
    def test_worker_ground_endpoint(self, stack, tmp_path_factory):
        """/worker_ground (beyond-reference: the reference serve stack
        cannot ground): scores + boxes match engine.ground; the proxy
        route through the controller works; an engine without a ground
        token errors cleanly."""
        import numpy as np

        info, caddr, waddr, controller = stack
        # the shared stack's engine has no ground token -> clean error
        out = _post_json(waddr + "/worker_ground", {
            "video": info["sample_idx"], "query": "the brown chair"},
            timeout=60)
        assert out["error_code"] == 1 and "ground token" in out["error"]

        root = str(tmp_path_factory.mktemp("data"))
        ginfo = make_fake_scene(root, n_frames=2)
        data_cfg = DataConfig(video_folder=root,
                              annotation_dir=os.path.join(root,
                                                          "embodiedscan"),
                              metadata_dir=os.path.join(root, "metadata"),
                              frames_upbound=2)
        tok = FakeTokenizer()
        engine = InferenceEngine(
            lv3d.init_model(jax.random.PRNGKey(0), CFG), CFG, tok,
            VideoProcessor(data_cfg),
            SigLipImageProcessor(size=(CFG.vision.image_size,) * 2),
            EngineConfig(max_new_tokens=3, eos_token_id=tok.eos_token_id,
                         max_frames=2, buckets=(256,), stop_str="",
                         ground_token_id=tok.vocab["<ground>"],
                         max_objects=8))
        want_scores, want_objects = engine.ground({
            "video": ginfo["sample_idx"],
            "conversations": [
                {"from": "human", "value": "<image>\nthe brown chair"},
                {"from": "gpt", "value": "<ground>"}]})

        port = free_port()
        worker, server = serve_worker(engine, "video3d-ground", port=port,
                                      controller_addr=caddr,
                                      background=True, heartbeat=False)
        try:
            gaddr = f"http://127.0.0.1:{port}"
            out = _post_json(gaddr + "/worker_ground", {
                "video": ginfo["sample_idx"], "query": "the brown chair"},
                timeout=300)
            assert out["error_code"] == 0
            np.testing.assert_allclose(out["scores"], want_scores,
                                       rtol=1e-5, atol=1e-5)
            assert len(out["objects"]) == len(want_objects)
            i = int(np.argmax(want_scores))
            if i < len(want_objects):
                np.testing.assert_allclose(out["best_box"],
                                           want_objects[i], rtol=1e-5)
            else:
                assert out["best_box"] is None
            # through the controller proxy
            out2 = _post_json(caddr + "/worker_ground", {
                "model": "video3d-ground",
                "video": ginfo["sample_idx"], "query": "the brown chair"},
                timeout=300)
            assert out2["scores"] == out["scores"]
        finally:
            server.shutdown()


class TestBatcherWorker:
    @pytest.mark.parametrize("paged", [False, True])
    def test_worker_with_continuous_batching(self, tmp_path_factory, paged):
        """serve_worker(num_slots=2): concurrent /worker_generate requests
        run through the shared S-slot decode loop (dense rows or the paged
        page-pool cache) and match the sequential engine answer."""
        import threading
        import urllib.request

        root = str(tmp_path_factory.mktemp("data"))
        info = make_fake_scene(root, n_frames=2)
        data_cfg = DataConfig(video_folder=root,
                              annotation_dir=os.path.join(root,
                                                          "embodiedscan"),
                              metadata_dir=os.path.join(root, "metadata"),
                              frames_upbound=2)
        tok = FakeTokenizer()
        engine = InferenceEngine(
            lv3d.init_model(jax.random.PRNGKey(0), CFG), CFG, tok,
            VideoProcessor(data_cfg),
            SigLipImageProcessor(size=(CFG.vision.image_size,) * 2),
            EngineConfig(max_new_tokens=3, eos_token_id=tok.eos_token_id,
                         max_frames=2, buckets=(256,), stop_str=""))
        want = engine.generate_answer({
            "video": info["sample_idx"],
            "conversations": [
                {"from": "human", "value": "<image>\nwhat is in the room"},
                {"from": "gpt", "value": None}]})

        port = free_port()
        worker, server = serve_worker(engine, "video3d-batched", port=port,
                                      background=True, heartbeat=False,
                                      num_slots=2, paged=paged)
        try:
            addr = f"http://127.0.0.1:{port}"
            results = [None, None]

            def hit(i):
                results[i] = _post_json(addr + "/worker_generate", {
                    "video": info["sample_idx"],
                    "prompt": "<image>\nwhat is in the room"}, timeout=300)

            threads = [threading.Thread(target=hit, args=(i,))
                       for i in range(2)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
            for r in results:
                assert r is not None and r["error_code"] == 0, results
                assert r["text"] == want
            m = _post_json(addr + "/worker_metrics", {})
            assert m["slots"] == 2 and m["requests_total"] == 2
            assert m["slots_in_use"] == 0
            if paged:
                # both requests finished -> the whole pool is free again
                assert m["pages_free"] == m["pages"]
        finally:
            worker.batcher.shutdown()
            server.shutdown()


class TestWorkerLauncher:
    def test_module_main_help(self, tmp_path):
        """`python -m video3d_tpu.serve.model_worker --help` parses (the
        reference's worker launch surface) without loading a model. The
        subprocess gets a CPU-forcing sitecustomize shim (created here, not
        assumed on the machine) so it can never touch a TPU tunnel, and
        inherits the parent env."""
        import os as _os
        import subprocess
        import sys

        shim = tmp_path / "shim"
        shim.mkdir()
        (shim / "sitecustomize.py").write_text(
            "import jax\njax.config.update('jax_platforms', 'cpu')\n")
        env = dict(_os.environ)
        env["PYTHONPATH"] = str(shim) + _os.pathsep + ":".join(sys.path)
        out = subprocess.run(
            [sys.executable, "-m", "video3d_tpu.serve.model_worker",
             "--help"], capture_output=True, text=True, timeout=120,
            env=env)
        assert out.returncode == 0
        assert "--num-slots" in out.stdout
        assert "--spec-draft-layers" in out.stdout
        assert "--load-format" in out.stdout
        assert "--load-in-8bit" in out.stdout

    @pytest.mark.slow
    def test_module_main_dummy_load_generates(self, tmp_path):
        """`python -m ... --load-format dummy --load-in-8bit`: a checkpoint
        dir holding only config.json + tokenizer files brings up a serving
        worker on device-initialized int8 weights (the vLLM load_format=
        dummy rehearsal path, here through the worker launch surface rather
        than the eval CLI), answers /worker_get_status, and completes one
        /worker_generate round trip."""
        import subprocess
        import sys

        from test_eval_e2e import save_real_tokenizer
        from video3d_tpu.models import llava_video3d as lv3d
        from video3d_tpu.models.weights import export_llava_checkpoint

        root = str(tmp_path / "data")
        info = make_fake_scene(root, n_frames=2)
        ckpt = str(tmp_path / "dummy_ckpt")
        cfg = ModelConfig.tiny()
        export_llava_checkpoint(
            lv3d.init_model(jax.random.PRNGKey(0), cfg), cfg.llm, cfg, ckpt)
        os.remove(os.path.join(ckpt, "model.safetensors"))  # config-only dir
        with open(os.path.join(ckpt, "config.json")) as f:
            hf = json.load(f)
        hf["vision_config"] = {
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 56, "patch_size": 14}
        with open(os.path.join(ckpt, "config.json"), "w") as f:
            json.dump(hf, f)
        save_real_tokenizer(ckpt)

        shim = tmp_path / "shim"
        shim.mkdir()
        (shim / "sitecustomize.py").write_text(
            "import jax\njax.config.update('jax_platforms', 'cpu')\n")
        env = dict(os.environ)
        env["PYTHONPATH"] = str(shim) + os.pathsep + ":".join(sys.path)
        port = free_port()
        proc = subprocess.Popen(
            [sys.executable, "-m", "video3d_tpu.serve.model_worker",
             "--model-path", ckpt, "--load-format", "dummy",
             "--load-in-8bit", "--host", "127.0.0.1", "--port", str(port),
             "--video-folder", root,
             "--embodiedscan-folder", os.path.join(root, "embodiedscan"),
             "--metadata-folder", os.path.join(root, "metadata"),
             "--max-frame-num", "2", "--max-new-tokens", "3"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        waddr = f"http://127.0.0.1:{port}"
        try:
            deadline = time.time() + 300
            status = None
            while time.time() < deadline and proc.poll() is None:
                try:
                    status = _post_json(waddr + "/worker_get_status", {},
                                        timeout=10)
                    break
                except OSError:
                    time.sleep(2.0)
            assert status is not None, (
                "worker never came up:\n"
                + proc.stdout.read().decode(errors="replace")
                if proc.poll() is not None else "worker up but unreachable")
            assert status["queue_length"] == 0
            out = _post_json(waddr + "/worker_generate", {
                "video": info["sample_idx"],
                "prompt": "<image>\nwhat is in the room",
            }, timeout=420)
            assert out["error_code"] == 0
            assert isinstance(out["text"], str)
        finally:
            proc.terminate()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
