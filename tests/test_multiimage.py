"""Multi-image 2D chat: N '<image>' sentinels, one image's features each.

Covers the reference's gradio_multi_image / worker ``params["images"]``
wire contract (/root/reference/llava/serve/gradio_multi_image.py:1-448 —
the 2D multi-image chat UI the round-2 verdict listed as not replicated)
through three layers:

  * splice plan: N sentinels consume consecutive tokens_per_frame blocks
    of the flat frame-major feature buffer, and ADJACENT sentinels
    produce a plan identical to the single-sentinel video path with V=N
    (the two contracts agree where they overlap);
  * engine: ``generate_answer_images`` end to end on the tiny model;
  * worker: POST /worker_generate with base64 images.
"""

import base64
import io
import socket

import numpy as np
import pytest

import jax
from PIL import Image

from video3d_tpu.config import ModelConfig
from video3d_tpu.constants import IMAGE_TOKEN_INDEX
from video3d_tpu.data.image_processor import SigLipImageProcessor
from video3d_tpu.eval.drivers import EngineConfig, InferenceEngine
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models.splice import (KIND_TEXT, KIND_VISION,
                                       build_splice_plan)
from video3d_tpu.serve.controller import _post_json
from video3d_tpu.serve.model_worker import serve_worker

from fixtures import FakeTokenizer

CFG = ModelConfig.tiny()


class TestMultiImageSplice:
    def test_two_sentinels_consume_consecutive_blocks(self):
        T = 3
        ids = [10, IMAGE_TOKEN_INDEX, 11, IMAGE_TOKEN_INDEX, 12]
        plan = build_splice_plan([ids], None, [2], tokens_per_frame=T,
                                 max_len=16, grid_side=1)
        kind = plan.kind[0]
        vidx = plan.vision_index[0]
        n = int(plan.seq_len[0])
        assert n == 3 + 2 * T
        expect_kind = ([KIND_TEXT] + [KIND_VISION] * T + [KIND_TEXT]
                       + [KIND_VISION] * T + [KIND_TEXT])
        assert list(kind[:n]) == expect_kind
        # sentinel j reads flat features [j*T, (j+1)*T)
        assert list(vidx[1:1 + T]) == [0, 1, 2]
        assert list(vidx[2 + T:2 + 2 * T]) == [3, 4, 5]
        # 1D positions are sequential over the whole spliced stream
        assert list(plan.position_ids[0][:n]) == list(range(n))
        assert list(plan.mrope_position_ids[0][:n, 0]) == list(range(n))

    def test_adjacent_sentinels_equal_video_plan(self):
        """'<image><image>text' (multi) == '<image>text' with V=2 (video):
        the contracts agree where they overlap."""
        T = 4
        multi = build_splice_plan(
            [[7, IMAGE_TOKEN_INDEX, IMAGE_TOKEN_INDEX, 8, 9]], None, [2],
            tokens_per_frame=T, max_len=20, grid_side=1)
        video = build_splice_plan(
            [[7, IMAGE_TOKEN_INDEX, 8, 9]], None, [2],
            tokens_per_frame=T, max_len=20, grid_side=1)
        for field in ("text_ids", "kind", "vision_index", "labels",
                      "position_ids", "mrope_position_ids", "seq_len"):
            np.testing.assert_array_equal(getattr(multi, field),
                                          getattr(video, field))

    def test_sentinel_count_must_match_images(self):
        with pytest.raises(AssertionError):
            build_splice_plan(
                [[IMAGE_TOKEN_INDEX, IMAGE_TOKEN_INDEX]], None, [3],
                tokens_per_frame=2, max_len=16, grid_side=1)


@pytest.fixture(scope="module")
def engine():
    tok = FakeTokenizer()
    return InferenceEngine(
        lv3d.init_model(jax.random.PRNGKey(0), CFG), CFG, tok,
        None,  # no VideoProcessor: the 2D path never touches scene IO
        SigLipImageProcessor(size=(CFG.vision.image_size,) * 2),
        EngineConfig(max_new_tokens=3, eos_token_id=tok.eos_token_id,
                     max_frames=2, buckets=(256,), stop_str=""))


def _pil(seed: int) -> Image.Image:
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (40, 56, 3), np.uint8))


class TestEngineMultiImage:
    @pytest.mark.smoke
    def test_two_images(self, engine):
        out = engine.generate_answer_images(
            "<image>\n<image>\nwhat changed between these?",
            [_pil(0), _pil(1)])
        assert isinstance(out, str)

    def test_missing_sentinels_are_prepended(self, engine):
        # 0 placeholders + 2 images -> 2 prepended; must not raise
        out = engine.generate_answer_images("compare the images",
                                            [_pil(2), _pil(3)])
        assert isinstance(out, str)

    def test_too_many_sentinels_rejected(self, engine):
        with pytest.raises(AssertionError):
            engine.generate_answer_images("<image><image>q", [_pil(0)])


def _b64(img: Image.Image) -> str:
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class TestWorkerImages:
    def test_worker_generate_with_images(self, engine):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        worker, server = serve_worker(engine, "video3d-tiny", port=port,
                                      background=True, heartbeat=False)
        try:
            out = _post_json(
                f"http://127.0.0.1:{port}/worker_generate",
                {"prompt": "<image>\n<image>\nwhat changed?",
                 "images": [_b64(_pil(0)), _b64(_pil(1))]})
            assert out["error_code"] == 0, out
            assert isinstance(out["text"], str)
        finally:
            server.shutdown()

    def test_cli_one_shot_with_images(self, engine, tmp_path, capsys):
        from video3d_tpu.serve import cli
        from video3d_tpu.serve.controller import serve_controller

        paths = []
        for i in range(2):
            p = tmp_path / f"im{i}.png"
            _pil(i).save(p)
            paths.append(str(p))
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        cport = s.getsockname()[1]
        s.close()
        _, cserver = serve_controller(port=cport, background=True)
        caddr = f"http://127.0.0.1:{cport}"
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        wport = s.getsockname()[1]
        s.close()
        _, wserver = serve_worker(engine, "video3d-tiny", port=wport,
                                  controller_addr=caddr, background=True,
                                  heartbeat=False)
        try:
            rc = cli.main(["--controller", caddr, "--model", "video3d-tiny",
                           "--image", paths[0], "--image", paths[1],
                           "--message", "what changed?",
                           "--max-new-tokens", "3"])
            assert rc == 0
            assert "worker_addr" in capsys.readouterr().out
        finally:
            cserver.shutdown()
            wserver.shutdown()

    def test_cli_requires_exactly_one_modality(self):
        from video3d_tpu.serve import cli
        with pytest.raises(SystemExit):
            cli.main(["--message", "hi"])          # neither
        with pytest.raises(SystemExit):
            cli.main(["--video", "v", "--image", "x", "--message", "hi"])

    def test_openai_image_url_parts(self, engine):
        from video3d_tpu.serve.model_worker import ModelWorker
        w = ModelWorker(engine, "video3d-tiny", heartbeat=False)
        data_url = "data:image/png;base64,"
        req = {"messages": [{"role": "user", "content": [
            {"type": "text", "text": "what changed?"},
            {"type": "image_url",
             "image_url": {"url": data_url + _b64(_pil(0))}},
            {"type": "image_url",
             "image_url": {"url": data_url + _b64(_pil(1))}},
        ]}]}
        payload, status = w.chat_completions(req)
        assert status == 200, payload
        assert isinstance(
            payload["choices"][0]["message"]["content"], str)

    def test_openai_images_reject_stream_and_scene(self, engine):
        from video3d_tpu.serve.model_worker import ModelWorker
        w = ModelWorker(engine, "video3d-tiny", heartbeat=False)
        part = {"type": "image_url",
                "image_url": {"url": "data:image/png;base64,"
                                     + _b64(_pil(0))}}
        msg = [{"role": "user", "content": [
            {"type": "text", "text": "q"}, part]}]
        _, err = w._openai_record({"messages": msg, "stream": True})
        assert err is not None and err[1] == 400
        _, err = w._openai_record({"messages": msg,
                                   "video": "scannet/scene0000_00"})
        assert err is not None and err[1] == 400


class TestRound4Semantics:
    """Round-4 sharpening: pad preprocessing, unpooled features,
    multi-turn conversations, and per-request overrides on the images
    path (ADVICE r3 findings 1-5)."""

    def test_pad_preprocessing_squares_via_expand2square(self, engine,
                                                         monkeypatch):
        """The engine must expand2square(non-square image, mean bg) BEFORE
        ip.preprocess (mm_utils.py:329-333), not plain-resize."""
        seen = []
        orig = engine.ip.preprocess

        def spy(images):
            seen.extend(images if isinstance(images, (list, tuple))
                        else [images])
            return orig(images)

        monkeypatch.setattr(engine.ip, "preprocess", spy)
        engine.generate_answer_images("<image>\nq", [_pil(0)])
        assert len(seen) == 1
        im = seen[0]
        assert isinstance(im, Image.Image)
        assert im.size[0] == im.size[1]          # squared by expand2square
        # _pil is 56x40: the pad rows carry the mean background color
        bg = tuple(int(x * 255) for x in engine.ip.image_mean)
        assert im.getpixel((0, 0)) == bg

    def test_unpooled_token_count(self, engine, monkeypatch):
        """Each image contributes side*side UNPOOLED tokens
        (llava_arch.py:466-470: only video goes through get_2dPool)."""
        captured = {}
        orig = engine._generate

        def spy(batch, vision_features=None, cfg=None):
            captured["vf"] = vision_features
            return orig(batch, vision_features=vision_features, cfg=cfg)

        monkeypatch.setattr(engine, "_generate", spy)
        engine.generate_answer_images("<image>\n<image>\nq",
                                      [_pil(0), _pil(1)])
        side = CFG.vision.num_patches_per_side
        assert captured["vf"].shape[1] == 2 * side * side

    def test_conversations_multi_turn(self, engine):
        convs = [
            {"from": "human", "value": "<image>\nwhat is this?"},
            {"from": "gpt", "value": "a test pattern"},
            {"from": "human", "value": "and compared to <image>?"},
        ]
        out = engine.generate_answer_images(None, [_pil(0), _pil(1)],
                                            conversations=convs)
        assert isinstance(out, str)

    def test_max_new_tokens_cap_is_greedy_prefix(self, engine):
        """The override path (host-chunked decode) must emit a prefix of
        the static greedy path's tokens."""
        full = engine.generate_answer_images("<image>\nq", [_pil(4)])
        capped = engine.generate_answer_images("<image>\nq", [_pil(4)],
                                               max_new_tokens=1)
        assert full.startswith(capped)

    def test_worker_threads_overrides(self, engine, monkeypatch):
        from video3d_tpu.serve.model_worker import ModelWorker
        w = ModelWorker(engine, "video3d-tiny", heartbeat=False)
        got = {}

        def spy(prompt, pil, conversations=None, max_new_tokens=None,
                **sampling):
            got.update(prompt=prompt, conversations=conversations,
                       max_new_tokens=max_new_tokens, sampling=sampling)
            return "ok"

        monkeypatch.setattr(engine, "generate_answer_images", spy)
        out = w.generate({
            "conversations": [
                {"from": "human", "value": "<image>\nfirst"},
                {"from": "gpt", "value": "answer"},
                {"from": "human", "value": "second?"},
            ],
            "images": [_b64(_pil(0))],
            "max_new_tokens": 2, "temperature": 0.7})
        assert out["error_code"] == 0, out
        assert got["max_new_tokens"] == 2
        assert got["sampling"].get("temperature") == 0.7
        # no explicit prompt -> the FULL conversation goes to the engine
        # (the worker record appends the generation-header gpt turn)
        assert got["prompt"] is None
        assert [c["value"] for c in got["conversations"][:3]] == [
            "<image>\nfirst", "answer", "second?"]

    def test_openai_rejects_http_image_url(self, engine):
        from video3d_tpu.serve.model_worker import ModelWorker
        w = ModelWorker(engine, "video3d-tiny", heartbeat=False)
        msg = [{"role": "user", "content": [
            {"type": "text", "text": "q"},
            {"type": "image_url",
             "image_url": {"url": "https://example.com/cat.png"}}]}]
        _, err = w._openai_record({"messages": msg})
        assert err is not None and err[1] == 400
        assert "data:" in err[0]["error"]["message"]

    def test_openai_ignores_assistant_turn_images(self, engine):
        from video3d_tpu.serve.model_worker import ModelWorker
        w = ModelWorker(engine, "video3d-tiny", heartbeat=False)
        data_url = "data:image/png;base64," + _b64(_pil(0))
        msg = [
            {"role": "user", "content": [
                {"type": "text", "text": "q"},
                {"type": "image_url", "image_url": {"url": data_url}}]},
            {"role": "assistant", "content": [
                {"type": "text", "text": "a"},
                {"type": "image_url", "image_url": {"url": data_url}}]},
            {"role": "user", "content": [{"type": "text", "text": "q2"}]},
        ]
        record, err = w._openai_record({"messages": msg})
        assert err is None
        assert len(record["images"]) == 1       # assistant image dropped
