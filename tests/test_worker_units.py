"""Unit tests for the serve worker's pure parsing helpers (no engine, no
jax): stop-sequence truncation and OpenAI message -> native wire mapping.
The socket-level behavior is covered in tests/test_serve.py; these lock
the edge cases cheaply."""

from video3d_tpu.serve.model_worker import ModelWorker


def _bare_worker() -> ModelWorker:
    return object.__new__(ModelWorker)      # helpers don't touch state


class TestApplyStop:
    def test_variants(self):
        f = ModelWorker._apply_stop
        assert f("hello world", None) == "hello world"
        assert f("hello world", "") == "hello world"
        assert f("hello world", []) == "hello world"
        assert f("hello world", "wor") == "hello "
        assert f("hello world", ["zz", "o w"]) == "hell"
        assert f("hello", ["", "zz"]) == "hello"
        # earliest-occurrence semantics across a list
        assert f("abcabc", ["c", "b"]) == "a"


class TestOpenAIRecord:
    def test_mapping_and_injection(self):
        w = _bare_worker()
        wire, err = w._openai_record({
            "video": "scannet/scene0000_00",
            "max_tokens": 7,
            "temperature": 0.5,
            "stop": ["\n"],
            "messages": [
                {"role": "system", "content": "ignored"},
                {"role": "user", "content": "what is in the room"},
                {"role": "assistant", "content": "a chair"},
                {"role": "user", "content": [
                    {"type": "text", "text": "what color"}]},
            ],
        })
        assert err is None
        assert wire["max_new_tokens"] == 7
        assert wire["temperature"] == 0.5
        assert wire["stop"] == ["\n"]
        convs = wire["conversations"]
        assert [c["from"] for c in convs] == ["human", "gpt", "human"]
        # <image> injected exactly once, anchored in turn 0
        assert convs[0]["value"].startswith("<image>\n")
        assert sum(c["value"].count("<image>") for c in convs) == 1

    def test_video_part_and_existing_image_token(self):
        w = _bare_worker()
        wire, err = w._openai_record({
            "messages": [{"role": "user", "content": [
                {"type": "video_id", "video_id": "scannet/scene0001_00"},
                {"type": "text", "text": "<image>\nlook"},
            ]}],
        })
        assert err is None
        assert wire["video"] == "scannet/scene0001_00"
        assert wire["conversations"][0]["value"].count("<image>") == 1

    def test_rejects_empty(self):
        w = _bare_worker()
        wire, err = w._openai_record(
            {"messages": [{"role": "system", "content": "hi"},
                          {"role": "assistant", "content": None}]})
        assert wire is None
        payload, status = err
        assert status == 400
        assert payload["error"]["type"] == "invalid_request_error"

    def test_record_appends_generation_turn(self):
        rec = ModelWorker._record({
            "video": "v",
            "conversations": [{"from": "human", "value": "q"},
                              {"from": "gpt", "value": "a"},
                              {"from": "human", "value": "q2"}]})
        assert rec["conversations"][-1] == {"from": "gpt", "value": None}
        # already-terminated histories are left alone
        rec2 = ModelWorker._record({
            "video": "v",
            "conversations": [{"from": "human", "value": "q"},
                              {"from": "gpt", "value": None}]})
        assert len(rec2["conversations"]) == 2


class TestSamplingGuards:
    def _worker(self):
        from types import SimpleNamespace
        w = _bare_worker()
        w.engine = SimpleNamespace(
            ecfg=SimpleNamespace(temperature=0.0, top_p=1.0, top_k=0,
                                 max_new_tokens=8))
        w._sampling_combos = set()
        return w

    def test_quantization_and_defaults(self):
        w = self._worker()
        out, differs = w._sampling({"temperature": 0.0})
        assert not differs
        out, differs = w._sampling({"temperature": 0.70001})
        assert differs and out["temperature"] == 0.7
        # quantized to the same grid point -> same combo, no new entry
        w._sampling({"temperature": 0.70004})
        assert len(w._sampling_combos) == 1

    def test_combo_cap(self):
        import pytest as _pytest
        w = self._worker()
        for i in range(w._MAX_SAMPLING_COMBOS):
            w._sampling({"temperature": 0.1 + 0.1 * i})
        with _pytest.raises(ValueError, match="sampling configurations"):
            w._sampling({"temperature": 0.95})
        # previously seen combos still work
        out, differs = w._sampling({"temperature": 0.1})
        assert differs


class TestOpenAIStreamHoldback:
    def test_shrinking_stop_cut_never_duplicates(self):
        """A stop sequence completing across a chunk boundary makes the
        cumulative text shrink; deltas must still concatenate to exactly
        the truncated answer."""
        w = _bare_worker()
        w.model_name = "m"
        # cumulative stream: partial stop suffix streamed, then the cut
        texts = ["hello ", "hello wor##", "hello wor"]

        def fake_stream(request):
            for t in texts:
                yield {"text": t, "error_code": 0}

        w.generate_stream = fake_stream
        events = list(w.openai_stream({"model": "m", "stop": "##x"}))
        deltas = [e["choices"][0]["delta"].get("content", "")
                  for e in events if "choices" in e]
        assert "".join(deltas) == "hello wor"
        assert events[-1]["choices"][0]["finish_reason"] == "stop"

    def test_no_stop_streams_everything(self):
        w = _bare_worker()
        w.model_name = "m"

        def fake_stream(request):
            for t in ["a", "ab", "abc"]:
                yield {"text": t, "error_code": 0}

        w.generate_stream = fake_stream
        events = list(w.openai_stream({"model": "m"}))
        deltas = [e["choices"][0]["delta"].get("content", "")
                  for e in events if "choices" in e]
        assert "".join(deltas) == "abc"

    def test_bad_max_tokens_is_400(self):
        w = _bare_worker()
        wire, err = w._openai_record({
            "max_tokens": "abc",
            "messages": [{"role": "user", "content": "hi"}]})
        assert wire is None
        payload, status = err
        assert status == 400
        assert payload["error"]["param"] == "max_tokens"
