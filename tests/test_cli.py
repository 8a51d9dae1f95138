"""End-to-end CLI tests: `python -m video3d_tpu.cli eval-scanqa / train` on a
tiny HF-format checkpoint export + the synthetic scene. The tokenizer loader
is patched (the fixture tokenizer is not an HF checkpoint); everything else —
checkpoint loading through the builder, config.json 3D-knob parsing, flag
overrides, the engine, the trainer — runs for real."""

import json
import os

import numpy as np
import pytest

import jax

import video3d_tpu.cli as cli
from video3d_tpu.config import ModelConfig, VisionConfig, replace
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models.weights import export_llava_checkpoint

from fixtures import FakeTokenizer, make_fake_annotations, make_fake_scene


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    info = make_fake_scene(root, n_frames=3)
    cfg = ModelConfig.tiny()
    params = lv3d.init_model(jax.random.PRNGKey(0), cfg)
    ckpt = str(tmp_path_factory.mktemp("ckpt") / "export")
    export_llava_checkpoint(params, cfg.llm, cfg, ckpt)
    return root, info, ckpt


def data_flags(root, extra=()):
    return ["--video-folder", root,
            "--embodiedscan-folder", os.path.join(root, "embodiedscan"),
            "--metadata-folder", os.path.join(root, "metadata"),
            "--max-frame-num", "3", *extra]


class TestLoadModel:
    def test_hf_dir_reads_config_json(self, env):
        """3D knobs come from the checkpoint config, not flag defaults."""
        root, info, ckpt = env
        ns = _parse(["eval-scanqa", "--model-path", ckpt,
                     "--question-file", "x", "--answer-file", "y"])
        params, cfg = cli._load_model(ns)
        assert cfg.llm.hidden_size == 64          # from config.json, not 3584
        assert cfg.world_3d.discrete
        assert "vision" in params and "llm" in params

    def test_flag_overrides_win(self, env):
        root, info, ckpt = env
        ns = _parse(["eval-scanqa", "--model-path", ckpt,
                     "--question-file", "x", "--answer-file", "y",
                     "--voxel-size", "0.25",
                     "--world-position-embedding-type", "avg-mlp"])
        _, cfg = cli._load_model(ns)
        assert cfg.world_3d.voxel.voxel_size == 0.25
        assert not cfg.world_3d.discrete          # avg-mlp has no 'discrete'


def _parse(argv):
    import argparse

    # reuse the real parser: intercept at parse_args via a tiny shim
    holder = {}

    real_eval = cli.cmd_eval
    real_train = cli.cmd_train
    cli.cmd_eval = lambda a, t: holder.update(args=a, task=t)
    cli.cmd_train = lambda a: holder.update(args=a, task="train")
    try:
        cli.main(argv)
    finally:
        cli.cmd_eval = real_eval
        cli.cmd_train = real_train
    return holder["args"]


class TestEvalCli:
    def test_eval_scanqa_end_to_end(self, env, tmp_path, monkeypatch):
        root, info, ckpt = env
        monkeypatch.setattr(cli, "_load_tokenizer", lambda p: FakeTokenizer())
        qfile = str(tmp_path / "questions.json")
        with open(qfile, "w") as f:
            json.dump([{
                "id": f"q{i}_0", "video": info["sample_idx"],
                "conversations": [
                    {"from": "human", "value": "<image>\nwhat is here"},
                    {"from": "gpt", "value": "chair"}],
                "metadata": {"dataset": "scanqa", "question_type": "what",
                             "answers": ["chair"]}} for i in range(2)], f)
        afile = str(tmp_path / "answers.jsonl")
        cli.main(["eval-scanqa", "--model-path", ckpt,
                  "--question-file", qfile, "--answer-file", afile,
                  "--max-new-tokens", "4", *data_flags(root)])
        records = [json.loads(l) for l in open(afile)]
        assert len(records) == 2
        assert all(isinstance(r["pred_response"], str) for r in records)

    def test_eval_prefix_cache_flag(self, env, tmp_path, monkeypatch):
        """--prefix-cache: answers through the CLI are identical with the
        scene-prefix KV cache on (default) and off."""
        root, info, ckpt = env
        monkeypatch.setattr(cli, "_load_tokenizer", lambda p: FakeTokenizer())
        qfile = str(tmp_path / "questions.json")
        with open(qfile, "w") as f:
            json.dump([{
                "id": f"q{i}_0", "video": info["sample_idx"],
                "conversations": [
                    {"from": "human", "value": f"<image>\nquestion {i} here"},
                    {"from": "gpt", "value": "chair"}],
                "metadata": {"dataset": "scanqa", "question_type": "what",
                             "answers": ["chair"]}} for i in range(3)], f)
        answers = {}
        for n in ("0", "4"):
            afile = str(tmp_path / f"answers_pc{n}.jsonl")
            cli.main(["eval-scanqa", "--model-path", ckpt,
                      "--question-file", qfile, "--answer-file", afile,
                      "--max-new-tokens", "4", "--prefix-cache", n,
                      *data_flags(root)])
            answers[n] = [json.loads(l)["pred_response"] for l in open(afile)]
        assert answers["0"] == answers["4"]

    def test_eval_load_in_4bit(self, env, tmp_path, monkeypatch):
        """--load-in-4bit: quantize_tree(bits=4) runs on the loaded params
        and the eval completes through the int4 matmul dispatch."""
        root, info, ckpt = env
        monkeypatch.setattr(cli, "_load_tokenizer", lambda p: FakeTokenizer())
        qfile = str(tmp_path / "q4.json")
        with open(qfile, "w") as f:
            json.dump([{
                "id": "q0_0", "video": info["sample_idx"],
                "conversations": [
                    {"from": "human", "value": "<image>\nwhat is here"},
                    {"from": "gpt", "value": "chair"}],
                "metadata": {"dataset": "scanqa", "question_type": "what",
                             "answers": ["chair"]}}], f)
        afile = str(tmp_path / "a4.jsonl")
        cli.main(["eval-scanqa", "--model-path", ckpt,
                  "--question-file", qfile, "--answer-file", afile,
                  "--max-new-tokens", "4", "--load-in-4bit",
                  *data_flags(root)])
        records = [json.loads(l) for l in open(afile)]
        assert len(records) == 1
        assert isinstance(records[0]["pred_response"], str)

    def test_eval_load_format_dummy(self, env, tmp_path, monkeypatch):
        """--load-format dummy: a checkpoint dir holding ONLY config.json
        (architecture + 3D knobs + optional vision_config, no safetensors)
        drives the full eval on device-initialized random weights, with
        --load-in-8bit folded into the per-layer init (builder.
        init_dummy_params) — the vLLM load_format=dummy rehearsal path."""
        root, info, ckpt = env
        monkeypatch.setattr(cli, "_load_tokenizer", lambda p: FakeTokenizer())
        dummy_dir = tmp_path / "dummy_ckpt"
        dummy_dir.mkdir()
        with open(os.path.join(ckpt, "config.json")) as f:
            hf = json.load(f)
        hf["vision_config"] = {
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 56, "patch_size": 14}
        with open(dummy_dir / "config.json", "w") as f:
            json.dump(hf, f)
        qfile = str(tmp_path / "qd.json")
        with open(qfile, "w") as f:
            json.dump([{
                "id": "q0_0", "video": info["sample_idx"],
                "conversations": [
                    {"from": "human", "value": "<image>\nwhat is here"},
                    {"from": "gpt", "value": "chair"}],
                "metadata": {"dataset": "scanqa", "question_type": "what",
                             "answers": ["chair"]}}], f)
        afile = str(tmp_path / "ad.jsonl")
        cli.main(["eval-scanqa", "--model-path", str(dummy_dir),
                  "--question-file", qfile, "--answer-file", afile,
                  "--max-new-tokens", "4", "--load-format", "dummy",
                  "--load-in-8bit", *data_flags(root)])
        records = [json.loads(l) for l in open(afile)]
        assert len(records) == 1
        assert isinstance(records[0]["pred_response"], str)

    def test_dummy_init_matches_quantized_load_structure(self):
        """init_dummy_params(bits=8) produces the SAME pytree structure,
        shapes, and dtypes as the real path (init full tree -> post-load
        quantize_tree), so a dummy-loaded engine compiles the identical
        program a real --load-in-8bit checkpoint would."""
        from video3d_tpu.models.builder import init_dummy_params
        from video3d_tpu.models.quant import quantize_tree

        cfg = ModelConfig.tiny()
        real = quantize_tree(
            lv3d.init_model(jax.random.PRNGKey(0), cfg,
                            dtype=jax.numpy.bfloat16), bits=8)
        dummy = init_dummy_params(cfg, bits=8)
        rt = jax.tree.structure(real)
        dt = jax.tree.structure(dummy)
        assert rt == dt
        for a, b in zip(jax.tree.leaves(real), jax.tree.leaves(dummy)):
            assert a.shape == b.shape and a.dtype == b.dtype

    def test_eval_w8a8_and_tp(self, env, tmp_path, monkeypatch):
        """--w8a8 (dynamic-activation int8, implies int8 weights) and
        --tp 2 (engine sharded over a 2-device serving mesh) drive the
        eval end-to-end."""
        root, info, ckpt = env
        monkeypatch.setattr(cli, "_load_tokenizer", lambda p: FakeTokenizer())
        qfile = str(tmp_path / "qw.json")
        with open(qfile, "w") as f:
            json.dump([{
                "id": "q0_0", "video": info["sample_idx"],
                "conversations": [
                    {"from": "human", "value": "<image>\nwhat is here"},
                    {"from": "gpt", "value": "chair"}],
                "metadata": {"dataset": "scanqa", "question_type": "what",
                             "answers": ["chair"]}}], f)
        afile = str(tmp_path / "aw.jsonl")
        cli.main(["eval-scanqa", "--model-path", ckpt,
                  "--question-file", qfile, "--answer-file", afile,
                  "--max-new-tokens", "4", "--w8a8", "--tp", "2",
                  *data_flags(root)])
        records = [json.loads(l) for l in open(afile)]
        assert len(records) == 1
        assert isinstance(records[0]["pred_response"], str)

    def test_eval_rank_world_striping(self, env, tmp_path, monkeypatch):
        root, info, ckpt = env
        monkeypatch.setattr(cli, "_load_tokenizer", lambda p: FakeTokenizer())
        qfile = str(tmp_path / "q.json")
        with open(qfile, "w") as f:
            json.dump([{
                "id": f"q{i}_0", "video": info["sample_idx"],
                "conversations": [
                    {"from": "human", "value": "<image>\nwhat is here"},
                    {"from": "gpt", "value": "chair"}],
                "metadata": {"dataset": "scanqa", "question_type": "what"}}
                for i in range(3)], f)
        afile = str(tmp_path / "a.jsonl")
        cli.main(["eval-scanqa", "--model-path", ckpt,
                  "--question-file", qfile, "--answer-file", afile,
                  "--rank", "1", "--world", "2", "--max-new-tokens", "4",
                  *data_flags(root)])
        records = [json.loads(l) for l in open(afile)]
        assert [r["sample_id"] for r in records] == ["q1_0"]  # stripe 1::2


class TestTrainCli:
    def test_train_one_epoch(self, env, tmp_path, monkeypatch):
        root, info, ckpt = env
        monkeypatch.setattr(cli, "_load_tokenizer", lambda p: FakeTokenizer())
        ann = make_fake_annotations(root, info["sample_idx"], n=2)
        out = str(tmp_path / "run")
        cli.main(["train", "--model-path", ckpt, "--data-path", ann,
                  "--output-dir", out, "--num-epochs", "1",
                  "--gradient-accumulation-steps", "1", "--max-len", "160",
                  "--global-batch-size", "1", *data_flags(root)])
        # the trainer ran and wrote step metrics
        assert os.path.isdir(out)

    def test_train_qlora(self, env, tmp_path, monkeypatch):
        """--lora-enable --bits 8: the QLoRA branch (reference
        train_3d.py:1588-1657) through the CLI entry point."""
        root, info, ckpt = env
        monkeypatch.setattr(cli, "_load_tokenizer", lambda p: FakeTokenizer())
        ann = make_fake_annotations(root, info["sample_idx"], n=2)
        out = str(tmp_path / "run_qlora")
        cli.main(["train", "--model-path", ckpt, "--data-path", ann,
                  "--output-dir", out, "--num-epochs", "1",
                  "--gradient-accumulation-steps", "1", "--max-len", "160",
                  "--global-batch-size", "1", "--group-by", "none",
                  "--lora-enable", "--lora-r", "4", "--lora-alpha", "8",
                  "--bits", "8", *data_flags(root)])
        assert os.path.isdir(out)

    def test_qlora_train_then_eval_with_adapters(self, env, tmp_path,
                                                 monkeypatch):
        """Full adapter round trip: train --lora-enable --bits 8, then
        eval-scanqa --lora-path <run>/model merges the exported adapters
        + non-LoRA trainables into the base before serving."""
        root, info, ckpt = env
        monkeypatch.setattr(cli, "_load_tokenizer", lambda p: FakeTokenizer())
        ann = make_fake_annotations(root, info["sample_idx"], n=2)
        out = str(tmp_path / "run_qlora_rt")
        cli.main(["train", "--model-path", ckpt, "--data-path", ann,
                  "--output-dir", out, "--num-epochs", "1",
                  "--gradient-accumulation-steps", "1", "--max-len", "160",
                  "--global-batch-size", "1", "--group-by", "none",
                  "--lora-enable", "--lora-r", "4", "--lora-alpha", "8",
                  "--bits", "8", *data_flags(root)])
        assert os.path.isfile(os.path.join(out, "lora.json"))
        assert os.path.isdir(os.path.join(out, "model"))

        qfile = str(tmp_path / "q_lora.json")
        with open(qfile, "w") as f:
            json.dump([{
                "id": "q0_0", "video": info["sample_idx"],
                "conversations": [
                    {"from": "human", "value": "<image>\nwhat is here"},
                    {"from": "gpt", "value": "chair"}],
                "metadata": {"dataset": "scanqa", "question_type": "what",
                             "answers": ["chair"]}}], f)
        afile = str(tmp_path / "a_lora.jsonl")
        cli.main(["eval-scanqa", "--model-path", ckpt,
                  "--lora-path", os.path.join(out, "model"),
                  "--question-file", qfile, "--answer-file", afile,
                  "--max-new-tokens", "4", *data_flags(root)])
        records = [json.loads(l) for l in open(afile)]
        assert len(records) == 1
        assert isinstance(records[0]["pred_response"], str)

    def test_train_dummy_load_format(self, env, tmp_path, monkeypatch):
        """train --load-format dummy: a config.json-only checkpoint dir
        drives a QLoRA training run on a device-initialized random base
        pre-quantized to --bits (the on-chip 7B train rehearsal path,
        scripts/bench/train_rehearsal.py)."""
        root, info, ckpt = env
        monkeypatch.setattr(cli, "_load_tokenizer", lambda p: FakeTokenizer())
        dummy_dir = tmp_path / "dummy_ckpt"
        dummy_dir.mkdir()
        with open(os.path.join(ckpt, "config.json")) as f:
            hf = json.load(f)
        hf["vision_config"] = {
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 56, "patch_size": 14}
        with open(dummy_dir / "config.json", "w") as f:
            json.dump(hf, f)
        # the conftest's 8 virtual devices make the effective batch
        # per_device_bs x mesh size = 8; fewer samples than that would
        # drop-last to ZERO steps (reference parity) and leave the
        # metrics assertion below vacuous
        ann = make_fake_annotations(root, info["sample_idx"], n=8)
        out = str(tmp_path / "run_dummy")
        cli.main(["train", "--model-path", str(dummy_dir),
                  "--load-format", "dummy", "--data-path", ann,
                  "--output-dir", out, "--num-epochs", "1",
                  "--gradient-accumulation-steps", "1", "--max-len", "160",
                  "--global-batch-size", "8", "--group-by", "none",
                  # metrics path inside the NOT-YET-CREATED output dir:
                  # the trainer must mkdir it (regression: FileNotFoundError
                  # on the flagship train rehearsal)
                  "--metrics-file", os.path.join(out, "metrics.jsonl"),
                  "--lora-enable", "--lora-r", "4", "--lora-alpha", "8",
                  "--bits", "4", *data_flags(root)])
        assert os.path.isfile(os.path.join(out, "lora.json"))
        assert os.path.isdir(os.path.join(out, "model"))
        with open(os.path.join(out, "metrics.jsonl")) as f:
            assert json.loads(f.readline())["step"] == 1

    def test_train_bits_without_lora_rejected(self, env, tmp_path,
                                              monkeypatch):
        root, info, ckpt = env
        monkeypatch.setattr(cli, "_load_tokenizer", lambda p: FakeTokenizer())
        ann = make_fake_annotations(root, info["sample_idx"], n=2)
        with pytest.raises(SystemExit):
            cli.main(["train", "--model-path", ckpt, "--data-path", ann,
                      "--output-dir", str(tmp_path / "x"), "--bits", "8",
                      *data_flags(root)])
