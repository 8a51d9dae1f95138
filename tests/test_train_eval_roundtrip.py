"""Train -> eval memorization round trip (VERDICT r4 #6).

Overfits a tiny random-init model on a synthetic scene through the REAL
``cli train`` entry point, then asserts the REAL eval drivers reproduce
the memorized behavior:

  * phase A: 16 ScanQA-style QA pairs -> ``eval-scanqa`` must decode each
    memorized answer VERBATIM (prompt assembly, splice plan, labels,
    decode loop all agree between trainer and engine — the train/infer
    asymmetry class loss curves cannot catch: label shift, splice
    mismatch; train_3d.py:601-674 vs model_scanqa.py:29-80 in the
    reference);
  * phase B: ScanRefer-style ``<ground>`` samples trained FROM the
    phase-A export with the LLM frozen (--mm-tunable-parts keeps only
    the adapter; the ground head + world-PE always train) ->
    ``eval-scanrefer`` must rank the trained object_id first (grounding
    head + <ground> splice survive the loop, llava_qwen.py:239-331) and
    the QA answers must STILL be verbatim afterwards.

Two phases because the trainer routes any batch containing a ground
sample to the InfoNCE step (reference parity) — mixed batches would
starve the LM of updates. Trains with --no-spatial-instruction because
the reference's EVAL prompts deliberately lack the training-side spatial
instruction (model_scanqa.py:140 only LOGS --extra-prompt) and the
engine mirrors that quirk — this very asymmetry is what the first run
of this test caught.

The SAME FakeTokenizer instance serves train and eval: its word ids are
assigned first-seen, so a fresh instance on the eval side could permute
ids and fake a mismatch.
"""

import json
import os

import numpy as np
import pytest

import jax

import video3d_tpu.cli as cli
from video3d_tpu.config import ModelConfig
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models.weights import export_llava_checkpoint

from fixtures import FakeTokenizer, make_fake_scene

pytestmark = pytest.mark.slow

# distinct FIRST words: the first generated token must be uniquely
# determined by the question, or a tiny model can swap two answers that
# share a prefix (observed: two "some ..." answers crossed)
ANSWERS = ["the red ceramic mug", "a green floor lamp",
           "one wooden dining table", "some blue window curtains",
           "two soft couch pillows", "that small metal stool",
           "an old leather suitcase", "this bright desk monitor",
           "my heavy iron kettle", "your folded bath towel",
           "their narrow hallway mirror", "its fresh garden flowers",
           "each silver kitchen sink", "every round wall clock",
           "both tall corner bookshelves", "another striped picnic blanket"]
GROUND_IDS = [1, 3]


def _questions(sample_idx):
    return [{
        "id": f"q{i}_0", "video": sample_idx,
        "conversations": [
            {"from": "human", "value": f"<image>\nWhat is item number {i} ?"},
            {"from": "gpt", "value": ANSWERS[i]}],
        "metadata": {"dataset": "scanqa", "question_type": "what",
                     "answers": [ANSWERS[i]]},
    } for i in range(len(ANSWERS))]


def _ground_questions(info, copies: int = 1):
    return [{
        "id": f"g{k}_{c}", "video": info["sample_idx"],
        "box": info["boxes"][oid].tolist(),
        "conversations": [
            {"from": "human",
             "value": f"<image>\nIdentify the object labeled {oid}"},
            {"from": "gpt", "value": "<ground>"}],
        "metadata": {"dataset": "scanrefer", "question_type": "unique",
                     "object_id": oid,
                     "gt_box": info["boxes"][oid].tolist()},
    } for c in range(copies) for k, oid in enumerate(GROUND_IDS)]


def _reexport(run_dir, cfg, dst):
    """Trainer orbax export -> HF-format dir (exercises the production
    checkpoint loader on the eval side)."""
    import orbax.checkpoint as ocp

    trained = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(os.path.join(run_dir, "model")))
    export_llava_checkpoint(trained, cfg.llm, cfg, dst)
    return dst


class TestTrainEvalRoundtrip:
    def test_memorization_roundtrip(self, tmp_path, monkeypatch):
        root = str(tmp_path / "data")
        info = make_fake_scene(root, n_frames=3)
        tok = FakeTokenizer()
        monkeypatch.setattr(cli, "_load_tokenizer", lambda p: tok)

        cfg = ModelConfig.tiny()
        params = lv3d.init_model(jax.random.PRNGKey(0), cfg)
        ckpt = str(tmp_path / "ckpt")
        export_llava_checkpoint(params, cfg.llm, cfg, ckpt)

        flags = ["--video-folder", root,
                 "--embodiedscan-folder", os.path.join(root, "embodiedscan"),
                 "--metadata-folder", os.path.join(root, "metadata"),
                 "--max-frame-num", "3"]

        # ---- phase A: memorize 16 QA pairs (pure LM steps) ----
        qa = _questions(info["sample_idx"])
        ann_a = str(tmp_path / "train_qa.json")
        with open(ann_a, "w") as f:
            json.dump(qa, f)
        out_a = str(tmp_path / "run_qa")
        # 16 samples / batch 8 (per_device_bs 1 x the conftest's 8 virtual
        # devices) = 2 steps per epoch x 250 epochs = 500 steps
        cli.main(["train", "--model-path", ckpt, "--data-path", ann_a,
                  "--output-dir", out_a, "--num-epochs", "250",
                  "--gradient-accumulation-steps", "1", "--max-len", "160",
                  "--global-batch-size", "8", "--group-by", "none",
                  "--learning-rate", "1e-3",
                  "--no-spatial-instruction", *flags])
        ckpt_a = _reexport(out_a, cfg, str(tmp_path / "ckpt_a"))

        # ---- phase B: memorize grounding, LLM frozen ----
        ground = _ground_questions(info, copies=4)      # 8 samples
        ann_b = str(tmp_path / "train_ground.json")
        with open(ann_b, "w") as f:
            json.dump(ground, f)
        out_b = str(tmp_path / "run_ground")
        cli.main(["train", "--model-path", ckpt_a, "--data-path", ann_b,
                  "--output-dir", out_b, "--num-epochs", "80",
                  "--gradient-accumulation-steps", "1", "--max-len", "160",
                  "--global-batch-size", "8", "--group-by", "none",
                  "--learning-rate", "1e-3", "--no-spatial-instruction",
                  "--mm-tunable-parts", "mm_mlp_adapter", *flags])
        ckpt_b = _reexport(out_b, cfg, str(tmp_path / "ckpt_b"))

        # ---- eval-scanqa on the FINAL weights: verbatim answers ----
        qfile = str(tmp_path / "q.json")
        with open(qfile, "w") as f:
            json.dump(qa, f)
        afile = str(tmp_path / "a.jsonl")
        cli.main(["eval-scanqa", "--model-path", ckpt_b,
                  "--question-file", qfile, "--answer-file", afile,
                  "--max-new-tokens", "12", *flags])
        records = [json.loads(l) for l in open(afile)]
        assert len(records) == len(ANSWERS)
        got = [r["pred_response"] for r in records]
        assert got == ANSWERS, list(zip(got, ANSWERS))

        # ---- eval-scanrefer: the trained object ranks first ----
        gfile = str(tmp_path / "g.json")
        with open(gfile, "w") as f:
            json.dump(_ground_questions(info), f)
        gafile = str(tmp_path / "ga.jsonl")
        cli.main(["eval-scanrefer", "--model-path", ckpt_b,
                  "--question-file", gfile, "--answer-file", gafile,
                  "--max-new-tokens", "4", *flags])
        grecords = [json.loads(l) for l in open(gafile)]
        assert len(grecords) == len(GROUND_IDS)
        for rec, oid in zip(grecords, GROUND_IDS):
            np.testing.assert_allclose(rec["pred_response"],
                                       info["boxes"][oid], atol=1e-5)
