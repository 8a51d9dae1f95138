"""Dress rehearsal: `scripts/eval/eval_all.sh` end-to-end over a synthetic
2-scene fixture — the SHELL + CLI surface, not library calls (VERDICT r1
#6). For each of the five benchmarks the script runs
`python -m video3d_tpu.cli eval-<task>` in a subprocess (real checkpoint
loading through the builder, a REAL saved HF tokenizer, flock'd jsonl) and
then the metric protocol, like the reference's scripts/3d/eval/*.sh +
llava/eval/eval_*.py pipeline."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow

WORDS = ("what color is the chair brown describe object this it a at located "
         "corner of room find that matches description identify all chairs "
         "near table".split())


def save_real_tokenizer(path):
    """WordLevel PreTrainedTokenizerFast saved as a loadable HF tokenizer:
    vocab ids < 512 (the tiny model vocab), eos <|im_end|>, and the
    <ground>/<coord>/<image> specials pre-assigned so cli.py's add_tokens
    reuses in-range ids."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"<unk>": 0, "<|im_start|>": 100, "<|im_end|>": 101,
             "<image>": 300, "<ground>": 301, "<coord>": 302}
    nxt = 310
    for w in ("system user assistant You are helpful".split()
              + list(WORDS) + ["\n", ".", "?"]):
        if w not in vocab:
            vocab[w] = nxt
            nxt += 1
    # dense ids: the fast-tokenizer save format rejects vocab holes
    for i in range(nxt):
        if i not in vocab.values():
            vocab[f"<unused{i}>"] = i
    tk = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    tok = PreTrainedTokenizerFast(
        tokenizer_object=tk, unk_token="<unk>", eos_token="<|im_end|>",
        pad_token="<unk>",
        additional_special_tokens=["<|im_start|>", "<|im_end|>"],
        model_max_length=4096)
    tok.save_pretrained(path)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return build_e2e_workdir(tmp_path_factory.mktemp("e2e"))


def build_e2e_workdir(wd):
    """cwd layout eval_all.sh / parity_kit.sh expect: data/ (scenes),
    data/processed/ (question files), ckpt/ (HF export + tokenizer),
    results/. Shared with tests/test_parity_kit.py."""
    from fixtures import make_fake_scene
    from video3d_tpu.config import ModelConfig
    from video3d_tpu.models import llava_video3d as lv3d
    from video3d_tpu.models.weights import export_llava_checkpoint

    data = wd / "data"
    scenes = []
    for i in range(2):
        info = make_fake_scene(str(data), scene_id=f"scene{i:04d}_00",
                               n_frames=3, extend=(i > 0))
        scenes.append(info)

    cfg = ModelConfig.tiny()
    params = lv3d.init_model(jax.random.PRNGKey(0), cfg)
    ckpt = wd / "ckpt"
    export_llava_checkpoint(params, cfg.llm, cfg, str(ckpt))
    save_real_tokenizer(str(ckpt))

    proc = data / "processed"
    proc.mkdir()

    def conv(q, a):
        return [{"from": "human", "value": f"<image>\n{q}"},
                {"from": "gpt", "value": a}]

    def boxes(info):
        return np.asarray(info["boxes"], np.float32)

    qa = [{"id": f"q{i}_0", "video": s["sample_idx"],
           "conversations": conv("what color is the chair", "brown"),
           "metadata": {"dataset": "scanqa", "question_type": "what",
                        "answers": ["brown"]}}
          for i, s in enumerate(scenes)]
    (proc / "scanqa_val_llava_style.json").write_text(json.dumps(qa))

    sqa = [{"id": f"s{i}_0", "video": s["sample_idx"],
            "conversations": conv("is this a room ?", "yes"),
            "metadata": {"dataset": "sqa3d", "question_type": "N/A",
                         "answers": ["yes"]}}
           for i, s in enumerate(scenes)]
    (proc / "sqa3d_test_llava_style.json").write_text(json.dumps(sqa))

    cap = [{"id": f"c{i}", "video": s["sample_idx"],
            "box_input": boxes(s)[1].tolist(),
            "conversations": conv("describe this object located at <coord>",
                                  "a brown chair near the table"),
            "annotations": ["sos a brown chair near the table eos"],
            "metadata": {"dataset": "scan2cap", "question_type": "N/A"}}
           for i, s in enumerate(scenes)]
    (proc / "scan2cap_val_llava_style.json").write_text(json.dumps(cap))

    ref = [{"id": f"r{i}", "video": s["sample_idx"],
            "box": boxes(s)[1].tolist(),
            "conversations": conv("identify the brown chair", "<ground>"),
            "metadata": {"dataset": "scanrefer", "question_type": "unique",
                         "object_id": 1, "gt_box": boxes(s)[1].tolist()}}
           for i, s in enumerate(scenes)]
    (proc / "scanrefer_vg_val_llava_style.json").write_text(json.dumps(ref))

    m3dr = [{"id": f"m{i}", "video": s["sample_idx"],
             "box": [boxes(s)[1].tolist()],
             "conversations": conv("find all chairs", "<ground>"),
             "metadata": {"dataset": "multi3drefer",
                          "question_type": "st_w_d", "object_id": 1}}
            for i, s in enumerate(scenes)]
    (proc / "multi3drefer_val_llava_style.json").write_text(json.dumps(m3dr))

    # CPU-forcing sitecustomize shim (the env's own sitecustomize would
    # register the remote TPU); PYTHONPATH shadows it
    shim = wd / "shim"
    shim.mkdir()
    (shim / "sitecustomize.py").write_text(
        "import jax\njax.config.update('jax_platforms', 'cpu')\n")
    return wd


def run_task(workdir, task):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               PYTHONPATH=f"{workdir / 'shim'}:{repo}",
               JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)   # no 8-device emulation in the subprocess
    r = subprocess.run(
        ["bash", os.path.join(repo, "scripts/eval/eval_all.sh"),
         task, str(workdir / "ckpt"), "uniform", "3"],
        cwd=str(workdir), env=env, capture_output=True, text=True,
        timeout=900)
    assert r.returncode == 0, f"{task}:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    return r.stdout


@pytest.mark.parametrize("task,expect_keys", [
    ("scanqa", ("CIDEr", "EM", "METEOR")),
    ("sqa3d", ("all",)),
    ("scan2cap", ("CIDEr", "BLEU-4", "METEOR", "ROUGE-L")),
    ("scanrefer", ("all@0.25",)),
    ("multi3drefer", ("all@F1_0.25",)),
])
def test_task_end_to_end(workdir, task, expect_keys):
    out = run_task(workdir, task)
    # driver ran over both scenes and printed its timing line
    assert "mean inference time" in out
    # protocol stage printed every expected metric
    for key in expect_keys:
        assert any(line.startswith(f"{key}:") for line in out.splitlines()), \
            (key, out[-1500:])
    # answers jsonl is well-formed, one record per question
    ans = workdir / "results" / task / "uniform_3.jsonl"
    records = [json.loads(l) for l in open(ans)]
    assert len(records) == 2
