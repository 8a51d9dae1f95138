"""7B-shaped sharded weight-import rehearsal test (VERDICT r2 #8).

Generates an HF-layout MULTI-SHARD bf16 safetensors checkpoint with the
TRUE per-tensor 7B shapes — 3584-wide Qwen2 layers, the 152064-row embed
and untied lm_head, the 1152-wide so400m tower, mlp2x_gelu projector — at
reduced depth (8 LLM + 4 vision layers, ~4.4 GB) with a small shard size
so the index spans several files, then drives
``builder.load_pretrained_model`` over it with the ScanQA drivers' exact
``{"vocab_size": 151649, "tie_word_embeddings": False}`` overwrite
(reference model/builder.py:206-228, model_scanqa.py:94-101) and checks
shapes/dtypes/branches + prints the timing.

The FULL 28-layer run is `scripts/bench/weights_import_7b.py` (same
machinery, 14.96 GiB / 4 shards); its measured wall/RSS live in
BENCH_NOTES.md.
"""

import json
import os
import shutil
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts", "bench"))


def test_sharded_7b_shape_import(tmp_path):
    import weights_import_7b as w7b

    path = str(tmp_path / "ckpt")
    total, n_shards = w7b.make_sharded_checkpoint(
        path, llm_layers=8, vision_layers=4,
        shard_bytes=1024 ** 3)                  # 1 GB shards -> multi-file
    assert n_shards >= 3, n_shards              # a real sharded index
    idx = json.load(open(os.path.join(path, "model.safetensors.index.json")))
    assert idx["metadata"]["total_size"] == total
    assert len(set(idx["weight_map"].values())) == n_shards
    # every mapped file exists and nothing else claims to be a shard
    files = {f for f in os.listdir(path) if f.endswith(".safetensors")}
    assert files == set(idx["weight_map"].values())

    out = w7b.run_rehearsal(path)               # asserts shapes/branches
    assert out["llm_layers"] == 8 and out["vision_layers"] == 4
    assert out["load_convert_s"] > 0
    print(f"[rehearsal] {json.dumps(out)}")
    shutil.rmtree(path, ignore_errors=True)
