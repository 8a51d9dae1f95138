"""Flagship CLI rehearsal ON THE REAL CHIP: the production eval CLI
(`python -m video3d_tpu.cli eval-scanqa`) at the reference's flagship
configuration — Qwen2-7B (28L/3584, reference train_multi.sh:17-25) +
26-layer SigLIP so400m, int8 weights + int8 KV, V=32 frames of 480x640
RGB-D (frames_upbound=32, train_multi.sh:73), scene-prefix KV cache on —
using --load-format dummy (random weights initialized layer-by-layer on
device) over synthetic scenes.

Unlike scripts/bench/flagship32.py, which measures the compute chain inside
a fori_loop harness, this drives the REAL user-facing path end to end in a
subprocess: host video IO (32 depth PNGs + poses per scene) + geometry +
tokenization + splice planning + engine scene/prefix caches + jitted
prefill/decode + flock'd jsonl writing — i.e. exactly what a user runs.
Reported wall includes host work and the remote tunnel's per-dispatch RTT
(~70-110 ms), so per-question means are an UPPER bound; the kernel-level
steady-state cost is the flagship32 prefix row (15.3 ms B=1 / 10.1 ms B=8).

Usage:
  python scripts/bench/cli_rehearsal.py --setup-only     # build assets only
  python scripts/bench/cli_rehearsal.py [--questions-per-scene N]
      [--batch-size B] [--max-new-tokens M] [--max-frames V] [--bf16-kv]
  python scripts/bench/cli_rehearsal.py --task scanrefer  # DISCRIMINATIVE
      # path: eval-scanrefer over a 128-object scene (the grounding hot
      # path of model_scanrefer.py:163-179 — prefill + object masked-mean
      # + predict_box scoring, no decode loop)

Assets land in .rehearsal/ at the repo root (7B config.json + WordLevel
tokenizer, 2 scenes x 32 frames of 480x640, ScanQA-style questions).
First run compiles the 7B programs through the remote tunnel (~10-30 min,
cached in .jax_cache); rerun for the warm number.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

ASSETS = os.path.join(REPO, ".rehearsal")

# Qwen2-7B-Instruct architecture + the eval drivers' overwrite_config
# (vocab 151649, untied head — reference model_scanqa.py:94-101) + the 3D
# knobs train_multi.sh persists into checkpoint config.json.
QWEN2_7B_CONFIG = {
    "model_type": "qwen2",
    "hidden_size": 3584,
    "intermediate_size": 18944,
    "num_hidden_layers": 28,
    "num_attention_heads": 28,
    "num_key_value_heads": 4,
    "head_dim": 128,
    "vocab_size": 151649,
    "rms_norm_eps": 1e-6,
    "rope_theta": 1e6,
    "max_position_embeddings": 32768,
    "tie_word_embeddings": False,
    "world_position_embedding_type": "avg-discrete-sin3d",
    "voxel_size": 0.1,
    "min_xyz_range": [-15, -15, -5],
    "max_xyz_range": [15, 15, 5],
    "object_feature_type": "patch14-pe",
    "ground_head_type": "infonce",
    "tokenizer_model_max_length": 32768,
}

QUESTION_WORDS = ("what color is the chair near the corner of this room",
                  "describe the object located at the table",
                  "is this a room that matches the description",
                  "find all chairs near that table")


def build_assets(n_scenes: int = 2, n_frames: int = 32,
                 questions_per_scene: int = 4) -> None:
    import numpy as np

    from fixtures import make_fake_scene
    from test_eval_e2e import save_real_tokenizer

    os.makedirs(ASSETS, exist_ok=True)
    ckpt = os.path.join(ASSETS, "ckpt-7b-dummy")
    os.makedirs(ckpt, exist_ok=True)
    with open(os.path.join(ckpt, "config.json"), "w") as f:
        json.dump(QWEN2_7B_CONFIG, f, indent=1)
    save_real_tokenizer(ckpt)

    data = os.path.join(ASSETS, "data")
    scenes = []
    for i in range(n_scenes):
        info = make_fake_scene(data, scene_id=f"scene{i:04d}_00",
                               n_frames=n_frames, H=480, W=640,
                               seed=i, extend=(i > 0))
        scenes.append(info)

    qs = []
    for i, s in enumerate(scenes):
        for j in range(questions_per_scene):
            q = QUESTION_WORDS[j % len(QUESTION_WORDS)]
            qs.append({
                "id": f"q{i}_{j}", "video": s["sample_idx"],
                "conversations": [
                    {"from": "human", "value": f"<image>\n{q}"},
                    {"from": "gpt", "value": "brown"}],
                "metadata": {"dataset": "scanqa", "question_type": "what",
                             "answers": ["brown"]}})
    with open(os.path.join(ASSETS, "questions.json"), "w") as f:
        json.dump(qs, f)
    n = n_scenes * n_frames
    print(f"assets ready: {ASSETS} ({n_scenes} scenes x {n_frames} frames "
          f"of 480x640, {len(qs)} questions)")


def build_ground_assets(n_objects: int = 128, n_frames: int = 32,
                        questions: int = 4) -> None:
    """Separate 1-scene tree for the DISCRIMINATIVE (eval-scanrefer) path:
    the grounding bench's 128 candidate objects (scripts/bench/grounding.py)
    over a full 480x640 x 32-frame scene. Lives in its own data dir so it
    never perturbs the generative rehearsal's scenes."""
    from fixtures import make_fake_scene

    data = os.path.join(ASSETS, "data_ground")
    info = make_fake_scene(data, scene_id="scene0100_00",
                           n_frames=n_frames, H=480, W=640,
                           n_objects=n_objects, seed=100)
    qs = []
    for j in range(questions):
        oid = (j * 31) % n_objects
        qs.append({
            "id": f"g{j}", "video": info["sample_idx"],
            "box": info["boxes"][oid].tolist(),
            "conversations": [
                {"from": "human",
                 "value": "<image>\nIdentify the object described: "
                          f"{QUESTION_WORDS[j % len(QUESTION_WORDS)]}"},
                {"from": "gpt", "value": "<ground>"}],
            "metadata": {"dataset": "scanrefer", "question_type": "unique",
                         "object_id": oid,
                         "gt_box": info["boxes"][oid].tolist()}})
    with open(os.path.join(ASSETS, "questions_ground.json"), "w") as f:
        json.dump(qs, f)
    print(f"ground assets ready: {data} (1 scene x {n_frames} frames, "
          f"{n_objects} objects, {len(qs)} questions)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--setup-only", action="store_true")
    ap.add_argument("--task", choices=("scanqa", "scanrefer"),
                    default="scanqa")
    ap.add_argument("--questions-per-scene", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--max-new-tokens", type=int, default=16)
    ap.add_argument("--max-frames", type=int, default=32)
    ap.add_argument("--n-objects", type=int, default=128)
    ap.add_argument("--bf16-kv", action="store_true")
    args = ap.parse_args()

    if args.task == "scanrefer":
        if not os.path.exists(os.path.join(ASSETS, "questions_ground.json")):
            build_ground_assets(n_objects=args.n_objects,
                                questions=args.questions_per_scene)
        data = os.path.join(ASSETS, "data_ground")
        question_file = os.path.join(ASSETS, "questions_ground.json")
    else:
        if not os.path.exists(os.path.join(ASSETS, "questions.json")) or \
                args.questions_per_scene != 4:
            build_assets(questions_per_scene=args.questions_per_scene)
        data = os.path.join(ASSETS, "data")
        question_file = os.path.join(ASSETS, "questions.json")
    if args.setup_only:
        return

    answer_file = os.path.join(
        ASSETS, f"answers_{args.task}_{int(time.time())}.jsonl")
    cmd = [
        sys.executable, "-m", "video3d_tpu.cli", f"eval-{args.task}",
        "--model-path", os.path.join(ASSETS, "ckpt-7b-dummy"),
        "--load-format", "dummy", "--load-in-8bit",
        "--kv-cache-dtype", "bfloat16" if args.bf16_kv else "int8",
        "--question-file", question_file,
        "--answer-file", answer_file,
        "--video-folder", data,
        "--embodiedscan-folder", os.path.join(data, "embodiedscan"),
        "--metadata-folder", os.path.join(data, "metadata"),
        "--frame-sampling-strategy", "uniform",
        "--max-frame-num", str(args.max_frames),
        "--max-new-tokens", str(args.max_new_tokens),
        "--batch-size", str(args.batch_size),
    ]
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    rc = subprocess.call(cmd, env=env, cwd=REPO)
    print(f"total wall (incl. model init + compiles): {time.time()-t0:.1f}s "
          f"rc={rc}")
    if rc == 0:
        with open(answer_file) as f:
            n = sum(1 for _ in f)
        print(f"{n} answers -> {answer_file}")
    sys.exit(rc)


if __name__ == "__main__":
    main()
