"""7B QLoRA TRAINING rehearsal ON THE REAL CHIP through the production CLI.

`python -m video3d_tpu.cli train --load-format dummy` at the reference's
flagship training configuration (train_multi.sh:17-25,73): Qwen2-7B
(28L/3584) + 26-layer SigLIP so400m, V=32 frames of 480x640 RGB-D per
scene, QLoRA over an int8/int4 frozen base (the single-chip fine-tuning
story — a bf16 full FT needs a v5e-8 slice, BENCH_NOTES "Full 7B
train-step memory").

Unlike scripts/bench/qlora_step.py, which measures the bare LLM train
step in a fori_loop harness, this drives the REAL user path end to end in
a subprocess: host video IO (32 depth+RGB PNGs + poses per sample) +
geometry + tokenization + collator bucketing + the Trainer's jitted
fwd+bwd (frozen quantized base, f32-master LoRA adapters, remat, chunked
CE) + adapter export (lora.json + orbax model tree). Reported step times
include host dataloading and the remote tunnel's per-dispatch RTT, so
they are an UPPER bound on the pure step cost (that is qlora_step.py's
622.5 ms at int8/L=2048).

Usage:
  python scripts/bench/train_rehearsal.py [--bits {8,4}] [--max-len N]
      [--max-frames V] [--samples N] [--epochs N] [--rank R]

Defaults are the flagship-shaped config: --bits 4 --max-len 8192
--max-frames 32 (32x210 vision tokens + text in one 8192 bucket; int4
is the base precision whose measured envelope reaches L=8192). The int8
cross-check config is --bits 8 --max-len 2048 --max-frames 8.
Assets land in .rehearsal/ (shared with cli_rehearsal.py); first run
compiles the 7B train step through the remote tunnel (minutes, cached in
.jax_cache); rerun for warm step times.
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
sys.path.insert(0, os.path.join(REPO, "scripts", "bench"))

ASSETS = os.path.join(REPO, ".rehearsal")

TRAIN_QUESTIONS = (
    "what color is the chair near the corner of this room",
    "describe the object located at the table",
    "how many chairs are near that table",
    "what is on top of the table",
)


def build_train_assets(samples: int) -> str:
    """Scenes come from cli_rehearsal.build_assets (shared); this adds a
    ScanQA-style training json over them."""
    from cli_rehearsal import build_assets

    if not os.path.exists(os.path.join(ASSETS, "questions.json")):
        build_assets()
    with open(os.path.join(ASSETS, "questions.json")) as f:
        scene_ids = sorted({q["video"] for q in json.load(f)})
    records = []
    for i in range(samples):
        records.append({
            "id": f"t{i}",
            "video": scene_ids[i % len(scene_ids)],
            "conversations": [
                {"from": "human",
                 "value": f"<image>\n{TRAIN_QUESTIONS[i % 4]}"},
                {"from": "gpt", "value": "a brown wooden chair"}],
            "metadata": {"dataset": "scanqa", "question_id": f"t{i}"},
        })
    path = os.path.join(ASSETS, "train_scanqa.json")
    with open(path, "w") as f:
        json.dump(records, f)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4, choices=(8, 4))
    ap.add_argument("--max-len", type=int, default=8192)
    ap.add_argument("--max-frames", type=int, default=32)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--setup-only", action="store_true")
    args = ap.parse_args()

    ann = build_train_assets(args.samples)
    if args.setup_only:
        print(f"assets ready: {ann}")
        return

    data = os.path.join(ASSETS, "data")
    out = os.path.join(ASSETS, f"train_run_{int(time.time())}")
    metrics = os.path.join(out, "metrics.jsonl")
    cmd = [
        sys.executable, "-m", "video3d_tpu.cli", "train",
        "--model-path", os.path.join(ASSETS, "ckpt-7b-dummy"),
        "--load-format", "dummy",
        "--data-path", ann,
        "--output-dir", out,
        "--metrics-file", metrics,
        "--num-epochs", str(args.epochs),
        "--global-batch-size", "1",
        "--gradient-accumulation-steps", "1",
        "--group-by", "none",
        "--max-len", str(args.max_len),
        "--max-frame-num", str(args.max_frames),
        "--lora-enable", "--lora-r", str(args.rank),
        "--lora-alpha", str(2 * args.rank),
        "--bits", str(args.bits),
        "--video-folder", data,
        "--embodiedscan-folder", os.path.join(data, "embodiedscan"),
        "--metadata-folder", os.path.join(data, "metadata"),
    ]
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    rc = subprocess.call(cmd, env=env, cwd=REPO)
    wall = time.time() - t0
    print(f"total wall (incl. init + compiles + host IO): {wall:.1f}s "
          f"rc={rc}")
    if rc == 0 and os.path.exists(metrics):
        with open(metrics) as f:
            steps = [json.loads(line) for line in f]
        if steps:
            times = [s["step_time_s"] for s in steps]
            # first step carries the fwd+bwd compile; report it apart
            warm = times[1:] or times
            print(f"steps: {len(steps)}; step1 (compile+run) {times[0]:.1f}s;"
                  f" warm mean {sum(warm)/len(warm):.2f}s"
                  f" min {min(warm):.2f}s; final lm_loss"
                  f" {steps[-1].get('lm_loss'):.4f}")
        print(f"artifacts: {sorted(os.listdir(out))}")
    sys.exit(rc)


if __name__ == "__main__":
    main()
