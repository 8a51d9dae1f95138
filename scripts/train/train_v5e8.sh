#!/usr/bin/env bash
# Flagship 5-task fine-tune on a TPU v5e-8 slice.
# Equivalent of the reference scripts/3d/train/train_multi.sh (torchrun 8xGPU,
# DeepSpeed ZeRO-3): one host process drives all 8 chips through the
# (dp, fsdp, tp) mesh; fsdp sharding is the ZeRO-3 equivalent.
set -euo pipefail

MODEL_PATH=${MODEL_PATH:-checkpoints/LLaVA-Video-7B-Qwen2}   # safetensors dir
DATA_YAML=${DATA_YAML:-scripts/train/multi.yaml}
OUTPUT=${OUTPUT:-checkpoints/video3d-qwen2-7b}

python -m video3d_tpu.cli train \
  --model-path "$MODEL_PATH" \
  --data-path "$DATA_YAML" \
  --output-dir "$OUTPUT" \
  --world-position-embedding-type avg-discrete-sin3d \
  --voxel-size 0.1 --min-xyz-range -15 -15 -5 --max-xyz-range 15 15 5 \
  --ground-head-type infonce \
  --frame-sampling-strategy mc-ratio90 \
  --max-frame-num 32 \
  --num-epochs 1 \
  --per-device-batch-size 1 \
  --gradient-accumulation-steps 2 \
  --global-batch-size 16 \
  --learning-rate 1e-5 \
  --mm-vision-tower-lr 2e-6 \
  --warmup-ratio 0.03 \
  --group-by task_length \
  --max-len 8192 \
  --dp 1 --tp 1
