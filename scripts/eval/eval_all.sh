#!/usr/bin/env bash
# Run one benchmark: ./eval_all.sh <task> <ckpt> [sampling] [max_frames]
# Equivalent of the reference scripts/3d/eval/eval_{task}.sh (8 GPUs via Ray):
# stripe question lists over host processes with --rank/--world instead.
set -euo pipefail

TASK=${1:?scanqa|sqa3d|scan2cap|scanrefer|multi3drefer}
CKPT=${2:?checkpoint dir}
SAMPLING=${3:-uniform}        # uniform | mc-ratio90 | mc-ratio95
MAX_FRAMES=${4:-32}
WORLD=${WORLD:-1}

declare -A QFILE=(
  [scanqa]=data/processed/scanqa_val_llava_style.json
  [sqa3d]=data/processed/sqa3d_test_llava_style.json
  [scan2cap]=data/processed/scan2cap_val_llava_style.json
  [scanrefer]=data/processed/scanrefer_vg_val_llava_style.json
  [multi3drefer]=data/processed/multi3drefer_val_llava_style.json
)

OUT="results/${TASK}/${SAMPLING}_${MAX_FRAMES}.jsonl"
mkdir -p "results/${TASK}"

for ((RANK = 0; RANK < WORLD; RANK++)); do
  python -m video3d_tpu.cli "eval-${TASK}" \
    --model-path "$CKPT" \
    --question-file "${QFILE[$TASK]}" \
    --answer-file "$OUT" \
    --frame-sampling-strategy "$SAMPLING" \
    --max-frame-num "$MAX_FRAMES" \
    --rank "$RANK" --world "$WORLD" &
done
wait

python - "$TASK" "$OUT" <<'EOF'
import json, sys
from video3d_tpu.eval import protocols

task, path = sys.argv[1], sys.argv[2]
records = [json.loads(l) for l in open(path)]
if task == "scanqa":
    id2ans = {}
    for item in json.load(open("data/processed/scanqa_val_llava_style.json")):
        id2ans[item["id"]] = item["metadata"]["answers"]
    out = protocols.scanqa_metrics(records, id2ans)
elif task == "sqa3d":
    out = protocols.sqa3d_metrics(records)
elif task == "scan2cap":
    out = protocols.scan2cap_metrics(records)
elif task == "scanrefer":
    out = protocols.scanrefer_metrics(records)
else:
    out = protocols.multi3drefer_metrics(records)
for k, v in out.items():
    print(f"{k}: {v}")
EOF
