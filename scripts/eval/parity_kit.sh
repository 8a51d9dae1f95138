#!/usr/bin/env bash
# One-command real-weights parity kit (VERDICT r3 #8).
#
# The day a pretrained Video-3D-LLM checkpoint + ScanNet data exist,
# nothing should stand between them and a CIDEr number:
#
#   bash scripts/eval/parity_kit.sh <hf-checkpoint> <data-root> [tasks...]
#
# mirrors the reference's scripts/3d/eval/eval_*.sh chain (model-path +
# video-folder + embodiedscan-folder + processed question file per task,
# eval_scanqa.sh:10-21) end to end: checkpoint sanity -> (optional) raw
# ETL via scripts/preprocessing/prepare_data.sh -> per-task striped eval
# -> metric JSONs -> expected-artifact checks. Exit 0 iff every selected
# task produced non-empty answers and its expected metric keys.
#
# Layout expectations under <data-root> (the reference's data/ layout):
#   posed_images/ or packed scenes     — scene frames (video folder)
#   embodiedscan/                      — per-scene annotations
#   metadata/                          — boxes, select-frames, voxel sets
#   processed/<task>_..._llava_style.json — question files (run
#       scripts/preprocessing/prepare_data.sh first if missing and raw
#       benchmark downloads are present)
#
# Env knobs:
#   SAMPLING   (default mc-ratio95)   frame sampling strategy
#   MAX_FRAMES (default 32)           frames per scene
#   WORLD      (default 1)            host processes (question striping)
#   OUT_DIR    (default results/parity_kit)
#   EXTRA_FLAGS                       appended to every eval invocation
#       (the CI rehearsal passes e.g. "--max-new-tokens 4"; pass
#       "--load-format dummy" to rehearse an architecture with no
#       weights on disk)
set -uo pipefail
cd "$(dirname "$0")/../.."

CKPT=${1:?usage: parity_kit.sh <hf-checkpoint> <data-root> [tasks...]}
DATA=${2:?usage: parity_kit.sh <hf-checkpoint> <data-root> [tasks...]}
shift 2
TASKS=("$@")
[ ${#TASKS[@]} -eq 0 ] && TASKS=(scanqa sqa3d scan2cap scanrefer multi3drefer)

SAMPLING=${SAMPLING:-mc-ratio95}
MAX_FRAMES=${MAX_FRAMES:-32}
WORLD=${WORLD:-1}
OUT_DIR=${OUT_DIR:-results/parity_kit}
EXTRA_FLAGS=${EXTRA_FLAGS:-}

fail=0
note() { echo "parity_kit: $*"; }
err()  { echo "parity_kit: ERROR: $*" >&2; fail=1; }

# ---- 1. checkpoint sanity -------------------------------------------------
if [ ! -f "$CKPT/config.json" ]; then
    err "$CKPT/config.json missing — not an HF checkpoint dir"
fi
case " $EXTRA_FLAGS " in *" --load-format dummy "*|*"--load-format=dummy"*)
    note "dummy load format: weight files not required" ;;
*)
    if ! compgen -G "$CKPT/*.safetensors" >/dev/null && \
       ! compgen -G "$CKPT/*.bin" >/dev/null && \
       ! [ -d "$CKPT/model" ]; then
        err "$CKPT has neither safetensors/bin shards nor an orbax model/"
    fi ;;
esac

# ---- 2. data layout (+ optional raw ETL) ----------------------------------
PROCESSED="$DATA/processed"
declare -A QFILE=(
  [scanqa]="$PROCESSED/scanqa_val_llava_style.json"
  [sqa3d]="$PROCESSED/sqa3d_test_llava_style.json"
  [scan2cap]="$PROCESSED/scan2cap_val_llava_style.json"
  [scanrefer]="$PROCESSED/scanrefer_vg_val_llava_style.json"
  [multi3drefer]="$PROCESSED/multi3drefer_val_llava_style.json"
)
missing_q=0
for t in "${TASKS[@]}"; do
    [ -f "${QFILE[$t]}" ] || missing_q=1
done
if [ $missing_q -eq 1 ] && [ -d "$DATA/benchmark" ]; then
    note "processed question files missing — running the raw ETL"
    SCANNET="$DATA/scannet" BENCH="$DATA/benchmark" META="$DATA/metadata" \
        PROCESSED="$PROCESSED" bash scripts/preprocessing/prepare_data.sh \
        || err "prepare_data.sh failed"
fi
for d in embodiedscan metadata; do
    [ -d "$DATA/$d" ] || err "$DATA/$d missing"
done

# ---- 3. per-task eval + metrics ------------------------------------------
mkdir -p "$OUT_DIR"
for t in "${TASKS[@]}"; do
    q=${QFILE[$t]}
    if [ ! -f "$q" ]; then
        err "$t: question file $q missing — skipping"
        continue
    fi
    ans="$OUT_DIR/${t}_${SAMPLING}_${MAX_FRAMES}.jsonl"
    rm -f "$ans"
    note "eval $t: $(python -c "import json,sys;print(len(json.load(open(sys.argv[1]))))" "$q") questions, world=$WORLD"
    rc=0
    pids=()
    for ((RANK = 0; RANK < WORLD; RANK++)); do
        # shellcheck disable=SC2086
        python -m video3d_tpu.cli "eval-${t}" \
            --model-path "$CKPT" \
            --question-file "$q" \
            --answer-file "$ans" \
            --video-folder "$DATA" \
            --embodiedscan-folder "$DATA/embodiedscan" \
            --metadata-folder "$DATA/metadata" \
            --frame-sampling-strategy "$SAMPLING" \
            --max-frame-num "$MAX_FRAMES" \
            --rank "$RANK" --world "$WORLD" $EXTRA_FLAGS &
        pids+=($!)
    done
    # bare `wait` always returns 0 — collect each rank's status
    for pid in "${pids[@]}"; do
        wait "$pid" || rc=1
    done
    [ $rc -ne 0 ] && { err "$t: eval process failed"; continue; }

    metrics="$OUT_DIR/${t}_metrics.json"
    python - "$t" "$ans" "$q" "$metrics" <<'EOF'
import json
import sys

from video3d_tpu.eval import protocols

task, ans_path, q_path, out_path = sys.argv[1:5]
records = [json.loads(line) for line in open(ans_path)]
if task == "scanqa":
    id2ans = {item["id"]: item["metadata"]["answers"]
              for item in json.load(open(q_path))}
    out = protocols.scanqa_metrics(records, id2ans)
elif task == "sqa3d":
    out = protocols.sqa3d_metrics(records)
elif task == "scan2cap":
    out = protocols.scan2cap_metrics(records)
elif task == "scanrefer":
    out = protocols.scanrefer_metrics(records)
else:
    out = protocols.multi3drefer_metrics(records)
json.dump({k: (float(v) if isinstance(v, (int, float)) else v)
          for k, v in out.items()}, open(out_path, "w"), indent=2,
          default=str)
print(json.dumps(out, default=float))
EOF
    [ $? -ne 0 ] && { err "$t: metric computation failed"; continue; }

    # ---- 4. expected-artifact checks ----
    python - "$t" "$ans" "$q" "$metrics" <<'EOF' || fail=1
import json
import sys

task, ans_path, q_path, metrics_path = sys.argv[1:5]
records = [json.loads(line) for line in open(ans_path)]
nq = len(json.load(open(q_path)))
assert records, f"{task}: empty answer file"
assert len(records) == nq, f"{task}: {len(records)} answers != {nq} questions"
need_rec = {"scanqa": ("sample_id", "pred_response"),
            "sqa3d": ("sample_id", "pred_response", "question_type"),
            "scan2cap": ("sample_id", "pred_response", "gt_response"),
            "scanrefer": ("sample_id", "pred_response", "gt_response"),
            "multi3drefer": ("sample_id",)}[task]
for key in need_rec:
    assert all(key in r for r in records), f"{task}: records missing {key!r}"
metrics = json.load(open(metrics_path))
need_met = {
    "scanqa": ("CIDEr", "BLEU-4", "METEOR", "ROUGE-L", "EM"),
    "sqa3d": ("all",),
    "scan2cap": ("CIDEr", "BLEU-4", "METEOR", "ROUGE-L"),
    "scanrefer": ("all@0.25", "all@0.5"),
    "multi3drefer": ("all@F1_0.25", "all@F1_0.5"),
}[task]
for key in need_met:
    assert any(key.lower() == k.lower() for k in metrics), \
        f"{task}: metric {key!r} missing from {sorted(metrics)}"
print(f"parity_kit: {task} artifacts OK "
      f"({len(records)} answers, metrics: {sorted(metrics)})")
EOF
done

if [ $fail -eq 0 ]; then
    note "ALL CHECKS PASSED — metric JSONs in $OUT_DIR/"
else
    err "one or more checks failed"
fi
exit $fail
