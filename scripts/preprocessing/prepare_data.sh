#!/usr/bin/env bash
# Full offline ETL pipeline (reference scripts/3d/preprocessing/*).
# Inputs: raw ScanNet scans + benchmark downloads under data/.
set -euo pipefail

SCANNET=${SCANNET:-data/scannet}
BENCH=${BENCH:-data/benchmark}
META=${META:-data/metadata}
PROCESSED=${PROCESSED:-data/processed}
LABELS=${LABELS:-data/scannetv2-labels.combined.tsv}

# 1. .sens -> posed images (color jpg + depth png + pose txt)
python -m video3d_tpu.tools.sens_extractor \
  --scans-dir "$SCANNET/scans" --output-dir "$SCANNET/posed_images"

# 2. mesh -> point cloud + instance AABBs (.pth per scene)
for SPLIT in train val; do
  python -m video3d_tpu.tools.extract_pcd \
    --scannet-dir "$SCANNET" --output-dir "$SCANNET/pcd_with_object_aabbs" \
    --split-file "data/splits/scannetv2_${SPLIT}.txt" --split "$SPLIT" \
    --label-mapping-file "$LABELS"
done

# 3. gt / predicted box lists
python -m video3d_tpu.tools.extract_boxes --scannet-dir "$SCANNET" \
  --split train --kind gt --output-file "$META/scannet_train_gt_box.json"
python -m video3d_tpu.tools.extract_boxes --scannet-dir "$SCANNET" \
  --split val --kind pred --output-file "$META/scannet_val_pred_box.json"

# 4. scene voxel sets + greedy max-coverage frame ordering
python - <<EOF
from video3d_tpu.tools.max_coverage import build_pcd_voxels
build_pcd_voxels("$SCANNET", "$META/pcd_discrete_0.1.pkl")
EOF
python -m video3d_tpu.tools.max_coverage \
  --video-folder data --metadata-dir "$META" \
  --output-file "$META/scannet_select_frames.json"

# 5. benchmark -> LLaVA-style converters
python - <<EOF
from video3d_tpu.tools import converters as c
c.convert_scanqa("$BENCH/scanqa", "$PROCESSED")
c.convert_sqa3d("$BENCH/sqa_task", "$PROCESSED")
c.convert_scanrefer("$BENCH/scanrefer", "$SCANNET", "$PROCESSED", "$LABELS")
c.convert_scan2cap("$BENCH/scanrefer", "$SCANNET", "$PROCESSED")
c.convert_multi3drefer("$BENCH/multi3drefer", "$SCANNET", "$PROCESSED")
EOF
