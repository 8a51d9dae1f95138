"""GT / predicted per-scene box-list json emitters (offline ETL).

Reproduces:
  * ``scannet_{split}_gt_box.json`` — per-scene object AABBs (center+size)
    ordered by object id (extract_gt_box.py:27-78);
  * ``scannet_val_pred_box.json`` — boxes from Mask3D instance masks, top-50
    rows (extract_pred_box.py:27-120).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

import numpy as np

from video3d_tpu.ops.box import convert_pc_to_box
from video3d_tpu.tools.converters import load_scene_boxes


def extract_gt_boxes(scannet_dir: str, split: str, output_file: str) -> Dict[str, list]:
    """Per-scene gt box lists in STORAGE order (extract_gt_box.py:66-78):
    the list index must equal the object id, so scenes whose stored ids are
    not exactly 0..N-1 are dropped, exactly like the reference — grounding
    labels index into this list by object_id."""
    d = os.path.join(scannet_dir, "pcd_with_object_aabbs", split)
    out: Dict[str, list] = {}
    for fname in sorted(os.listdir(d)):
        if not fname.endswith(".pth"):
            continue
        scene_id = fname[:-4]
        boxes = load_scene_boxes(os.path.join(d, fname))   # insertion-ordered
        ids = list(boxes.keys())
        if any(i != int(j) for i, j in enumerate(ids)):
            print(f"[extract_gt_boxes] dropping {scene_id}: "
                  f"non-consecutive object ids")
            continue
        out[f"scannet/{scene_id}"] = [list(v) for v in boxes.values()]
    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    with open(output_file, "w") as f:
        json.dump(out, f)
    return out


def extract_pred_boxes(scannet_dir: str, split: str, output_file: str,
                       top_k: int = 50) -> Dict[str, list]:
    import torch
    from scipy import sparse

    pcd_dir = os.path.join(scannet_dir, "pcd_with_object_aabbs", split)
    mask_dir = os.path.join(scannet_dir, "mask")
    out: Dict[str, list] = {}
    for fname in sorted(os.listdir(pcd_dir)):
        if not fname.endswith(".pth"):
            continue
        scene_id = fname[:-4]
        mask_path = os.path.join(mask_dir, f"{scene_id}.mask.npz")
        if not os.path.exists(mask_path):
            continue
        try:
            pcd = torch.load(os.path.join(pcd_dir, fname), weights_only=False)
            points = np.asarray(pcd["xyz"], dtype=np.float64)
            masks = np.array(sparse.load_npz(mask_path).todense())[:top_k, :]
            boxes: List[list] = []
            # box index MUST equal the mask row index (the eval drivers pair
            # scores with boxes positionally); an empty row crashes and drops
            # the whole scene, exactly like the reference (:84-92)
            for row in masks:
                center, size = convert_pc_to_box(points[row.astype(bool)])
                boxes.append(center + size)
            out[f"scannet/{scene_id}"] = boxes
        except Exception as e:  # noqa: BLE001
            print(f"[extract_pred_boxes] dropping {scene_id}: {e}")
    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    with open(output_file, "w") as f:
        json.dump(out, f)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--scannet-dir", default="data/scannet")
    parser.add_argument("--split", default="train")
    parser.add_argument("--kind", choices=("gt", "pred"), default="gt")
    parser.add_argument("--output-file", required=True)
    args = parser.parse_args(argv)
    if args.kind == "gt":
        extract_gt_boxes(args.scannet_dir, args.split, args.output_file)
    else:
        extract_pred_boxes(args.scannet_dir, args.split, args.output_file)


if __name__ == "__main__":
    main()
