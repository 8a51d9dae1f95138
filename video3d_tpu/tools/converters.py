"""Benchmark -> LLaVA-style dataset converters (offline ETL).

One function per benchmark, reproducing the reference converters'
record schema and prompt templates exactly:
  ScanQA        scripts/3d/preprocessing/process_scanqa.py:21-57
  SQA3D         process_sqa3d.py:6-67
  ScanRefer     process_scanrefer.py:88-135 (+ unique/multiple labels :24-55)
  Scan2Cap      process_scan2cap.py:64-160
  Multi3DRefer  process_multi3drefer.py:50-87
"""

from __future__ import annotations

import csv
import json
import os
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from video3d_tpu.ops.box import box3d_iou, convert_pc_to_box

VALID_SEMANTIC_MAPPING = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24,
                          28, 33, 34, 36, 39]  # skip floor, wall, ceiling

SCANREFER_CLS_TEMPLATE = ("<image>Identify the object according to the "
                          "following description.\n{desc}")
MULTI3DREFER_TEMPLATE = ("<image>Identify the object according to the "
                         "following description.\n{desc}\nThere may be no "
                         "corresponding object, or there may be one or more "
                         "objects.")
SCAN2CAP_TEMPLATE = ("<image> Given an object located at <coord> , "
                     "describe the object in detail.")


def load_scene_boxes(pth_path: str) -> Dict[str, tuple]:
    """pcd_with_object_aabbs .pth -> {object_id: (cx, cy, cz, sx, sy, sz)}
    (process_scanrefer.py:58-83)."""
    import torch

    d = torch.load(pth_path, weights_only=False)
    out = {}
    for oid, corners in zip(d["aabb_obj_ids"].tolist(),
                            d["aabb_corner_xyz"].tolist()):
        arr = np.asarray(corners)
        mn, mx = arr.min(axis=0), arr.max(axis=0)
        c, s = (mn + mx) / 2, mx - mn
        out[str(int(oid))] = (*c.tolist(), *s.tolist())
    return out


def get_semantic_mapping_file(file_path: str, mapping_name: str = "nyu40") -> Dict[str, int]:
    col = {"nyu40": 4, "eigen13": 5, "mpcat40": 16}[mapping_name]
    label_mapping = {}
    with open(file_path) as f:
        reader = csv.reader(f, delimiter="\t")
        next(reader)
        for line in reader:
            label_mapping[line[1]] = int(line[col])
    return label_mapping


def add_unique_multiple_labels(records: List[dict],
                               label_mapping: Dict[str, int],
                               valid=VALID_SEMANTIC_MAPPING) -> None:
    """Tag each ScanRefer record 'unique'/'multiple' in place
    (process_scanrefer.py:24-55)."""
    obj_cache, sem_cache = {}, defaultdict(int)

    def sem_of(item):
        name = item["object_name"].replace("_", " ")
        label = label_mapping.get(name, 39)
        return label if label in valid else 39

    for item in records:
        key = (item["scene_id"], item["object_id"])
        if key in obj_cache:
            continue
        sem_cache[(item["scene_id"], sem_of(item))] += 1
        obj_cache[key] = True
    for item in records:
        item["eval_type"] = ("unique"
                             if sem_cache[(item["scene_id"], sem_of(item))] == 1
                             else "multiple")


def convert_scanqa(scanqa_dir: str, output_dir: str) -> None:
    for split in ("train", "val"):
        with open(os.path.join(scanqa_dir, f"ScanQA_v1.0_{split}.json")) as f:
            in_data = json.load(f)
        out_data = []
        for data in in_data:
            for idx, answer in enumerate(data["answers"]):
                out = {
                    "id": f"scanqa_{data['question_id']}_{idx}",
                    "video": f"scannet/{data['scene_id']}",
                    "conversations": [
                        {"value": f"<image> {data['question']} Answer the "
                                  "question simply.", "from": "human"},
                        {"value": answer, "from": "gpt"},
                    ],
                    "metadata": {"dataset": "scanQA", "question_type": "unknow"},
                }
                if split == "val":
                    out["metadata"]["answers"] = data["answers"]
                    out_data.append(out)
                    break
                out_data.append(out)
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, f"scanqa_{split}_llava_style.json"), "w") as f:
            json.dump(out_data, f)


def sqa_question_type(question: str) -> str:
    q = question.lstrip().lower()
    for prefix in ("what", "is", "how", "can", "which"):
        if q.startswith(prefix):
            return prefix
    return "others"


def convert_sqa3d(sqa3d_dir: str, output_dir: str) -> None:
    for split in ("train", "val", "test"):
        with open(os.path.join(sqa3d_dir, "balanced",
                               f"v1_balanced_questions_{split}_scannetv2.json")) as f:
            qid2ques = {q["question_id"]: q for q in json.load(f)["questions"]}
        with open(os.path.join(sqa3d_dir, "balanced",
                               f"v1_balanced_sqa_annotations_{split}_scannetv2.json")) as f:
            annotations = json.load(f)["annotations"]
        out = []
        for item in annotations:
            ques = qid2ques[item["question_id"]]
            situations = (ques["alternative_situation"] + [ques["situation"]]
                          if split == "train" else [ques["situation"]])
            assert len(item["answers"]) == 1
            for situation in situations:
                out.append({
                    "id": item["question_id"],
                    "video": f"scannet/{item['scene_id']}",
                    "conversations": [
                        {"value": f"<image> {situation} {ques['question']} "
                                  "Answer the question using a single word or "
                                  "phrase.", "from": "human"},
                        {"value": item["answers"][0]["answer"], "from": "gpt"},
                    ],
                    "metadata": {"dataset": "sqa3d",
                                 "question_type": sqa_question_type(ques["question"])},
                })
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, f"sqa3d_{split}_llava_style.json"), "w") as f:
            json.dump(out, f)


def convert_scanrefer(scanrefer_dir: str, scannet_dir: str, output_dir: str,
                      label_mapping_file: Optional[str] = None) -> None:
    for split in ("train", "val"):
        path = os.path.join(scanrefer_dir, f"ScanRefer_filtered_{split}.json")
        with open(path) as f:
            data = json.load(f)
        if label_mapping_file and "eval_type" not in data[0]:
            add_unique_multiple_labels(data, get_semantic_mapping_file(label_mapping_file))
        out, scan2box = [], {}
        for i, item in enumerate(data):
            scene_id = item["scene_id"]
            if scene_id not in scan2box:
                scan2box[scene_id] = load_scene_boxes(os.path.join(
                    scannet_dir, "pcd_with_object_aabbs", split, f"{scene_id}.pth"))
            out.append({
                "id": i,
                "video": f"scannet/{scene_id}",
                "conversations": [
                    {"value": SCANREFER_CLS_TEMPLATE.format(
                        desc=item["description"].capitalize()), "from": "human"},
                    {"value": "<ground>", "from": "gpt"},
                ],
                "box": scan2box[scene_id][item["object_id"]],
                "metadata": {"dataset": "scanrefer",
                             "question_type": item["eval_type"],
                             "ann_id": item["ann_id"],
                             "object_id": item["object_id"]},
            })
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, f"scanrefer_vg_{split}_llava_style.json"), "w") as f:
            json.dump(out, f)


def convert_multi3drefer(multi3drefer_dir: str, scannet_dir: str,
                         output_dir: str) -> None:
    for split in ("train", "val"):
        with open(os.path.join(multi3drefer_dir, f"multi3drefer_{split}.json")) as f:
            data = json.load(f)
        out, scan2box = [], {}
        for i, item in enumerate(data):
            scene_id = item["scene_id"]
            if scene_id not in scan2box:
                scan2box[scene_id] = load_scene_boxes(os.path.join(
                    scannet_dir, "pcd_with_object_aabbs", split, f"{scene_id}.pth"))
            out.append({
                "id": i,
                "video": f"scannet/{scene_id}",
                "conversations": [
                    {"value": MULTI3DREFER_TEMPLATE.format(
                        desc=item["description"].capitalize()), "from": "human"},
                    {"value": "<ground>", "from": "gpt"},
                ],
                "box": [scan2box[scene_id][str(oid)] for oid in item["object_ids"]],
                "metadata": {"dataset": "multi3drefer",
                             "question_type": item["eval_type"],
                             "ann_id": item["ann_id"],
                             "object_id": item["object_ids"]},
            })
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, f"multi3drefer_{split}_llava_style.json"), "w") as f:
            json.dump(out, f)


def load_pred_boxes(scannet_dir: str, scene_id: str, split: str = "val"):
    """Mask3D instance masks -> predicted boxes (process_scan2cap.py
    load_masks + extract_pred_box.py). Masks are SCIPY SPARSE npz with up to
    50 instance rows over the scene points."""
    import torch
    from scipy import sparse

    pcd = torch.load(os.path.join(scannet_dir, "pcd_with_object_aabbs", split,
                                  f"{scene_id}.pth"), weights_only=False)
    points = np.asarray(pcd["xyz"], dtype=np.float64)  # the reference's
    # color-concat promotes points to f64 before box extraction
    mask_path = os.path.join(scannet_dir, "mask", f"{scene_id}.mask.npz")
    masks = np.array(sparse.load_npz(mask_path).todense())[:50, :]
    boxes = []
    for row in masks:
        sel = points[row.astype(bool)]
        if len(sel) == 0:
            continue
        center, size = convert_pc_to_box(sel)
        boxes.append(center + size)
    return boxes


def convert_scan2cap(scanrefer_dir: str, scannet_dir: str, output_dir: str,
                     iou_threshold: float = 0.5) -> None:
    for split in ("train", "val"):
        with open(os.path.join(scanrefer_dir, f"ScanRefer_filtered_{split}.json")) as f:
            data = json.load(f)
        instance_annotations = defaultdict(list)
        if split == "val":
            for item in data:
                key = f"{item['scene_id']}|{item['object_id']}|{item['object_name']}"
                instance_annotations[key].append(item["description"])

        out, scan2box, scan2pred, seen = [], {}, {}, set()
        n_miss = 0
        for i, item in enumerate(data):
            scene_id = item["scene_id"]
            key = f"{scene_id}|{item['object_id']}|{item['object_name']}"
            if split != "train" and key in seen:
                continue
            seen.add(key)
            if scene_id not in scan2box:
                scan2box[scene_id] = load_scene_boxes(os.path.join(
                    scannet_dir, "pcd_with_object_aabbs", split, f"{scene_id}.pth"))
            gt_box = list(scan2box[scene_id][item["object_id"]])

            box_input = gt_box
            if split == "val":
                if scene_id not in scan2pred:
                    scan2pred[scene_id] = load_pred_boxes(scannet_dir, scene_id, split)
                select, max_iou = None, 0.0
                for b in scan2pred[scene_id]:
                    iou = float(box3d_iou(np.asarray(b), np.asarray(gt_box)))
                    if iou >= iou_threshold and iou > max_iou:
                        select, max_iou = list(b), iou
                box_input = select
                if select is None:
                    n_miss += 1

            rec = {
                "id": i,
                "video": f"scannet/{scene_id}",
                "conversations": [
                    {"value": SCAN2CAP_TEMPLATE, "from": "human"},
                    {"value": item["description"].capitalize(), "from": "gpt"},
                ],
                "box_input": box_input,
                "gt_box": gt_box,
                "metadata": {"dataset": "scan2cap",
                             "question_type": item["eval_type"],
                             "ann_id": item["ann_id"],
                             "object_id": item["object_id"]},
            }
            if split == "val":
                rec["annotations"] = instance_annotations[key]
            out.append(rec)
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, f"scan2cap_{split}_llava_style.json"), "w") as f:
            json.dump(out, f)
        print(f"[scan2cap {split}] {len(out)} items, {n_miss} without matched pred box")
