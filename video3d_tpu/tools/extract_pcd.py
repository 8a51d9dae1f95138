"""ScanNet mesh -> point cloud + instance AABBs extractor (offline ETL).

Port of extract_scannet_pcd.py (reference, itself from M3DRef-CLIP's
preprocess_all_data.py) without the open3d dependency: a pure-numpy binary
PLY reader for ``_vh_clean_2.ply``, axis-align transform from the scene meta
txt, nyu40 semantic mapping from ``scannetv2-labels.combined.tsv``, instance
ids from the seg/aggregation jsons, per-instance AABB corners, saved as the
same ``{scene}.pth`` torch dict the rest of the pipeline consumes.

Vertex normals follow open3d's convention: area-weighted face normals
accumulated per vertex, then L2-normalized.
"""

from __future__ import annotations

import argparse
import json
import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from video3d_tpu.tools.converters import get_semantic_mapping_file

INVALID_IDS = [1, 2, 22]      # wall, floor, ceiling (reference main())
VALID_SEMANTIC_MAPPING = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24,
                          28, 33, 34, 36, 39]

_PLY_DTYPES = {
    "float": ("f4", 4), "float32": ("f4", 4), "double": ("f8", 8),
    "uchar": ("u1", 1), "uint8": ("u1", 1), "char": ("i1", 1),
    "short": ("i2", 2), "ushort": ("u2", 2),
    "int": ("i4", 4), "int32": ("i4", 4), "uint": ("u4", 4),
    "uint32": ("u4", 4),
}


def read_ply(path: str) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
    """Binary-little-endian PLY -> (vertices (N,3) f32, colors (N,3) u8 or
    None, faces (M,3) i32 or None)."""
    with open(path, "rb") as f:
        assert f.readline().strip() == b"ply"
        fmt = f.readline().split()
        assert fmt[0] == b"format" and fmt[1] == b"binary_little_endian", fmt

        elements: List[Tuple[str, int, list]] = []
        cur = None
        while True:
            line = f.readline().split()
            if line[0] == b"end_header":
                break
            if line[0] == b"comment":
                continue
            if line[0] == b"element":
                cur = (line[1].decode(), int(line[2]), [])
                elements.append(cur)
            elif line[0] == b"property":
                if line[1] == b"list":
                    cur[2].append(("list", line[2].decode(), line[3].decode(),
                                   line[4].decode()))
                else:
                    cur[2].append((line[1].decode(), line[2].decode()))

        verts = colors = faces = None
        for name, count, props in elements:
            if name == "vertex":
                np_fields = [(p[1], _PLY_DTYPES[p[0]][0]) for p in props]
                arr = np.frombuffer(f.read(count * sum(
                    _PLY_DTYPES[p[0]][1] for p in props)), dtype=np_fields)
                verts = np.stack([arr["x"], arr["y"], arr["z"]], 1).astype(np.float32)
                if "red" in arr.dtype.names:
                    colors = np.stack([arr["red"], arr["green"], arr["blue"]], 1)
            elif name == "face":
                assert props[0][0] == "list"
                cnt_dt, idx_dt = (_PLY_DTYPES[props[0][1]], _PLY_DTYPES[props[0][2]])
                out = np.empty((count, 3), np.int32)
                for i in range(count):
                    n = int(np.frombuffer(f.read(cnt_dt[1]), cnt_dt[0])[0])
                    idx = np.frombuffer(f.read(n * idx_dt[1]), idx_dt[0])
                    out[i] = idx[:3]
                faces = out
        return verts, colors, faces


def compute_vertex_normals(xyz: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (open3d compute_vertex_normals)."""
    v0, v1, v2 = xyz[faces[:, 0]], xyz[faces[:, 1]], xyz[faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)                 # area-weighted
    normals = np.zeros_like(xyz)
    for k in range(3):
        np.add.at(normals, faces[:, k], fn)
    norm = np.linalg.norm(normals, axis=1, keepdims=True)
    return (normals / np.maximum(norm, 1e-12)).astype(np.float32)


def read_axis_align_matrix(path: str) -> Optional[np.ndarray]:
    with open(path) as f:
        for line in f:
            if "axisAlignment" in line:
                vals = [float(x) for x in line.strip().removeprefix(
                    "axisAlignment = ").split()]
                return np.asarray(vals).reshape(4, 4)
    return None


def read_seg_file(path: str) -> Dict[int, List[int]]:
    with open(path) as f:
        data = json.load(f)
    seg2verts: Dict[int, List[int]] = {}
    for vert, seg in enumerate(data["segIndices"]):
        seg2verts.setdefault(seg, []).append(vert)
    return seg2verts


def read_agg_file(path: str, label_map, invalid_ids=INVALID_IDS):
    object_id_to_segs, obj_name_to_segs = {}, {}
    with open(path) as f:
        data = json.load(f)
    for group in data["segGroups"]:
        name = group["label"]
        if name not in label_map:
            name = "case"
        if label_map[name] in invalid_ids:
            continue
        segments = group["segments"]
        object_id_to_segs[group["objectId"]] = segments
        obj_name_to_segs.setdefault(name, []).extend(segments)
    return object_id_to_segs, obj_name_to_segs


def get_semantic_labels(obj_name_to_segs, seg_to_verts, num_verts, label_map,
                        valid=VALID_SEMANTIC_MAPPING) -> np.ndarray:
    filtered = {vid: i for i, vid in enumerate(valid)}
    sem = np.full(num_verts, -1, np.int8)
    for label, segs in obj_name_to_segs.items():
        for seg in segs:
            verts = seg_to_verts[seg]
            if label_map[label] not in filtered:
                sem[verts] = 19
            elif label_map[label] == 22:
                sem[verts] = -1
            else:
                sem[verts] = filtered[label_map[label]]
    return sem


def get_instance_ids(object_id2segs, seg2verts, num_verts) -> np.ndarray:
    ids = np.full(num_verts, -1, np.int16)
    for object_id, segs in object_id2segs.items():
        for seg in segs:
            ids[seg2verts[seg]] = object_id
    return ids


def get_aabbs(xyz: np.ndarray, instance_ids: np.ndarray):
    uniq = np.unique(instance_ids)
    uniq = uniq[uniq != -1]
    corners = np.empty((len(uniq), 8, 3), np.float32)
    obj_ids = np.empty(len(uniq), np.int16)
    combos = np.array(np.meshgrid([0, 1], [0, 1], [0, 1], copy=False),
                      dtype=np.float32).T.reshape(-1, 3)
    for i, inst in enumerate(uniq):
        pts = xyz[instance_ids == inst]
        mn, mx = pts.min(axis=0), pts.max(axis=0)
        corners[i] = mn + (mx - mn) * combos
        obj_ids[i] = inst
    return corners, obj_ids


def process_one_scene(scene: str, scannet_dir: str, output_dir: str,
                      split: str, label_map) -> str:
    import torch

    scan_path = os.path.join(scannet_dir,
                             "scans" if split in ("train", "val") else "scans_test")
    base = os.path.join(scan_path, scene, scene)
    axis_align = read_axis_align_matrix(base + ".txt")
    xyz, rgb, faces = read_ply(base + "_vh_clean_2.ply")
    if axis_align is not None:
        h = np.concatenate([xyz, np.ones((len(xyz), 1), np.float32)], 1)
        xyz = (h @ axis_align.T.astype(np.float32))[:, :3]
    normal = compute_vertex_normals(xyz, faces) if faces is not None else None

    sem = inst = aabb_ids = aabb_xyz = None
    agg = base + ".aggregation.json"
    seg = base + "_vh_clean_2.0.010000.segs.json"
    if os.path.exists(agg) and os.path.exists(seg):
        seg2verts = read_seg_file(seg)
        object_id_to_segs, obj_name_to_segs = read_agg_file(agg, label_map)
        sem = get_semantic_labels(obj_name_to_segs, seg2verts, len(xyz), label_map)
        inst = get_instance_ids(object_id_to_segs, seg2verts, len(xyz))
        aabb_xyz, aabb_ids = get_aabbs(xyz, inst)

    os.makedirs(os.path.join(output_dir, split), exist_ok=True)
    out = os.path.join(output_dir, split, f"{scene}.pth")
    torch.save({"xyz": xyz, "rgb": rgb, "normal": normal, "sem_labels": sem,
                "instance_ids": inst, "aabb_obj_ids": aabb_ids,
                "aabb_corner_xyz": aabb_xyz}, out)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--scannet-dir", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--split-file", required=True,
                        help="txt of scene ids, one per line")
    parser.add_argument("--split", default="train")
    parser.add_argument("--label-mapping-file", required=True)
    args = parser.parse_args(argv)

    label_map = get_semantic_mapping_file(args.label_mapping_file, "nyu40")
    with open(args.split_file) as f:
        scenes = [l.strip() for l in f if l.strip()]
    for scene in scenes:
        process_one_scene(scene, args.scannet_dir, args.output_dir,
                          args.split, label_map)


if __name__ == "__main__":
    main()
