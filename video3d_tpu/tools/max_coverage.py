"""Offline maximum-coverage frame selection + scene voxel sets.

Reproduces two artifacts:
  * ``pcd_discrete_{voxel}.pkl`` — per-scene unique voxel tuples of the scene
    point cloud (convert_pcd_to_voxel.py:58-82);
  * ``scannet_select_frames.json`` — greedy set-cover frame ordering per
    scene with per-pick new-voxel counts (max_coverage_sampling.py:11-120).

The per-frame voxelization (unproject every 2nd frame at full resolution,
round to voxel ids) runs on the TPU via the fused geometry ops; the greedy
cover itself is integer set arithmetic on host, exactly as the reference
(ties broken uniformly at random, <=32 picks).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import random
from typing import Dict, List, Sequence, Set, Tuple

import numpy as np

import jax.numpy as jnp

from video3d_tpu.config import DataConfig
from video3d_tpu.data.video_processor import VideoProcessor
from video3d_tpu.ops import geometry


def voxelize_pointcloud(points: np.ndarray, voxel_size: float = 0.1) -> Set[tuple]:
    """Point cloud -> set of voxel tuples (convert_pcd_to_voxel.py:58-82:
    round(xyz / voxel), no range clamp)."""
    vox = np.round(np.asarray(points)[:, :3] / voxel_size).astype(np.int64)
    return set(map(tuple, np.unique(vox, axis=0)))


def frame_voxel_sets(vp: VideoProcessor, video_id: str,
                     frame_files: Sequence[str],
                     voxel_size: float = 0.1,
                     chunk: int = 8) -> Dict[str, Set[tuple]]:
    """Per-frame unique voxel sets from full-resolution world coords
    (max_coverage_sampling.py:30-50: xyz / voxel, round — no clamp/offset)."""
    out: Dict[str, Set[tuple]] = {}
    for s in range(0, len(frame_files), chunk):
        files = frame_files[s:s + chunk]
        depths, intr, poses = vp.load_frame_geometry(video_id, files)
        wc = geometry.unproject(jnp.asarray(intr), jnp.asarray(poses),
                                jnp.asarray(depths))
        vox = np.asarray(jnp.round(wc / voxel_size)).astype(np.int64)
        for f, v in zip(files, vox):
            out[f] = set(map(tuple, np.unique(v.reshape(-1, 3), axis=0)))
    return out


def greedy_max_coverage(frame_voxels: Dict[str, Set[tuple]],
                        pc_voxel: Set[tuple], max_frames: int = 32,
                        rng: random.Random = None) -> Tuple[List[str], List[int]]:
    """Greedy set cover over scene voxels (max_coverage_sampling.py:68-94)."""
    rng = rng or random.Random()
    remaining = dict(frame_voxels)
    # pre-intersect with the scene cloud once
    inter = {f: v & pc_voxel for f, v in remaining.items()}
    used: Set[tuple] = set()
    order: List[str] = []
    voxel_nums: List[int] = []
    for _ in range(len(remaining)):
        best_v, best = -1, []
        for f, cur in inter.items():
            n_new = len(cur) - len(used & cur)
            if n_new > best_v:
                best_v, best = n_new, [f]
            elif n_new == best_v:
                best.append(f)
        pick = rng.choice(best)
        used.update(frame_voxels[pick])
        order.append(pick)
        voxel_nums.append(best_v)
        inter.pop(pick)
        if len(order) >= max_frames:
            break
    return order, voxel_nums


def build_select_frames(data_cfg: DataConfig, pcd_voxel_pkl: str,
                        output_file: str, voxel_size: float = 0.1,
                        scene_ids: Sequence[str] = None,
                        seed: int = 0) -> List[dict]:
    with open(pcd_voxel_pkl, "rb") as f:
        pc_data = pickle.load(f)

    vp = VideoProcessor(data_cfg)
    rng = random.Random(seed)
    all_data = []
    scene_ids = scene_ids or [v.split("/")[-1] for v in vp.scene]
    for scene_id in scene_ids:
        video_id = f"scannet/{scene_id}"
        meta = vp.scene[video_id]
        frame_files = [os.path.join(vp.cfg.video_folder, img["img_path"])
                       for img in meta["images"]][::2]
        if len(frame_files) < 32:
            frame_files = [os.path.join(vp.cfg.video_folder, img["img_path"])
                           for img in meta["images"]]
        fv = frame_voxel_sets(vp, video_id, frame_files, voxel_size)
        pc_voxel = set(map(tuple, pc_data[scene_id]))
        all_voxel: Set[tuple] = set()
        for v in fv.values():
            all_voxel.update(v)
        order, voxel_nums = greedy_max_coverage(fv, pc_voxel, 32, rng)
        used = set()
        for f in order:
            used.update(fv[f])
        all_data.append({
            "video_id": video_id,
            "frame_files": order,
            "voxel_nums": voxel_nums,
            "num_all_voxels": len(all_voxel & pc_voxel),
            "num_select_voxels": len(used & pc_voxel),
        })
    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    with open(output_file, "w") as f:
        json.dump(all_data, f)
    return all_data


def build_pcd_voxels(scannet_dir: str, output_file: str,
                     voxel_size: float = 0.1,
                     splits=("train", "val")) -> Dict[str, list]:
    """pcd .pth files -> per-scene voxel tuple lists pkl
    (convert_pcd_to_voxel.py)."""
    import torch

    out: Dict[str, list] = {}
    for split in splits:
        d = os.path.join(scannet_dir, "pcd_with_object_aabbs", split)
        if not os.path.isdir(d):
            continue
        for fname in sorted(os.listdir(d)):
            if not fname.endswith(".pth"):
                continue
            data = torch.load(os.path.join(d, fname), weights_only=False)
            scene_id = fname[:-4]
            out[scene_id] = sorted(voxelize_pointcloud(np.asarray(data["xyz"]),
                                                       voxel_size))
    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    with open(output_file, "wb") as f:
        pickle.dump(out, f)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--video-folder", default="data")
    parser.add_argument("--annotation-dir", default="data/embodiedscan")
    parser.add_argument("--metadata-dir", default="data/metadata")
    parser.add_argument("--voxel-size", type=float, default=0.1)
    parser.add_argument("--output-file",
                        default="data/metadata/scannet_select_frames.json")
    args = parser.parse_args(argv)

    cfg = DataConfig(video_folder=args.video_folder,
                     annotation_dir=args.annotation_dir,
                     metadata_dir=args.metadata_dir)
    pkl = os.path.join(args.metadata_dir, f"pcd_discrete_{args.voxel_size}.pkl")
    build_select_frames(cfg, pkl, args.output_file, args.voxel_size)


if __name__ == "__main__":
    main()
