"""Scene packing: bundle per-frame depth PNGs + pose txts into one
compressed npz per scene.

SURVEY.md §7 flags the reference's per-frame PNG + txt reads as the host
bottleneck ("need prefetching/caching (e.g. array-record packing)"). A pack
holds every frame's depth (uint16) and axis-aligned pose for a scene, so a
32-frame sample costs one file open + one decompress instead of 64 small
reads. ``VideoProcessor`` picks packs up automatically when
``DataConfig.packed_dir`` is set.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional, Sequence

import numpy as np


def pack_scene(video_processor, video_id: str, out_dir: str,
               compress: bool = False) -> str:
    """Pack all frames of one scene. Returns the pack path.

    Uncompressed by default: zlib decompression dominates packed reads
    (measured 65 vs 1844 frames/s on one core, scripts/bench/
    host_pipeline.py) while the size win is small — the depth PNGs remain
    the compressed archival copy. Pass ``compress=True`` (--compress) when
    disk is the constraint."""
    meta = video_processor.scene[video_id]
    frame_files = [os.path.join(video_processor.cfg.video_folder, img["img_path"])
                   for img in meta["images"]]
    depths, intrinsic, poses = video_processor.load_frame_geometry(
        video_id, frame_files)
    names = np.asarray([os.path.basename(f) for f in frame_files])
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{video_id.split('/')[-1]}.npz")
    save = np.savez_compressed if compress else np.savez
    save(path, depths=depths.astype(np.uint16),
         intrinsic=intrinsic.astype(np.float32),
         poses=poses.astype(np.float32), names=names)
    return path


class ScenePack:
    """Reader with per-scene caching (one open per scene per worker)."""

    def __init__(self, packed_dir: str):
        self.packed_dir = packed_dir
        self._cache: Dict[str, dict] = {}

    def path_for(self, video_id: str) -> str:
        return os.path.join(self.packed_dir, f"{video_id.split('/')[-1]}.npz")

    def has(self, video_id: str) -> bool:
        return os.path.exists(self.path_for(video_id))

    def load(self, video_id: str) -> dict:
        if video_id not in self._cache:
            with np.load(self.path_for(video_id)) as z:
                self._cache.clear()          # keep at most one scene resident
                self._cache[video_id] = {
                    "depths": z["depths"],
                    "intrinsic": z["intrinsic"],
                    "poses": z["poses"],
                    "index": {n: i for i, n in enumerate(z["names"].tolist())},
                }
        return self._cache[video_id]

    def frame_geometry(self, video_id: str, frame_files: Sequence[str]):
        """Same contract as VideoProcessor.load_frame_geometry."""
        pack = self.load(video_id)
        idx = [pack["index"][os.path.basename(f)] for f in frame_files]
        return (pack["depths"][idx].astype(np.int32), pack["intrinsic"],
                pack["poses"][idx])


def main(argv=None):
    from video3d_tpu.config import DataConfig
    from video3d_tpu.data.video_processor import VideoProcessor

    parser = argparse.ArgumentParser()
    parser.add_argument("--video-folder", default="data")
    parser.add_argument("--annotation-dir", default="data/embodiedscan")
    parser.add_argument("--metadata-dir", default="data/metadata")
    parser.add_argument("--out-dir", default="data/metadata/packed")
    parser.add_argument("--compress", action="store_true",
                        help="zlib-compress packs (slower reads; see "
                             "pack_scene docstring)")
    args = parser.parse_args(argv)

    cfg = DataConfig(video_folder=args.video_folder,
                     annotation_dir=args.annotation_dir,
                     metadata_dir=args.metadata_dir)
    vp = VideoProcessor(cfg)
    for video_id in vp.scene:
        print(pack_scene(vp, video_id, args.out_dir,
                         compress=args.compress))


if __name__ == "__main__":
    main()
