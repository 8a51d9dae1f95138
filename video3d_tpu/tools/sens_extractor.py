"""ScanNet ``.sens`` binary extractor (offline ETL).

Parses the public ScanNet sensor-stream format (version 4): header with
sensor name + 4x4 color/depth intrinsics/extrinsics + compression types +
frame sizes, followed by per-frame records (4x4 camera_to_world pose, two
timestamps, jpeg color bytes, zlib'd uint16 depth). Exports the same artifact
tree the reference produces (generate_image_scannet.py:23-212):
``posed_images/{scene}/{i:05d}.jpg / .png (depth, mm) / .txt (pose)`` plus
``intrinsic.txt`` / ``depth_intrinsic.txt``. ``fast=True`` keeps every 10th
frame. Uses multiprocessing over scenes instead of Ray.
"""

from __future__ import annotations

import argparse
import io
import os
import struct
import zlib
from typing import Iterator, Optional, Tuple

import numpy as np

COMPRESSION_TYPE_COLOR = {-1: "unknown", 0: "raw", 1: "png", 2: "jpeg"}
COMPRESSION_TYPE_DEPTH = {-1: "unknown", 0: "raw_ushort", 1: "zlib_ushort",
                          2: "occi_ushort"}


class SensStream:
    """Streaming .sens reader (frames yielded lazily — the reference loads
    everything into RAM; scenes are multi-GB so we don't)."""

    def __init__(self, filename: str):
        self.filename = filename
        self._f = open(filename, "rb")
        f = self._f
        version = struct.unpack("I", f.read(4))[0]
        assert version == 4, f"unsupported .sens version {version}"
        strlen = struct.unpack("Q", f.read(8))[0]
        self.sensor_name = f.read(strlen).decode("ascii", "replace")
        self.intrinsic_color = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
        self.extrinsic_color = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
        self.intrinsic_depth = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
        self.extrinsic_depth = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
        self.color_compression = COMPRESSION_TYPE_COLOR[
            struct.unpack("i", f.read(4))[0]]
        self.depth_compression = COMPRESSION_TYPE_DEPTH[
            struct.unpack("i", f.read(4))[0]]
        self.color_width = struct.unpack("I", f.read(4))[0]
        self.color_height = struct.unpack("I", f.read(4))[0]
        self.depth_width = struct.unpack("I", f.read(4))[0]
        self.depth_height = struct.unpack("I", f.read(4))[0]
        self.depth_shift = struct.unpack("f", f.read(4))[0]
        self.num_frames = struct.unpack("Q", f.read(8))[0]

    def frames(self) -> Iterator[Tuple[np.ndarray, bytes, bytes]]:
        """Yields (camera_to_world (4,4), color_bytes, depth_bytes_raw)."""
        f = self._f
        for _ in range(self.num_frames):
            pose = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
            f.read(16)  # two uint64 timestamps
            color_n = struct.unpack("Q", f.read(8))[0]
            depth_n = struct.unpack("Q", f.read(8))[0]
            color = f.read(color_n)
            depth = f.read(depth_n)
            yield pose, color, depth

    def decompress_depth(self, depth_bytes: bytes) -> np.ndarray:
        assert self.depth_compression == "zlib_ushort", self.depth_compression
        raw = zlib.decompress(depth_bytes)
        return np.frombuffer(raw, np.uint16).reshape(self.depth_height,
                                                     self.depth_width)

    def close(self):
        self._f.close()


def export_scene(sens_path: str, output_dir: str, fast: bool = False) -> int:
    """Export one scene; returns number of frames written."""
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    stream = SensStream(sens_path)
    np.savetxt(os.path.join(output_dir, "intrinsic.txt"), stream.intrinsic_color)
    np.savetxt(os.path.join(output_dir, "depth_intrinsic.txt"),
               stream.intrinsic_depth)
    written = 0
    for i, (pose, color, depth) in enumerate(stream.frames()):
        if fast and i % 10 != 0:
            continue
        stem = os.path.join(output_dir, f"{i:05d}")
        with open(stem + ".jpg", "wb") as f:   # already jpeg bytes
            f.write(color)
        depth_img = stream.decompress_depth(depth)
        Image.fromarray(depth_img.astype(np.uint16)).save(stem + ".png")
        np.savetxt(stem + ".txt", pose)
        written += 1
    stream.close()
    return written


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--scans-dir", required=True,
                        help="dir of {scene_id}/{scene_id}.sens")
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--fast", action="store_true", help="every 10th frame")
    parser.add_argument("--workers", type=int, default=os.cpu_count())
    args = parser.parse_args(argv)

    scenes = sorted(d for d in os.listdir(args.scans_dir)
                    if os.path.isdir(os.path.join(args.scans_dir, d)))
    jobs = [(os.path.join(args.scans_dir, s, f"{s}.sens"),
             os.path.join(args.output_dir, s), args.fast) for s in scenes]

    if args.workers > 1:
        from multiprocessing import Pool

        with Pool(args.workers) as pool:
            pool.starmap(export_scene, jobs)
    else:
        for job in jobs:
            export_scene(*job)


if __name__ == "__main__":
    main()
