"""Host data-pipeline feed rate: can the CPU side feed the device pipeline?

SURVEY.md §7 'hard parts': the reference's host loop reads one depth PNG +
one pose txt per frame per sample (video_utils.py:196-238) — the stated
bottleneck. This framework adds three levers: the C++ depth-PNG decoder
(native/depth_png.cc, GIL-released), per-scene packed bundles
(tools/pack_scenes.py: one npz per scene) and the fused on-device geometry
kernel (host only DECODES; unprojection/voxelization moved on-chip).

This script measures, on this host, frames/s through:
  1. reference-style per-frame loading (PIL PNG decode + np.loadtxt pose)
  2. the engine's load path (native PNG decoder batch)
  3. the packed-scene path (one npz read per scene)
and compares each against the device pipeline's measured steady-state
consumption (BENCH_NOTES north-star). Pure CPU — run it on a QUIET host
(`python scripts/bench/host_pipeline.py`); forces the cpu platform so the
TPU tunnel is never touched.
"""

import os
import sys
import tempfile
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

N_FRAMES = 64
H, W = 480, 640


def make_scene_on_disk(root: str):
    from PIL import Image

    rng = np.random.default_rng(0)
    depth_dir = os.path.join(root, "depth")
    pose_dir = os.path.join(root, "pose")
    os.makedirs(depth_dir), os.makedirs(pose_dir)
    depths = rng.integers(200, 8000, size=(N_FRAMES, H, W)).astype(np.uint16)
    for i in range(N_FRAMES):
        Image.fromarray(depths[i]).save(os.path.join(depth_dir, f"{i}.png"))
        pose = np.eye(4)
        pose[:3, 3] = rng.uniform(-2, 2, 3)
        np.savetxt(os.path.join(pose_dir, f"{i}.txt"), pose)
    return depths


def bench_reference_style(root: str) -> float:
    """Per-frame PIL PNG + np.loadtxt, like video_utils.py:196-238."""
    from PIL import Image

    def once():
        out = []
        for i in range(N_FRAMES):
            d = np.asarray(Image.open(
                os.path.join(root, "depth", f"{i}.png")), np.int32)
            p = np.loadtxt(os.path.join(root, "pose", f"{i}.txt"))
            out.append((d, p))
        return out

    once()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        once()
    return N_FRAMES * reps / (time.perf_counter() - t0)


def bench_native_decoder(root: str) -> float:
    """The engine's loader: C++ 16-bit PNG decode (GIL released)."""
    from video3d_tpu.native import _ensure_lib, load_depth_png

    assert _ensure_lib() is not None, "C++ decoder not built"

    def once():
        d = [load_depth_png(os.path.join(root, "depth", f"{i}.png"))
             for i in range(N_FRAMES)]
        p = [np.loadtxt(os.path.join(root, "pose", f"{i}.txt"))
             for i in range(N_FRAMES)]
        return d, p

    once()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        once()
    return N_FRAMES * reps / (time.perf_counter() - t0)


def bench_packed(root: str, depths: np.ndarray, compress: bool) -> float:
    """One npz per scene (tools/pack_scenes.py layout)."""
    pack = os.path.join(root, f"scene_{int(compress)}.npz")
    poses = np.stack([np.eye(4, dtype=np.float32)] * N_FRAMES)
    save = np.savez_compressed if compress else np.savez
    save(pack, depths=depths, intrinsic=np.eye(4, dtype=np.float32),
         poses=poses,
         names=np.asarray([f"{i}.png" for i in range(N_FRAMES)]))

    def once():
        with np.load(pack) as z:
            return z["depths"][:], z["poses"][:]

    once()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        once()
    return N_FRAMES * reps / (time.perf_counter() - t0)


def main():
    with tempfile.TemporaryDirectory() as root:
        depths = make_scene_on_disk(root)
        ref = bench_reference_style(root)
        packed_c = bench_packed(root, depths, compress=True)
        packed_u = bench_packed(root, depths, compress=False)
        try:
            native = bench_native_decoder(root)
        except Exception as e:  # noqa: BLE001 — .so not built on this host
            native = float("nan")
            print(f"native decoder unavailable: {e}", file=sys.stderr)
    print(f"reference-style per-frame PNG+txt:   {ref:8.1f} frames/s")
    print(f"native C++ PNG decode (per-frame):   {native:8.1f} frames/s")
    print(f"packed scene npz, zlib (--compress): {packed_c:8.1f} frames/s")
    print(f"packed scene npz, raw (default):     {packed_u:8.1f} frames/s")
    print("device steady-state consumption (BENCH_NOTES): ~316 frames/s "
          "feature-cached / ~109 cold")


if __name__ == "__main__":
    main()
