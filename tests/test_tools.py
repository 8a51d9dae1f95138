"""ETL tool tests: .sens round-trip, dataset converters on synthetic
benchmark files, greedy max-coverage ordering, box extraction."""

import json
import os
import pickle
import struct
import zlib

import numpy as np
import pytest

from video3d_tpu.tools import converters
from video3d_tpu.tools.max_coverage import (build_select_frames,
                                            greedy_max_coverage,
                                            voxelize_pointcloud)
from video3d_tpu.tools.sens_extractor import SensStream, export_scene

from fixtures import make_fake_scene
from video3d_tpu.config import DataConfig


def write_fake_sens(path: str, n_frames: int = 3, w: int = 16, h: int = 12):
    """Minimal valid version-4 .sens file."""
    rng = np.random.default_rng(0)
    with open(path, "wb") as f:
        f.write(struct.pack("I", 4))
        name = b"fake"
        f.write(struct.pack("Q", len(name)))
        f.write(name)
        for _ in range(4):   # 4 matrices
            f.write(np.eye(4, dtype=np.float32).tobytes())
        f.write(struct.pack("i", 2))   # jpeg
        f.write(struct.pack("i", 1))   # zlib_ushort
        f.write(struct.pack("IIII", w, h, w, h))
        f.write(struct.pack("f", 1000.0))
        f.write(struct.pack("Q", n_frames))
        depths = []
        for i in range(n_frames):
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = i
            f.write(pose.tobytes())
            f.write(struct.pack("QQ", i, i))  # timestamps
            from PIL import Image
            import io

            img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            color = buf.getvalue()
            depth = rng.integers(100, 5000, (h, w)).astype(np.uint16)
            depths.append(depth)
            dz = zlib.compress(depth.tobytes())
            f.write(struct.pack("QQ", len(color), len(dz)))
            f.write(color)
            f.write(dz)
    return depths


class TestSensExtractor:
    def test_roundtrip(self, tmp_path):
        sens = str(tmp_path / "scene.sens")
        depths = write_fake_sens(sens)
        out = str(tmp_path / "out")
        n = export_scene(sens, out)
        assert n == 3
        assert os.path.exists(os.path.join(out, "intrinsic.txt"))
        from PIL import Image

        back = np.asarray(Image.open(os.path.join(out, "00001.png")))
        np.testing.assert_array_equal(back, depths[1])
        pose = np.loadtxt(os.path.join(out, "00002.txt"))
        assert pose[0, 3] == 2.0

    def test_fast_mode_keeps_every_tenth(self, tmp_path):
        sens = str(tmp_path / "scene.sens")
        write_fake_sens(sens, n_frames=25)
        out = str(tmp_path / "fast")
        n = export_scene(sens, out, fast=True)
        assert n == 3   # frames 0, 10, 20


class TestConverters:
    def test_scanqa(self, tmp_path):
        src = tmp_path / "scanqa"
        src.mkdir()
        for split in ("train", "val"):
            data = [{"answers": ["a chair", "chair"], "object_ids": [1],
                     "object_names": ["chair"],
                     "question": "What is there?",
                     "question_id": f"{split}-x-0", "scene_id": "scene0000_00"}]
            with open(src / f"ScanQA_v1.0_{split}.json", "w") as f:
                json.dump(data, f)
        converters.convert_scanqa(str(src), str(tmp_path / "out"))
        with open(tmp_path / "out" / "scanqa_train_llava_style.json") as f:
            train = json.load(f)
        assert len(train) == 2        # one per answer
        assert train[0]["conversations"][0]["value"].startswith("<image> What")
        with open(tmp_path / "out" / "scanqa_val_llava_style.json") as f:
            val = json.load(f)
        assert len(val) == 1          # val keeps one sample w/ all answers
        assert val[0]["metadata"]["answers"] == ["a chair", "chair"]

    def test_sqa3d_question_type(self):
        assert converters.sqa_question_type(" Which way?") == "which"
        assert converters.sqa_question_type("Could it be?") == "others"

    def test_unique_multiple_labels(self):
        records = [
            {"scene_id": "s1", "object_id": "1", "object_name": "chair"},
            {"scene_id": "s1", "object_id": "2", "object_name": "chair"},
            {"scene_id": "s1", "object_id": "3", "object_name": "bed"},
        ]
        mapping = {"chair": 5, "bed": 4}
        converters.add_unique_multiple_labels(records, mapping)
        assert records[0]["eval_type"] == "multiple"
        assert records[2]["eval_type"] == "unique"


class TestMaxCoverage:
    def test_greedy_prefers_high_coverage(self):
        fv = {
            "a": {(0, 0, 0), (1, 0, 0), (2, 0, 0)},
            "b": {(0, 0, 0)},
            "c": {(3, 0, 0), (4, 0, 0)},
        }
        pc = set().union(*fv.values())
        import random

        order, nums = greedy_max_coverage(fv, pc, rng=random.Random(0))
        assert order[0] == "a" and order[1] == "c"
        assert nums == [3, 2, 0]

    def test_voxelize_pointcloud(self):
        pts = np.array([[0.04, 0.0, 0.0], [0.06, 0.0, 0.0], [1.0, 2.0, -1.0]])
        vox = voxelize_pointcloud(pts, 0.1)
        assert (0, 0, 0) in vox and (1, 0, 0) in vox and (10, 20, -10) in vox

    def test_build_select_frames_on_fixture(self, tmp_path):
        root = str(tmp_path / "data")
        info = make_fake_scene(root, n_frames=4)
        cfg = DataConfig(video_folder=root,
                         annotation_dir=os.path.join(root, "embodiedscan"),
                         metadata_dir=os.path.join(root, "metadata"))
        # scene voxel set: everything (so every frame voxel counts)
        pkl = os.path.join(root, "metadata", "pcd_all.pkl")
        big = [(x, y, z) for x in range(-60, 61, 2)
               for y in range(-60, 61, 2) for z in range(-60, 61, 2)]
        with open(pkl, "wb") as f:
            pickle.dump({"scene0000_00": big}, f)
        out_file = str(tmp_path / "select.json")
        data = build_select_frames(cfg, pkl, out_file, voxel_size=0.1,
                                   scene_ids=["scene0000_00"])
        assert len(data) == 1
        rec = data[0]
        assert len(rec["frame_files"]) == 4
        assert rec["voxel_nums"][0] >= rec["voxel_nums"][-1]
        assert rec["num_select_voxels"] <= rec["num_all_voxels"]


class TestExtractPcd:
    def _write_ply(self, path, xyz, rgb, faces):
        import struct
        with open(path, "wb") as f:
            header = (b"ply\nformat binary_little_endian 1.0\n"
                      + f"element vertex {len(xyz)}\n".encode()
                      + b"property float x\nproperty float y\nproperty float z\n"
                      + b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
                      + f"element face {len(faces)}\n".encode()
                      + b"property list uchar int vertex_indices\nend_header\n")
            f.write(header)
            for p, c in zip(xyz, rgb):
                f.write(struct.pack("<fff", *p))
                f.write(struct.pack("BBB", *c))
            for face in faces:
                f.write(struct.pack("<Biii", 3, *face))

    def test_ply_roundtrip_and_aabbs(self, tmp_path):
        import numpy as np
        from video3d_tpu.tools import extract_pcd

        xyz = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [2, 2, 2]], np.float32)
        rgb = np.array([[255, 0, 0]] * 4, np.uint8)
        faces = np.array([[0, 1, 2]], np.int32)
        ply = str(tmp_path / "m.ply")
        self._write_ply(ply, xyz, rgb, faces)
        v, c, fc = extract_pcd.read_ply(ply)
        np.testing.assert_allclose(v, xyz)
        np.testing.assert_array_equal(c, rgb)
        np.testing.assert_array_equal(fc, faces)

        normals = extract_pcd.compute_vertex_normals(v, fc)
        np.testing.assert_allclose(normals[0], [0, 0, 1], atol=1e-6)

        inst = np.array([0, 0, 1, -1], np.int16)
        corners, ids = extract_pcd.get_aabbs(v, inst)
        assert list(ids) == [0, 1]
        np.testing.assert_allclose(corners[0].min(axis=0), [0, 0, 0])
        np.testing.assert_allclose(corners[0].max(axis=0), [1, 0, 0])
        np.testing.assert_allclose(corners[1].min(axis=0), [0, 1, 0])


class TestScenePack:
    def test_pack_and_read_matches_direct(self, tmp_path):
        from video3d_tpu.config import DataConfig, replace
        from video3d_tpu.data.video_processor import VideoProcessor
        from video3d_tpu.tools.pack_scenes import pack_scene

        root = str(tmp_path / "data")
        info = make_fake_scene(root, n_frames=3)
        cfg = DataConfig(video_folder=root,
                         annotation_dir=os.path.join(root, "embodiedscan"),
                         metadata_dir=os.path.join(root, "metadata"))
        vp = VideoProcessor(cfg)
        packed = str(tmp_path / "packed")
        pack_scene(vp, info["sample_idx"], packed)

        frames = vp.select_frames(info["sample_idx"], True, 3)
        d_ref, i_ref, p_ref = vp.load_frame_geometry(info["sample_idx"], frames)

        vp2 = VideoProcessor(replace(cfg, packed_dir=packed))
        d, i, p = vp2.load_frame_geometry(info["sample_idx"], frames)
        np.testing.assert_array_equal(d, d_ref)
        np.testing.assert_allclose(i, i_ref)
        np.testing.assert_allclose(p, p_ref, rtol=1e-6)

    def test_pack_subset_and_order(self, tmp_path):
        from video3d_tpu.config import DataConfig, replace
        from video3d_tpu.data.video_processor import VideoProcessor
        from video3d_tpu.tools.pack_scenes import pack_scene

        root = str(tmp_path / "data")
        info = make_fake_scene(root, n_frames=4)
        cfg = DataConfig(video_folder=root,
                         annotation_dir=os.path.join(root, "embodiedscan"),
                         metadata_dir=os.path.join(root, "metadata"))
        vp = VideoProcessor(cfg)
        packed = str(tmp_path / "packed")
        pack_scene(vp, info["sample_idx"], packed)
        vp2 = VideoProcessor(replace(cfg, packed_dir=packed))
        all_frames = [os.path.join(root, img["img_path"])
                      for img in vp.scene[info["sample_idx"]]["images"]]
        # reversed subset must map by filename, not position
        subset = [all_frames[2], all_frames[0]]
        d, _, p = vp2.load_frame_geometry(info["sample_idx"], subset)
        d_ref, _, p_ref = vp.load_frame_geometry(info["sample_idx"], subset)
        np.testing.assert_array_equal(d, d_ref)
        np.testing.assert_allclose(p, p_ref, rtol=1e-6)
