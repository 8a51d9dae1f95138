"""Golden ETL parity: our dataset converters vs the REFERENCE converter
scripts run on the same synthetic benchmark inputs (byte-identical record
streams). Skipped when the reference tree is absent."""

import importlib.util
import json
import os
import types

import numpy as np
import pytest

REF = "/root/reference/scripts/3d/preprocessing"
HAS_REF = os.path.isdir(REF)

pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference tree not mounted")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(REF, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_scanqa_inputs(d):
    os.makedirs(d, exist_ok=True)
    for split in ("train", "val"):
        data = [
            {"answers": ["brown cabinet", "cabinet"], "object_ids": [8],
             "object_names": ["cabinet"],
             "question": "What is in the corner?",
             "question_id": f"{split}-scene0000-0", "scene_id": "scene0000_00"},
            {"answers": ["two"], "object_ids": [3], "object_names": ["chair"],
             "question": "How many chairs?",
             "question_id": f"{split}-scene0000-1", "scene_id": "scene0000_00"},
        ]
        with open(os.path.join(d, f"ScanQA_v1.0_{split}.json"), "w") as f:
            json.dump(data, f)


class TestScanQAGolden:
    def test_identical_output(self, tmp_path):
        src = str(tmp_path / "scanqa")
        make_scanqa_inputs(src)
        ref_mod = _load("process_scanqa")
        ref_out = str(tmp_path / "ref")
        ref_mod.main(types.SimpleNamespace(scanqa_dir=src, output_dir=ref_out))

        from video3d_tpu.tools.converters import convert_scanqa

        our_out = str(tmp_path / "ours")
        convert_scanqa(src, our_out)

        for split in ("train", "val"):
            with open(os.path.join(ref_out, f"scanqa_{split}_llava_style.json")) as f:
                ref = json.load(f)
            with open(os.path.join(our_out, f"scanqa_{split}_llava_style.json")) as f:
                ours = json.load(f)
            assert ours == ref, split


class TestSQA3DGolden:
    def test_identical_output(self, tmp_path):
        src = str(tmp_path / "sqa")
        os.makedirs(os.path.join(src, "balanced"), exist_ok=True)
        for split in ("train", "val", "test"):
            questions = [{
                "question_id": 100 + i, "scene_id": "scene0000_00",
                "situation": f"I face the window {i}.",
                "alternative_situation": [f"Alt {i}a.", f"Alt {i}b."],
                "question": q,
            } for i, q in enumerate(["What is left of me?", "Can I sit?"])]
            annotations = [{
                "question_id": 100 + i,
                "scene_id": "scene0000_00",
                "answers": [{"answer": a}],
            } for i, a in enumerate(["table", "yes"])]
            with open(os.path.join(src, "balanced",
                                   f"v1_balanced_questions_{split}_scannetv2.json"), "w") as f:
                json.dump({"questions": questions}, f)
            with open(os.path.join(src, "balanced",
                                   f"v1_balanced_sqa_annotations_{split}_scannetv2.json"), "w") as f:
                json.dump({"annotations": annotations}, f)

        ref_mod = _load("process_sqa3d")
        ref_out = str(tmp_path / "ref")
        ref_mod.main(types.SimpleNamespace(sqa3d_dir=src, output_dir=ref_out))

        from video3d_tpu.tools.converters import convert_sqa3d

        our_out = str(tmp_path / "ours")
        convert_sqa3d(src, our_out)
        for split in ("train", "val", "test"):
            with open(os.path.join(ref_out, f"sqa3d_{split}_llava_style.json")) as f:
                ref = json.load(f)
            with open(os.path.join(our_out, f"sqa3d_{split}_llava_style.json")) as f:
                ours = json.load(f)
            assert ours == ref, split


class TestScanReferGolden:
    def _make_inputs(self, root):
        import torch

        sr = os.path.join(root, "scanrefer")
        os.makedirs(sr, exist_ok=True)
        scannet = os.path.join(root, "data", "scannet")
        rng = np.random.default_rng(0)
        for split in ("train", "val"):
            data = [{
                "scene_id": "scene0000_00", "object_id": str(oid),
                "object_name": name, "ann_id": str(i),
                "description": f"the {name} near the window {i}",
            } for i, (oid, name) in enumerate([(1, "chair"), (2, "chair"),
                                               (3, "bed")])]
            with open(os.path.join(sr, f"ScanRefer_filtered_{split}.json"), "w") as f:
                json.dump(data, f)
            pth_dir = os.path.join(scannet, "pcd_with_object_aabbs", split)
            os.makedirs(pth_dir, exist_ok=True)
            corners = rng.uniform(-3, 3, size=(4, 8, 3)).astype(np.float32)
            torch.save({"aabb_obj_ids": torch.tensor([0, 1, 2, 3], dtype=torch.int16),
                        "aabb_corner_xyz": torch.tensor(corners)},
                       os.path.join(pth_dir, "scene0000_00.pth"))
        # labels tsv (raw_category at col 1, nyu40id at col 4)
        tsv = os.path.join(root, "labels.tsv")
        with open(tsv, "w") as f:
            f.write("id\traw_category\tcategory\tcount\tnyu40id\teigen13id\n")
            f.write("1\tchair\tchair\t10\t5\t4\n")
            f.write("2\tbed\tbed\t5\t4\t3\n")
        return sr, scannet, tsv

    def test_identical_output(self, tmp_path, monkeypatch):
        sr, scannet, tsv = self._make_inputs(str(tmp_path))
        ref_mod = _load("process_scanrefer")

        # reference tags eval_type in place (its __main__ flow), then main()
        for split in ("train", "val"):
            mapping = ref_mod.get_semantic_mapping_file(tsv, "nyu40")
            ref_mod.add_unique_multiple_labels_to_json(
                os.path.join(sr, f"ScanRefer_filtered_{split}.json"), mapping,
                [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33,
                 34, 36, 39])
        ref_out = str(tmp_path / "ref")
        # the reference hardcodes 'data/scannet' -> chdir to the tmp root
        monkeypatch.chdir(str(tmp_path))
        ref_mod.main(types.SimpleNamespace(scanrefer_dir=sr,
                                           output_dir=ref_out,
                                           template_type="cls"))

        from video3d_tpu.tools.converters import convert_scanrefer

        our_out = str(tmp_path / "ours")
        convert_scanrefer(sr, scannet, our_out, label_mapping_file=tsv)
        for split in ("train", "val"):
            with open(os.path.join(ref_out, f"scanrefer_vg_{split}_llava_style.json")) as f:
                ref = json.load(f)
            with open(os.path.join(our_out, f"scanrefer_vg_{split}_llava_style.json")) as f:
                ours = json.load(f)
            # the reference stores box as tuple->list; normalize via json
            assert ours == ref, split


def _stub_llava_modules():
    """Make `from llava.eval.box_utils import ...` / `llava.utils_3d` work
    without importing the heavy llava package."""
    import sys

    for name, path in (("llava.eval.box_utils",
                        "/root/reference/llava/eval/box_utils.py"),
                       ("llava.utils_3d",
                        "/root/reference/llava/utils_3d.py")):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules[name] = mod
    for pkg in ("llava", "llava.eval"):
        if pkg not in sys.modules:
            sys.modules[pkg] = types.ModuleType(pkg)
    sys.modules["llava"].eval = sys.modules["llava.eval"]
    sys.modules["llava.eval"].box_utils = sys.modules["llava.eval.box_utils"]
    sys.modules["llava"].utils_3d = sys.modules["llava.utils_3d"]


class TestScan2CapAndM3DRGolden:
    def _make_inputs(self, root):
        import torch
        from scipy import sparse

        sr = os.path.join(root, "scanrefer")
        m3 = os.path.join(root, "multi3drefer")
        scannet = os.path.join(root, "scannet")
        os.makedirs(sr, exist_ok=True)
        os.makedirs(m3, exist_ok=True)
        rng = np.random.default_rng(0)

        n_pts = 200
        xyz = rng.uniform(-3, 3, size=(n_pts, 3)).astype(np.float32)
        for split in ("train", "val"):
            data = [{
                "scene_id": "scene0000_00", "object_id": str(oid),
                "object_name": name, "ann_id": str(i),
                "description": f"the {name} number {i}",
                "eval_type": "unique" if i == 2 else "multiple",
            } for i, (oid, name) in enumerate([(1, "chair"), (1, "chair"),
                                               (2, "bed")])]
            with open(os.path.join(sr, f"ScanRefer_filtered_{split}.json"), "w") as f:
                json.dump(data, f)
            m3_data = [{
                "scene_id": "scene0000_00", "object_ids": [1, 2],
                "ann_id": str(i), "description": f"both objects {i}",
                "eval_type": "mt",
            } for i in range(2)]
            with open(os.path.join(m3, f"multi3drefer_{split}.json"), "w") as f:
                json.dump(m3_data, f)

            pth_dir = os.path.join(scannet, "pcd_with_object_aabbs", split)
            os.makedirs(pth_dir, exist_ok=True)
            corners = rng.uniform(-3, 3, size=(3, 8, 3)).astype(np.float32)
            torch.save({"xyz": torch.tensor(xyz),
                        "rgb": torch.tensor(rng.integers(0, 255, (n_pts, 3)).astype(np.uint8)),
                        "aabb_obj_ids": torch.tensor([1, 2, 3], dtype=torch.int16),
                        "aabb_corner_xyz": torch.tensor(corners)},
                       os.path.join(pth_dir, "scene0000_00.pth"))

        # sparse instance masks (reference load_masks: scipy sparse npz)
        mask_dir = os.path.join(scannet, "mask")
        os.makedirs(mask_dir, exist_ok=True)
        dense = np.zeros((5, n_pts), np.int64)
        for r in range(5):
            dense[r, rng.choice(n_pts, 40, replace=False)] = 1
        sparse.save_npz(os.path.join(mask_dir, "scene0000_00.mask"),
                        sparse.csr_matrix(dense))
        os.rename(os.path.join(mask_dir, "scene0000_00.mask.npz"),
                  os.path.join(mask_dir, "scene0000_00.mask.npz"))
        return sr, m3, scannet

    def test_scan2cap_identical(self, tmp_path):
        _stub_llava_modules()
        sr, m3, scannet = self._make_inputs(str(tmp_path))
        ref_mod = _load("process_scan2cap")
        ref_out = str(tmp_path / "ref_s2c")
        ref_mod.main(types.SimpleNamespace(scanrefer_dir=sr,
                                           scannet_dir=scannet,
                                           output_dir=ref_out, threshold=0.5))
        from video3d_tpu.tools.converters import convert_scan2cap

        our_out = str(tmp_path / "our_s2c")
        convert_scan2cap(sr, scannet, our_out)
        for split in ("train", "val"):
            ref = json.load(open(os.path.join(
                ref_out, f"scan2cap_{split}_llava_style.json")))
            ours = json.load(open(os.path.join(
                our_out, f"scan2cap_{split}_llava_style.json")))
            assert ours == ref, split

    def test_multi3drefer_identical(self, tmp_path, monkeypatch):
        _stub_llava_modules()
        sr, m3, scannet = self._make_inputs(str(tmp_path))
        ref_mod = _load("process_multi3drefer")
        ref_out = str(tmp_path / "ref_m3")
        # reference hardcodes 'data/scannet'
        os.makedirs(str(tmp_path / "data"), exist_ok=True)
        if not os.path.exists(str(tmp_path / "data" / "scannet")):
            os.symlink(scannet, str(tmp_path / "data" / "scannet"))
        monkeypatch.chdir(str(tmp_path))
        ref_mod.main(types.SimpleNamespace(multi3drefer_dir=m3,
                                           output_dir=ref_out,
                                           template_type="cls"))
        from video3d_tpu.tools.converters import convert_multi3drefer

        our_out = str(tmp_path / "our_m3")
        convert_multi3drefer(m3, scannet, our_out)
        for split in ("train", "val"):
            ref = json.load(open(os.path.join(
                ref_out, f"multi3drefer_{split}_llava_style.json")))
            ours = json.load(open(os.path.join(
                our_out, f"multi3drefer_{split}_llava_style.json")))
            assert ours == ref, split


class TestGtBoxGolden:
    def test_identical_output(self, tmp_path):
        import torch

        _stub_llava_modules()
        scannet = str(tmp_path / "scannet")
        rng = np.random.default_rng(0)
        for split in ("train", "val"):
            d = os.path.join(scannet, "pcd_with_object_aabbs", split)
            os.makedirs(d, exist_ok=True)
            # consecutive-id scene (kept) + non-consecutive scene (dropped)
            torch.save({"aabb_obj_ids": torch.tensor([0, 1, 2], dtype=torch.int16),
                        "aabb_corner_xyz": torch.tensor(
                            rng.uniform(-3, 3, (3, 8, 3)).astype(np.float32))},
                       os.path.join(d, "scene0000_00.pth"))
            torch.save({"aabb_obj_ids": torch.tensor([0, 2, 3], dtype=torch.int16),
                        "aabb_corner_xyz": torch.tensor(
                            rng.uniform(-3, 3, (3, 8, 3)).astype(np.float32))},
                       os.path.join(d, "scene0001_00.pth"))

        ref_mod = _load("extract_gt_box")
        ref_out = str(tmp_path / "ref")
        ref_mod.main(types.SimpleNamespace(scannet_dir=scannet,
                                           output_dir=ref_out))

        from video3d_tpu.tools.extract_boxes import extract_gt_boxes

        for split in ("train", "val"):
            ours = extract_gt_boxes(
                scannet, split, str(tmp_path / f"ours_{split}.json"))
            ref = json.load(open(os.path.join(
                ref_out, f"scannet_{split}_gt_box.json")))
            assert set(ours) == set(ref) == {"scannet/scene0000_00"}
            assert ours == ref, split


class TestPredBoxGolden:
    def test_identical_output(self, tmp_path):
        import torch
        from scipy import sparse

        _stub_llava_modules()
        scannet = str(tmp_path / "scannet")
        meta = str(tmp_path / "meta")
        os.makedirs(meta, exist_ok=True)
        rng = np.random.default_rng(0)
        n_pts = 150
        for split in ("val", "test"):
            d = os.path.join(scannet, "pcd_with_object_aabbs", split)
            os.makedirs(d, exist_ok=True)
            torch.save({"xyz": torch.tensor(
                            rng.uniform(-3, 3, (n_pts, 3)).astype(np.float32)),
                        "rgb": torch.tensor(
                            rng.integers(0, 255, (n_pts, 3)).astype(np.float64))},
                       os.path.join(d, "scene0000_00.pth"))
            with open(os.path.join(meta, f"scannetv2_{split}.txt"), "w") as f:
                f.write("scene0000_00\n")
        mask_dir = os.path.join(scannet, "mask")
        os.makedirs(mask_dir, exist_ok=True)
        dense = np.zeros((4, n_pts), np.int64)
        for r in range(4):
            dense[r, rng.choice(n_pts, 30, replace=False)] = 1
        sparse.save_npz(os.path.join(mask_dir, "scene0000_00.mask"),
                        sparse.csr_matrix(dense))

        ref_mod = _load("extract_pred_box")
        ref_out = str(tmp_path / "ref")
        ref_mod.main(types.SimpleNamespace(scannet_dir=scannet,
                                           output_dir=ref_out,
                                           scannet_meta=meta))

        from video3d_tpu.tools.extract_boxes import extract_pred_boxes

        ours = extract_pred_boxes(scannet, "val",
                                  str(tmp_path / "ours_val.json"))
        ref = json.load(open(os.path.join(ref_out, "scannet_val_pred_box.json")))
        assert ours == ref
