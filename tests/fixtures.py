"""Synthetic one-scene ScanNet fixture + deterministic fake tokenizer for
end-to-end data pipeline tests (SURVEY.md §4 plan item (c))."""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List

import numpy as np
from PIL import Image


class FakeTokenizer:
    """Word-level tokenizer with the HF surface our code touches.

    ids: 0..9 reserved; 100=<|im_start|>, 101=<|im_end|>, 198='\\n',
    words assigned deterministically from 310 upward (kept below the tiny
    model vocab of 512 so embedding lookups stay in range).
    """

    def __init__(self):
        self.vocab: Dict[str, int] = {"<|im_start|>": 100, "<|im_end|>": 101,
                                      "\n": 198, "<image>": 300,
                                      "<ground>": 301, "<coord>": 302}
        self.inv: Dict[int, str] = {v: k for k, v in self.vocab.items()}
        self.additional_special_tokens_ids = [100, 101]
        self.bos_token_id = None
        self.eos_token_id = 101
        self.pad_token_id = 0
        self._next = 310

    def _id(self, word: str) -> int:
        if word not in self.vocab:
            self.vocab[word] = self._next
            self.inv[self._next] = word
            self._next += 1
        return self.vocab[word]

    class _Enc:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text: str):
        ids: List[int] = []
        # split text into newline tokens and whitespace words
        for part in text.split("\n"):
            for w in part.split():
                ids.append(self._id(w))
            ids.append(198)
        return self._Enc(ids[:-1] if ids else ids)

    def add_tokens(self, tokens, special_tokens: bool = False) -> int:
        return sum(t not in self.vocab and bool(self._id(t)) for t in tokens)

    def convert_tokens_to_ids(self, token: str) -> int:
        return self.vocab.get(token, self._id(token))

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        words = []
        for i in ids:
            i = int(i)
            if skip_special_tokens and i in (100, 101, 0):
                continue
            words.append("\n" if i == 198 else self.inv.get(i, f"<{i}>"))
        return " ".join(w for w in words if w != "\n")


def make_fake_scene(root: str, scene_id: str = "scene0000_00",
                    n_frames: int = 4, H: int = 96, W: int = 128,
                    n_objects: int = 5, seed: int = 0,
                    extend: bool = False) -> dict:
    """Create a minimal ScanNet-style data tree under ``root``.

    Layout matches what VideoProcessor reads: per-frame jpg/png/txt under
    {root}/scannet/posed_images/{scene_id}/, embodiedscan pkl under
    {root}/embodiedscan/, box json under {root}/metadata/.

    ``extend=True`` merges this scene into existing annotation files
    instead of overwriting them (multi-scene fixtures).
    """
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "scannet", "posed_images", scene_id)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "embodiedscan"), exist_ok=True)
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)

    intr = np.eye(4)
    intr[0, 0] = intr[1, 1] = 80.0
    intr[0, 2], intr[1, 2] = W / 2, H / 2
    axis_align = np.eye(4)
    axis_align[:3, 3] = [0.5, -0.2, 0.1]

    images_meta = []
    for i in range(n_frames):
        stem = f"{i:05d}"
        rgb = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(os.path.join(img_dir, stem + ".jpg"))
        depth = rng.integers(500, 5000, size=(H, W)).astype(np.uint16)
        Image.fromarray(depth).save(os.path.join(img_dir, stem + ".png"))
        pose = np.eye(4)
        pose[:3, 3] = rng.uniform(-1, 1, 3)
        np.savetxt(os.path.join(img_dir, stem + ".txt"), pose)
        images_meta.append({"img_path": f"scannet/posed_images/{scene_id}/{stem}.jpg"})

    sample_idx = f"scannet/{scene_id}"
    entry = {
        "sample_idx": sample_idx,
        "axis_align_matrix": axis_align.tolist(),
        "depth_cam2img": intr.tolist(),
        "images": images_meta,
    }
    train_pkl = os.path.join(root, "embodiedscan", "embodiedscan_infos_train.pkl")
    info = {"data_list": [entry]}
    if extend and os.path.exists(train_pkl):
        with open(train_pkl, "rb") as f:
            info = pickle.load(f)
        info["data_list"].append(entry)
    for split in ("train", "val", "test"):
        with open(os.path.join(root, "embodiedscan", f"embodiedscan_infos_{split}.pkl"), "wb") as f:
            pickle.dump(info if split == "train" else {"data_list": []}, f)

    boxes = np.concatenate([rng.uniform(-2, 2, (n_objects, 3)),
                            rng.uniform(0.3, 1.5, (n_objects, 3))], axis=1)
    for split, kind in (("train", "gt"), ("val", "pred")):
        box_path = os.path.join(root, "metadata", f"scannet_{split}_{kind}_box.json")
        box_data = {}
        if extend and os.path.exists(box_path):
            with open(box_path) as f:
                box_data = json.load(f)
        box_data[sample_idx] = boxes.tolist()
        with open(box_path, "w") as f:
            json.dump(box_data, f)

    # max-coverage sampling metadata (chronological order here)
    mc_path = os.path.join(root, "metadata", "scannet_select_frames.json")
    mc = []
    if extend and os.path.exists(mc_path):
        with open(mc_path) as f:
            mc = json.load(f)
    mc.append({
        "video_id": sample_idx,
        "frame_files": [os.path.join(root, m["img_path"]) for m in images_meta],
        "voxel_nums": [100] * n_frames,
        "num_all_voxels": 100 * n_frames,
    })
    with open(mc_path, "w") as f:
        json.dump(mc, f)
    pcd_path = os.path.join(root, "metadata", "pcd_discrete_0.1.pkl")
    pcd = {}
    if extend and os.path.exists(pcd_path):
        with open(pcd_path, "rb") as f:
            pcd = pickle.load(f)
    pcd[scene_id] = [(-20, -20, -10), (20, 20, 10)]
    with open(pcd_path, "wb") as f:
        pickle.dump(pcd, f)

    return {"sample_idx": sample_idx, "boxes": boxes, "intrinsic": intr,
            "axis_align": axis_align, "n_frames": n_frames}


def make_fake_annotations(root: str, sample_idx: str, n: int = 3) -> str:
    """Write a small ScanQA-style llava json + 1-entry multi-task yaml."""
    records = []
    for i in range(n):
        records.append({
            "id": f"q{i}",
            "video": sample_idx,
            "conversations": [
                {"from": "human", "value": f"<image>\nWhat is object {i} ?"},
                {"from": "gpt", "value": f"a brown chair {i}"},
            ],
            "metadata": {"dataset": "scanqa", "question_id": f"q{i}"},
        })
    path = os.path.join(root, "scanqa_train_llava_style.json")
    with open(path, "w") as f:
        json.dump(records, f)
    return path
