"""End-to-end host data pipeline tests on the synthetic one-scene fixture:
VideoProcessor IO + geometry, tokenization contract, dataset, collator, and
a full forward + train step on the collated batch (tiny model, CPU)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.config import (DataConfig, FrameSampling, ModelConfig,
                                VisionConfig, replace)
from video3d_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from video3d_tpu.data.dataset import Collator, CollatorConfig, SupervisedDataset
from video3d_tpu.data.image_processor import SigLipImageProcessor
from video3d_tpu.data.tokenization import (preprocess_qwen,
                                           preprocess_qwen_eval,
                                           tokenizer_image_token)
from video3d_tpu.data.video_processor import VideoProcessor, unproject_np

from fixtures import FakeTokenizer, make_fake_annotations, make_fake_scene

CFG = ModelConfig.tiny()


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    info = make_fake_scene(root, n_frames=4)
    info["root"] = root
    info["ann"] = make_fake_annotations(root, info["sample_idx"])
    return info


@pytest.fixture(scope="module")
def data_cfg(scene):
    return DataConfig(video_folder=scene["root"],
                      annotation_dir=os.path.join(scene["root"], "embodiedscan"),
                      metadata_dir=os.path.join(scene["root"], "metadata"),
                      frames_upbound=4)


class TestVideoProcessor:
    def test_process_3d_video_shapes(self, scene, data_cfg):
        vp = VideoProcessor(data_cfg)
        proc = SigLipImageProcessor(size=(56, 56))
        out = vp.process_3d_video(scene["sample_idx"], proc,
                                  force_sample=True, frames_upbound=4)
        assert out["images"].shape == (4, 3, 56, 56)
        assert out["world_coords"].shape == (4, 56, 56, 3)
        assert out["video_size"] == 4
        assert out["objects"].shape == (5, 6)
        assert out["boundry"].shape == (6,)
        assert np.isfinite(out["world_coords"]).all()

    def test_world_coords_match_jnp_ops(self, scene, data_cfg):
        """Host numpy geometry == device jnp geometry."""
        from video3d_tpu.ops import geometry

        vp = VideoProcessor(data_cfg)
        frames = vp.select_frames(scene["sample_idx"], True, 4)
        depths, intr, poses = vp.load_frame_geometry(scene["sample_idx"], frames)
        host = unproject_np(intr, poses, depths)
        dev = np.asarray(geometry.unproject(jnp.asarray(intr), jnp.asarray(poses),
                                            jnp.asarray(depths)))
        np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-5)

    def test_mc_sampling_prefix(self, scene, data_cfg):
        cfg = replace(data_cfg, frame_sampling=FrameSampling.MC_RATIO90)
        vp = VideoProcessor(cfg)
        frames = vp.select_frames(scene["sample_idx"], True, 4)
        # 4 frames x 100 voxels each, total 400: 0.9*400=360 -> 4 frames kept
        assert len(frames) == 4
        cfg95 = replace(data_cfg, frame_sampling=FrameSampling.MC)
        vp = VideoProcessor(cfg95)
        assert len(vp.select_frames(scene["sample_idx"], True, 2)) == 2

    def test_uniform_sampling_even_spread(self, scene, data_cfg):
        vp = VideoProcessor(data_cfg)
        frames = vp.select_frames(scene["sample_idx"], True, 2)
        assert len(frames) == 2
        assert frames[0].endswith("00000.jpg") and frames[1].endswith("00003.jpg")


class TestTokenization:
    def test_image_token_splice(self):
        tok = FakeTokenizer()
        ids = tokenizer_image_token("hello <image>\nworld", tok)
        assert IMAGE_TOKEN_INDEX in ids
        i = ids.index(IMAGE_TOKEN_INDEX)
        assert tok.decode(ids[:i]).strip() == "hello"

    def test_preprocess_qwen_masking(self):
        tok = FakeTokenizer()
        src = [[{"from": "human", "value": "<image>\nwhat is this"},
                {"from": "gpt", "value": "a chair"}]]
        out = preprocess_qwen(src, tok, has_image=True,
                              image_token_id=tok.convert_tokens_to_ids("<image>"))
        ids, labs = out["input_ids"][0], out["labels"][0]
        assert len(ids) == len(labs)
        assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
        # user/system fully masked except structural tokens
        im_start, im_end = tok.additional_special_tokens_ids
        for i, t in enumerate(ids):
            if labs[i] not in (IGNORE_INDEX,):
                assert t in (im_start, im_end, 198) or \
                    t in tok("assistant\na chair").input_ids
        # the answer tokens are supervised
        ans = tok("a chair").input_ids
        assert all(a in labs.tolist() for a in ans)

    def test_eval_prompt_ends_with_generation_header(self):
        tok = FakeTokenizer()
        src = [{"from": "human", "value": "<image>\nwhere is the lamp"},
               {"from": "gpt", "value": None}]
        ids = preprocess_qwen_eval(src, tok)
        im_start = tok.additional_special_tokens_ids[0]
        assert IMAGE_TOKEN_INDEX in ids
        # tail: <|im_start|>assistant\n with no <|im_end|>
        tail = ids[-3:]
        assert tail[0] == im_start and tail[1] == tok.vocab["assistant"] and tail[2] == 198


class TestDatasetAndCollator:
    @pytest.fixture(scope="class")
    def dataset(self, scene, data_cfg):
        tok = FakeTokenizer()
        proc = SigLipImageProcessor(size=(CFG.vision.image_size,) * 2)
        return SupervisedDataset(scene["ann"], tok, data_cfg,
                                 image_processor=proc)

    def test_item_fields(self, dataset):
        item = dataset[0]
        assert item["images"].shape[0] == 4
        assert item["world_coords"].shape[1:] == (CFG.vision.image_size,
                                                  CFG.vision.image_size, 3)
        assert (item["input_ids"] == IMAGE_TOKEN_INDEX).sum() == 1
        assert item["dataset"] == "scanqa"
        # spatial instruction prepended
        assert item["input_ids"][0] != IMAGE_TOKEN_INDEX

    def test_lengths_properties(self, dataset):
        assert len(dataset.lengths) == len(dataset)
        assert all(t == 0 for t, _ in dataset.task_lengths)  # scanqa -> 0

    def test_collate_and_forward_and_train(self, dataset):
        from video3d_tpu.models import llava_video3d as lv3d
        from video3d_tpu.train.optim import OptimConfig, build_optimizer
        from video3d_tpu.train.train_step import (create_train_state,
                                                  train_step)

        col = Collator(CFG, CollatorConfig(max_len=256, frames_upbound=4,
                                           pad_token_id=0))
        arrays = col([dataset[0], dataset[1]])
        assert arrays["images"].shape[:2] == (2, 4)
        g = -(-CFG.vision.num_patches_per_side // CFG.spatial_pool_stride)
        assert arrays["patch_coords"].shape == (2, 4, g, g, 3)
        # voxel ids in range
        assert arrays["patch_coords"].min() >= 0
        assert arrays["patch_coords"].max() <= 300

        batch = lv3d.Batch(**{k: jnp.asarray(v) for k, v in arrays.items()
                              if k in lv3d.Batch._fields})
        params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
        logits = lv3d.forward(params, CFG, batch)
        assert logits.shape == (2, 256, CFG.llm.vocab_size)
        loss = lv3d.language_model_loss(logits, batch.labels)
        assert np.isfinite(float(loss))

        tx = build_optimizer(params, OptimConfig(total_steps=4))
        state = create_train_state(params, tx)
        state, metrics = train_step(state, batch, CFG, tx, remat=True)
        assert np.isfinite(float(metrics["lm_loss"]))
        assert float(metrics["grad_norm"]) > 0


class TestConfigVariants:
    """mrope and minmax pooling configs collate + forward end to end."""

    @pytest.fixture(scope="class")
    def env(self, scene, data_cfg):
        from fixtures import FakeTokenizer
        tok = FakeTokenizer()
        proc = SigLipImageProcessor(size=(CFG.vision.image_size,) * 2)
        ds = SupervisedDataset(scene["ann"], tok, data_cfg, image_processor=proc)
        return ds

    def test_mrope_config(self, env):
        from video3d_tpu.config import PosEmbedType, World3DConfig, replace as rep
        from video3d_tpu.models import llava_video3d as lv3d
        import jax

        cfg = rep(CFG, world_3d=World3DConfig(pos_embed=PosEmbedType.MROPE))
        col = Collator(cfg, CollatorConfig(max_len=192, frames_upbound=4))
        arrays = col([env[0]])
        m = arrays["mrope_position_ids"][0]
        # vision tokens carry voxel ids (values up to 300), text ids stay small
        n_text_prefix = int(np.argmax(arrays["kind"][0] == 2))
        assert (m[:n_text_prefix, 0] == np.arange(n_text_prefix)).all()
        assert m[:, 0].max() > 100  # voxel ids present
        batch = lv3d.Batch(**{k: jnp.asarray(v) for k, v in arrays.items()
                              if k in lv3d.Batch._fields})
        params = lv3d.init_model(jax.random.PRNGKey(0), cfg)
        logits = lv3d.forward(params, cfg, batch)
        assert np.isfinite(np.asarray(logits[0, :10])).all()

    def test_minmax_pooling_config(self, env):
        from video3d_tpu.config import CoordPooling, World3DConfig, replace as rep
        from video3d_tpu.models import llava_video3d as lv3d
        import jax

        cfg = rep(CFG, world_3d=World3DConfig(pooling=CoordPooling.MINMAX))
        col = Collator(cfg, CollatorConfig(max_len=192, frames_upbound=4))
        arrays = col([env[0]])
        g = -(-cfg.vision.num_patches_per_side // cfg.spatial_pool_stride)
        assert arrays["patch_coords"].shape == (1, 4, g, g, 2, 3)
        batch = lv3d.Batch(**{k: jnp.asarray(v) for k, v in arrays.items()
                              if k in lv3d.Batch._fields})
        params = lv3d.init_model(jax.random.PRNGKey(0), cfg)
        logits = lv3d.forward(params, cfg, batch)
        assert np.isfinite(np.asarray(logits[0, :10])).all()


class TestOnDeviceMcFallback:
    """r4: a scene missing from (or a missing) scannet_select_frames.json
    no longer KeyErrors — the EXACT on-device greedy selection
    (ops/mc_select.py) computes the ordering from the scene's pcd voxel
    set, matching the host set-cover tool (first-index tie break)."""

    def _fallback_vp(self, scene, data_cfg, tmp_path):
        import pickle
        import shutil

        from video3d_tpu.ops import geometry
        from video3d_tpu.tools.max_coverage import frame_voxel_sets

        # clone the data tree WITHOUT the select-frames artifact and with
        # a pcd voxel set derived from the REAL frame geometry (the
        # fixture's 2-corner set gives every frame zero coverage)
        root = str(tmp_path / "nosel")
        shutil.copytree(data_cfg.video_folder, root)
        os.remove(os.path.join(root, "metadata",
                               "scannet_select_frames.json"))
        cfg = replace(data_cfg, video_folder=root,
                      annotation_dir=os.path.join(root, "embodiedscan"),
                      metadata_dir=os.path.join(root, "metadata"),
                      frame_sampling=FrameSampling.MC_RATIO95)
        vp = VideoProcessor(cfg)
        files = [os.path.join(root, m["img_path"])
                 for m in vp.scene[scene["sample_idx"]]["images"]]
        fv = frame_voxel_sets(vp, scene["sample_idx"], files)
        union = sorted(set().union(*fv.values()))
        scene_id = scene["sample_idx"].split("/")[-1]
        pcd_path = os.path.join(root, "metadata", "pcd_discrete_0.1.pkl")
        with open(pcd_path, "rb") as f:
            pcd = pickle.load(f)
        pcd[scene_id] = union[::3]        # a third of the union voxels
        with open(pcd_path, "wb") as f:
            pickle.dump(pcd, f)
        return VideoProcessor(cfg), fv, pcd[scene_id]

    def test_fallback_matches_host_greedy(self, scene, data_cfg, tmp_path):
        import random

        from video3d_tpu.tools.max_coverage import greedy_max_coverage

        vp, fv, pc = self._fallback_vp(scene, data_cfg, tmp_path)
        frames = vp.select_frames(scene["sample_idx"], True, 4)
        assert frames           # selected without the offline artifact
        assert frames == sorted(
            frames, key=lambda f: int(f.split("/")[-1].split(".")[0]))

        class FirstChoice(random.Random):
            def choice(self, seq):
                return seq[0]

        order, gains = greedy_max_coverage(fv, set(map(tuple, pc)),
                                           max_frames=4, rng=FirstChoice())
        mc = vp.mc_sampling[scene["sample_idx"]]
        assert mc["frame_files"] == order
        assert mc["voxel_nums"] == gains
        # memoized: second call must not recompute
        again = vp.select_frames(scene["sample_idx"], True, 4)
        assert again == frames

    def test_fallback_without_pcd_raises(self, scene, data_cfg, tmp_path):
        import pickle
        import shutil

        root = str(tmp_path / "nopcd")
        shutil.copytree(data_cfg.video_folder, root)
        os.remove(os.path.join(root, "metadata",
                               "scannet_select_frames.json"))
        # empty pcd dict: no universe for this scene
        with open(os.path.join(root, "metadata", "pcd_discrete_0.1.pkl"),
                  "wb") as f:
            pickle.dump({}, f)
        cfg = replace(data_cfg, video_folder=root,
                      annotation_dir=os.path.join(root, "embodiedscan"),
                      metadata_dir=os.path.join(root, "metadata"),
                      frame_sampling=FrameSampling.MC_RATIO95)
        vp = VideoProcessor(cfg)
        with pytest.raises(KeyError, match="prepare_data"):
            vp.select_frames(scene["sample_idx"], True, 4)
