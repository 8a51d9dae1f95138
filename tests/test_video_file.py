"""Real-video-file modality (data/video_file.py + engine
generate_answer_video_file): decord-contract frame sampling on cv2, the
add_time_instruction prompt string, and end-to-end generation without 3D
world PE."""

import os

import numpy as np
import pytest

import jax

from video3d_tpu.config import DataConfig, ModelConfig
from video3d_tpu.data.image_processor import SigLipImageProcessor
from video3d_tpu.data.video_file import load_video_file, time_instruction
from video3d_tpu.data.video_processor import VideoProcessor
from video3d_tpu.eval.drivers import EngineConfig, InferenceEngine
from video3d_tpu.models import llava_video3d as lv3d

from fixtures import FakeTokenizer, make_fake_scene

CFG = ModelConfig.tiny()


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24.0,
                        (64, 48))
    if not w.isOpened():
        pytest.skip("no mp4 encoder in this cv2 build")
    rng = np.random.default_rng(0)
    for i in range(72):                       # 3 s @ 24 fps
        frame = np.full((48, 64, 3), i * 3 % 256, np.uint8)
        frame[:8, :8] = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        w.write(frame)
    w.release()
    if not os.path.exists(path) or os.path.getsize(path) == 0:
        pytest.skip("cv2 mp4 write produced nothing")
    return path


class TestLoader:
    def test_fps_sampling(self, video_path):
        """72 frames @ 24 fps, video_fps=1 -> every 24th frame: 0, 24, 48."""
        frames, vtime, ftime, n = load_video_file(video_path, video_fps=1)
        assert n == 3 and frames.shape == (3, 48, 64, 3)
        assert abs(vtime - 3.0) < 0.05
        assert ftime == "0.00s,1.00s,2.00s"
        # content check: brightness ramp i*3 -> frame 24 is brighter than 0
        assert frames[1].mean() > frames[0].mean()

    def test_upbound_uniform_resample(self, video_path):
        """force_sample/upbound -> np.linspace over the whole clip
        (llava/utils.py:36-39)."""
        frames, vtime, ftime, n = load_video_file(video_path, video_fps=12,
                                                  frames_upbound=5,
                                                  force_sample=True)
        assert n == 5 and frames.shape[0] == 5
        want_idx = np.linspace(0, 71, 5, dtype=int)
        want = ",".join(f"{i/24.0:.2f}s" for i in want_idx)
        assert ftime == want

    def test_time_instruction_string(self):
        s = time_instruction(3.0, 3, "0.00s,1.00s,2.00s")
        assert s == ("The video lasts for 3.00 seconds, and 3 frames are "
                     "uniformly sampled from it. These frames are located "
                     "at 0.00s,1.00s,2.00s.Please answer the following "
                     "questions related to this video.")


class TestEngineVideoFile:
    def test_generate_answer_video_file(self, video_path, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("data"))
        make_fake_scene(root, n_frames=3)
        data_cfg = DataConfig(video_folder=root,
                              annotation_dir=os.path.join(root,
                                                          "embodiedscan"),
                              metadata_dir=os.path.join(root, "metadata"),
                              frames_upbound=3)
        tok = FakeTokenizer()
        params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
        engine = InferenceEngine(
            params, CFG, tok, VideoProcessor(data_cfg),
            SigLipImageProcessor(size=(CFG.vision.image_size,) * 2),
            EngineConfig(max_new_tokens=4, eos_token_id=tok.eos_token_id,
                         max_frames=3, buckets=(256,), stop_str="",
                         ground_token_id=tok.vocab["<ground>"]))
        out = engine.generate_answer_video_file("what happens here",
                                                video_path,
                                                add_time_instruction=True)
        assert isinstance(out, str)
        # the 3D scene path still works on the same engine afterwards
        # (cfg swap in _generate must restore)
        assert engine.cfg is CFG


class TestVideoFileTraining:
    def test_dataset_and_train_step(self, video_path, tmp_path):
        """A dataset record pointing at a REAL mp4 trains end-to-end:
        frames loaded with the decord contract, zero world coords, time
        instruction in the prompt, gradient step finite under a PE-none
        config (the reference's plain-video modality, train.py:1194)."""
        import json

        import jax.numpy as jnp

        from video3d_tpu.config import (DataConfig, PosEmbedType, replace)
        from video3d_tpu.data.dataset import (Collator, CollatorConfig,
                                              SupervisedDataset)
        from video3d_tpu.train.train_step import (create_train_state,
                                                  train_step)
        import optax

        cfg = replace(CFG, world_3d=replace(CFG.world_3d,
                                            pos_embed=PosEmbedType.NONE))
        ann = str(tmp_path / "ann.json")
        with open(ann, "w") as f:
            json.dump([{
                "id": "v0", "video": video_path,
                "conversations": [
                    {"from": "human", "value": "<image>\nwhat happens"},
                    {"from": "gpt", "value": "a gradient ramps up"}],
            }], f)
        ds = SupervisedDataset(
            ann, FakeTokenizer(),
            DataConfig(video_folder="", annotation_dir="", metadata_dir="",
                       frames_upbound=3, add_time_instruction=True),
            image_processor=SigLipImageProcessor(
                size=(cfg.vision.image_size,) * 2))
        item = ds[0]
        assert item["video_size"] == 3
        assert item["images"].shape[0] == 3
        assert (item["world_coords"] == 0).all()
        # time instruction made it into the tokenized prompt:
        # FakeTokenizer round-trips words, so just check ids are non-trivial
        assert len(item["input_ids"]) > 10

        col = Collator(cfg, CollatorConfig(max_len=224, frames_upbound=3))
        arrays = col([item])
        batch = lv3d.Batch(**{k: (jnp.asarray(v) if v is not None else None)
                              for k, v in arrays.items()
                              if k in lv3d.Batch._fields})
        params = lv3d.init_model(jax.random.PRNGKey(0), cfg)
        tx = optax.sgd(1e-3)
        state = create_train_state(params, tx)
        state, metrics = train_step(state, batch, cfg, tx, remat=False)
        assert np.isfinite(float(metrics["lm_loss"]))
