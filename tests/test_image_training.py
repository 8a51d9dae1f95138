"""2D-image training modality end to end (the reference train_3d.py image
branch, :1130-1171): dataset image loading + anyres tiling, the static
gather-plan collator, and a full train_step — plus logits parity between the
batched gather-plan forward and the per-sample dynamic image path."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from video3d_tpu.config import DataConfig, ModelConfig, replace
from video3d_tpu.data.dataset import Collator, CollatorConfig, SupervisedDataset
from video3d_tpu.models import llava_video3d as lv3d

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import FakeTokenizer  # noqa: E402

PIN = ((112, 56), (56, 112), (112, 112))
CFG = replace(ModelConfig.tiny(), image_grid_pinpoints=PIN,
              image_aspect_ratio="anyres", mm_patch_merge_type="spatial_unpad")


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgtrain")
    rng = np.random.default_rng(0)
    for i, (w, h) in enumerate([(300, 200), (120, 400)]):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            root / f"img{i}.png")
    recs = [
        {"id": i, "image": f"img{i}.png",
         "metadata": {"dataset": "scanqa"},
         "conversations": [
             {"from": "human", "value": "<image>\nwhat is shown here"},
             {"from": "gpt", "value": "a synthetic test pattern"}]}
        for i in range(2)
    ]
    with open(root / "data.json", "w") as f:
        json.dump(recs, f)
    return root


@pytest.fixture(scope="module")
def batch(data_dir):
    dcfg = DataConfig(video_folder=str(data_dir),
                      image_folder=str(data_dir),
                      image_aspect_ratio="anyres",
                      image_grid_pinpoints=PIN,
                      add_spatial_instruction=False)
    from video3d_tpu.data.image_processor import SigLipImageProcessor

    ds = SupervisedDataset(str(data_dir / "data.json"), FakeTokenizer(), dcfg,
                           image_processor=SigLipImageProcessor(size=(56, 56)))
    samples = [ds[0], ds[1]]
    assert all("image_tiles" in s for s in samples)
    col = Collator(CFG, CollatorConfig(max_len=256))
    arrays = col(samples)
    fields = {k: (jnp.asarray(v) if v is not None else None)
              for k, v in arrays.items() if k in lv3d.Batch._fields}
    return arrays, lv3d.Batch(**fields)


class TestImageCollator:
    def test_shapes_and_plans(self, batch):
        arrays, b = batch
        B, Tv = arrays["vision_gather"].shape
        assert B == 2
        assert arrays["image_tiles"].shape[0] == 2
        # each sample's valid rows equal its own plan length
        assert arrays["vision_valid"].sum(axis=1).min() > 0
        # the splice plan references exactly Tv_b vision slots per sample
        from video3d_tpu.models.splice import KIND_VISION

        for row in range(B):
            n_vision = int((arrays["kind"][row] == KIND_VISION).sum())
            assert n_vision == int(arrays["vision_valid"][row].sum())

    def test_forward_finite_and_vision_rows_match_dynamic(self, batch):
        """Forward produces finite logits; the batched vision block equals
        the per-sample dynamic encode_image_2d block (the gather-plan ==
        dynamic-arrange equivalence is golden-tested in test_anyres; here we
        confirm it holds through the collator's real plans)."""
        from video3d_tpu.models.anyres import (encode_image_2d,
                                               encode_image_2d_batch)

        arrays, b = batch
        params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
        logits = lv3d.forward(params, CFG, b)
        assert np.isfinite(np.asarray(logits, np.float32)).all()

        batched = np.asarray(encode_image_2d_batch(
            params, CFG, b.image_tiles, b.vision_gather, b.vision_newline,
            b.vision_valid))
        sizes = [(300, 200), (120, 400)]
        for row, sz in enumerate(sizes):
            nz = np.abs(arrays["image_tiles"][row]).sum(axis=(1, 2, 3)) > 0
            n_tiles = int(nz.sum())
            dyn = np.asarray(encode_image_2d(
                params, CFG,
                jnp.asarray(arrays["image_tiles"][row, :n_tiles]), sz,
                list(map(list, PIN))))
            n = dyn.shape[0]
            np.testing.assert_allclose(batched[row, :n], dyn, rtol=3e-5,
                                       atol=3e-5)

    def test_train_step_runs(self, batch):
        import optax

        from video3d_tpu.train.train_step import create_train_state, train_step

        _, b = batch
        params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
        # train_step donates the state; snapshot a vision leaf first
        before = np.asarray(params["vision"]["patch_embed"]["w"]).copy()
        tx = optax.adamw(1e-4)
        state = create_train_state(params, tx)
        state, metrics = train_step(state, b, CFG, tx, remat=True)
        assert np.isfinite(float(metrics["lm_loss"]))
        assert float(metrics["grad_norm"]) > 0
        # vision params received gradients through the tiles
        after = np.asarray(state.params["vision"]["patch_embed"]["w"])
        assert np.abs(after - before).max() > 0
