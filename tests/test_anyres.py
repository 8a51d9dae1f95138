"""AnyRes 2D-image path golden tests: tiling helpers byte-identical to the
reference's mm_utils functions, and the spatial_unpad feature arrangement
identical to a torch re-derivation of llava_arch.py:574-629."""

import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest
import torch
from PIL import Image

import jax
import jax.numpy as jnp

from video3d_tpu.data import anyres as our
from video3d_tpu.data.image_processor import SigLipImageProcessor
from video3d_tpu.models import anyres as our_model

REF_MM = "/root/reference/llava/mm_utils.py"


@pytest.fixture(scope="module")
def ref_mm():
    if not os.path.exists(REF_MM):
        pytest.skip("reference not mounted")
    # llava/__init__ imports the full model stack; load mm_utils standalone
    # with a stub constants module.
    if "llava" not in sys.modules or not hasattr(sys.modules.get("llava"),
                                                 "constants"):
        pkg = types.ModuleType("llava")
        const = types.ModuleType("llava.constants")
        const.IMAGE_TOKEN_INDEX = -200
        pkg.constants = const
        sys.modules.setdefault("llava", pkg)
        sys.modules["llava.constants"] = const
    spec = importlib.util.spec_from_file_location("ref_mm_utils", REF_MM)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def random_image(w, h, seed):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


PINPOINTS = [[384, 384], [768, 384], [384, 768], [768, 768], [1152, 384]]


class TestTilingGolden:
    def test_select_best_resolution(self, ref_mm):
        rng = np.random.default_rng(0)
        for _ in range(50):
            size = (int(rng.integers(50, 2000)), int(rng.integers(50, 2000)))
            assert tuple(our.select_best_resolution(size, PINPOINTS)) == \
                tuple(ref_mm.select_best_resolution(size, PINPOINTS))

    def test_resize_and_pad(self, ref_mm):
        for seed, (w, h) in enumerate([(640, 480), (100, 900), (384, 384),
                                       (1300, 299)]):
            img = random_image(w, h, seed)
            ours = our.resize_and_pad_image(img, (768, 384))
            ref = ref_mm.resize_and_pad_image(img, (768, 384))
            np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))

    def test_divide_to_patches(self, ref_mm):
        img = random_image(768, 384, 1)
        ours = our.divide_to_patches(img, 384)
        ref = ref_mm.divide_to_patches(img, 384)
        assert len(ours) == len(ref) == 2
        for a, b in zip(ours, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_grid_shape_and_range_syntax(self, ref_mm):
        assert our.get_anyres_image_grid_shape((640, 480), PINPOINTS, 384) == \
            tuple(ref_mm.get_anyres_image_grid_shape((640, 480), PINPOINTS, 384))
        spec = "(1x1),...,(3x3)"
        assert our.get_anyres_image_grid_shape((640, 480), spec, 384) == \
            tuple(ref_mm.get_anyres_image_grid_shape((640, 480), spec, 384))
        assert our.parse_grid_pinpoints("[[384, 768], [768, 384]]", 384) == \
            [[384, 768], [768, 384]]

    def test_expand2square(self, ref_mm):
        for seed, (w, h) in enumerate([(640, 480), (100, 900), (50, 50)]):
            img = random_image(w, h, seed)
            ours = our.expand2square(img, (127, 127, 127))
            ref = ref_mm.expand2square(img, (127, 127, 127))
            np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))

    def test_process_anyres_image(self, ref_mm):
        """Full tiling pipeline: identical tensors through both stacks."""
        proc = SigLipImageProcessor(size=(384, 384))

        class TorchProcAdapter:
            size = {"shortest_edge": 384}
            crop_size = {"height": 384, "width": 384}
            image_mean = (0.5, 0.5, 0.5)

            def preprocess(self, image, return_tensors=None):
                return {"pixel_values": torch.tensor(proc.preprocess(image))}

        img = random_image(777, 481, 3)
        ours = our.process_anyres_image(img, proc, PINPOINTS)
        ref = ref_mm.process_anyres_image(img, TorchProcAdapter(), PINPOINTS)
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)

    def test_resize_and_center_crop(self, ref_mm):
        for seed, (w, h) in enumerate([(640, 480), (300, 900), (512, 512)]):
            img = random_image(w, h, seed + 10)
            ours = our.resize_and_center_crop(img, 384)
            ref = ref_mm.resize_and_center_crop(img, 384)
            np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))

    def test_extract_patches(self, ref_mm):
        for overlap in (0.0, 0.5):
            img = random_image(900, 700, 7)
            ours = our.extract_patches(img, 384, overlap)
            ref = ref_mm.extract_patches(img, 384, overlap)
            assert len(ours) == len(ref)
            for a, b in zip(ours, ref):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_process_highres_image(self, ref_mm):
        """highres mode (mm_utils.py:98-116) — identical tensors."""
        proc = SigLipImageProcessor(size=(384, 384))

        class TorchProcAdapter:
            size = {"shortest_edge": 384}
            crop_size = {"height": 384, "width": 384}
            image_mean = (0.5, 0.5, 0.5)

            def preprocess(self, image, return_tensors=None):
                return {"pixel_values": torch.tensor(proc.preprocess(image))}

        img = random_image(777, 481, 11)
        ours = our.process_highres_image(img, proc, "384,768")
        ref = ref_mm.process_highres_image(img, TorchProcAdapter(), "384,768")
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)
        via_dispatch = our.process_images_2d([img], proc, "highres",
                                             "384,768")[0]
        np.testing.assert_allclose(via_dispatch, ours, atol=0)

    def test_process_highres_image_crop_split(self, ref_mm):
        """crop_split mode (mm_utils.py:87-96) — identical tensors."""
        import types

        proc = SigLipImageProcessor(size=(384, 384))

        class TorchProcAdapter:
            size = {"shortest_edge": 384}
            crop_size = {"height": 384, "width": 384}
            image_mean = (0.5, 0.5, 0.5)

            def preprocess(self, image, return_tensors=None):
                return {"pixel_values": torch.tensor(proc.preprocess(image))}

        data_args = types.SimpleNamespace(image_crop_resolution=768,
                                          image_split_resolution=384)
        img = random_image(1000, 600, 12)
        ours = our.process_highres_image_crop_split(img, proc, 768, 384)
        ref = ref_mm.process_highres_image_crop_split(img, data_args,
                                                      TorchProcAdapter())
        assert ours.shape[0] == 4       # 768/384 -> 2x2 tiles, no base view
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)

    def test_process_images_2d_pad_mode(self, ref_mm):
        proc = SigLipImageProcessor(size=(384, 384))
        img = random_image(640, 480, 4)
        out = our.process_images_2d([img], proc, "pad")
        bg = tuple(int(x * 255) for x in proc.image_mean)
        ref = proc.preprocess(ref_mm.expand2square(img, bg))
        np.testing.assert_allclose(out, ref, atol=1e-6)


def torch_arrange(tile_feats, image_size, npw, nph, hw, newline,
                  image_aspect_ratio="anyres", merge="spatial_unpad",
                  max_num_patches=None):
    """Re-derivation of llava_arch.py:574-629 (spatial_unpad branch) +
    unpad_image (llava_arch.py:147-177) in torch."""
    t = torch.tensor(np.asarray(tile_feats))
    base, feat = t[0], t[1:]
    D = feat.shape[-1]
    feat = feat.view(nph, npw, hw, hw, D)
    if "unpad" in merge:
        feat = feat.permute(4, 0, 2, 1, 3).contiguous().flatten(1, 2).flatten(2, 3)
        ow, oh = image_size
        _, ch, cw = feat.shape
        if ow / oh > cw / ch:
            scale = cw / ow
            nh = int(oh * scale)
            pad = (ch - nh) // 2
            feat = feat[:, pad:ch - pad, :]
        else:
            scale = ch / oh
            nw = int(ow * scale)
            pad = (cw - nw) // 2
            feat = feat[:, :, pad:cw - pad]
        if max_num_patches is not None:
            unit = hw
            c, h, w = feat.shape
            times = math.sqrt(h * w / (max_num_patches * unit ** 2))
            if times > 1.1:
                feat = torch.nn.functional.interpolate(
                    feat[None], [int(h // times), int(w // times)],
                    mode="bilinear")[0]
        nl = torch.tensor(np.asarray(newline))[:, None, None].expand(
            *feat.shape[:-1], 1)
        feat = torch.cat((feat, nl), dim=-1)
        feat = feat.flatten(1, 2).transpose(0, 1)
    else:
        feat = feat.permute(0, 2, 1, 3, 4).contiguous().flatten(0, 3)
    if "nobase" not in merge:
        feat = torch.cat((base, feat), dim=0)
    return feat.numpy()


class TestArrangeGolden:
    hw = 4          # tiny tower: 56/14 = 4 patches per side

    def _feats(self, n_tiles, seed=0):
        rng = np.random.default_rng(seed)
        return (rng.normal(size=(n_tiles + 1, self.hw * self.hw, 16))
                .astype(np.float32),
                rng.normal(size=(16,)).astype(np.float32))

    @pytest.mark.parametrize("image_size,pin", [
        ((640, 480), [[112, 56], [56, 112], [112, 112]]),
        ((100, 900), [[112, 56], [56, 112], [112, 112]]),
    ])
    def test_spatial_unpad(self, image_size, pin):
        npw, nph = our.get_anyres_image_grid_shape(image_size, pin, 56)
        feats, newline = self._feats(npw * nph)
        ref = torch_arrange(feats, image_size, npw, nph, self.hw, newline)
        got = our_model.arrange_anyres_features(
            jnp.asarray(feats), image_size, pin, 56, self.hw,
            jnp.asarray(newline))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-6)

    def test_anyres_max_shrinks(self):
        pin = [[224, 224]]          # 4x4 tiles of 56
        image_size = (800, 790)
        npw, nph = our.get_anyres_image_grid_shape(image_size, pin, 56)
        feats, newline = self._feats(npw * nph, seed=1)
        ref = torch_arrange(feats, image_size, npw, nph, self.hw, newline,
                            image_aspect_ratio="anyres_max_4",
                            max_num_patches=4)
        got = our_model.arrange_anyres_features(
            jnp.asarray(feats), image_size, pin, 56, self.hw,
            jnp.asarray(newline), image_aspect_ratio="anyres_max_4")
        assert got.shape[0] < (npw * nph + 1) * self.hw ** 2  # actually shrank
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)

    def test_spatial_no_unpad(self):
        pin = [[112, 56]]
        image_size = (600, 300)
        npw, nph = our.get_anyres_image_grid_shape(image_size, pin, 56)
        feats, newline = self._feats(npw * nph, seed=2)
        ref = torch_arrange(feats, image_size, npw, nph, self.hw, newline,
                            merge="spatial")
        got = our_model.arrange_anyres_features(
            jnp.asarray(feats), image_size, pin, 56, self.hw,
            jnp.asarray(newline), patch_merge_type="spatial")
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-6)

    def test_highres_fixed_2x2_grid(self):
        """Non-anyres aspects view the tiles as a hardcoded 2x2
        (llava_arch.py:596-597)."""
        feats, newline = self._feats(4, seed=3)
        image_size = (500, 500)
        ref = torch_arrange(feats, image_size, 2, 2, self.hw, newline,
                            merge="spatial_unpad")
        got = our_model.arrange_anyres_features(
            jnp.asarray(feats), image_size, None, 56, self.hw,
            jnp.asarray(newline), image_aspect_ratio="highres")
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-6)

    def test_flat_merge(self):
        """'flat' flattens all tiles incl. the base (llava_arch.py:518-519)."""
        feats, newline = self._feats(3, seed=4)
        got = our_model.arrange_anyres_features(
            jnp.asarray(feats), (100, 100), None, 56, self.hw,
            jnp.asarray(newline), image_aspect_ratio="crop_split",
            patch_merge_type="flat")
        np.testing.assert_allclose(np.asarray(got),
                                   feats.reshape(-1, feats.shape[-1]),
                                   rtol=0, atol=0)

    @pytest.mark.parametrize("image_size,aspect,merge", [
        ((640, 480), "anyres", "spatial_unpad"),
        ((100, 900), "anyres", "spatial_unpad"),
        ((600, 300), "anyres", "spatial"),
        ((640, 480), "anyres", "spatial_unpad_nobase"),
        ((500, 500), "highres", "spatial_unpad"),
        ((256, 256), "crop_split", "flat"),
    ])
    def test_gather_plan_matches_dynamic_arrange(self, image_size, aspect,
                                                 merge):
        """The static gather plan reproduces arrange_anyres_features (which
        is golden vs the torch re-derivation) token for token."""
        pin = [[112, 56], [56, 112], [112, 112]]
        if aspect == "anyres":
            npw, nph = our.get_anyres_image_grid_shape(image_size, pin, 56)
        else:
            npw = nph = 2
        feats, newline = self._feats(npw * nph, seed=5)
        want = np.asarray(our_model.arrange_anyres_features(
            jnp.asarray(feats), image_size, pin, 56, self.hw,
            jnp.asarray(newline), image_aspect_ratio=aspect,
            patch_merge_type=merge))

        gather, nl_mask = our_model.build_anyres_gather_plan(
            image_size, pin, 56, self.hw, image_aspect_ratio=aspect,
            patch_merge_type=merge)
        assert gather.shape[0] == want.shape[0]
        flat = feats.reshape(-1, feats.shape[-1])
        got = np.where(nl_mask[:, None], newline[None, :], flat[gather])
        np.testing.assert_allclose(got, want, rtol=0, atol=0)

    def test_encode_image_2d_batch_matches_per_sample(self):
        """Batched gather-plan encoder == per-sample dynamic encode_image_2d
        (zero-padded tiles + plan padding)."""
        import jax

        from video3d_tpu.config import ModelConfig

        cfg = ModelConfig.tiny()
        import video3d_tpu.models.llava_video3d as lv3d
        params = lv3d.init_model(jax.random.PRNGKey(0), cfg)
        pin = [[112, 56], [56, 112], [112, 112]]
        from video3d_tpu.data.image_processor import SigLipImageProcessor
        proc = SigLipImageProcessor(size=(56, 56))
        sizes = [(300, 200), (120, 500)]
        tiles_list = [our.process_anyres_image(random_image(*sz, seed=i), proc,
                                               pin)
                      for i, sz in enumerate(sizes)]
        plans = [our_model.build_anyres_gather_plan(sz, pin, 56, 4)
                 for sz in sizes]

        maxT = max(t.shape[0] for t in tiles_list)
        Tv = max(p[0].shape[0] for p in plans)
        B = len(sizes)
        tiles = np.zeros((B, maxT, 3, 56, 56), np.float32)
        gather = np.zeros((B, Tv), np.int32)
        nl = np.zeros((B, Tv), bool)
        valid = np.zeros((B, Tv), bool)
        for b, (t, (g, m)) in enumerate(zip(tiles_list, plans)):
            tiles[b, :t.shape[0]] = t
            gather[b, :g.shape[0]] = g
            nl[b, :m.shape[0]] = m
            valid[b, :g.shape[0]] = True

        batched = np.asarray(our_model.encode_image_2d_batch(
            params, cfg, jnp.asarray(tiles), jnp.asarray(gather),
            jnp.asarray(nl), jnp.asarray(valid)))
        for b, (t, sz, (g, m)) in enumerate(zip(tiles_list, sizes, plans)):
            want = np.asarray(our_model.encode_image_2d(
                params, cfg, jnp.asarray(t), sz, pin))
            n = want.shape[0]
            np.testing.assert_allclose(batched[b, :n], want, rtol=2e-5,
                                       atol=2e-5)
            assert not batched[b, n:].any()   # padding rows zeroed


class TestEncodeImage2D:
    def test_end_to_end(self):
        from video3d_tpu.config import ModelConfig
        from video3d_tpu.models import llava_video3d as lv3d

        cfg = ModelConfig.tiny()
        params = lv3d.init_model(jax.random.PRNGKey(0), cfg)
        proc = SigLipImageProcessor(size=(56, 56))
        pin = [[112, 56], [56, 112], [112, 112]]
        img = random_image(300, 200, 5)
        tiles = our.process_anyres_image(img, proc, pin)
        assert tiles.shape[1:] == (3, 56, 56)
        feat = our_model.encode_image_2d(params, cfg, jnp.asarray(tiles),
                                         img.size, pin)
        hw = cfg.vision.num_patches_per_side
        npw, nph = our.get_anyres_image_grid_shape(img.size, pin, 56)
        assert feat.ndim == 2 and feat.shape[1] == cfg.llm.hidden_size
        assert feat.shape[0] > hw * hw   # base + at least some grid tokens
        assert np.isfinite(np.asarray(feat, np.float32)).all()


class TestEngine2D:
    def test_generate_answer_image(self, tmp_path):
        """Full 2D-image QA through the engine (no scene/video involved)."""
        from video3d_tpu.config import DataConfig, ModelConfig
        from video3d_tpu.data.video_processor import VideoProcessor
        from video3d_tpu.eval.drivers import EngineConfig, InferenceEngine
        from video3d_tpu.models import llava_video3d as lv3d
        sys.path.insert(0, os.path.dirname(__file__))
        from fixtures import FakeTokenizer

        cfg = ModelConfig.tiny()
        params = lv3d.init_model(jax.random.PRNGKey(0), cfg)
        tok = FakeTokenizer()
        engine = InferenceEngine(
            params, cfg, tok, VideoProcessor(DataConfig(video_folder=str(tmp_path))),
            SigLipImageProcessor(size=(56, 56)),
            EngineConfig(max_new_tokens=4, eos_token_id=tok.eos_token_id,
                         buckets=(256,), stop_str=""),
            device_geometry=False)
        ans = engine.generate_answer_image(
            "what color is the chair", random_image(300, 200, 7),
            grid_pinpoints=[[112, 56], [56, 112], [112, 112]])
        assert isinstance(ans, str)
        # pad mode smoke via explicit aspect override
        ans2 = engine.generate_answer_image(
            "<image>\ndescribe", random_image(80, 200, 8),
            image_aspect_ratio="anyres_max_2",
            grid_pinpoints=[[112, 112]])
        assert isinstance(ans2, str)
