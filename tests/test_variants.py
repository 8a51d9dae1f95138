"""Component-variant tests: CLIP tower HF parity, newline-position modes,
mlp/score ground heads, projector variants."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from video3d_tpu.config import (GroundHeadType, ModelConfig, NewlinePosition,
                                VisionConfig, replace)
from video3d_tpu.models import llava_video3d as lv3d

CFG = ModelConfig.tiny()


class TestClipTower:
    def test_matches_hf_penultimate_patch_features(self):
        from transformers import CLIPVisionConfig, CLIPVisionModel

        from video3d_tpu.models.clip import clip_tower_forward, convert_clip

        torch.manual_seed(0)
        hf_cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                                  num_hidden_layers=3, num_attention_heads=4,
                                  image_size=42, patch_size=14,
                                  projection_dim=16,
                                  attn_implementation="eager")
        hf = CLIPVisionModel(hf_cfg).eval()
        cfg = VisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=4,
                           image_size=42, patch_size=14, layer_norm_eps=1e-5)
        params = convert_clip(hf.state_dict(), cfg)

        rng = np.random.default_rng(0)
        pixels = rng.normal(size=(2, 3, 42, 42)).astype(np.float32)
        with torch.no_grad():
            out = hf(torch.tensor(pixels), output_hidden_states=True)
        # LLaVA: hidden_states[-2][:, 1:] ('patch' select, layer -2)
        ref = out.hidden_states[-2][:, 1:].numpy()
        got = np.asarray(clip_tower_forward(params, jnp.asarray(pixels), cfg,
                                            select_layer=-2))
        assert got.shape == ref.shape == (2, 9, 32)
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


class TestNewlineModes:
    @pytest.fixture(scope="class")
    def inputs(self):
        params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
        rng = np.random.default_rng(0)
        S = CFG.vision.image_size
        images = jnp.asarray(rng.normal(size=(1, 2, 3, S, S)).astype(np.float32))
        return params, images

    def test_token_counts(self, inputs):
        params, images = inputs
        g = -(-CFG.vision.num_patches_per_side // CFG.spatial_pool_stride)
        V = 2
        for pos, expect in ((NewlinePosition.GRID, V * g * (g + 1)),
                            (NewlinePosition.FRAME, V * (g * g + 1)),
                            (NewlinePosition.ONE_TOKEN, V * g * g + 1),
                            (NewlinePosition.NO_TOKEN, V * g * g)):
            cfg = replace(CFG, newline_position=pos)
            vt = lv3d.encode_video(params, cfg, images, None)
            assert vt.spliceable.shape[1] == expect, pos
            assert cfg.total_vision_tokens(V) == expect, pos

    def test_frame_mode_layout(self, inputs):
        """FRAME: each frame's tokens then one newline (llava_arch.py:330-334)."""
        params, images = inputs
        g = -(-CFG.vision.num_patches_per_side // CFG.spatial_pool_stride)
        cfg = replace(CFG, newline_position=NewlinePosition.FRAME)
        vt = lv3d.encode_video(params, cfg, images, None)
        nl = np.asarray(params["image_newline"])
        got = np.asarray(vt.spliceable[0])
        T = g * g + 1
        np.testing.assert_allclose(got[T - 1], nl, rtol=1e-5)
        np.testing.assert_allclose(got[2 * T - 1], nl, rtol=1e-5)


class TestGroundHeadVariants:
    @pytest.fixture(scope="class")
    def feats(self):
        rng = np.random.default_rng(0)
        D = CFG.llm.hidden_size
        obj = jnp.asarray(rng.normal(size=(5, D)).astype(np.float32))
        valid = jnp.asarray([True, True, True, False, False])
        q = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
        return obj, valid, q

    @pytest.mark.parametrize("head", [GroundHeadType.MLP, GroundHeadType.SCORE])
    def test_scores_shape(self, feats, head):
        obj, valid, q = feats
        cfg = replace(CFG, ground_head=head)
        params = {"ground_head": lv3d.init_ground_head(
            jax.random.PRNGKey(1), CFG.llm.hidden_size, head_type=head)}
        s = np.asarray(lv3d.ground_scores(params, q, obj, valid, cfg))
        assert s.shape == (5,)
        assert np.isfinite(s[:3]).all() and np.isinf(s[3:]).all()

    def test_bce_loss_finite_and_weighted(self, feats):
        obj, valid, q = feats
        scores = jnp.asarray([1.0, -2.0, 0.5, -jnp.inf, -jnp.inf])
        hot = jnp.asarray([1.0, 0, 0, 0, 0])
        loss = lv3d.bce_ground_loss(scores, hot)
        assert np.isfinite(float(loss)) and float(loss) > 0


class TestProjectorVariants:
    def test_linear_and_identity(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 8)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(lv3d.project_features({}, x)),
                                   np.asarray(x))
        p = {"w1": jnp.ones((8, 6)), "b1": jnp.zeros((6,))}
        out = lv3d.project_features(p, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x @ p["w1"]),
                                   rtol=1e-6)
