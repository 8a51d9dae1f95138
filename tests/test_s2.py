"""CLIPVisionTowerS2 (SURVEY.md M4; clip_encoder.py:125-176): the native
multi-scale tower vs a torch re-derivation of s2wrapper's
``multiscale_forward`` (split_forward=True) over an HF CLIP ground truth,
plus torch-parity tests for the bicubic / area resize matrices it uses."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from video3d_tpu.config import VisionConfig
from video3d_tpu.models import clip as clip_mod
from video3d_tpu.models import hf_vision as hv
from video3d_tpu.ops.resize import area_downsample, bicubic_resize

TINY = VisionConfig(hidden_size=32, intermediate_size=64,
                    num_hidden_layers=4, num_attention_heads=4,
                    image_size=42, patch_size=14, layer_norm_eps=1e-5)


def _tiny_hf_clip():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(0)
    hf_cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=4, num_attention_heads=4,
                              image_size=42, patch_size=14, projection_dim=16,
                              attn_implementation="eager")
    return CLIPVisionModel(hf_cfg).eval()


class TestResizeOps:
    @pytest.mark.parametrize("in_size,out_size",
                             [(126, 42), (126, 84), (42, 42), (17, 40),
                              (40, 17)])
    def test_bicubic_matches_torch(self, in_size, out_size):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 3, in_size, in_size)).astype(np.float32)
        want = F.interpolate(torch.tensor(x), size=out_size,
                             mode="bicubic").numpy()
        got = np.asarray(bicubic_resize(jnp.asarray(x), out_size, out_size))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("in_size,out_size", [(9, 3), (8, 4), (6, 6)])
    def test_area_matches_torch(self, in_size, out_size):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 5, in_size, in_size)).astype(np.float32)
        want = F.interpolate(torch.tensor(x), size=out_size,
                             mode="area").numpy()
        got = np.asarray(area_downsample(jnp.asarray(x), out_size))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def _torch_multiscale(model_fn, x, img_sizes, max_split_size):
    """s2wrapper.forward re-derived in torch (multiscale_forward with
    split_forward=True, output_shape='bnc', resize_output_to_idx=0)."""
    b = x.shape[0]
    num_splits = [math.ceil(s / max_split_size) for s in img_sizes]
    merged = []
    for s, n in zip(img_sizes, num_splits):
        xs = F.interpolate(x.float(), size=s, mode="bicubic").to(x.dtype)
        h = s // n
        tiles = torch.cat([xs[:, :, i * h:(i + 1) * h, j * h:(j + 1) * h]
                           for i in range(n) for j in range(n)], dim=0)
        feats = model_fn(tiles).to(x.dtype)            # (n²b, g², d)
        g = int(feats.shape[1] ** 0.5)
        f = feats.transpose(1, 2).reshape(n * n * b, -1, g, g)
        rows = [torch.cat([f[(i * n + j) * b:(i * n + j + 1) * b]
                           for j in range(n)], dim=-1) for i in range(n)]
        merged.append(torch.cat(rows, dim=-2))
    size0 = merged[0].shape[-1]
    merged = [F.interpolate(m.float(), size=size0, mode="area").to(m.dtype)
              for m in merged]
    out = torch.cat(merged, dim=1)
    return out.flatten(2).transpose(1, 2)


class TestS2Tower:
    def test_golden_vs_torch_rederivation(self):
        hf = _tiny_hf_clip()
        params = clip_mod.convert_clip(
            {k: v for k, v in hf.state_dict().items()}, TINY)
        rng = np.random.default_rng(2)
        pixels = rng.normal(size=(2, 3, 126, 126)).astype(np.float32)

        def model_fn(t):
            with torch.no_grad():
                out = hf(t, output_hidden_states=True)
            return out.hidden_states[-2][:, 1:]

        want = _torch_multiscale(model_fn, torch.tensor(pixels),
                                 [42, 84, 126], 42).numpy()
        got = np.asarray(clip_mod.clip_s2_forward(
            params, jnp.asarray(pixels), TINY, scales=(42, 84, 126)))
        assert got.shape == (2, 9, 96)        # g²=9 tokens, 3·D channels
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_builder_dispatch(self):
        tower = hv.build_vision_tower("openai/clip-vit-large-patch14-336",
                                      TINY, use_s2=True,
                                      s2_scales="42,84,126")
        assert tower.family == "clip_s2"
        hf = _tiny_hf_clip()
        params = tower.convert({k: v for k, v in hf.state_dict().items()})
        out = tower.forward(params,
                            jnp.zeros((1, 3, 126, 126), jnp.float32))
        assert out.shape == (1, 9, 96)
