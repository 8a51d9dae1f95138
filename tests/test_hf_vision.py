"""Tower-family coverage (SURVEY.md M4): the generic HF tower's
feature_select golden vs the reference's HFVisionTower.feature_select, full
CLIP-family forwards vs HF transformers with every select mode, the
OpenCLIP-layout converter (fused in_proj) vs an HF CLIP ground truth, and
the builder dispatch rules."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from video3d_tpu.config import VisionConfig
from video3d_tpu.models import hf_vision as hv

REF_HF = "/root/reference/llava/model/multimodal_encoder/hf_vision.py"

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


@pytest.fixture(scope="module")
def ref_feature_select():
    if not os.path.exists(REF_HF):
        pytest.skip("reference tree absent")
    if "llava" not in sys.modules:
        pkg = types.ModuleType("llava")
        sys.modules["llava"] = pkg
    utils = types.ModuleType("llava.utils")
    utils.rank0_print = print
    sys.modules["llava.utils"] = utils
    spec = importlib.util.spec_from_file_location("ref_hf_vision", REF_HF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def run(hidden_states, select_layer, select_feature):
        tower = mod.HFVisionTower.__new__(mod.HFVisionTower)
        tower.select_layer = select_layer
        tower.select_feature = select_feature
        outs = types.SimpleNamespace(
            hidden_states=[torch.tensor(h) for h in hidden_states])
        return tower.feature_select(outs).numpy()

    return run


class TestFeatureSelect:
    @pytest.mark.parametrize("select_layer", [-2, -1, 1])
    @pytest.mark.parametrize("mode", ["patch", "cls_patch",
                                      "slicefour_patch",
                                      "slicefour_cls_patch"])
    def test_golden(self, ref_feature_select, select_layer, mode):
        rng = np.random.default_rng(0)
        hs = [rng.normal(size=(2, 10, 8)).astype(np.float32)
              for _ in range(9)]      # 8 layers + embeddings
        want = ref_feature_select(hs, select_layer, mode)
        got = np.asarray(hv.feature_select([jnp.asarray(h) for h in hs],
                                           select_layer, mode))
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


class TestHFTowerForward:
    @pytest.mark.parametrize("select_layer,mode", [
        (-2, "patch"), (-1, "cls_patch"), (-2, "slicefour_patch"),
    ])
    def test_clip_family_matches_hf(self, select_layer, mode):
        from video3d_tpu.models.clip import convert_clip

        hf = _tiny_hf_clip()
        params = convert_clip(hf.state_dict(), TINY)
        rng = np.random.default_rng(1)
        pixels = rng.normal(size=(2, 3, 42, 42)).astype(np.float32)
        with torch.no_grad():
            out = hf(torch.tensor(pixels), output_hidden_states=True)
        hs = [h.numpy() for h in out.hidden_states]
        if mode.startswith("slicefour"):
            k = len(hs) // 4
            want = np.concatenate(
                [hs[i] for i in range(k + select_layer, len(hs), k)], -1)
            want = want[:, 1:]
        else:
            want = hs[select_layer]
            if mode == "patch":
                want = want[:, 1:]
        got = np.asarray(hv.hf_vision_tower_forward(
            params, jnp.asarray(pixels), TINY, family="clip",
            select_layer=select_layer, select_feature=mode))
        np.testing.assert_allclose(got, want, rtol=4e-4, atol=4e-4)

    def test_siglip_family_hidden_count(self):
        import jax

        from video3d_tpu.models.siglip import init_vision_tower

        params = init_vision_tower(jax.random.PRNGKey(0), TINY)
        pixels = jnp.ones((1, 3, 42, 42))
        hs = hv.siglip_hidden_states(params, pixels, TINY)
        assert len(hs) == TINY.num_hidden_layers + 1
        # no CLS token: 'patch' still drops the first token (reference
        # behavior for any hf: model)
        got = hv.hf_vision_tower_forward(params, pixels, TINY,
                                         family="siglip")
        assert got.shape == (1, 9 - 1, 32)


class TestOpenCLIP:
    def _open_clip_state_from_hf(self, hf):
        """Map an HF CLIPVisionModel state dict onto open_clip visual.*
        naming (q/k/v fused into in_proj)."""
        sd = hf.state_dict()
        p = "vision_model."
        out = {
            "visual.conv1.weight": sd[p + "embeddings.patch_embedding.weight"],
            "visual.class_embedding": sd[p + "embeddings.class_embedding"],
            "visual.positional_embedding":
                sd[p + "embeddings.position_embedding.weight"],
            "visual.ln_pre.weight": sd[p + "pre_layrnorm.weight"],
            "visual.ln_pre.bias": sd[p + "pre_layrnorm.bias"],
        }
        i = 0
        while f"{p}encoder.layers.{i}.layer_norm1.weight" in sd:
            lp = f"{p}encoder.layers.{i}."
            op = f"visual.transformer.resblocks.{i}."
            out[op + "ln_1.weight"] = sd[lp + "layer_norm1.weight"]
            out[op + "ln_1.bias"] = sd[lp + "layer_norm1.bias"]
            out[op + "attn.in_proj_weight"] = torch.cat(
                [sd[lp + "self_attn.q_proj.weight"],
                 sd[lp + "self_attn.k_proj.weight"],
                 sd[lp + "self_attn.v_proj.weight"]], dim=0)
            out[op + "attn.in_proj_bias"] = torch.cat(
                [sd[lp + "self_attn.q_proj.bias"],
                 sd[lp + "self_attn.k_proj.bias"],
                 sd[lp + "self_attn.v_proj.bias"]], dim=0)
            out[op + "attn.out_proj.weight"] = sd[lp + "self_attn.out_proj.weight"]
            out[op + "attn.out_proj.bias"] = sd[lp + "self_attn.out_proj.bias"]
            out[op + "ln_2.weight"] = sd[lp + "layer_norm2.weight"]
            out[op + "ln_2.bias"] = sd[lp + "layer_norm2.bias"]
            out[op + "mlp.c_fc.weight"] = sd[lp + "mlp.fc1.weight"]
            out[op + "mlp.c_fc.bias"] = sd[lp + "mlp.fc1.bias"]
            out[op + "mlp.c_proj.weight"] = sd[lp + "mlp.fc2.weight"]
            out[op + "mlp.c_proj.bias"] = sd[lp + "mlp.fc2.bias"]
            i += 1
        return out

    def test_converter_and_forward_match_hf(self):
        """open_clip layout -> converted params -> forward == HF CLIP's
        hidden_states[-2][:, 1:] (negative layer indices align because both
        hidden lists end at the final layer output)."""
        hf = _tiny_hf_clip()
        state = self._open_clip_state_from_hf(hf)
        params = hv.convert_open_clip(state)
        rng = np.random.default_rng(2)
        pixels = rng.normal(size=(2, 3, 42, 42)).astype(np.float32)
        with torch.no_grad():
            out = hf(torch.tensor(pixels), output_hidden_states=True)
        want = out.hidden_states[-2][:, 1:].numpy()
        # HF CLIP's default activation is quick_gelu
        got = np.asarray(hv.open_clip_tower_forward(
            params, jnp.asarray(pixels), TINY, select_layer=-2,
            select_feature="patch", quick_gelu=True))
        np.testing.assert_allclose(got, want, rtol=4e-4, atol=4e-4)


class TestBuilderDispatch:
    def test_rules(self):
        assert hv.build_vision_tower("google/siglip-so400m-patch14-384",
                                     TINY).family == "siglip"
        assert hv.build_vision_tower("openai/clip-vit-large-patch14-336",
                                     TINY).family == "clip"
        assert hv.build_vision_tower("hf:some/vit", TINY).family == "hf"
        assert hv.build_vision_tower("open_clip_hub:ViT-H-14",
                                     TINY).family == "open_clip"
        assert hv.build_vision_tower("imagebind_huge",
                                     TINY).family == "imagebind"
        assert hv.build_vision_tower("openai/clip-vit", TINY,
                                     use_s2=True).family == "clip_s2"
        with pytest.raises(ValueError):
            hv.build_vision_tower("mystery-tower", TINY)

    def test_dispatch_forward_runs(self):
        import jax

        from video3d_tpu.models.clip import convert_clip  # noqa: F401

        hf = _tiny_hf_clip()
        tower = hv.build_vision_tower("openai/clip-vit-test", TINY)
        params = tower.convert(hf.state_dict())
        out = tower.forward(params, jnp.ones((1, 3, 42, 42)))
        assert out.shape == (1, 9, 32)
