"""Native ImageBind vision tower vs a torch twin.

The external ``imagebind`` package (and its checkpoint) is unavailable here
— as it is for the reference (multimodal_encoder/imagebind.py:6-11 swallows
the ImportError). So the golden builds the *same architecture* from torch
primitives only (Conv3d / MultiheadAttention / LayerNorm / Linear / GELU),
names its parameters with the official ImageBind state-dict keys, and
checks that convert_imagebind + imagebind_vision_forward reproduce the
torch forward exactly: 2-frame PadIm2Video repeat through Conv3d(2,14,14)
vs our temporally-folded patchify, packed in_proj splitting, pre-norm
block chain, head selection and L2 normalization."""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from video3d_tpu.models.imagebind import (ImageBindConfig, convert_imagebind,
                                          imagebind_vision_forward,
                                          init_imagebind)

CFG = ImageBindConfig(hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, patch_size=14, image_size=56,
                      out_dim=32)


def torch_twin_state(cfg: ImageBindConfig, seed=0):
    """Random params under the official ImageBind state-dict names."""
    g = torch.Generator().manual_seed(seed)
    D, M = cfg.hidden_size, cfg.hidden_size * cfg.mlp_ratio
    n_tok = (cfg.image_size // cfg.patch_size) ** 2 + 1
    r = lambda *s: torch.randn(*s, generator=g) * 0.05
    state = {
        "modality_preprocessors.vision.cls_token": r(1, 1, D),
        "modality_preprocessors.vision.rgbt_stem.proj.1.weight":
            r(D, 3, 2, cfg.patch_size, cfg.patch_size),
        "modality_preprocessors.vision.pos_embedding_helper.pos_embed":
            r(1, n_tok, D),
        "modality_trunks.vision.pre_transformer_layer.0.weight": 1 + r(D),
        "modality_trunks.vision.pre_transformer_layer.0.bias": r(D),
        "modality_heads.vision.0.weight": 1 + r(D),
        "modality_heads.vision.0.bias": r(D),
        "modality_heads.vision.2.weight": r(cfg.out_dim, D),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"modality_trunks.vision.blocks.{i}."
        state.update({
            p + "norm_1.weight": 1 + r(D), p + "norm_1.bias": r(D),
            p + "attn.in_proj_weight": r(3 * D, D),
            p + "attn.in_proj_bias": r(3 * D),
            p + "attn.out_proj.weight": r(D, D),
            p + "attn.out_proj.bias": r(D),
            p + "norm_2.weight": 1 + r(D), p + "norm_2.bias": r(D),
            p + "mlp.fc1.weight": r(M, D), p + "mlp.fc1.bias": r(M),
            p + "mlp.fc2.weight": r(D, M), p + "mlp.fc2.bias": r(D),
        })
    return state


def torch_forward(state, x, cfg: ImageBindConfig):
    """The imagebind_huge vision path from torch primitives (architecture
    per the public facebookresearch/ImageBind model definition)."""
    import torch.nn.functional as F

    D = cfg.hidden_size
    eps = cfg.layer_norm_eps
    ln = lambda t, k: F.layer_norm(t, (t.shape[-1],), state[k + ".weight"],
                                   state[k + ".bias"], eps)
    # PadIm2Video(repeat, 2) + Conv3d stem
    clip = x.unsqueeze(2).repeat(1, 1, 2, 1, 1)            # (B,3,2,H,W)
    w3d = state["modality_preprocessors.vision.rgbt_stem.proj.1.weight"]
    t = F.conv3d(clip, w3d, stride=(2, cfg.patch_size, cfg.patch_size))
    B = t.shape[0]
    t = t.flatten(2).transpose(1, 2)                        # (B, 256, D)
    cls = state["modality_preprocessors.vision.cls_token"].expand(B, -1, -1)
    t = torch.cat([cls, t], dim=1)
    t = t + state["modality_preprocessors.vision.pos_embedding_helper.pos_embed"]
    t = ln(t, "modality_trunks.vision.pre_transformer_layer.0")
    for i in range(cfg.num_hidden_layers):
        p = f"modality_trunks.vision.blocks.{i}"
        h = ln(t, p + ".norm_1")
        a, _ = F.multi_head_attention_forward(
            h.transpose(0, 1), h.transpose(0, 1), h.transpose(0, 1),
            D, cfg.num_attention_heads,
            state[p + ".attn.in_proj_weight"],
            state[p + ".attn.in_proj_bias"],
            None, None, False, 0.0,
            state[p + ".attn.out_proj.weight"],
            state[p + ".attn.out_proj.bias"],
            need_weights=False)
        t = t + a.transpose(0, 1)
        h = ln(t, p + ".norm_2")
        h = F.gelu(h @ state[p + ".mlp.fc1.weight"].T
                   + state[p + ".mlp.fc1.bias"])
        h = h @ state[p + ".mlp.fc2.weight"].T + state[p + ".mlp.fc2.bias"]
        t = t + h
    t = ln(t, "modality_heads.vision.0")
    emb = t[:, 0] @ state["modality_heads.vision.2.weight"].T
    emb = emb / emb.norm(dim=-1, keepdim=True)
    return emb.unsqueeze(1)                                 # wrapper contract


class TestImageBindGolden:
    def test_forward_matches_torch_twin(self):
        state = torch_twin_state(CFG)
        x = torch.randn(2, 3, CFG.image_size, CFG.image_size,
                        generator=torch.Generator().manual_seed(1))
        want = torch_forward(state, x, CFG).numpy()
        params = convert_imagebind(state, CFG)
        got = np.asarray(imagebind_vision_forward(
            params, jax.numpy.asarray(x.numpy()), CFG))
        assert got.shape == (2, 1, CFG.out_dim)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_unit_norm(self):
        params = init_imagebind(jax.random.PRNGKey(0), CFG)
        x = jax.numpy.ones((1, 3, CFG.image_size, CFG.image_size))
        out = imagebind_vision_forward(params, x, CFG)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-5)


class TestBuilderDispatch:
    def test_imagebind_huge_builds(self):
        from video3d_tpu.models.hf_vision import build_vision_tower

        tower = build_vision_tower("imagebind_huge")
        assert tower.family == "imagebind"
        state = torch_twin_state(ImageBindConfig(
            hidden_size=1280, num_hidden_layers=1, num_attention_heads=16,
            patch_size=14, image_size=28, out_dim=1024))
        # converter accepts the official naming (1-block stand-in; the
        # full-depth tree only differs in block count)
        params = tower.convert(state)
        assert params["patch_embed"]["w"].shape == (3 * 14 * 14, 1280)
        assert params["head_proj"]["w"].shape == (1280, 1024)
        assert len(params["layers"]) == 1
