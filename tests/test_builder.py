"""End-to-end checkpoint loading: a synthetic LLaVA-style safetensors
checkpoint (reference key layout + config.json with persisted 3D knobs) ->
load_pretrained_model -> forward parity with the source torch modules."""

import json
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from video3d_tpu.config import GroundHeadType, PosEmbedType


def build_fake_checkpoint(path: str):
    """Tiny LLaVA-style checkpoint with the reference module-tree prefixes
    (LLM at root, tower under model.vision_tower.vision_tower., projector
    model.mm_projector., llava_arch.py:34-144 / llava_qwen.py:45-117)."""
    from safetensors.numpy import save_file
    from transformers import Qwen2Config, Qwen2ForCausalLM
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(0)
    llm = Qwen2ForCausalLM(Qwen2Config(
        vocab_size=160, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager")).eval()
    tower = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, image_size=42, patch_size=14,
        attn_implementation="eager")).eval()

    state = {}
    for k, v in llm.state_dict().items():
        state[k] = v.numpy()
    for k, v in tower.state_dict().items():
        state[f"model.vision_tower.vision_tower.{k}"] = v.numpy()
    # mlp2x_gelu projector 24 -> 32
    torch.manual_seed(1)
    proj = torch.nn.Sequential(torch.nn.Linear(24, 32), torch.nn.GELU(),
                               torch.nn.Linear(32, 32)).eval()
    state["model.mm_projector.0.weight"] = proj[0].weight.detach().numpy()
    state["model.mm_projector.0.bias"] = proj[0].bias.detach().numpy()
    state["model.mm_projector.2.weight"] = proj[2].weight.detach().numpy()
    state["model.mm_projector.2.bias"] = proj[2].bias.detach().numpy()
    state["model.image_newline"] = np.zeros(32, np.float32)
    # infonce ground head (llava_qwen.py:92-111)
    torch.manual_seed(2)
    for name in ("obj", "query"):
        mlp = torch.nn.Sequential(torch.nn.Linear(32, 32), torch.nn.ReLU(),
                                  torch.nn.LayerNorm(32), torch.nn.Linear(32, 32))
        for idx in (0, 2, 3):
            for p in ("weight", "bias"):
                state[f"ground_head_{name}.{idx}.{p}"] = \
                    getattr(mlp[idx], p).detach().numpy()
    state["ground_head_zero_target"] = np.random.default_rng(3).normal(
        size=32).astype(np.float32)

    os.makedirs(path, exist_ok=True)
    save_file(state, os.path.join(path, "model.safetensors"))
    config = {
        "model_type": "qwen2", "vocab_size": 160, "hidden_size": 32,
        "intermediate_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 8,
        "max_position_embeddings": 256, "rope_theta": 10000.0,
        "rms_norm_eps": 1e-6, "tie_word_embeddings": False,
        # persisted 3D knobs (train_3d.py:1425-1475)
        "world_position_embedding_type": "avg-discrete-sin3d",
        "voxel_size": 0.1, "min_xyz_range": [-15, -15, -5],
        "max_xyz_range": [15, 15, 5], "object_feature_type": "patch14-pe",
        "ground_head_type": "infonce", "ground_head_temperature": 0.07,
        "tokenizer_model_max_length": 4096,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f)
    return llm, tower


class TestLoadPretrained:
    def test_load_and_forward_parity(self, tmp_path):
        from video3d_tpu.models.builder import load_pretrained_model
        from video3d_tpu.models import qwen2, siglip
        from video3d_tpu.config import VisionConfig, replace

        ckpt = str(tmp_path / "ckpt")
        llm_torch, tower_torch = build_fake_checkpoint(ckpt)
        tokenizer, params, cfg, context_len = load_pretrained_model(
            ckpt, dtype=jnp.float32, load_tokenizer=False)

        # persisted 3D knobs parsed
        assert cfg.world_3d.pos_embed == PosEmbedType.SIN3D
        assert cfg.world_3d.discrete
        assert cfg.ground_head == GroundHeadType.INFONCE
        assert context_len == 4096
        assert "ground_head" in params and "zero_target" in params["ground_head"]

        # LLM forward parity on the loaded weights
        ids = np.random.default_rng(0).integers(0, 160, size=(1, 8))
        with torch.no_grad():
            ref = llm_torch(torch.tensor(ids)).logits.numpy()
        embeds = qwen2.embed_tokens(params["llm"], jnp.asarray(ids))
        pos = jnp.broadcast_to(jnp.arange(8)[None, :, None], (1, 8, 3))
        hidden, _ = qwen2.qwen2_forward(
            params["llm"], replace(cfg.llm, mrope_section=(2, 1, 1)),
            embeds, pos)
        got = np.asarray(qwen2.lm_head(params["llm"], hidden))
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)

        # vision tower parity (26-of-27-layers convention: here 2 of 3)
        vcfg = VisionConfig(hidden_size=24, intermediate_size=48,
                            num_hidden_layers=2, num_attention_heads=4,
                            image_size=42, patch_size=14)
        pixels = np.random.default_rng(1).normal(size=(1, 3, 42, 42)).astype(np.float32)
        with torch.no_grad():
            out = tower_torch(torch.tensor(pixels), output_hidden_states=True)
        ref_feat = out.hidden_states[2].numpy()
        # reload the tower sub-tree at the right dims
        from video3d_tpu.models.weights import convert_siglip, load_safetensors_dir
        state = load_safetensors_dir(ckpt)
        vparams = convert_siglip(
            state, vcfg, prefix="model.vision_tower.vision_tower.vision_model.")
        got_feat = np.asarray(siglip.vision_tower_forward(
            vparams, jnp.asarray(pixels), vcfg))
        np.testing.assert_allclose(got_feat, ref_feat, rtol=3e-4, atol=3e-4)


class TestExportRoundTrip:
    def test_export_then_load_identical(self, tmp_path):
        """init -> export (HF layout) -> load_pretrained_model -> identical
        leaves, and HF torch loads our exported LLM with matching logits."""
        from video3d_tpu.config import ModelConfig, VisionConfig, replace
        from video3d_tpu.models import llava_video3d as lv3d
        from video3d_tpu.models.builder import load_pretrained_model
        from video3d_tpu.models.weights import export_llava_checkpoint

        cfg = replace(ModelConfig.tiny(),
                      vision=VisionConfig(hidden_size=32, intermediate_size=64,
                                          num_hidden_layers=2,
                                          num_attention_heads=4,
                                          image_size=42, patch_size=14))
        params = lv3d.init_model(jax.random.PRNGKey(0), cfg)
        out = str(tmp_path / "export")
        export_llava_checkpoint(params, cfg.llm, cfg, out)

        _, loaded, loaded_cfg, _ = load_pretrained_model(
            out, dtype=jnp.float32, load_tokenizer=False,
            vision_config=replace(cfg.vision))
        assert loaded_cfg.world_3d.discrete
        for (pa, a), (pb, b) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(params["llm"]),
                       key=lambda kv: str(kv[0])),
                sorted(jax.tree_util.tree_leaves_with_path(loaded["llm"]),
                       key=lambda kv: str(kv[0]))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, err_msg=str(pa))

        # torch side can load our export
        from transformers import Qwen2Config, Qwen2ForCausalLM
        from safetensors.torch import load_file

        hf_cfg = Qwen2Config(vocab_size=512, hidden_size=64,
                             intermediate_size=128, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             head_dim=16, max_position_embeddings=1024,
                             rope_theta=1e6, tie_word_embeddings=False,
                             attn_implementation="eager")
        hf = Qwen2ForCausalLM(hf_cfg)
        llm_state = {k: v for k, v in
                     load_file(os.path.join(out, "model.safetensors")).items()
                     if k.startswith(("model.layers", "model.embed_tokens",
                                      "model.norm", "lm_head"))}
        missing, unexpected = hf.load_state_dict(llm_state, strict=False)
        assert not unexpected
        hf.eval()
        ids = np.random.default_rng(0).integers(0, 512, (1, 6))
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits.numpy()
        from video3d_tpu.models import qwen2
        from video3d_tpu.config import replace as rep

        embeds = qwen2.embed_tokens(params["llm"], jnp.asarray(ids))
        pos = jnp.broadcast_to(jnp.arange(6)[None, :, None], (1, 6, 3))
        hidden, _ = qwen2.qwen2_forward(params["llm"], cfg.llm, embeds, pos)
        got = np.asarray(qwen2.lm_head(params["llm"], hidden))
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)
