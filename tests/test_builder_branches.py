"""load_pretrained_model's three branches (reference builder.py:54-157):
plain full checkpoint (covered in test_builder.py), projector-only with
``model_base`` (mm_projector.bin overlay, :117-157), and LoRA
(non_lora_trainables.bin + peft adapter merge, :58-115) — each driven
end-to-end over synthetic HF directory layouts."""

import json
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from test_builder import build_fake_checkpoint


def _base_and_cfg(tmp_path):
    base = str(tmp_path / "base")
    build_fake_checkpoint(base)
    with open(os.path.join(base, "config.json")) as f:
        return base, json.load(f)


class TestProjectorOnlyBranch:
    def test_mm_projector_overlay(self, tmp_path):
        from video3d_tpu.models.builder import load_pretrained_model

        base, cfg = _base_and_cfg(tmp_path)
        proj_dir = str(tmp_path / "projector_ckpt")
        os.makedirs(proj_dir)
        with open(os.path.join(proj_dir, "config.json"), "w") as f:
            json.dump(cfg, f)

        # fresh projector weights, torch-saved like the reference trainer's
        # mm-adapter-only stage (builder.py:153-156 loads + overlays them)
        torch.manual_seed(7)
        new_proj = {
            "model.mm_projector.0.weight": torch.randn(32, 24),
            "model.mm_projector.0.bias": torch.randn(32),
            "model.mm_projector.2.weight": torch.randn(32, 32),
            "model.mm_projector.2.bias": torch.randn(32),
        }
        torch.save(new_proj, os.path.join(proj_dir, "mm_projector.bin"))

        _, params, _, _ = load_pretrained_model(
            proj_dir, model_base=base, dtype=jnp.float32,
            load_tokenizer=False)
        # projector weights come from the .bin (ours store (in, out))
        np.testing.assert_allclose(
            np.asarray(params["projector"]["w1"]),
            new_proj["model.mm_projector.0.weight"].numpy().T, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(params["projector"]["b2"]),
            new_proj["model.mm_projector.2.bias"].numpy(), rtol=1e-6)
        # the LLM still comes from the base checkpoint
        base_params = load_pretrained_model(
            base, dtype=jnp.float32, load_tokenizer=False)[1]
        np.testing.assert_allclose(
            np.asarray(params["llm"]["layers"][0]["attn"]["wq"]),
            np.asarray(base_params["llm"]["layers"][0]["attn"]["wq"]),
            rtol=1e-6)


class TestLoraBranch:
    def _make_lora_dir(self, tmp_path, base_cfg, r=4, alpha=8):
        lora_dir = str(tmp_path / "lora-ckpt")
        os.makedirs(lora_dir)
        with open(os.path.join(lora_dir, "config.json"), "w") as f:
            json.dump(base_cfg, f)
        with open(os.path.join(lora_dir, "adapter_config.json"), "w") as f:
            json.dump({"r": r, "lora_alpha": alpha,
                       "target_modules": ["q_proj", "v_proj"]}, f)
        rng = np.random.default_rng(11)
        adapter = {}
        for layer in range(2):
            for tgt, dout in (("q_proj", 32), ("v_proj", 16)):
                pref = (f"base_model.model.model.layers.{layer}."
                        f"self_attn.{tgt}")
                adapter[f"{pref}.lora_A.weight"] = rng.normal(
                    size=(r, 32)).astype(np.float32)
                adapter[f"{pref}.lora_B.weight"] = rng.normal(
                    size=(dout, r)).astype(np.float32)
        from safetensors.numpy import save_file

        save_file(adapter, os.path.join(lora_dir, "adapter_model.safetensors"))
        # non-LoRA trainables: projector saved with the trainer's wrapper
        # prefix (reference builder.py:104-107 strips base_model./model.)
        torch.manual_seed(13)
        nlt = {
            "base_model.model.model.mm_projector.0.weight": torch.randn(32, 24),
            "base_model.model.model.mm_projector.0.bias": torch.randn(32),
            "base_model.model.model.mm_projector.2.weight": torch.randn(32, 32),
            "base_model.model.model.mm_projector.2.bias": torch.randn(32),
        }
        torch.save(nlt, os.path.join(lora_dir, "non_lora_trainables.bin"))
        return lora_dir, adapter, nlt, alpha / r

    def test_lora_merge_end_to_end(self, tmp_path):
        from video3d_tpu.models.builder import load_pretrained_model

        base, cfg = _base_and_cfg(tmp_path)
        lora_dir, adapter, nlt, scale = self._make_lora_dir(tmp_path, cfg)

        base_params = load_pretrained_model(
            base, dtype=jnp.float32, load_tokenizer=False)[1]
        _, params, _, _ = load_pretrained_model(
            lora_dir, model_base=base, dtype=jnp.float32,
            load_tokenizer=False)

        # wq = base_wq + scale * (B @ A), in our (in, out) orientation
        for layer in range(2):
            a = adapter[f"base_model.model.model.layers.{layer}."
                        "self_attn.q_proj.lora_A.weight"]
            b = adapter[f"base_model.model.model.layers.{layer}."
                        "self_attn.q_proj.lora_B.weight"]
            want = (np.asarray(base_params["llm"]["layers"][layer]["attn"]
                               ["wq"])
                    + scale * (b @ a).T)
            np.testing.assert_allclose(
                np.asarray(params["llm"]["layers"][layer]["attn"]["wq"]),
                want, rtol=1e-5, atol=1e-5)
            # k_proj untouched (not a target module)
            np.testing.assert_allclose(
                np.asarray(params["llm"]["layers"][layer]["attn"]["wk"]),
                np.asarray(base_params["llm"]["layers"][layer]["attn"]["wk"]),
                rtol=1e-6)
        # non_lora_trainables overlay reached the projector
        np.testing.assert_allclose(
            np.asarray(params["projector"]["w1"]),
            nlt["base_model.model.model.mm_projector.0.weight"].numpy().T,
            rtol=1e-6)

    def test_lora_name_detection_requires_base(self, tmp_path):
        """Without model_base the lora dir is loaded as a plain checkpoint
        (it has no model.safetensors) -> clear failure, not silent garbage."""
        from video3d_tpu.models.builder import load_pretrained_model

        base, cfg = _base_and_cfg(tmp_path)
        lora_dir, _, _, _ = self._make_lora_dir(tmp_path, cfg)
        with pytest.raises(Exception):
            load_pretrained_model(lora_dir, dtype=jnp.float32,
                                  load_tokenizer=False)

    def test_missing_lora_target_raises(self, tmp_path):
        from video3d_tpu.models.builder import merge_lora_into_state

        base, cfg = _base_and_cfg(tmp_path)
        lora_dir, _, _, _ = self._make_lora_dir(tmp_path, cfg)
        with pytest.raises(KeyError):
            merge_lora_into_state({}, lora_dir)
