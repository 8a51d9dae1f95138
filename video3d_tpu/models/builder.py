"""Pretrained model loading: HF checkpoint directory -> (tokenizer, params,
ModelConfig, context_len).

Equivalent of the reference's ``load_pretrained_model``
(/root/reference/llava/model/builder.py:27-305): dispatch by model family
(qwen / llama via config.json ``model_type``), read the 3D knobs the
reference persists into the checkpoint config (``world_position_embedding
_type``, ``voxel_size``, ``min/max_xyz_range``, ``object_feature_type``,
``ground_head_type``), apply an ``overwrite_config`` dict (e.g. the eval
drivers' ``{"vocab_size": 151649, "tie_word_embeddings": False}``,
model_scanqa.py:94-101), and convert weights into the functional pytree.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from video3d_tpu.config import (GroundHeadType, LLMConfig, ModelConfig,
                                MoEConfig, ObjectFeatureType, ProjectorConfig,
                                VisionConfig, VoxelConfig, World3DConfig,
                                replace)


def llm_config_from_hf(hf: Dict[str, Any]) -> LLMConfig:
    """HF config.json dict -> LLMConfig.

    Families (matching the reference's llava_{qwen,llama,mistral,mixtral,
    gemma}.py wrappers): qwen2 (qkv bias, theta 1e6), llama/mistral/mixtral
    (no bias, theta 1e4; mixtral adds MoE via ``moe`` in the caller), gemma
    (gelu_tanh MLP, (1+w) RMSNorm, sqrt(D) embed scale, tied head).
    """
    model_type = hf.get("model_type", "qwen2")
    if model_type == "mpt":
        from video3d_tpu.models.weights import mpt_config_from_hf

        return mpt_config_from_hf(hf)
    is_llama = any(t in model_type for t in ("llama", "mistral", "mixtral"))
    is_gemma = "gemma" in model_type
    heads = hf["num_attention_heads"]
    head_dim = hf.get("head_dim") or hf["hidden_size"] // heads
    act = hf.get("hidden_activation") or hf.get("hidden_act", "silu")
    moe = None
    if "mixtral" in model_type:
        moe = MoEConfig(num_experts=hf.get("num_local_experts", 8),
                        num_experts_per_tok=hf.get("num_experts_per_tok", 2),
                        moe_intermediate_size=hf["intermediate_size"],
                        shared_expert_intermediate_size=None,
                        norm_topk_prob=True)
    elif "qwen2_moe" in model_type:
        moe = MoEConfig(num_experts=hf.get("num_experts", 60),
                        num_experts_per_tok=hf.get("num_experts_per_tok", 4),
                        moe_intermediate_size=hf["moe_intermediate_size"],
                        shared_expert_intermediate_size=hf.get(
                            "shared_expert_intermediate_size", 0) or None,
                        norm_topk_prob=hf.get("norm_topk_prob", False))
    return LLMConfig(
        moe=moe,
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=heads,
        num_key_value_heads=hf.get("num_key_value_heads", heads),
        head_dim=head_dim,
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta",
                          1e6 if not (is_llama or is_gemma) else 1e4),
        max_position_embeddings=hf.get("max_position_embeddings", 32768),
        tie_word_embeddings=hf.get("tie_word_embeddings", is_gemma),
        attention_bias=hf.get("attention_bias",
                              not (is_llama or is_gemma)),
        mrope_section=(head_dim // 4, head_dim // 8, head_dim // 8),
        hidden_act="gelu_tanh" if "gelu" in act else "silu",
        rms_norm_add_unit_offset=is_gemma,
        embed_scale=is_gemma,
    )


def model_config_from_hf(hf: Dict[str, Any]) -> ModelConfig:
    """Parse the 3D knobs the reference stores in the checkpoint config."""
    w3d = World3DConfig.from_reference_string(
        hf.get("world_position_embedding_type", "avg-discrete-sin3d"),
        VoxelConfig(
            voxel_size=hf.get("voxel_size", 0.1),
            min_xyz_range=tuple(hf.get("min_xyz_range", (-15, -15, -5))),
            max_xyz_range=tuple(hf.get("max_xyz_range", (15, 15, 5)))))
    oft = hf.get("object_feature_type", "patch14-pe")
    w3d = replace(w3d,
                  object_feature_type=(ObjectFeatureType.PATCH27
                                       if "patch27" in oft
                                       else ObjectFeatureType.PATCH14),
                  object_feature_use_pe="pe" in oft)
    ground = hf.get("ground_head_type") or "none"
    # 2D anyres knobs (train.py persists these for the legacy image path)
    pin = hf.get("image_grid_pinpoints",
                 ModelConfig.image_grid_pinpoints)
    if isinstance(pin, list):
        pin = tuple(tuple(p) for p in pin)
    return ModelConfig(
        llm=llm_config_from_hf(hf),
        world_3d=w3d,
        ground_head=GroundHeadType(ground),
        ground_head_temperature=hf.get("ground_head_temperature", 0.07),
        tokenizer_model_max_length=hf.get("tokenizer_model_max_length", 32768),
        image_aspect_ratio=hf.get("image_aspect_ratio", "anyres"),
        image_grid_pinpoints=pin,
        mm_patch_merge_type=hf.get("mm_patch_merge_type", "spatial_unpad"),
        resampler_type=hf.get("mm_resampler_type"),
    )


def _load_torch_bin(path: str) -> Dict[str, Any]:
    """torch-saved .bin state dict -> {key: np.ndarray} (fp32)."""
    import numpy as np
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: np.asarray(v.to(torch.float32)) for k, v in sd.items()}


def _strip_wrapper_prefixes(sd: Dict[str, Any]) -> Dict[str, Any]:
    """non_lora_trainables.bin key cleanup, exactly the reference's
    builder.py:104-107: drop 'base_model.' then, if 'model.model.' keys
    remain, one more 'model.'."""
    sd = {(k[len("base_model."):] if k.startswith("base_model.") else k): v
          for k, v in sd.items()}
    if any(k.startswith("model.model.") for k in sd):
        sd = {(k[len("model."):] if k.startswith("model.") else k): v
              for k, v in sd.items()}
    return sd


def merge_lora_into_state(state: Dict[str, Any], model_path: str) -> None:
    """Merge a peft adapter directory into an HF state dict IN PLACE.

    The reference does this via PeftModel.from_pretrained + merge_and_unload
    (builder.py:110-115); here the merge happens at the state-dict level —
    ``w += (alpha/r) * B @ A`` per adapted Linear (peft stores
    ``...<target>.lora_A.weight`` (r, in) and ``...lora_B.weight`` (out, r);
    HF Linear weights are (out, in)) — which is family-agnostic.
    """
    import numpy as np

    with open(os.path.join(model_path, "adapter_config.json")) as f:
        acfg = json.load(f)
    scale = acfg["lora_alpha"] / acfg["r"]

    adapter_st = os.path.join(model_path, "adapter_model.safetensors")
    if os.path.exists(adapter_st):
        from safetensors.numpy import load_file

        ad = load_file(adapter_st)
    else:
        ad = _load_torch_bin(os.path.join(model_path, "adapter_model.bin"))

    for k, a in ad.items():
        if not k.endswith("lora_A.weight"):
            continue
        b = ad[k[: -len("lora_A.weight")] + "lora_B.weight"]
        base = k[: -len(".lora_A.weight")]
        for pref in ("base_model.model.", "base_model."):
            if base.startswith(pref):
                base = base[len(pref):]
                break
        base += ".weight"
        if base not in state:
            raise KeyError(f"LoRA target {base!r} not in base checkpoint")
        delta = (np.asarray(b, np.float32) @ np.asarray(a, np.float32)) * scale
        state[base] = np.asarray(state[base], np.float32) + delta


def init_dummy_params(cfg: ModelConfig, bits: int = 16, act: str = "none",
                      seed: int = 0):
    """Random-weight model built layer-by-layer ON DEVICE — the equivalent of
    vLLM's ``--load-format dummy``: perf/bring-up rehearsal of a checkpoint
    architecture whose weights are unavailable or too large to ship to the
    device over a slow link.

    Two jitted builders keep peak transient HBM to one bf16 decoder layer
    (~0.5 GB at 7B) instead of the whole bf16 tree (~15 GB, which does not
    fit a 16 GB chip): one compiled layer-init(+quantize) reused for every
    decoder layer, and one for the vision/glue/table params. ``bits``/``act``
    reproduce exactly what the real load path's post-load
    ``quantize_tree(params, bits=..., act=...)`` (cli.py --load-in-8bit/4bit/
    --w8a8) would produce — same patterns (llm projections + lm_head), same
    quantized-leaf structure — so a dummy-loaded engine runs the identical
    program as a real int8/int4 checkpoint.
    """
    import dataclasses

    import jax

    from video3d_tpu.models import llava_video3d as lv3d
    from video3d_tpu.models import qwen2
    from video3d_tpu.models.quant import quantize_tree

    key = jax.random.PRNGKey(seed)

    # vision tower / projector / world-PE / ground head / llm tables: init at
    # LLM depth 0 so the big decoder never exists in bf16 all at once.
    slim = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, num_hidden_layers=0))

    @jax.jit
    def make_glue(k):
        p = lv3d.init_model(k, slim, dtype=jnp.bfloat16)
        if bits != 16:
            p = quantize_tree(p, bits=bits, act=act)   # lm_head only here
        return p

    params = make_glue(key)

    one = dataclasses.replace(cfg.llm, num_hidden_layers=1)

    @jax.jit
    def make_layer(k):
        p = qwen2.init_qwen2(k, one, dtype=jnp.bfloat16)
        if bits == 16:
            return p["layers"][0]
        wrapped = {"llm": {"layers": p["layers"]}}
        return quantize_tree(wrapped, bits=bits, act=act)["llm"]["layers"][0]

    params["llm"]["layers"] = [
        make_layer(jax.random.fold_in(key, 1000 + i))
        for i in range(cfg.llm.num_hidden_layers)]
    return params


def load_dummy_model(model_path: str,
                     bits: int = 16, act: str = "none",
                     overwrite_config: Optional[Dict[str, Any]] = None,
                     load_tokenizer: bool = True):
    """--load-format dummy front end: (tokenizer, params, ModelConfig) from a
    checkpoint dir holding ONLY config.json (+ tokenizer files) — weights
    are :func:`init_dummy_params` device-side randoms. An optional
    ``vision_config`` dict in config.json overrides the default so400m
    tower (useful for small rehearsal architectures)."""
    from video3d_tpu.config import VisionConfig

    with open(os.path.join(model_path, "config.json")) as f:
        hf = json.load(f)
    if overwrite_config:
        hf.update(overwrite_config)
    cfg = model_config_from_hf(hf)
    if "vision_config" in hf:
        cfg = replace(cfg, vision=VisionConfig(**hf["vision_config"]))
    params = init_dummy_params(cfg, bits=bits, act=act)
    tokenizer = None
    if load_tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_path)
    return tokenizer, params, cfg


def load_pretrained_model(model_path: str,
                          model_name: Optional[str] = None,
                          model_base: Optional[str] = None,
                          overwrite_config: Optional[Dict[str, Any]] = None,
                          dtype=jnp.bfloat16,
                          load_tokenizer: bool = True,
                          vision_config=None):
    """Returns (tokenizer, params, model_cfg, context_len).

    Three branches, mirroring the reference builder.py:54-157:
      * ``model_base`` + 'lora' in the model name: base weights from
        ``model_base``, overlay ``non_lora_trainables.bin`` (projector /
        PE / ground-head / newline weights saved by the LoRA trainer),
        then merge the peft adapter;
      * ``model_base`` alone: projector-only checkpoint — base weights
        from ``model_base`` + ``mm_projector.bin`` overlay;
      * neither: plain full checkpoint.
    config.json (with the persisted 3D knobs) always comes from
    ``model_path``; the tokenizer from ``model_base`` when given (the
    reference does the same).
    """
    from video3d_tpu.models.weights import (convert_llava_checkpoint,
                                            load_safetensors_dir,
                                            vision_config_from_state)

    name = (model_name or os.path.basename(os.path.normpath(model_path)))
    with open(os.path.join(model_path, "config.json")) as f:
        hf = json.load(f)
    if overwrite_config:
        hf.update(overwrite_config)

    cfg = model_config_from_hf(hf)
    if model_base is not None and "lora" in name.lower():
        state = load_safetensors_dir(model_base)
        nlt = os.path.join(model_path, "non_lora_trainables.bin")
        if os.path.exists(nlt):
            state.update(_strip_wrapper_prefixes(_load_torch_bin(nlt)))
        merge_lora_into_state(state, model_path)
    elif model_base is not None:
        state = load_safetensors_dir(model_base)
        state.update(_load_torch_bin(
            os.path.join(model_path, "mm_projector.bin")))
    else:
        state = load_safetensors_dir(model_path)
    if vision_config is None and \
            "model.vision_tower.vision_tower.vision_model.embeddings.patch_embedding.weight" in state:
        vision_config = vision_config_from_state(state)
    if vision_config is not None:
        cfg = replace(cfg, vision=vision_config)
    params = convert_llava_checkpoint(
        state, cfg.llm, cfg.vision, dtype=dtype,
        ground_head="ground_head_obj.0.weight" in state)
    if cfg.resampler_type and any(
            k.startswith("model.vision_resampler.") for k in state):
        from video3d_tpu.models.weights import convert_resampler

        params["resampler"] = convert_resampler(state, cfg.resampler_type,
                                                dtype=dtype)

    tokenizer = None
    if load_tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_base or model_path)
    context_len = hf.get("max_sequence_length",
                         hf.get("tokenizer_model_max_length", 32768))
    return tokenizer, params, cfg, context_len
