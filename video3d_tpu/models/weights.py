"""HF checkpoint -> JAX pytree importers.

Maps Hugging Face parameter names/layouts (Qwen2, SigLIP vision,
LLaVA-style mm_projector / world_position_embedding / ground head) onto the
functional pytrees used by video3d_tpu.models. Works from either an
in-memory state dict (tests: tiny random torch models) or a directory of
``*.safetensors`` shards (production: LLaVA-Video-7B-Qwen2 exports).

Reference checkpoint key layout: the reference saves a single HF model whose
config carries the 3D knobs (train_3d.py:1425-1475); vision tower keys are
prefixed ``model.vision_tower.vision_tower.`` and projector keys
``model.mm_projector.`` (llava_arch.py:34-144).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable, Dict, Mapping, Optional

import numpy as np
import jax.numpy as jnp

from video3d_tpu.config import LLMConfig, VisionConfig


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (incl. bf16) without importing torch at module scope
    try:
        import torch  # noqa: WPS433

        if isinstance(t, torch.Tensor):
            t = t.detach().cpu()
            if t.dtype == torch.bfloat16:
                return t.to(torch.float32).numpy()
            return t.numpy()
    except ImportError:
        pass
    return np.asarray(t)


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors shards under ``path`` into one dict."""
    from safetensors import safe_open  # lazy; only needed for real ckpts

    out: Dict[str, np.ndarray] = {}
    for fname in sorted(os.listdir(path)):
        if fname.endswith(".safetensors"):
            with safe_open(os.path.join(path, fname), framework="np") as f:
                for key in f.keys():
                    out[key] = f.get_tensor(key)
    return out


def convert_qwen2(state: Mapping[str, Any], cfg: LLMConfig,
                  prefix: str = "", dtype=jnp.float32) -> Dict[str, Any]:
    """HF Qwen2ForCausalLM state dict -> qwen2.py pytree.

    HF Linear stores (out, in); we store (in, out) for ``x @ w``.
    """
    g = lambda k: _to_np(state[prefix + k])

    def lin(k):
        return jnp.asarray(g(k).T, dtype)

    def vec(k):
        return jnp.asarray(g(k), dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        attn = {
            "wq": lin(p + "self_attn.q_proj.weight"),
            "wk": lin(p + "self_attn.k_proj.weight"),
            "wv": lin(p + "self_attn.v_proj.weight"),
            "wo": lin(p + "self_attn.o_proj.weight"),
        }
        if prefix + p + "self_attn.q_proj.bias" in state:  # Qwen2 yes, LLaMA no
            attn.update({"bq": vec(p + "self_attn.q_proj.bias"),
                         "bk": vec(p + "self_attn.k_proj.bias"),
                         "bv": vec(p + "self_attn.v_proj.bias")})
        layer = {
            "input_layernorm": vec(p + "input_layernorm.weight"),
            "attn": attn,
            "post_attention_layernorm": vec(p + "post_attention_layernorm.weight"),
        }
        if prefix + p + "mlp.gate_proj.weight" in state:      # dense MLP
            layer["mlp"] = {
                "w_gate": lin(p + "mlp.gate_proj.weight"),
                "w_up": lin(p + "mlp.up_proj.weight"),
                "w_down": lin(p + "mlp.down_proj.weight"),
            }
        elif prefix + p + "mlp.gate.weight" in state:         # Qwen2-MoE
            from video3d_tpu.models.moe import convert_moe_layer

            layer["moe"] = convert_moe_layer(state, i, cfg.moe, prefix=prefix,
                                             dtype=dtype)
        else:                                                 # Mixtral
            from video3d_tpu.models.moe import convert_mixtral_layer

            layer["moe"] = convert_mixtral_layer(state, i, cfg.moe,
                                                 prefix=prefix, dtype=dtype)
        layers.append(layer)

    # tied-embedding checkpoints store only one of the pair (real Gemma
    # shards keep embed_tokens; safetensors save_model may keep lm_head)
    if prefix + "model.embed_tokens.weight" in state:
        embed = jnp.asarray(g("model.embed_tokens.weight"), dtype)
    else:
        embed = jnp.asarray(g("lm_head.weight"), dtype)
    if prefix + "lm_head.weight" in state:
        head = lin("lm_head.weight")
    else:  # tied embeddings
        head = embed.T
    return {
        "embed_tokens": embed,
        "layers": layers,
        "norm": vec("model.norm.weight"),
        "lm_head": head,
    }


def convert_mpt(state: Mapping[str, Any], cfg: LLMConfig,
                prefix: str = "", dtype=jnp.float32) -> Dict[str, Any]:
    """HF MptForCausalLM state dict -> qwen2.py pytree (ALiBi family,
    reference wrapper llava/model/language_model/llava_mpt.py).

    MPT keys: ``transformer.wte`` (tied lm_head), per block ``norm_1``,
    fused ``attn.Wqkv`` (split into q/k/v), ``attn.out_proj``, ``norm_2``,
    ungated ``ffn.up_proj``/``ffn.down_proj``, final ``norm_f``."""
    g = lambda k: _to_np(state[prefix + k])
    vec = lambda k: jnp.asarray(g(k), dtype)

    D = cfg.hidden_size
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"transformer.blocks.{i}."
        wqkv = g(p + "attn.Wqkv.weight")          # (3D, D) torch layout
        layers.append({
            "input_layernorm": vec(p + "norm_1.weight"),
            "attn": {
                "wq": jnp.asarray(wqkv[:D].T, dtype),
                "wk": jnp.asarray(wqkv[D:2 * D].T, dtype),
                "wv": jnp.asarray(wqkv[2 * D:].T, dtype),
                "wo": jnp.asarray(g(p + "attn.out_proj.weight").T, dtype),
            },
            "post_attention_layernorm": vec(p + "norm_2.weight"),
            "mlp": {
                "w_up": jnp.asarray(g(p + "ffn.up_proj.weight").T, dtype),
                "w_down": jnp.asarray(g(p + "ffn.down_proj.weight").T, dtype),
            },
        })
    embed = vec("transformer.wte.weight")
    return {
        "embed_tokens": embed,
        "layers": layers,
        "norm": vec("transformer.norm_f.weight"),
        "lm_head": embed.T,                       # MPT ties word embeddings
    }


def mpt_config_from_hf(hf: Mapping[str, Any]) -> LLMConfig:
    """HF MptConfig dict -> LLMConfig (alibi / layernorm / ungated knobs)."""
    d = hf["d_model"]
    heads = hf["n_heads"]
    attn_cfg = hf.get("attn_config", {}) or {}
    return LLMConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=d,
        intermediate_size=int(hf.get("expansion_ratio", 4)) * d,
        num_hidden_layers=hf["n_layers"],
        num_attention_heads=heads,
        num_key_value_heads=heads,                # MPT is full MHA
        head_dim=d // heads,
        rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        max_position_embeddings=hf.get("max_seq_len", 2048),
        tie_word_embeddings=True,
        attention_bias=False,
        hidden_act="gelu",
        position_embedding="alibi",
        norm_type="layernorm",
        alibi_bias_max=attn_cfg.get("alibi_bias_max", 8.0),
        # unused under alibi; keep consistent with head_dim for asserts
        mrope_section=(d // heads // 4, d // heads // 8, d // heads // 8),
    )


def convert_siglip(state: Mapping[str, Any], cfg: VisionConfig,
                   prefix: str = "vision_model.", dtype=jnp.float32) -> Dict[str, Any]:
    """HF SiglipVisionModel state dict -> siglip.py pytree.

    Conv patch kernel (D, 3, ps, ps) flattens to (D, 3*ps*ps) in (c, kh, kw)
    order — exactly the order ``siglip.patchify`` emits — then transposes.
    Only the first ``cfg.num_hidden_layers`` encoder layers are converted
    (the reference deletes the final layer, siglip_encoder.py:570).
    """
    g = lambda k: _to_np(state[prefix + k])

    def lin(k):
        return jnp.asarray(g(k).T, dtype)

    def vec(k):
        return jnp.asarray(g(k), dtype)

    conv_w = g("embeddings.patch_embedding.weight")          # (D, 3, ps, ps)
    patch_w = conv_w.reshape(conv_w.shape[0], -1).T          # (3*ps*ps, D)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}."
        layers.append({
            "ln1": {"scale": vec(p + "layer_norm1.weight"), "bias": vec(p + "layer_norm1.bias")},
            "attn": {
                "wq": lin(p + "self_attn.q_proj.weight"), "bq": vec(p + "self_attn.q_proj.bias"),
                "wk": lin(p + "self_attn.k_proj.weight"), "bk": vec(p + "self_attn.k_proj.bias"),
                "wv": lin(p + "self_attn.v_proj.weight"), "bv": vec(p + "self_attn.v_proj.bias"),
                "wo": lin(p + "self_attn.out_proj.weight"), "bo": vec(p + "self_attn.out_proj.bias"),
            },
            "ln2": {"scale": vec(p + "layer_norm2.weight"), "bias": vec(p + "layer_norm2.bias")},
            "mlp": {
                "w1": lin(p + "mlp.fc1.weight"), "b1": vec(p + "mlp.fc1.bias"),
                "w2": lin(p + "mlp.fc2.weight"), "b2": vec(p + "mlp.fc2.bias"),
            },
        })

    return {
        "patch_embed": {"w": jnp.asarray(patch_w, dtype),
                        "b": vec("embeddings.patch_embedding.bias")},
        "pos_embed": vec("embeddings.position_embedding.weight"),
        "layers": layers,
    }


def vision_config_from_state(state: Mapping[str, Any],
                             prefix: str = "model.vision_tower.vision_tower.vision_model.",
                             num_attention_heads: Optional[int] = None) -> VisionConfig:
    """Infer tower dims from checkpoint shapes (LLaVA checkpoints save the
    tower with the last encoder layer already deleted, so the stored layer
    count IS the run count). Head count is not derivable from shapes; pass
    it, or the so400m default (16) is used for 1152-wide towers and
    hidden // 64 otherwise."""
    n_layers = 0
    while f"{prefix}encoder.layers.{n_layers}.layer_norm1.weight" in state:
        n_layers += 1
    conv_w = _to_np(state[prefix + "embeddings.patch_embedding.weight"])
    hidden, _, patch, _ = conv_w.shape
    pos = _to_np(state[prefix + "embeddings.position_embedding.weight"])
    side = int(round(pos.shape[0] ** 0.5))
    fc1 = _to_np(state[prefix + "encoder.layers.0.mlp.fc1.weight"])
    if num_attention_heads is None:
        num_attention_heads = 16 if hidden == 1152 else max(1, hidden // 64)
    return VisionConfig(hidden_size=hidden, intermediate_size=fc1.shape[0],
                        num_hidden_layers=n_layers,
                        num_attention_heads=num_attention_heads,
                        image_size=side * patch, patch_size=patch)


def convert_projector(state: Mapping[str, Any],
                      prefix: str = "model.mm_projector.", dtype=jnp.float32):
    """Any reference projector variant -> functional params
    (multimodal_projector/builder.py:32-65, pooler_projector.py).

    HF key layouts: ``linear`` is a bare nn.Linear (``weight``/``bias``);
    ``mlpNx_gelu`` is a Sequential with Linears at even indices;
    ``mlpNx_resNx_gelu`` appends SimpleResBlocks (``{i}.pre_norm.*``,
    ``{i}.proj.{0,2}.*``); ``pooler`` has ``conv_pool.*`` + ``proj.1.*``."""
    g = lambda k: _to_np(state[prefix + k])
    if prefix + "conv_pool.weight" in state:       # pooler
        cw = g("conv_pool.weight")                 # (Cout, Cin, 2, 2) torch conv
        cw = cw.transpose(2, 3, 1, 0).reshape(-1, cw.shape[0])
        return {
            "conv_w": jnp.asarray(cw, dtype),
            "conv_b": jnp.asarray(g("conv_pool.bias"), dtype),
            "w1": jnp.asarray(g("proj.1.weight").T, dtype),
            "b1": jnp.asarray(g("proj.1.bias"), dtype),
        }
    if prefix + "weight" in state:                 # bare nn.Linear ('linear')
        return {"w1": jnp.asarray(g("weight").T, dtype),
                "b1": jnp.asarray(g("bias"), dtype)}
    # Sequential: Linears at even indices (GELUs between carry no params),
    # SimpleResBlocks appended after. Find module indices from the key space.
    indices = sorted({int(k[len(prefix):].split(".")[0]) for k in state
                      if k.startswith(prefix)
                      and k[len(prefix):].split(".")[0].isdigit()})
    out: dict = {}
    res = []
    n_linear = 0
    for i in indices:
        if f"{prefix}{i}.pre_norm.weight" in state:     # SimpleResBlock
            res.append({
                "ln_s": jnp.asarray(g(f"{i}.pre_norm.weight"), dtype),
                "ln_b": jnp.asarray(g(f"{i}.pre_norm.bias"), dtype),
                "w1": jnp.asarray(g(f"{i}.proj.0.weight").T, dtype),
                "b1": jnp.asarray(g(f"{i}.proj.0.bias"), dtype),
                "w2": jnp.asarray(g(f"{i}.proj.2.weight").T, dtype),
                "b2": jnp.asarray(g(f"{i}.proj.2.bias"), dtype),
            })
        else:                                           # Sequential Linear
            n_linear += 1
            out[f"w{n_linear}"] = jnp.asarray(g(f"{i}.weight").T, dtype)
            out[f"b{n_linear}"] = jnp.asarray(g(f"{i}.bias"), dtype)
    if res:
        out["res"] = res
    return out


def convert_resampler(state: Mapping[str, Any], resampler_type: str,
                      prefix: str = "model.vision_resampler.",
                      dtype=jnp.float32) -> Dict[str, Any]:
    """Reference resampler state dicts -> models/resampler.py pytrees
    (multimodal_resampler/: spatial_pool.py, perceiver.py, qformer.py;
    masked_drop has no parameters)."""
    g = lambda k: _to_np(state[prefix + k])
    A = lambda k: jnp.asarray(g(k), dtype)
    T = lambda k: jnp.asarray(g(k).T, dtype)

    if resampler_type == "masked_drop":
        return {}
    if resampler_type == "spatial_pool":
        if prefix + "pool.weight" not in state:
            return {}                       # average / max modes: no params
        cw = g("pool.weight")               # (Cout, Cin, s, s) torch conv
        cw = cw.transpose(2, 3, 1, 0).reshape(-1, cw.shape[0])
        return {"conv_w": jnp.asarray(cw, dtype), "conv_b": A("pool.bias")}

    if resampler_type == "perceiver":
        layers = []
        i = 0
        while f"{prefix}perceiver.layers.{i}.0.to_q.weight" in state:
            lp = f"perceiver.layers.{i}."
            layers.append({
                "attn": {
                    "ln_media_s": A(lp + "0.norm_media.weight"),
                    "ln_media_b": A(lp + "0.norm_media.bias"),
                    "ln_latents_s": A(lp + "0.norm_latents.weight"),
                    "ln_latents_b": A(lp + "0.norm_latents.bias"),
                    "to_q": T(lp + "0.to_q.weight"),
                    "to_kv": T(lp + "0.to_kv.weight"),
                    "to_out": T(lp + "0.to_out.weight"),
                },
                # FeedForward = Sequential(LN, Linear, GELU, Linear)
                "ff": {
                    "ln_s": A(lp + "1.0.weight"), "ln_b": A(lp + "1.0.bias"),
                    "w1": T(lp + "1.1.weight"), "w2": T(lp + "1.3.weight"),
                },
            })
            i += 1
        return {
            "latents": A("perceiver.latents"),
            "layers": layers,
            "norm_s": A("perceiver.norm.weight"),
            "norm_b": A("perceiver.norm.bias"),
        }

    if resampler_type == "qformer":
        def attn(ap):
            return {
                "wq": T(ap + "self.query.weight"), "bq": A(ap + "self.query.bias"),
                "wk": T(ap + "self.key.weight"), "bk": A(ap + "self.key.bias"),
                "wv": T(ap + "self.value.weight"), "bv": A(ap + "self.value.bias"),
                "wo": T(ap + "output.dense.weight"), "bo": A(ap + "output.dense.bias"),
                "ln_s": A(ap + "output.LayerNorm.weight"),
                "ln_b": A(ap + "output.LayerNorm.bias"),
            }

        layers = []
        i = 0
        while f"{prefix}Qformer.bert.encoder.layer.{i}.attention.self.query.weight" in state:
            lp = f"Qformer.bert.encoder.layer.{i}."
            layer = {
                "self": attn(lp + "attention."),
                "ffn": {
                    "w1": T(lp + "intermediate_query.dense.weight"),
                    "b1": A(lp + "intermediate_query.dense.bias"),
                    "w2": T(lp + "output_query.dense.weight"),
                    "b2": A(lp + "output_query.dense.bias"),
                    "ln_s": A(lp + "output_query.LayerNorm.weight"),
                    "ln_b": A(lp + "output_query.LayerNorm.bias"),
                },
            }
            if f"{prefix}{lp}crossattention.self.query.weight" in state:
                layer["cross"] = attn(lp + "crossattention.")
            layers.append(layer)
            i += 1
        return {
            "ln_vision_s": A("ln_vision.weight"),
            "ln_vision_b": A("ln_vision.bias"),
            "query_tokens": A("query_tokens")[0],   # (1, n, 768) -> (n, 768)
            "emb_ln_s": A("Qformer.bert.embeddings.LayerNorm.weight"),
            "emb_ln_b": A("Qformer.bert.embeddings.LayerNorm.bias"),
            "layers": layers,
        }

    raise ValueError(f"Unknown resampler type: {resampler_type}")


def export_llava_checkpoint(params: Mapping[str, Any], llm_cfg: LLMConfig,
                            model_cfg=None, path: str = None,
                            extra_config: Optional[dict] = None) -> dict:
    """Inverse of :func:`convert_llava_checkpoint`: functional pytree ->
    HF-format state dict (reference key layout / (out, in) Linear
    orientation), optionally written as safetensors + config.json so
    torch-side tooling (and the reference itself) can load our training
    results."""
    import numpy as np

    import jax

    def t(x):
        # safetensors writes raw buffers: transposed views MUST be
        # materialized contiguous or the file silently holds wrong data
        return np.ascontiguousarray(np.asarray(jax.device_get(x), np.float32).T)

    def v(x):
        return np.ascontiguousarray(np.asarray(jax.device_get(x), np.float32))

    state: Dict[str, np.ndarray] = {}
    llm = params["llm"]
    state["model.embed_tokens.weight"] = v(llm["embed_tokens"])
    state["model.norm.weight"] = v(llm["norm"])
    state["lm_head.weight"] = t(llm["lm_head"])
    for i, layer in enumerate(llm["layers"]):
        p = f"model.layers.{i}."
        state[p + "input_layernorm.weight"] = v(layer["input_layernorm"])
        state[p + "post_attention_layernorm.weight"] = v(layer["post_attention_layernorm"])
        a = layer["attn"]
        state[p + "self_attn.q_proj.weight"] = t(a["wq"])
        state[p + "self_attn.k_proj.weight"] = t(a["wk"])
        state[p + "self_attn.v_proj.weight"] = t(a["wv"])
        state[p + "self_attn.o_proj.weight"] = t(a["wo"])
        if "bq" in a:
            state[p + "self_attn.q_proj.bias"] = v(a["bq"])
            state[p + "self_attn.k_proj.bias"] = v(a["bk"])
            state[p + "self_attn.v_proj.bias"] = v(a["bv"])
        m = layer["mlp"]
        state[p + "mlp.gate_proj.weight"] = t(m["w_gate"])
        state[p + "mlp.up_proj.weight"] = t(m["w_up"])
        state[p + "mlp.down_proj.weight"] = t(m["w_down"])

    if "vision" in params:
        vp = params["vision"]
        pre = "model.vision_tower.vision_tower.vision_model."
        conv = np.asarray(jax.device_get(vp["patch_embed"]["w"]), np.float32)
        hidden = conv.shape[1]
        ps = int(round((conv.shape[0] // 3) ** 0.5))
        state[pre + "embeddings.patch_embedding.weight"] = \
            conv.T.reshape(hidden, 3, ps, ps)
        state[pre + "embeddings.patch_embedding.bias"] = v(vp["patch_embed"]["b"])
        state[pre + "embeddings.position_embedding.weight"] = v(vp["pos_embed"])
        for i, layer in enumerate(vp["layers"]):
            p = f"{pre}encoder.layers.{i}."
            state[p + "layer_norm1.weight"] = v(layer["ln1"]["scale"])
            state[p + "layer_norm1.bias"] = v(layer["ln1"]["bias"])
            state[p + "layer_norm2.weight"] = v(layer["ln2"]["scale"])
            state[p + "layer_norm2.bias"] = v(layer["ln2"]["bias"])
            a = layer["attn"]
            state[p + "self_attn.q_proj.weight"] = t(a["wq"])
            state[p + "self_attn.q_proj.bias"] = v(a["bq"])
            state[p + "self_attn.k_proj.weight"] = t(a["wk"])
            state[p + "self_attn.k_proj.bias"] = v(a["bk"])
            state[p + "self_attn.v_proj.weight"] = t(a["wv"])
            state[p + "self_attn.v_proj.bias"] = v(a["bv"])
            state[p + "self_attn.out_proj.weight"] = t(a["wo"])
            state[p + "self_attn.out_proj.bias"] = v(a["bo"])
            state[p + "mlp.fc1.weight"] = t(layer["mlp"]["w1"])
            state[p + "mlp.fc1.bias"] = v(layer["mlp"]["b1"])
            state[p + "mlp.fc2.weight"] = t(layer["mlp"]["w2"])
            state[p + "mlp.fc2.bias"] = v(layer["mlp"]["b2"])

    if "projector" in params:
        pj = params["projector"]
        pre = "model.mm_projector."
        if "conv_w" in pj:                     # pooler (pooler_projector.py)
            cw = v(pj["conv_w"])               # (4*Cin, Cout)
            cout = cw.shape[1]
            state[pre + "conv_pool.weight"] = np.ascontiguousarray(
                cw.reshape(2, 2, -1, cout).transpose(3, 2, 0, 1))
            state[pre + "conv_pool.bias"] = v(pj["conv_b"])
            state[pre + "proj.1.weight"] = t(pj["w1"])
            state[pre + "proj.1.bias"] = v(pj["b1"])
        else:
            n_linear = 0
            while f"w{n_linear + 1}" in pj:
                n_linear += 1
            if n_linear == 1 and "res" not in pj:
                # bare nn.Linear ('linear' type has no Sequential wrapper)
                state[pre + "weight"] = t(pj["w1"])
                state[pre + "bias"] = v(pj["b1"])
            else:
                for i in range(1, n_linear + 1):
                    state[f"{pre}{2 * (i - 1)}.weight"] = t(pj[f"w{i}"])
                    state[f"{pre}{2 * (i - 1)}.bias"] = v(pj[f"b{i}"])
                for j, blk in enumerate(pj.get("res", ())):
                    bp = f"{pre}{2 * n_linear - 1 + j}."
                    state[bp + "pre_norm.weight"] = v(blk["ln_s"])
                    state[bp + "pre_norm.bias"] = v(blk["ln_b"])
                    state[bp + "proj.0.weight"] = t(blk["w1"])
                    state[bp + "proj.0.bias"] = v(blk["b1"])
                    state[bp + "proj.2.weight"] = t(blk["w2"])
                    state[bp + "proj.2.bias"] = v(blk["b2"])
    if "image_newline" in params:
        state["model.image_newline"] = v(params["image_newline"])
    if "ground_head" in params and "zero_target" in params["ground_head"]:
        gh = params["ground_head"]
        state["ground_head_zero_target"] = v(gh["zero_target"])
        for name in ("obj", "query"):
            m = gh[name]
            state[f"ground_head_{name}.0.weight"] = t(m["w1"])
            state[f"ground_head_{name}.0.bias"] = v(m["b1"])
            state[f"ground_head_{name}.2.weight"] = v(m["ln_scale"])
            state[f"ground_head_{name}.2.bias"] = v(m["ln_bias"])
            state[f"ground_head_{name}.3.weight"] = t(m["w2"])
            state[f"ground_head_{name}.3.bias"] = v(m["b2"])

    if path is not None:
        import json as _json
        import os as _os

        from safetensors.numpy import save_file

        _os.makedirs(path, exist_ok=True)
        save_file(state, _os.path.join(path, "model.safetensors"))
        config = {
            "model_type": "qwen2",
            "vocab_size": llm_cfg.vocab_size,
            "hidden_size": llm_cfg.hidden_size,
            "intermediate_size": llm_cfg.intermediate_size,
            "num_hidden_layers": llm_cfg.num_hidden_layers,
            "num_attention_heads": llm_cfg.num_attention_heads,
            "num_key_value_heads": llm_cfg.num_key_value_heads,
            "head_dim": llm_cfg.head_dim,
            "max_position_embeddings": llm_cfg.max_position_embeddings,
            "rope_theta": llm_cfg.rope_theta,
            "rms_norm_eps": llm_cfg.rms_norm_eps,
            "tie_word_embeddings": llm_cfg.tie_word_embeddings,
        }
        if model_cfg is not None:
            w3d = model_cfg.world_3d
            parts = [w3d.pooling.value]
            if w3d.discrete:
                parts.append("discrete")
            if w3d.pos_embed.value != "none":
                parts.append(w3d.pos_embed.value)
            config.update({
                "world_position_embedding_type": "-".join(parts),
                "voxel_size": w3d.voxel.voxel_size,
                "min_xyz_range": list(w3d.voxel.min_xyz_range),
                "max_xyz_range": list(w3d.voxel.max_xyz_range),
                "object_feature_type": w3d.object_feature_type.value
                + ("-pe" if w3d.object_feature_use_pe else ""),
                "ground_head_type": model_cfg.ground_head.value,
                "ground_head_temperature": model_cfg.ground_head_temperature,
                "tokenizer_model_max_length": model_cfg.tokenizer_model_max_length,
            })
        if extra_config:
            config.update(extra_config)
        with open(_os.path.join(path, "config.json"), "w") as f:
            _json.dump(config, f, indent=2)
    return state


def convert_llava_checkpoint(state: Mapping[str, Any], llm_cfg: LLMConfig,
                             vision_cfg: VisionConfig, dtype=jnp.bfloat16,
                             ground_head: bool = False) -> Dict[str, Any]:
    """Full LLaVA-style checkpoint -> assembled model pytree.

    Key prefixes per the reference module tree: LLM at root, tower under
    ``model.vision_tower.vision_tower.``, projector ``model.mm_projector.``,
    newline ``model.image_newline``, ground head at root (llava_qwen.py:57).
    Pure-LLM checkpoints (no tower keys — e.g. a base Qwen2/Gemma model) load
    with only the ``llm`` subtree, matching the reference builder's non-llava
    branch (builder.py:253-265).
    """
    if "transformer.wte.weight" in state:          # MPT key layout
        out: Dict[str, Any] = {
            "llm": convert_mpt(state, llm_cfg, dtype=dtype),
        }
    else:
        out = {
            "llm": convert_qwen2(state, llm_cfg, dtype=dtype),
        }
    tower_prefix = "model.vision_tower.vision_tower.vision_model."
    if tower_prefix + "embeddings.patch_embedding.weight" in state:
        out["vision"] = convert_siglip(state, vision_cfg,
                                       prefix=tower_prefix, dtype=dtype)
    if any(k.startswith("model.mm_projector.") for k in state):
        out["projector"] = convert_projector(state, dtype=dtype)
    if "model.image_newline" in state:
        out["image_newline"] = jnp.asarray(_to_np(state["model.image_newline"]), dtype)
    if ground_head:
        def mlp(prefix):
            g = lambda k: _to_np(state[prefix + k])
            return {
                "w1": jnp.asarray(g("0.weight").T, dtype), "b1": jnp.asarray(g("0.bias"), dtype),
                "ln_scale": jnp.asarray(g("2.weight"), dtype), "ln_bias": jnp.asarray(g("2.bias"), dtype),
                "w2": jnp.asarray(g("3.weight").T, dtype), "b2": jnp.asarray(g("3.bias"), dtype),
            }
        out["ground_head"] = {
            "obj": mlp("ground_head_obj."),
            "query": mlp("ground_head_query."),
            "zero_target": jnp.asarray(_to_np(state["ground_head_zero_target"]), dtype),
        }
    return out
