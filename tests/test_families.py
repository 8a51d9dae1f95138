"""LLM-family parity: Gemma and Mixtral decoders loaded through the builder
match the HF reference implementations logit-for-logit (the reference wraps
these same families as llava_gemma / llava_mixtral)."""

import json
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from video3d_tpu.models import qwen2
from video3d_tpu.models.builder import llm_config_from_hf
from video3d_tpu.models.weights import convert_qwen2


def _forward_ours(params, cfg, ids):
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    L = ids.shape[1]
    pos = jnp.broadcast_to(jnp.arange(L)[None, :, None], (*ids.shape, 3))
    hidden, _ = qwen2.qwen2_forward(params, cfg, embeds, pos)
    return np.asarray(qwen2.lm_head(params, hidden), np.float32)


class TestGemma:
    def test_logits_match_hf(self):
        from transformers import GemmaConfig, GemmaForCausalLM

        hf_cfg = GemmaConfig(
            vocab_size=160, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, max_position_embeddings=256,
            rope_theta=10000.0, hidden_activation="gelu_pytorch_tanh",
            attn_implementation="eager")
        torch.manual_seed(0)
        hf = GemmaForCausalLM(hf_cfg).eval()

        cfg = llm_config_from_hf(json.loads(hf_cfg.to_json_string()))
        assert cfg.hidden_act == "gelu_tanh"
        assert cfg.rms_norm_add_unit_offset and cfg.embed_scale
        assert cfg.tie_word_embeddings and not cfg.attention_bias
        state = {k: v.numpy() for k, v in hf.state_dict().items()}
        params = convert_qwen2(state, cfg)

        ids = np.random.default_rng(0).integers(0, 160, (2, 9))
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits.numpy()
        got = _forward_ours(params, cfg, ids)
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)

    def test_generate_matches_hf_greedy(self):
        """KV-cache decode path under Gemma semantics (embed scale applied
        per forward call, incl. single-token decode steps)."""
        from transformers import GemmaConfig, GemmaForCausalLM

        hf_cfg = GemmaConfig(
            vocab_size=160, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, max_position_embeddings=256,
            rope_theta=10000.0, hidden_activation="gelu_pytorch_tanh",
            attn_implementation="eager")
        torch.manual_seed(1)
        hf = GemmaForCausalLM(hf_cfg).eval()
        cfg = llm_config_from_hf(json.loads(hf_cfg.to_json_string()))
        params = convert_qwen2({k: v.numpy() for k, v in
                                hf.state_dict().items()}, cfg)

        ids = np.random.default_rng(1).integers(0, 160, (1, 7))
        with torch.no_grad():
            ref_ids = hf.generate(torch.tensor(ids), max_new_tokens=5,
                                  do_sample=False).numpy()[0, 7:]

        # ours: prefill + greedy decode through the cache
        L, new = 7, 5
        cache = qwen2.KVCache.zeros(cfg, 1, L + new, dtype=jnp.float32)
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        pos = jnp.broadcast_to(jnp.arange(L)[None, :, None], (1, L, 3))
        hidden, cache = qwen2.qwen2_forward(
            params, cfg, embeds, pos, kv_cache=cache,
            cache_positions=jnp.arange(L)[None], kv_len=jnp.asarray([L]),
            prefill=True)
        tok = int(np.asarray(qwen2.lm_head(params, hidden))[0, -1].argmax())
        out = [tok]
        for step in range(new - 1):
            p = L + step
            e = qwen2.embed_tokens(params, jnp.asarray([[tok]]))
            pos1 = jnp.full((1, 1, 3), p, jnp.int32)
            hidden, cache = qwen2.qwen2_forward(
                params, cfg, e, pos1, kv_cache=cache,
                cache_positions=jnp.asarray([[p]]),
                kv_len=jnp.asarray([p + 1]))
            tok = int(np.asarray(qwen2.lm_head(params, hidden))[0, -1].argmax())
            out.append(tok)
        np.testing.assert_array_equal(np.asarray(out), ref_ids)


class TestMixtral:
    def test_logits_match_hf(self):
        from transformers import MixtralConfig, MixtralForCausalLM

        hf_cfg = MixtralConfig(
            vocab_size=160, hidden_size=32, intermediate_size=56,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, max_position_embeddings=256,
            rope_theta=10000.0, num_local_experts=4, num_experts_per_tok=2,
            attn_implementation="eager")
        torch.manual_seed(2)
        hf = MixtralForCausalLM(hf_cfg).eval()

        cfg = llm_config_from_hf(json.loads(hf_cfg.to_json_string()))
        assert cfg.moe is not None and cfg.moe.norm_topk_prob
        assert cfg.moe.shared_expert_intermediate_size is None
        assert not cfg.attention_bias and cfg.hidden_act == "silu"
        state = {k: v.numpy() for k, v in hf.state_dict().items()}
        params = convert_qwen2(state, cfg)
        assert "moe" in params["layers"][0] and "shared" not in params["layers"][0]["moe"]

        ids = np.random.default_rng(2).integers(0, 160, (2, 8))
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits.numpy()
        got = _forward_ours(params, cfg, ids)
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)
