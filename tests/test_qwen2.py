"""Numerical parity of the JAX Qwen2 decoder against HF transformers
(torch CPU) on a tiny random-initialized config, plus mRoPE and KV-cache
consistency checks."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from video3d_tpu.config import LLMConfig
from video3d_tpu.models import qwen2
from video3d_tpu.models.weights import convert_qwen2

TINY = LLMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                 num_hidden_layers=2, num_attention_heads=4,
                 num_key_value_heads=2, head_dim=8,
                 rope_theta=10000.0, max_position_embeddings=256,
                 mrope_section=(2, 1, 1))


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen2Config(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        num_key_value_heads=TINY.num_key_value_heads,
        head_dim=TINY.head_dim,
        max_position_embeddings=TINY.max_position_embeddings,
        rope_theta=TINY.rope_theta, rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = Qwen2ForCausalLM(cfg).eval()
    return model


@pytest.fixture(scope="module")
def params(hf_model):
    return convert_qwen2(hf_model.state_dict(), TINY)


def replicate_positions(pos_1d):
    """(B, L) -> (B, L, 3) mRoPE ids; replicated == standard RoPE."""
    return jnp.broadcast_to(jnp.asarray(pos_1d)[..., None], (*pos_1d.shape, 3))


class TestForwardParity:
    def test_logits_match_hf(self, hf_model, params):
        rng = np.random.default_rng(0)
        ids = rng.integers(0, TINY.vocab_size, size=(2, 11))
        with torch.no_grad():
            ref = hf_model(torch.tensor(ids)).logits.numpy()

        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        pos = replicate_positions(np.broadcast_to(np.arange(11), (2, 11)))
        hidden, _ = qwen2.qwen2_forward(params, TINY, embeds, pos)
        logits = np.asarray(qwen2.lm_head(params, hidden))
        np.testing.assert_allclose(logits, ref, rtol=2e-4, atol=2e-4)

    def test_padding_mask_matches_hf(self, hf_model, params):
        rng = np.random.default_rng(1)
        ids = rng.integers(0, TINY.vocab_size, size=(2, 9))
        attn = np.ones((2, 9), np.int64)
        attn[1, 6:] = 0  # right padding on sample 1
        with torch.no_grad():
            ref = hf_model(torch.tensor(ids), attention_mask=torch.tensor(attn)).logits.numpy()

        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        pos = replicate_positions(np.broadcast_to(np.arange(9), (2, 9)))
        # (B, L, S) pad mask: keys at padded slots are unattendable
        mask = jnp.asarray(attn, bool)[:, None, :] & jnp.ones((2, 9, 1), bool)
        causal = jnp.tril(jnp.ones((9, 9), bool))[None]
        hidden, _ = qwen2.qwen2_forward(params, TINY, embeds, pos,
                                        attn_mask=mask & causal)
        logits = np.asarray(qwen2.lm_head(params, hidden))
        # Only compare non-padded positions.
        np.testing.assert_allclose(logits[0], ref[0], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(logits[1, :6], ref[1, :6], rtol=2e-4, atol=2e-4)


class TestMRoPE:
    def test_cos_sin_match_reference_formula(self):
        """Literal torch re-derivation of modeling_qwen2.py:106-173."""
        rng = np.random.default_rng(2)
        B, L, hd = 2, 5, TINY.head_dim
        pos = rng.integers(0, 100, size=(B, L, 3)).astype(np.int64)

        inv_freq = 1.0 / (TINY.rope_theta ** (torch.arange(0, hd, 2).float() / hd))
        p = torch.tensor(pos).permute(2, 0, 1)                     # (3, B, L)
        inv_exp = inv_freq[None, None, :, None].expand(3, B, -1, 1)
        p_exp = p[:, :, None, :].float()
        freqs = (inv_exp @ p_exp).transpose(2, 3)                  # (3, B, L, hd/2)
        emb = torch.cat((freqs, freqs), dim=-1)
        cos_t, sin_t = emb.cos(), emb.sin()
        sections = list(TINY.mrope_section) * 2
        cos_ref = torch.cat([m[i % 3] for i, m in enumerate(cos_t.split(sections, dim=-1))], dim=-1)
        sin_ref = torch.cat([m[i % 3] for i, m in enumerate(sin_t.split(sections, dim=-1))], dim=-1)

        cos, sin = qwen2.compute_mrope_cos_sin(jnp.asarray(pos), TINY)
        np.testing.assert_allclose(np.asarray(cos), cos_ref.numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sin), sin_ref.numpy(), rtol=1e-5, atol=1e-5)

    def test_replicated_equals_standard_rope(self, hf_model, params):
        """(p,p,p) mRoPE ids must reproduce HF's standard 1D RoPE exactly —
        this is how the reference treats text tokens (:997-1004)."""
        ids = np.arange(7)[None]
        with torch.no_grad():
            ref = hf_model(torch.tensor(ids)).logits.numpy()
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        # offset positions on a distinct path from test_logits_match_hf
        pos = replicate_positions(np.arange(7)[None])
        hidden, _ = qwen2.qwen2_forward(params, TINY, embeds, pos)
        logits = np.asarray(qwen2.lm_head(params, hidden))
        np.testing.assert_allclose(logits, ref, rtol=2e-4, atol=2e-4)


class TestKVCacheDecode:
    def test_incremental_matches_full(self, params):
        """Prefill-then-decode must equal one full forward."""
        rng = np.random.default_rng(3)
        B, L_pre, n_new, max_len = 2, 6, 3, 16
        ids = rng.integers(0, TINY.vocab_size, size=(B, L_pre + n_new))

        # Full forward (no cache)
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        pos_full = replicate_positions(np.broadcast_to(np.arange(L_pre + n_new), ids.shape))
        full_hidden, _ = qwen2.qwen2_forward(params, TINY, embeds, pos_full)
        full_logits = np.asarray(qwen2.lm_head(params, full_hidden))

        # Prefill with cache
        cache = qwen2.KVCache.zeros(TINY, B, max_len, dtype=jnp.float32)
        pre_embeds = qwen2.embed_tokens(params, jnp.asarray(ids[:, :L_pre]))
        pre_pos = replicate_positions(np.broadcast_to(np.arange(L_pre), (B, L_pre)))
        cache_positions = jnp.broadcast_to(jnp.arange(L_pre), (B, L_pre))
        kv_len = jnp.full((B,), L_pre)
        hidden, cache = qwen2.qwen2_forward(
            params, TINY, pre_embeds, pre_pos, kv_cache=cache,
            cache_positions=cache_positions, kv_len=kv_len)
        logits = np.asarray(qwen2.lm_head(params, hidden))
        np.testing.assert_allclose(logits, full_logits[:, :L_pre], rtol=2e-4, atol=2e-4)

        # Decode steps
        for t in range(n_new):
            p = L_pre + t
            step_embeds = qwen2.embed_tokens(params, jnp.asarray(ids[:, p:p + 1]))
            step_pos = replicate_positions(np.full((B, 1), p))
            hidden, cache = qwen2.qwen2_forward(
                params, TINY, step_embeds, step_pos, kv_cache=cache,
                cache_positions=jnp.full((B, 1), p), kv_len=jnp.full((B,), p + 1))
            step_logits = np.asarray(qwen2.lm_head(params, hidden))
            np.testing.assert_allclose(step_logits[:, 0], full_logits[:, p],
                                       rtol=2e-4, atol=2e-4, err_msg=f"step {t}")


class TestContiguousCacheUpdate:
    """contiguous_update=True (one dynamic_update_slice) must be bit-equal
    to the vmapped per-row scatter when every row writes the same slot
    range — the chunked-prefill / suffix-over-prefix contract
    (models/generate.py start_decode_prefix, _prefill_chunk)."""

    @pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8])
    def test_matches_scatter(self, params, cache_dtype):
        rng = np.random.default_rng(5)
        B, P, L, max_len = 2, 5, 4, 16
        ids = rng.integers(0, TINY.vocab_size, size=(B, P + L))

        def run(contig):
            cache = qwen2.KVCache.zeros(TINY, B, max_len, dtype=cache_dtype)
            # seed the prefix slots
            pre = qwen2.embed_tokens(params, jnp.asarray(ids[:, :P]))
            pre_pos = replicate_positions(
                np.broadcast_to(np.arange(P), (B, P)))
            _, cache = qwen2.qwen2_forward(
                params, TINY, pre, pre_pos, kv_cache=cache,
                cache_positions=jnp.broadcast_to(jnp.arange(P), (B, P)),
                kv_len=jnp.full((B,), P), contiguous_update=contig)
            # chunk write at [P, P+L) for every row
            chunk = qwen2.embed_tokens(params, jnp.asarray(ids[:, P:]))
            pos = replicate_positions(
                np.broadcast_to(P + np.arange(L), (B, L)))
            hidden, cache = qwen2.qwen2_forward(
                params, TINY, chunk, pos, kv_cache=cache,
                cache_positions=jnp.broadcast_to(P + jnp.arange(L), (B, L)),
                kv_len=jnp.full((B,), P + L), contiguous_update=contig)
            return hidden, cache

        h0, c0 = run(False)
        h1, c1 = run(True)
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        for a, b in zip(c0, c1):
            if a is not None:
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLlamaFamily:
    """attention_bias=False path (LLaMA/Mistral wrappers, SURVEY M9)."""

    def test_logits_match_hf_llama(self):
        from transformers import LlamaConfig, LlamaForCausalLM

        torch.manual_seed(1)
        cfg = LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=2, head_dim=8,
                          max_position_embeddings=256, rope_theta=10000.0,
                          rms_norm_eps=1e-6, tie_word_embeddings=False,
                          attention_bias=False, attn_implementation="eager")
        hf = LlamaForCausalLM(cfg).eval()
        lcfg = LLMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=8,
                         rope_theta=10000.0, max_position_embeddings=256,
                         attention_bias=False, mrope_section=(2, 1, 1))
        params = convert_qwen2(hf.state_dict(), lcfg)
        assert "bq" not in params["layers"][0]["attn"]

        rng = np.random.default_rng(0)
        ids = rng.integers(0, 128, size=(1, 9))
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits.numpy()
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        pos = replicate_positions(np.broadcast_to(np.arange(9), (1, 9)))
        hidden, _ = qwen2.qwen2_forward(params, lcfg, embeds, pos)
        logits = np.asarray(qwen2.lm_head(params, hidden))
        np.testing.assert_allclose(logits, ref, rtol=2e-4, atol=2e-4)


class TestBuilderConfig:
    def test_llm_config_from_hf(self):
        from video3d_tpu.models.builder import llm_config_from_hf, model_config_from_hf

        hf = {"model_type": "qwen2", "vocab_size": 152064, "hidden_size": 3584,
              "intermediate_size": 18944, "num_hidden_layers": 28,
              "num_attention_heads": 28, "num_key_value_heads": 4,
              "rope_theta": 1000000.0,
              "world_position_embedding_type": "avg-discrete-sin3d",
              "voxel_size": 0.1, "min_xyz_range": [-15, -15, -5],
              "max_xyz_range": [15, 15, 5], "ground_head_type": "infonce",
              "object_feature_type": "patch14-pe"}
        cfg = llm_config_from_hf(hf)
        assert cfg.head_dim == 128 and cfg.attention_bias
        assert cfg.mrope_section == (32, 16, 16)
        mc = model_config_from_hf(hf)
        from video3d_tpu.config import GroundHeadType, PosEmbedType
        assert mc.world_3d.pos_embed == PosEmbedType.SIN3D
        assert mc.world_3d.discrete
        assert mc.ground_head == GroundHeadType.INFONCE
        # llama-style
        hf2 = {"model_type": "llama", "vocab_size": 128, "hidden_size": 32,
               "intermediate_size": 64, "num_hidden_layers": 2,
               "num_attention_heads": 4}
        cfg2 = llm_config_from_hf(hf2)
        assert not cfg2.attention_bias and cfg2.rope_theta == 1e4
