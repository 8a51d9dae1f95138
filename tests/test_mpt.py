"""MPT family golden vs HF MptForCausalLM (the reference's llava_mpt.py
wrapper family): ALiBi key-position bias, mean-subtracting LayerNorm, fused
Wqkv split, ungated GELU MLP, tied lm_head — logits and cached greedy decode
on identical tiny weights."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from video3d_tpu.models import qwen2
from video3d_tpu.models.weights import convert_mpt, mpt_config_from_hf

HF_CFG = dict(d_model=64, n_heads=4, n_layers=2, expansion_ratio=4,
              max_seq_len=128, vocab_size=48)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import MptConfig, MptForCausalLM

    torch.manual_seed(0)
    cfg = MptConfig(**HF_CFG, attn_config={"alibi": True,
                                           "alibi_bias_max": 8,
                                           "attn_impl": "torch"})
    return MptForCausalLM(cfg).eval()


@pytest.fixture(scope="module")
def setup(hf_model):
    cfg = mpt_config_from_hf({**HF_CFG, "attn_config": {"alibi_bias_max": 8}})
    params = convert_mpt(hf_model.state_dict(), cfg)
    return cfg, params


def _positions(B, L, start=0):
    pos = jnp.arange(start, start + L)[None]
    return jnp.broadcast_to(pos[..., None], (B, L, 3))


class TestMptGolden:
    def test_alibi_slopes_match_hf(self, setup):
        from transformers.models.mpt.modeling_mpt import build_mpt_alibi_tensor

        for H in (4, 6, 8):          # incl. non-power-of-2 re-interleave
            want = build_mpt_alibi_tensor(H, 16).numpy()   # (H, 1, 16)
            slopes = np.asarray(qwen2.alibi_slopes(H))
            # HF bias = slope * (j - 15); ours = slope * j (softmax-shift
            # equivalent) -> compare the slope factors
            np.testing.assert_allclose(slopes,
                                       want[:, 0, -1] - want[:, 0, -2],
                                       rtol=1e-6)

    def test_full_forward_logits(self, hf_model, setup):
        cfg, params = setup
        rng = np.random.default_rng(0)
        ids = rng.integers(0, HF_CFG["vocab_size"], size=(2, 9))
        with torch.no_grad():
            want = hf_model(torch.tensor(ids)).logits.numpy()
        hidden, _ = qwen2.qwen2_forward(params, cfg,
                                        qwen2.embed_tokens(params, jnp.asarray(ids)),
                                        _positions(2, 9))
        got = np.asarray(qwen2.lm_head(params, hidden))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_cached_decode_matches_hf_greedy(self, hf_model, setup):
        cfg, params = setup
        ids = [5, 11, 17, 23]
        n_new = 6
        out = hf_model.generate(torch.tensor([ids]), max_new_tokens=n_new,
                                do_sample=False, pad_token_id=0)
        want = out[0, len(ids):].numpy()

        # prefill + cached decode through our stack
        cache = qwen2.KVCache.zeros(cfg, 1, 32, dtype=jnp.float32)
        emb = qwen2.embed_tokens(params, jnp.asarray([ids]))
        hidden, cache = qwen2.qwen2_forward(
            params, cfg, emb, _positions(1, len(ids)), kv_cache=cache,
            cache_positions=jnp.arange(len(ids))[None],
            kv_len=jnp.asarray([len(ids)]), prefill=True)
        tok = int(jnp.argmax(qwen2.lm_head(params, hidden)[0, -1]))
        got = [tok]
        for step in range(1, n_new):
            pos = len(ids) + step - 1
            hidden, cache = qwen2.qwen2_forward(
                params, cfg, qwen2.embed_tokens(params, jnp.asarray([[tok]])),
                _positions(1, 1, start=pos), kv_cache=cache,
                cache_positions=jnp.asarray([[pos]]),
                kv_len=jnp.asarray([pos + 1]))
            tok = int(jnp.argmax(qwen2.lm_head(params, hidden)[0, -1]))
            got.append(tok)
        assert got == want.tolist(), (got, want)

    def test_builder_detects_mpt(self):
        from video3d_tpu.models.builder import llm_config_from_hf

        cfg = llm_config_from_hf({"model_type": "mpt", **HF_CFG,
                                  "attn_config": {"alibi_bias_max": 8}})
        assert cfg.position_embedding == "alibi"
        assert cfg.norm_type == "layernorm"
        assert cfg.num_key_value_heads == cfg.num_attention_heads == 4
        assert cfg.intermediate_size == 256
        assert cfg.tie_word_embeddings
