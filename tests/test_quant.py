"""Weight-only int8 quantization: reconstruction error, logits drift, and
the qwen2 matmul dispatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.config import LLMConfig, ModelConfig
from video3d_tpu.models import qwen2
from video3d_tpu.models.quant import (is_quantized, matmul, quantize_tree,
                                      quantization_error, quantize_weight)

TINY = LLMConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                 num_hidden_layers=2, num_attention_heads=4,
                 num_key_value_heads=2, head_dim=16, rope_theta=10000.0,
                 max_position_embeddings=256, mrope_section=(4, 2, 2))


class TestQuant:
    def test_weight_roundtrip_error(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
        q = quantize_weight(w)
        assert q["q"].dtype == jnp.int8
        recon = q["q"].astype(jnp.float32) * q["scale"].astype(jnp.float32)
        rel = float(jnp.abs(recon - w).max() / jnp.abs(w).max())
        assert rel < 0.01   # 127-level symmetric quant

    def test_matmul_dispatch(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(3, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        ref = x @ w
        got = matmul(x, quantize_weight(w))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0.1, atol=0.1)

    def test_quantized_model_logits_close(self):
        params = qwen2.init_qwen2(jax.random.PRNGKey(0), TINY)
        qparams = {"llm": quantize_tree({"llm": params})["llm"]}["llm"]
        assert is_quantized(qparams["layers"][0]["attn"]["wq"])
        assert is_quantized(qparams["lm_head"])
        assert not is_quantized(qparams["embed_tokens"])
        assert quantization_error(params, qparams) < 0.01

        ids = jnp.asarray(np.random.default_rng(2).integers(0, 128, (1, 12)))
        pos = jnp.broadcast_to(jnp.arange(12)[None, :, None], (1, 12, 3))

        def logits(p):
            h, _ = qwen2.qwen2_forward(p, TINY, qwen2.embed_tokens(p, ids), pos)
            return qwen2.lm_head(p, h)

        ref = np.asarray(logits(params))
        got = np.asarray(logits(qparams))
        # int8 drift stays small relative to the logit scale
        assert np.abs(got - ref).max() / np.abs(ref).max() < 0.05
        # greedy tokens unchanged on this tiny model
        np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


class TestInt8KVCache:
    """Quantized KV cache: int8 values + per-token-per-head scales halve
    decode HBM traffic; prefill stays full-precision (qwen2.decoder_layer)."""

    def _setup(self):
        cfg = ModelConfig.tiny().llm
        params = qwen2.init_qwen2(jax.random.PRNGKey(0), cfg)
        ids = np.random.default_rng(0).integers(10, cfg.vocab_size, (2, 12))
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        pos = jnp.broadcast_to(jnp.arange(12)[None, :, None], (2, 12, 3))
        return cfg, params, embeds, pos

    def test_zeros_allocates_scales(self):
        cfg = ModelConfig.tiny().llm
        cache = qwen2.KVCache.zeros(cfg, 2, 32, dtype=jnp.int8)
        assert cache.k.dtype == jnp.int8 and cache.v.dtype == jnp.int8
        assert cache.k_scale.shape == cache.k.shape[:-1] + (1,)
        assert cache.k_scale.dtype == jnp.float32
        full = qwen2.KVCache.zeros(cfg, 2, 32)
        assert full.k_scale is None and full.v_scale is None

    def test_decode_logits_close_to_full_precision(self):
        """Prefill 11 tokens, decode the 12th: int8-cache logits track the
        full-precision cache closely (quantization error ~1/255 per entry)."""
        cfg, params, embeds, pos = self._setup()
        kv_len = jnp.asarray([11, 11], jnp.int32)
        cache_pos = jnp.broadcast_to(jnp.arange(11)[None], (2, 11))

        outs = {}
        for dtype in (jnp.float32, jnp.int8):
            cache = qwen2.KVCache.zeros(cfg, 2, 16, dtype=dtype)
            _, cache = qwen2.qwen2_forward(
                params, cfg, embeds[:, :11], pos[:, :11], kv_cache=cache,
                cache_positions=cache_pos, kv_len=kv_len, prefill=True)
            h, _ = qwen2.qwen2_forward(
                params, cfg, embeds[:, 11:12], pos[:, 11:12], kv_cache=cache,
                cache_positions=jnp.full((2, 1), 11, jnp.int32),
                kv_len=kv_len + 1)
            outs[str(dtype.__name__)] = np.asarray(
                qwen2.lm_head(params, h), np.float32)
        ref, got = outs["float32"], outs["int8"]
        denom = np.abs(ref).max()
        assert np.abs(got - ref).max() / denom < 0.02, \
            np.abs(got - ref).max() / denom
        # greedy choice unchanged on the tiny model
        assert (ref.argmax(-1) == got.argmax(-1)).all()

    def test_generate_with_int8_cache(self):
        """End-to-end greedy decode through the int8 cache emits the same
        tokens as the full-precision cache."""
        from __graft_entry__ import _make_batch
        from video3d_tpu.models import llava_video3d as lv3d
        from video3d_tpu.models.generate import generate_greedy

        cfg = ModelConfig.tiny()
        params = lv3d.init_model(jax.random.PRNGKey(0), cfg)
        batch = _make_batch(cfg, B=2, V=2, L=128)
        ref = generate_greedy(params, cfg, batch, max_new_tokens=4,
                              eos_token_id=-1, cache_dtype=jnp.float32)
        got = generate_greedy(params, cfg, batch, max_new_tokens=4,
                              eos_token_id=-1, cache_dtype=jnp.int8)
        np.testing.assert_array_equal(np.asarray(ref.tokens)[:, :4],
                                      np.asarray(got.tokens)[:, :4])
