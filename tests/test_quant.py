"""Weight-only int8 quantization: reconstruction error, logits drift, and
the qwen2 matmul dispatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.config import LLMConfig
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
