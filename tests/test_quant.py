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


class TestW8A8:
    """Dynamic-activation int8 (int8 x int8 -> int32 MXU path)."""

    def test_matmul_close_to_f32(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 5, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        ref = np.asarray(x @ w)
        got = np.asarray(matmul(x, quantize_weight(w, act="int8")))
        # two int8 roundings (weight + activation) stack; per-token x
        # per-channel scales keep the product error ~1%
        assert np.abs(got - ref).max() / np.abs(ref).max() < 0.03

    def test_int32_accumulation_no_overflow(self):
        # worst-case magnitudes: 512 * 127 * 127 = 8.3e6 << int32 max —
        # check the path really accumulates in int32, not int8/int16
        x = jnp.full((1, 512), 100.0, jnp.float32)
        w = jnp.full((512, 8), 100.0, jnp.float32)
        got = np.asarray(matmul(x, quantize_weight(w, act="int8")))
        np.testing.assert_allclose(got, np.asarray(x @ w), rtol=0.02)

    def test_quantize_tree_act_flag(self):
        from video3d_tpu.models.quant import W8A8Weight

        params = qwen2.init_qwen2(jax.random.PRNGKey(0), TINY)
        qp = quantize_tree({"llm": params}, act="int8")["llm"]
        assert isinstance(qp["layers"][0]["attn"]["wq"], W8A8Weight)
        # weight-only stays a plain dict (pytree structure is the marker)
        assert isinstance(quantize_tree({"llm": params})["llm"][
            "layers"][0]["attn"]["wq"], dict)
        # the pytree flattens to arrays only (jit-safe as a param leaf)
        leaves = jax.tree.leaves(qp["layers"][0]["attn"]["wq"])
        assert all(hasattr(l, "dtype") for l in leaves)

    def test_w8a8_model_logits_close(self):
        params = qwen2.init_qwen2(jax.random.PRNGKey(0), TINY)
        qparams = quantize_tree({"llm": params}, act="int8")["llm"]

        ids = jnp.asarray(np.random.default_rng(2).integers(0, 128, (1, 12)))
        pos = jnp.broadcast_to(jnp.arange(12)[None, :, None], (1, 12, 3))

        def logits(p):
            h, _ = qwen2.qwen2_forward(p, TINY, qwen2.embed_tokens(p, ids), pos)
            return qwen2.lm_head(p, h)

        ref = np.asarray(logits(params))
        got = np.asarray(logits(qparams))
        assert np.abs(got - ref).max() / np.abs(ref).max() < 0.08
        np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))

    def test_w8a8_vision_tower(self):
        from video3d_tpu.config import VisionConfig
        from video3d_tpu.models import siglip
        from video3d_tpu.models.quant import VISION_PATTERNS

        cfg = VisionConfig(hidden_size=64, intermediate_size=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=28, patch_size=14)
        params = siglip.init_vision_tower(jax.random.PRNGKey(0), cfg)
        qp = quantize_tree({"vision": params}, patterns=VISION_PATTERNS,
                           act="int8")["vision"]
        assert is_quantized(qp["layers"][0]["attn"]["wq"])
        assert is_quantized(qp["layers"][1]["mlp"]["w1"])
        assert not is_quantized(qp["patch_embed"]["w"])

        px = jnp.asarray(np.random.default_rng(4).normal(
            size=(1, 3, 28, 28)).astype(np.float32))
        ref = np.asarray(siglip.vision_tower_forward(params, px, cfg))
        got = np.asarray(siglip.vision_tower_forward(qp, px, cfg))
        # residual stream keeps magnitudes comparable; int8 drift is small
        assert np.abs(got - ref).max() / np.abs(ref).max() < 0.1
        # cosine similarity of flattened features stays near 1
        a, b = ref.ravel(), got.ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.999


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
        # r5 flat head storage: k (L, B, S, KV*hd), scales (L, B, S, KV, 1)
        assert cache.k.shape[-1] == cfg.num_key_value_heads * cfg.head_dim
        assert cache.k_scale.shape == cache.k.shape[:-1] + (
            cfg.num_key_value_heads, 1)
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


class TestInt4:
    def test_pack_unpack_roundtrip(self):
        from video3d_tpu.kernels.quant_matvec import unpack_int4

        rng = np.random.default_rng(0)
        q = rng.integers(-7, 8, size=(32, 16)).astype(np.int8)
        packed = (jnp.asarray(q[0::2]) & jnp.int8(0x0F)) \
            | (jnp.asarray(q[1::2]) << 4)
        np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), q)

    def test_reconstruction_error_bound(self):
        from video3d_tpu.models.quant import quantize_weight_int4

        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=(64, 24)).astype(np.float32))
        d = quantize_weight_int4(w, group=16)
        from video3d_tpu.kernels.quant_matvec import unpack_int4

        qw = np.asarray(unpack_int4(d.q4))[:, :24].astype(np.float32)
        sc = np.repeat(np.asarray(d.scale4, np.float32)[:, :24], 16,
                       axis=0)
        recon = qw * sc
        # error <= scale/2 (round-to-nearest) + |q|<=7 times the bf16
        # rounding of the stored scale (<=2^-8 relative)
        assert np.all(np.abs(recon - np.asarray(w))
                      <= sc / 2 + 7 * sc * 2.0 ** -8 + 1e-6)

    def test_matmul_matches_dequant_reference(self):
        from video3d_tpu.models.quant import matmul, quantize_weight_int4
        from video3d_tpu.kernels.quant_matvec import unpack_int4

        rng = np.random.default_rng(2)
        in_, out = 40, 20                       # in % group != 0 -> pad path
        w = jnp.asarray(rng.normal(size=(in_, out)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(2, 3, in_)).astype(np.float32))
        d = quantize_weight_int4(w, group=16)
        got = np.asarray(matmul(x, d))
        qw = np.asarray(unpack_int4(d.q4)).astype(np.float32)
        sc = np.repeat(np.asarray(d.scale4, np.float32), 16, axis=0)
        xp = np.zeros((2, 3, qw.shape[0]), np.float32)
        xp[..., :in_] = np.asarray(x)
        want = (xp @ (qw * sc))[..., :out]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_kernel_interpret_matches_fallback(self):
        from video3d_tpu.kernels.quant_matvec import int4_matmul, unpack_int4
        from video3d_tpu.models.quant import quantize_weight_int4

        rng = np.random.default_rng(3)
        in_, out, group = 64, 32, 16
        w = jnp.asarray(rng.normal(size=(in_, out)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(4, in_)).astype(np.float32))
        d = quantize_weight_int4(w, group=group)
        got = np.asarray(int4_matmul(x, d.q4, d.scale4, group=group,
                                     block_out=128, interpret=True))
        qw = np.asarray(unpack_int4(d.q4)).astype(np.float32)
        sc = np.repeat(np.asarray(d.scale4, np.float32), group, axis=0)
        want = np.asarray(x) @ (qw * sc)
        np.testing.assert_allclose(got[:, :out], want[:, :out],
                                   rtol=2e-2, atol=2e-2)

    def test_int8_kernel_interpret_matches_xla(self):
        """int8_matmul (decode lm_head matvec kernel) == the XLA dequant
        dot, including the lead-dim reshape and the (1, out) scale row."""
        from video3d_tpu.kernels.quant_matvec import int8_matmul
        from video3d_tpu.models.quant import quantize_weight

        rng = np.random.default_rng(7)
        for b_shape, in_, out in (((1,), 64, 256), ((5,), 64, 384),
                                  ((2, 3), 128, 256)):
            w = jnp.asarray(rng.normal(size=(in_, out)).astype(np.float32))
            x = jnp.asarray(
                rng.normal(size=(*b_shape, in_)).astype(np.float32))
            d = quantize_weight(w)
            got = np.asarray(int8_matmul(x, d["q"], d["scale"],
                                         interpret=True))
            # exact f32 dequant dot; atol absorbs the kernels' bf16
            # compute (B>1 MXU path) on top of rtol for quant error
            want = np.asarray(
                x @ d["q"].astype(jnp.float32)
                * d["scale"].astype(jnp.float32))
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=2e-2, atol=6e-2)

    def test_int8_block_pick_fallback(self):
        """Shapes whose out dim has no 128-multiple divisor refuse the
        kernel (dispatch then keeps the XLA path)."""
        from video3d_tpu.kernels.quant_matvec import _pick_block_out

        assert _pick_block_out(64, 100) == 0
        assert _pick_block_out(3584, 152064) == 1536  # lm_head: 99 tiles
        assert _pick_block_out(3584, 18944) == 512    # mlp up/gate
        # VMEM cap: double-buffered tiles stay under ~12 MB total
        assert _pick_block_out(3584, 4096) * 3584 * 2 <= 12 << 20

    def test_int4_decode_end_to_end(self):
        """quantize_tree(bits=4) on the tiny LLM -> greedy decode runs and
        emits in-vocab tokens through the standard matmul dispatch."""
        from video3d_tpu.models.quant import quantize_tree
        from video3d_tpu.config import LLMConfig
        from video3d_tpu.models import qwen2

        cfg = LLMConfig.tiny() if hasattr(LLMConfig, "tiny") else None
        if cfg is None:
            from video3d_tpu.config import ModelConfig
            cfg = ModelConfig.tiny().llm
        params = qwen2.init_qwen2(jax.random.PRNGKey(0), cfg)
        qp = quantize_tree({"llm": params}, bits=4)["llm"]
        ids = jnp.asarray([[3, 5, 7, 2]])
        emb = qwen2.embed_tokens(qp, ids)
        pos = jnp.broadcast_to(jnp.arange(4)[None, :, None], (1, 4, 3))
        h, _ = qwen2.qwen2_forward(qp, cfg, emb, pos)
        logits = qwen2.lm_head(qp, h)
        assert logits.shape == (1, 4, cfg.vocab_size)
        assert bool(jnp.isfinite(logits).all())
