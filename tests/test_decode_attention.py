"""Fused decode-attention kernel vs the jnp reference (interpret mode on
CPU; the same kernel compiles on TPU via the mha dispatch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.kernels.attention import mha_reference
from video3d_tpu.kernels.decode_attention import decode_attention


def make(B, S, H, KV, hd, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, 1, H, hd)), dtype)
    k = jnp.asarray(rng.normal(size=(B, S, KV, hd)), dtype)
    v = jnp.asarray(rng.normal(size=(B, S, KV, hd)), dtype)
    return q, k, v


class TestDecodeAttention:
    @pytest.mark.parametrize("B,S,H,KV,hd", [
        (1, 256, 4, 2, 128),
        (2, 384, 8, 2, 128),
        (4, 128, 4, 4, 128),     # MHA (groups == 1)
    ])
    def test_matches_reference(self, B, S, H, KV, hd):
        q, k, v = make(B, S, H, KV, hd)
        kv_len = jnp.asarray(np.random.default_rng(1).integers(1, S + 1, B),
                             jnp.int32)
        # reference semantics: query at position kv_len - 1
        ref = mha_reference(q, k, v, q_positions=(kv_len - 1)[:, None],
                            kv_len=kv_len)
        got = decode_attention(q, k, v, kv_len, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_bf16_io(self):
        q, k, v = make(2, 256, 4, 2, 128, dtype=jnp.bfloat16)
        kv_len = jnp.asarray([100, 256], jnp.int32)
        ref = mha_reference(q, k, v, q_positions=(kv_len - 1)[:, None],
                            kv_len=kv_len)
        got = decode_attention(q, k, v, kv_len, interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_length_one(self):
        """First decode step after an empty prefill-like state."""
        q, k, v = make(1, 128, 4, 2, 128, seed=3)
        kv_len = jnp.asarray([1], jnp.int32)
        ref = mha_reference(q, k, v, q_positions=jnp.asarray([[0]]),
                            kv_len=kv_len)
        got = decode_attention(q, k, v, kv_len, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestQuantizedDecodeKernel:
    @pytest.mark.parametrize("dtype", [jnp.int8, jnp.int4])
    def test_matches_dequantized_reference(self, dtype):
        """int8/int4-native kernel == dequantize-then-reference to bf16
        tolerance: the quantized path computes its dots with bf16 MXU
        inputs + f32 accumulation (the flash-kernel contract; the int
        values themselves are exact in bf16) — HIGHEST-precision f32 dots
        cost 3x the MXU passes and dominated the folded kernel's decode
        step (r5 BENCH_NOTES 32k-decode section)."""
        from video3d_tpu.models.qwen2 import _quantize_kv

        B, S, H, KV, hd = 2, 256, 4, 2, 128
        q, k, v = make(B, S, H, KV, hd, seed=5)
        kq, ks = _quantize_kv(k, dtype)
        vq, vs = _quantize_kv(v, dtype)
        kv_len = jnp.asarray([100, 256], jnp.int32)

        deq_k = kq.astype(jnp.float32) * ks
        deq_v = vq.astype(jnp.float32) * vs
        ref = mha_reference(q, deq_k, deq_v,
                            q_positions=(kv_len - 1)[:, None], kv_len=kv_len)
        got = decode_attention(q, kq, vq, kv_len, k_scale=ks, v_scale=vs,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=4e-3, atol=4e-3)

    @pytest.mark.parametrize("dtype", [jnp.int8, jnp.int4])
    def test_quantized_decode_through_model(self, dtype):
        """decoder_layer int8/int4 cache path on CPU (mha dequantizes
        inline)."""
        from video3d_tpu.config import ModelConfig
        from video3d_tpu.models import qwen2

        cfg = ModelConfig.tiny().llm
        params = qwen2.init_qwen2(jax.random.PRNGKey(0), cfg)
        ids = np.random.default_rng(7).integers(10, cfg.vocab_size, (1, 8))
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        pos = jnp.broadcast_to(jnp.arange(8)[None, :, None], (1, 8, 3))
        cache = qwen2.KVCache.zeros(cfg, 1, 16, dtype=dtype)
        assert cache.k.dtype == dtype
        _, cache = qwen2.qwen2_forward(
            params, cfg, embeds[:, :7], pos[:, :7], kv_cache=cache,
            cache_positions=jnp.arange(7)[None], kv_len=jnp.asarray([7]),
            prefill=True)
        h, _ = qwen2.qwen2_forward(
            params, cfg, embeds[:, 7:8], pos[:, 7:8], kv_cache=cache,
            cache_positions=jnp.asarray([[7]]), kv_len=jnp.asarray([8]))
        assert np.isfinite(np.asarray(h, np.float32)).all()

    def test_int4_attention_error_bounded(self):
        """int4 is a LOSSY cache: its decode output must still track the
        full-precision attention (cos-sim bounds on i.i.d. gaussian K/V —
        the WORST case for per-token symmetric quantization; measured
        int8 0.99996 / int4 0.987 at seed 9)."""
        B, S, H, KV, hd = 2, 256, 4, 2, 128
        q, k, v = make(B, S, H, KV, hd, seed=9)
        kv_len = jnp.asarray([200, 256], jnp.int32)
        exact = np.asarray(mha_reference(
            q, k, v, q_positions=(kv_len - 1)[:, None], kv_len=kv_len))

        from video3d_tpu.models.qwen2 import _quantize_kv

        def run(dtype):
            kq, ks = _quantize_kv(k, dtype)
            vq, vs = _quantize_kv(v, dtype)
            return np.asarray(decode_attention(
                q, kq, vq, kv_len, k_scale=ks, v_scale=vs, interpret=True))

        for dtype, min_cos in ((jnp.int8, 0.9999), (jnp.int4, 0.98)):
            got = run(dtype)
            cos = (got * exact).sum() / (
                np.linalg.norm(got) * np.linalg.norm(exact))
            assert cos > min_cos, (dtype, cos)


class TestBlockedLongCache:
    """S above _BLOCKED_THRESHOLD routes through the S-blocked online-
    softmax kernel (r4: the single-pass slab compile-OOMs VMEM at 32k) —
    results must match the reference exactly like the single-pass path."""

    def test_blocked_matches_reference(self):
        B, S, H, KV, hd = 2, 12288, 4, 2, 128
        q, k, v = make(B, S, H, KV, hd)
        kv_len = jnp.asarray([S, 5000], jnp.int32)
        ref = mha_reference(q, k, v, q_positions=(kv_len - 1)[:, None],
                            kv_len=kv_len)
        got = decode_attention(q, k, v, kv_len, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_blocked_int8_matches_dequantized(self):
        B, S, H, KV, hd = 1, 9000, 4, 2, 128
        rng = np.random.default_rng(9)
        q = jnp.asarray(rng.normal(size=(B, 1, H, hd)).astype(np.float32))
        k8 = jnp.asarray(rng.integers(-127, 128, (B, S, KV, hd)), jnp.int8)
        v8 = jnp.asarray(rng.integers(-127, 128, (B, S, KV, hd)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, S, KV, 1))
                         .astype(np.float32))
        vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, S, KV, 1))
                         .astype(np.float32))
        kv_len = jnp.asarray([7321], jnp.int32)
        ref = mha_reference(q, k8.astype(jnp.float32) * ks,
                            v8.astype(jnp.float32) * vs,
                            q_positions=(kv_len - 1)[:, None], kv_len=kv_len)
        got = decode_attention(q, k8, v8, kv_len, k_scale=ks, v_scale=vs,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_ragged_tail_block(self):
        """S not a multiple of the block size: the tail block's
        out-of-range columns are masked by kv_len."""
        B, S, H, KV, hd = 1, 8192 + 700, 4, 2, 128
        q, k, v = make(B, S, H, KV, hd, seed=5)
        kv_len = jnp.asarray([S], jnp.int32)
        ref = mha_reference(q, k, v, q_positions=(kv_len - 1)[:, None],
                            kv_len=kv_len)
        got = decode_attention(q, k, v, kv_len, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
