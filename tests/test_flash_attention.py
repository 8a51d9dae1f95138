"""Pallas flash-attention kernel correctness vs the jnp reference path,
run in Pallas interpreter mode on CPU (kernel logic validation without TPU;
the same kernel compiles for TPU via Mosaic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.kernels.attention import mha_reference


def flash_interpret(q, k, v, block_q=64, block_k=64):
    """Run the production kernel in Pallas interpreter mode."""
    from video3d_tpu.kernels.flash_attention import flash_attention

    return flash_attention(q, k, v, block_q=block_q, block_k=block_k,
                           interpret=True)


class TestFlashKernel:
    @pytest.mark.parametrize("L,H,KV,hd", [(128, 2, 2, 128), (256, 4, 2, 128)])
    def test_matches_reference(self, L, H, KV, hd):
        rng = np.random.default_rng(0)
        B = 1
        q = rng.normal(size=(B, L, H, hd)).astype(np.float32)
        k = rng.normal(size=(B, L, KV, hd)).astype(np.float32)
        v = rng.normal(size=(B, L, KV, hd)).astype(np.float32)
        ref = np.asarray(mha_reference(jnp.asarray(q), jnp.asarray(k),
                                       jnp.asarray(v), causal=True))
        got = np.asarray(flash_interpret(jnp.asarray(q), jnp.asarray(k),
                                         jnp.asarray(v)))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_gqa_head_mapping(self):
        """With distinct kv heads, each q head must read its own group."""
        rng = np.random.default_rng(1)
        B, L, H, KV, hd = 1, 128, 4, 2, 128
        q = rng.normal(size=(B, L, H, hd)).astype(np.float32)
        k = rng.normal(size=(B, L, KV, hd)).astype(np.float32)
        v = rng.normal(size=(B, L, KV, hd)).astype(np.float32)
        ref = np.asarray(mha_reference(jnp.asarray(q), jnp.asarray(k),
                                       jnp.asarray(v), causal=True))
        got = np.asarray(flash_interpret(jnp.asarray(q), jnp.asarray(k),
                                         jnp.asarray(v)))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_bf16_inputs(self):
        rng = np.random.default_rng(2)
        B, L, H, KV, hd = 1, 128, 2, 1, 128
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, L, KV, hd)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, L, KV, hd)), jnp.bfloat16)
        ref = np.asarray(mha_reference(q, k, v, causal=True)).astype(np.float32)
        got = np.asarray(flash_interpret(q, k, v)).astype(np.float32)
        np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)


class TestLengthMasking:
    def test_lengths_match_reference(self):
        """Per-sample right-pad masking agrees with the jnp reference at
        valid query rows."""
        rng = np.random.default_rng(3)
        B, L, H, KV, hd = 2, 128, 2, 1, 128
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, L, KV, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, L, KV, hd)).astype(np.float32))
        lengths = jnp.asarray([100, 64], jnp.int32)
        from video3d_tpu.kernels.flash_attention import flash_attention

        got = np.asarray(flash_attention(q, k, v, lengths=lengths,
                                         block_q=64, block_k=64,
                                         interpret=True))
        ref = np.asarray(mha_reference(q, k, v, causal=True, kv_len=lengths))
        for b, n in enumerate([100, 64]):
            np.testing.assert_allclose(got[b, :n], ref[b, :n],
                                       rtol=2e-4, atol=2e-4)
        assert np.isfinite(got).all()   # padded rows finite (not NaN)
