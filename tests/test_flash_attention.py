"""Pallas flash-attention kernel correctness vs the jnp reference path,
run in Pallas interpreter mode on CPU (kernel logic validation without TPU;
the same kernel compiles for TPU via Mosaic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.kernels.attention import mha_reference


def flash_interpret(q, k, v, block_q=64, block_k=64):
    """Invoke the kernel with interpret=True via a thin monkeypatch."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from video3d_tpu.kernels import flash_attention as fa

    B, L, H, hd = q.shape
    S, KV = k.shape[1], k.shape[2]
    group = H // KV
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, L, hd)
    kf = k.transpose(0, 2, 1, 3).reshape(B * KV, S, hd)
    vf = v.transpose(0, 2, 1, 3).reshape(B * KV, S, hd)

    def kv_index(bh, qi, ki):
        b, h = bh // H, bh % H
        return (b * KV + h // group, ki, 0)

    out = pl.pallas_call(
        functools.partial(fa._flash_kernel, sm_scale=hd ** -0.5,
                          block_q=block_q, block_k=block_k, causal=True),
        grid=(B * H, L // block_q, S // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, hd), kv_index),
            pl.BlockSpec((1, block_k, hd), kv_index),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, L, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
        interpret=True,
    )(qf, kf, vf)
    return out.reshape(B, H, L, hd).transpose(0, 2, 1, 3)


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
