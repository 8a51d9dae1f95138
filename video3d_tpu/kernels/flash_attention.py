"""Causal flash attention as a Pallas TPU kernel (online softmax, GQA-aware).

TPU-native replacement for the reference's flash-attention-2 CUDA dependency
(qwen2/modeling_qwen2.py:330-632). One grid program owns one (batch*head,
q-block); the k dimension is the innermost "arbitrary" grid axis so the
running max / denominator / accumulator live in VMEM scratch across k steps
(standard online-softmax recurrence). Causal blocks strictly above the
diagonal are predicated off with ``pl.when``.

Layout: q (B, L, H, hd) is viewed as (B*H, L, hd); k/v (B, S, KV, hd) as
(B*KV, S, hd). GQA is handled in the k/v index_map (kv head = q head //
group), so no materialized head broadcast.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref,
                  m_scratch, l_scratch, acc_scratch,
                  *, sm_scale: float, block_q: int, block_k: int,
                  causal: bool, use_lengths: bool):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    length = len_ref[bh, 0] if use_lengths else None

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    # Causal: skip k blocks whose first row is strictly beyond the last query.
    run = (ki * block_k <= (qi + 1) * block_q - 1) if causal else True
    if use_lengths:
        # also skip k blocks entirely beyond this sample's valid prefix
        run = run & (ki * block_k < length)

    @pl.when(run)
    def _step():
        q = q_ref[0].astype(jnp.float32)            # (block_q, hd)
        k = k_ref[0].astype(jnp.float32)            # (block_k, hd)
        v = v_ref[0].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale   # (bq, bk)

        if causal or use_lengths:
            rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            allow = cols <= rows if causal else (cols == cols)
            if use_lengths:
                allow = allow & (cols < length)
            s = jnp.where(allow, s, NEG_INF)

        m_prev = m_scratch[:]                        # (bq, 128) replicated
        l_prev = l_scratch[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)    # (bq, 1)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))

        alpha = jnp.exp(m_prev - m_next)             # rescale of old state
        p = jnp.exp(s - m_next[:, :1])               # (bq, bk)
        l_next = l_prev * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape)

        acc_scratch[:] = acc_scratch[:] * alpha[:, :1] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_scratch[:] = m_next
        l_scratch[:] = l_next

    @pl.when(ki == nk - 1)
    def _finish():
        # Rows past a sample's length get uniform garbage (finite; callers
        # never read padded positions). Guard l against 0 anyway.
        l = jnp.maximum(l_scratch[:, :1], 1e-30)
        o_ref[0] = (acc_scratch[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k",
                                             "interpret", "sm_scale"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    lengths: jax.Array = None,
                    causal: bool = True,
                    block_q: int = 256, block_k: int = 512,
                    sm_scale: float = None,
                    interpret: bool = False) -> jax.Array:
    """Flash attention (causal or bidirectional) with optional per-sample
    key-length masking.

    Args:
      q: (B, L, H, hd); k, v: (B, S, KV, hd) with H % KV == 0, L == S.
      lengths: optional (B,) int32 — keys at s >= lengths[b] are masked
        (right-padded batches). Outputs at padded query rows are garbage but
        finite; callers mask them.
      sm_scale: softmax scale; default hd**-0.5 (pass the true head dim's
        scale when q/k are zero-padded on the feature axis).
    Returns:
      (B, L, H, hd) in q.dtype.
    """
    B, L, H, hd = q.shape
    S, KV = k.shape[1], k.shape[2]
    assert H % KV == 0 and L == S, (q.shape, k.shape)
    group = H // KV
    block_q = min(block_q, L)
    block_k = min(block_k, S)
    assert L % block_q == 0 and S % block_k == 0
    if sm_scale is None:
        sm_scale = hd ** -0.5

    qf = q.transpose(0, 2, 1, 3).reshape(B * H, L, hd)
    kf = k.transpose(0, 2, 1, 3).reshape(B * KV, S, hd)
    vf = v.transpose(0, 2, 1, 3).reshape(B * KV, S, hd)
    use_lengths = lengths is not None
    if lengths is None:
        lengths = jnp.full((B,), S, jnp.int32)
    len_bh = jnp.repeat(lengths.astype(jnp.int32), H)[:, None]   # (B*H, 1)

    def kv_index(bh, qi, ki):
        b, h = bh // H, bh % H
        return (b * KV + h // group, ki, 0)

    grid = (B * H, L // block_q, S // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, sm_scale=sm_scale,
                          block_q=block_q, block_k=block_k, causal=causal,
                          use_lengths=use_lengths),
        grid=grid,
        in_specs=[
            # full lengths table in SMEM for every program (tiny), indexed
            # by program_id — per-row SMEM blocks don't lower on Mosaic
            pl.BlockSpec((B * H, 1), lambda bh, qi, ki: (0, 0),
                         memory_space=pltpu.SMEM),
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(len_bh, qf, kf, vf)
    return out.reshape(B, H, L, hd).transpose(0, 2, 1, 3)
