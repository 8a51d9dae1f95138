"""Flash attention as Pallas TPU kernels — forward AND backward (custom VJP).

TPU-native replacement for the reference's flash-attention-2 CUDA dependency
(qwen2/modeling_qwen2.py:330-632). Forward: one grid program per
(batch*head, q-block), k innermost "arbitrary" axis, online-softmax state in
VMEM scratch; also emits the per-row logsumexp for the backward pass.
Backward: the standard flash recurrences
    P  = exp(sigma QK^T - lse)
    dV = P^T dO
    dS = P * (dO V^T - delta),   delta_i = dO_i . O_i
    dQ = sigma dS K,             dK = sigma dS^T Q
as two kernels (dQ over q-blocks, dK/dV over k-blocks). All block math is
kept in *transposed* (block_k, block_q) form so lse/delta rows broadcast
along lanes — Mosaic has no cheap vector transpose.

Layout: q (B, L, H, hd) -> (B*H, L, hd); k/v (B, S, KV, hd) -> (B*KV, S, hd).
GQA is handled by the k/v index_map (kv head = q head // group); backward
produces per-q-head dK/dV which are summed over the group outside.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# shared-prefix kernel q-superblock rows (tuning knob, read at trace time
# by kernels/attention.mha_shared_prefix; V3D_SP_BLOCK_Q env sweeps it in
# scripts/bench/flagship32.py prefix). Larger = fewer prefix KV re-streams
# per kv head, more VMEM per program (block_q*block_k f32 scores).
# production default 1792/1024: best of the r4 on-chip sweep
# (q896/k512 8.17 -> q1792/k1024 7.06 ms/question at flagship B=8 —
# BENCH_NOTES r4 shared-prefix table)
SP_BLOCK_Q = 1792
# prefix-pass K-block size companion knob (V3D_SP_BLOCK_K env)
SP_BLOCK_K = 1024
# gqa-folded cached-chunk kernel blocks (V3D_GQF_BLOCK_Q/K envs sweep
# them through scripts/bench/flagship32.py ctx32k; read at trace time).
# 1024/2048 = best of the r4 on-chip sweep: 32k chunked prefill
# 5204 -> 7720 tok/s (51.8 -> 76.9% MFU) over the old 256/512 —
# BENCH_NOTES r4 ctx32k table.
GQF_BLOCK_Q = 1024
GQF_BLOCK_K = 2048
# training/prefill flash attention (fwd + custom VJP) blocks
# (V3D_FA_BLOCK_Q/K envs sweep them via scripts/bench/qlora_step.py).
# 512/1024 = r4 on-chip sweep: qlora train step +3.5% at L=2048 and
# +14% at L=8192 over the old 256/512 (1024/1024 is +17% at 8k but
# unmeasured at short L) — BENCH_NOTES r4 train-block table.
FA_BLOCK_Q = 512
FA_BLOCK_K = 1024


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(len_ref, q_ref, k_ref, v_ref, *rest,
                sm_scale: float, block_q: int, block_k: int,
                causal: bool, use_lengths: bool, pos_div: int = 1,
                quantized: bool = False):
    if quantized:
        # int8 K/V streamed raw + (1, block_k) f32 per-position scales; the
        # dequant folds into the score scale and the p·V weights exactly as
        # in kernels/decode_attention.py::_decode_kernel_int8
        (ks_ref, vs_ref, o_ref, lse_ref,
         m_scratch, l_scratch, acc_scratch) = rest
    else:
        o_ref, lse_ref, m_scratch, l_scratch, acc_scratch = rest
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    length = len_ref[bh, 0] if use_lengths else None
    # per-row absolute query offset (KV-cache chunked prefill: query row r
    # sits at cache position off + r; 0 for the plain L == S prefill).
    # pos_div > 1 is the GQA-folded layout: the `group` q heads of one KV
    # head are interleaved along the row dim (row = r*group + g), so the
    # logical position of row i is off + i // pos_div.
    off = len_ref[bh, 1]

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    run = (ki * block_k <= off + ((qi + 1) * block_q - 1) // pos_div) \
        if causal else True
    if use_lengths:
        run = run & (ki * block_k < length)

    @pl.when(run)
    def _step():
        q = q_ref[0].astype(jnp.float32)            # (block_q, hd)
        k = k_ref[0].astype(jnp.float32)            # (block_k, hd)
        v = v_ref[0].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale   # (bq, bk)
        if quantized:
            s = s * ks_ref[0]                   # (1, bk) broadcast over rows

        if causal or use_lengths:
            rows = off + (qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 0)) // pos_div
            cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            allow = cols <= rows if causal else (cols == cols)
            if use_lengths:
                allow = allow & (cols < length)
            s = jnp.where(allow, s, NEG_INF)

        m_prev = m_scratch[:]                        # (bq, 128) replicated
        l_prev = l_scratch[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)    # (bq, 1)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))

        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_next = l_prev * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape)

        if quantized:
            p = p * vs_ref[0]                   # fold V dequant into weights
        acc_scratch[:] = acc_scratch[:] * alpha[:, :1] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_scratch[:] = m_next
        l_scratch[:] = l_next

    @pl.when(ki == nk - 1)
    def _finish():
        l = jnp.maximum(l_scratch[:, :1], 1e-30)
        o_ref[0] = (acc_scratch[:] / l).astype(o_ref.dtype)
        # per-row logsumexp, written as a (1, block_q) lane-major row
        lse = m_scratch[:, :1] + jnp.log(l)          # (bq, 1)
        lse_ref[0] = lse.reshape(1, -1)


# ---------------------------------------------------------------------------
# Backward kernels (transposed block math)
# ---------------------------------------------------------------------------

def _bwd_common(q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref,
                qi, ki, *, sm_scale, block_q, block_k, causal, use_lengths,
                length, offset):
    """Shared dS computation: returns (p_T, ds_T) each (block_k, block_q)."""
    q = q_ref[0].astype(jnp.float32)                 # (bq, hd)
    k = k_ref[0].astype(jnp.float32)                 # (bk, hd)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)               # (bq, hd)
    lse = lse_ref[0]                                 # (1, bq)
    delta = d_ref[0]                                 # (1, bq)

    s_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale        # (bk, bq)
    if causal or use_lengths:
        cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0)
        rows = offset + qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, s_t.shape, 1)
        allow = cols <= rows if causal else (cols == cols)
        if use_lengths:
            allow = allow & (cols < length)
        s_t = jnp.where(allow, s_t, NEG_INF)

    p_t = jnp.exp(s_t - lse)                                   # (bk, bq)
    dp_t = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # (bk, bq)
    ds_t = p_t * (dp_t - delta) * sm_scale
    return p_t, ds_t


def _dq_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref, dq_ref,
               dq_scratch, *, sm_scale, block_q, block_k, causal, use_lengths):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    length = len_ref[bh, 0] if use_lengths else None
    off = len_ref[bh, 1]

    @pl.when(ki == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    run = (ki * block_k <= off + (qi + 1) * block_q - 1) if causal else True
    if use_lengths:
        run = run & (ki * block_k < length)

    @pl.when(run)
    def _step():
        _, ds_t = _bwd_common(q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref,
                              qi, ki, sm_scale=sm_scale, block_q=block_q,
                              block_k=block_k, causal=causal,
                              use_lengths=use_lengths, length=length,
                              offset=off)
        k = k_ref[0].astype(jnp.float32)
        # dQ_block += ds^T_T @ K  == contract ds_t dim0 with k dim0
        dq_scratch[:] += jax.lax.dot_general(
            ds_t, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (bq, hd)

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _dkv_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref,
                dk_ref, dv_ref, dk_scratch, dv_scratch,
                *, sm_scale, block_q, block_k, causal, use_lengths):
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)
    length = len_ref[bh, 0] if use_lengths else None
    off = len_ref[bh, 1]

    @pl.when(qi == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    run = (off + (qi + 1) * block_q - 1 >= ki * block_k) if causal else True
    if use_lengths:
        run = run & (ki * block_k < length)

    @pl.when(run)
    def _step():
        p_t, ds_t = _bwd_common(q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref,
                                qi, ki, sm_scale=sm_scale, block_q=block_q,
                                block_k=block_k, causal=causal,
                                use_lengths=use_lengths, length=length,
                                offset=off)
        q = q_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        dv_scratch[:] += jax.lax.dot_general(
            p_t, do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (bk, hd)
        dk_scratch[:] += jax.lax.dot_general(
            ds_t, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (bk, hd)

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# custom-VJP core on flattened layouts
# ---------------------------------------------------------------------------

def _fwd_call(qf, kf, vf, len_bh, H, KV, causal, block_q, block_k, sm_scale,
              use_lengths, interpret, pos_div=1, ksf=None, vsf=None):
    BH, L, hd = qf.shape
    S = kf.shape[1]
    group = H // KV

    def kv_index(bh, qi, ki):
        b, h = bh // H, bh % H
        return (b * KV + h // group, ki, 0)

    def ks_index(bh, qi, ki):
        b, h = bh // H, bh % H
        return (b * KV + h // group, 0, ki)

    quantized = ksf is not None
    scale_ins = []
    scale_specs = []
    if quantized:
        scale_ins = [ksf, vsf]
        scale_specs = [pl.BlockSpec((1, 1, block_k), ks_index),
                       pl.BlockSpec((1, 1, block_k), ks_index)]

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale, block_q=block_q,
                          block_k=block_k, causal=causal,
                          use_lengths=use_lengths, pos_div=pos_div,
                          quantized=quantized),
        grid=(BH, L // block_q, S // block_k),
        in_specs=[
            pl.BlockSpec((BH, 2), lambda bh, qi, ki: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, hd), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, hd), kv_index),
            pl.BlockSpec((1, block_k, hd), kv_index),
        ] + scale_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, hd), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, ki: (bh, 0, qi)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, L, hd), qf.dtype),
            jax.ShapeDtypeStruct((BH, 1, L), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(len_bh, qf, kf, vf, *scale_ins)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _flash_core(qf, kf, vf, len_bh, H, KV, causal, block_q, block_k,
                sm_scale, interpret):
    out, _ = _fwd_call(qf, kf, vf, len_bh, H, KV, causal, block_q, block_k,
                       sm_scale, True, interpret)
    return out


def _flash_core_fwd(qf, kf, vf, len_bh, H, KV, causal, block_q, block_k,
                    sm_scale, interpret):
    out, lse = _fwd_call(qf, kf, vf, len_bh, H, KV, causal, block_q, block_k,
                         sm_scale, True, interpret)
    return out, (qf, kf, vf, len_bh, out, lse)


def _flash_core_bwd(H, KV, causal, block_q, block_k, sm_scale, interpret,
                    residuals, g):
    qf, kf, vf, len_bh, out, lse = residuals
    BH, L, hd = qf.shape
    S = kf.shape[1]
    group = H // KV
    B = BH // H
    do = g.astype(jnp.float32)

    delta = jnp.sum(do * out.astype(jnp.float32), axis=-1)[:, None, :]  # (BH,1,L)

    def kv_index3(bh, qi, ki):
        b, h = bh // H, bh % H
        return (b * KV + h // group, ki, 0)

    common_in_specs = [
        pl.BlockSpec((BH, 2), lambda bh, i, j: (0, 0),
                     memory_space=pltpu.SMEM),
    ]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, sm_scale=sm_scale, block_q=block_q,
                          block_k=block_k, causal=causal, use_lengths=True),
        grid=(BH, L // block_q, S // block_k),
        in_specs=common_in_specs + [
            pl.BlockSpec((1, block_q, hd), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, hd), kv_index3),
            pl.BlockSpec((1, block_k, hd), kv_index3),
            pl.BlockSpec((1, block_q, hd), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, ki: (bh, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, ki: (bh, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, L, hd), qf.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, hd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(len_bh, qf, kf, vf, do.astype(qf.dtype), lse, delta)

    def kv_index_kfirst(bh, ki, qi):
        b, h = bh // H, bh % H
        return (b * KV + h // group, ki, 0)

    dk_per_head, dv_per_head = pl.pallas_call(
        functools.partial(_dkv_kernel, sm_scale=sm_scale, block_q=block_q,
                          block_k=block_k, causal=causal, use_lengths=True),
        grid=(BH, S // block_k, L // block_q),
        in_specs=common_in_specs + [
            pl.BlockSpec((1, block_q, hd), lambda bh, ki, qi: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, hd), kv_index_kfirst),
            pl.BlockSpec((1, block_k, hd), kv_index_kfirst),
            pl.BlockSpec((1, block_q, hd), lambda bh, ki, qi: (bh, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bh, ki, qi: (bh, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda bh, ki, qi: (bh, 0, qi)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, hd), lambda bh, ki, qi: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bh, ki, qi: (bh, ki, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, S, hd), kf.dtype),
            jax.ShapeDtypeStruct((BH, S, hd), vf.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((block_k, hd), jnp.float32),
                        pltpu.VMEM((block_k, hd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(len_bh, qf, kf, vf, do.astype(qf.dtype), lse, delta)

    # GQA: sum per-q-head dK/dV over each group -> per-kv-head
    dk = dk_per_head.reshape(B, KV, group, S, hd).sum(axis=2).reshape(B * KV, S, hd)
    dv = dv_per_head.reshape(B, KV, group, S, hd).sum(axis=2).reshape(B * KV, S, hd)

    dlen = np.zeros(len_bh.shape, jax.dtypes.float0)
    return dq, dk.astype(kf.dtype), dv.astype(vf.dtype), dlen


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k",
                                             "interpret", "sm_scale"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    lengths: jax.Array = None,
                    causal: bool = True,
                    block_q: int = 256, block_k: int = 512,
                    sm_scale: float = None,
                    q_offsets: jax.Array = None,
                    interpret: bool = False) -> jax.Array:
    """Flash attention (causal or bidirectional) with per-sample key-length
    masking and a full custom VJP (trainable end to end).

    Args:
      q: (B, L, H, hd); k, v: (B, S, KV, hd) with H % KV == 0 and L == S
        (unless ``q_offsets`` is given — the KV-cache chunk case).
      lengths: optional (B,) int32 — keys at s >= lengths[b] are masked
        (right-padded batches). Outputs at padded query rows are garbage but
        finite; callers mask them (their gradients are exactly zero when the
        loss masks them).
      sm_scale: softmax scale; default hd**-0.5.
      q_offsets: optional (B,) int32 — absolute position of each row's
        FIRST query (chunked cached prefill: query r of row b sits at cache
        position q_offsets[b] + r, and causal masking uses that absolute
        position, so an L-token chunk can attend an S-slot cache, S != L).
        None == all zeros (plain prefill).
    Returns:
      (B, L, H, hd) in q.dtype.
    """
    B, L, H, hd = q.shape
    S, KV = k.shape[1], k.shape[2]
    assert H % KV == 0 and (L == S or q_offsets is not None), \
        (q.shape, k.shape)

    # Keep the requested (large) blocks and zero-pad the sequence up to a
    # block multiple instead of shrinking blocks to a divisor. Shrinking is
    # a performance cliff: the flagship V=32 bucket L=6784 (= 53*128) has no
    # 256/512 divisor, and the resulting 128x128 blocks ran the 28-layer
    # prefill at ~40% MFU vs ~70% with 256/512 blocks (BENCH_NOTES r3).
    # Correctness of padding: pad keys are masked by the per-sample
    # ``lengths`` (set to the true S below, before padding); pad query rows
    # are zero-filled -> finite garbage sliced off after the kernel, and the
    # pad VJP feeds exactly-zero upstream grads for them, so dK/dV
    # contributions from pad rows vanish (do == 0 and delta == 0 there).
    block_q = min(block_q, -(-L // 128) * 128)
    block_k = min(block_k, -(-S // 128) * 128)
    Lp = -(-L // block_q) * block_q
    Sp = -(-S // block_k) * block_k
    if sm_scale is None:
        sm_scale = hd ** -0.5       # from the TRUE head dim, before padding
    if lengths is None:
        lengths = jnp.full((B,), S, jnp.int32)

    qf = q.transpose(0, 2, 1, 3).reshape(B * H, L, hd)
    kf = k.transpose(0, 2, 1, 3).reshape(B * KV, S, hd)
    vf = v.transpose(0, 2, 1, 3).reshape(B * KV, S, hd)
    if Lp != L:
        qf = jnp.pad(qf, ((0, 0), (0, Lp - L), (0, 0)))
    if Sp != S:
        kf = jnp.pad(kf, ((0, 0), (0, Sp - S), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, Sp - S), (0, 0)))
    # Lane-align the head dim (e.g. the SigLIP tower's hd = 72 -> 128).
    # Zero pad channels are exact: scores gain 0-terms, output pad channels
    # are zero and sliced off, and their VJP contributions vanish the same
    # way (ds is head-pad-independent; dq/dk/dv pad columns multiply zeros).
    hd_p = -(-hd // 128) * 128
    if hd_p != hd:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, hd_p - hd)))
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, hd_p - hd)))
        vf = jnp.pad(vf, ((0, 0), (0, 0), (0, hd_p - hd)))
    if q_offsets is None:
        q_offsets = jnp.zeros((B,), jnp.int32)
    # SMEM table per (batch*head) row: [key length, query offset]
    len_bh = jnp.stack([jnp.repeat(lengths.astype(jnp.int32), H),
                        jnp.repeat(q_offsets.astype(jnp.int32), H)],
                       axis=1)                                   # (B*H, 2)

    out = _flash_core(qf, kf, vf, len_bh, H, KV, causal, block_q, block_k,
                      float(sm_scale), interpret)
    if Lp != L:
        out = out[:, :L]
    if hd_p != hd:
        out = out[..., :hd]
    return out.reshape(B, H, L, hd).transpose(0, 2, 1, 3)


def _sp_fused_kernel(q_ref, k_ref, v_ref, sk_ref, sv_ref, *rest,
                     sm_scale: float, block_q: int, block_k: int,
                     group: int, L: int, Ls_pad: int, nkp: int,
                     prefix_len: int, quantized: bool):
    """Fused shared-prefix attention: ONE kernel per layer.

    Grid (KV, nq, nkp + 1). Steps ki < nkp stream the SHARED prefix KV
    (non-causal: every suffix query position follows every prefix
    position; mask cols < prefix_len). The FINAL step attends the whole
    batch's suffix K/V — resident as one (B*Ls, hd) block, fetched once
    per kv head — with the block-diagonal causal mask
    (col // Ls == row's batch index, col % Ls <= row's query index).
    Removes the split version's second pallas launch + logsumexp merge
    per layer (BENCH_NOTES r4 shared-prefix table). Row layout is
    b-major: row = b*L*group + r*group + g.
    """
    if quantized:
        ks_ref, vs_ref, o_ref, m_scratch, l_scratch, acc_scratch = rest
    else:
        o_ref, m_scratch, l_scratch, acc_scratch = rest
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    Lg = L * group

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    @pl.when((ki < nkp) & (ki * block_k < prefix_len))
    def _prefix_step():
        q = q_ref[0].astype(jnp.float32)            # (block_q, hd)
        k = k_ref[0].astype(jnp.float32)            # (block_k, hd)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if quantized:
            s = s * ks_ref[0]
        cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols < prefix_len, s, NEG_INF)

        m_prev = m_scratch[:]
        l_prev = l_scratch[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scratch[:] = l_prev * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape)
        if quantized:
            p = p * vs_ref[0]
        acc_scratch[:] = acc_scratch[:] * alpha[:, :1] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scratch[:] = m_next

    @pl.when(ki == nk - 1)
    def _suffix_step_and_finish():
        q = q_ref[0].astype(jnp.float32)            # (block_q, hd)
        sk = sk_ref[0].astype(jnp.float32)          # (B*Ls_pad, hd)
        sv = sv_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, sk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        b_row = rows // Lg
        r_row = (rows % Lg) // group
        # suffix keys are laid per row in Ls_pad strides
        allow = ((cols // Ls_pad == b_row)
                 & (cols % Ls_pad <= r_row) & (cols % Ls_pad < L))
        s = jnp.where(allow, s, NEG_INF)

        m_prev = m_scratch[:]
        l_prev = l_scratch[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_next = l_prev * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape)
        acc = acc_scratch[:] * alpha[:, :1] + jax.lax.dot_general(
            p, sv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = (acc / jnp.maximum(l_next[:, :1], 1e-30)) \
            .astype(o_ref.dtype)


# fused (single-kernel) shared-prefix path toggle; the split two-kernel +
# merge variant stays for A/B (V3D_SP_FUSED=0 in the bench). Read at
# TRACE time: flip it before the first call of a process (or change a
# static block arg) — jit caches the traced value.
SP_FUSED = True


@functools.partial(jax.jit, static_argnames=("block_q_prefix", "block_k",
                                             "interpret", "sm_scale"))
def flash_attention_shared_prefix(q: jax.Array,
                                  pk: jax.Array, pv: jax.Array,
                                  sk: jax.Array, sv: jax.Array,
                                  suffix_lens: jax.Array,
                                  pk_scale: jax.Array = None,
                                  pv_scale: jax.Array = None,
                                  block_q_prefix: int = 896,
                                  block_k: int = 512,
                                  sm_scale: float = None,
                                  interpret: bool = False) -> jax.Array:
    """Suffix-over-SHARED-prefix attention: the scene prefix KV streams
    from HBM once for ALL batch rows (VERDICT r3 #1).

    In the scene-grouped serving contract every row of the batch attends
    the SAME immutable scene-prefix KV (eval/drivers.py scene-grouped
    suffix prefill; the reference re-prefills the full sequence per
    question, model_scanqa.py:171-186). :func:`flash_attention_gqa_folded`
    still runs one grid row per (batch, kv head), so the prefix KV blocks
    re-stream B * ceil(L*group/block_q) times per kv head. Here the
    attention splits exactly (flash-decoding / split-softmax):

      1. PREFIX pass — non-causal (every suffix query position >= every
         prefix position): queries of ALL rows fold into ONE grid row per
         kv head, (KV, B*L*group, hd), so each prefix block is read once
         per kv head per q superblock (``block_q_prefix`` rows — 896 rows
         cover 2 flagship questions' queries per fetch, and the whole B=8
         flagship batch in 4 fetches vs 16 before).
      2. SUFFIX pass — per-row causal over the chunk's own K/V
         ((B*KV, L*group, hd) folded, positions row // group), masked by
         per-row ``suffix_lens``.
      3. Exact merge via the two logsumexps:
         out = (o_p * e^(lse_p - m) + o_s * e^(lse_s - m)) / (same weights)
         with m = max(lse_p, lse_s) — identical to one online softmax over
         the concatenated keys (f32 reduction both sides).

    Inference-only (no VJP), like the folded kernel.

    Args:
      q: (B, L, H, hd) suffix queries; query r of row b sits at absolute
        position P + r.
      pk, pv: (P, KV, hd) shared prefix K/V — NO batch dim (int8 with
        ``pk_scale``/``pv_scale`` (P, KV, 1) f32, streamed raw).
      sk, sv: (B, Ls, KV, hd) per-row suffix K/V (the chunk's own keys,
        full precision — no cache round-trip).
      suffix_lens: (B,) int32 valid suffix key counts. The SPLIT path
        masks suffix cols c >= suffix_lens[b] explicitly; the FUSED path
        (SP_FUSED, taken when Ls == L) applies only the block-diagonal
        CAUSAL mask — valid query rows r < suffix_lens[b] see identical
        results (causality already confines them to cols <= r), but PAD
        query rows r >= suffix_lens[b] are garbage and may differ between
        the two paths. Callers must treat rows >= suffix_lens[b] as
        undefined (eval/drivers.py and serve/ do).
    Returns:
      (B, L, H, hd) in q.dtype.
    """
    B, L, H, hd = q.shape
    P, KV = pk.shape[0], pk.shape[1]
    Ls = sk.shape[1]
    assert H % KV == 0, (q.shape, pk.shape)
    group = H // KV
    if sm_scale is None:
        sm_scale = hd ** -0.5
    sm_scale = float(sm_scale)

    R = B * L * group
    # ---- fold queries: (B, L, H, hd) -> (KV, B*L*group, hd) ----
    # row = b*(L*group) + r*group + g within each kv head's superrow
    q5 = q.reshape(B, L, KV, group, hd)
    qp = q5.transpose(2, 0, 1, 3, 4).reshape(KV, R, hd)

    if SP_FUSED and Ls == L and hd % 128 == 0:
        return _shared_prefix_fused(qp, pk, pv, sk, sv, B, L, KV, group, hd,
                                    P, sm_scale, pk_scale, pv_scale,
                                    block_q_prefix, block_k, interpret
                                    ).astype(q.dtype)

    # ---- 1. prefix pass (non-causal, shared KV) ----
    kf = pk.transpose(1, 0, 2)                       # (KV, P, hd)
    vf = pv.transpose(1, 0, 2)
    ksf = vsf = None
    if pk_scale is not None:
        ksf = pk_scale.transpose(1, 2, 0)            # (KV, 1, P)
        vsf = pv_scale.transpose(1, 2, 0)

    bq = min(block_q_prefix, -(-R // 128) * 128)
    bk = min(block_k, -(-P // 128) * 128)
    Rp = -(-R // bq) * bq
    Pp = -(-P // bk) * bk
    if Rp != R:
        qp = jnp.pad(qp, ((0, 0), (0, Rp - R), (0, 0)))
    if Pp != P:
        kf = jnp.pad(kf, ((0, 0), (0, Pp - P), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, Pp - P), (0, 0)))
        if ksf is not None:
            ksf = jnp.pad(ksf, ((0, 0), (0, 0), (0, Pp - P)))
            vsf = jnp.pad(vsf, ((0, 0), (0, 0), (0, Pp - P)))
    hd_p = -(-hd // 128) * 128
    if hd_p != hd:
        qp = jnp.pad(qp, ((0, 0), (0, 0), (0, hd_p - hd)))
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, hd_p - hd)))
        vf = jnp.pad(vf, ((0, 0), (0, 0), (0, hd_p - hd)))
    len_p = jnp.stack([jnp.full((KV,), P, jnp.int32),
                       jnp.zeros((KV,), jnp.int32)], axis=1)
    out_p, lse_p = _fwd_call(qp, kf, vf, len_p, KV, KV, False, bq, bk,
                             sm_scale, True, interpret, ksf=ksf, vsf=vsf)
    if Rp != R:
        out_p, lse_p = out_p[:, :R], lse_p[:, :, :R]
    if hd_p != hd:
        out_p = out_p[..., :hd]
    # (KV, B*L*group, hd) -> (B, L, H, hd); lse -> (B, L, H)
    out_p = (out_p.reshape(KV, B, L, group, hd)
                  .transpose(1, 2, 0, 3, 4).reshape(B, L, H, hd))
    lse_p = (lse_p.reshape(KV, B, L, group)
                  .transpose(1, 2, 0, 3).reshape(B, L, H))

    # ---- 2. suffix pass (per-row causal, gqa-folded) ----
    LG = L * group
    qs = q5.transpose(0, 2, 1, 3, 4).reshape(B * KV, LG, hd)
    skf = sk.transpose(0, 2, 1, 3).reshape(B * KV, Ls, hd)
    svf = sv.transpose(0, 2, 1, 3).reshape(B * KV, Ls, hd)
    bqs = min(512, -(-LG // 128) * 128)
    bks = min(block_k, -(-Ls // 128) * 128)
    LGp = -(-LG // bqs) * bqs
    Lsp = -(-Ls // bks) * bks
    if LGp != LG:
        qs = jnp.pad(qs, ((0, 0), (0, LGp - LG), (0, 0)))
    if Lsp != Ls:
        skf = jnp.pad(skf, ((0, 0), (0, Lsp - Ls), (0, 0)))
        svf = jnp.pad(svf, ((0, 0), (0, Lsp - Ls), (0, 0)))
    if hd_p != hd:
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, hd_p - hd)))
        skf = jnp.pad(skf, ((0, 0), (0, 0), (0, hd_p - hd)))
        svf = jnp.pad(svf, ((0, 0), (0, 0), (0, hd_p - hd)))
    len_s = jnp.stack([jnp.repeat(suffix_lens.astype(jnp.int32), KV),
                       jnp.zeros((B * KV,), jnp.int32)], axis=1)
    out_s, lse_s = _fwd_call(qs, skf, svf, len_s, KV, KV, True, bqs, bks,
                             sm_scale, True, interpret, pos_div=group)
    if LGp != LG:
        out_s, lse_s = out_s[:, :LG], lse_s[:, :, :LG]
    if hd_p != hd:
        out_s = out_s[..., :hd]
    out_s = (out_s.reshape(B, KV, L, group, hd)
                  .transpose(0, 2, 1, 3, 4).reshape(B, L, H, hd))
    lse_s = (lse_s.reshape(B, KV, L, group)
                  .transpose(0, 2, 1, 3).reshape(B, L, H))

    # ---- 3. exact split-softmax merge ----
    m = jnp.maximum(lse_p, lse_s)
    w_p = jnp.exp(lse_p - m)[..., None]
    w_s = jnp.exp(lse_s - m)[..., None]
    out = (out_p.astype(jnp.float32) * w_p
           + out_s.astype(jnp.float32) * w_s) / (w_p + w_s)
    return out.astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret", "sm_scale"))
def flash_attention_gqa_folded(q: jax.Array, k: jax.Array, v: jax.Array,
                               lengths: jax.Array,
                               q_offsets: jax.Array,
                               block_q: int = 256, block_k: int = 512,
                               sm_scale: float = None,
                               k_scale: jax.Array = None,
                               v_scale: jax.Array = None,
                               interpret: bool = False) -> jax.Array:
    """Causal cached-chunk flash attention with the GQA group FOLDED into
    the query rows — each KV head's blocks stream from HBM ONCE instead of
    once per q head.

    :func:`flash_attention`'s grid runs one program per (batch, q head), so
    a GQA model re-reads every KV block ``group = H // KV`` times (7x for
    Qwen2-7B). For the suffix-over-prefix serving path (64 queries against
    a ~7k-slot cache) that KV streaming dominates the whole forward
    (BENCH_NOTES r3 contiguous-write section). Here q is laid out as
    (B*KV, L*group, hd) with row ``r*group + g`` holding query r of group
    member g, so the kernel computes logical positions as ``row // group``
    (``pos_div``) and the (B*KV)-row grid streams KV exactly once.

    Inference-only (no VJP): the chunked cached-prefill call sites never
    differentiate. Args as :func:`flash_attention`; requires ``q_offsets``
    (the KV-cache chunk contract) and causal masking. ``k_scale``/
    ``v_scale`` (B, S, KV, 1) f32 stream an int8 cache raw — dequant folds
    into the score scale / p·V weights in VMEM (decode_attention's int8
    contract), so no bf16 copy of the cache ever touches HBM.

    Returns (B, L, H, hd) in q.dtype, numerically identical to
    :func:`flash_attention` (same online-softmax, same masking).
    """
    B, L, H, hd = q.shape
    S, KV = k.shape[1], k.shape[2]
    assert H % KV == 0, (q.shape, k.shape)
    group = H // KV
    if group == 1 and k_scale is None:
        return flash_attention(q, k, v, lengths=lengths, causal=True,
                               block_q=block_q, block_k=block_k,
                               sm_scale=sm_scale, q_offsets=q_offsets,
                               interpret=interpret)
    if sm_scale is None:
        sm_scale = hd ** -0.5

    LG = L * group
    # (B, L, H, hd) -> (B, KV, L, group, hd) -> (B*KV, L*group, hd)
    # row index r*group + g  <=>  q position r, group member g (r-major so
    # the kernel's row // group recovers the position).
    qf = (q.reshape(B, L, KV, group, hd)
           .transpose(0, 2, 1, 3, 4)
           .reshape(B * KV, LG, hd))
    kf = k.transpose(0, 2, 1, 3).reshape(B * KV, S, hd)
    vf = v.transpose(0, 2, 1, 3).reshape(B * KV, S, hd)
    ksf = vsf = None
    if k_scale is not None:
        ksf = k_scale.transpose(0, 2, 3, 1).reshape(B * KV, 1, S)
        vsf = v_scale.transpose(0, 2, 3, 1).reshape(B * KV, 1, S)

    block_q = min(block_q, -(-LG // 128) * 128)
    block_k = min(block_k, -(-S // 128) * 128)
    Lp = -(-LG // block_q) * block_q
    Sp = -(-S // block_k) * block_k
    if Lp != LG:
        qf = jnp.pad(qf, ((0, 0), (0, Lp - LG), (0, 0)))
    if Sp != S:
        kf = jnp.pad(kf, ((0, 0), (0, Sp - S), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, Sp - S), (0, 0)))
        if ksf is not None:
            # pad scales with zeros: pad cols are masked NEG_INF by the
            # `cols < length` predicate before softmax regardless
            ksf = jnp.pad(ksf, ((0, 0), (0, 0), (0, Sp - S)))
            vsf = jnp.pad(vsf, ((0, 0), (0, 0), (0, Sp - S)))
    hd_p = -(-hd // 128) * 128
    if hd_p != hd:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, hd_p - hd)))
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, hd_p - hd)))
        vf = jnp.pad(vf, ((0, 0), (0, 0), (0, hd_p - hd)))

    len_bh = jnp.stack([jnp.repeat(lengths.astype(jnp.int32), KV),
                        jnp.repeat(q_offsets.astype(jnp.int32), KV)],
                       axis=1)                                  # (B*KV, 2)

    out, _ = _fwd_call(qf, kf, vf, len_bh, KV, KV, True, block_q, block_k,
                       float(sm_scale), True, interpret, pos_div=group,
                       ksf=ksf, vsf=vsf)
    if Lp != LG:
        out = out[:, :LG]
    if hd_p != hd:
        out = out[..., :hd]
    # (B*KV, L*group, hd) -> (B, KV, L, group, hd) -> (B, L, H, hd)
    return (out.reshape(B, KV, L, group, hd)
               .transpose(0, 2, 1, 3, 4)
               .reshape(B, L, H, hd))


def _shared_prefix_fused(qp, pk, pv, sk, sv, B, L, KV, group, hd, P,
                         sm_scale, pk_scale, pv_scale, block_q, block_k,
                         interpret):
    """Single-kernel shared-prefix attention (see _sp_fused_kernel).

    ``qp`` is the b-major folded query layout (KV, B*L*group, hd); the
    suffix K/V ride as ONE resident (B*Ls_pad, hd) block per kv head.
    Production contract: the suffix IS the chunk (Ls == L).
    """
    R = B * L * group
    bq = min(block_q, -(-R // 128) * 128)
    bk = min(block_k, -(-P // 128) * 128)
    Rp = -(-R // bq) * bq
    Pp = -(-P // bk) * bk
    nkp = Pp // bk
    Ls_pad = -(-L // 128) * 128

    if Rp != R:
        qp = jnp.pad(qp, ((0, 0), (0, Rp - R), (0, 0)))
    kf = pk.transpose(1, 0, 2)                       # (KV, P, hd)
    vf = pv.transpose(1, 0, 2)
    if Pp != P:
        kf = jnp.pad(kf, ((0, 0), (0, Pp - P), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, Pp - P), (0, 0)))
    ksf = vsf = None
    if pk_scale is not None:
        ksf = pk_scale.transpose(1, 2, 0)            # (KV, 1, P)
        vsf = pv_scale.transpose(1, 2, 0)
        if Pp != P:
            ksf = jnp.pad(ksf, ((0, 0), (0, 0), (0, Pp - P)))
            vsf = jnp.pad(vsf, ((0, 0), (0, 0), (0, Pp - P)))
    # suffix: (B, L, KV, hd) -> per-row Ls_pad stride -> (KV, B*Ls_pad, hd)
    skp = jnp.pad(sk, ((0, 0), (0, Ls_pad - L), (0, 0), (0, 0)))
    svp = jnp.pad(sv, ((0, 0), (0, Ls_pad - L), (0, 0), (0, 0)))
    skf = skp.transpose(2, 0, 1, 3).reshape(KV, B * Ls_pad, hd)
    svf = svp.transpose(2, 0, 1, 3).reshape(KV, B * Ls_pad, hd)

    def clamp_k(kv, qi, ki):
        return (kv, jnp.minimum(ki, nkp - 1), 0)

    def clamp_ks(kv, qi, ki):
        return (kv, 0, jnp.minimum(ki, nkp - 1))

    quantized = ksf is not None
    in_specs = [
        pl.BlockSpec((1, bq, hd), lambda kv, qi, ki: (kv, qi, 0)),
        pl.BlockSpec((1, bk, hd), clamp_k),
        pl.BlockSpec((1, bk, hd), clamp_k),
        pl.BlockSpec((1, B * Ls_pad, hd), lambda kv, qi, ki: (kv, 0, 0)),
        pl.BlockSpec((1, B * Ls_pad, hd), lambda kv, qi, ki: (kv, 0, 0)),
    ]
    ins = [qp, kf, vf, skf, svf]
    if quantized:
        in_specs += [pl.BlockSpec((1, 1, bk), clamp_ks),
                     pl.BlockSpec((1, 1, bk), clamp_ks)]
        ins += [ksf, vsf]
    out = pl.pallas_call(
        functools.partial(_sp_fused_kernel, sm_scale=float(sm_scale),
                          block_q=bq, block_k=bk, group=group, L=L,
                          Ls_pad=Ls_pad, nkp=nkp, prefix_len=P,
                          quantized=quantized),
        grid=(KV, Rp // bq, nkp + 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, hd), lambda kv, qi, ki: (kv, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((KV, Rp, hd), qp.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*ins)
    if Rp != R:
        out = out[:, :R]
    # (KV, B*L*group, hd) -> (B, L, H, hd)
    return (out.reshape(KV, B, L, group, hd)
               .transpose(1, 2, 0, 3, 4).reshape(B, L, KV * group, hd))
