"""Fused single-token decode attention over the KV cache.

Decode at small batch is op-count bound on TPU (BENCH_NOTES.md): each
lax-level attention step lowers to ~10 small HBM-bound ops per layer
(broadcast kv heads, score, mask, softmax, weight). This kernel fuses the
whole read side into ONE pallas call per layer: for each (sample, kv head)
it loads that head's (S, hd) cache slab once from HBM, computes the grouped
q·K scores, masks by the per-sample cache length, softmaxes in f32, and
accumulates the context — single pass (a 32k x 128 bf16 slab is ~8 MB and
fits VMEM, so no online softmax is needed at decode sizes).

Replaces the reference's HF eager/flash decode step
(qwen2/modeling_qwen2.py:330-632 with a 1-token query). Inference-only: no
backward pass.

Mosaic notes (see .claude/skills/verify/SKILL.md): lengths live in SMEM as a
full (B, 1) table indexed by a program-id derived row at kernel top level;
all refs are rank-3 blocks with a unit leading dim, squeezed by indexing
(never reshaped); dots request f32 accumulation explicitly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _decode_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, kv_heads: int):
    i = pl.program_id(0)              # flattened (sample, kv head) index
    b = i // kv_heads
    kv_len = len_ref[b, 0]

    q = q_ref[0].astype(jnp.float32)                      # (G, hd)
    k = k_ref[0].astype(jnp.float32)                      # (S, hd)
    v = v_ref[0].astype(jnp.float32)

    # precision=HIGHEST: the MXU truncates f32 inputs to bf16 passes
    # otherwise (same pitfall as kernels/fused_geometry.py)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)              # (G, S)
    slot = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(slot < kv_len, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).astype(o_ref.dtype)


def _decode_kernel_int8(len_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                        *, kv_heads: int):
    """int8 cache variant: HBM streams int8 slabs + (S,) f32 scales; the
    per-position dequant folds into the score row-scale / the p·V weights
    (scale_s factors out of the hd contraction), so nothing bf16-sized ever
    touches HBM."""
    i = pl.program_id(0)
    b = i // kv_heads
    kv_len = len_ref[b, 0]

    q = q_ref[0].astype(jnp.float32)                      # (G, hd)
    k = k_ref[0].astype(jnp.float32)                      # (S, hd) from int8
    v = v_ref[0].astype(jnp.float32)
    k_scale = ks_ref[0]                                   # (1, S) f32
    v_scale = vs_ref[0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) * k_scale    # (G, S)
    slot = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(slot < kv_len, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p * v_scale, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).astype(o_ref.dtype)


def _decode_kernel_blocked(len_ref, q_ref, k_ref, v_ref, *rest,
                           kv_heads: int, block_s: int,
                           quantized: bool):
    """S-blocked online-softmax variant for LONG caches: the single-pass
    kernel's whole-(S, hd) slab overflows the ~16 MB VMEM scope at
    S = 32k (int8 k+v alone are 8 MB; the f32 score temps push past the
    limit — measured compile OOM, BENCH_NOTES r4 32k-decode section), so
    blocks of ``block_s`` positions stream through the same online
    softmax as kernels/flash_attention.py; blocks past the sample's
    kv_len are skipped entirely."""
    if quantized:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    b = i // kv_heads
    kv_len = len_ref[b, 0]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    base = j * block_s

    @pl.when(base < kv_len)
    def _step():
        q = q_ref[0].astype(jnp.float32)                  # (G, hd)
        k = k_ref[0].astype(jnp.float32)                  # (block_s, hd)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (G, block_s)
        if quantized:
            s = s * ks_ref[0]
        pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < kv_len, s, NEG_INF)
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * vs_ref[0]
        # the tail block can read past the array edge (S % block_s != 0):
        # those p entries are exactly 0, but 0 * NaN(v garbage) would still
        # poison the dot — zero both sides explicitly
        p = jnp.where(pos < kv_len, p, 0.0)
        vpos = base + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(vpos < kv_len, v, 0.0)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == nj - 1)
    def _finish():
        # guard: a kv_len == 0 row skips every block (l stays 0) and must
        # stay finite like the sibling ragged/fused kernels
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)) \
            .astype(o_ref.dtype)


# single-pass VMEM budget: above this S the blocked kernel takes over
_BLOCKED_THRESHOLD = 8192
_BLOCK_S = 4096


def decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                     kv_len: jax.Array, sm_scale: float | None = None,
                     k_scale: jax.Array | None = None,
                     v_scale: jax.Array | None = None,
                     interpret: bool = False) -> jax.Array:
    """Fused attention for one decode step.

    Args:
      q: (B, 1, H, hd) single-position queries;
      k_cache, v_cache: (B, S, KV, hd) full cache (slot index == position);
        int8 when k_scale/v_scale are given (models/qwen2.py KVCache).
      kv_len: (B,) valid slot count (query position + 1); slots >= kv_len
        are masked, which also implements causality (the new token occupies
        slot kv_len - 1).
      k_scale, v_scale: optional (B, S, KV, 1) f32 per-position dequant
        scales — the int8-cache path; HBM then streams int8 + scales only.
    Returns:
      (B, 1, H, hd) in q.dtype.
    """
    B, L, H, hd = q.shape
    assert L == 1, "decode kernel is single-token"
    S, KV = k_cache.shape[1], k_cache.shape[2]
    G = H // KV
    scale = sm_scale if sm_scale is not None else hd ** -0.5

    qg = (q[:, 0] * jnp.asarray(scale, q.dtype)).reshape(B, KV, G, hd)
    qg = qg.reshape(B * KV, G, hd)
    kt = k_cache.transpose(0, 2, 1, 3).reshape(B * KV, S, hd)
    vt = v_cache.transpose(0, 2, 1, 3).reshape(B * KV, S, hd)
    lens = kv_len.astype(jnp.int32).reshape(B, 1)

    if S > _BLOCKED_THRESHOLD:
        from jax.experimental.pallas import tpu as pltpu

        bs = _BLOCK_S
        nj = -(-S // bs)
        scratch = [
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, hd), jnp.float32),
        ]
        qkv = [
            pl.BlockSpec((1, G, hd), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, bs, hd), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bs, hd), lambda i, j: (i, j, 0)),
        ]
        quantized = k_scale is not None
        extra_in, extra_specs = [], []
        if quantized:
            ks = k_scale.transpose(0, 2, 3, 1).reshape(B * KV, 1, S)
            vs = v_scale.transpose(0, 2, 3, 1).reshape(B * KV, 1, S)
            extra_in = [ks.astype(jnp.float32), vs.astype(jnp.float32)]
            extra_specs = [pl.BlockSpec((1, 1, bs), lambda i, j: (i, 0, j)),
                           pl.BlockSpec((1, 1, bs), lambda i, j: (i, 0, j))]
        out = pl.pallas_call(
            functools.partial(_decode_kernel_blocked, kv_heads=KV,
                              block_s=bs, quantized=quantized),
            grid=(B * KV, nj),
            in_specs=[_smem_spec(interpret),
                      qkv[0], qkv[1], qkv[2]] + extra_specs,
            out_specs=pl.BlockSpec((1, G, hd), lambda i, j: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B * KV, G, hd), q.dtype),
            scratch_shapes=scratch,
            compiler_params=_arbitrary_k(),
            interpret=interpret,
        )(lens, qg, kt, vt, *extra_in)
        return out.reshape(B, KV * G, 1, hd).transpose(0, 2, 1, 3)

    qkv_specs = [
        pl.BlockSpec((1, G, hd), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, S, hd), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, S, hd), lambda i: (i, 0, 0)),
    ]
    if k_scale is not None:
        ks = k_scale.transpose(0, 2, 3, 1).reshape(B * KV, 1, S)
        vs = v_scale.transpose(0, 2, 3, 1).reshape(B * KV, 1, S)
        out = pl.pallas_call(
            functools.partial(_decode_kernel_int8, kv_heads=KV),
            grid=(B * KV,),
            in_specs=[_smem_spec(interpret)] + qkv_specs + [
                pl.BlockSpec((1, 1, S), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 1, S), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, G, hd), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B * KV, G, hd), q.dtype),
            interpret=interpret,
        )(lens, qg, kt, vt, ks.astype(jnp.float32), vs.astype(jnp.float32))
    else:
        out = pl.pallas_call(
            functools.partial(_decode_kernel, kv_heads=KV),
            grid=(B * KV,),
            in_specs=[_smem_spec(interpret)] + qkv_specs,
            out_specs=pl.BlockSpec((1, G, hd), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B * KV, G, hd), q.dtype),
            interpret=interpret,
        )(lens, qg, kt, vt)
    return out.reshape(B, KV * G, 1, hd).transpose(0, 2, 1, 3)


def _smem_spec(interpret: bool):
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _arbitrary_k():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"))
