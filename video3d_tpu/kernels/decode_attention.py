"""Fused single-token decode attention over the KV cache.

Decode at small batch is op-count bound on TPU (BENCH_NOTES.md): each
lax-level attention step lowers to ~10 small HBM-bound ops per layer
(broadcast kv heads, score, mask, softmax, weight). This kernel fuses the
whole read side into ONE pallas call per layer.

r5 redesign (VERDICT r4 #1) — the block-diagonal head fold:

  * The cache streams in its NATIVE (B, S, KV, hd) layout, viewed as
    (B, S, KV*hd) — a FREE row-major reshape. The previous design
    transposed the cache to (B*KV, S, hd) first, which XLA must
    MATERIALIZE for a pallas operand: at a 32k cache that re-wrote the
    entire 0.94 GiB int8 cache to HBM every decode step (read + write +
    kernel read = 3x KV traffic), the single largest term in the measured
    21.45 ms dense 32k step.
  * All KV heads are processed by ONE dot pair per cache block — no
    per-head loop. The grouped queries are packed into a block-diagonal
    (KV*G, KV*hd) matrix (head kv occupies rows [kv*G, (kv+1)*G) and
    columns [kv*hd, (kv+1)*hd)), so Q_blk @ K_flat^T yields every head's
    scores at once, and P @ V_flat yields every head's context in the
    matching diagonal slices. An intermediate unrolled-head variant
    measured 0.27-0.61 ms/layer — per-head fixed costs (slice + convert
    + two tiny dots + scratch RMW, x4 heads x S/block_s steps) dwarfed
    the 0.06 ms stream floor; this folds them into one MXU pass.
  * Dots run with bf16 MXU inputs + f32 accumulation (the flash-kernel
    contract): int8/int4 cache values are exact in bf16; the previous
    HIGHEST-precision f32 dots cost 3x the MXU passes. f32 caches
    (tests / CPU exactness) keep f32 HIGHEST.
  * Per-position dequant scales stream lane-aligned as (B, KV, 1, S) —
    a per-call transpose of the TINY scale arrays (512 KB vs the cache's
    33 MB per layer); a (1, bs, KV, 1) orientation would tile-pad its
    (KV, 1) minor dims to (8, 128) in VMEM (measured +16 MB, compile
    OOM). Scales expand to score rows via static-slice concatenation
    (``pltpu.repeat`` tiles rather than element-repeats).

Replaces the reference's HF eager/flash decode step
(qwen2/modeling_qwen2.py:330-632 with a 1-token query). Inference-only: no
backward pass.

Mosaic notes (see .claude/skills/verify/SKILL.md): lengths live in SMEM as
a full (B, 1) table indexed by a program-id derived row at kernel top
level; the flat (bs, KV*hd) view is reshaped OUTSIDE the kernel (in-kernel
2D reshapes are rejected); block-diagonal packing uses static slices into
a VMEM scratch; dots request f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _head_rows(x, KV: int, G: int):
    """(KV, bs) -> (KV*G, bs) with each head's row repeated G times in
    head-MAJOR order (row r belongs to head r // G), matching the
    block-diagonal query packing. ``pltpu.repeat`` TILES ([a,b,a,b]), so
    the expansion is built from static slices instead."""
    return jnp.concatenate(
        [x[kv:kv + 1] for kv in range(KV) for _ in range(G)], axis=0)


def _decode_kernel_blockdiag(meta_ref, q_ref, kf_ref, vf_ref, *rest,
                             kv_heads: int, group: int, head_dim: int,
                             block_s: int, quantized: bool, oob_tail: bool):
    if quantized:
        ks_ref, vs_ref, o_ref, qb_scr, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, qb_scr, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    kv_len = meta_ref[1 + b]          # meta = [layer, len_0..len_{B-1}]
    KV, G, hd = kv_heads, group, head_dim

    fast = kf_ref.dtype != jnp.float32
    cdt = jnp.bfloat16 if fast else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        qb_scr[:] = jnp.zeros_like(qb_scr)
        for kv in range(KV):
            qb_scr[kv * G:(kv + 1) * G, kv * hd:(kv + 1) * hd] = \
                q_ref[0, kv].astype(qb_scr.dtype)

    base = j * block_s

    @pl.when(base < kv_len)
    def _step():
        kf = kf_ref[0, 0].astype(cdt)                       # (bs, KV*hd)
        s = jax.lax.dot_general(
            qb_scr[...].astype(cdt), kf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                 # (KV*G, bs)
        if quantized:
            ks2d = ks_ref[0, :, 0, :]                       # (KV, bs) f32
            s = s * _head_rows(ks2d, KV, G)                 # rows head-major
        pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < kv_len, s, NEG_INF)
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                    # exp(NEG_INF - m) == 0
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            vs2d = vs_ref[0, :, 0, :]
            p = p * _head_rows(vs2d, KV, G)
        vf = vf_ref[0, 0].astype(cdt)                       # (bs, KV*hd)
        if oob_tail:
            # S % block_s != 0: the tail block reads past the array edge,
            # where bf16 caches / f32 scales can hold NaN bit patterns —
            # and p(=0) * NaN would poison the dot. Aligned int8 caches
            # skip this (garbage is finite, masked p entries are exactly
            # 0).
            p = jnp.where(pos < kv_len, p, 0.0)
            vpos = base + jax.lax.broadcasted_iota(jnp.int32, vf.shape, 0)
            vf = jnp.where(vpos < kv_len, vf, jnp.zeros((), cdt))
        o_all = jax.lax.dot_general(
            p.astype(cdt), vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                 # (KV*G, KV*hd)
        acc_scr[:] = acc_scr[:] * alpha
        for kv in range(KV):
            rows = pl.ds(kv * G, G)
            acc_scr[rows, :] = acc_scr[rows, :] + \
                o_all[kv * G:(kv + 1) * G, kv * hd:(kv + 1) * hd]

    @pl.when(j == nj - 1)
    def _finish():
        for kv in range(KV):
            rows = pl.ds(kv * G, G)
            # guard: a kv_len == 0 row skips every block (l stays 0) and
            # must stay finite like the sibling ragged/fused kernels
            o_ref[0, kv] = (acc_scr[rows, :]
                            / jnp.maximum(l_scr[rows, :1], 1e-30)) \
                .astype(o_ref.dtype)


# cache-block tokens per grid step (VMEM: int8 k+v double buffers +
# their bf16 in-kernel casts + the (KV*G, bs) score/weight temps)
_BLOCK_S = 4096


def decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                     kv_len: jax.Array, sm_scale: float | None = None,
                     k_scale: jax.Array | None = None,
                     v_scale: jax.Array | None = None,
                     layer: jax.Array | int = 0,
                     kv_heads: int | None = None,
                     interpret: bool = False) -> jax.Array:
    """Fused attention for one decode step.

    Args:
      q: (B, 1, H, hd) single-position queries;
      k_cache, v_cache: (B, S, KV, hd) per-layer cache (slot index ==
        position) OR — with ``kv_heads`` given — the whole STACKED flat
        (layers, B, S, KV*hd) cache with ``layer`` selecting the layer:
        the kernel's BlockSpec index map addresses the stacked array
        directly (the layer id rides the scalar-prefetch channel, so all
        layers share ONE compiled kernel), which is what lets
        models/qwen2.py thread a single stacked cache buffer through the
        layer loop with zero per-layer slice copies. Streamed in the
        native layout — never transposed or copied; int8/int4 when
        k_scale/v_scale are given (models/qwen2.py KVCache).
      kv_len: (B,) valid slot count (query position + 1); slots >= kv_len
        are masked, which also implements causality (the new token occupies
        slot kv_len - 1).
      k_scale, v_scale: optional (B, S, KV, 1) f32 per-position dequant
        scales of THIS layer — the quantized-cache path; HBM then streams
        the quantized bytes + scales only. (Scales are tiny — 512 KB at
        32k — so the caller slices the stacked scale array per layer.)
      kv_heads: marks the stacked-flat input form and names KV (the flat
        last dim carries no head split to infer it from).
    Returns:
      (B, 1, H, hd) in q.dtype.
    """
    from jax.experimental.pallas import tpu as pltpu

    B, L, H, hd = q.shape
    assert L == 1, "decode kernel is single-token"
    if kv_heads is None:
        KV = k_cache.shape[2]
        S = k_cache.shape[1]
        kf = k_cache.reshape(B, S, KV * hd)[None]   # free views
        vf = v_cache.reshape(B, S, KV * hd)[None]
        layer = 0
    else:
        KV = kv_heads
        S = k_cache.shape[2]
        kf, vf = k_cache, v_cache                   # (NL, B, S, KV*hd)
    G = H // KV
    scale = sm_scale if sm_scale is not None else hd ** -0.5

    qg = (q[:, 0] * jnp.asarray(scale, q.dtype)).reshape(B, KV, G, hd)
    # scalar-prefetch meta: [layer, kv_len_0..kv_len_{B-1}]
    meta = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        kv_len.astype(jnp.int32).reshape(B)])

    bs = min(_BLOCK_S, S)
    nj = -(-S // bs)
    qb_dtype = jnp.float32 if k_cache.dtype == jnp.float32 else jnp.bfloat16
    scratch = [
        pltpu.VMEM((KV * G, KV * hd), qb_dtype),
        pltpu.VMEM((KV * G, 128), jnp.float32),
        pltpu.VMEM((KV * G, 128), jnp.float32),
        pltpu.VMEM((KV * G, hd), jnp.float32),
    ]
    in_specs = [
        pl.BlockSpec((1, KV, G, hd), lambda b, j, m: (b, 0, 0, 0)),
        pl.BlockSpec((1, 1, bs, KV * hd), lambda b, j, m: (m[0], b, j, 0)),
        pl.BlockSpec((1, 1, bs, KV * hd), lambda b, j, m: (m[0], b, j, 0)),
    ]
    quantized = k_scale is not None
    extra_in = []
    if quantized:
        # transposing the scales is ~0.5 MB/layer, unlike the old K/V
        # transpose which re-wrote the whole cache
        ks = k_scale.transpose(0, 2, 3, 1)              # (B, KV, 1, S)
        vs = v_scale.transpose(0, 2, 3, 1)
        in_specs += [
            pl.BlockSpec((1, KV, 1, bs), lambda b, j, m: (b, 0, 0, j)),
            pl.BlockSpec((1, KV, 1, bs), lambda b, j, m: (b, 0, 0, j))]
        extra_in = [ks.astype(jnp.float32), vs.astype(jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, KV, G, hd), lambda b, j, m: (b, 0, 0, 0)),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel_blockdiag, kv_heads=KV, group=G,
                          head_dim=hd, block_s=bs, quantized=quantized,
                          oob_tail=(S % bs != 0)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
        compiler_params=_arbitrary_k(),
        interpret=interpret,
    )(meta, qg, kf, vf, *extra_in)
    return out.reshape(B, KV * G, 1, hd).transpose(0, 2, 1, 3)


def _smem_spec(interpret: bool):
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _arbitrary_k():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"))
