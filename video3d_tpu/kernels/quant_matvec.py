"""int4 weight-streaming matmul for decode.

Decode-time matmuls are matvecs: (B~1, in) x (in, out), bandwidth-bound on
the weight read. int8 weight-only quantization (models/quant.py) already
streams int8 through XLA's fused convert; int4 cannot be expressed that
way — unpacking two nibbles from one byte either materializes the unpacked
matrix in HBM or reads the packed bytes twice (once per nibble plane),
erasing the benefit. This kernel reads each packed byte ONCE into VMEM and
unpacks in-register, halving weight traffic vs int8.

Layout: byte p of ``packed[(in/2), out]`` holds input row 2p in the low
nibble and row 2p+1 in the high nibble (4-bit two's complement, range
[-7, 7]). The host splits x into even/odd input rows, so the kernel never
interleaves: ``y = x_even @ lo + x_odd @ hi`` (Mosaic rejects the
reshape/interleave form). Scales are group-wise along the input dim with
group == the kernel's input block, so each grid step applies one (1, out)
scale row to its partial product.

Mosaic notes (CLAUDE.md): program_id read at kernel top level, outside
pl.when; int4 sign-extension via int32 shift pairs; dots feed the MXU as
bf16 (nibble values are exact in bf16) with f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _int4_kernel(xe_ref, xo_ref, p_ref, s_ref, o_ref):
    j = pl.program_id(1)                    # input-block step (accumulate)

    @pl.when(j == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    c = p_ref[...].astype(jnp.int32)        # (bk/2, bo) packed bytes
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(c, 28), 28).astype(jnp.bfloat16)
    hi = jax.lax.shift_right_arithmetic(c, 4).astype(jnp.bfloat16)
    xe = xe_ref[...].astype(jnp.bfloat16)   # (B, bk/2) even input rows
    xo = xo_ref[...].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        xe, lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        xo, hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # scale block carries ALL groups for this out tile (a (1, bo) block of a
    # (n_groups, out) array violates Mosaic's 8-divisible second-minor rule);
    # select this step's group row with a dynamic slice
    sc = s_ref[pl.ds(j, 1), :]                           # (1, bo) f32
    o_ref[...] += acc * sc


@functools.partial(jax.jit, static_argnames=("group", "block_out",
                                             "interpret"))
def int4_matmul(x: jax.Array, packed: jax.Array, scales: jax.Array,
                group: int = 512, block_out: int = 2048,
                interpret: bool = False) -> jax.Array:
    """x (..., in) @ int4-packed weights -> (..., out_padded) f32->x.dtype.

    Args:
      packed: (in/2, out_padded) int8, two input rows per byte.
      scales: (in/group, out_padded) dequant scales.
      group: input rows per scale group; must equal the kernel input block.
    """
    *lead, in_ = x.shape
    B = 1
    for d in lead:
        B *= d
    xf = x.reshape(B, in_)
    n_groups, out_p = scales.shape
    assert packed.shape == (in_ // 2, out_p), (packed.shape, in_, out_p)
    assert in_ % group == 0 and n_groups == in_ // group
    assert out_p % block_out == 0
    xe = xf[:, 0::2]                        # (B, in/2)
    xo = xf[:, 1::2]
    bk2 = group // 2

    out = pl.pallas_call(
        _int4_kernel,
        grid=(out_p // block_out, n_groups),
        in_specs=[
            pl.BlockSpec((B, bk2), lambda i, j: (0, j)),
            pl.BlockSpec((B, bk2), lambda i, j: (0, j)),
            pl.BlockSpec((bk2, block_out), lambda i, j: (j, i)),
            pl.BlockSpec((n_groups, block_out), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((B, block_out), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, out_p), jnp.float32),
        interpret=interpret,
    )(xe, xo, packed, scales.astype(jnp.float32))
    return out.reshape(*lead, out_p).astype(x.dtype)


def _int8_mv_kernel(xt_ref, q_ref, s_ref, o_ref, *, chunk):
    # B=1 matvec on the VPU, not the MXU: a 1-row dot occupies 1/128 of
    # the MXU's rows, so the systolic array (~0.7 ms on the lm_head shape)
    # is SLOWER than the HBM stream (~0.66 ms). A lane-broadcast multiply
    # + sublane reduce runs on the VPU (~0.4 ms) and leaves the op
    # HBM-bound. f32 throughout (the VPU is f32-native; int8->f32 is the
    # same 1 convert/byte), f32 accumulation across chunks.
    in_ = q_ref.shape[0]
    acc = jnp.zeros((1, o_ref.shape[1]), jnp.float32)
    for k in range(in_ // chunk):
        xk = xt_ref[k * chunk:(k + 1) * chunk, :].astype(jnp.float32)
        qk = q_ref[k * chunk:(k + 1) * chunk, :].astype(jnp.float32)
        acc = acc + jnp.sum(xk * qk, axis=0, keepdims=True)
    o_ref[...] = acc * s_ref[...]


def _int8_kernel(x_ref, q_ref, s_ref, o_ref):
    # one output tile per grid step, FULL input dim per block: no
    # accumulation carry, no pl.when — the int4 kernel showed fine
    # (out/bo)-step grids but pure overhead at ~2000 steps, so tiles are
    # sized large (block_out auto-picked below)
    xb = x_ref[...].astype(jnp.bfloat16)    # (B, in)
    qb = q_ref[...].astype(jnp.bfloat16)    # (in, bo) int8 -> exact bf16
    acc = jax.lax.dot_general(
        xb, qb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = acc * s_ref[...].astype(jnp.float32)


def _pick_block_out(in_: int, out: int) -> int:
    """Largest 128-multiple divisor of ``out`` keeping the int8 tile
    under ~6 MB of VMEM (2 pipeline buffers + x/out tiles < 16 MB)."""
    cap = (6 << 20) // max(in_, 1) // 128 * 128
    best = 0
    bo = 128
    while bo <= cap:
        if out % bo == 0:
            best = bo
        bo += 128
    return best


@functools.partial(jax.jit, static_argnames=("interpret", "block_out",
                                             "chunk"))
def int8_matmul(x: jax.Array, q: jax.Array, scale: jax.Array,
                interpret: bool = False, block_out: int = 0,
                chunk: int = 0) -> jax.Array:
    """x (..., in) @ per-channel int8 weights -> (..., out) in x.dtype.

    Decode-time weight-only int8 matvec. Measured on the lm_head shape
    (3584 x 152k int8, v5e): a DMA-only pallas probe tops out at ~435
    GB/s, i.e. XLA's fused-convert dot (~420 GB/s) already runs at ~97%
    of the achievable single-stream rate — there is no big win here,
    contrary to the round-1 extrapolation. The B=1 VPU formulation below
    (lane-broadcast multiply + sublane reduce; a 1-row MXU dot wastes
    127/128 of the systolic rows) measures ~433 GB/s, +3% over XLA; the
    B>1 MXU path is exact parity (411 GB/s at B=8). A row-streaming
    accumulator variant measured WORSE (255 GB/s: the tiled HBM layout
    voids row-contiguity reasoning, and the resident f32 out row forces
    tiny 2.4 MB blocks). Dispatch (models/quant.py) therefore routes only
    B=1 vocab-head shapes here; everything else keeps the XLA path.

    Args:
      q: (in, out) int8, per-output-channel quantized (models/quant.py
        quantize_weight dict form).
      scale: (1, out) dequant scales.
    """
    *lead, in_ = x.shape
    B = 1
    for d in lead:
        B *= d
    xf = x.reshape(B, in_)
    in_q, out = q.shape
    assert in_q == in_ and scale.shape == (1, out), (q.shape, scale.shape)
    bo = block_out or _pick_block_out(in_, out)
    assert bo and out % bo == 0, (in_, out, bo)

    if B == 1:
        chunk = chunk or next(
            (c for c in (512, 256, 128) if in_ % c == 0), in_)
        y = pl.pallas_call(
            functools.partial(_int8_mv_kernel, chunk=chunk),
            grid=(out // bo,),
            in_specs=[
                pl.BlockSpec((in_, 1), lambda i: (0, 0)),
                pl.BlockSpec((in_, bo), lambda i: (0, i)),
                pl.BlockSpec((1, bo), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((1, bo), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((1, out), jnp.float32),
            interpret=interpret,
        )(xf.T, q, scale.astype(jnp.float32))
    else:
        y = pl.pallas_call(
            _int8_kernel,
            grid=(out // bo,),
            in_specs=[
                pl.BlockSpec((B, in_), lambda i: (0, 0)),
                pl.BlockSpec((in_, bo), lambda i: (0, i)),
                pl.BlockSpec((1, bo), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((B, bo), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((B, out), jnp.float32),
            interpret=interpret,
        )(xf, q, scale.astype(jnp.float32))
    return y.reshape(*lead, out).astype(x.dtype)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """(in/2, out) packed bytes -> (in, out) int8 values in [-7, 7]
    (XLA fallback / testing)."""
    c = packed.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(c, 28), 28)
    hi = jax.lax.shift_right_arithmetic(c, 4)
    half, out = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * half, out).astype(jnp.int8)
