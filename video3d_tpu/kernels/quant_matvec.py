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


def unpack_int4(packed: jax.Array) -> jax.Array:
    """(in/2, out) packed bytes -> (in, out) int8 values in [-7, 7]
    (XLA fallback / testing)."""
    c = packed.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(c, 28), 28)
    hi = jax.lax.shift_right_arithmetic(c, 4)
    half, out = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * half, out).astype(jnp.int8)
