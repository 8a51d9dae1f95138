"""Weight-only int8 quantization for serving.

The reference loads 4/8-bit weights via bitsandbytes (train_3d.py
load_in_8bit branches, model/builder.py quantization kwargs). TPU
equivalent: symmetric per-output-channel int8 with a bf16 scale row,
dequantized inside the matmul (XLA fuses the int8->bf16 convert into the
MXU feed), halving decode's HBM traffic — the decode bottleneck
(BENCH_NOTES.md).

A quantized weight is the dict {"q": int8 (in, out), "scale": (1, out)};
``qwen2.py``'s matmul helper consumes either form transparently.
"""

from __future__ import annotations

import re
from typing import Any, Tuple

import jax
import jax.numpy as jnp

# LLM projection matrices only: embeddings stay bf16 (gathers), norms tiny.
DEFAULT_PATTERNS = (
    r"llm/layers/\d+/attn/w[qkvo]$",
    r"llm/layers/\d+/mlp/w_(gate|up|down)$",
    r"llm/lm_head$",
)

# Vision tower (SigLIP) projections: the compute-bound half of the
# preprocessing+prefill chain — quantize these (w8a8) to run the tower on
# the doubled int8 MXU rate. Patch embed / layernorms / pos_embed stay bf16.
VISION_PATTERNS = (
    r"vision/layers/\d+/attn/w[qkvo]$",
    r"vision/layers/\d+/mlp/w[12]$",
)


@jax.tree_util.register_pytree_node_class
class W8A8Weight:
    """int8 weight marked for the dynamic-activation int8 matmul (w8a8).

    A distinct pytree class (not a dict flag) so param pytrees containing it
    stay jit-traceable: the marker lives in the pytree STRUCTURE, which is
    static under jit, rather than as a non-array leaf.
    """

    def __init__(self, q, scale):
        self.q = q
        self.scale = scale

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def quantize_weight(w: jax.Array, act: str = "none"):
    """Symmetric per-output-channel int8: w ~= q * scale.

    ``act="int8"`` returns a :class:`W8A8Weight`: activations are then
    dynamically quantized per token and the matmul runs int8 x int8 -> int32
    on the MXU. NOTE measured reality (BENCH_NOTES.md round 2): XLA's s8
    dot_general lowering does NOT unlock the MXU's nominal 2x int8 rate on
    v5e — int8 and bf16 matmuls run at the same TOPS — so w8a8 is an HBM
    lever (int8 weights AND int8 activation traffic between fused ops),
    not a compute lever. ``act="none"`` keeps the weight-only behavior
    (int8 dequantized into a bf16 MXU feed): bit-exact activation math,
    the right choice for decode.
    """
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)      # (1, out)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    if act == "int8":
        return W8A8Weight(q, scale.astype(jnp.bfloat16))
    return {"q": q, "scale": scale.astype(jnp.bfloat16)}


def matmul_w8a8(x: jax.Array, w_q: jax.Array, w_scale: jax.Array) -> jax.Array:
    """Dynamic-activation int8 matmul: per-token activation scales x
    per-channel weight scales, accumulating in int32 on the MXU.

    y = (q(x) @ w_q) * sx * sw with q(x) = round(x / sx), sx = absmax/127
    per token row. Everything else (scales, bias adds, activation
    functions) stays in the caller's dtype. See quantize_weight's note on
    measured int8-MXU throughput: this path halves weight HBM traffic but
    does not beat bf16 FLOP rate through XLA.
    """
    x32 = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    y32 = jax.lax.dot_general(
        xq, w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y32.astype(jnp.float32) * sx * w_scale.astype(jnp.float32)
    return y.astype(x.dtype)


@jax.tree_util.register_pytree_node_class
class Int4Weight:
    """int4-packed weight: arrays are pytree children, (dims, group) are
    STATIC aux data — inside jit they stay Python ints (shape logic), never
    tracers."""

    def __init__(self, q4, scale4, dims, group):
        self.q4 = q4
        self.scale4 = scale4
        self.dims = dims
        self.group = group

    def tree_flatten(self):
        return (self.q4, self.scale4), (self.dims, self.group)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])


def quantize_weight_int4(w: jax.Array, group: int = 512) -> "Int4Weight":
    """Group-wise symmetric int4: two input rows packed per byte
    (kernels/quant_matvec.py layout), scale per (input group, out channel).

    Halves weight HBM traffic again vs int8 — decode's bottleneck. Inputs
    whose size doesn't divide ``group`` get zero-padded rows (their scale
    group still normalizes over real rows only via absmax of the padded
    block, where the pad contributes 0).
    """
    in_, out = w.shape
    w32 = w.astype(jnp.float32)
    pad_in = (-in_) % group
    if pad_in:
        w32 = jnp.pad(w32, ((0, pad_in), (0, 0)))
    in_p = in_ + pad_in
    n_g = in_p // group
    grouped = w32.reshape(n_g, group, out)
    absmax = jnp.max(jnp.abs(grouped), axis=1)               # (n_g, out)
    scale = jnp.maximum(absmax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(grouped / scale[:, None, :]), -7, 7)
    q = q.reshape(in_p, out).astype(jnp.int8)
    packed = (q[0::2] & jnp.int8(0x0F)) | (q[1::2] << 4)     # (in_p/2, out)
    # big matrices pad to 2048 (the kernel wants BIG out tiles — grid-step
    # overhead dominates small tiles; <=1.3% waste on the lm_head); small
    # ones (kv projections) pad to 512 so padding never dominates traffic
    pad_out = (-out) % (2048 if out >= 8192 else 512)
    if pad_out:
        packed = jnp.pad(packed, ((0, 0), (0, pad_out)))
        scale = jnp.pad(scale, ((0, 0), (0, pad_out)))
    return Int4Weight(packed, scale.astype(jnp.bfloat16), (in_, out), group)


@jax.tree_util.register_pytree_node_class
class LoraAdapted:
    """Frozen (possibly quantized) base weight + LoRA factors, evaluated
    lazily inside :func:`matmul` as ``matmul(x, base) + ((x@A)@B) * scale``.

    The TPU counterpart of the reference's QLoRA recipe (train_3d.py
    lora_enable + bits 4/8 bitsandbytes branches, :1588-1657): the base
    stays quantized and frozen — it is never dequantized into a full-size
    bf16 matrix — while gradients flow through the low-rank delta only.
    ``scale`` (= alpha/r) is static aux data, so it stays a Python float
    under jit.
    """

    def __init__(self, base, A, B, scale: float):
        self.base = base
        self.A = A
        self.B = B
        self.scale = scale

    def tree_flatten(self):
        return (self.base, self.A, self.B), self.scale

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux)


def matmul(x: jax.Array, w) -> jax.Array:
    """x @ w for plain, int8-, int4-quantized, or LoRA-adapted weights."""
    if isinstance(w, LoraAdapted):
        delta = (x @ w.A.astype(x.dtype)) @ w.B.astype(x.dtype)
        return matmul(x, w.base) + delta * w.scale
    if isinstance(w, Int4Weight):
        from video3d_tpu.kernels.quant_matvec import int4_matmul, unpack_int4

        in_, out = w.dims
        in_p = w.q4.shape[0] * 2
        xp = x
        if in_p != in_:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, in_p - in_)]
            xp = jnp.pad(x, pad)
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        # The pallas kernel is a MATVEC: its blocks carry the whole
        # flattened batch, so it only fits decode-sized row counts. Prefill
        # (rows ~ B * bucket_len) takes the unpack+dense path — a one-time
        # bf16 materialization XLA streams through the MXU.
        if jax.default_backend() == "cpu":
            # reference fallback (tests): full f32 dequant matmul
            qw = unpack_int4(w.q4).astype(jnp.float32)
            sc = jnp.repeat(w.scale4.astype(jnp.float32), w.group, axis=0)
            y = (xp.astype(jnp.float32) @ (qw * sc)).astype(x.dtype)
        elif rows > 32:
            # prefill on TPU: transient bf16 dequant (nibbles are exact in
            # bf16; scales are stored in bf16 anyway), streamed by the MXU
            qw = unpack_int4(w.q4).astype(jnp.bfloat16)
            sc = jnp.repeat(w.scale4, w.group, axis=0)
            y = (xp.astype(jnp.bfloat16) @ (qw * sc)).astype(x.dtype)
        else:
            out_p = w.q4.shape[1]
            bo = 2048 if out_p % 2048 == 0 else 512
            y = int4_matmul(xp, w.q4, w.scale4, group=w.group, block_out=bo)
        return y[..., :out]
    if isinstance(w, W8A8Weight):
        return matmul_w8a8(x, w.q, w.scale)
    if isinstance(w, dict) and "q" in w:
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        if (jax.default_backend() == "tpu" and rows == 1
                and w["q"].shape[1] >= 32768):
            # B=1 vocab-head matvec: the pallas VPU kernel's measured +3%
            # over XLA (433 vs 420 GB/s; DMA probe ceiling 435 — XLA is
            # already near the wall). Every other shape/batch measured at
            # parity or worse, so they keep the XLA dequant dot
            # (kernels/quant_matvec.py docstring has the numbers).
            from video3d_tpu.kernels.quant_matvec import (_pick_block_out,
                                                          int8_matmul)

            if _pick_block_out(*w["q"].shape):
                return int8_matmul(x, w["q"], w["scale"])
        y = x @ w["q"].astype(x.dtype)
        return y * w["scale"].astype(x.dtype)
    return x @ w


def is_quantized(w) -> bool:
    return isinstance(w, (Int4Weight, W8A8Weight)) \
        or (isinstance(w, dict) and "q" in w)


def quantize_tree(params: Any, patterns: Tuple[str, ...] = DEFAULT_PATTERNS,
                  bits: int = 8, act: str = "none") -> Any:
    """Quantize matching 2-D weights in a param pytree (bits: 8 or 4).

    ``act="int8"`` (bits=8 only) marks the quantized weights for the w8a8
    int8-MXU path — see :func:`quantize_weight`.
    """
    assert bits in (8, 4), bits
    assert act == "none" or bits == 8, (bits, act)

    def walk(tree, prefix=""):
        if isinstance(tree, (Int4Weight, W8A8Weight, LoraAdapted)):
            return tree
        if isinstance(tree, dict):
            if "q" in tree and "scale" in tree:
                return tree
            return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v, f"{prefix}/{i}") for i, v in enumerate(tree)]
        if getattr(tree, "ndim", 0) == 2 and any(
                re.search(p, prefix) for p in patterns):
            return quantize_weight(tree, act=act) if bits == 8 \
                else quantize_weight_int4(tree)
        return tree

    return walk(params)


def quantization_error(params: Any, quantized: Any) -> float:
    """Max relative reconstruction error over quantized leaves."""
    errs = []

    def walk(a, b):
        if isinstance(b, dict) and "q" in b and not isinstance(a, dict):
            recon = b["q"].astype(jnp.float32) * b["scale"].astype(jnp.float32)
            denom = jnp.maximum(jnp.abs(a.astype(jnp.float32)).max(), 1e-9)
            errs.append(float(jnp.abs(recon - a.astype(jnp.float32)).max() / denom))
        elif isinstance(a, dict):
            for k in a:
                walk(a[k], b[k])
        elif isinstance(a, list):
            for x, y in zip(a, b):
                walk(x, y)

    walk(params, quantized)
    return max(errs) if errs else 0.0
