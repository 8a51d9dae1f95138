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


def quantize_weight(w: jax.Array) -> dict:
    """Symmetric per-output-channel int8: w ~= q * scale."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)      # (1, out)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.bfloat16)}


def matmul(x: jax.Array, w) -> jax.Array:
    """x @ w for plain or int8-quantized weights."""
    if isinstance(w, dict) and "q" in w:
        y = x @ w["q"].astype(x.dtype)
        return y * w["scale"].astype(x.dtype)
    return x @ w


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w


def quantize_tree(params: Any, patterns: Tuple[str, ...] = DEFAULT_PATTERNS) -> Any:
    """Quantize matching 2-D weights in a param pytree."""
    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            if "q" in tree and "scale" in tree:
                return tree
            return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v, f"{prefix}/{i}") for i, v in enumerate(tree)]
        if getattr(tree, "ndim", 0) == 2 and any(
                re.search(p, prefix) for p in patterns):
            return quantize_weight(tree)
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
