"""LoRA adapters for the functional param pytree.

Covers the reference's LoRA capabilities (train_3d.py:1588-1657 lora_enable
branch, llava_trainer.py:560-578 split save, model/builder.py:54-117 merge
path): low-rank adapters on the LLM attention/MLP projection matrices,
trained with the base frozen, saved separately, and mergeable into the base
weights for inference.

Representation: a parallel pytree holding {"A": (in, r), "B": (r, out)} at
the positions of adapted 2-D weights and None elsewhere. Effective weight is
``w + (A @ B) * (alpha / r)``; :func:`apply_lora` materializes merged params
inside the loss function so gradients flow only into A/B.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 128
    alpha: int = 256
    # reference find_all_linear_names targets the LLM linear layers only
    # (train_3d.py:219-232 excludes mm_projector / vision_tower / resampler)
    target_patterns: Tuple[str, ...] = (
        r"llm/layers/\d+/attn/w[qkvo]$",
        r"llm/layers/\d+/mlp/w_(gate|up|down)$",
    )

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def _match(path: str, cfg: LoraConfig) -> bool:
    return any(re.search(p, path) for p in cfg.target_patterns)


def _map_with_path(fn, tree, prefix=""):
    if isinstance(tree, dict):
        return {k: _map_with_path(fn, v, f"{prefix}/{k}" if prefix else k)
                for k, v in tree.items()}
    if isinstance(tree, list):
        return [_map_with_path(fn, v, f"{prefix}/{i}") for i, v in enumerate(tree)]
    return fn(prefix, tree)


def init_lora(key: jax.Array, params: Any, cfg: LoraConfig,
              dtype=jnp.float32) -> Any:
    """Adapter pytree: {"A", "B"} at adapted weights, None elsewhere.
    A ~ N(0, 0.02), B = 0 (so the initial delta is zero, as in PEFT)."""
    counter = [0]

    def init_leaf(path, w):
        if getattr(w, "ndim", 0) == 2 and _match(path, cfg):
            counter[0] += 1
            k = jax.random.fold_in(key, counter[0])
            din, dout = w.shape
            return {"A": 0.02 * jax.random.normal(k, (din, cfg.r), dtype),
                    "B": jnp.zeros((cfg.r, dout), dtype)}
        return None

    return _map_with_path(init_leaf, params)


def apply_lora(params: Any, lora: Any, cfg: LoraConfig) -> Any:
    """Merged params: w + (A @ B) * scale at adapted leaves."""
    def merge(w, ad):
        if ad is None:
            return w
        if isinstance(w, dict):
            raise TypeError("LoRA cannot merge into int8-quantized weights; "
                            "apply LoRA before quantize_tree")
        delta = (ad["A"] @ ad["B"]) * cfg.scale
        return w + delta.astype(w.dtype)

    return jax.tree.map(merge, params, lora,
                        is_leaf=lambda x: x is None or
                        (isinstance(x, dict) and set(x) == {"A", "B"}))


def merge_lora_into_params(params: Any, lora: Any, cfg: LoraConfig) -> Any:
    """Permanent merge for inference (model/builder.py:106-117)."""
    return apply_lora(params, lora, cfg)


def lora_size(lora: Any) -> int:
    leaves = [x for x in jax.tree_util.tree_leaves(lora) if hasattr(x, "size")]
    return sum(int(x.size) for x in leaves)
