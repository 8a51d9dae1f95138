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


def _weight_shape(w) -> Optional[Tuple[int, int]]:
    """(in, out) of a plain 2-D or quantized weight leaf, else None."""
    from video3d_tpu.models.quant import Int4Weight, W8A8Weight

    if isinstance(w, Int4Weight):
        return w.dims
    if isinstance(w, W8A8Weight):
        return tuple(w.q.shape)
    if isinstance(w, dict) and "q" in w:
        return tuple(w["q"].shape)
    if getattr(w, "ndim", 0) == 2:
        return tuple(w.shape)
    return None


def _adapter_or_base_leaf(x) -> bool:
    """is_leaf for trees mixing {"A","B"} adapters with (possibly
    quantized) base weights: stop at Nones, adapter dicts, and every
    quantized-weight representation so tree.map never zips their internals
    against a differently-shaped counterpart."""
    from video3d_tpu.models.quant import Int4Weight, LoraAdapted, W8A8Weight

    return (x is None
            or isinstance(x, (Int4Weight, W8A8Weight, LoraAdapted))
            or (isinstance(x, dict) and (set(x) == {"A", "B"} or "q" in x)))


def _map_with_path(fn, tree, prefix=""):
    if isinstance(tree, dict) and not _adapter_or_base_leaf(tree):
        return {k: _map_with_path(fn, v, f"{prefix}/{k}" if prefix else k)
                for k, v in tree.items()}
    if isinstance(tree, list):
        return [_map_with_path(fn, v, f"{prefix}/{i}") for i, v in enumerate(tree)]
    return fn(prefix, tree)


def init_lora(key: jax.Array, params: Any, cfg: LoraConfig,
              dtype=jnp.float32) -> Any:
    """Adapter pytree: {"A", "B"} at adapted weights, None elsewhere.
    A ~ N(0, 0.02), B = 0 (so the initial delta is zero, as in PEFT).
    Works on plain AND quantized param trees (QLoRA: adapters are inited
    directly against the int8/int4 base)."""
    counter = [0]

    def init_leaf(path, w):
        shape = _weight_shape(w)
        if shape is not None and _match(path, cfg):
            counter[0] += 1
            k = jax.random.fold_in(key, counter[0])
            din, dout = shape
            return {"A": 0.02 * jax.random.normal(k, (din, cfg.r), dtype),
                    "B": jnp.zeros((cfg.r, dout), dtype)}
        return None

    return _map_with_path(init_leaf, params)


def apply_lora(params: Any, lora: Any, cfg: LoraConfig) -> Any:
    """Merged params: w + (A @ B) * scale at adapted leaves.

    Quantized base leaves (int8 dict / Int4Weight / W8A8Weight) are wrapped
    in :class:`~video3d_tpu.models.quant.LoraAdapted` instead of being
    materialized: the quant matmul then evaluates base + low-rank delta
    lazily — the QLoRA forward (reference train_3d.py:1588-1657
    bits-4/8 + lora_enable). Gradients flow only through A/B (and, for
    weight-only bases, through x); see train/qlora.py for the training
    step and the w8a8 caveat.
    """
    from video3d_tpu.models.quant import LoraAdapted, is_quantized

    def merge(w, ad):
        if ad is None:
            return w
        if not (isinstance(ad, dict) and set(ad) == {"A", "B"}):
            # full trainable override — the reference's non-LoRA trainables
            # (projector / world-PE / ground head saved alongside adapters
            # in non_lora_trainables.bin, llava_trainer.py:560-578)
            return ad
        if is_quantized(w):
            return LoraAdapted(w, ad["A"], ad["B"], cfg.scale)
        delta = (ad["A"] @ ad["B"]) * cfg.scale
        return w + delta.astype(w.dtype)

    return jax.tree.map(merge, params, lora, is_leaf=_adapter_or_base_leaf)


# the reference keeps these trained alongside LoRA adapters and saves them
# as non_lora_trainables.bin (train_3d.py:1875-1884: projector + newline +
# world-PE + ground head remain trainable under lora_enable)
DEFAULT_EXTRA_TRAINABLE = ("projector", "world_pe_mlp", "ground_head",
                           "image_newline")


def init_lora_trainable(key: jax.Array, params: Any, cfg: LoraConfig,
                        extra_prefixes: Tuple[str, ...] =
                        DEFAULT_EXTRA_TRAINABLE,
                        dtype=jnp.float32) -> Any:
    """Trainable tree for LoRA fine-tuning: {"A","B"} adapters at the LLM
    projection weights, FULL copies of the reference's non-LoRA-trainable
    modules (projector, world-PE, ground head, image_newline — upcast to
    ``dtype`` as the optimizer master copy), None everywhere else.
    Feed to :func:`apply_lora` against the frozen (possibly quantized)
    base."""
    lora = init_lora(key, params, cfg, dtype)
    if not isinstance(params, dict):
        return lora
    out = dict(lora)
    for name in extra_prefixes:
        if name in params and params[name] is not None:
            out[name] = jax.tree.map(
                lambda x: x.astype(dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                          jnp.floating)
                else x, params[name])
    return out


def merge_lora_into_params(params: Any, lora: Any, cfg: LoraConfig) -> Any:
    """Permanent merge for inference (model/builder.py:106-117).

    Unlike :func:`apply_lora` (which keeps quantized bases lazy), this
    produces standalone weights: an int8-dict base is dequantized, the
    delta added, and the result REQUANTIZED to int8 — the merged weight
    differs from the lazy form by at most one requantization step (the
    same error profile as quantizing the trained-and-merged bf16 weight
    directly, which is what a deployment would do). Int4/W8A8 bases are
    refused — export those to bf16 first or serve with the lazy form.
    """
    from video3d_tpu.models.quant import (Int4Weight, W8A8Weight,
                                          quantize_weight)

    def merge(w, ad):
        if ad is None:
            return w
        if not (isinstance(ad, dict) and set(ad) == {"A", "B"}):
            # full trainable override (non_lora_trainables) — replaces the
            # base leaf outright, matching dtype
            return (ad.astype(w.dtype) if hasattr(w, "dtype")
                    and hasattr(ad, "astype") else ad)
        if isinstance(w, (Int4Weight, W8A8Weight)):
            raise TypeError(
                "permanent merge into int4/w8a8 weights is unsupported; "
                "keep apply_lora's lazy form or merge into bf16 then "
                "requantize")
        delta = (ad["A"].astype(jnp.float32) @ ad["B"].astype(jnp.float32)) \
            * cfg.scale
        if isinstance(w, dict) and "q" in w:
            base = w["q"].astype(jnp.float32) * w["scale"].astype(jnp.float32)
            return quantize_weight((base + delta).astype(jnp.bfloat16))
        return w + delta.astype(w.dtype)

    return jax.tree.map(merge, params, lora, is_leaf=_adapter_or_base_leaf)


def lora_size(lora: Any) -> int:
    leaves = [x for x in jax.tree_util.tree_leaves(lora) if hasattr(x, "size")]
    return sum(int(x.size) for x in leaves)


def load_lora_export(model_dir: str, base_params: Any
                     ) -> Tuple[Any, LoraConfig, int]:
    """Restore a Trainer LoRA/QLoRA export against ``base_params``.

    ``model_dir`` is the ``<run>/model`` orbax tree the Trainer writes
    (adapters + non-LoRA trainables); ``<run>/lora.json`` alongside it
    carries r/alpha/bits (the merge scale is not recoverable from the
    adapter shapes alone). Returns ``(trainable_tree, LoraConfig, bits)``
    — bits 8/4 means the adapters were trained compensating a base
    QUANTIZED to those bits, so the caller must quantize ``base_params``
    to the same bits BEFORE calling (the restore target's adapter shapes
    come from the base tree) and keep the adapters lazy via
    :func:`apply_lora`. Counterpart of the reference's LoRA load branch
    (model/builder.py:54-117: non_lora_trainables.bin + peft merge)."""
    import json
    import os

    import orbax.checkpoint as ocp

    run_dir = os.path.dirname(os.path.abspath(model_dir))
    with open(os.path.join(run_dir, "lora.json")) as f:
        meta = json.load(f)
    cfg = LoraConfig(r=meta["r"], alpha=meta["alpha"])
    bits = int(meta.get("bits", 16))
    # restore against a structure target built from the base params, so
    # the adapter tree's None positions survive the round trip
    target = init_lora_trainable(jax.random.PRNGKey(0), base_params, cfg)
    target = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, target)
    lora = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(model_dir), item=jax.device_get(target))
    return lora, cfg, bits
