"""Optimizer assembly: AdamW with per-module learning rates, weight-decay
groups, and cosine-with-warmup schedule.

Mirrors the reference optimizer semantics (llava_trainer.py:446-523): the
projector (and world-PE / ground head) can run at ``mm_projector_lr``, the
vision tower at ``mm_vision_tower_lr`` (2e-6 in train_multi.sh:66), the rest
at the base LR (1e-5); biases and norm scales get no weight decay (HF
``get_decay_parameter_names`` behavior). Frozen modules (``mm_tunable_parts``,
train_3d.py:1758-1829) are handled with a zero mask.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 1e-5
    mm_vision_tower_lr: Optional[float] = 2e-6
    mm_projector_lr: Optional[float] = None
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    max_grad_norm: float = 1.0
    # modules to train; mirrors mm_tunable_parts. Paths are pytree prefixes.
    tunable_prefixes: Tuple[str, ...] = ("llm", "projector", "vision",
                                         "image_newline", "ground_head",
                                         "world_pe_mlp")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def cosine_warmup_schedule(cfg: OptimConfig, peak_lr: float) -> optax.Schedule:
    warmup = max(1, int(cfg.total_steps * cfg.warmup_ratio))
    # optax's cosine phase spans (decay_steps - warmup_steps), which must be
    # positive — a tiny run whose total_steps rounds down to <= warmup (e.g.
    # smoke datasets smaller than one global batch) would crash otherwise
    total = max(cfg.total_steps, warmup + 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=peak_lr, warmup_steps=warmup,
        decay_steps=total, end_value=0.0)


def _module_of(path: str) -> str:
    if path.startswith("vision"):
        return "vision"
    if path.startswith("projector") or path.startswith("image_newline") \
            or path.startswith("world_pe_mlp"):
        return "projector"
    return "base"


def _no_decay(path: str, param) -> bool:
    """Biases and 1-D norm/scale params get no weight decay."""
    leaf = path.split("/")[-1]
    return param.ndim <= 1 or leaf.startswith("b") or "ln" in leaf or "norm" in leaf


def build_optimizer(params, cfg: OptimConfig) -> optax.GradientTransformation:
    """Multi-LR AdamW with decay masking, warmup-cosine, grad clipping, and
    freezing of non-tunable modules."""
    labels = jax.tree_util.tree_map_with_path(
        lambda p, x: _module_of(_path_str(p)), params)
    decay_mask = jax.tree_util.tree_map_with_path(
        lambda p, x: not _no_decay(_path_str(p), x), params)
    trainable = jax.tree_util.tree_map_with_path(
        lambda p, x: any(_path_str(p).startswith(t) for t in cfg.tunable_prefixes),
        params)

    def adamw(lr):
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            # f32 first moment even under bf16 params (mixed-precision Adam)
            optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2,
                                eps=cfg.adam_eps, mu_dtype=jnp.float32),
            optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask),
            optax.scale_by_schedule(cosine_warmup_schedule(cfg, 1.0)),
            optax.scale(-lr),
        )

    tx = optax.multi_transform(
        {
            "base": adamw(cfg.learning_rate),
            "vision": adamw(cfg.mm_vision_tower_lr or cfg.learning_rate),
            "projector": adamw(cfg.mm_projector_lr or cfg.learning_rate),
        },
        labels,
    )
    # Zero-out updates of frozen params.
    freeze = optax.masked(optax.set_to_zero(),
                          jax.tree.map(lambda t: not t, trainable))
    return optax.chain(tx, freeze)
