"""QLoRA: LoRA fine-tuning over a frozen QUANTIZED base model.

The reference composes bitsandbytes 4/8-bit loading with PEFT LoRA
(train_3d.py:1588-1657: ``bits in [4, 8]`` + ``lora_enable`` ->
``prepare_model_for_kbit_training`` + ``get_peft_model``). TPU-native
equivalent: the base param tree is int8/int4-quantized
(models/quant.py) and stays frozen; only the bf16/f32 LoRA factors are
trained. ``apply_lora`` wraps each quantized base weight in a lazy
:class:`~video3d_tpu.models.quant.LoraAdapted` node, so the forward never
materializes a dequantized weight matrix — the quant matmul evaluates
``matmul(x, base) + ((x @ A) @ B) * scale`` leaf by leaf.

Why this matters on TPU: a bf16 7B train step needs ~71 GB for params +
AdamW moments (BENCH_NOTES "Full 7B train-step memory") and only fits a
v5e-8 slice. With an int8 base (~6.6 GB) and optimizer state only on the
LoRA factors (r=64: ~0.4 GB f32 + 0.8 GB moments), the SAME 7B model
fine-tunes on ONE 16 GB chip.

Gradient caveat: weight-only int8/int4 bases dequantize to the compute
dtype inside the matmul, so d(loss)/dx through the base term is exact.
W8A8 bases round the ACTIVATIONS (zero gradient a.e.) — training through
them would silently starve every upstream layer of gradient, so
:func:`check_qlora_base` refuses them.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from video3d_tpu.config import ModelConfig
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.train.lora import LoraConfig, apply_lora
from video3d_tpu.train.train_step import cast_to_compute, loss_fn


class QLoraState(NamedTuple):
    lora: Any           # trainable {"A","B"}/None pytree
    opt_state: Any      # optimizer state over `lora` only
    step: jax.Array


def check_qlora_base(params: Any) -> None:
    """Refuse W8A8 bases: matmul_w8a8 rounds activations, whose gradient is
    zero almost everywhere — a QLoRA step over it would train on no signal
    from any layer below the first w8a8 matmul. Weight-only int8/int4 (and
    plain bf16) bases are fine."""
    from video3d_tpu.models.quant import W8A8Weight

    bad = [type(leaf).__name__
           for leaf in jax.tree_util.tree_leaves(
               params, is_leaf=lambda x: isinstance(x, W8A8Weight))
           if isinstance(leaf, W8A8Weight)]
    if bad:
        raise TypeError(
            f"QLoRA over w8a8 weights is unsupported ({len(bad)} W8A8Weight "
            "leaves): activation rounding has zero gradient. Quantize the "
            "base with act='none' (weight-only int8) instead.")


def qlora_loss_fn(lora: Any, qparams: Any, cfg: ModelConfig,
                  batch: lv3d.Batch, lcfg: LoraConfig, remat: bool = True,
                  force_chunked_ce: bool = False, scan_layers: bool = False,
                  compute_dtype=jnp.bfloat16
                  ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """LM loss with the quantized base frozen and LoRA merged lazily.

    ``compute_dtype`` casts the f32 master LoRA factors to bf16 at use
    (train_step.cast_to_compute semantics); the base tree is used as-is
    (its quantized leaves carry their own scales, frozen norms may stay
    f32 — exact math there is free)."""
    if compute_dtype is not None:
        lora = cast_to_compute(lora, compute_dtype)
    merged = apply_lora(qparams, lora, lcfg)
    return loss_fn(merged, cfg, batch, remat=remat,
                   force_chunked_ce=force_chunked_ce,
                   scan_layers=scan_layers, compute_dtype=None)


@functools.partial(jax.jit, static_argnames=("cfg", "tx", "lcfg", "remat",
                                             "force_chunked_ce",
                                             "scan_layers", "compute_dtype"),
                   donate_argnums=(0,))
def qlora_train_step(state: QLoraState, qparams: Any, batch: lv3d.Batch,
                     cfg: ModelConfig, tx: optax.GradientTransformation,
                     lcfg: LoraConfig, remat: bool = True,
                     force_chunked_ce: bool = False,
                     scan_layers: bool = False,
                     compute_dtype=jnp.bfloat16):
    """One optimizer step over the LoRA factors only. ``qparams`` is a
    plain (non-donated) argument: the frozen base is read, never written."""
    (loss, metrics), grads = jax.value_and_grad(qlora_loss_fn, has_aux=True)(
        state.lora, qparams, cfg, batch, lcfg, remat, force_chunked_ce,
        scan_layers, compute_dtype)
    updates, opt_state = tx.update(grads, state.opt_state, state.lora)
    lora = optax.apply_updates(state.lora, updates)
    metrics = dict(metrics)
    metrics["grad_norm"] = optax.global_norm(grads)
    return QLoraState(lora, opt_state, state.step + 1), metrics


def create_qlora_state(lora: Any, tx: optax.GradientTransformation
                       ) -> QLoraState:
    return QLoraState(lora=lora, opt_state=tx.init(lora),
                      step=jnp.zeros((), jnp.int32))
