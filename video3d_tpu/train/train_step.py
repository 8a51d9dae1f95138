"""Jittable training step: LM loss (+ optional grounding InfoNCE) with
rematerialization, designed to be jit-ed over a (dp, fsdp, tp) mesh.

ZeRO-3 equivalence: parameters carry fsdp-sharded NamedShardings; under
``jax.jit`` GSPMD all-gathers each layer's params on use and reduce-scatters
gradients — the XLA-native counterpart of DeepSpeed stage 3 (SURVEY.md §2.6
P2) with no runtime framework.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from video3d_tpu.config import ModelConfig
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models.qwen2 import lm_head as qwen2_lm_head


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def cast_to_compute(params, compute_dtype=jnp.bfloat16):
    """Cast f32 MASTER params to the compute dtype at point of use.

    Mixed-precision semantics matching the reference's DeepSpeed bf16 mode
    (scripts/zero3.json "bf16" + fp32 master/optimizer partitions): the
    optimizer owns an f32 copy so updates accumulate exactly, while the
    forward/backward run in bf16 on the MXU. Applying AdamW updates
    directly to bf16 storage silently drops them at the reference recipe's
    lr=1e-5: |update| ~ lr is below half a bf16 ulp of typical weight
    magnitudes (ulp(0.02) = 7.8e-5), so round-to-nearest returns the old
    weight. The astype here is under jit — XLA fuses the cast into the
    consuming matmuls, and its transpose accumulates bf16 grads into f32
    leaves. Non-f32 leaves (already-bf16 trees, int quant scales) pass
    through unchanged, so this is a no-op for bf16-master states.
    """
    return jax.tree.map(
        lambda x: x.astype(compute_dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)


def loss_fn(params, cfg: ModelConfig, batch: lv3d.Batch,
            remat: bool = True, force_chunked_ce: bool = False,
            scan_layers: bool = True, compute_dtype=None
            ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    if compute_dtype is not None:
        params = cast_to_compute(params, compute_dtype)
    # scan_layers defaults ON for training: numerically identical, but the
    # unrolled 28-layer graph lets the scheduler keep every fsdp-gathered
    # layer alive at once (+12 GiB peak on the v5e-8 recipe — measured,
    # scripts/bench/train_memory_v5e8.py); the scan bounds it to one layer.
    hidden, _ = lv3d.forward_hidden(params, cfg, batch, remat=remat,
                                    scan_layers=scan_layers)
    # Static-shape dispatch (measured, BENCH_NOTES): materialized logits
    # cost one less lm_head matmul (~10% faster at L=2048) but need
    # O(L*vocab) f32 HBM x2 (logits + softmax) — impossible at the 151k
    # vocab beyond ~L=4k on a 16 GB chip. Chunked CE (lm_head + NLL per
    # length-chunk under jax.checkpoint) caps that at O(chunk*vocab) and
    # enables the reference's 32k-token training recipe.
    B, L, _ = hidden.shape
    if force_chunked_ce or B * L * cfg.llm.vocab_size * 4 > 2 << 30:
        # > 2 GiB of logits -> chunked
        lm = lv3d.chunked_language_model_loss(
            params, hidden, batch.labels, chunk=min(512, L))
    else:
        lm = lv3d.language_model_loss(
            qwen2_lm_head(params["llm"], hidden), batch.labels)
    return lm, {"lm_loss": lm}


@functools.partial(jax.jit, static_argnames=("cfg", "tx", "remat",
                                             "force_chunked_ce",
                                             "scan_layers", "compute_dtype"),
                   donate_argnums=(0,))
def train_step(state: TrainState, batch: lv3d.Batch, cfg: ModelConfig,
               tx: optax.GradientTransformation, remat: bool = True,
               force_chunked_ce: bool = False, scan_layers: bool = True,
               compute_dtype=None):
    """One optimizer step. Returns (new_state, metrics).

    ``compute_dtype=jnp.bfloat16`` with f32 ``state.params`` gives
    mixed-precision training (f32 master weights, bf16 compute — the
    DeepSpeed-bf16 equivalent; see :func:`cast_to_compute`)."""
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, cfg, batch, remat, force_chunked_ce, scan_layers,
        compute_dtype)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = dict(metrics)
    metrics["grad_norm"] = optax.global_norm(grads)
    return TrainState(params, opt_state, state.step + 1), metrics
