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


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def loss_fn(params, cfg: ModelConfig, batch: lv3d.Batch,
            remat: bool = True) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    # chunked CE: the (B, L, 151k-vocab) logits tensor never materializes
    # (lm_head + NLL run per length-chunk under jax.checkpoint)
    hidden, _ = lv3d.forward_hidden(params, cfg, batch, remat=remat)
    lm = lv3d.chunked_language_model_loss(params, hidden, batch.labels)
    return lm, {"lm_loss": lm}


@functools.partial(jax.jit, static_argnames=("cfg", "tx", "remat"),
                   donate_argnums=(0,))
def train_step(state: TrainState, batch: lv3d.Batch, cfg: ModelConfig,
               tx: optax.GradientTransformation, remat: bool = True):
    """One optimizer step. Returns (new_state, metrics)."""
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, cfg, batch, remat)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = dict(metrics)
    metrics["grad_norm"] = optax.global_norm(grads)
    return TrainState(params, opt_state, state.step + 1), metrics
