"""DPO (Direct Preference Optimization) loss + training step.

Covers the reference's optional DPO stage (train_dpo.py + the vendored trl
DPOTrainer, SURVEY.md T6): sigmoid-DPO on chosen/rejected response pairs
with a frozen reference policy,
  L = -log sigmoid(beta * ((pi_c - ref_c) - (pi_r - ref_r)))
where each term is the sum of response-token log-probs (label_pad masked).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from video3d_tpu.config import ModelConfig
from video3d_tpu.constants import IGNORE_INDEX
from video3d_tpu.models import llava_video3d as lv3d


@dataclasses.dataclass(frozen=True)
class DPOConfig:
    beta: float = 0.1
    label_smoothing: float = 0.0


def sequence_logprob(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """(B, L, V) logits + (B, L) labels -> (B,) summed response log-probs
    over supervised (non-IGNORE) positions, shifted next-token style."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    mask = shift_labels != IGNORE_INDEX
    safe = jnp.where(mask, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return (tok * mask).sum(axis=-1)


def dpo_loss(policy_chosen_lp: jax.Array, policy_rejected_lp: jax.Array,
             ref_chosen_lp: jax.Array, ref_rejected_lp: jax.Array,
             cfg: DPOConfig) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Sigmoid DPO (Rafailov et al. 2023), trl-compatible semantics."""
    chosen_ratio = policy_chosen_lp - ref_chosen_lp
    rejected_ratio = policy_rejected_lp - ref_rejected_lp
    logits = cfg.beta * (chosen_ratio - rejected_ratio)
    loss = (-jax.nn.log_sigmoid(logits) * (1 - cfg.label_smoothing)
            - jax.nn.log_sigmoid(-logits) * cfg.label_smoothing).mean()
    metrics = {
        "dpo_loss": loss,
        "reward_accuracy": (logits > 0).mean(),
        "reward_margin": (cfg.beta * (chosen_ratio - rejected_ratio)).mean(),
    }
    return loss, metrics


def dpo_step_loss(params, ref_params, model_cfg: ModelConfig,
                  chosen: lv3d.Batch, rejected: lv3d.Batch,
                  dpo_cfg: DPOConfig, remat: bool = True):
    """Full multimodal DPO loss for one (chosen, rejected) batch pair."""
    pc = sequence_logprob(lv3d.forward(params, model_cfg, chosen, remat=remat),
                          chosen.labels)
    pr = sequence_logprob(lv3d.forward(params, model_cfg, rejected, remat=remat),
                          rejected.labels)
    rc = sequence_logprob(
        lv3d.forward(jax.lax.stop_gradient(ref_params), model_cfg, chosen,
                     remat=remat), chosen.labels)
    rr = sequence_logprob(
        lv3d.forward(jax.lax.stop_gradient(ref_params), model_cfg, rejected,
                     remat=remat), rejected.labels)
    return dpo_loss(pc, pr, rc, rr, dpo_cfg)


@functools.partial(jax.jit, static_argnames=("model_cfg", "dpo_cfg", "tx",
                                             "remat", "compute_dtype"),
                   donate_argnums=(0,))
def dpo_train_step(state, ref_params, batch_pair, model_cfg: ModelConfig,
                   dpo_cfg: DPOConfig, tx: optax.GradientTransformation,
                   remat: bool = True, compute_dtype=None):
    """``compute_dtype=jnp.bfloat16`` with f32 ``state.params`` keeps f32
    master weights while computing in bf16 (train_step.cast_to_compute)."""
    chosen, rejected = batch_pair

    if compute_dtype is not None:
        # the frozen reference forward must run in the SAME compute dtype
        # as the policy: f32 ref params would give dtype-inconsistent
        # chosen/rejected logratios vs the bf16 policy plus ~2x ref-forward
        # time/HBM
        from video3d_tpu.train.train_step import cast_to_compute
        ref_params = cast_to_compute(ref_params, compute_dtype)

    def lf(p):
        if compute_dtype is not None:
            from video3d_tpu.train.train_step import cast_to_compute
            p = cast_to_compute(p, compute_dtype)
        return dpo_step_loss(p, ref_params, model_cfg, chosen, rejected,
                             dpo_cfg, remat)

    (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    from video3d_tpu.train.train_step import TrainState

    return TrainState(params, opt_state, state.step + 1), metrics
