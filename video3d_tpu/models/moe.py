"""Qwen2-MoE decoder blocks (sparse SwiGLU experts + shared expert).

Covers the reference's ``llava_qwen_moe`` wrapper (SURVEY.md M9), which runs
HF Qwen2MoeForCausalLM under the LLaVA mixin. Architecture (HF qwen2_moe):
a router linear D -> E scores tokens, top-k probs are softmax-renormalized
over the selected experts (``norm_topk_prob``), each expert is a SwiGLU MLP
with ``moe_intermediate_size``, plus a shared SwiGLU expert gated by
``sigmoid(shared_gate(x))``.

TPU-first formulation: expert weights are stacked (E, D, I) so the whole
expert bank is one einsum — the expert dimension shards over the mesh's
``ep`` axis (parallel/mesh.py) and routing becomes a dense (T, E) weight
matrix (zero for unrouted experts). Dense compute over all experts is exact
and collective-free along ep; capacity-based dispatch kernels are a
later-round optimization for very large E.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from video3d_tpu.config import LLMConfig, MoEConfig

Params = Dict[str, Any]


def _swiglu(x, w_gate, w_up, w_down):
    return (jax.nn.silu(x @ w_gate) * (x @ w_up)) @ w_down


def moe_block(p: Params, x: jax.Array, cfg: MoEConfig) -> jax.Array:
    """x: (B, L, D) -> (B, L, D).

    p: {router (D, E), experts: {w_gate (E, D, I), w_up (E, D, I),
        w_down (E, I, D)}, shared: {w_gate, w_up, w_down (2D)},
        shared_gate (D, 1)}
    """
    B, L, D = x.shape
    xt = x.reshape(-1, D)                                    # (T, D)
    logits = (xt @ p["router"]).astype(jnp.float32)          # (T, E)
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        topv = topv / topv.sum(axis=-1, keepdims=True)
    # dense (T, E) routing weights, zero where unrouted
    weights = jnp.zeros_like(probs)
    weights = jax.vmap(lambda w, i, v: w.at[i].set(v))(weights, topi, topv)
    weights = weights.astype(x.dtype)

    # all-experts einsum; ep-shardable on the E dimension
    gate = jnp.einsum("td,edi->tei", xt, p["experts"]["w_gate"])
    up = jnp.einsum("td,edi->tei", xt, p["experts"]["w_up"])
    expert_out = jnp.einsum("tei,eid->ted", jax.nn.silu(gate) * up,
                            p["experts"]["w_down"])          # (T, E, D)
    routed = jnp.einsum("te,ted->td", weights, expert_out)

    if "shared" in p:          # Qwen2-MoE; Mixtral has no shared expert
        shared = _swiglu(xt, p["shared"]["w_gate"], p["shared"]["w_up"],
                         p["shared"]["w_down"])
        routed = routed + shared * jax.nn.sigmoid(xt @ p["shared_gate"])
    return routed.reshape(B, L, D)


def init_moe_block(key: jax.Array, llm: LLMConfig, cfg: MoEConfig,
                   dtype=jnp.float32) -> Params:
    D, I = llm.hidden_size, cfg.moe_intermediate_size
    S = cfg.shared_expert_intermediate_size
    E = cfg.num_experts
    ks = jax.random.split(key, 8)

    def w(k, *shape):
        return 0.02 * jax.random.normal(k, shape, dtype)

    out = {
        "router": w(ks[0], D, E),
        "experts": {
            "w_gate": w(ks[1], E, D, I),
            "w_up": w(ks[2], E, D, I),
            "w_down": w(ks[3], E, I, D),
        },
    }
    if S is not None:          # Mixtral-style blocks have no shared expert
        out["shared"] = {
            "w_gate": w(ks[4], D, S),
            "w_up": w(ks[5], D, S),
            "w_down": w(ks[6], S, D),
        }
        out["shared_gate"] = w(ks[7], D, 1)
    return out


def convert_moe_layer(state, layer_idx: int, cfg: MoEConfig,
                      prefix: str = "", dtype=jnp.float32) -> Params:
    """HF Qwen2MoeForCausalLM layer mlp -> moe_block pytree."""
    import numpy as np

    from video3d_tpu.models.weights import _to_np

    p = f"{prefix}model.layers.{layer_idx}.mlp."
    g = lambda k: _to_np(state[p + k])

    def stack(name):
        return jnp.asarray(np.stack([
            g(f"experts.{e}.{name}.weight").T for e in range(cfg.num_experts)
        ]), dtype)

    return {
        "router": jnp.asarray(g("gate.weight").T, dtype),
        "experts": {
            "w_gate": stack("gate_proj"),
            "w_up": stack("up_proj"),
            "w_down": stack("down_proj"),
        },
        "shared": {
            "w_gate": jnp.asarray(g("shared_expert.gate_proj.weight").T, dtype),
            "w_up": jnp.asarray(g("shared_expert.up_proj.weight").T, dtype),
            "w_down": jnp.asarray(g("shared_expert.down_proj.weight").T, dtype),
        },
        "shared_gate": jnp.asarray(g("shared_expert_gate.weight").T, dtype),
    }


def convert_mixtral_layer(state, layer_idx: int, cfg: MoEConfig,
                          prefix: str = "", dtype=jnp.float32) -> Params:
    """HF MixtralForCausalLM layer block_sparse_moe -> moe_block pytree.

    Mixtral (reference llava_mixtral wrapper): w1=gate, w3=up, w2=down,
    softmax-then-top-k routing renormalized over the selected experts
    (norm_topk_prob=True in our MoEConfig), no shared expert.
    """
    import numpy as np

    from video3d_tpu.models.weights import _to_np

    p = f"{prefix}model.layers.{layer_idx}.block_sparse_moe."
    g = lambda k: _to_np(state[p + k])

    def stack(name):
        return jnp.asarray(np.stack([
            g(f"experts.{e}.{name}.weight").T for e in range(cfg.num_experts)
        ]), dtype)

    return {
        "router": jnp.asarray(g("gate.weight").T, dtype),
        "experts": {
            "w_gate": stack("w1"),
            "w_up": stack("w3"),
            "w_down": stack("w2"),
        },
    }
