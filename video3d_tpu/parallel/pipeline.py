"""Pipeline parallelism: a GPipe-schedule decoder over the ``pp`` mesh axis.

TPU-native replacement for DeepSpeed/Megatron pipeline stages (the reference
scales only with ZeRO-3 data parallelism — zero_3.json via train_multi.sh —
and has no pipeline axis at all; this goes beyond it for pod-scale runs
where a 7B+ decoder's layers don't fit one slice's HBM alongside long-context
activations).

Design (shard_map + ppermute, the scaling-book recipe):
  * the per-layer parameter pytrees are stacked on a leading layer axis and
    sharded over ``pp`` — each stage holds ``n_layers / pp`` layers at rest,
    no gathering ever happens;
  * inside one ``shard_map``, every stage runs the same program: at tick
    ``t`` stage ``s`` runs its layer block (a ``lax.scan`` over its local
    layers) on microbatch ``m = t - s``, then hands its activation to stage
    ``s+1`` with a single ``lax.ppermute`` hop — on hardware that is one
    neighbour ICI/DCN transfer, not a collective;
  * the classic GPipe bubble: ``M + pp - 1`` ticks for ``M`` microbatches
    (efficiency M / (M + pp - 1)); bubble ticks compute on clipped dummy
    data and their writes are masked out;
  * outputs accumulate on the last stage only and are replicated with one
    ``psum`` at the end (out_specs keep the batch dim sharded over dp/fsdp).

Everything is differentiable (``jax.grad`` flows through ``ppermute`` as the
reverse permutation), so the same function serves training.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video3d_tpu.parallel.mesh import active_mesh


def stack_layer_params(layers) -> Any:
    """[per-layer pytree, ...] -> one pytree with a leading layer axis.

    Requires homogeneous layers (same keys/shapes — true for the dense Qwen2
    stack; MoE/quantized mixes must keep the sequential path).
    """
    first = jax.tree.structure(layers[0])
    for lp in layers[1:]:
        assert jax.tree.structure(lp) == first, \
            "pipeline stages need homogeneous layers"
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked) -> list:
    """Inverse of :func:`stack_layer_params`."""
    n = jax.tree.leaves(stacked)[0].shape[0]
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n)]


def shard_stacked_layers(stacked, mesh: Mesh, rules: bool = False,
                         prefix: str = "llm/layers/0"):
    """Device-put a stacked layer tree with the layer axis over ``pp``.

    ``rules=True`` additionally shards the per-layer dims by the
    _PARAM_RULES specs (fsdp on input dims, tp on head/hidden dims) — for
    the partial-auto pipeline (``pipeline_decoder(auto_axes=True)``) where
    GSPMD manages fsdp/tp inside the pp-manual shard_map. Axes that don't
    divide a dim (or have mesh size 1) fall back to replication."""
    if not rules:
        return jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P("pp", *([None] * (x.ndim - 1))))),
            stacked)
    from video3d_tpu.parallel.mesh import param_spec

    def build(tree, pfx):
        if isinstance(tree, dict):
            return {k: build(v, f"{pfx}/{k}") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            out = [build(v, f"{pfx}/{i}") for i, v in enumerate(tree)]
            return type(tree)(out) if isinstance(tree, tuple) else out
        spec = param_spec(pfx, tree.ndim - 1)
        fixed = ["pp"]
        for i, ax in enumerate(spec):
            ok = (ax is not None and mesh.shape.get(ax, 1) > 1
                  and tree.shape[i + 1] % mesh.shape[ax] == 0)
            fixed.append(ax if ok else None)
        return jax.device_put(tree, NamedSharding(mesh, P(*fixed)))

    return build(stacked, prefix)


def pipeline_decoder(stacked_layers, cfg, embeds: jax.Array,
                     cos: jax.Array, sin: jax.Array,
                     kv_len: Optional[jax.Array] = None,
                     n_microbatches: int = 2,
                     remat: bool = False,
                     mesh: Optional[Mesh] = None,
                     auto_axes: Optional[bool] = None) -> jax.Array:
    """Run the decoder layer stack as a ``pp``-stage GPipe pipeline.

    Args:
      stacked_layers: layer params stacked on a leading axis (layer count
        must divide by the mesh's ``pp`` size).
      embeds: (B, L, D); cos/sin: (B, L, hd) precomputed rotary tables;
        kv_len: optional (B,) true lengths (right padding).
      n_microbatches: GPipe M. The per-stage local batch must divide by it.
      auto_axes: partial-manual mode — shard_map is MANUAL over ``pp``
        only (the ppermute hop + stage indexing), while dp/fsdp/tp stay
        AUTO: GSPMD shards the batch over (dp, fsdp) and inserts the
        Megatron-style tensor-parallel collectives for tp-sharded layer
        weights (shard via ``shard_stacked_layers(rules=True)``) inside
        the stage body. This is how pp composes with tp>1 — the fully
        manual path would need hand-written psums in decoder_layer.
        Default: True iff the mesh has tp > 1.
    Returns:
      (B, L, D) hidden states (pre final-norm), batch sharded as the input.
    """
    from video3d_tpu.kernels.attention import manual_sharding
    from video3d_tpu.models.qwen2 import decoder_layer

    mesh = mesh or active_mesh()
    assert mesh is not None and mesh.shape.get("pp", 1) > 1, \
        "pipeline_decoder needs an ambient mesh with pp > 1"
    S = mesh.shape["pp"]
    n_layers = jax.tree.leaves(stacked_layers)[0].shape[0]
    assert n_layers % S == 0, \
        f"{n_layers} layers do not split evenly over {S} pipeline stages"
    M = n_microbatches
    if auto_axes is None:
        auto_axes = mesh.shape.get("tp", 1) > 1

    if auto_axes:
        # manual over pp only; batch stays LOGICALLY global in the body
        # (physically sharded over dp/fsdp by GSPMD), layer weights keep
        # their fsdp/tp shardings and XLA inserts the tp collectives.
        batch_axes = None
    else:
        batch_axes = tuple(a for a in ("dp", "fsdp")
                           if mesh.shape.get(a, 1) > 1) or None
    bspec3 = P(batch_axes, None, None)
    layer_spec = jax.tree.map(
        lambda x: P("pp", *([None] * (x.ndim - 1))), stacked_layers)

    layer_fn = decoder_layer
    if remat:
        layer_fn = jax.checkpoint(
            functools.partial(decoder_layer, prefill=False),
            static_argnums=(4,),
            policy=jax.checkpoint_policies.nothing_saveable)

    def body(layers_local, x, cos_, sin_, lens):
        # x: (B_local, L, D) -> microbatches (M, B_local/M, L, D)
        Bl, L, D = x.shape
        assert Bl % M == 0, \
            f"per-stage batch {Bl} does not split into {M} microbatches"
        mbs = x.reshape(M, Bl // M, L, D)
        cos_mb = cos_.reshape(M, Bl // M, *cos_.shape[1:])
        sin_mb = sin_.reshape(M, Bl // M, *sin_.shape[1:])
        len_mb = lens.reshape(M, Bl // M)

        stage = jax.lax.axis_index("pp")
        is_last = stage == S - 1

        def run_stage(x_mb, cos_i, sin_i, len_i):
            def one_layer(h, lp):
                if remat:
                    h, _ = layer_fn(lp, h, cos_i, sin_i, cfg, None, None,
                                    len_i, None)
                else:
                    h, _ = layer_fn(lp, h, cos_i, sin_i, cfg, kv_len=len_i)
                return h, None

            with manual_sharding():
                out, _ = jax.lax.scan(one_layer, x_mb, layers_local)
            return out

        def tick(carry, t):
            state, outputs = carry
            m = jnp.clip(t - stage, 0, M - 1)       # my microbatch this tick
            valid = (t - stage >= 0) & (t - stage < M)
            inp = jnp.where(stage == 0, mbs[m], state)
            out = run_stage(inp, cos_mb[m], sin_mb[m], len_mb[m])
            keep = jnp.where(is_last & valid, out, outputs[m])
            outputs = outputs.at[m].set(keep)
            nxt = jax.lax.ppermute(out, "pp",
                                   [(i, (i + 1) % S) for i in range(S)])
            return (nxt, outputs), None

        outputs0 = jnp.zeros_like(mbs)
        (_, outputs), _ = jax.lax.scan(
            tick, (jnp.zeros_like(mbs[0]), outputs0),
            jnp.arange(M + S - 1))
        # only the last stage wrote real values; replicate across pp
        outputs = jax.lax.psum(
            jnp.where(is_last, outputs, jnp.zeros_like(outputs)), "pp")
        return outputs.reshape(Bl, L, D)

    B = embeds.shape[0]
    lens = kv_len if kv_len is not None else \
        jnp.full((B,), embeds.shape[1], jnp.int32)
    kwargs = dict(mesh=mesh, check_vma=False)
    if auto_axes:
        kwargs["axis_names"] = frozenset({"pp"})
    return jax.shard_map(
        body,
        in_specs=(layer_spec, bspec3, bspec3, bspec3, P(batch_axes)),
        out_specs=bspec3,
        **kwargs)(stacked_layers, embeds, cos, sin, lens)


def qwen2_forward_pp(params: Dict, cfg, inputs_embeds: jax.Array,
                     position_ids: jax.Array,
                     kv_len: Optional[jax.Array] = None,
                     n_microbatches: int = 2,
                     remat: bool = False,
                     mesh: Optional[Mesh] = None,
                     auto_axes: Optional[bool] = None) -> jax.Array:
    """Pipeline-parallel equivalent of ``qwen2.qwen2_forward`` (training /
    prefill path: no KV cache). Returns final-normed hidden states."""
    from video3d_tpu.models.qwen2 import compute_mrope_cos_sin, rms_norm

    cos, sin = compute_mrope_cos_sin(position_ids, cfg)
    if cfg.embed_scale:
        inputs_embeds = inputs_embeds * jnp.asarray(
            cfg.hidden_size ** 0.5, inputs_embeds.dtype)
    stacked = params["layers"] if not isinstance(params["layers"], list) \
        else stack_layer_params(params["layers"])
    x = pipeline_decoder(stacked, cfg, inputs_embeds, cos, sin,
                         kv_len=kv_len, n_microbatches=n_microbatches,
                         remat=remat, mesh=mesh, auto_axes=auto_axes)
    return rms_norm(x, params["norm"], cfg.rms_norm_eps,
                    cfg.rms_norm_add_unit_offset)
