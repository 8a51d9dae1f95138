"""AOT per-device HBM analysis of the FULL 7B train step on a v5e-8-shaped
mesh — feasibility by compilation, not hope (VERDICT r1 #8).

Compiles (never executes) the production-scale training step — 28-layer /
3584-wide Qwen2 + 26-layer SigLIP-so400m, bf16 params, AdamW with
param-group LRs, remat + chunked CE — over an 8-device virtual mesh with
the v5e-8 recipe's sharding (ZeRO-3-equivalent fsdp=8, the reference's
scripts/3d/train/train_multi.sh DeepSpeed stage-3 setup), and prints XLA's
buffer-assignment numbers PER DEVICE. ``xla_force_host_platform_device_
count=8`` gives real GSPMD partitioning, so argument/temp sizes are the
sharded per-device footprints to compare against the 16 GB v5e HBM.

Weights never exist: everything is jax.eval_shape + AOT lower/compile.

Usage: python scripts/bench/train_memory_v5e8.py [--seq-len 8192] [--dp 1]
"""

import argparse
import functools
import json
import os
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq-len", type=int, default=8192)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--per-device-batch", type=int, default=1)
    ap.add_argument("--layers", type=int, default=0,
                    help="override LLM depth (0 = production 28) — for "
                         "probing whether peak temp scales with params")
    ap.add_argument("--stage", choices=["full", "grad", "loss"],
                    default="full",
                    help="bisect peak-memory ownership: loss = fwd only, "
                         "grad = fwd+bwd, full = + optimizer update")
    ap.add_argument("--no-scan", action="store_true",
                    help="unrolled layer loop instead of scan-over-layers")
    ap.add_argument("--master-dtype", default="bfloat16",
                    choices=("bfloat16", "float32"),
                    help="param storage dtype; float32 = the trainer "
                         "default (f32 master weights cast to bf16 at use "
                         "— train_step.cast_to_compute); bfloat16 = the "
                         "legacy pure-bf16 state")
    a = ap.parse_args()

    from video3d_tpu.config import ModelConfig
    from video3d_tpu.models import llava_video3d as lv3d
    from video3d_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                           param_shardings, replicated)
    from video3d_tpu.train.optim import OptimConfig, build_optimizer
    from video3d_tpu.train.train_step import create_train_state, train_step
    import __graft_entry__ as ge

    cfg = ModelConfig()                       # full production scale
    if a.layers:
        import dataclasses
        cfg = dataclasses.replace(cfg, llm=dataclasses.replace(
            cfg.llm, num_hidden_layers=a.layers))
    mesh = create_mesh(dp=a.dp, tp=a.tp)      # fsdp fills the rest (8/dp/tp)
    B = a.per_device_batch * mesh.shape["dp"] * mesh.shape["fsdp"]
    L, V = a.seq_len, a.frames
    print(f"mesh {dict(mesh.shape)}  B={B} L={L} V={V}", flush=True)

    # ---- shapes only: params -> optimizer state -> train state ----
    master = jnp.float32 if a.master_dtype == "float32" else jnp.bfloat16
    cdt = jnp.bfloat16 if master is jnp.float32 else None
    p_shapes = jax.eval_shape(
        lambda k: lv3d.init_model(k, cfg, dtype=master),
        jax.random.PRNGKey(0))
    tx = build_optimizer(p_shapes, OptimConfig(total_steps=100))
    s_shapes = jax.eval_shape(lambda p: create_train_state(p, tx), p_shapes)

    p_sh = param_shardings(p_shapes, mesh)

    def _opt_shardings(opt_state):
        # optimizer moments mirror the param SHAPES (dtypes differ: the
        # optimizer carries f32 and bf16 moment sets) -> reuse the param
        # sharding rules by shape lookup; scalars/counters replicate
        flat_p = jax.tree.leaves(p_shapes)
        flat_psh = jax.tree.leaves(p_sh, is_leaf=lambda x: hasattr(x, "spec"))
        shape_to_sh = {}
        for ps, sh in zip(flat_p, flat_psh):
            shape_to_sh.setdefault(ps.shape, sh)

        def pick(leaf):
            if leaf.ndim == 0:
                return replicated(mesh)
            return shape_to_sh.get(leaf.shape, replicated(mesh))

        return jax.tree.map(pick, opt_state)

    s_sh = type(s_shapes)(params=p_sh,
                          opt_state=_opt_shardings(s_shapes.opt_state),
                          step=replicated(mesh))

    batch_shapes = jax.eval_shape(
        lambda: ge._make_batch(cfg, B=B, V=V, L=L))
    b_sh = jax.tree.map(
        lambda l: (batch_sharding(mesh, l.ndim)
                   if l.ndim >= 1 and l.shape[0] == B else replicated(mesh)),
        batch_shapes)

    def put_sharding(shapes, shardings):
        return jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            shapes, shardings,
            is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct))

    s_in = put_sharding(s_shapes, s_sh)
    b_in = put_sharding(batch_shapes, b_sh)

    from video3d_tpu.train.train_step import loss_fn

    scan = not a.no_scan
    if a.stage == "full":
        step = functools.partial(train_step, cfg=cfg, tx=tx, remat=True,
                                 force_chunked_ce=True, scan_layers=scan,
                                 compute_dtype=cdt)
        fn, args = step, (s_in, b_in)
    elif a.stage == "grad":
        def grad_step(params, batch):
            return jax.value_and_grad(loss_fn, has_aux=True)(
                params, cfg, batch, True, True, scan, cdt)
        fn, args = grad_step, (s_in.params, b_in)
    else:
        def loss_step(params, batch):
            return loss_fn(params, cfg, batch, True, True, scan, cdt)
        fn, args = loss_step, (s_in.params, b_in)
    print(f"lowering + compiling stage={a.stage} scan={scan} "
          "(28L + so400m, remat, chunked CE)...", flush=True)
    with mesh:
        compiled = jax.jit(fn).lower(*args).compile()
    m = compiled.memory_analysis()
    gib = lambda x: round(x / 2 ** 30, 2)
    out = {
        "mesh": dict(mesh.shape), "B": B, "L": L, "V": V,
        "per_device": {
            "arguments_gib": gib(m.argument_size_in_bytes),
            "temp_gib": gib(m.temp_size_in_bytes),
            "output_gib": gib(m.output_size_in_bytes),
            "alias_gib": gib(m.alias_size_in_bytes),
            "peak_gib": gib(m.peak_memory_in_bytes),
        },
        "hbm_budget_gib": 16,
        # CPU semantics (probed): temp_size counts every allocation WITHOUT
        # reuse (useless for feasibility); peak_memory is the
        # liveness-aware high-water mark of TEMPS ONLY (arguments
        # excluded). Live set = arguments + peak. NOTE the CPU scheduler is
        # ~7x more temp-hungry than real TPU buffer assignment on the
        # identical program (measured probe, BENCH_NOTES "Full 7B
        # train-step memory") — this bound is pessimistic.
        "cpu_accounted_live_gib": gib(m.argument_size_in_bytes
                                      + m.peak_memory_in_bytes),
        "fits_v5e_cpu_pessimistic": gib(m.argument_size_in_bytes
                                        + m.peak_memory_in_bytes) < 16,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
