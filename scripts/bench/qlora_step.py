"""QLoRA train step at FULL 7B depth on ONE 16 GB v5e chip.

The reference's equivalent recipe (train_3d.py:1588-1657: bitsandbytes
bits-4/8 + lora_enable -> PEFT) cannot run a 7B full fine-tune on one
16 GB device either — QLoRA is the single-accelerator fine-tuning story.
Here: 28-layer/3584 Qwen2 with int8 weight-only base (frozen; built
layer-by-layer on device like full_depth.py), f32-master LoRA factors
cast to bf16 at use, remat forward, chunked CE, AdamW over the adapters
only. A bf16 full train step needs ~71 GB of params+moments (BENCH_NOTES
"Full 7B train-step memory") — this runs in <16 GB.

Timing methodology (CLAUDE.md / .claude/skills/verify): steps chained
through the carried (lora, opt) state inside one on-device
``lax.fori_loop``; the token inputs are perturbed by the loop index so XLA
cannot hoist anything; one scalar fetch at the end.

Usage: python scripts/bench/qlora_step.py [--rank 64] [--seq 2048]
           [--steps 8] [--batch 1] [--lr 1e-4]
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[2] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

import os as _os  # noqa: E402

from video3d_tpu.kernels import flash_attention as _fa  # noqa: E402

_fa.FA_BLOCK_Q = int(_os.environ.get("V3D_FA_BLOCK_Q", _fa.FA_BLOCK_Q))
_fa.FA_BLOCK_K = int(_os.environ.get("V3D_FA_BLOCK_K", _fa.FA_BLOCK_K))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--bits", type=int, default=8, choices=(8, 4),
                    help="frozen-base quantization (4 halves base HBM "
                         "again -> headroom for longer L / bigger B)")
    ap.add_argument("--cpu", action="store_true",
                    help="harness smoke test: CPU + V3D_BENCH_TINY config")
    a = ap.parse_args()

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")

    from full_depth import _full_cfg, init_full_depth_llm_int8
    from video3d_tpu.models import llava_video3d as lv3d
    from video3d_tpu.models import qwen2
    from video3d_tpu.train.lora import LoraConfig, apply_lora, init_lora, lora_size
    from video3d_tpu.train.qlora import check_qlora_base
    from video3d_tpu.train.train_step import cast_to_compute

    print("devices:", jax.devices())
    cfg = _full_cfg()
    if a.layers != cfg.llm.num_hidden_layers:
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, num_hidden_layers=a.layers))

    t0 = time.time()
    qllm = init_full_depth_llm_int8(cfg, jax.random.PRNGKey(0), bits=a.bits)
    qparams = {"llm": qllm}
    check_qlora_base(qparams)
    print(f"int{a.bits} base built in {time.time() - t0:.1f}s")

    lcfg = LoraConfig(r=a.rank, alpha=2 * a.rank)
    lora = init_lora(jax.random.PRNGKey(1), qparams, lcfg, dtype=jnp.float32)
    n_lora = lora_size(lora)
    print(f"LoRA params: {n_lora / 1e6:.1f} M (r={a.rank})")

    tx = optax.adamw(a.lr)
    opt = tx.init(lora)

    B, L = a.batch, a.seq
    rng = np.random.default_rng(0)
    ids0 = jnp.asarray(rng.integers(10, cfg.llm.vocab_size - 10, (B, L)),
                       jnp.int32)

    def loss_fn(lo, qp, ids):
        lo = cast_to_compute(lo, jnp.bfloat16)
        merged = apply_lora(qp, lo, lcfg)
        x = qwen2.embed_tokens(merged["llm"], ids)
        pos = jnp.broadcast_to(jnp.arange(L)[None, :, None], (B, L, 3))
        h, _ = qwen2.qwen2_forward(merged["llm"], cfg.llm, x,
                                   pos.astype(jnp.int32), remat=True)
        return lv3d.chunked_language_model_loss(merged, h, ids, chunk=512)

    def one_step(lo, op, qp, ids):
        loss, grads = jax.value_and_grad(loss_fn)(lo, qp, ids)
        updates, op = tx.update(grads, op, lo)
        lo = optax.apply_updates(lo, updates)
        return lo, op, loss

    # qparams rides as an ARGUMENT (not a closure): closed-over trees are
    # baked into the program as constants — 8 GB of them here, which both
    # doubles HBM and stalls the remote compile.
    @jax.jit
    def run(lo, op, qp, ids):
        def body(i, carry):
            lo, op, _ = carry
            # perturb tokens by the loop index: no hoisting possible
            ids_i = (ids + i) % (cfg.llm.vocab_size - 10)
            return one_step(lo, op, qp, ids_i)

        return jax.lax.fori_loop(0, a.steps, body,
                                 (lo, op, jnp.zeros((), jnp.float32)))

    print(f"compiling QLoRA step ({a.layers}L int8 base, r={a.rank}, "
          f"B={B}, L={L}, remat + chunked CE)...")
    t0 = time.time()
    lora, opt, loss = run(lora, opt, qparams, ids0)
    first = float(loss)
    t_first = time.time() - t0

    t0 = time.time()
    lora, opt, loss = run(lora, opt, qparams, ids0)
    _ = float(loss)
    wall = time.time() - t0
    ms = wall / a.steps * 1000.0
    tok_s = B * L / (wall / a.steps)

    stats = jax.local_devices()[0].memory_stats() or {}
    peak_gib = stats.get("peak_bytes_in_use", 0) / 2**30
    print(json.dumps({
        "mode": f"qlora_{a.layers}L_int{a.bits}_r{a.rank}",
        "B": B, "L": L, "steps": a.steps,
        "ms_per_step": round(ms, 1),
        "tok_per_s": round(tok_s, 1),
        "lora_params_m": round(n_lora / 1e6, 1),
        "loss_first_call": round(first, 3),
        "loss_second_call": round(float(loss), 3),
        "peak_hbm_gib": round(peak_gib, 2),
        "first_call_s": round(t_first, 1),
    }))


if __name__ == "__main__":
    main()
