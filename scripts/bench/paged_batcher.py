"""Paged vs dense batched decode on the real chip (serve-layer cache).

Steady-state S-slot decode throughput at 8 full-width (3584) layers —
the serve benchmark configuration BENCH_NOTES uses for batcher numbers —
comparing the dense per-slot cache (models/generate.py DecodeState) with
the paged pool (models/paged_kv.py + kernels/paged_attention.py), and
demonstrating the capacity win: the paged pool serves the same slots from
a fraction of the dense HBM when budgets are heterogeneous.

One process per run (remote-compile tunnel discipline): the dense and
paged modes are separate invocations.

Usage: python scripts/bench/paged_batcher.py dense|paged [--slots 8]
       [--cache-len 4096] [--chunk 256] [--int8] [--layers 28 --w-int8]

--layers 28 --w-int8 measures the FLAGSHIP depth (Qwen2-7B, int8
weights): batched serving throughput at the production configuration.
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
import jax.numpy as jnp  # noqa: E402


def make_cfg(layers=8):
    from video3d_tpu.config import ModelConfig

    cfg = ModelConfig()
    return dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, num_hidden_layers=layers))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["dense", "paged"])
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--cache-len", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--layers", type=int, default=8,
                    help="decoder depth; 28 = flagship Qwen2-7B depth")
    ap.add_argument("--w-int8", action="store_true",
                    help="int8-quantize the decoder weights (required to "
                         "fit 28 layers + cache on one v5e chip)")
    ap.add_argument("--page", type=int, default=128,
                    help="page size (tokens); larger pages amortize the "
                         "per-page program overhead at long contexts")
    ap.add_argument("--full-grid", action="store_true",
                    help="A/B: force the r3 (B*KV, maxp) grid instead of "
                         "the r4 ragged live-page worklist")
    ap.add_argument("--long-slots", type=int, default=1,
                    help="slots at ~cache-len live length (the rest sit at "
                         "512): 1 = the classic one-long mix, --slots = "
                         "every slot long (the 32k-cache regime where KV "
                         "streaming, not weights, dominates decode — "
                         "VERDICT r3 #3)")
    a = ap.parse_args()

    from video3d_tpu.kernels import paged_attention as _pa
    from video3d_tpu.models import generate, qwen2

    _pa.RAGGED_GRID = not a.full_grid

    cfg = make_cfg(a.layers)
    if a.w_int8:
        # layer-by-layer on-device int8 build (full_depth.py helper): peak
        # transient HBM one bf16 layer, residency ~6.6 GB at 28 layers
        from full_depth import init_full_depth_llm_int8

        params = {"llm": init_full_depth_llm_int8(cfg, jax.random.PRNGKey(0))}
    else:
        params = {"llm": qwen2.init_qwen2(jax.random.PRNGKey(0), cfg.llm,
                                          dtype=jnp.bfloat16)}
    S, page = a.slots, a.page
    cache_dtype = jnp.int8 if a.int8 else jnp.bfloat16
    # heterogeneous live lengths: one long context, the rest short — the
    # serving mix paging exists for
    lens = np.full((S,), 512, np.int32)
    lens[:max(1, a.long_slots)] = a.cache_len - a.chunk - 8
    print(f"devices: {jax.devices()}  lens={lens.tolist()}", flush=True)

    if a.mode == "dense":
        state = generate.empty_decode_state(cfg, S, a.cache_len,
                                            cache_dtype=cache_dtype)
        state = state._replace(pos=jnp.asarray(lens),
                               done=jnp.zeros((S,), bool),
                               next_logits=jnp.zeros_like(state.next_logits))
        cache_gib = sum(x.size * x.dtype.itemsize
                        for x in [state.cache.k, state.cache.v]) / 2**30
        step = lambda st: generate.decode_chunk(
            params, cfg, st, chunk=a.chunk, eos_token_id=-1)
    else:
        from video3d_tpu.models.paged_kv import (PageAllocator,
                                                 pages_needed,
                                                 set_slot_pages)

        max_pages = a.cache_len // page
        # pool sized for the ACTUAL mix (+chunk growth), not S x cache_len
        total = 1 + sum(pages_needed(int(l) + a.chunk + 8, page)
                        for l in lens)
        state = generate.empty_paged_state(cfg, S, total, page, max_pages,
                                           cache_dtype=cache_dtype)
        alloc = PageAllocator(total)
        cache = state.cache
        for s in range(S):
            n = pages_needed(int(lens[s]) + a.chunk + 8, page)
            cache = set_slot_pages(cache, s, alloc.alloc(n))
        cache = cache._replace(lens=jnp.asarray(lens))
        state = state._replace(cache=cache, done=jnp.zeros((S,), bool),
                               next_logits=jnp.zeros_like(state.next_logits))
        cache_gib = sum(x.size * x.dtype.itemsize
                        for x in [cache.k, cache.v]) / 2**30
        dense_gib = cache_gib * (S * max_pages) / total
        print(f"pool {total} pages = {cache_gib:.3f} GiB "
              f"(dense rows would be {dense_gib:.3f} GiB)", flush=True)
        step = lambda st: generate.paged_decode_chunk(
            params, cfg, st, chunk=a.chunk, eos_token_id=-1)

    print("compiling decode chunk...", flush=True)
    state, toks = step(state)
    _ = np.asarray(toks)[0, -1]           # sync
    t0 = time.perf_counter()
    state, toks = step(state)
    _ = np.asarray(toks)[0, -1]
    dt = time.perf_counter() - t0
    tok_s = S * a.chunk / dt
    print(json.dumps({
        "mode": f"{a.mode}{'_int8' if a.int8 else ''}"
                f"{'_w8' if a.w_int8 else ''}_{a.layers}L"
                f"_c{a.cache_len}_long{a.long_slots}"
                f"{'_fullgrid' if a.full_grid else ''}",
        "slots": S, "chunk": a.chunk,
        "ms_per_step": round(1e3 * dt / a.chunk, 3),
        "tok_per_s_total": round(tok_s, 1),
        "kv_hbm_gib": round(cache_gib, 3),
    }))


if __name__ == "__main__":
    main()
