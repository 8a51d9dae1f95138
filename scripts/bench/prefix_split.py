"""Split-stage probe for the V=32 scene-prefix suffix prefill (r3).

The prefix steady state costs ~22 ms/question at B=1 and ~18 ms/question
at B=8 (flagship32.py prefix / grounding.py prefix) — far above the
bandwidth floor (int8 weights 6.6 GiB ~ 8 ms, amortized over B). This
probe times the two halves of start_decode_prefix separately on chip:

  alloc    KVCache.zeros(mcl) + _write_prefix broadcast copy only.
  forward  the 64-token suffix forward over a PRE-BUILT cache (no alloc
           or prefix copy in the loop), lm_head included.

One process, two jits. Usage: timeout 900 python prefix_split.py --batch 8
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[2] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from full_depth import _full_cfg, init_full_depth_llm_int8  # noqa: E402

V_FRAMES = 32
PROMPT = 16


def _bucket(n, align=128):
    return -(-n // align) * align


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--contiguous", action="store_true",
                    help="cache writes via dynamic_update_slice instead of "
                         "the per-row scatter (qwen2 contiguous_update)")
    a = ap.parse_args()
    B, iters = a.batch, a.iters
    print(f"devices: {jax.devices()}", flush=True)

    from video3d_tpu.constants import IMAGE_TOKEN_INDEX
    from video3d_tpu.models import generate as gen
    from video3d_tpu.models import llava_video3d as lv3d
    from video3d_tpu.models import qwen2
    from video3d_tpu.models.splice import (build_splice_plan,
                                           slice_suffix_plan, vision_end)

    cfg = _full_cfg()
    params = {"llm": init_full_depth_llm_int8(cfg, jax.random.PRNGKey(1))}
    T = cfg.tokens_per_frame
    g = -(-cfg.vision.num_patches_per_side // cfg.spatial_pool_stride)
    L = _bucket(PROMPT + V_FRAMES * T)
    ids = [10] * 15 + [IMAGE_TOKEN_INDEX] + [20] * 30
    plan = build_splice_plan([ids], None, [V_FRAMES], tokens_per_frame=T,
                             max_len=L, grid_side=g)
    P = vision_end(plan)
    SUF = 64
    suf = slice_suffix_plan(plan, P, SUF)

    def tile(x):
        return jnp.asarray(np.broadcast_to(np.asarray(x),
                                           (B,) + np.asarray(x).shape[1:]))

    batch = lv3d.Batch(
        images=None, patch_coords=None,
        text_ids=tile(suf.text_ids), kind=tile(suf.kind),
        vision_index=tile(suf.vision_index), labels=tile(suf.labels),
        position_ids=tile(suf.position_ids),
        mrope_position_ids=tile(suf.mrope_position_ids),
        seq_len=tile(suf.seq_len))
    mcl = L + 512
    KV, hd = cfg.llm.num_key_value_heads, cfg.llm.head_dim
    nl = cfg.llm.num_hidden_layers
    prefix = qwen2.KVCache(
        jnp.zeros((nl, 1, P, KV * hd), jnp.int8),
        jnp.zeros((nl, 1, P, KV * hd), jnp.int8),
        0.01 * jnp.ones((nl, 1, P, KV, 1), jnp.float32),
        0.01 * jnp.ones((nl, 1, P, KV, 1), jnp.float32))
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]

    # ---- stage 1: alloc + prefix broadcast copy -------------------------
    @jax.jit
    def repeat_alloc(pk, pv, ks, vs):
        def body(i, acc):
            eps = i.astype(jnp.float32) * 1e-8
            cache = qwen2.KVCache.zeros(cfg.llm, B, mcl, dtype=jnp.int8)
            cache = gen._write_prefix(
                cache, qwen2.KVCache(pk, pv, ks + eps, vs + eps))
            return acc + cache.k_scale[0, 0, 0, 0, 0] + cache.v[
                -1, -1, -1, -1, -1].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    # ---- stage 2: suffix forward over a pre-built cache -----------------
    cache0 = jax.jit(
        lambda pk, pv, ks, vs: gen._write_prefix(
            qwen2.KVCache.zeros(cfg.llm, B, mcl, dtype=jnp.int8),
            qwen2.KVCache(pk, pv, ks, vs)))(
        prefix.k, prefix.v, prefix.k_scale, prefix.v_scale)

    D = params["llm"]["embed_tokens"].shape[-1]
    pos3 = lv3d._position_ids_3d(batch, cfg)
    cache_positions = P + jnp.broadcast_to(jnp.arange(SUF)[None], (B, SUF))

    @jax.jit
    def repeat_fwd(params, ck, cv, cks, cvs, suffix_ids):
        def body(i, acc):
            eps = i.astype(jnp.float32) * 1e-8
            ids_i = jnp.where(batch.kind == 1,
                              (suffix_ids + i + rows) % 997 + 20, suffix_ids)
            dummy_vis = jnp.zeros((B, 1, D),
                                  params["llm"]["embed_tokens"].dtype)
            embeds = lv3d.assemble_embeds(params, cfg, dummy_vis, ids_i,
                                          batch.kind, batch.vision_index,
                                          None, None)
            hidden, _ = qwen2.qwen2_forward(
                params["llm"], cfg.llm, embeds, pos3,
                kv_cache=qwen2.KVCache(ck, cv, cks + eps, cvs + eps),
                cache_positions=cache_positions, kv_len=batch.seq_len,
                contiguous_update=a.contiguous)
            last = jnp.take_along_axis(
                hidden, (batch.seq_len - 1 - P)[:, None, None], axis=1)
            logits = qwen2.lm_head(params["llm"], last)[:, 0]
            return acc + jnp.sum(logits.astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    def timed(name, fn, *args):
        print(f"compiling {name}...", flush=True)
        for _ in range(2):
            total = float(fn(*args))
        t0 = time.perf_counter()
        total = float(fn(*args))
        assert total == total
        return round(1e3 * (time.perf_counter() - t0) / iters, 2)

    alloc_ms = timed("alloc+copy", repeat_alloc, prefix.k, prefix.v,
                     prefix.k_scale, prefix.v_scale)
    fwd_ms = timed("suffix fwd", repeat_fwd, params, cache0.k, cache0.v,
                   cache0.k_scale, cache0.v_scale, batch.text_ids)
    print(json.dumps({"mode": f"prefix_split_b{B}"
                              + ("_contig" if a.contiguous else ""), "B": B,
                      "alloc_copy_ms": alloc_ms, "suffix_fwd_ms": fwd_ms,
                      "prefix_len": P, "suffix_bucket": SUF, "mcl": mcl}))


if __name__ == "__main__":
    main()
