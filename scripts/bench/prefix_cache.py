"""Measure the scene-prefix KV cache's per-question cost on the real chip.

The engine's prefix-cached steady state (EngineConfig.prefix_cache_scenes,
models/generate.py::start_decode_prefix) replaces the per-question
[geometry + world-PE + splice + prefill-1792] chain with
[cache alloc + prefix-KV copy + 64-token suffix prefill]. This script
measures that per-question cost with the bench.py methodology (on-device
fori_loop, EVERY loop input perturbed by the index so XLA cannot hoist a
stage, single scalar fetch) at the bench's model scale: 4 full-width (3584)
Qwen2 blocks, 152k vocab, prefix 1696 = 16 prompt + 8*210 vision tokens.

Run on the real TPU (one process at a time):
    timeout 560 python scripts/bench/prefix_cache.py
"""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from video3d_tpu.config import LLMConfig, ModelConfig, VisionConfig
from video3d_tpu.constants import IMAGE_TOKEN_INDEX
from video3d_tpu.models import generate as gen
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models.splice import (build_splice_plan, slice_suffix_plan,
                                       vision_end)

V_FRAMES = 8
LLM_LAYERS = 4
PREFILL_LEN = 1792
SUFFIX_LEN = 64
MAX_NEW = 512
ITERS = 100


def main():
    cfg = ModelConfig(
        vision=VisionConfig(num_hidden_layers=2),   # tower unused after warm
        llm=dataclasses.replace(LLMConfig(), num_hidden_layers=LLM_LAYERS),
    )
    params = lv3d.init_model(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    T = cfg.tokens_per_frame
    g = -(-cfg.vision.num_patches_per_side // cfg.spatial_pool_stride)
    D = cfg.llm.hidden_size

    # 16 pre-image prompt tokens + vision block + ~30-token question suffix
    ids = [10] * 15 + [IMAGE_TOKEN_INDEX] + [20] * 30
    plan = build_splice_plan([ids], None, [V_FRAMES], tokens_per_frame=T,
                             max_len=PREFILL_LEN, grid_side=g)
    P = vision_end(plan)
    print(f"prefix_len={P} total={int(plan.seq_len[0])}")
    suf = slice_suffix_plan(plan, P, SUFFIX_LEN)
    assert suf is not None

    def to_batch(p):
        return lv3d.Batch(
            images=None, patch_coords=None,
            text_ids=jnp.asarray(p.text_ids), kind=jnp.asarray(p.kind),
            vision_index=jnp.asarray(p.vision_index),
            labels=jnp.asarray(p.labels),
            position_ids=jnp.asarray(p.position_ids),
            mrope_position_ids=jnp.asarray(p.mrope_position_ids),
            seq_len=jnp.asarray(p.seq_len))

    full_batch = to_batch(plan)
    suffix_batch = to_batch(suf)
    max_cache = PREFILL_LEN + MAX_NEW

    # one real full prefill produces the prefix KV the engine would store
    vis = 0.02 * jax.random.normal(jax.random.PRNGKey(1),
                                   (1, V_FRAMES * T, D), jnp.bfloat16)
    state = gen.start_decode(params, cfg, full_batch,
                             max_cache_len=max_cache,
                             vision_features=vis)
    from video3d_tpu.models.qwen2 import KVCache
    prefix = KVCache(jnp.asarray(state.cache.k[:, :, :P]),
                     jnp.asarray(state.cache.v[:, :, :P]))

    suffix_ids = suffix_batch.text_ids

    @jax.jit
    def repeat_prefix(params, pk, pv, suffix_ids):
        def body(i, acc):
            eps = i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
            ids_i = jnp.where(suffix_batch.kind == 1,
                              (suffix_ids + i) % 997 + 20, suffix_ids)
            b = suffix_batch._replace(text_ids=ids_i)
            st = gen.start_decode_prefix(
                params, cfg, b, KVCache(pk + eps, pv + eps),
                prefix_len=P, max_cache_len=max_cache)
            return acc + jnp.sum(st.next_logits.astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    # comparison: the full prefill-1792 the prefix cache replaces (from the
    # same precomputed vision features — i.e. even with the round-1 scene
    # feature cache already applied)
    @jax.jit
    def repeat_full(params, vis, text_ids):
        def body(i, acc):
            eps = i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
            ids_i = jnp.where(full_batch.kind == 1,
                              (text_ids + i) % 997 + 20, text_ids)
            b = full_batch._replace(text_ids=ids_i)
            logits, _, _ = gen.prefill_multimodal(
                params, cfg, b, max_cache_len=max_cache,
                vision_features=vis + eps)
            return acc + jnp.sum(logits.astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    def timed(fn, *args):
        for _ in range(2):
            total = float(fn(*args))
        t0 = time.perf_counter()
        total = float(fn(*args))
        dt = (time.perf_counter() - t0) / ITERS
        assert total == total
        return dt

    dt_pre = timed(repeat_prefix, params, prefix.k, prefix.v, suffix_ids)
    dt_full = timed(repeat_full, params, vis, full_batch.text_ids)
    print(f"prefix-cached question: {dt_pre * 1e3:.2f} ms "
          f"({V_FRAMES / dt_pre:.1f} frames/s)")
    print(f"full prefill-{PREFILL_LEN} question (features cached): "
          f"{dt_full * 1e3:.2f} ms ({V_FRAMES / dt_full:.1f} frames/s)")
    print(f"speedup {dt_full / dt_pre:.2f}x")

    # scene-grouped batched suffix: one B-row suffix prefill against the
    # broadcast prefix serves B questions (engine
    # prepare_answers_batch_prefix); suffix prefill is weight-read-bound,
    # so B rows cost ~B=1
    B = 8
    bsuf = lv3d.Batch(*[
        (jnp.broadcast_to(x, (B,) + x.shape[1:])
         if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == 1
         else (jnp.broadcast_to(x, (B,)) if hasattr(x, "shape")
               and x.shape == (1,) else x))
        for x in suffix_batch])

    @jax.jit
    def repeat_batched(params, pk, pv, suffix_ids):
        def body(i, acc):
            eps = i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
            ids_i = jnp.where(bsuf.kind == 1,
                              (suffix_ids + i) % 997 + 20, suffix_ids)
            b = bsuf._replace(text_ids=ids_i)
            st = gen.start_decode_prefix(
                params, cfg, b, gen.qwen2.KVCache(pk + eps, pv + eps),
                prefix_len=P, max_cache_len=max_cache)
            return acc + jnp.sum(st.next_logits.astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    dt_b = timed(repeat_batched, params, prefix.k, prefix.v, bsuf.text_ids)
    print(f"batched suffix prefill, B={B}: {dt_b * 1e3:.2f} ms/chunk = "
          f"{dt_b * 1e3 / B:.2f} ms/question "
          f"({B / dt_b:.0f} questions/s; {dt_pre / (dt_b / B):.1f}x the "
          f"B=1 prefix path)")


if __name__ == "__main__":
    main()
