"""Discriminative grounding-path benchmark at FULL 7B depth (VERDICT r2 #3).

ScanRefer + Multi3DRefer (2 of the 5 benchmarks) run a different hot path
from generation: object patch masks from pixel world coords -> masked-mean
features (+ box-center PE) -> <ground>-token query -> predict_box scoring
(reference model_scanrefer.py:163-179, llava_arch.py:351-378/479-501;
here lv3d.grounding_forward / grounding_forward_batch / ground_suffix).
Round 2 had zero perf numbers for it. Modes (28-layer int8 weights, the
single-chip production config; one mode per process):

  cold     ms/question for the full grounding forward: tower + full
           prefill + masks + features + scoring, B=1 (the reference's
           per-query loop). --frames 8|32, --batch B for the scene-grouped
           batched variant (grounding_forward_batch: one prefill serves B
           same-scene queries).
  prefix   ms/question with the scene-prefix KV + object-feature cache
           (eval/drivers.py _ground_prefix): suffix-64 prefill containing
           the <ground> token + score the cached features. --batch B rows.

On-device lax.fori_loop timing, every input perturbed per iteration.
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

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[2] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from full_depth import (_full_cfg, init_full_depth_llm_int8,  # noqa: E402
                        init_vision_and_glue)

PROMPT_IDS = 15
N_OBJECTS = 128          # ScanRefer proposal count scale (max_objects)


def _bucket(n, align=128):
    return -(-n // align) * align


def _ground_cfg():
    from video3d_tpu.config import GroundHeadType

    cfg = _full_cfg()
    return dataclasses.replace(cfg, ground_head=GroundHeadType.INFONCE)


def _params(cfg):
    from video3d_tpu.models import llava_video3d as lv3d

    params = init_vision_and_glue(cfg, jax.random.PRNGKey(0))
    params["llm"] = init_full_depth_llm_int8(cfg, jax.random.PRNGKey(1))
    params["ground_head"] = jax.jit(
        lambda k: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            lv3d.init_ground_head(k, cfg.llm.hidden_size, jnp.bfloat16,
                                  cfg.ground_head)))(jax.random.PRNGKey(3))
    return params


def _plan_batch(cfg, V, L, B=1):
    """Suffix-bearing splice plan whose last real token is the <ground>
    query slot (the ScanRefer prompt shape)."""
    from video3d_tpu.constants import IMAGE_TOKEN_INDEX
    from video3d_tpu.models import llava_video3d as lv3d
    from video3d_tpu.models.splice import build_splice_plan

    g = -(-cfg.vision.num_patches_per_side // cfg.spatial_pool_stride)
    ids = [10] * PROMPT_IDS + [IMAGE_TOKEN_INDEX] + [20] * 30
    plan = build_splice_plan([ids] * B, None, [V] * B,
                             tokens_per_frame=cfg.tokens_per_frame,
                             max_len=L, grid_side=g)
    batch = lv3d.Batch(
        images=None, patch_coords=None,
        text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
        vision_index=jnp.asarray(plan.vision_index),
        labels=jnp.asarray(plan.labels),
        position_ids=jnp.asarray(plan.position_ids),
        mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
        seq_len=jnp.asarray(plan.seq_len))
    slot = int(plan.seq_len[0]) - 1
    return batch, plan, slot


def _scene_arrays(cfg, V, B, seed=0):
    rng = np.random.default_rng(seed)
    S = cfg.vision.image_size
    g = -(-cfg.vision.num_patches_per_side // cfg.spatial_pool_stride)
    images = rng.normal(size=(B, V, 3, S, S)).astype(np.float32)
    wc = rng.uniform(-5, 5, size=(B, V, S, S, 3)).astype(np.float32)
    patch = rng.uniform(0, 300, size=(B, V, g, g, 3)).astype(np.float32)
    boxes = np.zeros((B, N_OBJECTS, 6), np.float32)
    boxes[..., :3] = rng.uniform(-4, 4, (B, N_OBJECTS, 3))
    boxes[..., 3:] = rng.uniform(0.3, 2.0, (B, N_OBJECTS, 3))
    valid = np.ones((B, N_OBJECTS), bool)
    return images, wc, patch, boxes, valid


def run_cold(V: int, B: int, iters: int = 5):
    from video3d_tpu.models import llava_video3d as lv3d

    cfg = _ground_cfg()
    params = _params(cfg)
    L = _bucket(PROMPT_IDS + 1 + 30 + V * cfg.tokens_per_frame)
    batch, plan, slot = _plan_batch(cfg, V, L, B=B)
    images, wc, patch, boxes, valid = _scene_arrays(cfg, V, B)
    batch = batch._replace(images=jnp.asarray(images),
                           patch_coords=jnp.asarray(patch))
    slots = jnp.full((B,), slot, jnp.int32)

    @jax.jit
    def repeat(params, batch, wc, boxes, valid, slots):
        def body(i, acc):
            ids_i = jnp.where(batch.kind == 1,
                              (batch.text_ids + i) % 997 + 20,
                              batch.text_ids)
            b = batch._replace(
                text_ids=ids_i,
                images=batch.images + i.astype(jnp.float32) * 1e-6)
            if B == 1:
                s = lv3d.grounding_forward(params, cfg, b, wc[0], boxes[0],
                                           valid[0], slots[0])
            else:
                s = lv3d.grounding_forward_batch(params, cfg, b, wc, boxes,
                                                 valid, slots)
            return acc + jnp.sum(s.astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    args = (params, batch, jnp.asarray(wc), jnp.asarray(boxes),
            jnp.asarray(valid), slots)
    print(f"compiling cold grounding (28L int8, V={V}, B={B}, "
          f"prefill {L})...", flush=True)
    for _ in range(2):
        total = float(repeat(*args))
    t0 = time.perf_counter()
    total = float(repeat(*args))
    dt = (time.perf_counter() - t0) / iters
    assert total == total
    print(json.dumps({"mode": f"ground_cold_28L_int8_v{V}_b{B}",
                      "question_ms": round(1e3 * dt / B, 2),
                      "chunk_ms": round(1e3 * dt, 2),
                      "prefill_len": L, "objects": N_OBJECTS}))


def run_prefix(V: int, B: int, iters: int = 20):
    from video3d_tpu.models import generate as gen
    from video3d_tpu.models import qwen2
    from video3d_tpu.models.splice import slice_suffix_plan, vision_end

    cfg = _ground_cfg()
    params = _params(cfg)
    T = cfg.tokens_per_frame
    L = _bucket(PROMPT_IDS + 1 + 30 + V * T)
    batch, plan, slot = _plan_batch(cfg, V, L, B=1)
    P = vision_end(plan)
    SUF = 64
    suf = slice_suffix_plan(plan, P, SUF)
    assert slot >= P

    def tile(x):
        return jnp.asarray(np.broadcast_to(np.asarray(x),
                                           (B,) + np.asarray(x).shape[1:]))

    from video3d_tpu.models import llava_video3d as lv3d

    sbatch = lv3d.Batch(
        images=None, patch_coords=None,
        text_ids=tile(suf.text_ids), kind=tile(suf.kind),
        vision_index=tile(suf.vision_index), labels=tile(suf.labels),
        position_ids=tile(suf.position_ids),
        mrope_position_ids=tile(suf.mrope_position_ids),
        seq_len=tile(suf.seq_len))
    KV, hd = cfg.llm.num_key_value_heads, cfg.llm.head_dim
    nl = cfg.llm.num_hidden_layers
    # r5 flat head storage (layers, B, P, KV*hd)
    prefix = qwen2.KVCache(
        jnp.zeros((nl, 1, P, KV * hd), jnp.int8),
        jnp.zeros((nl, 1, P, KV * hd), jnp.int8),
        0.01 * jnp.ones((nl, 1, P, KV, 1), jnp.float32),
        0.01 * jnp.ones((nl, 1, P, KV, 1), jnp.float32))
    rng = np.random.default_rng(0)
    obj_feats = jnp.asarray(
        rng.normal(size=(N_OBJECTS, cfg.llm.hidden_size)), jnp.bfloat16)
    valid = jnp.ones((N_OBJECTS,), bool)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    mcl = P + SUF

    @jax.jit
    def repeat(params, pk, pv, ks, vs, suffix_ids, obj_feats):
        def body(i, acc):
            eps = i.astype(jnp.float32) * 1e-8
            ids_i = jnp.where(sbatch.kind == 1,
                              (suffix_ids + i + rows) % 997 + 20, suffix_ids)
            b = sbatch._replace(text_ids=ids_i)
            s = gen.ground_suffix(
                params, cfg, b, qwen2.KVCache(pk, pv, ks + eps, vs + eps),
                prefix_len=P, max_cache_len=mcl, cache_dtype=jnp.int8,
                obj_feats=obj_feats + eps.astype(obj_feats.dtype),
                object_valid=valid, ground_slot=jnp.asarray(slot))
            return acc + jnp.sum(s.astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    args = (params, prefix.k, prefix.v, prefix.k_scale, prefix.v_scale,
            sbatch.text_ids, obj_feats)
    print(f"compiling prefix grounding (28L int8, V={V}, prefix {P}, "
          f"B={B})...", flush=True)
    for _ in range(2):
        total = float(repeat(*args))
    t0 = time.perf_counter()
    total = float(repeat(*args))
    dt = (time.perf_counter() - t0) / iters
    assert total == total
    print(json.dumps({"mode": f"ground_prefix_28L_int8_v{V}_b{B}",
                      "question_ms": round(1e3 * dt / B, 3),
                      "chunk_ms": round(1e3 * dt, 2),
                      "prefix_len": P, "suffix_bucket": SUF,
                      "objects": N_OBJECTS, "B": B}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["cold", "prefix"])
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1)
    a = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    if a.mode == "cold":
        run_cold(a.frames, a.batch)
    else:
        run_prefix(a.frames, a.batch)
