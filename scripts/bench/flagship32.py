"""Flagship 32-frame configuration at FULL 7B depth (VERDICT r2 #1).

Every acceptance config in BASELINE.json is 32-frame (the reference trains
at frames_upbound=32, scripts/3d/train/train_multi.sh:73, and evals ScanQA
at 32 frames / mc-ratio95, scripts/3d/eval/eval_scanqa.sh) — round 2's
numbers were all V=8. This script measures the 32-frame chain at
production depth (28-layer/3584 Qwen2-7B + 26-layer SigLIP-so400m), int8
weights (the proven single-chip config) or w8a8:

  chain     V=32 full chain: per-frame geometry -> voxelize -> SigLIP(32)
            -> projector -> pool -> world-PE -> splice -> prefill-6784
            (= 16 prompt + 32*210 vision in the tightest 128-aligned
            bucket). frames/s + analytic-FLOP MFU.
  stages    the same chain split into 3 separately-jitted stages
            (geometry | tower+proj+pool | PE+splice+prefill) for the
            per-stage table.
  mc-chain  ON-DEVICE mc-ratio95 selection in the chain: a 64-frame
            candidate pool -> full-resolution voxel ids -> exact greedy
            max-coverage pick of 32 (ops/mc_select.py) -> gather picked
            frames -> tower(32) -> ... -> prefill-6784. Measures the
            mc-sampling production config with selection moved on device
            (the reference precomputes it offline, video_utils.py:131-159;
            ratio95 keeps picks until 95% coverage <= 32, this measures
            the full-32 upper bound with the selection cost IN the chain).
  prefix    scene-prefix KV steady state at V=32: alloc+copy the 6736-token
            prefix + 64-token suffix prefill (+ last-token head), int8
            weights + int8 KV. --batch B for the scene-grouped batched
            variant.
  ctx32k    model_max_length feasibility/timing: one 32768-token prefill
            through the 28-layer int8 LLM with flash attention (the
            reference's tokenizer_model_max_length, train_multi.sh:76).

One mode per process (remote-compile tunnel: 1-2 jits per process, 500+ s
budget — see .claude/skills/verify/SKILL.md). All timings are on-device
``lax.fori_loop`` repetition with every input perturbed by the loop index
and a single scalar fetch.
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

from full_depth import (_full_cfg, init_full_depth_llm_int8,  # noqa: E402
                        init_vision_and_glue)

V_FRAMES = 32
DEPTH_H, DEPTH_W = 480, 640
CROP = 384
PROMPT = 16
BF16_PEAK_TFLOPS = 197.0       # v5e bf16 MXU peak (BENCH_NOTES methodology)


def _bucket(n, align=128):
    return -(-n // align) * align


def make_scan(v_frames, seed=0):
    rng = np.random.default_rng(seed)
    depths = rng.integers(200, 8000,
                          size=(v_frames, DEPTH_H, DEPTH_W)).astype(np.int32)
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 577.87
    intr[0, 2], intr[1, 2] = 319.5, 239.5
    poses = np.stack([np.eye(4, dtype=np.float32)] * v_frames)
    poses[:, :3, 3] = rng.uniform(-2, 2, (v_frames, 3)).astype(np.float32)
    images = rng.normal(size=(1, v_frames, 3, CROP, CROP)).astype(np.float32)
    return depths, intr, poses, images


def chain_flops(cfg, v, prefill_len):
    """Analytic matmul FLOPs of the full chain (geometry/splice ignored —
    they are bandwidth-bound; same convention as BENCH_NOTES round 2)."""
    vc, lc = cfg.vision, cfg.llm
    n_patch = vc.num_patches_per_side ** 2
    # tower: per frame per layer qkvo (4 D^2) + mlp (2 D*I) matmuls
    #        + attention scores/values (2 * N^2 * D)
    d, i = vc.hidden_size, vc.intermediate_size
    tower = vc.num_hidden_layers * (
        2 * n_patch * (4 * d * d + 2 * d * i) + 2 * 2 * n_patch * n_patch * d)
    tower *= v
    # projector (mlp2x_gelu) on n_patch tokens per frame
    proj = v * 2 * n_patch * (d * lc.hidden_size
                              + lc.hidden_size * lc.hidden_size)
    # LLM prefill: qkvo + mlp weights per token + causal attention
    D, I = lc.hidden_size, lc.intermediate_size
    kvd = lc.num_key_value_heads * lc.head_dim
    per_tok = 2 * (2 * D * D + 2 * D * kvd + 3 * D * I)
    attn = 2 * 2 * prefill_len * prefill_len * D / 2       # causal half
    llm = lc.num_hidden_layers * (prefill_len * per_tok + attn)
    return tower + proj + llm


def _build_chain(cfg, params, prefill_len, v_frames):
    from video3d_tpu.models import llava_video3d as lv3d
    from video3d_tpu.models import qwen2
    from video3d_tpu.ops import geometry

    new_w = int(DEPTH_W * (CROP / DEPTH_H))
    vox_cfg = cfg.world_3d.voxel
    n_vis = v_frames * cfg.tokens_per_frame

    def pipeline(params, depths, intr, poses, images):
        wc = geometry.unproject(intr, poses, depths)
        wc = geometry.center_crop(
            geometry.resize_nearest(wc, (CROP, new_w)), (CROP, CROP))
        patch = geometry.average_coordinate_in_patch(wc)
        vox = geometry.discrete_coords(patch, vox_cfg.min_xyz_range,
                                       vox_cfg.max_xyz_range,
                                       vox_cfg.voxel_size)
        vt = lv3d.encode_video(params, cfg, images, vox[None])
        D = vt.spliceable.shape[-1]
        embeds = jnp.zeros((1, prefill_len, D), vt.spliceable.dtype)
        embeds = jax.lax.dynamic_update_slice(embeds, vt.spliceable,
                                              (0, PROMPT, 0))
        pos = jnp.broadcast_to(jnp.arange(prefill_len)[None, :, None],
                               (1, prefill_len, 3))
        hidden, _ = qwen2.qwen2_forward(params["llm"], cfg.llm, embeds, pos)
        return jnp.sum(hidden[:, PROMPT + n_vis].astype(jnp.float32))

    return pipeline


def run_chain(w8a8: bool, iters: int = 3, tower_pad: int = 0):
    import dataclasses as _dc

    cfg = _full_cfg()
    if tower_pad:
        # VERDICT r4 #7 A/B: MXU-align the 729-token tower attention
        # (27x27 grid) to a 768-row sequence. Negative at V=8 (r3,
        # tower_profile.py: 52.7 vs 47.0 ms); re-measured at V=32 here.
        cfg = _dc.replace(cfg, vision=_dc.replace(
            cfg.vision, tower_pad_seq=tower_pad))
    act = "int8" if w8a8 else "none"
    params = init_vision_and_glue(cfg, jax.random.PRNGKey(0), w8a8=w8a8)
    params["llm"] = init_full_depth_llm_int8(cfg, jax.random.PRNGKey(1),
                                             act=act)
    L = _bucket(PROMPT + V_FRAMES * cfg.tokens_per_frame)
    depths, intr, poses, images = make_scan(V_FRAMES)
    pipeline = _build_chain(cfg, params, L, V_FRAMES)

    @jax.jit
    def repeat(params, depths, intr, poses, images):
        def body(i, acc):
            return acc + pipeline(params, depths + i, intr, poses,
                                  images + i.astype(jnp.float32) * 1e-6)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    args = (params, jnp.asarray(depths), jnp.asarray(intr),
            jnp.asarray(poses), jnp.asarray(images))
    print(f"compiling V=32 chain (28L, prefill {L}, "
          f"{'w8a8' if w8a8 else 'int8'})...", flush=True)
    for _ in range(2):
        total = float(repeat(*args))
    t0 = time.perf_counter()
    total = float(repeat(*args))
    dt = (time.perf_counter() - t0) / iters
    assert total == total
    fl = chain_flops(cfg, V_FRAMES, L)
    res = {
        "mode": f"chain32_{'w8a8' if w8a8 else 'int8'}",
        "frames_per_s": round(V_FRAMES / dt, 2),
        "chain_ms": round(1e3 * dt, 1),
        "prefill_len": L,
        "tflop_per_chain": round(fl / 1e12, 2),
        "mfu_pct_bf16peak": round(100 * fl / dt / 1e12 / BF16_PEAK_TFLOPS,
                                  1)}
    print(json.dumps(res))
    return res


def run_stages(w8a8: bool, iters: int = 5):
    """3 separately-jitted stages of the V=32 chain."""
    from video3d_tpu.models import llava_video3d as lv3d
    from video3d_tpu.models import qwen2
    from video3d_tpu.ops import geometry

    cfg = _full_cfg()
    act = "int8" if w8a8 else "none"
    params = init_vision_and_glue(cfg, jax.random.PRNGKey(0), w8a8=w8a8)
    params["llm"] = init_full_depth_llm_int8(cfg, jax.random.PRNGKey(1),
                                             act=act)
    L = _bucket(PROMPT + V_FRAMES * cfg.tokens_per_frame)
    depths, intr, poses, images = make_scan(V_FRAMES)
    new_w = int(DEPTH_W * (CROP / DEPTH_H))
    vox_cfg = cfg.world_3d.voxel
    g = -(-cfg.vision.num_patches_per_side // cfg.spatial_pool_stride)

    def geo(depths, intr, poses):
        wc = geometry.unproject(intr, poses, depths)
        wc = geometry.center_crop(
            geometry.resize_nearest(wc, (CROP, new_w)), (CROP, CROP))
        patch = geometry.average_coordinate_in_patch(wc)
        return geometry.discrete_coords(patch, vox_cfg.min_xyz_range,
                                        vox_cfg.max_xyz_range,
                                        vox_cfg.voxel_size)

    def tower(params, images, vox):
        vt = lv3d.encode_video(params, cfg, images, vox[None])
        return vt.spliceable

    def prefill(params, spliceable):
        D = spliceable.shape[-1]
        embeds = jnp.zeros((1, L, D), spliceable.dtype)
        embeds = jax.lax.dynamic_update_slice(embeds, spliceable,
                                              (0, PROMPT, 0))
        pos = jnp.broadcast_to(jnp.arange(L)[None, :, None], (1, L, 3))
        hidden, _ = qwen2.qwen2_forward(params["llm"], cfg.llm, embeds, pos)
        return jnp.sum(hidden[:, -1].astype(jnp.float32))

    dj = jnp.asarray(depths)
    ij = jnp.asarray(intr)
    pj = jnp.asarray(poses)
    imj = jnp.asarray(images)

    results = {}

    def timed(name, fn, *args, perturb):
        @jax.jit
        def rep(*a):
            def body(i, acc):
                return acc + fn(*perturb(i, *a))
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((), jnp.float32))

        print(f"compiling stage {name}...", flush=True)
        for _ in range(2):
            total = float(rep(*args))
        t0 = time.perf_counter()
        total = float(rep(*args))
        assert total == total
        results[name] = round(1e3 * (time.perf_counter() - t0) / iters, 2)

    timed("geometry_ms", lambda d, i_, p: jnp.sum(
        geo(d, i_, p).astype(jnp.float32)) * 1e-6, dj, ij, pj,
        perturb=lambda i, d, i_, p: (d + i, i_, p))
    # tower stage needs a vox input: reuse one geometry result
    vox_host = jax.jit(geo)(dj, ij, pj)
    timed("tower_proj_pool_ms", lambda par, im, vx: jnp.sum(
        tower(par, im, vx)[:, -1].astype(jnp.float32)) * 1e-6,
        params, imj, vox_host,
        perturb=lambda i, par, im, vx: (par, im + i.astype(jnp.float32)
                                        * 1e-6, vx))
    spl_host = jax.jit(lambda p, im, vx: tower(p, im, vx))(params, imj,
                                                           vox_host)
    timed("pe_splice_prefill_ms", prefill, params, spl_host,
          perturb=lambda i, par, s: (par, s + i.astype(s.dtype) * 1e-6))
    results["mode"] = f"stages32_{'w8a8' if w8a8 else 'int8'}"
    results["prefill_len"] = L
    print(json.dumps(results))


def run_mc_chain(pool: int = 64, iters: int = 2, occ_impl: str = "sort"):
    """On-device exact greedy max-coverage selection of 32 from a 64-frame
    pool, inside the chain (full-res voxel ids, reference
    max_coverage_sampling.py semantics; ops/mc_select.py)."""
    from video3d_tpu.models import llava_video3d as lv3d
    from video3d_tpu.models import qwen2
    from video3d_tpu.ops import geometry
    from video3d_tpu.ops import mc_select
    from video3d_tpu.ops.mc_select import greedy_select_frames

    mc_select.OCC_IMPL = occ_impl     # A/B: r4 MXU histogram vs r3 sorts
    cfg = _full_cfg()
    params = init_vision_and_glue(cfg, jax.random.PRNGKey(0))
    params["llm"] = init_full_depth_llm_int8(cfg, jax.random.PRNGKey(1))
    L = _bucket(PROMPT + V_FRAMES * cfg.tokens_per_frame)
    depths, intr, poses, images = make_scan(pool)
    # synthetic scene point-cloud voxel universe (M voxels in range)
    rng = np.random.default_rng(7)
    scene_vox = rng.integers(120, 180, size=(40000, 3)).astype(np.int32)

    new_w = int(DEPTH_W * (CROP / DEPTH_H))
    vox_cfg = cfg.world_3d.voxel
    n_vis = V_FRAMES * cfg.tokens_per_frame

    def pipeline(params, depths, intr, poses, images, scene):
        # full-res world coords (pool frames) for BOTH selection + PE
        wc_full = geometry.unproject(intr, poses, depths)
        frame_vox = geometry.discrete_coords(
            wc_full, vox_cfg.min_xyz_range, vox_cfg.max_xyz_range,
            vox_cfg.voxel_size).reshape(pool, -1, 3)
        order, gains, num_all = greedy_select_frames(
            frame_vox, scene, max_frames=V_FRAMES)
        # gather the picked frames (chronological order is a host-side
        # sort in the reference; attention is permutation-aware via PE, so
        # the device chain keeps pick order)
        wc = jnp.take(wc_full, order, axis=0)
        imgs = jnp.take(images, order, axis=1)
        wc = geometry.center_crop(
            geometry.resize_nearest(wc, (CROP, new_w)), (CROP, CROP))
        patch = geometry.average_coordinate_in_patch(wc)
        vox = geometry.discrete_coords(patch, vox_cfg.min_xyz_range,
                                       vox_cfg.max_xyz_range,
                                       vox_cfg.voxel_size)
        vt = lv3d.encode_video(params, cfg, imgs, vox[None])
        D = vt.spliceable.shape[-1]
        embeds = jnp.zeros((1, L, D), vt.spliceable.dtype)
        embeds = jax.lax.dynamic_update_slice(embeds, vt.spliceable,
                                              (0, PROMPT, 0))
        pos = jnp.broadcast_to(jnp.arange(L)[None, :, None], (1, L, 3))
        hidden, _ = qwen2.qwen2_forward(params["llm"], cfg.llm, embeds, pos)
        return (jnp.sum(hidden[:, PROMPT + n_vis].astype(jnp.float32))
                + gains.sum().astype(jnp.float32) * 1e-9)

    @jax.jit
    def repeat(params, depths, intr, poses, images, scene):
        def body(i, acc):
            return acc + pipeline(params, depths + i, intr, poses,
                                  images + i.astype(jnp.float32) * 1e-6,
                                  scene)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    args = (params, jnp.asarray(depths), jnp.asarray(intr),
            jnp.asarray(poses), jnp.asarray(images), jnp.asarray(scene_vox))
    print(f"compiling mc-chain (pool {pool} -> 32, 28L, "
          f"prefill {L})...", flush=True)
    for _ in range(2):
        total = float(repeat(*args))
    t0 = time.perf_counter()
    total = float(repeat(*args))
    dt = (time.perf_counter() - t0) / iters
    assert total == total
    print(json.dumps({"mode": f"mcchain32_int8_occ-{occ_impl}",
                      "frames_per_s": round(V_FRAMES / dt, 2),
                      "chain_ms": round(1e3 * dt, 1),
                      "pool": pool, "selected": V_FRAMES,
                      "prefill_len": L}))


def run_mc_profile(pool: int = 64, iters: int = 3,
                   occ_impl: str = "sort"):
    """Stage breakdown of the ON-DEVICE mc-selection overhead (VERDICT r3
    #6: the +564 ms): (a) full-res 64-frame unproject+voxelize, (b)
    frame-occupancy build, (c) the greedy while_loop, each separately
    jitted and fori_loop-timed with perturbed inputs."""
    import time as _time

    from video3d_tpu.ops import geometry, mc_select
    from video3d_tpu.ops.mc_select import (frame_occupancy_mm,
                                           greedy_select_frames,
                                           membership_bitmap,
                                           scene_universe)

    mc_select.OCC_IMPL = occ_impl
    cfg = _full_cfg()
    vox_cfg = cfg.world_3d.voxel
    depths, intr, poses, _ = make_scan(pool)
    rng = np.random.default_rng(7)
    scene_vox = rng.integers(120, 180, size=(40000, 3)).astype(np.int32)
    dj, ij, pj = (jnp.asarray(depths), jnp.asarray(intr),
                  jnp.asarray(poses))
    sj = jnp.asarray(scene_vox)

    def geo(d, i_, p):
        wc = geometry.unproject(i_, p, d)
        return geometry.discrete_coords(
            wc, vox_cfg.min_xyz_range, vox_cfg.max_xyz_range,
            vox_cfg.voxel_size).reshape(pool, -1, 3)

    results = {"mode": f"mcprofile_{occ_impl}", "pool": pool}

    def timed(name, fn, *args, perturb):
        @jax.jit
        def rep(*a):
            def body(i, acc):
                return acc + fn(*perturb(i, *a))
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((), jnp.float32))

        print(f"compiling {name}...", flush=True)
        for _ in range(2):
            total = float(rep(*args))
        t0 = _time.perf_counter()
        total = float(rep(*args))
        assert total == total
        results[name] = round(1e3 * (_time.perf_counter() - t0) / iters, 1)

    timed("geometry_ms",
          lambda d, i_, p: jnp.sum(geo(d, i_, p).astype(jnp.float32))
          * 1e-9, dj, ij, pj, perturb=lambda i, d, i_, p: (d + i, i_, p))
    fv = jax.jit(geo)(dj, ij, pj)
    sorted_ids, lo, sizes = jax.jit(scene_universe)(sj)

    def occ_sort(f):
        return jax.vmap(lambda x: membership_bitmap(
            x, sorted_ids, lo, sizes))(f)

    occ = {"sort": occ_sort,
           "mm": lambda f: frame_occupancy_mm(f, sorted_ids, lo, sizes)}
    timed("occupancy_ms",
          lambda f: jnp.sum(occ[occ_impl](f).astype(jnp.float32)) * 1e-6,
          fv, perturb=lambda i, f: (f + (i % 2),))
    # split: the 64 per-frame sorts vs the searchsorted membership
    timed("sort_only_ms",
          lambda f: jnp.sum(jax.vmap(
              lambda x: jax.lax.sort(x, is_stable=False))(
              f.reshape(pool, -1, 3).sum(-1)).astype(jnp.float32)) * 1e-9,
          fv, perturb=lambda i, f: (f + (i % 2),))
    timed("greedy_full_ms",
          lambda f, s: greedy_select_frames(f, s, max_frames=V_FRAMES)[1]
          .sum().astype(jnp.float32) * 1e-6,
          fv, sj, perturb=lambda i, f, s: (f + (i % 2), s))
    print(json.dumps(results))
    return results


def run_prefix(B: int = 1, iters: int = 20, shared: bool = True):
    """Scene-prefix KV steady state at V=32 / full depth (mirrors
    full_depth.run_prefix at the flagship scale).

    ``shared=False`` disables the round-4 shared-prefix attention path
    (generate.SHARED_PREFIX_ATTN) for the A/B: the prefix KV then
    re-streams per (row, q-block) through the gqa-folded kernel as in
    round 3."""
    from video3d_tpu.models import generate as _gen

    _gen.SHARED_PREFIX_ATTN = shared
    import os

    from video3d_tpu.kernels import flash_attention as _fa

    _fa.SP_BLOCK_Q = int(os.environ.get("V3D_SP_BLOCK_Q", _fa.SP_BLOCK_Q))
    _fa.SP_BLOCK_K = int(os.environ.get("V3D_SP_BLOCK_K", _fa.SP_BLOCK_K))
    _fa.SP_FUSED = os.environ.get("V3D_SP_FUSED", "1") != "0"
    print(f"SP_BLOCK_Q={_fa.SP_BLOCK_Q} SP_BLOCK_K={_fa.SP_BLOCK_K} "
          f"fused={_fa.SP_FUSED} shared={shared}", flush=True)
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

    @jax.jit
    def repeat(params, pk, pv, ks, vs, suffix_ids):
        def body(i, acc):
            eps = i.astype(jnp.float32) * 1e-8
            ids_i = jnp.where(batch.kind == 1,
                              (suffix_ids + i + rows) % 997 + 20, suffix_ids)
            b = batch._replace(text_ids=ids_i)
            st = gen.start_decode_prefix(
                params, cfg, b, qwen2.KVCache(pk, pv, ks + eps, vs + eps),
                prefix_len=P, max_cache_len=mcl, cache_dtype=jnp.int8)
            return acc + jnp.sum(st.next_logits.astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    args = (params, prefix.k, prefix.v, prefix.k_scale, prefix.v_scale,
            batch.text_ids)
    print(f"compiling V=32 28L suffix prefill (prefix {P}, B={B})...",
          flush=True)
    for _ in range(2):
        total = float(repeat(*args))
    t0 = time.perf_counter()
    total = float(repeat(*args))
    dt = (time.perf_counter() - t0) / iters
    assert total == total
    res = {"mode": f"prefix32_int8_b{B}"
                   + ("" if shared else "_noshared"),
           "chunk_ms": round(1e3 * dt, 2),
           "question_ms": round(1e3 * dt / B, 3),
           "prefix_len": P, "suffix_bucket": SUF, "B": B}
    print(json.dumps(res))
    return res


def run_ctx32k(L: int = 32768, iters: int = 1, chunk: int = 4096):
    import os as _os

    from video3d_tpu.kernels import flash_attention as _fa

    _fa.GQF_BLOCK_Q = int(_os.environ.get("V3D_GQF_BLOCK_Q",
                                          _fa.GQF_BLOCK_Q))
    _fa.GQF_BLOCK_K = int(_os.environ.get("V3D_GQF_BLOCK_K",
                                          _fa.GQF_BLOCK_K))
    print(f"GQF blocks {_fa.GQF_BLOCK_Q}/{_fa.GQF_BLOCK_K}", flush=True)
    """32k-token prefill through the 28-layer int8 LLM at model_max_length
    (train_multi.sh:76). A single monolithic 32k forward is IMPOSSIBLE on
    one chip: the 28 unrolled layers keep ~13.4 GiB of (32768, D)-activation
    temps live (XLA OOM report, BENCH_NOTES r3) on top of 7.1 GiB of args.
    The production path for long prompts is the serve stack's chunked
    prefill (models/generate._prefill_chunk, Sarathi-style): this measures
    the same machinery as an on-device lax.scan of L/chunk cached-attention
    chunks (int8 KV cache, per-query causal masking via cache_positions)."""
    from video3d_tpu.models import qwen2

    cfg = _full_cfg()
    llm = init_full_depth_llm_int8(cfg, jax.random.PRNGKey(1))
    nC = L // chunk
    assert nC * chunk == L

    def fwd(llm, ids):
        emb = jnp.take(llm["embed_tokens"], ids, axis=0)[None]    # (1, L, D)
        cache = qwen2.KVCache.zeros(cfg.llm, 1, L, dtype=jnp.int8)
        kv_len = jnp.full((1,), L, jnp.int32)

        def step(cache, c):
            start = c * chunk
            emb_c = jax.lax.dynamic_slice(emb, (0, start, 0),
                                          (1, chunk, emb.shape[-1]))
            pos_c = jnp.broadcast_to(
                (start + jnp.arange(chunk))[None, :, None], (1, chunk, 3))
            cpos = jnp.broadcast_to((start + jnp.arange(chunk))[None],
                                    (1, chunk))
            hidden, cache = qwen2.qwen2_forward(
                llm, cfg.llm, emb_c, pos_c, kv_cache=cache,
                cache_positions=cpos, kv_len=kv_len,
                contiguous_update=True)
            return cache, jnp.sum(hidden[:, -1].astype(jnp.float32))

        _, outs = jax.lax.scan(step, cache, jnp.arange(nC))
        return outs[-1]

    ids0 = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.llm.vocab_size, size=(L,)),
        jnp.int32)

    @jax.jit
    def repeat(llm, ids):
        def body(i, acc):
            return acc + fwd(llm, (ids + i) % cfg.llm.vocab_size)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    print(f"compiling 32k chunked prefill (L={L}, chunk {chunk}, 28L "
          "int8)...", flush=True)
    for _ in range(2):
        total = float(repeat(llm, ids0))
    t0 = time.perf_counter()
    total = float(repeat(llm, ids0))
    dt = (time.perf_counter() - t0) / iters
    assert total == total
    D, I = cfg.llm.hidden_size, cfg.llm.intermediate_size
    kvd = cfg.llm.num_key_value_heads * cfg.llm.head_dim
    per_tok = 2 * (2 * D * D + 2 * D * kvd + 3 * D * I)
    fl = cfg.llm.num_hidden_layers * (L * per_tok + 2 * 2 * L * L * D / 2)
    print(json.dumps({
        "mode": "ctx32k_int8_chunked", "L": L, "chunk": chunk,
        "prefill_s": round(dt, 2),
        "tok_per_s": round(L / dt, 0),
        "tflop": round(fl / 1e12, 1),
        "mfu_pct_bf16peak": round(100 * fl / dt / 1e12 / BF16_PEAK_TFLOPS,
                                  1)}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["chain", "stages", "mc-chain",
                                     "mc-profile", "prefix", "ctx32k"])
    ap.add_argument("--w8a8", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--no-shared-prefix", action="store_true",
                    help="A/B: force the round-3 per-row prefix streaming")
    ap.add_argument("--pool", type=int, default=64)
    ap.add_argument("--occ-impl", choices=("mm", "sort"), default="sort",
                    help="mc-chain A/B: 'sort' = production merge-by-sort "
                         "membership; 'mm' = the MXU-histogram NEGATIVE "
                         "result (2.6x slower on chip, kept for honesty)")
    ap.add_argument("--len", type=int, default=32768)
    ap.add_argument("--tower-pad", type=int, default=0,
                    help="chain mode: pad the tower attention seq (768 = "
                         "MXU-aligned A/B, VERDICT r4 #7)")
    a = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    if a.mode == "chain":
        run_chain(a.w8a8, tower_pad=a.tower_pad)
    elif a.mode == "stages":
        run_stages(a.w8a8)
    elif a.mode == "mc-chain":
        run_mc_chain(pool=a.pool, occ_impl=a.occ_impl)
    elif a.mode == "mc-profile":
        run_mc_profile(pool=a.pool, occ_impl=a.occ_impl)
    elif a.mode == "prefix":
        run_prefix(B=a.batch, shared=not a.no_shared_prefix)
    else:
        run_ctx32k(L=a.len)
