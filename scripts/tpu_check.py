"""On-chip Pallas kernel correctness sweep.

The CPU test suite exercises every kernel in interpret mode only; Mosaic
(the real TPU lowering) accepts a different op set and different numerics
(see CLAUDE.md "Environment hazards"). This script runs each production
Pallas kernel ON THE REAL CHIP at small shapes against its XLA/jnp
reference and prints one PASS/FAIL line per check. Run once per round (or
after touching kernels/):

    timeout 560 python scripts/tpu_check.py

One process, ~12 small compiles (2-15 s each, cached afterwards). Exits
nonzero if any check fails. Data is generated on device (large host->
device transfers crawl through the tunnel).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

FAILED = []


def check(name, got, want, atol, rtol=0.0, exact=False):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    if exact:
        ok = got.shape == want.shape and bool((got == want).all())
        err = float(np.abs(got - want).max()) if got.shape == want.shape else float("inf")
    else:
        err = float(np.abs(got - want).max()) if got.shape == want.shape else float("inf")
        tol = atol + rtol * np.abs(want).max()
        ok = got.shape == want.shape and err <= tol
    print(f"{'PASS' if ok else 'FAIL'}  {name:42s} max|err|={err:.3e}",
          flush=True)
    if not ok:
        FAILED.append(name)


def main():
    from video3d_tpu.kernels.attention import mha_reference, paged_mha
    from video3d_tpu.kernels.decode_attention import decode_attention
    from video3d_tpu.kernels.flash_attention import flash_attention
    from video3d_tpu.kernels.fused_geometry import (
        fused_patch_voxel_coords, reference_patch_voxel_coords)
    from video3d_tpu.kernels.paged_attention import paged_attention_reference
    from video3d_tpu.kernels.quant_matvec import int8_matmul, unpack_int4
    from video3d_tpu.models import quant
    from video3d_tpu.ops.mc_select import greedy_select_frames

    assert jax.default_backend() != "cpu", "this sweep must run on the TPU"
    ks = iter(jax.random.split(jax.random.PRNGKey(0), 64))
    nk = lambda: next(ks)

    # --- flash attention fwd + bwd (causal, GQA, per-sample lengths) ------
    B, L, H, KV, hd = 2, 384, 4, 2, 128   # production head_dim
    q = jax.random.normal(nk(), (B, L, H, hd), jnp.bfloat16)
    k = jax.random.normal(nk(), (B, L, KV, hd), jnp.bfloat16)
    v = jax.random.normal(nk(), (B, L, KV, hd), jnp.bfloat16)
    lengths = jnp.asarray([L, 250], jnp.int32)
    valid = (jnp.arange(L)[None] < lengths[:, None]).astype(jnp.float32)

    out = jax.jit(flash_attention)(q, k, v, lengths)
    ref = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), causal=True, kv_len=lengths)
    check("flash_attention fwd", out * valid[..., None, None],
          ref * valid[..., None, None], atol=2e-2)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, lengths).astype(jnp.float32)
        return jnp.sum((o * valid[..., None, None]) ** 2)

    def loss_ref(q, k, v):
        o = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                          v.astype(jnp.float32), causal=True,
                          kv_len=lengths).astype(jnp.float32)
        return jnp.sum((o * valid[..., None, None]) ** 2)

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, gr):
        check(f"flash_attention bwd d{name}", a, b, atol=0.0, rtol=3e-2)

    # --- GQA-folded cached-chunk flash (suffix-over-prefix path) ----------
    from video3d_tpu.kernels.flash_attention import flash_attention_gqa_folded

    Sg, Lg, Hg, KVg = 768, 64, 28, 4            # Qwen2-7B head layout
    qg = jax.random.normal(nk(), (B, Lg, Hg, hd), jnp.bfloat16)
    kg = jax.random.normal(nk(), (B, Sg, KVg, hd), jnp.bfloat16)
    vg = jax.random.normal(nk(), (B, Sg, KVg, hd), jnp.bfloat16)
    offs = jnp.asarray([640, 500], jnp.int32)
    lens_g = jnp.asarray([704, 564], jnp.int32)
    qpos = offs[:, None] + jnp.arange(Lg)[None]
    out = jax.jit(flash_attention_gqa_folded)(qg, kg, vg, lens_g, offs)
    ref = mha_reference(qg.astype(jnp.float32), kg.astype(jnp.float32),
                        vg.astype(jnp.float32), causal=True,
                        q_positions=qpos, kv_len=lens_g)
    check("flash_attention gqa-folded chunk", out, ref, atol=2e-2)

    k8 = jnp.clip(jnp.round(kg.astype(jnp.float32) * 32), -127, 127) \
        .astype(jnp.int8)
    v8 = jnp.clip(jnp.round(vg.astype(jnp.float32) * 32), -127, 127) \
        .astype(jnp.int8)
    sc = jnp.full((B, Sg, KVg, 1), 1 / 32, jnp.float32)
    out = jax.jit(flash_attention_gqa_folded)(qg, k8, v8, lens_g, offs,
                                              k_scale=sc, v_scale=sc)
    ref = mha_reference(qg.astype(jnp.float32),
                        k8.astype(jnp.float32) / 32,
                        v8.astype(jnp.float32) / 32, causal=True,
                        q_positions=qpos, kv_len=lens_g)
    check("flash_attention gqa-folded int8 cache", out, ref, atol=4e-2)

    # --- shared-prefix split-softmax attention (scene-grouped batch) ------
    from video3d_tpu.kernels.attention import mha_shared_prefix_reference
    from video3d_tpu.kernels.flash_attention import (
        flash_attention_shared_prefix)

    Pg = 640
    pk = jax.random.normal(nk(), (Pg, KVg, hd), jnp.bfloat16)
    pv = jax.random.normal(nk(), (Pg, KVg, hd), jnp.bfloat16)
    skg = jax.random.normal(nk(), (B, Lg, KVg, hd), jnp.bfloat16)
    svg = jax.random.normal(nk(), (B, Lg, KVg, hd), jnp.bfloat16)
    slens = jnp.asarray([Lg, 37], jnp.int32)
    out = jax.jit(flash_attention_shared_prefix)(qg, pk, pv, skg, svg, slens)
    ref = mha_shared_prefix_reference(
        qg.astype(jnp.float32), pk.astype(jnp.float32),
        pv.astype(jnp.float32), skg.astype(jnp.float32),
        svg.astype(jnp.float32), slens)
    valid_sp = (jnp.arange(Lg)[None] < slens[:, None])[..., None, None]
    check("flash_attention shared-prefix", out * valid_sp, ref * valid_sp,
          atol=2e-2)

    pk8 = jnp.clip(jnp.round(pk.astype(jnp.float32) * 32), -127, 127) \
        .astype(jnp.int8)
    pv8 = jnp.clip(jnp.round(pv.astype(jnp.float32) * 32), -127, 127) \
        .astype(jnp.int8)
    psc = jnp.full((Pg, KVg, 1), 1 / 32, jnp.float32)
    out = jax.jit(flash_attention_shared_prefix)(
        qg, pk8, pv8, skg, svg, slens, pk_scale=psc, pv_scale=psc)
    ref = mha_shared_prefix_reference(
        qg.astype(jnp.float32), pk8.astype(jnp.float32) / 32,
        pv8.astype(jnp.float32) / 32, skg.astype(jnp.float32),
        svg.astype(jnp.float32), slens)
    check("flash_attention shared-prefix int8", out * valid_sp,
          ref * valid_sp, atol=4e-2)

    # the split (two-kernel + lse merge) variant stays checked on chip too
    from video3d_tpu.kernels import flash_attention as _fa

    _fa.SP_FUSED = False
    try:
        # distinct static block args -> fresh trace (the module flag is
        # read at trace time; the default-args trace is already cached)
        out = flash_attention_shared_prefix(qg, pk, pv, skg, svg, slens,
                                            block_q_prefix=512,
                                            block_k=512)
    finally:
        _fa.SP_FUSED = True
    ref = mha_shared_prefix_reference(
        qg.astype(jnp.float32), pk.astype(jnp.float32),
        pv.astype(jnp.float32), skg.astype(jnp.float32),
        svg.astype(jnp.float32), slens)
    check("flash_attention shared-prefix split", out * valid_sp,
          ref * valid_sp, atol=2e-2)

    # --- decode attention (bf16 cache, then int8 cache + scales) -----------
    S = 256
    qd = jax.random.normal(nk(), (B, 1, H, hd), jnp.bfloat16)
    kc = jax.random.normal(nk(), (B, S, KV, hd), jnp.bfloat16)
    vc = jax.random.normal(nk(), (B, S, KV, hd), jnp.bfloat16)
    kv_len = jnp.asarray([S, 130], jnp.int32)
    out = jax.jit(decode_attention)(qd, kc, vc, kv_len)
    ref = mha_reference(qd.astype(jnp.float32), kc.astype(jnp.float32),
                        vc.astype(jnp.float32),
                        q_positions=(kv_len - 1)[:, None], kv_len=kv_len)
    check("decode_attention bf16", out, ref, atol=2e-2)

    kscale = jnp.max(jnp.abs(kc).astype(jnp.float32), axis=-1,
                     keepdims=True) / 127.0 + 1e-8
    vscale = jnp.max(jnp.abs(vc).astype(jnp.float32), axis=-1,
                     keepdims=True) / 127.0 + 1e-8
    kq = jnp.round(kc.astype(jnp.float32) / kscale).astype(jnp.int8)
    vq = jnp.round(vc.astype(jnp.float32) / vscale).astype(jnp.int8)
    out = jax.jit(decode_attention)(qd, kq, vq, kv_len, k_scale=kscale,
                                    v_scale=vscale)
    ref = mha_reference(qd.astype(jnp.float32),
                        kq.astype(jnp.float32) * kscale,
                        vq.astype(jnp.float32) * vscale,
                        q_positions=(kv_len - 1)[:, None], kv_len=kv_len)
    check("decode_attention int8", out, ref, atol=3e-2)

    # int4 cache: Mosaic must load s4 refs (XLA stores them nibble-packed)
    # and the f32 convert+rescale must match the dequantized reference
    k4s = jnp.max(jnp.abs(kc).astype(jnp.float32), axis=-1,
                  keepdims=True) / 7.0 + 1e-8
    v4s = jnp.max(jnp.abs(vc).astype(jnp.float32), axis=-1,
                  keepdims=True) / 7.0 + 1e-8
    # int4 arrays never cross the jit boundary: passing an int4 device
    # array as a jit ARG trips a device_put "Recursively calling jit"
    # RecursionError on the axon tunnel platform (r4) — quantize INSIDE
    # the jit from int8 carriers instead (bit-identical values)
    k4i = jnp.clip(jnp.round(kc.astype(jnp.float32) / k4s), -7, 7) \
        .astype(jnp.int8)
    v4i = jnp.clip(jnp.round(vc.astype(jnp.float32) / v4s), -7, 7) \
        .astype(jnp.int8)
    out = jax.jit(lambda q_, k_, v_, l_, ks_, vs_: decode_attention(
        q_, k_.astype(jnp.int4), v_.astype(jnp.int4), l_, k_scale=ks_,
        v_scale=vs_))(qd, k4i, v4i, kv_len, k4s, v4s)
    ref = mha_reference(qd.astype(jnp.float32),
                        k4i.astype(jnp.float32) * k4s,
                        v4i.astype(jnp.float32) * v4s,
                        q_positions=(kv_len - 1)[:, None], kv_len=kv_len)
    check("decode_attention int4", out, ref, atol=3e-2)

    k4gi = jnp.clip(jnp.round(kg.astype(jnp.float32) * 4), -7, 7) \
        .astype(jnp.int8)
    v4gi = jnp.clip(jnp.round(vg.astype(jnp.float32) * 4), -7, 7) \
        .astype(jnp.int8)
    sc4 = jnp.full((B, Sg, KVg, 1), 1 / 4, jnp.float32)
    out = jax.jit(lambda q_, k_, v_, l_, o_, ks_, vs_:
                  flash_attention_gqa_folded(
                      q_, k_.astype(jnp.int4), v_.astype(jnp.int4), l_, o_,
                      k_scale=ks_, v_scale=vs_))(
        qg, k4gi, v4gi, lens_g, offs, sc4, sc4)
    ref = mha_reference(qg.astype(jnp.float32),
                        k4gi.astype(jnp.float32) / 4,
                        v4gi.astype(jnp.float32) / 4, causal=True,
                        q_positions=qpos, kv_len=lens_g)
    check("flash_attention gqa-folded int4 cache", out, ref, atol=8e-2)

    # --- blocked long-cache decode (S > single-pass VMEM budget, r4) ------
    Sl = 12288
    kl = jax.random.normal(nk(), (1, Sl, KV, hd), jnp.bfloat16)
    vl = jax.random.normal(nk(), (1, Sl, KV, hd), jnp.bfloat16)
    lenl = jnp.asarray([Sl - 100], jnp.int32)
    qdl = jax.random.normal(nk(), (1, 1, H, hd), jnp.bfloat16)
    out = jax.jit(decode_attention)(qdl, kl, vl, lenl)
    ref = mha_reference(qdl.astype(jnp.float32), kl.astype(jnp.float32),
                        vl.astype(jnp.float32),
                        q_positions=(lenl - 1)[:, None], kv_len=lenl)
    check("decode_attention blocked 12k cache", out, ref, atol=2e-2)

    # --- paged decode attention (via the dispatcher, hits the kernel) ------
    P, page, maxp = 8, 128, 3
    # r5 flat page layout (P, page, KV*hd)
    kp = jax.random.normal(nk(), (P, page, KV * hd), jnp.bfloat16)
    vp = jax.random.normal(nk(), (P, page, KV * hd), jnp.bfloat16)
    table = jnp.asarray([[0, 3, 5], [2, 6, 1]], jnp.int32)
    plen = jnp.asarray([page * 2 + 7, page + 1], jnp.int32)
    out = jax.jit(paged_mha)(qd, kp, vp, table, plen)
    ref = paged_attention_reference(qd.astype(jnp.float32),
                                    kp.astype(jnp.float32),
                                    vp.astype(jnp.float32), table, plen)
    check("paged_decode_attention bf16", out, ref, atol=2e-2)

    # --- fused geometry (bit-exact contract vs the composed-op chain) ------
    Vf = 2
    depths = jax.random.randint(nk(), (Vf, 480, 640), 0, 8000, jnp.int32)
    intr = jnp.asarray(np.array(
        [[577.87, 0, 319.5, 0], [0, 577.87, 239.5, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]], np.float32))
    poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (Vf, 4, 4))
    got = fused_patch_voxel_coords(depths, intr, poses)
    want = reference_patch_voxel_coords(depths, intr, poses)
    check("fused_patch_voxel_coords (exact)", got, want, atol=0.0,
          exact=True)

    # --- weight-only quant matmuls ------------------------------------------
    w = jax.random.normal(nk(), (512, 1024), jnp.float32)
    x = jax.random.normal(nk(), (1, 512), jnp.bfloat16)
    d8 = quant.quantize_weight(w)
    out = int8_matmul(x, d8["q"], d8["scale"])
    ref = (x.astype(jnp.float32) @ d8["q"].astype(jnp.float32)) * d8["scale"]
    check("int8_matmul B=1 (VPU matvec)", out, ref, atol=0.0, rtol=2e-2)
    x8 = jax.random.normal(nk(), (8, 512), jnp.bfloat16)
    out = int8_matmul(x8, d8["q"], d8["scale"])
    ref = (x8.astype(jnp.float32) @ d8["q"].astype(jnp.float32)) * d8["scale"]
    check("int8_matmul B=8 (MXU tiles)", out, ref, atol=0.0, rtol=2e-2)

    w4 = quant.quantize_weight_int4(w)
    out = quant.matmul(x, w4)          # dispatches to the int4 kernel on TPU
    deq = unpack_int4(w4.q4).astype(jnp.float32) * jnp.repeat(
        w4.scale4.astype(jnp.float32), w4.group, axis=0)
    ref = x.astype(jnp.float32) @ deq[:512, :1024]
    check("int4_matmul B=1 (packed nibbles)", out, ref, atol=0.0, rtol=3e-2)

    # --- on-device greedy max-coverage (exact set cover) --------------------
    Vn, N, M = 6, 500, 300
    fv = jax.random.randint(nk(), (Vn, N, 3), 0, 12, jnp.int32)
    sv = jax.random.randint(nk(), (M, 3), 0, 12, jnp.int32)
    order, gains, num_all = jax.jit(greedy_select_frames,
                                    static_argnames=("max_frames",))(
        fv, sv, max_frames=Vn)
    # host greedy oracle (lowest-index tie-break, like the kernel)
    fv_np, sv_np = np.asarray(fv), np.asarray(sv)
    scene = {tuple(r) for r in sv_np.reshape(-1, 3)}
    sets = [({tuple(r) for r in fv_np[i]} & scene) for i in range(Vn)]
    used, expect_order, expect_gains = set(), [], []
    for _ in range(Vn):
        counts = [len(s - used) for s in sets]
        for i in expect_order:
            counts[i] = -1
        pick = int(np.argmax(counts))
        expect_order.append(pick)
        expect_gains.append(counts[pick])
        used |= sets[pick]
    check("greedy_select_frames order (exact)", order,
          np.asarray(expect_order), atol=0.0, exact=True)
    check("greedy_select_frames gains (exact)", gains,
          np.asarray(expect_gains), atol=0.0, exact=True)
    check("greedy_select_frames num_all (exact)", num_all,
          np.asarray(len(set().union(*sets))), atol=0.0, exact=True)

    if FAILED:
        print(f"\n{len(FAILED)} check(s) FAILED: {FAILED}")
        sys.exit(1)
    print("\nall on-chip kernel checks passed")


if __name__ == "__main__":
    main()
