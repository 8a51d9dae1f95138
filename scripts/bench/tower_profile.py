"""SigLIP tower MFU profiling (VERDICT r2 #7: cold-chain 61% -> >=70%).

BENCH_NOTES attributes the cold-chain MFU gap to the 26-layer tower stage
(~42 ms for the V=8 batch, ~64% MFU vs the prefill's 71%). This script
measures isolated tower variants on the real chip, one mode per process
(remote tunnel: 1-2 jits / 500+ s budget):

  base     the production tower: (8, 729, 1152) bf16, einsum attention.
  pad768   pad_seq_to=768 fast path (MXU-aligned score/prob tiles,
           masked pad keys; +5.3%% FLOPs on MLP/proj rows).
  noattn   attention einsums+softmax replaced by the v tensor (projections
           kept): isolates the score/softmax/value cost from the gemms.
  qkv      base but with q/k/v computed via one concatenated (D, 3D) gemm
           (weights concatenated once outside the timing loop).

On-device lax.fori_loop timing, inputs perturbed per iteration (BENCH_NOTES
measurement methodology). Analytic FLOPs per 8-frame batch: 26 layers *
8 * (2*729*(4*1152^2 + 2*1152*4304) + 2*2*729^2*1152) = 5.13 TF.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[2] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from video3d_tpu.config import VisionConfig  # noqa: E402
from video3d_tpu.models import siglip  # noqa: E402

B = 8
PEAK = 197.0


def tower_flops(cfg, n_seq):
    d, i = cfg.hidden_size, cfg.intermediate_size
    per_layer = (2 * n_seq * (4 * d * d + 2 * d * i)
                 + 2 * 2 * n_seq * n_seq * d)
    return cfg.num_hidden_layers * B * per_layer


def _run(name, fn, params, px, iters, flops):
    @jax.jit
    def repeat(params, px):
        def body(i, acc):
            return acc + jnp.sum(
                fn(params, px + i.astype(px.dtype) * 1e-6)[:, -1]
                .astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    print(f"compiling {name}...", flush=True)
    for _ in range(2):
        total = float(repeat(params, px))
    t0 = time.perf_counter()
    total = float(repeat(params, px))
    dt = (time.perf_counter() - t0) / iters
    assert total == total
    print(json.dumps({
        "mode": name, "batch_ms": round(1e3 * dt, 2),
        "tflops_effective": round(flops / dt / 1e12, 1),
        "mfu_pct": round(100 * flops / dt / 1e12 / PEAK, 1)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["base", "pad768", "noattn", "qkv"])
    ap.add_argument("--iters", type=int, default=20)
    a = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)

    cfg = VisionConfig()
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        siglip.init_vision_tower(jax.random.PRNGKey(0), cfg, jnp.float32))
    px = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, 3, cfg.image_size, cfg.image_size)), jnp.bfloat16)
    fl = tower_flops(cfg, cfg.num_patches)

    if a.mode == "base":
        _run("tower_base", lambda p, x: siglip.vision_tower_forward(
            p, x, cfg), params, px, a.iters, fl)
    elif a.mode == "pad768":
        _run("tower_pad768", lambda p, x: siglip.vision_tower_forward(
            p, x, cfg, pad_seq_to=768), params, px, a.iters, fl)
    elif a.mode == "noattn":
        def noattn_layer(p, x):
            h = siglip._layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"],
                                   cfg.layer_norm_eps)
            # projections kept, score/softmax/value einsums removed
            v = h @ p["attn"]["wv"] + p["attn"]["bv"]
            q = h @ p["attn"]["wq"] + p["attn"]["bq"]
            k = h @ p["attn"]["wk"] + p["attn"]["bk"]
            v = v + (q[:, :1] + k[:, :1]) * jnp.bfloat16(1e-6)  # keep q,k live
            x = x + (v @ p["attn"]["wo"] + p["attn"]["bo"])
            h = siglip._layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"],
                                   cfg.layer_norm_eps)
            h = siglip.gelu_tanh(h @ p["mlp"]["w1"] + p["mlp"]["b1"])
            return x + (h @ p["mlp"]["w2"] + p["mlp"]["b2"])

        def noattn_tower(p, x):
            x = siglip.patchify(x, cfg.patch_size).astype(jnp.bfloat16)
            x = x @ p["patch_embed"]["w"] + p["patch_embed"]["b"]
            x = x + p["pos_embed"]
            for lp in p["layers"]:
                x = noattn_layer(lp, x)
            return x

        fl_noattn = cfg.num_hidden_layers * B * 2 * cfg.num_patches * (
            4 * cfg.hidden_size ** 2
            + 2 * cfg.hidden_size * cfg.intermediate_size)
        _run("tower_noattn", noattn_tower, params, px, a.iters, fl_noattn)
    else:  # qkv fused
        def fuse(p):
            lp = []
            for layer in p["layers"]:
                at = layer["attn"]
                lp.append({**layer, "attn": {
                    "wqkv": jnp.concatenate([at["wq"], at["wk"], at["wv"]],
                                            axis=1),
                    "bqkv": jnp.concatenate([at["bq"], at["bk"], at["bv"]]),
                    "wo": at["wo"], "bo": at["bo"]}})
            return {**p, "layers": lp}

        def qkv_layer(p, x):
            hN = cfg.num_attention_heads
            Bx, N, D = x.shape
            hd = D // hN
            h = siglip._layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"],
                                   cfg.layer_norm_eps)
            qkv = (h @ p["attn"]["wqkv"] + p["attn"]["bqkv"]).reshape(
                Bx, N, 3, hN, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
            probs = jax.nn.softmax(scores.astype(jnp.float32),
                                   axis=-1).astype(x.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(Bx, N, D)
            x = x + (out @ p["attn"]["wo"] + p["attn"]["bo"])
            h = siglip._layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"],
                                   cfg.layer_norm_eps)
            h = siglip.gelu_tanh(h @ p["mlp"]["w1"] + p["mlp"]["b1"])
            return x + (h @ p["mlp"]["w2"] + p["mlp"]["b2"])

        def qkv_tower(p, x):
            x = siglip.patchify(x, cfg.patch_size).astype(jnp.bfloat16)
            x = x @ p["patch_embed"]["w"] + p["patch_embed"]["b"]
            x = x + p["pos_embed"]
            for lp in p["layers"]:
                x = qkv_layer(lp, x)
            return x

        _run("tower_qkv_fused", qkv_tower, fuse(params), px, a.iters, fl)


if __name__ == "__main__":
    main()
