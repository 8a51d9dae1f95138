"""7B-shaped weight-import rehearsal (VERDICT r2 #8).

Generates an HF-layout SHARDED safetensors checkpoint with the TRUE
LLaVA-Video-7B-Qwen2 tensor shapes/dtypes on disk — 28-layer/3584-wide
Qwen2-7B (q/k/v bias, untied 152064-row lm_head) + 26-layer SigLIP-so400m
tower + mlp2x_gelu projector + image_newline, bf16, split into ~4 GB
shards with a model.safetensors.index.json — then times
``builder.load_pretrained_model`` over it on the host (CPU), exercising
the vocab-151649 overwrite and untied-head paths the ScanQA driver uses
(reference model/builder.py:206-228, model_scanqa.py:94-101 ->
overwrite_config={"vocab_size": 151649, "tie_word_embeddings": False}).

Reports one JSON line: checkpoint bytes, shard count, generate/load/convert
wall seconds, peak RSS. Run (CPU; ~16 GB disk under --dir, ~35 GB RAM):

    python scripts/bench/weights_import_7b.py [--dir /tmp/ckpt7b] [--keep]

The slow-marked suite twin (tests/test_weights_import_7b.py) runs the same
machinery at full shape when the host has the headroom.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

SHARD_BYTES = 4 * 1024 ** 3          # HF default ~4 GB shards


def _qwen2_7b_tensors(n_layers=28, hidden=3584, kv=512, inter=18944,
                      vocab=152064):
    """(name, shape) in HF Qwen2ForCausalLM layout, true 7B sizes."""
    yield "model.embed_tokens.weight", (vocab, hidden)
    for i in range(n_layers):
        p = f"model.layers.{i}."
        yield p + "input_layernorm.weight", (hidden,)
        yield p + "self_attn.q_proj.weight", (hidden, hidden)
        yield p + "self_attn.q_proj.bias", (hidden,)
        yield p + "self_attn.k_proj.weight", (kv, hidden)
        yield p + "self_attn.k_proj.bias", (kv,)
        yield p + "self_attn.v_proj.weight", (kv, hidden)
        yield p + "self_attn.v_proj.bias", (kv,)
        yield p + "self_attn.o_proj.weight", (hidden, hidden)
        yield p + "post_attention_layernorm.weight", (hidden,)
        yield p + "mlp.gate_proj.weight", (inter, hidden)
        yield p + "mlp.up_proj.weight", (inter, hidden)
        yield p + "mlp.down_proj.weight", (hidden, inter)
    yield "model.norm.weight", (hidden,)
    yield "lm_head.weight", (vocab, hidden)          # untied


def _siglip_so400m_tensors(n_layers=26, hidden=1152, inter=4304,
                           patch=14, positions=729):
    """SigLIP-so400m-patch14-384 with the reference's last-layer deletion
    already applied (siglip_encoder.py:570: 27 -> 26 stored layers)."""
    pre = "model.vision_tower.vision_tower.vision_model."
    yield pre + "embeddings.patch_embedding.weight", (hidden, 3, patch, patch)
    yield pre + "embeddings.patch_embedding.bias", (hidden,)
    yield pre + "embeddings.position_embedding.weight", (positions, hidden)
    for i in range(n_layers):
        p = pre + f"encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            yield p + ln + ".weight", (hidden,)
            yield p + ln + ".bias", (hidden,)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            yield p + f"self_attn.{proj}.weight", (hidden, hidden)
            yield p + f"self_attn.{proj}.bias", (hidden,)
        yield p + "mlp.fc1.weight", (inter, hidden)
        yield p + "mlp.fc1.bias", (inter,)
        yield p + "mlp.fc2.weight", (hidden, inter)
        yield p + "mlp.fc2.bias", (hidden,)
    yield pre + "post_layernorm.weight", (hidden,)
    yield pre + "post_layernorm.bias", (hidden,)


def _glue_tensors(hidden=3584, vis=1152):
    yield "model.mm_projector.0.weight", (hidden, vis)
    yield "model.mm_projector.0.bias", (hidden,)
    yield "model.mm_projector.2.weight", (hidden, hidden)
    yield "model.mm_projector.2.bias", (hidden,)
    yield "model.image_newline", (hidden,)


def make_sharded_checkpoint(path: str, llm_layers=28, vision_layers=26,
                            shard_bytes=SHARD_BYTES):
    """Write the sharded bf16 checkpoint + index + config.json; returns
    (total_bytes, n_shards)."""
    import ml_dtypes
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    tensors = (list(_qwen2_7b_tensors(n_layers=llm_layers))
               + list(_siglip_so400m_tensors(n_layers=vision_layers))
               + list(_glue_tensors()))
    shards, cur, cur_bytes = [], {}, 0
    for name, shape in tensors:
        nbytes = int(np.prod(shape)) * 2
        if cur and cur_bytes + nbytes > shard_bytes:
            shards.append(cur)
            cur, cur_bytes = {}, 0
        cur[name] = shape
        cur_bytes += nbytes
    shards.append(cur)

    index = {"metadata": {"total_size": 0}, "weight_map": {}}
    total = 0
    for si, shard in enumerate(shards):
        fname = f"model-{si + 1:05d}-of-{len(shards):05d}.safetensors"
        arrs = {}
        for name, shape in shard.items():
            # zeros: calloc-fast; conversion cost (transpose + dtype copy)
            # is shape-dependent, not value-dependent
            arrs[name] = np.zeros(shape, dtype=ml_dtypes.bfloat16)
            index["weight_map"][name] = fname
            total += arrs[name].nbytes
        save_file(arrs, os.path.join(path, fname))
        del arrs
    index["metadata"]["total_size"] = total
    with open(os.path.join(path, "model.safetensors.index.json"), "w") as f:
        json.dump(index, f)

    config = {
        "model_type": "qwen2", "vocab_size": 152064, "hidden_size": 3584,
        "intermediate_size": 18944, "num_hidden_layers": llm_layers,
        "num_attention_heads": 28, "num_key_value_heads": 4,
        "rope_theta": 1000000.0, "rms_norm_eps": 1e-6,
        "max_position_embeddings": 32768, "tie_word_embeddings": False,
        "tokenizer_model_max_length": 32768,
        "world_position_embedding_type": "avg-mlp-sin3d-discrete",
        "voxel_size": 0.1, "min_xyz_range": [-15, -15, -5],
        "max_xyz_range": [15, 15, 5],
        "object_feature_type": "patch14-pe",
        "image_aspect_ratio": "anyres",
        "mm_patch_merge_type": "spatial_unpad",
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f)
    return total, len(shards)


def run_rehearsal(path: str) -> dict:
    """Timed load_pretrained_model over the sharded checkpoint (CPU)."""
    import jax

    jax.config.update("jax_platforms", "cpu")   # never ship 15 GB up a tunnel
    import jax.numpy as jnp

    from video3d_tpu.models.builder import load_pretrained_model

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.time()
    # the ScanQA eval drivers' exact overwrite (model_scanqa.py:94-101)
    tok, params, cfg, context_len = load_pretrained_model(
        path, load_tokenizer=False,
        overwrite_config={"vocab_size": 151649,
                          "tie_word_embeddings": False})
    wall = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    # shape/dtype/branch assertions: true 7B geometry, untied head, vocab
    # overwrite applied to the config while the stored rows stay 152064
    assert cfg.llm.vocab_size == 151649 and not cfg.llm.tie_word_embeddings
    assert cfg.llm.hidden_size == 3584
    assert params["llm"]["embed_tokens"].shape == (152064, 3584)
    assert params["llm"]["lm_head"].shape == (3584, 152064)
    assert params["llm"]["lm_head"].dtype == jnp.bfloat16
    assert params["vision"]["patch_embed"]["w"].shape == (3 * 14 * 14, 1152)
    assert len(params["vision"]["layers"]) == cfg.vision.num_hidden_layers
    assert params["projector"]["w1"].shape == (1152, 3584)
    assert context_len == 32768
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    return {"load_convert_s": round(wall, 2),
            "peak_rss_gib": round(rss1 / 1024 ** 2, 2),
            "rss_before_gib": round(rss0 / 1024 ** 2, 2),
            "n_params_b": round(n_params / 1e9, 3),
            "llm_layers": cfg.llm.num_hidden_layers,
            "vision_layers": cfg.vision.num_hidden_layers}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ckpt7b_rehearsal")
    ap.add_argument("--llm-layers", type=int, default=28)
    ap.add_argument("--vision-layers", type=int, default=26)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    t0 = time.time()
    total, n_shards = make_sharded_checkpoint(
        args.dir, llm_layers=args.llm_layers,
        vision_layers=args.vision_layers)
    gen_s = time.time() - t0
    out = {"ckpt_gib": round(total / 1024 ** 3, 2), "shards": n_shards,
           "generate_s": round(gen_s, 2)}
    out.update(run_rehearsal(args.dir))
    print(json.dumps(out))
    if not args.keep:
        shutil.rmtree(args.dir, ignore_errors=True)
    return out


if __name__ == "__main__":
    main()
