"""Greedy KV-cache generation must equal naive recompute-everything greedy
decoding on the tiny model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.config import ModelConfig
from video3d_tpu.constants import IMAGE_TOKEN_INDEX
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models import qwen2
from video3d_tpu.models.generate import generate_greedy
from video3d_tpu.models.splice import build_splice_plan

CFG = ModelConfig.tiny()
EOS = 7


@pytest.fixture(scope="module")
def setup():
    params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    B, V, S = 1, 2, CFG.vision.image_size
    images = rng.normal(size=(B, V, 3, S, S)).astype(np.float32)
    g = -(-CFG.vision.num_patches_per_side // CFG.spatial_pool_stride)
    coords = rng.uniform(0, 50, size=(B, V, g, g, 3)).astype(np.float32)
    T = CFG.tokens_per_frame
    ids = [3, 4, IMAGE_TOKEN_INDEX, 5, 6]
    plan = build_splice_plan([ids], None, [V], tokens_per_frame=T,
                             max_len=4 + V * T + 6, grid_side=g)
    batch = lv3d.Batch(
        images=jnp.asarray(images), patch_coords=jnp.asarray(coords),
        text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
        vision_index=jnp.asarray(plan.vision_index),
        labels=jnp.asarray(plan.labels),
        position_ids=jnp.asarray(plan.position_ids),
        mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
        seq_len=jnp.asarray(plan.seq_len))
    return params, batch, plan


def naive_greedy(params, batch, n_steps):
    """Recompute the full forward for every step (ground truth)."""
    vt = lv3d.encode_video(params, CFG, batch.images, batch.patch_coords)
    base = lv3d.assemble_embeds(params, CFG, vt.spliceable, batch.text_ids,
                                batch.kind, batch.vision_index)
    n = int(batch.seq_len[0])
    embeds = base[:, :n]
    out = []
    for _ in range(n_steps):
        Lc = embeds.shape[1]
        pos = jnp.broadcast_to(jnp.arange(Lc)[None, :, None], (1, Lc, 3))
        hidden, _ = qwen2.qwen2_forward(params["llm"], CFG.llm, embeds, pos)
        logits = qwen2.lm_head(params["llm"], hidden)[0, -1]
        tok = int(jnp.argmax(logits))
        out.append(tok)
        if tok == EOS:
            break
        embeds = jnp.concatenate(
            [embeds, qwen2.embed_tokens(params["llm"], jnp.asarray([[tok]]))], axis=1)
    return out


class TestGenerate:
    def test_matches_naive_greedy(self, setup):
        params, batch, plan = setup
        n_steps = 6
        ref = naive_greedy(params, batch, n_steps)
        res = generate_greedy(params, CFG, batch, max_new_tokens=n_steps,
                              eos_token_id=EOS, cache_dtype=jnp.float32)
        got = np.asarray(res.tokens)[0]
        for i, t in enumerate(ref):
            assert got[i] == t, (got, ref)
        # after EOS (if hit), remaining slots are eos-padded
        if ref and ref[-1] == EOS:
            assert (got[len(ref):] == EOS).all()

    def test_lengths_counts_pre_eos_tokens(self, setup):
        params, batch, plan = setup
        res = generate_greedy(params, CFG, batch, max_new_tokens=5,
                              eos_token_id=EOS, cache_dtype=jnp.float32)
        toks = np.asarray(res.tokens)[0]
        n = int(res.lengths[0])
        assert n <= 5
        assert not (toks[:n] == EOS).any()


class TestSampling:
    def test_greedy_when_temperature_zero(self, setup):
        params, batch, plan = setup
        a = generate_greedy(params, CFG, batch, max_new_tokens=4,
                            eos_token_id=EOS, cache_dtype=jnp.float32)
        b = generate_greedy(params, CFG, batch, max_new_tokens=4,
                            eos_token_id=EOS, cache_dtype=jnp.float32,
                            temperature=0.0, top_p=0.9)
        np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))

    def test_sampling_varies_with_key(self, setup):
        params, batch, plan = setup
        outs = []
        for seed in (0, 1, 2):
            r = generate_greedy(params, CFG, batch, max_new_tokens=6,
                                eos_token_id=EOS, cache_dtype=jnp.float32,
                                temperature=1.5,
                                rng_key=jax.random.PRNGKey(seed))
            outs.append(np.asarray(r.tokens)[0].tolist())
        assert len({tuple(o) for o in outs}) > 1, "sampling must vary"

    def test_top_p_filters_tail(self):
        from video3d_tpu.models.generate import sample_token
        # one dominant logit: top_p=0.5 keeps only it -> deterministic
        logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
        for seed in range(5):
            tok = sample_token(logits, jax.random.PRNGKey(seed), 1.0, 0.5)
            assert int(tok[0]) == 0


class TestWarpGoldenVsHF:
    def test_warp_logits_matches_hf_warper_chain(self):
        """warp_logits == HF TemperatureLogitsWarper -> TopKLogitsWarper ->
        TopPLogitsWarper on random logits (the exact processors the
        reference's generate kwargs instantiate)."""
        import torch
        from transformers.generation.logits_process import (
            TemperatureLogitsWarper, TopKLogitsWarper, TopPLogitsWarper)

        from video3d_tpu.models.generate import warp_logits

        rng = np.random.default_rng(0)
        logits = rng.normal(size=(3, 64)).astype(np.float32) * 3
        for temp, top_k, top_p in [(0.7, 0, 1.0), (1.3, 8, 1.0),
                                   (0.9, 0, 0.8), (1.0, 16, 0.6)]:
            t = torch.tensor(logits)
            t = TemperatureLogitsWarper(temp)(None, t)
            if top_k > 0:
                t = TopKLogitsWarper(top_k)(None, t)
            if top_p < 1.0:
                t = TopPLogitsWarper(top_p)(None, t)
            want = t.numpy()
            got = np.asarray(warp_logits(jnp.asarray(logits), temp, top_p,
                                         top_k))
            # same kept set and same kept values
            np.testing.assert_array_equal(np.isfinite(got),
                                          np.isfinite(want))
            m = np.isfinite(want)
            np.testing.assert_allclose(got[m], want[m], rtol=1e-5,
                                       atol=1e-5)
