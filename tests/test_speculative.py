"""Speculative decoding must be BIT-IDENTICAL to vanilla greedy decoding
(models/generate.py::generate_greedy) — greedy verification accepts exactly
the tokens the target itself would emit. Covers a perfect draft (the target
itself; every draft accepted) and a deliberately bad early-exit draft
(first layer only; rejections exercise the rollback path), at several
lookahead depths, with a B=2 batch of unequal prompt lengths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.config import ModelConfig
from video3d_tpu.constants import IMAGE_TOKEN_INDEX
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models.generate import generate_greedy
from video3d_tpu.models.speculative import (generate_speculative,
                                            self_draft_config,
                                            self_draft_params)
from video3d_tpu.models.splice import build_splice_plan

CFG = ModelConfig.tiny()
EOS = 7


@pytest.fixture(scope="module")
def setup():
    params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    B, V, S = 2, 2, CFG.vision.image_size
    images = rng.normal(size=(B, V, 3, S, S)).astype(np.float32)
    g = -(-CFG.vision.num_patches_per_side // CFG.spatial_pool_stride)
    coords = rng.uniform(0, 50, size=(B, V, g, g, 3)).astype(np.float32)
    T = CFG.tokens_per_frame
    ids = [[3, 4, IMAGE_TOKEN_INDEX, 5, 6],
           [9, IMAGE_TOKEN_INDEX, 11, 12, 13, 14, 15]]
    plan = build_splice_plan(ids, None, [V, V], tokens_per_frame=T,
                             max_len=8 + V * T + 6, grid_side=g)
    batch = lv3d.Batch(
        images=jnp.asarray(images), patch_coords=jnp.asarray(coords),
        text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
        vision_index=jnp.asarray(plan.vision_index),
        labels=jnp.asarray(plan.labels),
        position_ids=jnp.asarray(plan.position_ids),
        mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
        seq_len=jnp.asarray(plan.seq_len))
    return params, batch


N_NEW = 12


def _vanilla(params, batch):
    return generate_greedy(params, CFG, batch, max_new_tokens=N_NEW,
                           eos_token_id=EOS, cache_dtype=jnp.float32)


class TestSpeculative:
    @pytest.mark.parametrize("k_draft", [1, 3, 5])
    def test_perfect_draft_matches_vanilla(self, setup, k_draft):
        """Draft == target: every draft accepted, output identical."""
        params, batch = setup
        ref = _vanilla(params, batch)
        n_layers = CFG.llm.num_hidden_layers
        res = generate_speculative(
            params, self_draft_params(params, n_layers),
            CFG, self_draft_config(CFG.llm, n_layers), batch,
            num_draft_tokens=k_draft, max_new_tokens=N_NEW,
            eos_token_id=EOS, cache_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(ref.tokens))
        np.testing.assert_array_equal(np.asarray(res.lengths),
                                      np.asarray(ref.lengths))
        # a perfect draft means every verify pass advances K+1 tokens
        assert int(res.target_forwards) <= 1 + -(-N_NEW // (k_draft + 1)) + 1

    @pytest.mark.parametrize("k_draft", [2, 4])
    def test_bad_draft_still_exact(self, setup, k_draft):
        """1-layer early-exit draft: mostly rejected, output still exact."""
        params, batch = setup
        ref = _vanilla(params, batch)
        res = generate_speculative(
            params, self_draft_params(params, 1),
            CFG, self_draft_config(CFG.llm, 1), batch,
            num_draft_tokens=k_draft, max_new_tokens=N_NEW,
            eos_token_id=EOS, cache_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(ref.tokens))
        np.testing.assert_array_equal(np.asarray(res.lengths),
                                      np.asarray(ref.lengths))
        # even with zero accepts it can't need more than one forward/token
        assert int(res.target_forwards) <= N_NEW + 1

    def test_separate_draft_model(self, setup):
        """A standalone draft (different weights, same vocab/width) — exact
        output regardless of how wrong the draft is."""
        params, batch = setup
        draft_full = lv3d.init_model(jax.random.PRNGKey(1), CFG)
        ref = _vanilla(params, batch)
        res = generate_speculative(
            params, draft_full["llm"], CFG, CFG.llm, batch,
            num_draft_tokens=3, max_new_tokens=N_NEW,
            eos_token_id=EOS, cache_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(ref.tokens))


class TestRejectionSampling:
    def test_block_marginals_match_target(self):
        """Monte-Carlo over 200k keys: the first emission's marginal equals
        t_probs[0] exactly (the speculative-sampling theorem), and the
        second emission, conditioned on the first draft being accepted,
        equals t_probs[1] (valid here because the test dists are
        prefix-independent)."""
        from video3d_tpu.models.speculative import rejection_sample_block

        V, K, N = 5, 2, 200_000
        rng = np.random.default_rng(0)
        q = rng.dirichlet(np.ones(V), size=(1, K)).astype(np.float32)
        t = rng.dirichlet(np.ones(V), size=(1, K + 1)).astype(np.float32)
        qj, tj = jnp.asarray(q), jnp.asarray(t)

        def one(key):
            dkey, bkey = jax.random.split(key)
            d = jax.vmap(lambda i: jax.random.categorical(
                jax.random.fold_in(dkey, i), jnp.log(qj[0, i])))(
                    jnp.arange(K)).astype(jnp.int32)[None]      # (1, K)
            emit, a = rejection_sample_block(bkey, d, qj, tj)
            return emit[0], a[0]

        keys = jax.random.split(jax.random.PRNGKey(1), N)
        emits, accs = jax.vmap(one)(keys)
        emits, accs = np.asarray(emits), np.asarray(accs)

        hist0 = np.bincount(emits[:, 0], minlength=V) / N
        np.testing.assert_allclose(hist0, t[0, 0], atol=0.01)

        sel = accs >= 1            # first draft accepted -> emit[:,1] valid
        hist1 = np.bincount(emits[sel, 1], minlength=V) / sel.sum()
        np.testing.assert_allclose(hist1, t[0, 1], atol=0.01)

    def test_topk1_sampling_equals_greedy(self, setup):
        """top_k=1 collapses the warped distributions to the argmax, so
        sampled speculative must reproduce vanilla greedy exactly."""
        params, batch = setup
        ref = _vanilla(params, batch)
        res = generate_speculative(
            params, self_draft_params(params, 1),
            CFG, self_draft_config(CFG.llm, 1), batch,
            num_draft_tokens=3, max_new_tokens=N_NEW, eos_token_id=EOS,
            cache_dtype=jnp.float32, temperature=0.7, top_k=1,
            rng_key=jax.random.PRNGKey(5))
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(ref.tokens))
        np.testing.assert_array_equal(np.asarray(res.lengths),
                                      np.asarray(ref.lengths))

    def test_sampled_spec_runs_and_respects_budget(self, setup):
        params, batch = setup
        res = generate_speculative(
            params, self_draft_params(params, CFG.llm.num_hidden_layers),
            CFG, CFG.llm, batch, num_draft_tokens=4, max_new_tokens=N_NEW,
            eos_token_id=EOS, cache_dtype=jnp.float32, temperature=1.0,
            top_p=0.9, rng_key=jax.random.PRNGKey(3))
        toks = np.asarray(res.tokens)
        lens = np.asarray(res.lengths)
        assert toks.shape == (2, N_NEW)
        assert (lens <= N_NEW).all()
        for b in range(2):
            # eos-padded beyond the emitted region
            if lens[b] < N_NEW:
                assert (toks[b, lens[b]:] == EOS).any()


class TestInt8CacheInterplay:
    def test_spec_with_int8_kv_cache_matches_vanilla_int8(self):
        """Speculative + int8 KV cache: the multi-token verify forward goes
        through the quantized-cache attention path; output must equal
        vanilla greedy decoding with the SAME int8 cache."""
        import jax as _jax

        params = lv3d.init_model(_jax.random.PRNGKey(0), CFG)
        rng = np.random.default_rng(0)
        B, V, S = 1, 2, CFG.vision.image_size
        images = rng.normal(size=(B, V, 3, S, S)).astype(np.float32)
        g = -(-CFG.vision.num_patches_per_side // CFG.spatial_pool_stride)
        coords = rng.uniform(0, 50, size=(B, V, g, g, 3)).astype(np.float32)
        T = CFG.tokens_per_frame
        plan = build_splice_plan([[3, 4, IMAGE_TOKEN_INDEX, 5]], None, [V],
                                 tokens_per_frame=T, max_len=6 + V * T + 4,
                                 grid_side=g)
        batch = lv3d.Batch(
            images=jnp.asarray(images), patch_coords=jnp.asarray(coords),
            text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
            vision_index=jnp.asarray(plan.vision_index),
            labels=jnp.asarray(plan.labels),
            position_ids=jnp.asarray(plan.position_ids),
            mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
            seq_len=jnp.asarray(plan.seq_len))
        ref = generate_greedy(params, CFG, batch, max_new_tokens=8,
                              eos_token_id=EOS, cache_dtype=jnp.int8)
        res = generate_speculative(
            params, self_draft_params(params, 1),
            CFG, self_draft_config(CFG.llm, 1), batch,
            num_draft_tokens=3, max_new_tokens=8, eos_token_id=EOS,
            cache_dtype=jnp.int8)
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(ref.tokens))


class TestTruncatedDraftVocab:
    def test_greedy_still_exact(self, setup):
        """draft_vocab < vocab: the draft can only propose early token ids,
        but greedy output stays BIT-IDENTICAL (verification corrects)."""
        params, batch = setup
        ref = _vanilla(params, batch)
        res = generate_speculative(
            params, self_draft_params(params, 1, draft_vocab=8),
            CFG, self_draft_config(CFG.llm, 1), batch,
            num_draft_tokens=3, max_new_tokens=N_NEW, eos_token_id=EOS,
            cache_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(ref.tokens))
        np.testing.assert_array_equal(np.asarray(res.lengths),
                                      np.asarray(ref.lengths))

    def test_sampled_topk1_exact_with_truncated_vocab(self, setup):
        params, batch = setup
        ref = _vanilla(params, batch)
        res = generate_speculative(
            params, self_draft_params(params, 1, draft_vocab=8),
            CFG, self_draft_config(CFG.llm, 1), batch,
            num_draft_tokens=3, max_new_tokens=N_NEW, eos_token_id=EOS,
            cache_dtype=jnp.float32, temperature=0.5, top_k=1,
            rng_key=jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(ref.tokens))
