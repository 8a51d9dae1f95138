"""Beam-search decode golden vs HF ``generate(num_beams=K)`` on identical
tiny Qwen2 weights (the reference gets beam search from HF generate;
model_scanqa.py:230 exposes --num_beams)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from video3d_tpu.config import LLMConfig, ModelConfig, replace
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models.beam_search import generate_beam
from video3d_tpu.models.splice import build_splice_plan
from video3d_tpu.models.weights import convert_qwen2

TINY = LLMConfig(vocab_size=32, hidden_size=64, intermediate_size=128,
                 num_hidden_layers=2, num_attention_heads=4,
                 num_key_value_heads=2, head_dim=16,
                 max_position_embeddings=512, rope_theta=10000.0,
                 mrope_section=(4, 2, 2))
CFG = replace(ModelConfig.tiny(), llm=TINY)
EOS = 7


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(3)
    cfg = Qwen2Config(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        num_key_value_heads=TINY.num_key_value_heads,
        head_dim=TINY.head_dim,
        max_position_embeddings=TINY.max_position_embeddings,
        rope_theta=TINY.rope_theta, rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=False, attn_implementation="eager")
    return Qwen2ForCausalLM(cfg).eval()


@pytest.fixture(scope="module")
def params(hf_model):
    return {"llm": convert_qwen2(hf_model.state_dict(), TINY)}


def _text_batch(ids, max_new):
    plan = build_splice_plan([list(ids)], None, [0], tokens_per_frame=0,
                             max_len=len(ids) + max_new, grid_side=1)
    return lv3d.Batch(
        images=None, patch_coords=None,
        text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
        vision_index=jnp.asarray(plan.vision_index),
        labels=jnp.asarray(plan.labels),
        position_ids=jnp.asarray(plan.position_ids),
        mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
        seq_len=jnp.asarray(plan.seq_len),
        coord_mask=jnp.asarray(plan.coord_mask))


def _dummy_vision(cfg):
    # text-only prompt: the spliced stream gathers no vision rows
    return jnp.zeros((1, 1, cfg.llm.hidden_size), jnp.float32)


class TestBeamGolden:
    @pytest.mark.parametrize("prompt_seed,num_beams,early,lp", [
        (0, 3, True, 1.0),
        (1, 3, False, 1.0),
        (2, 4, False, 2.0),
        (5, 2, True, 0.5),
    ])
    def test_matches_hf(self, hf_model, params, prompt_seed, num_beams,
                        early, lp):
        rng = np.random.default_rng(prompt_seed)
        ids = rng.integers(8, 31, size=6).tolist()
        max_new = 10

        hf_out = hf_model.generate(
            torch.tensor([ids]), num_beams=num_beams, do_sample=False,
            max_new_tokens=max_new, eos_token_id=EOS, pad_token_id=0,
            early_stopping=early, length_penalty=lp)
        want = hf_out[0, len(ids):].numpy()

        res = generate_beam(params, CFG, _text_batch(ids, max_new),
                            num_beams=num_beams, max_new_tokens=max_new,
                            eos_token_id=EOS, cache_dtype=jnp.float32,
                            length_penalty=lp, early_stopping=early,
                            vision_features=_dummy_vision(CFG))
        got = np.asarray(res.tokens)[0]
        n = int(res.lengths[0])
        # HF pads the returned row with pad_token (0) after the EOS
        want_gen = [t for t in want.tolist() if t != 0]
        if want_gen and want_gen[-1] == EOS:
            want_core = want_gen[:-1]
        else:
            want_core = want_gen
        assert got[:n].tolist() == want_core, (got[:n], want, n)

    def test_greedy_is_beam1(self, params):
        from video3d_tpu.models.generate import generate_greedy

        ids = [9, 10, 11, 12]
        g = generate_greedy(params, CFG, _text_batch(ids, 8),
                            max_new_tokens=8, eos_token_id=EOS,
                            cache_dtype=jnp.float32,
                            vision_features=_dummy_vision(CFG))
        b = generate_beam(params, CFG, _text_batch(ids, 8), num_beams=1,
                          max_new_tokens=8, eos_token_id=EOS,
                          cache_dtype=jnp.float32,
                          vision_features=_dummy_vision(CFG))
        np.testing.assert_array_equal(np.asarray(g.tokens), np.asarray(b.tokens))

    def test_batched_shapes(self, params):
        """B=2 with different prompt lengths runs and returns per-sample
        hypotheses (structural; the padded splice handles the batch)."""
        ids_a, ids_b = [9, 10, 11, 12, 13, 14], [15, 16, 17]
        plan = build_splice_plan([ids_a, ids_b], None, [0, 0],
                                 tokens_per_frame=0, max_len=16, grid_side=1)
        batch = lv3d.Batch(
            images=None, patch_coords=None,
            text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
            vision_index=jnp.asarray(plan.vision_index),
            labels=jnp.asarray(plan.labels),
            position_ids=jnp.asarray(plan.position_ids),
            mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
            seq_len=jnp.asarray(plan.seq_len),
            coord_mask=jnp.asarray(plan.coord_mask))
        res = generate_beam(params, CFG, batch, num_beams=3,
                            max_new_tokens=6, eos_token_id=EOS,
                            cache_dtype=jnp.float32,
                            vision_features=jnp.zeros((2, 1, TINY.hidden_size)))
        assert res.tokens.shape == (2, 6)
        assert (np.asarray(res.lengths) <= 6).all()
