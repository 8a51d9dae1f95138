"""Static-shape jitted beam search over the multimodal prefill.

The reference inherits beam search from HF ``model.generate`` (the eval
drivers expose ``--num_beams``, model_scanqa.py:230; default 1 = greedy).
This reimplements HF's beam_search + BeamSearchScorer semantics
(transformers generation/beam_search.py) as one ``lax.while_loop`` with
fixed shapes:

  * first step starts all beams from beam 0 (score init [0, -inf, ...]);
  * each step takes the top ``2K`` of ``log_softmax + beam_score`` over
    (K*V); EOS candidates ranked < K become finished hypotheses, the first
    K non-EOS candidates in score order become the next beams;
  * hypotheses keep ``sum_logprobs / generated_len ** length_penalty``
    (modern HF passes ``decoder_prompt_len`` so only generated tokens count,
    beam_search.py process/add in transformers >= 4.38);
  * ``early_stopping=True`` stops a batch once K hypotheses exist; False
    uses HF's highest-attainable-score test;
  * at exhaustion, running beams are finalized as hypotheses and the best
    one is returned.

Tested against HF ``generate(num_beams=K)`` on identical tiny Qwen2 weights
(tests/test_beam_search.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from video3d_tpu.config import ModelConfig
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models import qwen2
from video3d_tpu.models.generate import GenerateResult, prefill_multimodal

NEG_INF = -1e9


class _BeamState(NamedTuple):
    step: jax.Array          # ()
    beam_scores: jax.Array   # (B, K) running sum of logprobs
    tokens: jax.Array        # (B, K, T) generated ids per running beam
    cache: qwen2.KVCache     # batch-beam flattened (B*K)
    next_logits: jax.Array   # (B*K, V)
    hyp_scores: jax.Array    # (B, K) finished-hypothesis normalized scores
    hyp_tokens: jax.Array    # (B, K, T)
    hyp_lens: jax.Array      # (B, K) generated length (excl. EOS)
    done: jax.Array          # (B,)


def _expand_cache(cache: qwen2.KVCache, num_beams: int) -> qwen2.KVCache:
    """(L, B, S, KV, hd) -> (L, B*K, S, KV, hd) by repeating each sample."""
    def rep(x):
        if x is None:
            return None
        return jnp.repeat(x, num_beams, axis=1)
    return qwen2.KVCache(*[rep(c) for c in cache])


def _reorder_cache(cache: qwen2.KVCache, flat_idx: jax.Array) -> qwen2.KVCache:
    def take(x):
        if x is None:
            return None
        return jnp.take(x, flat_idx, axis=1)
    return qwen2.KVCache(*[take(c) for c in cache])


@functools.partial(jax.jit, static_argnames=(
    "cfg", "num_beams", "max_new_tokens", "eos_token_id", "max_cache_len",
    "cache_dtype", "length_penalty", "early_stopping"))
def generate_beam(params, cfg: ModelConfig, batch: lv3d.Batch,
                  num_beams: int = 4,
                  max_new_tokens: int = 512,
                  eos_token_id: int = 151645,
                  max_cache_len: Optional[int] = None,
                  cache_dtype=jnp.bfloat16,
                  length_penalty: float = 1.0,
                  early_stopping: bool = False,
                  vision_features: Optional[jax.Array] = None) -> GenerateResult:
    """Beam-search decode; same interface as generate_greedy plus beam knobs.

    Returns the best hypothesis per sample (tokens padded with EOS)."""
    B, L = batch.text_ids.shape
    K = num_beams
    T = max_new_tokens
    if max_cache_len is None:
        max_cache_len = L + max_new_tokens

    next_logits, cache, start_pos = prefill_multimodal(
        params, cfg, batch, max_cache_len, cache_dtype, vision_features)
    V = next_logits.shape[-1]

    cache = _expand_cache(cache, K)
    next_logits = jnp.repeat(next_logits, K, axis=0)          # (B*K, V)
    prompt_len = start_pos                                     # (B,)

    init = _BeamState(
        step=jnp.zeros((), jnp.int32),
        beam_scores=jnp.full((B, K), NEG_INF, jnp.float32).at[:, 0].set(0.0),
        tokens=jnp.full((B, K, T), eos_token_id, jnp.int32),
        cache=cache,
        next_logits=next_logits,
        hyp_scores=jnp.full((B, K), -jnp.inf, jnp.float32),
        hyp_tokens=jnp.full((B, K, T), eos_token_id, jnp.int32),
        hyp_lens=jnp.zeros((B, K), jnp.int32),
        done=jnp.zeros((B,), bool),
    )

    batch_offset = (jnp.arange(B) * K)[:, None]                # (B, 1)

    def _try_add_hypothesis(hyp_scores, hyp_tokens, hyp_lens, add_mask,
                            cand_tokens, cand_score, pen_len, gen_len):
        """BeamHypotheses.add: insert (cand, score/generated_len^penalty)
        where it beats the current worst, per batch, when add_mask."""
        norm = cand_score / (pen_len.astype(jnp.float32) ** length_penalty)
        worst = jnp.argmin(hyp_scores, axis=-1)                # (B,)
        worst_score = jnp.take_along_axis(hyp_scores, worst[:, None],
                                          axis=-1)[:, 0]
        do = add_mask & (norm > worst_score)
        onehot = jax.nn.one_hot(worst, K, dtype=bool) & do[:, None]
        hyp_scores = jnp.where(onehot, norm[:, None], hyp_scores)
        hyp_tokens = jnp.where(onehot[:, :, None], cand_tokens[:, None, :],
                               hyp_tokens)
        hyp_lens = jnp.where(onehot, gen_len[:, None], hyp_lens)
        return hyp_scores, hyp_tokens, hyp_lens

    def cond(s: _BeamState):
        return (s.step < T) & ~jnp.all(s.done)

    def body(s: _BeamState):
        logp = jax.nn.log_softmax(s.next_logits.astype(jnp.float32), axis=-1)
        scores = logp.reshape(B, K, V) + s.beam_scores[:, :, None]
        flat = scores.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, 2 * K)       # (B, 2K)
        cand_beam = top_idx // V                               # (B, 2K)
        cand_tok = top_idx % V

        is_eos = cand_tok == eos_token_id
        rank = jnp.broadcast_to(jnp.arange(2 * K)[None], (B, 2 * K))

        # --- finished hypotheses: EOS candidates ranked < K (scorer.process) ---
        # generated_len = cur_len - decoder_prompt_len = step + 1 (incl. EOS)
        pen_len = jnp.broadcast_to(s.step[None] + 1, (B,))
        gen_len = jnp.broadcast_to(s.step[None], (B,))  # tokens before EOS
        hyp_scores, hyp_tokens, hyp_lens = (s.hyp_scores, s.hyp_tokens,
                                            s.hyp_lens)
        for c in range(2 * K):
            src_beam = cand_beam[:, c]                          # (B,)
            cand_seq = jnp.take_along_axis(
                s.tokens, src_beam[:, None, None], axis=1)[:, 0]  # (B, T)
            add = is_eos[:, c] & (rank[:, c] < K) & ~s.done
            hyp_scores, hyp_tokens, hyp_lens = _try_add_hypothesis(
                hyp_scores, hyp_tokens, hyp_lens, add, cand_seq,
                top_scores[:, c], pen_len, gen_len)

        # --- next running beams: first K non-EOS candidates in order ---
        sel = jax.vmap(lambda m: jnp.nonzero(m, size=K, fill_value=2 * K - 1)[0])(
            ~is_eos)                                            # (B, K)
        new_scores = jnp.take_along_axis(top_scores, sel, axis=-1)
        new_tok = jnp.take_along_axis(cand_tok, sel, axis=-1)
        new_beam = jnp.take_along_axis(cand_beam, sel, axis=-1)

        # done batches keep their state frozen (HF pads them)
        keep = s.done[:, None]
        new_scores = jnp.where(keep, s.beam_scores, new_scores)
        new_tok = jnp.where(keep, eos_token_id, new_tok)
        new_beam = jnp.where(keep, jnp.arange(K)[None], new_beam)

        # reorder token history + cache by the chosen source beams
        tokens = jnp.take_along_axis(s.tokens, new_beam[:, :, None], axis=1)
        tokens = tokens.at[:, :, s.step].set(
            jnp.where(s.done[:, None], eos_token_id, new_tok))
        flat_idx = (batch_offset + new_beam).reshape(-1)        # (B*K,)
        cache = _reorder_cache(s.cache, flat_idx)

        # --- is_done (BeamHypotheses.is_done) ---
        n_hyps = jnp.sum(hyp_scores > -jnp.inf, axis=-1)
        worst = jnp.min(hyp_scores, axis=-1)
        best_attainable = top_scores[:, 0] / (
            pen_len.astype(jnp.float32) ** length_penalty)
        if early_stopping:
            newly_done = n_hyps >= K
        else:
            newly_done = (n_hyps >= K) & (worst >= best_attainable)
        done = s.done | newly_done

        # --- decode one step for the new beams ---
        pos = jnp.broadcast_to(prompt_len[:, None] + s.step,
                               (B, K)).reshape(-1)              # (B*K,)
        step_tok = new_tok.reshape(-1)
        emb = qwen2.embed_tokens(params["llm"], step_tok[:, None])
        pos3 = jnp.broadcast_to(pos[:, None, None], (B * K, 1, 3))
        hidden, cache = qwen2.qwen2_forward(
            params["llm"], cfg.llm, emb, pos3, kv_cache=cache,
            cache_positions=pos[:, None], kv_len=pos + 1)
        next_logits = qwen2.lm_head(params["llm"], hidden)[:, 0]

        return _BeamState(s.step + 1, new_scores, tokens, cache, next_logits,
                          hyp_scores, hyp_tokens, hyp_lens, done)

    final = jax.lax.while_loop(cond, body, init)

    # --- finalize (BeamSearchScorer.finalize): running beams of unfinished
    # batches become hypotheses with the full generated length ---
    hyp_scores, hyp_tokens, hyp_lens = (final.hyp_scores, final.hyp_tokens,
                                        final.hyp_lens)
    pen_len = jnp.broadcast_to(final.step[None], (B,))   # generated tokens
    for k in range(K):
        hyp_scores, hyp_tokens, hyp_lens = _finalize_add(
            hyp_scores, hyp_tokens, hyp_lens, ~final.done,
            final.tokens[:, k], final.beam_scores[:, k],
            pen_len, final.step, length_penalty, K)

    best = jnp.argmax(hyp_scores, axis=-1)                      # (B,)
    tokens = jnp.take_along_axis(hyp_tokens, best[:, None, None],
                                 axis=1)[:, 0]
    lengths = jnp.take_along_axis(hyp_lens, best[:, None], axis=-1)[:, 0]
    return GenerateResult(tokens=tokens, lengths=lengths)


def _finalize_add(hyp_scores, hyp_tokens, hyp_lens, add_mask, cand_tokens,
                  cand_score, cur_len, gen_len, length_penalty, K):
    norm = cand_score / (cur_len.astype(jnp.float32) ** length_penalty)
    worst = jnp.argmin(hyp_scores, axis=-1)
    worst_score = jnp.take_along_axis(hyp_scores, worst[:, None], axis=-1)[:, 0]
    do = add_mask & (norm > worst_score)
    onehot = jax.nn.one_hot(worst, K, dtype=bool) & do[:, None]
    hyp_scores = jnp.where(onehot, norm[:, None], hyp_scores)
    hyp_tokens = jnp.where(onehot[:, :, None], cand_tokens[:, None, :],
                           hyp_tokens)
    hyp_lens = jnp.where(onehot, jnp.broadcast_to(gen_len, hyp_lens.shape[:1])[:, None], hyp_lens)
    return hyp_scores, hyp_tokens, hyp_lens
