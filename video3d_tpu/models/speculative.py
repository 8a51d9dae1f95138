"""Speculative decoding: draft-model lookahead with single-pass target
verification.

Beyond-reference capability (the reference decodes strictly one token per
forward, HF greedy loop — llava_qwen.py:207-226): a cheap draft model
proposes ``K`` tokens autoregressively, then the target model scores the
whole block in ONE forward; the longest prefix the target agrees with is
accepted, plus the target's own next token. Greedy verification makes the
output **bit-identical to vanilla greedy decoding** (tests assert exact
equality), so speed is the only trade-off: each target forward now yields
1..K+1 tokens, and decode on TPU is HBM-bound on target weights, so wall
time scales with target forwards, not tokens.

Static-shape design (everything jits, no dynamic control flow):
  * The cache rollback after a partial accept is FREE: ``pos`` simply
    advances by the accepted count, and stale slots beyond it are masked by
    ``kv_len`` and overwritten by later writes (the KV cache scatters at
    per-sample absolute positions, models/qwen2.py decoder_layer).
  * Per-sample accept counts differ, so emitted tokens scatter into the
    output buffer at per-sample offsets with ``mode='drop'`` for the tail.

The draft is any decoder with the same hidden size + vocab as the target
(it shares the spliced multimodal embeds for its own prefill): a pruned /
distilled checkpoint, or ``self_draft_params`` — the first ``k`` layers of
the target itself (zero extra weights; LayerSkip-style early exit).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from video3d_tpu.config import LLMConfig, ModelConfig, replace
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models import qwen2
from video3d_tpu.models.generate import (_decode_position_ids, sample_token,
                                         warp_logits)


def rejection_sample_block(key: jax.Array, d: jax.Array, q_probs: jax.Array,
                           t_probs: jax.Array):
    """Chain speculative rejection sampling (Leviathan et al. 2023; Chen et
    al. 2023) for one drafted block.

    Args:
      key: PRNG key for the acceptance draws + the correction sample.
      d: (B, K) draft tokens, each d_i ~ q_i.
      q_probs: (B, K, V) draft proposal distributions.
      t_probs: (B, K+1, V) target distributions (position i conditions on
        the accepted prefix + d_1..d_i).
    Returns:
      (emit (B, K+1), a (B,)): ``emit[:, j]`` is the j-th emission, valid
      for j <= a. emit[:, j] = d_j for j < a; emit[:, a] is the correction
      (residual) sample on rejection, or the bonus sample from t_K when all
      K drafts are accepted. The marginal law of the emitted prefix equals
      autoregressive sampling from ``t_probs`` exactly.
    """
    B, K, V = q_probs.shape
    u_key, y_key = jax.random.split(key)
    qd = jnp.take_along_axis(q_probs, d[..., None], axis=-1)[..., 0]
    pd = jnp.take_along_axis(t_probs[:, :K], d[..., None], axis=-1)[..., 0]
    u = jax.random.uniform(u_key, (B, K))
    accept = u * qd < pd                     # P = min(1, p/q), no division
    a = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)
    # correction/bonus distribution at the stop position: relu(p - q)
    # normalized on rejection; q row K is zero so a == K yields p itself
    q_pad = jnp.concatenate([q_probs, jnp.zeros((B, 1, V), q_probs.dtype)],
                            axis=1)
    p_sel = jnp.take_along_axis(t_probs, a[:, None, None], axis=1)[:, 0]
    q_sel = jnp.take_along_axis(q_pad, a[:, None, None], axis=1)[:, 0]
    resid = jnp.maximum(p_sel - q_sel, 0.0)
    z = resid.sum(-1, keepdims=True)
    resid = jnp.where(z > 0, resid / z, p_sel)   # p == q: accept prob was 1
    y = jax.random.categorical(y_key, jnp.log(resid), axis=-1)
    d_pad = jnp.concatenate([d, d[:, :1]], axis=1)
    idx = jnp.arange(K + 1)[None]
    emit = jnp.where(idx < a[:, None], d_pad, y[:, None]).astype(jnp.int32)
    return emit, a


def self_draft_params(params, k: int, draft_vocab: int = 0):
    """Early-exit draft from the target's own weights: first ``k`` decoder
    layers + the target's final norm / lm_head / embeddings.

    ``draft_vocab > 0`` truncates the draft's lm_head to the FIRST that
    many token columns: drafting then reads draft_vocab/vocab of the
    1.1 GB head per step — for self-drafts the head dominates draft cost.
    Correctness is untouched: greedy stays bit-identical (rejections just
    rise for targets outside the subset) and sampled stays
    distribution-exact (a proposal with subset support is a valid q; the
    residual resample covers the rest — spec_iteration zero-pads q).
    BPE vocabularies are roughly frequency-ordered, so a 32k prefix covers
    most of the emitted mass in practice."""
    llm = params["llm"]
    head = llm["lm_head"]
    if draft_vocab and not isinstance(head, dict) \
            and getattr(head, "ndim", 0) == 2:
        head = head[:, :draft_vocab]
    return {"embed_tokens": llm["embed_tokens"], "layers": llm["layers"][:k],
            "norm": llm["norm"], "lm_head": head}


def self_draft_config(cfg: LLMConfig, k: int) -> LLMConfig:
    return replace(cfg, num_hidden_layers=k)


class SpecResult(NamedTuple):
    tokens: jax.Array        # (B, max_new_tokens) eos-padded emitted ids
    lengths: jax.Array       # (B,) tokens before EOS
    target_forwards: jax.Array  # () verify passes run (≈ latency proxy)
    accepted_drafts: jax.Array  # () total draft tokens accepted
    offered_drafts: jax.Array   # () K per LIVE row per iteration — the
    #   denominator matching accepted_drafts (deriving it host-side as
    #   (target_forwards-1)*K*B over-counts rows already done, biasing the
    #   acceptance rate low for B>1)


def spec_prefill(params, draft_params, cfg: ModelConfig,
                 draft_cfg: LLMConfig, batch: lv3d.Batch,
                 max_cache_len: int, cache_dtype=jnp.bfloat16,
                 vision_features: Optional[jax.Array] = None,
                 draft_max_cache_len: Optional[int] = None):
    """Shared vision encode + splice, then prefill BOTH models' caches.
    Returns (next_logits (B, vocab), target_cache, draft_cache).

    ``draft_max_cache_len`` sizes the draft cache independently — the
    paged serving path transplants the target cache into pages right after
    prefill (only prompt-footprint dense rows are needed) while the draft
    cache stays dense for the request's whole budget."""
    B, L = batch.text_ids.shape
    if vision_features is None:
        vt = lv3d.encode_video(params, cfg, batch.images, batch.patch_coords)
        spliceable = vt.spliceable
    else:
        spliceable = vision_features
    embeds = lv3d.assemble_embeds(params, cfg, spliceable, batch.text_ids,
                                  batch.kind, batch.vision_index,
                                  batch.coord_mask, batch.box_input)
    pos3 = lv3d._position_ids_3d(batch, cfg)
    fill_positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))

    def _prefill(p, c: LLMConfig, mcl: int):
        cache = qwen2.KVCache.zeros(c, B, mcl, dtype=cache_dtype)
        hidden, cache = qwen2.qwen2_forward(
            p, c, embeds, pos3, kv_cache=cache,
            cache_positions=fill_positions, kv_len=batch.seq_len,
            prefill=True)
        last = jnp.take_along_axis(hidden,
                                   (batch.seq_len - 1)[:, None, None], axis=1)
        return qwen2.lm_head(p, last)[:, 0], cache

    next_logits, t_cache = _prefill(params["llm"], cfg.llm, max_cache_len)
    _, d_cache = _prefill(draft_params, draft_cfg,
                          draft_max_cache_len or max_cache_len)
    return next_logits, t_cache, d_cache


def spec_prefill_prefix(params, draft_params, cfg: ModelConfig,
                        draft_cfg: LLMConfig, batch: lv3d.Batch,
                        prefix: qwen2.KVCache, prefix_len: int,
                        max_cache_len: int, cache_dtype=jnp.bfloat16,
                        draft_max_cache_len: Optional[int] = None):
    """:func:`spec_prefill` against a cached scene-prefix KV (SELF-drafts
    only): the draft shares the target's first k layers, so the target
    prefix's leading k layer-slices ARE the draft's prefix — both caches
    seed from the same stored entry and only the question suffix runs
    through either model. ``batch`` is the suffix slice
    (models/splice.py slice_suffix_plan); no vision work happens here.
    """
    from video3d_tpu.models.generate import _write_prefix

    B, Ls = batch.text_ids.shape
    D = params["llm"]["embed_tokens"].shape[-1]
    dummy_vis = jnp.zeros((B, 1, D), params["llm"]["embed_tokens"].dtype)
    embeds = lv3d.assemble_embeds(params, cfg, dummy_vis, batch.text_ids,
                                  batch.kind, batch.vision_index,
                                  batch.coord_mask, batch.box_input)
    pos3 = lv3d._position_ids_3d(batch, cfg)
    cache_positions = prefix_len + jnp.broadcast_to(
        jnp.arange(Ls)[None], (B, Ls))

    def _suffix_prefill(p, c: LLMConfig, pre: qwen2.KVCache, mcl: int):
        cache = qwen2.KVCache.zeros(c, B, mcl, dtype=cache_dtype)
        cache = _write_prefix(cache, pre)
        # B=1 stored prefixes take the SHARED-prefix attention path
        # (prefix KV streamed once for all rows; generate.py contract)
        from video3d_tpu.models.generate import shared_prefix_view
        shared = shared_prefix_view(pre, prefix_len, B)
        hidden, cache = qwen2.qwen2_forward(
            p, c, embeds, pos3, kv_cache=cache,
            cache_positions=cache_positions, kv_len=batch.seq_len,
            contiguous_update=True, shared_prefix=shared)
        last = jnp.take_along_axis(
            hidden, (batch.seq_len - 1 - prefix_len)[:, None, None], axis=1)
        return qwen2.lm_head(p, last)[:, 0], cache

    k = draft_cfg.num_hidden_layers
    assert k <= cfg.llm.num_hidden_layers, "prefix reuse needs a self-draft"
    d_prefix = qwen2.KVCache(
        prefix.k[:k], prefix.v[:k],
        None if prefix.k_scale is None else prefix.k_scale[:k],
        None if prefix.v_scale is None else prefix.v_scale[:k])
    next_logits, t_cache = _suffix_prefill(params["llm"], cfg.llm, prefix,
                                           max_cache_len)
    _, d_cache = _suffix_prefill(draft_params, draft_cfg, d_prefix,
                                 draft_max_cache_len or max_cache_len)
    return next_logits, t_cache, d_cache


@functools.partial(jax.jit, static_argnames=(
    "cfg", "draft_cfg", "prefix_len", "max_cache_len", "cache_dtype",
    "temperature", "top_p", "top_k", "draft_max_cache_len"))
def spec_start_prefix(params, draft_params, cfg: ModelConfig,
                      draft_cfg: LLMConfig, batch: lv3d.Batch,
                      prefix: qwen2.KVCache, prefix_len: int,
                      max_cache_len: int, cache_dtype=jnp.bfloat16,
                      temperature: float = 0.0, top_p: float = 1.0,
                      top_k: int = 0,
                      rng_key: Optional[jax.Array] = None,
                      draft_max_cache_len: Optional[int] = None):
    """:func:`spec_start` via the scene-prefix KV (suffix-only prefill of
    BOTH models). Returns (SpecSlots with one slot, first_token (B,))."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    next_logits, t_cache, d_cache = spec_prefill_prefix(
        params, draft_params, cfg, draft_cfg, batch, prefix, prefix_len,
        max_cache_len, cache_dtype, draft_max_cache_len=draft_max_cache_len)
    cur0 = sample_token(next_logits, rng_key, temperature, top_p, top_k)
    return SpecSlots(cur=cur0, pos=batch.seq_len,
                     done=cur0 == -1,
                     t_cache=t_cache, d_cache=d_cache,
                     n_iter=jnp.zeros((), jnp.int32)), cur0


def spec_iteration(params, draft_params, cfg: ModelConfig,
                   draft_cfg: LLMConfig, cur, pos, t_cache, d_cache,
                   base_key, K: int, temperature: float, top_p: float,
                   top_k: int):
    """One speculative round for a (B,)-batch of independent streams.

    Drafts K tokens from ``cur`` at ``pos`` (K+1 draft forwards; the extra
    one only fills the draft KV), verifies with one (K+1)-token target
    forward, and accepts greedily (temperature == 0) or by chain rejection
    sampling. Returns (emit (B, K+1), a (B,), t_cache, d_cache): emissions
    ``emit[:, j]`` are valid for j <= a; callers apply their own EOS /
    budget truncation and advance cur/pos from the kept prefix.
    """
    d, q_probs, d_cache = _draft_block(draft_params, draft_cfg, cur, pos,
                                       d_cache, base_key, K, temperature,
                                       top_p, top_k)

    # ---- one target forward over [cur, d_1..d_K] ----
    block = jnp.concatenate([cur[:, None], d], axis=1)        # (B, K+1)
    bpos = pos[:, None] + jnp.arange(K + 1)[None]
    emb = qwen2.embed_tokens(params["llm"], block)
    h, t_cache = qwen2.qwen2_forward(
        params["llm"], cfg.llm, emb, _decode_position_ids(bpos),
        kv_cache=t_cache, cache_positions=bpos, kv_len=pos + K + 1)
    t_logits = qwen2.lm_head(params["llm"], h)                # (B, K+1, V)
    emit, a = _accept_block(base_key, d, q_probs, t_logits, K,
                            temperature, top_p, top_k)
    return emit, a, t_cache, d_cache


def _draft_block(draft_params, draft_cfg: LLMConfig, cur, pos, d_cache,
                 base_key, K: int, temperature: float, top_p: float,
                 top_k: int):
    """K+1 sequential draft forwards from ``cur`` at ``pos`` (the K+1-th
    only fills the draft KV). Returns (d (B, K) proposed tokens,
    q_probs (K+1, B, V') stacked draft distributions — empty trailing dim
    when greedy — and the advanced draft cache). Shared by the dense and
    paged speculative paths."""
    sampled = temperature > 0.0

    def draft_step(carry, i):
        tok, dc = carry
        emb = qwen2.embed_tokens(draft_params, tok[:, None])
        p = (pos + i)[:, None]                               # (B, 1)
        h, dc = qwen2.qwen2_forward(
            draft_params, draft_cfg, emb, _decode_position_ids(p),
            kv_cache=dc, cache_positions=p, kv_len=p[:, 0] + 1)
        logits = qwen2.lm_head(draft_params, h)[:, 0]
        if sampled:
            warped = warp_logits(logits, temperature, top_p, top_k)
            nxt = jax.random.categorical(
                jax.random.fold_in(base_key, i), warped,
                axis=-1).astype(jnp.int32)
            return (nxt, dc), (nxt, jax.nn.softmax(warped, axis=-1))
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, dc), (nxt, jnp.zeros((logits.shape[0], 0)))

    (_, d_cache), (drafts, q_probs) = jax.lax.scan(
        draft_step, (cur, d_cache), jnp.arange(K + 1))
    return drafts.T[:, :K], q_probs, d_cache


def _accept_block(base_key, d, q_probs, t_logits, K: int,
                  temperature: float, top_p: float, top_k: int):
    """Greedy / chain-rejection acceptance of one verify block. Shared by
    the dense (:func:`spec_iteration`) and paged
    (:func:`paged_spec_decode_chunk`) verify paths so acceptance semantics
    can never diverge."""
    if temperature > 0.0:
        B_, Kp1, V = t_logits.shape
        t_probs = jax.nn.softmax(
            warp_logits(t_logits.reshape(B_ * Kp1, V), temperature,
                        top_p, top_k), axis=-1).reshape(B_, Kp1, V)
        q = q_probs.transpose(1, 0, 2)[:, :K]
        if q.shape[-1] != V:
            # truncated draft vocab (self_draft_params(draft_vocab=...)):
            # zero-pad q — a subset-support proposal is still a valid q,
            # the residual resample covers tokens the draft cannot propose
            q = jnp.pad(q, ((0, 0), (0, 0), (0, V - q.shape[-1])))
        return rejection_sample_block(
            jax.random.fold_in(base_key, K + 1), d, q, t_probs)
    t = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)
    match = d == t[:, :K]                                     # (B, K)
    a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
    return t, a


def accept_truncate(emit, a, done, eos_token_id: int, K: int):
    """Shared emission-truncation semantics for one speculative round:
    the valid prefix up to ``a``, cut at (and including) the first EOS,
    empty for already-done rows. Returns (keep, is_eos, idx); callers may
    AND extra budget terms onto ``keep`` before counting. Used by BOTH
    generate_speculative and spec_decode_chunk so the two serving paths
    can never diverge on EOS semantics."""
    idx = jnp.arange(K + 1)[None]
    valid = idx <= a[:, None]
    is_eos = emit == eos_token_id
    eos_before = jnp.cumsum(jnp.where(valid & is_eos, 1, 0), axis=1) \
        - jnp.where(valid & is_eos, 1, 0)               # exclusive count
    keep = valid & (eos_before == 0) & ~done[:, None]
    return keep, is_eos, idx


@functools.partial(jax.jit, static_argnames=(
    "cfg", "draft_cfg", "num_draft_tokens", "max_new_tokens", "eos_token_id",
    "max_cache_len", "cache_dtype", "temperature", "top_p", "top_k"))
def generate_speculative(params, draft_params, cfg: ModelConfig,
                         draft_cfg: LLMConfig, batch: lv3d.Batch,
                         num_draft_tokens: int = 4,
                         max_new_tokens: int = 512,
                         eos_token_id: int = 151645,
                         max_cache_len: Optional[int] = None,
                         cache_dtype=jnp.bfloat16,
                         temperature: float = 0.0,
                         top_p: float = 1.0,
                         top_k: int = 0,
                         rng_key: Optional[jax.Array] = None,
                         vision_features: Optional[jax.Array] = None
                         ) -> SpecResult:
    """Speculative decode. Greedy (temperature == 0): emissions exactly
    equal generate_greedy. Sampled (temperature > 0): chain rejection
    sampling — the emitted sequence follows the SAME warped target
    distribution as vanilla sampling (rejection_sample_block), the draft
    only changes speed.

    Each iteration: draft ``K`` tokens (plus one extra draft step that only
    writes the last token's KV so the draft cache always covers the accepted
    stream), verify with one (K+1)-token target forward over
    ``[cur, d_1..d_K]``. In greedy mode accepted drafts equal the target's
    own argmaxes, so the emitted block is simply ``t[:, :a+1]`` where ``a``
    counts leading ``d_i == t_{i-1}`` matches.
    """
    K = num_draft_tokens
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    rng_key, init_key = jax.random.split(rng_key)
    B, L = batch.text_ids.shape
    if max_cache_len is None:
        # +K+2 slack: the verify block may write past the accepted position
        max_cache_len = L + max_new_tokens + K + 2

    next_logits, t_cache, d_cache = spec_prefill(
        params, draft_params, cfg, draft_cfg, batch, max_cache_len,
        cache_dtype, vision_features)

    class State(NamedTuple):
        cur: jax.Array          # (B,) last emitted token, not yet in caches
        pos: jax.Array          # (B,) absolute position of ``cur``
        out_len: jax.Array      # (B,) tokens written to the buffer
        lengths: jax.Array      # (B,) tokens before EOS
        done: jax.Array         # (B,)
        tokens: jax.Array       # (B, max_new_tokens)
        t_cache: qwen2.KVCache
        d_cache: qwen2.KVCache
        n_fwd: jax.Array
        n_acc: jax.Array
        n_off: jax.Array

    cur0 = sample_token(next_logits, init_key, temperature, top_p, top_k)
    eos0 = cur0 == eos_token_id
    init = State(
        cur=cur0, pos=batch.seq_len,
        out_len=jnp.ones((B,), jnp.int32),
        lengths=jnp.where(eos0, 0, 1).astype(jnp.int32),
        done=eos0,
        tokens=jnp.full((B, max_new_tokens), eos_token_id,
                        jnp.int32).at[:, 0].set(cur0),
        t_cache=t_cache, d_cache=d_cache,
        n_fwd=jnp.ones((), jnp.int32), n_acc=jnp.zeros((), jnp.int32),
        n_off=jnp.zeros((), jnp.int32))

    def cond(s: State):
        return ~jnp.all(s.done | (s.out_len >= max_new_tokens))

    def body(s: State):
        base_key = jax.random.fold_in(rng_key, s.n_fwd)
        emit, a, t_cache, d_cache = spec_iteration(
            params, draft_params, cfg, draft_cfg, s.cur, s.pos,
            s.t_cache, s.d_cache, base_key, K, temperature, top_p, top_k)
        keep, is_eos, idx = accept_truncate(emit, a, s.done, eos_token_id,
                                            K)
        keep = keep & (s.out_len[:, None] + idx < max_new_tokens)
        n_keep = jnp.sum(keep, axis=1).astype(jnp.int32)

        # ---- scatter emissions into the output buffer ----
        rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, K + 1))
        cols = jnp.where(keep, s.out_len[:, None] + idx, max_new_tokens)
        tokens = s.tokens.at[rows, cols].set(emit, mode="drop")

        new_done = s.done | jnp.any(keep & is_eos, axis=1)
        lengths = s.lengths + jnp.sum(keep & ~is_eos, axis=1).astype(jnp.int32)
        out_len = s.out_len + n_keep
        # ``cur`` = last kept emission (the target's correction/bonus token);
        # for freshly-done samples it is EOS and never used again.
        last_idx = jnp.maximum(n_keep - 1, 0)
        cur = jnp.where(new_done | (n_keep == 0), eos_token_id,
                        jnp.take_along_axis(emit, last_idx[:, None],
                                            axis=1)[:, 0])
        pos = jnp.where(s.done, s.pos, s.pos + n_keep)
        done = new_done | (out_len >= max_new_tokens)
        return State(cur=cur, pos=pos, out_len=out_len, lengths=lengths,
                     done=done, tokens=tokens, t_cache=t_cache,
                     d_cache=d_cache, n_fwd=s.n_fwd + 1,
                     n_acc=s.n_acc + jnp.sum(jnp.where(s.done, 0, a)),
                     n_off=s.n_off + K * jnp.sum(~s.done).astype(jnp.int32))

    final = jax.lax.while_loop(cond, body, init)
    return SpecResult(tokens=final.tokens,
                      lengths=jnp.minimum(final.lengths, max_new_tokens),
                      target_forwards=final.n_fwd,
                      accepted_drafts=final.n_acc,
                      offered_drafts=final.n_off)


# ---------------------------------------------------------------------------
# Persistent slots: speculative decoding inside the continuous batcher
# (serve/batcher.py) — the S-slot analogue of models/generate.py's
# DecodeState/insert/release, carrying BOTH models' caches per slot.
# ---------------------------------------------------------------------------

class SpecSlots(NamedTuple):
    cur: jax.Array           # (S,) last emitted token per slot (not cached)
    pos: jax.Array           # (S,) absolute position of ``cur``
    done: jax.Array          # (S,)
    t_cache: qwen2.KVCache
    d_cache: qwen2.KVCache
    n_iter: jax.Array        # () rng stream counter


def empty_spec_slots(cfg: ModelConfig, draft_cfg: LLMConfig, num_slots: int,
                     max_cache_len: int, cache_dtype=jnp.bfloat16
                     ) -> SpecSlots:
    return SpecSlots(
        cur=jnp.zeros((num_slots,), jnp.int32),
        pos=jnp.zeros((num_slots,), jnp.int32),
        done=jnp.ones((num_slots,), bool),
        t_cache=qwen2.KVCache.zeros(cfg.llm, num_slots, max_cache_len,
                                    dtype=cache_dtype),
        d_cache=qwen2.KVCache.zeros(draft_cfg, num_slots, max_cache_len,
                                    dtype=cache_dtype),
        n_iter=jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, static_argnames=(
    "cfg", "draft_cfg", "max_cache_len", "cache_dtype", "temperature",
    "top_p", "top_k", "draft_max_cache_len"))
def spec_start(params, draft_params, cfg: ModelConfig, draft_cfg: LLMConfig,
               batch: lv3d.Batch, max_cache_len: int,
               cache_dtype=jnp.bfloat16, temperature: float = 0.0,
               top_p: float = 1.0, top_k: int = 0,
               rng_key: Optional[jax.Array] = None,
               vision_features: Optional[jax.Array] = None,
               draft_max_cache_len: Optional[int] = None):
    """Prefill both models for one request (B=1) and emit the FIRST token.
    Returns (SpecSlots with one slot, first_token (B,))."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    next_logits, t_cache, d_cache = spec_prefill(
        params, draft_params, cfg, draft_cfg, batch, max_cache_len,
        cache_dtype, vision_features,
        draft_max_cache_len=draft_max_cache_len)
    cur0 = sample_token(next_logits, rng_key, temperature, top_p, top_k)
    return SpecSlots(cur=cur0, pos=batch.seq_len,
                     done=cur0 == -1,          # never: real done is host-side
                     t_cache=t_cache, d_cache=d_cache,
                     n_iter=jnp.zeros((), jnp.int32)), cur0


@functools.partial(jax.jit, donate_argnums=(0,))
def insert_spec_slot(slots: SpecSlots, slot: jax.Array,
                     sub: SpecSlots) -> SpecSlots:
    """Graft a spec_start result (B=1) into row ``slot`` of both caches."""
    graft = lambda big, small: big.at[:, slot].set(small[:, 0])
    return SpecSlots(
        cur=slots.cur.at[slot].set(sub.cur[0]),
        pos=slots.pos.at[slot].set(sub.pos[0]),
        done=slots.done.at[slot].set(False),
        t_cache=jax.tree.map(graft, slots.t_cache, sub.t_cache),
        d_cache=jax.tree.map(graft, slots.d_cache, sub.d_cache),
        n_iter=slots.n_iter)


@functools.partial(jax.jit, donate_argnums=(0,))
def release_spec_slot(slots: SpecSlots, slot: jax.Array) -> SpecSlots:
    return slots._replace(done=slots.done.at[slot].set(True))


@functools.partial(jax.jit, static_argnames=(
    "cfg", "draft_cfg", "iters", "num_draft_tokens", "eos_token_id",
    "temperature", "top_p", "top_k"), donate_argnums=(4,))
def spec_decode_chunk(params, draft_params, cfg: ModelConfig,
                      draft_cfg: LLMConfig, slots: SpecSlots,
                      iters: int = 4, num_draft_tokens: int = 4,
                      eos_token_id: int = 151645,
                      temperature: float = 0.0, top_p: float = 1.0,
                      top_k: int = 0,
                      rng_key: Optional[jax.Array] = None):
    """Run ``iters`` speculative rounds for every active slot.

    Returns (slots, emit (S, iters, K+1), keep (S, iters, K+1) bool): per
    iteration, ``emit[s, j, :]`` holds that round's candidate emissions and
    ``keep`` marks the accepted/EOS-truncated prefix (empty for done
    slots). The host walks ``keep`` to stream tokens and applies
    per-request budgets by releasing the slot.
    """
    K = num_draft_tokens
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    def body(s: SpecSlots, _):
        base_key = jax.random.fold_in(rng_key, s.n_iter)
        emit, a, t_cache, d_cache = spec_iteration(
            params, draft_params, cfg, draft_cfg, s.cur, s.pos,
            s.t_cache, s.d_cache, base_key, K, temperature, top_p, top_k)
        keep, is_eos, _ = accept_truncate(emit, a, s.done, eos_token_id, K)
        n_keep = jnp.sum(keep, axis=1).astype(jnp.int32)
        new_done = s.done | jnp.any(keep & is_eos, axis=1)
        last_idx = jnp.maximum(n_keep - 1, 0)
        cur = jnp.where(new_done | (n_keep == 0), eos_token_id,
                        jnp.take_along_axis(emit, last_idx[:, None],
                                            axis=1)[:, 0])
        pos = jnp.where(s.done, s.pos, s.pos + n_keep)
        new = SpecSlots(cur=cur, pos=pos, done=new_done,
                        t_cache=t_cache, d_cache=d_cache,
                        n_iter=s.n_iter + 1)
        return new, (emit, keep)

    slots, (emit, keep) = jax.lax.scan(body, slots, None, length=iters)
    # scan stacks on the leading axis -> (iters, S, K+1); host wants S-major
    return slots, emit.transpose(1, 0, 2), keep.transpose(1, 0, 2)


# ---------------------------------------------------------------------------
# Paged target cache + speculation (serve/batcher.py paged spec mode):
# the target KV lives in the shared page pool (models/paged_kv.py) so
# heterogeneous request budgets pack tightly, while the tiny early-exit
# draft cache stays dense. The verify pass appends its K+1-token block with
# one multi-token paged forward (qwen2_forward paged L>1 path) and rolls
# ``lens`` back to the accepted prefix — rejected positions are simply
# overwritten by the next round's block, exactly like the dense path's
# in-place scatter. Neither vLLM-style paging nor speculation exists in the
# reference (HF dense cache + one token per forward).
# ---------------------------------------------------------------------------


class PagedSpecSlots(NamedTuple):
    """S-slot speculative state over a paged target cache. The slot's
    position (== tokens cached) is ``cache.lens`` — single source of truth,
    mirroring PagedDecodeState."""

    cur: jax.Array           # (S,) last emitted token per slot
    done: jax.Array          # (S,)
    cache: object            # models/paged_kv.PagedKVCache (target)
    d_cache: qwen2.KVCache   # dense draft cache (S rows)
    n_iter: jax.Array        # ()


def empty_paged_spec_slots(cfg: ModelConfig, draft_cfg: LLMConfig,
                           num_slots: int, num_pages: int, page_size: int,
                           max_pages: int, draft_max_cache_len: int,
                           cache_dtype=jnp.bfloat16) -> PagedSpecSlots:
    from video3d_tpu.models.paged_kv import PagedKVCache

    return PagedSpecSlots(
        cur=jnp.zeros((num_slots,), jnp.int32),
        done=jnp.ones((num_slots,), bool),
        cache=PagedKVCache.zeros(cfg.llm, num_pages, page_size, num_slots,
                                 max_pages, dtype=cache_dtype),
        d_cache=qwen2.KVCache.zeros(draft_cfg, num_slots,
                                    draft_max_cache_len, dtype=cache_dtype),
        n_iter=jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("n_pages", "skip_pages"))
def insert_paged_spec_slot(slots: PagedSpecSlots, slot: jax.Array,
                           sub: SpecSlots, page_row: jax.Array,
                           n_pages: int,
                           skip_pages: int = 0) -> PagedSpecSlots:
    """Graft a spec_start result (B=1): the dense target cache transplants
    into the slot's pages; the draft cache grafts into its dense row.
    ``skip_pages``: shared scene-prefix pages at the head of the row
    (already written by generate.write_shared_prefix) are not re-copied —
    see paged_kv.transplant_dense."""
    from video3d_tpu.models.paged_kv import transplant_dense

    graft = lambda big, small: big.at[:, slot].set(small[:, 0])
    return PagedSpecSlots(
        cur=slots.cur.at[slot].set(sub.cur[0]),
        done=slots.done.at[slot].set(False),
        cache=transplant_dense(slots.cache, sub.t_cache, slot, page_row,
                               n_pages, sub.pos[0], skip_pages=skip_pages),
        d_cache=jax.tree.map(graft, slots.d_cache, sub.d_cache),
        n_iter=slots.n_iter)


@functools.partial(jax.jit, donate_argnums=(0,))
def release_paged_spec_slot(slots: PagedSpecSlots,
                            slot: jax.Array) -> PagedSpecSlots:
    """Force a slot done; the host frees its pages (never dereferenced
    again: done rows append to the scratch page, lens frozen)."""
    return slots._replace(done=slots.done.at[slot].set(True))


@functools.partial(jax.jit, static_argnames=(
    "cfg", "draft_cfg", "iters", "num_draft_tokens", "eos_token_id",
    "temperature", "top_p", "top_k"), donate_argnums=(4,))
def paged_spec_decode_chunk(params, draft_params, cfg: ModelConfig,
                            draft_cfg: LLMConfig, slots: PagedSpecSlots,
                            iters: int = 4, num_draft_tokens: int = 4,
                            eos_token_id: int = 151645,
                            temperature: float = 0.0, top_p: float = 1.0,
                            top_k: int = 0,
                            rng_key: Optional[jax.Array] = None):
    """:func:`spec_decode_chunk` over the paged target cache — identical
    emission semantics (same _draft_block/_accept_block/accept_truncate
    helpers), so greedy output is bit-identical to the dense speculative
    path and to vanilla greedy."""
    K = num_draft_tokens
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    def body(s: PagedSpecSlots, _):
        base_key = jax.random.fold_in(rng_key, s.n_iter)
        pos = s.cache.lens
        d, q_probs, d_cache = _draft_block(
            draft_params, draft_cfg, s.cur, pos, s.d_cache, base_key, K,
            temperature, top_p, top_k)

        # ---- one paged multi-token target forward over [cur, d_1..d_K] ----
        block = jnp.concatenate([s.cur[:, None], d], axis=1)  # (S, K+1)
        bpos = pos[:, None] + jnp.arange(K + 1)[None]
        emb = qwen2.embed_tokens(params["llm"], block)
        h, cache = qwen2.qwen2_forward(
            params["llm"], cfg.llm, emb, _decode_position_ids(bpos),
            paged_cache=s.cache, paged_active=~s.done)
        t_logits = qwen2.lm_head(params["llm"], h)            # (S, K+1, V)

        emit, a = _accept_block(base_key, d, q_probs, t_logits, K,
                                temperature, top_p, top_k)
        keep, is_eos, _ = accept_truncate(emit, a, s.done, eos_token_id, K)
        n_keep = jnp.sum(keep, axis=1).astype(jnp.int32)
        new_done = s.done | jnp.any(keep & is_eos, axis=1)
        last_idx = jnp.maximum(n_keep - 1, 0)
        cur = jnp.where(new_done | (n_keep == 0), eos_token_id,
                        jnp.take_along_axis(emit, last_idx[:, None],
                                            axis=1)[:, 0])
        # roll lens back from pos+K+1 to the accepted prefix; next round's
        # block overwrites the rejected positions in place
        cache = cache._replace(lens=jnp.where(s.done, pos, pos + n_keep))
        new = PagedSpecSlots(cur=cur, done=new_done, cache=cache,
                             d_cache=d_cache, n_iter=s.n_iter + 1)
        return new, (emit, keep)

    slots, (emit, keep) = jax.lax.scan(body, slots, None, length=iters)
    return slots, emit.transpose(1, 0, 2), keep.transpose(1, 0, 2)
