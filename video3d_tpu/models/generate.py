"""Greedy KV-cache decoding over the spliced multimodal prefill.

Mirrors the reference inference contract (model_scanqa.py:173-186 /
llava_qwen.py:207-226): prefill runs the full multimodal splice once, then
HF's greedy loop decodes with the cache. Here both phases are jitted with
static shapes: prefill at a padded bucket length, decode as a
``lax.while_loop`` over a preallocated cache, stopping when every sample has
emitted EOS or ``max_new_tokens`` is reached.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from video3d_tpu.config import ModelConfig, PosEmbedType
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models import qwen2

# A/B escape hatch (scripts/bench/flagship32.py prefix --no-shared-prefix):
# read at TRACE time — flip it before the first start_decode_prefix /
# ground_suffix call of a process, not between calls (jit caches the trace).
SHARED_PREFIX_ATTN = True


class GenerateResult(NamedTuple):
    tokens: jax.Array      # (B, max_new_tokens) emitted ids (padded with eos)
    lengths: jax.Array     # (B,) number of tokens before EOS (exclusive)


def _decode_position_ids(pos: jax.Array) -> jax.Array:
    """(B, 1) text positions -> (B, 1, 3) replicated mRoPE ids (standard
    RoPE for text; modeling_qwen2.py:997-1004)."""
    return jnp.broadcast_to(pos[..., None], (*pos.shape, 3))


def warp_logits(logits: jax.Array, temperature: float, top_p: float,
                top_k: int = 0) -> jax.Array:
    """HF warper chain (temperature -> top_k -> top_p) on (B, V) logits;
    masked-out entries become -inf. ``softmax`` of the result is the exact
    sampling distribution (used by speculative rejection sampling)."""
    logits = logits.astype(jnp.float32) / temperature
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1:]        # (B, 1)
        logits = jnp.where(logits >= kth, logits, -jnp.inf)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest set with cumulative mass >= top_p (incl. first)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)            # (B,)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None],
                                     axis=-1)                 # (B, 1)
        logits = jnp.where(logits >= cutoff, logits, -jnp.inf)
    return logits


def sample_token(logits: jax.Array, key: jax.Array, temperature: float,
                 top_p: float, top_k: int = 0) -> jax.Array:
    """Temperature + top-k + nucleus sampling; greedy when temperature == 0.

    Mirrors the reference's generation kwargs (model_scanqa.py:176-180:
    do_sample = temperature > 0, top_p) with HF's warper order
    (temperature -> top_k -> top_p); everything stays on device.
    """
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = warp_logits(logits, temperature, top_p, top_k)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def prefill_multimodal(params, cfg: ModelConfig, batch: lv3d.Batch,
                       max_cache_len: int, cache_dtype=jnp.bfloat16,
                       vision_features: Optional[jax.Array] = None):
    """Vision encode + static splice + prefill-with-cache (the shared first
    phase of greedy and beam decode). Returns (next_logits (B, vocab),
    cache, start_pos (B,))."""
    B, L = batch.text_ids.shape

    # ---- vision + splice ----
    if vision_features is None:
        vt = lv3d.encode_video(params, cfg, batch.images, batch.patch_coords)
        spliceable = vt.spliceable
    else:
        spliceable = vision_features
    embeds = lv3d.assemble_embeds(params, cfg, spliceable, batch.text_ids,
                                  batch.kind, batch.vision_index,
                                  batch.coord_mask, batch.box_input)

    # ---- prefill with cache ----
    cache = qwen2.KVCache.zeros(cfg.llm, B, max_cache_len, dtype=cache_dtype)
    pos3 = lv3d._position_ids_3d(batch, cfg)
    cache_positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    hidden, cache = qwen2.qwen2_forward(
        params["llm"], cfg.llm, embeds, pos3, kv_cache=cache,
        cache_positions=cache_positions, kv_len=batch.seq_len, prefill=True)
    # logits of the last real token per sample
    last = jnp.take_along_axis(hidden, (batch.seq_len - 1)[:, None, None],
                               axis=1)
    next_logits = qwen2.lm_head(params["llm"], last)[:, 0]      # (B, vocab)

    # text position counter continues from the spliced stream length
    # (reference keeps a running counter, llava_arch.py:711-729; for mrope
    # text tokens it equals seq_len in text-token units)
    return next_logits, cache, batch.seq_len


@functools.partial(jax.jit, static_argnames=("cfg",))
def _embeds_and_pos(params, cfg: ModelConfig, batch: lv3d.Batch,
                    vision_features: Optional[jax.Array] = None):
    """Vision encode + splice assembly + 3D position ids — the chunk-
    independent first phase of a chunked prefill (one device call; the
    tower is atomic)."""
    if vision_features is None:
        vt = lv3d.encode_video(params, cfg, batch.images, batch.patch_coords)
        spliceable = vt.spliceable
    else:
        spliceable = vision_features
    embeds = lv3d.assemble_embeds(params, cfg, spliceable, batch.text_ids,
                                  batch.kind, batch.vision_index,
                                  batch.coord_mask, batch.box_input)
    return embeds, lv3d._position_ids_3d(batch, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",),
                   donate_argnums=(2, 3))
def _prefill_chunk(params, cfg: ModelConfig, cache: qwen2.KVCache,
                   h_last: jax.Array, embeds_c: jax.Array,
                   pos3_c: jax.Array, start: jax.Array, kv_len: jax.Array):
    """One text chunk of a chunked prefill through the cached-attention
    path (prefill=False + cache_positions — the same machinery as the
    suffix prefill, whose equality with full prefill is test-asserted).
    ``start`` is traced, so every same-length chunk reuses one compile.
    ``h_last`` (B, D) carries each row's LAST-real-token hidden across
    chunks (a row's kv_len-1 may fall in any chunk); the lm_head is paid
    once, in :func:`_finish_chunked_logits`."""
    B, C, _ = embeds_c.shape
    cache_positions = start + jnp.broadcast_to(jnp.arange(C)[None], (B, C))
    hidden, cache = qwen2.qwen2_forward(
        params["llm"], cfg.llm, embeds_c, pos3_c, kv_cache=cache,
        cache_positions=cache_positions, kv_len=kv_len,
        contiguous_update=True)
    idx = jnp.clip(kv_len - 1 - start, 0, C - 1)            # (B,)
    cand = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
    in_chunk = (kv_len - 1 >= start) & (kv_len - 1 < start + C)
    h_last = jnp.where(in_chunk[:, None], cand.astype(h_last.dtype), h_last)
    return cache, h_last


@functools.partial(jax.jit, static_argnames=("cfg",))
def _finish_chunked_logits(params, cfg: ModelConfig,
                           h_last: jax.Array) -> jax.Array:
    """(B, D) last-token hiddens -> (B, vocab) logits (one lm_head read
    for the whole chunked prefill)."""
    return qwen2.lm_head(params["llm"], h_last[:, None])[:, 0]


class ChunkedPrefill:
    """Host-driven chunked multimodal prefill (Sarathi-style): the serve
    scheduler runs ONE fixed-size chunk per iteration between shared
    decode chunks, bounding the decode stall of a cold admission to
    ~max(tower, one chunk forward) instead of the whole prompt prefill
    (~190 ms at 7B). TPU-first shape discipline: step 0 is the vision
    encode + splice assembly (atomic), later steps are fixed
    ``chunk_len``-token cached forwards (one compile per chunk length;
    the chunk offset is traced) with one last-chunk variant that pays the
    lm_head. The finished DecodeState equals start_decode's bit-for-bit
    at bf16 (same cached-attention path as the suffix prefill).
    """

    def __init__(self, params, cfg: ModelConfig, batch: lv3d.Batch,
                 max_cache_len: int, chunk_len: int = 256,
                 cache_dtype=jnp.bfloat16,
                 vision_features: Optional[jax.Array] = None):
        self.params, self.cfg = params, cfg
        self.batch = batch
        self.chunk_len = int(chunk_len)
        self.max_cache_len = max_cache_len
        self.cache_dtype = cache_dtype
        self.vision_features = vision_features
        self._embeds = None
        self._pos3 = None
        self._cache = None
        self._h_last = None
        self._off = 0
        self._state: Optional[DecodeState] = None
        B, L = batch.text_ids.shape
        self._B, self._L = B, L
        # chunks only need to cover the true tokens; KV past a row's
        # seq_len is masked forever (and decode overwrites from seq_len)
        import numpy as np
        self._n_true = int(np.max(np.asarray(batch.seq_len)))
        # step count: 1 (vision/assembly) + text chunks
        self.total_steps = 1 + -(-self._n_true // self.chunk_len)

    @property
    def done(self) -> bool:
        return self._state is not None

    def step(self) -> bool:
        """Run the next bounded unit of work. Returns ``done``."""
        if self._state is not None:
            return True
        if self._embeds is None:
            self._embeds, self._pos3 = _embeds_and_pos(
                self.params, self.cfg, self.batch, self.vision_features)
            self._cache = qwen2.KVCache.zeros(
                self.cfg.llm, self._B, self.max_cache_len,
                dtype=self.cache_dtype)
            D = self._embeds.shape[-1]
            self._h_last = jnp.zeros((self._B, D), self._embeds.dtype)
            return False
        c0 = self._off
        c1 = min(c0 + self.chunk_len, self._n_true)
        emb = jax.lax.slice_in_dim(self._embeds, c0, c1, axis=1)
        pos = jax.lax.slice_in_dim(self._pos3, c0, c1, axis=1)
        self._cache, self._h_last = _prefill_chunk(
            self.params, self.cfg, self._cache, self._h_last, emb, pos,
            jnp.asarray(c0, jnp.int32), self.batch.seq_len)
        self._off = c1
        if c1 < self._n_true:
            return False
        next_logits = _finish_chunked_logits(self.params, self.cfg,
                                             self._h_last)
        cache, self._cache = self._cache, None
        self._embeds = self._pos3 = self._h_last = None
        self._state = DecodeState(
            next_logits=next_logits, cache=cache, pos=self.batch.seq_len,
            done=jnp.zeros((self._B,), bool),
            step=jnp.zeros((), jnp.int32))
        return True

    def result(self) -> DecodeState:
        assert self._state is not None, "stepper not finished"
        return self._state


class DecodeState(NamedTuple):
    """Carried decode state for chunked/streaming generation."""

    next_logits: jax.Array   # (B, vocab) logits for the next position
    cache: qwen2.KVCache
    pos: jax.Array           # (B,) next absolute position
    done: jax.Array          # (B,)
    step: jax.Array          # () total steps emitted so far


@functools.partial(jax.jit, static_argnames=("cfg", "max_cache_len",
                                             "cache_dtype"))
def start_decode(params, cfg: ModelConfig, batch: lv3d.Batch,
                 max_cache_len: int, cache_dtype=jnp.bfloat16,
                 vision_features: Optional[jax.Array] = None) -> DecodeState:
    """Prefill and return the initial streaming state."""
    next_logits, cache, start_pos = prefill_multimodal(
        params, cfg, batch, max_cache_len, cache_dtype, vision_features)
    B = next_logits.shape[0]
    return DecodeState(next_logits=next_logits, cache=cache, pos=start_pos,
                       done=jnp.zeros((B,), bool),
                       step=jnp.zeros((), jnp.int32))


def shared_prefix_view(prefix: qwen2.KVCache, prefix_len: int,
                       B: int) -> "qwen2.KVCache | None":
    """Batch-free view of a stored B=1 prefix for the SHARED-prefix
    attention path, or None when the path does not apply.

    B > 1 only: at B=1 the folded row count equals the old layout's, so
    the split pays extra kernel work for no stream win (measured 16.6 vs
    15.4 ms on chip, BENCH_NOTES r4). Sliced to ``prefix_len``: the
    shared path attends every prefix slot UNMASKED (they all precede the
    suffix positions), so pad slots beyond the true prefix must not
    reach the kernel. Used by start_decode_prefix, ground_suffix, and
    speculative.spec_prefill_prefix.
    """
    if not (SHARED_PREFIX_ATTN and prefix.k.shape[1] == 1 and B > 1):
        return None
    return qwen2.KVCache(
        prefix.k[:, 0, :prefix_len], prefix.v[:, 0, :prefix_len],
        None if prefix.k_scale is None
        else prefix.k_scale[:, 0, :prefix_len],
        None if prefix.v_scale is None
        else prefix.v_scale[:, 0, :prefix_len])


def _write_prefix(cache: qwen2.KVCache, prefix: qwen2.KVCache) -> qwen2.KVCache:
    """Copy a (layers, B, P, KV, hd) prefix slice into the head of a fresh
    cache (prefix-KV reuse). A B=1 prefix broadcasts across a B>1 cache
    (scene-grouped batched suffix decode: every row shares the scene
    prefix). Dtypes must already match (the prefix was sliced from a cache
    of the same ``cache_dtype``)."""
    def put(big, pre):
        if pre.shape[1] == 1 and big.shape[1] > 1:
            pre = jnp.broadcast_to(
                pre, (pre.shape[0], big.shape[1], *pre.shape[2:]))
        return jax.lax.dynamic_update_slice(big, pre, (0,) * big.ndim)

    k, v = put(cache.k, prefix.k), put(cache.v, prefix.v)
    if cache.k_scale is not None:
        return qwen2.KVCache(k, v, put(cache.k_scale, prefix.k_scale),
                             put(cache.v_scale, prefix.v_scale))
    return qwen2.KVCache(k, v)


@functools.partial(jax.jit, static_argnames=("cfg", "prefix_len",
                                             "max_cache_len", "cache_dtype"))
def start_decode_prefix(params, cfg: ModelConfig, batch: lv3d.Batch,
                        prefix: qwen2.KVCache, prefix_len: int,
                        max_cache_len: int,
                        cache_dtype=jnp.bfloat16) -> DecodeState:
    """Prefill only a question SUFFIX against a cached scene-prefix KV.

    Video-3D-LLM workloads ask ~50-200 questions per scene; every question
    shares the same spliced prefix (system + user header + the V*210-token
    vision block — ScanQA val: ~1700 of ~1750 prefill tokens), and causal
    attention makes the prefix KV question-independent. The reference
    re-prefills the full sequence per question (model_scanqa.py:173-186);
    here the engine caches the prefix KV once per scene and each later
    question prefills just its suffix (question + assistant header) into a
    fresh cache seeded with the prefix — skipping video IO, geometry, the
    tower AND ~95% of prefill FLOPs.

    Args:
      batch: SUFFIX slice of the full splice plan (``slice_suffix_plan``):
        ``text_ids``/``kind``/... are (B, Ls) covering spliced positions
        [prefix_len, prefix_len + Ls); ``batch.seq_len`` stays the TOTAL
        true length. The suffix must contain no vision tokens.
      prefix: (layers, B, prefix_len, KV, hd) cache slice, same dtype family
        as ``cache_dtype`` (int8 prefixes carry scales).
    Returns:
      DecodeState identical (bf16 cache: bit-identical logits up to reduction
      order) to full-prefill ``start_decode`` — decode proceeds unchanged.
    """
    B, Ls = batch.text_ids.shape
    cache = qwen2.KVCache.zeros(cfg.llm, B, max_cache_len, dtype=cache_dtype)
    cache = _write_prefix(cache, prefix)

    D = params["llm"]["embed_tokens"].shape[-1]
    dummy_vis = jnp.zeros((B, 1, D), params["llm"]["embed_tokens"].dtype)
    embeds = lv3d.assemble_embeds(params, cfg, dummy_vis, batch.text_ids,
                                  batch.kind, batch.vision_index,
                                  batch.coord_mask, batch.box_input)
    pos3 = lv3d._position_ids_3d(batch, cfg)
    cache_positions = prefix_len + jnp.broadcast_to(
        jnp.arange(Ls)[None], (B, Ls))
    # prefill=False routes attention through the cached-KV path
    # (q_positions causal masking — the speculative-verify machinery), so
    # suffix queries see prefix keys + their own causal block. A batch-free
    # (B == 1) prefix additionally takes the SHARED-prefix attention path:
    # the prefix KV streams from HBM once for ALL rows instead of once per
    # (row, q-block) — the scene-grouped batched suffix prefill win
    # (kernels/attention.mha_shared_prefix; VERDICT r3 #1).
    shared = shared_prefix_view(prefix, prefix_len, B)
    hidden, cache = qwen2.qwen2_forward(
        params["llm"], cfg.llm, embeds, pos3, kv_cache=cache,
        cache_positions=cache_positions, kv_len=batch.seq_len,
        contiguous_update=True, shared_prefix=shared)
    last = jnp.take_along_axis(
        hidden, (batch.seq_len - 1 - prefix_len)[:, None, None], axis=1)
    next_logits = qwen2.lm_head(params["llm"], last)[:, 0]
    return DecodeState(next_logits=next_logits, cache=cache,
                       pos=batch.seq_len, done=jnp.zeros((B,), bool),
                       step=jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg", "prefix_len",
                                             "max_cache_len", "cache_dtype"))
def ground_suffix(params, cfg: ModelConfig, batch: lv3d.Batch,
                  prefix: qwen2.KVCache, prefix_len: int, max_cache_len: int,
                  cache_dtype, obj_feats: jax.Array, object_valid: jax.Array,
                  ground_slot: jax.Array) -> jax.Array:
    """Grounding scores via the scene-prefix KV cache: prefill only the
    query suffix (which contains the <ground> token) against the cached
    prefix, then score the precomputed question-independent object
    features (lv3d._grounding_object_features) — no video IO, geometry,
    masks, tower, or full prefill per query.

    Args:
      batch: suffix slice of the full plan (see start_decode_prefix).
      ground_slot: () or (B,) ABSOLUTE spliced index of each row's
        <ground> token (must fall inside the suffix; the engine
        guarantees it). Scene-grouped batched queries place it at
        per-row positions — a scalar is broadcast.
    Returns:
      (N+1,) scores at B=1, (B, N+1) otherwise — equal to
      lv3d.grounding_forward up to cache precision (the prefix KV was
      stored at cache_dtype; the cache-free grounding forward attends
      raw-precision K/V).
    """
    B, Ls = batch.text_ids.shape
    cache = qwen2.KVCache.zeros(cfg.llm, B, max_cache_len, dtype=cache_dtype)
    cache = _write_prefix(cache, prefix)
    D = params["llm"]["embed_tokens"].shape[-1]
    dummy_vis = jnp.zeros((B, 1, D), params["llm"]["embed_tokens"].dtype)
    embeds = lv3d.assemble_embeds(params, cfg, dummy_vis, batch.text_ids,
                                  batch.kind, batch.vision_index,
                                  batch.coord_mask, batch.box_input)
    pos3 = lv3d._position_ids_3d(batch, cfg)
    cache_positions = prefix_len + jnp.broadcast_to(
        jnp.arange(Ls)[None], (B, Ls))
    shared = shared_prefix_view(prefix, prefix_len, B)
    hidden, _ = qwen2.qwen2_forward(
        params["llm"], cfg.llm, embeds, pos3, kv_cache=cache,
        cache_positions=cache_positions, kv_len=batch.seq_len,
        contiguous_update=True, shared_prefix=shared)
    # score EVERY row (scene-grouped batched queries share the prefix and
    # the object features) at ITS OWN <ground> position; B=1 keeps the
    # engine's (N+1,) contract
    gs = jnp.broadcast_to(jnp.asarray(ground_slot, jnp.int32), (B,))
    queries = jnp.take_along_axis(
        hidden, (gs - prefix_len)[:, None, None], axis=1)[:, 0]   # (B, D)
    scores = jax.vmap(
        lambda q: lv3d.ground_scores(params, q, obj_feats, object_valid,
                                     cfg))(queries)
    return scores[0] if B == 1 else scores


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens",
                                             "eos_token_id", "temperature",
                                             "top_p", "top_k"),
                   donate_argnums=(2,))
def generate_from_state(params, cfg: ModelConfig, state: DecodeState,
                        max_new_tokens: int = 512,
                        eos_token_id: int = 151645,
                        temperature: float = 0.0, top_p: float = 1.0,
                        top_k: int = 0,
                        rng_key: Optional[jax.Array] = None
                        ) -> GenerateResult:
    """The decode phase of :func:`generate_greedy` from an existing
    DecodeState (full or prefix-cached prefill) — same while_loop, same
    rng folding, so greedy/sampled emissions match generate_greedy exactly
    for a state produced by ``start_decode``."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    B = state.next_logits.shape[0]

    class State(NamedTuple):
        step: jax.Array
        tokens: jax.Array
        done: jax.Array
        lengths: jax.Array
        inner: DecodeState

    init = State(step=jnp.zeros((), jnp.int32),
                 tokens=jnp.full((B, max_new_tokens), eos_token_id, jnp.int32),
                 done=state.done,
                 lengths=jnp.zeros((B,), jnp.int32),
                 inner=state)

    def cond(s: State):
        return (s.step < max_new_tokens) & ~jnp.all(s.done)

    def body(s: State):
        step_key = jax.random.fold_in(rng_key, s.step)
        tok = sample_token(s.inner.next_logits, step_key, temperature, top_p,
                           top_k)
        tok = jnp.where(s.done, eos_token_id, tok)
        tokens = s.tokens.at[:, s.step].set(tok)
        now_done = s.done | (tok == eos_token_id)
        lengths = jnp.where(s.done, s.lengths,
                            jnp.where(tok == eos_token_id, s.lengths,
                                      s.lengths + 1))
        pos = s.inner.pos
        step_embeds = qwen2.embed_tokens(params["llm"], tok[:, None])
        hidden, cache = qwen2.qwen2_forward(
            params["llm"], cfg.llm, step_embeds,
            _decode_position_ids(pos[:, None]),
            kv_cache=s.inner.cache, cache_positions=pos[:, None],
            kv_len=pos + 1)
        logits = qwen2.lm_head(params["llm"], hidden)[:, 0].astype(
            s.inner.next_logits.dtype)
        inner = DecodeState(next_logits=logits, cache=cache, pos=pos + 1,
                            done=now_done, step=s.inner.step + 1)
        return State(s.step + 1, tokens, now_done, lengths, inner)

    final = jax.lax.while_loop(cond, body, init)
    return GenerateResult(tokens=final.tokens, lengths=final.lengths)


def empty_decode_state(cfg: ModelConfig, num_slots: int, max_cache_len: int,
                       cache_dtype=jnp.bfloat16,
                       logits_dtype=jnp.float32) -> DecodeState:
    """All-done S-slot DecodeState: the persistent state of a continuous
    batcher (serve/batcher.py). Slots are rows; admission = insert_decode_slot
    with a B=1 start_decode result."""
    cache = qwen2.KVCache.zeros(cfg.llm, num_slots, max_cache_len,
                                dtype=cache_dtype)
    return DecodeState(
        next_logits=jnp.zeros((num_slots, cfg.llm.vocab_size), logits_dtype),
        cache=cache,
        pos=jnp.zeros((num_slots,), jnp.int32),
        done=jnp.ones((num_slots,), bool),
        step=jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, donate_argnums=(0,))
def insert_decode_slot(state: DecodeState, slot: jax.Array,
                       sub: DecodeState) -> DecodeState:
    """Graft a freshly-prefilled B=1 DecodeState into row ``slot``. One jit
    for any slot index (traced scalar); caches must share max_cache_len."""
    cache = jax.tree.map(lambda big, small: big.at[:, slot].set(small[:, 0]),
                         state.cache, sub.cache)
    return DecodeState(
        next_logits=state.next_logits.at[slot].set(
            sub.next_logits[0].astype(state.next_logits.dtype)),
        cache=cache,
        pos=state.pos.at[slot].set(sub.pos[0]),
        done=state.done.at[slot].set(sub.done[0]),
        step=state.step)


@functools.partial(jax.jit, donate_argnums=(0,))
def release_decode_slot(state: DecodeState, slot: jax.Array) -> DecodeState:
    """Force a slot done (request finished / budget exhausted / cancelled);
    decode_chunk then emits EOS padding for it until it is reused."""
    return state._replace(done=state.done.at[slot].set(True))


@functools.partial(jax.jit, static_argnames=("cfg", "chunk", "eos_token_id",
                                             "temperature", "top_p", "top_k"),
                   donate_argnums=(2,))
def decode_chunk(params, cfg: ModelConfig, state: DecodeState,
                 chunk: int = 16, eos_token_id: int = 151645,
                 temperature: float = 0.0, top_p: float = 1.0,
                 top_k: int = 0,
                 rng_key: Optional[jax.Array] = None
                 ) -> Tuple[DecodeState, jax.Array]:
    """Emit up to ``chunk`` tokens from a carried DecodeState.

    The streaming equivalent of the reference's threaded
    TextIteratorStreamer (serve/model_worker.py generate_stream): the host
    loop calls this repeatedly, decoding incrementally without re-running
    the prefill. Returns (new_state, tokens (B, chunk) — EOS-padded once a
    sample finishes)."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    def body(carry, i):
        s = carry
        step_key = jax.random.fold_in(rng_key, s.step)
        tok = sample_token(s.next_logits, step_key, temperature, top_p, top_k)
        tok = jnp.where(s.done, eos_token_id, tok)
        now_done = s.done | (tok == eos_token_id)
        step_embeds = qwen2.embed_tokens(params["llm"], tok[:, None])
        hidden, cache = qwen2.qwen2_forward(
            params["llm"], cfg.llm, step_embeds,
            _decode_position_ids(s.pos[:, None]),
            kv_cache=s.cache, cache_positions=s.pos[:, None],
            kv_len=s.pos + 1)
        # keep the carry dtype stable: a persistent batcher state may hold
        # f32 logits (empty_decode_state) while bf16 params emit bf16
        logits = qwen2.lm_head(params["llm"],
                               hidden)[:, 0].astype(s.next_logits.dtype)
        new = DecodeState(next_logits=logits, cache=cache, pos=s.pos + 1,
                          done=now_done, step=s.step + 1)
        return new, tok

    new_state, toks = jax.lax.scan(body, state, jnp.arange(chunk))
    return new_state, toks.T                      # (B, chunk)


# ---------------------------------------------------------------------------
# Paged-cache continuous decoding (models/paged_kv.py): the batcher state
# whose HBM scales with total live tokens instead of slots x max_cache_len.
# ---------------------------------------------------------------------------


class PagedDecodeState(NamedTuple):
    """S-slot streaming state over a shared page pool. Slot lengths live in
    ``cache.lens`` (the single source of truth; == the dense state's pos)."""

    next_logits: jax.Array   # (S, vocab)
    cache: object            # models/paged_kv.PagedKVCache
    done: jax.Array          # (S,)
    step: jax.Array          # ()


def empty_paged_state(cfg: ModelConfig, num_slots: int, num_pages: int,
                      page_size: int, max_pages: int,
                      cache_dtype=jnp.bfloat16,
                      logits_dtype=jnp.float32) -> PagedDecodeState:
    """All-done paged batcher state (serve/batcher.py paged mode)."""
    from video3d_tpu.models.paged_kv import PagedKVCache

    cache = PagedKVCache.zeros(cfg.llm, num_pages, page_size, num_slots,
                               max_pages, dtype=cache_dtype)
    return PagedDecodeState(
        next_logits=jnp.zeros((num_slots, cfg.llm.vocab_size), logits_dtype),
        cache=cache,
        done=jnp.ones((num_slots,), bool),
        step=jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("n_pages", "skip_pages"))
def insert_paged_slot(state: PagedDecodeState, slot: jax.Array,
                      sub: DecodeState, page_row: jax.Array,
                      n_pages: int, skip_pages: int = 0) -> PagedDecodeState:
    """Graft a freshly-prefilled B=1 dense DecodeState into paged slot
    ``slot``: its first ``n_pages`` pages (listed in ``page_row``, the
    host-allocated (max_pages,) table row) receive the dense cache's
    n_pages * page_size positions verbatim (int8 caches transplant values
    AND scales — no requantization), ``lens[slot]`` becomes the true
    prefill length. One jit per (bucket-length, pool) shape pair.

    ``skip_pages``: shared-prefix admission (serve/batcher.py) — the
    row's first entries are immutable scene-prefix pages whose contents
    were already written by :func:`write_shared_prefix`; only pages
    ``skip_pages..n_pages`` are copied from the dense cache.
    """
    from video3d_tpu.models.paged_kv import transplant_dense

    new_cache = transplant_dense(state.cache, sub.cache, slot, page_row,
                                 n_pages, sub.pos[0], skip_pages=skip_pages)
    return PagedDecodeState(
        next_logits=state.next_logits.at[slot].set(
            sub.next_logits[0].astype(state.next_logits.dtype)),
        cache=new_cache,
        done=state.done.at[slot].set(sub.done[0]),
        step=state.step)


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("n_pages",))
def write_shared_prefix(cache, prefix, pages: jax.Array, n_pages: int):
    """Write a scene's prefix KV into ``n_pages`` shared pool pages (the
    paged batcher's prefix-sharing path). ``cache`` is the live
    PagedKVCache (donated — pools update in place); ``prefix`` the dense
    (layers, 1, P, KV, hd) _PrefixEntry slice, same dtype family."""
    from video3d_tpu.models.paged_kv import scatter_shared_prefix

    return scatter_shared_prefix(cache, prefix, pages, n_pages)


@functools.partial(jax.jit, donate_argnums=(0,))
def release_paged_slot(state: PagedDecodeState,
                       slot: jax.Array) -> PagedDecodeState:
    """Force a slot done; the host frees its pages back to the allocator
    (they are never dereferenced again: done rows append to the scratch
    page and their length is frozen)."""
    return state._replace(done=state.done.at[slot].set(True))


@functools.partial(jax.jit, static_argnames=("cfg", "chunk", "eos_token_id",
                                             "temperature", "top_p", "top_k"),
                   donate_argnums=(2,))
def paged_decode_chunk(params, cfg: ModelConfig, state: PagedDecodeState,
                       chunk: int = 16, eos_token_id: int = 151645,
                       temperature: float = 0.0, top_p: float = 1.0,
                       top_k: int = 0,
                       rng_key: Optional[jax.Array] = None
                       ) -> Tuple[PagedDecodeState, jax.Array]:
    """decode_chunk over the paged cache: same emission semantics (EOS
    padding for done rows), but dead slots neither advance their length
    nor touch their pages. The caller guarantees page capacity for
    ``lens + chunk`` on every live slot (the paged batcher reserves the
    full budget at admission)."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    def body(carry, i):
        s = carry
        step_key = jax.random.fold_in(rng_key, s.step)
        tok = sample_token(s.next_logits, step_key, temperature, top_p,
                           top_k)
        tok = jnp.where(s.done, eos_token_id, tok)
        now_done = s.done | (tok == eos_token_id)
        step_embeds = qwen2.embed_tokens(params["llm"], tok[:, None])
        hidden, cache = qwen2.qwen2_forward(
            params["llm"], cfg.llm, step_embeds,
            _decode_position_ids(s.cache.lens[:, None]),
            paged_cache=s.cache, paged_active=~s.done)
        logits = qwen2.lm_head(params["llm"],
                               hidden)[:, 0].astype(s.next_logits.dtype)
        new = PagedDecodeState(next_logits=logits, cache=cache,
                               done=now_done, step=s.step + 1)
        return new, tok

    new_state, toks = jax.lax.scan(body, state, jnp.arange(chunk))
    return new_state, toks.T                      # (B, chunk)


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens",
                                             "eos_token_id", "max_cache_len",
                                             "cache_dtype", "temperature",
                                             "top_p", "top_k"))
def generate_greedy(params, cfg: ModelConfig, batch: lv3d.Batch,
                    max_new_tokens: int = 512,
                    eos_token_id: int = 151645,
                    max_cache_len: Optional[int] = None,
                    cache_dtype=jnp.bfloat16,
                    temperature: float = 0.0,
                    top_p: float = 1.0,
                    top_k: int = 0,
                    rng_key: Optional[jax.Array] = None,
                    vision_features: Optional[jax.Array] = None) -> GenerateResult:
    """Greedy (temperature == 0, the eval default) or sampled decode.

    Args:
      batch: spliced prefill batch (images + plan). ``batch.seq_len`` gives
        per-sample true prefill length; right padding.
      vision_features: optional precomputed (B, T, D) spliceable vision block
        (the anyres 2D-image path, models/anyres.py); skips encode_video.
    Returns:
      GenerateResult with emitted token ids.
    """
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    B, L = batch.text_ids.shape
    if max_cache_len is None:
        max_cache_len = L + max_new_tokens

    next_logits, cache, start_pos = prefill_multimodal(
        params, cfg, batch, max_cache_len, cache_dtype, vision_features)

    class State(NamedTuple):
        step: jax.Array
        tokens: jax.Array
        done: jax.Array
        lengths: jax.Array
        cache: qwen2.KVCache
        next_logits: jax.Array

    init = State(
        step=jnp.zeros((), jnp.int32),
        tokens=jnp.full((B, max_new_tokens), eos_token_id, jnp.int32),
        done=jnp.zeros((B,), bool),
        lengths=jnp.zeros((B,), jnp.int32),
        cache=cache,
        next_logits=next_logits,
    )

    def cond(s: State):
        return (s.step < max_new_tokens) & ~jnp.all(s.done)

    def body(s: State):
        step_key = jax.random.fold_in(rng_key, s.step)
        tok = sample_token(s.next_logits, step_key, temperature, top_p,
                           top_k)                                        # (B,)
        tok = jnp.where(s.done, eos_token_id, tok)
        tokens = s.tokens.at[:, s.step].set(tok)
        now_done = s.done | (tok == eos_token_id)
        lengths = jnp.where(s.done, s.lengths, jnp.where(tok == eos_token_id, s.lengths, s.lengths + 1))

        pos = start_pos + s.step                                     # (B,)
        step_embeds = qwen2.embed_tokens(params["llm"], tok[:, None])
        hidden, cache = qwen2.qwen2_forward(
            params["llm"], cfg.llm, step_embeds,
            _decode_position_ids(pos[:, None]),
            kv_cache=s.cache, cache_positions=pos[:, None],
            kv_len=pos + 1)
        logits = qwen2.lm_head(params["llm"], hidden)[:, 0]
        return State(s.step + 1, tokens, now_done, lengths, cache, logits)

    final = jax.lax.while_loop(cond, body, init)
    return GenerateResult(tokens=final.tokens, lengths=final.lengths)
