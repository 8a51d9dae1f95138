"""Continuous batching for the serve layer (beyond-reference).

The reference worker decodes one request at a time (serve/model_worker.py
generate_stream: a single HF generate loop per request). Decode on TPU is
HBM-bound on weights, so a second concurrent request is almost free until
the batch saturates bandwidth — measured 3.5x total throughput at B=8
(BENCH_NOTES). This module keeps a persistent S-slot ``DecodeState`` and
runs ONE jitted decode loop for all in-flight requests:

  * slots are rows of the state (static shapes). Two cache layouts: dense
    rows (every slot owns a fixed ``max_cache_len`` row — simplest, best
    when budgets are uniform) or, with ``paged=True``, a shared page pool
    (models/paged_kv.py): each request reserves only its own
    prompt + max_new_tokens footprint, so heterogeneous budgets pack
    tightly and the pool can be sized for the expected mix — the
    vLLM-PagedAttention idea, TPU-first (scalar-prefetch kernel, static
    tables, host free-list);
  * admission = a B=1 prefill (``start_decode``) grafted into a free row
    (``insert_decode_slot`` — pure row surgery, one jit for any slot);
  * completion/cancellation = ``release_decode_slot`` (flips ``done``;
    decode emits EOS padding for that row until it is reused);
  * the scheduler thread alternates: admit pending requests into free
    slots, then ``decode_chunk`` once for everyone, streaming each row's
    new tokens to its request queue.

Requests stream incrementally (``BatchedRequest.text_stream``) or block
for the final text (``result``). Output is identical to the sequential
engine path: prefill is per-request B=1, and batched decode rows are
sample-independent.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np

from video3d_tpu.models.generate import (decode_chunk, empty_decode_state,
                                         empty_paged_state,
                                         insert_decode_slot,
                                         insert_paged_slot,
                                         paged_decode_chunk,
                                         release_decode_slot,
                                         release_paged_slot, start_decode)


class BatchedRequest:
    """Handle returned by ContinuousBatcher.submit."""

    _DONE = object()

    def __init__(self, record, box_input, coord_token_id, max_new_tokens):
        self.record = record
        self.box_input = box_input
        self.coord_token_id = coord_token_id
        self.max_new_tokens = max_new_tokens
        self._q: "queue.Queue" = queue.Queue()
        self.tokens: list = []
        self.error: Optional[Exception] = None
        self.cancelled = threading.Event()

    def cancel(self) -> None:
        """Release the request at the next scheduler boundary: an
        in-flight slot is finished (pages freed, decode row goes EOS),
        a queued/deferred admission is dropped before taking a slot.
        Idempotent; safe after completion. The serve worker calls this
        when the HTTP client disconnects mid-stream — without it an
        abandoned request decodes to its full budget while holding a
        slot."""
        self.cancelled.set()

    def text_stream(self, decode_fn):
        """Yield cumulative text after every delivered token batch."""
        while True:
            item = self._q.get()
            if item is self._DONE:
                if self.error is not None:
                    raise self.error
                return
            yield decode_fn(self.tokens)

    def result(self, decode_fn, timeout: Optional[float] = None) -> str:
        while True:
            item = self._q.get(timeout=timeout)
            if item is self._DONE:
                if self.error is not None:
                    raise self.error
                return decode_fn(self.tokens)


class ContinuousBatcher:
    """S-slot continuous batching scheduler over one InferenceEngine.

    Args:
      engine: the InferenceEngine whose params/config/preprocessing to use.
      num_slots: concurrent requests decoded per step (HBM: one cache row
        each of ``max_cache_len``, or page-pool shares in paged mode).
      chunk: decode steps per scheduler iteration — the streaming
        granularity and the admission latency bound.
      max_cache_len: per-request cache budget; defaults to the engine's
        largest prefill bucket + max_new_tokens.
      paged: use the paged KV cache (models/paged_kv.py) instead of dense
        rows — each request reserves only prompt-bucket + its own
        max_new_tokens (+ chunk overshoot) worth of pages at admission, so
        heterogeneous budgets pack tightly and ``total_pages`` can size
        HBM for the expected mix instead of num_slots x worst-case.
        Admissions that do not find enough free pages wait (deferred FIFO)
        until running requests release theirs. Composes with speculative
        mode: the paged target cache takes the verify blocks through the
        multi-token paged forward (models/speculative.py
        paged_spec_decode_chunk) while the tiny early-exit draft cache
        stays dense; per-request page reservations then include the K+2
        verify write-ahead.
      page_size: tokens per page (128 keeps the kernel lane-aligned).
      total_pages: pool size; default num_slots * ceil((max_cache_len +
        chunk) / page_size) + 1 (the dense-equivalent worst case).
      share_prefix_pages: with the engine's scene-prefix KV cache on
        (EngineConfig.prefix_cache_scenes), reference each scene's full
        prefix pages from ONE immutable pool copy instead of
        transplanting a private copy per admission (vLLM prefix block
        sharing): S concurrent requests on a scene hold ~1 prefix KV
        footprint (~98 MB at 7B) instead of S, and admission copies only
        the boundary page + suffix. Safe by construction — every write a
        slot ever issues lands at positions >= its prefill length, past
        the shared pages. Lifetime: pages are held while the engine LRU
        keeps the scene (eviction hook) or any slot references them.
    """

    _DEFER = object()

    def __init__(self, engine, num_slots: int = 4, chunk: int = 8,
                 max_cache_len: Optional[int] = None,
                 draft_params=None, draft_cfg=None,
                 paged: bool = False, page_size: int = 128,
                 total_pages: Optional[int] = None,
                 share_prefix_pages: bool = True,
                 chunked_prefill: int = 0):
        self.engine = engine
        self.num_slots = num_slots
        self.chunk = chunk
        ecfg = engine.ecfg
        self.max_cache_len = max_cache_len or (max(ecfg.buckets)
                                               + ecfg.max_new_tokens)
        self.paged = paged
        # speculative mode: explicit draft weights, or the engine's
        # early-exit self-draft knob — every slot then advances up to
        # spec_k+1 tokens per verify forward (models/speculative.py)
        self.draft_params, self.draft_cfg = draft_params, draft_cfg
        if self.draft_params is None and engine.draft_params is not None:
            # standalone draft weights attached via engine.set_draft_model:
            # keep the batched endpoint's decode mode consistent with the
            # sequential engine path
            self.draft_params = engine.draft_params
            self.draft_cfg = engine.draft_cfg
        self._self_draft_spec = False
        if self.draft_params is None and ecfg.speculative_draft_layers > 0:
            from video3d_tpu.models import speculative as spec

            k = ecfg.speculative_draft_layers
            self.draft_params = spec.self_draft_params(
                engine.params, k, draft_vocab=ecfg.speculative_draft_vocab)
            self.draft_cfg = spec.self_draft_config(engine.cfg.llm, k)
            # the draft IS the target's leading layers -> its prefix KV can
            # seed from the same scene-prefix entry (spec_start_prefix)
            self._self_draft_spec = True
        self.spec = self.draft_params is not None
        if paged:
            from video3d_tpu.models.paged_kv import PageAllocator

            # Reserve the FULL per-request footprint at admission (prompt
            # bucket + max_new_tokens + chunk overshoot; + the K+2 verify
            # write-ahead in speculative mode) so a chunk can never run
            # out of pages mid-flight. The capacity win over the dense
            # rows: each request reserves only ITS budget, and
            # ``total_pages`` may be sized for the expected mix instead of
            # num_slots x worst-case.
            overshoot = chunk + (ecfg.speculative_k + 2 if self.spec else 0)
            self.page_size = page_size
            self.max_pages = -(-(self.max_cache_len + overshoot)
                               // page_size)
            self.total_pages = total_pages or (
                1 + num_slots * self.max_pages)
            if self.spec:
                from video3d_tpu.models.speculative import \
                    empty_paged_spec_slots

                # draft cache stays dense (tiny: draft_k layers) with the
                # same verify slack as the dense spec mode
                self.state = empty_paged_spec_slots(
                    engine.cfg, self.draft_cfg, num_slots,
                    self.total_pages, page_size, self.max_pages,
                    self.max_cache_len + ecfg.speculative_k + 2,
                    cache_dtype=engine._cache_dtype())
            else:
                self.state = empty_paged_state(
                    engine.cfg, num_slots, self.total_pages, page_size,
                    self.max_pages, cache_dtype=engine._cache_dtype())
            self._alloc = PageAllocator(self.total_pages)
            self._slot_pages: list = [None] * num_slots
            self._deferred: list = []   # admissions awaiting free pages
            # vLLM-style prefix block sharing: when the engine's scene-
            # prefix KV cache is on, each scene's full prefix pages are
            # written ONCE into the pool (write_shared_prefix) and every
            # admission on that scene references them in its table row
            # (insert skip_pages) instead of carrying a private copy — S
            # concurrent requests on one scene hold ~1 prefix footprint
            # instead of S. Entries: key -> {pages, refs, dead, sig};
            # refs = live slots + 1 cache hold, dropped when the engine
            # LRU evicts the scene (hook -> _evicted_keys, drained on the
            # scheduler thread so all page accounting is single-threaded).
            self.share_prefix = bool(share_prefix_pages)
            self._shared: dict = {}
            self._slot_shared: list = [None] * num_slots
            self._evicted_keys: "queue.Queue" = queue.Queue()
            self._evict_hook = self._evicted_keys.put
            if self.share_prefix:
                engine._prefix_evict_hooks.append(self._evict_hook)
            self.prefix_share_stats = [0, 0]   # [shared admits, creations]
        elif self.spec:
            from video3d_tpu.models.speculative import empty_spec_slots

            # +K+2 slack: verify blocks write past the accepted position
            self.max_cache_len += ecfg.speculative_k + 2
            self.state = empty_spec_slots(engine.cfg, self.draft_cfg,
                                          num_slots, self.max_cache_len,
                                          cache_dtype=engine._cache_dtype())
        else:
            self.state = empty_decode_state(engine.cfg, num_slots,
                                            self.max_cache_len,
                                            cache_dtype=engine._cache_dtype())
        # Sarathi-style chunked prefill (models/generate.py
        # ChunkedPrefill): cold FULL-mode admissions run chunked_prefill
        # tokens per scheduler iteration between shared decode chunks,
        # bounding the decode stall to ~max(tower, one chunk) instead of
        # the whole prompt prefill. One job at a time, FIFO; prefix-mode
        # admissions stay atomic (already ~1 decode step), speculative
        # mode disables it (verify blocks interleave poorly with a
        # half-prefilled target cache).
        self.chunk_prefill = 0 if self.spec else max(0, int(chunked_prefill))
        self._job = None          # {"req", "prep", "stepper", "bucket"}
        self._chunkq: list = []   # (req, prep) awaiting the job pipeline
        # True while a FINISHED job waits on a slot/pages — the idle path
        # must sleep then (stepping can't progress; only releases or
        # eviction drains free resources), not busy-spin
        self._job_blocked = False
        self.slots: list = [None] * num_slots          # BatchedRequest or None
        self.emitted = [0] * num_slots
        # acceptance guard (ecfg.speculative_min_acceptance): measured from
        # kept emissions; on sustained low acceptance the batcher demotes
        # itself to plain decoding at the next idle boundary
        self._spec_offered = 0
        self._spec_accepted = 0
        self._spec_demote = False
        self._pending: "queue.Queue" = queue.Queue()
        self._wake = threading.Event()
        self._stop = threading.Event()
        # guards slots/emitted/state mutation: _loop holds it around its
        # admit and emission phases (not across the shared decode_chunk
        # dispatch), and shutdown() takes it before failing in-flight
        # requests — so even if the join times out mid-decode, the two sides
        # can't race on slot surgery, double-put _DONE, or strand a request
        # admitted concurrently with shutdown
        self._lock = threading.Lock()
        # host preprocessing (tokenize + video IO + geometry) runs OFF the
        # scheduler thread so admissions never stall the shared decode loop
        from concurrent.futures import ThreadPoolExecutor

        self._prep = ThreadPoolExecutor(max_workers=2,
                                        thread_name_prefix="batcher-prep")
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------- public API -------------

    def submit(self, record, box_input=None, coord_token_id=None,
               max_new_tokens: Optional[int] = None) -> BatchedRequest:
        req = BatchedRequest(
            record, box_input, coord_token_id,
            self.engine.ecfg.max_new_tokens if max_new_tokens is None
            else max(0, int(max_new_tokens)))   # 0 is a valid budget

        def prepare():
            try:
                use_prefix = (
                    self._self_draft_spec
                    and self.engine._prefix_cache_spec_on(req.record)
                    if self.spec
                    else self.engine._prefix_cache_on(req.record))
                if use_prefix:
                    # scene-prefix KV path (dict result): a hit skips video
                    # IO/geometry/tower here and ~95% of the admission
                    # prefill in _admit (engine.start_request /
                    # start_spec_request — self-drafts seed from the same
                    # prefix; standalone drafts keep the full spec_start)
                    prepared = self.engine.prepare_request(
                        req.record, req.box_input, req.coord_token_id)
                else:
                    prepared = self.engine._prepare_generation(
                        req.record, req.box_input, req.coord_token_id)
                if self._stop.is_set():
                    raise RuntimeError("batcher shut down")
                self._pending.put((req, prepared))
            except Exception as e:  # noqa: BLE001
                req.error = e
                req._q.put(BatchedRequest._DONE)
            self._wake.set()

        self._prep.submit(prepare)
        return req

    def generate(self, record, **kw) -> str:
        return self.submit(record, **kw).result(self.engine._decode_text)

    def generate_stream(self, record, **kw):
        return self.submit(record, **kw).text_stream(self.engine._decode_text)

    def shutdown(self):
        self._stop.set()
        self._wake.set()
        if self.paged and self.share_prefix:
            try:
                self.engine._prefix_evict_hooks.remove(self._evict_hook)
            except ValueError:
                pass
        # a first-time jit compile or slow decode chunk can exceed 30 s; the
        # lock below makes the cleanup safe even if the thread is still
        # draining its current chunk when the join times out
        self._thread.join(timeout=30)
        # don't block on a hung video IO / compile: cancel queued prep work
        # (prepare() checks _stop before handing results to the dead loop)
        self._prep.shutdown(wait=False, cancel_futures=True)
        # fail everything still waiting so result()/text_stream() callers
        # never hang on a stopped batcher; under _lock so a still-running
        # _loop can't concurrently emit to / finish the same slots
        err = RuntimeError("batcher shut down")
        with self._lock:
            self._fail_chunk_pipeline(err)
            for s in range(self.num_slots):
                req = self.slots[s]
                if req is not None:
                    self.slots[s] = None
                    req.error = err
                    req._q.put(BatchedRequest._DONE)
            while True:
                try:
                    req, _ = self._pending.get_nowait()
                except queue.Empty:
                    break
                req.error = err
                req._q.put(BatchedRequest._DONE)
            if self.paged:
                for req, _ in self._deferred:
                    req.error = err
                    req._q.put(BatchedRequest._DONE)
                self._deferred.clear()

    # ------------- scheduler -------------

    def _admit(self, slot: int, req: BatchedRequest, prepared) -> bool:
        """Prefill an already-preprocessed request and graft it into
        ``slot`` (preprocessing ran on the prep pool, submit())."""
        import jax.numpy as jnp

        eng = self.engine
        try:
            if isinstance(prepared, dict) \
                    and prepared.get("mode") == "chunked_state":
                # a finished ChunkedPrefill (the job pipeline): the
                # prefill already ran chunk-by-chunk; only the slot/page
                # grafting below remains
                batch = vision_features = None
                bucket = prepared["bucket"]
            elif isinstance(prepared, dict):
                # prefix-aware prep (engine.prepare_request); prefill runs
                # through engine.start_request against this batcher's rows.
                # Refresh HERE (idempotent; start_request refreshes too) so
                # the page reservation below sees the final mode — a burst
                # of same-scene requests all prepares as misses before the
                # first admission harvests the prefix.
                refreshed = eng._refresh_prep(prepared)
                if refreshed is not prepared:
                    # prefix plans bucket total+max_new while full plans
                    # bucket the prompt; keep the original full prep when
                    # the upgraded bucket no longer fits this pool's rows
                    # (start_request will still upgrade internally with
                    # the smaller scratch, the pre-refresh behavior)
                    slack0 = (eng.ecfg.speculative_k + 2
                              if self.spec and not self.paged else 0)
                    if self.max_cache_len - refreshed["bucket"] - slack0 > 0:
                        prepared = refreshed
                batch, vision_features = prepared["batch"], \
                    prepared.get("vf")
                bucket = prepared["bucket"]
            else:
                batch, vision_features = prepared
                bucket = int(batch.text_ids.shape[1])
            # clamp the budget to the cache row: positions past
            # max_cache_len would silently drop KV writes.
            # NOTE not a double-count with __init__'s `max_cache_len += K+2`:
            # verify blocks write up to K+2 slots past the accepted position,
            # so a row physically needs prompt + emitted + (K+2) slots. The
            # pre-growth and this subtraction cancel exactly, leaving
            # room == nominal_cache_len - prompt — identical to the
            # non-speculative path's budget semantics.
            # (in paged mode the K+2 write-ahead is budgeted into the page
            # reservation instead — max_cache_len was never pre-grown)
            slack = (eng.ecfg.speculative_k + 2
                     if self.spec and not self.paged else 0)
            room = self.max_cache_len - bucket - slack
            if room <= 0:
                raise ValueError(
                    f"prompt bucket {bucket} does not "
                    f"fit this batcher's cache rows ({self.max_cache_len}); "
                    "route to a larger pool (serve/router.py)")
            if req.max_new_tokens > room:
                req.max_new_tokens = room
            if self.paged:
                from video3d_tpu.models.generate import write_shared_prefix
                from video3d_tpu.models.paged_kv import pages_needed

                page = self.page_size
                L_bucket = bucket
                prompt_pages = pages_needed(L_bucket, page)
                overshoot = self.chunk + (
                    eng.ecfg.speculative_k + 2 if self.spec else 0)
                need = min(
                    pages_needed(L_bucket + req.max_new_tokens + overshoot,
                                 page),
                    self.max_pages)
                # ---- prefix block sharing (see __init__) ----
                skip = 0
                shared = None
                if (self.share_prefix and isinstance(prepared, dict)
                        and prepared.get("mode") == "prefix"
                        and isinstance(prepared.get("key"), str)):
                    entry = prepared["entry"]
                    n_full = entry.prefix_len // page
                    sig = (entry.prefix_len, entry.ids_prefix)
                    cand = self._shared.get(prepared["key"])
                    if cand is not None and cand["sig"] != sig:
                        # stale: the engine re-harvested a different
                        # prefix for this scene (dict overwrite fires no
                        # eviction hook). Retire it; live slots keep the
                        # old pages until they finish.
                        self._shared.pop(prepared["key"], None)
                        cand["dead"] = True
                        cand["refs"] -= 1
                        if cand["refs"] == 0:
                            self._alloc.free(cand["pages"])
                        cand = None
                    # the creation's cache-hold ref is only ever released
                    # by the engine's eviction hook, so create ONLY while
                    # the engine still caches the scene — a prep that
                    # out-lived an eviction (its hook already drained as a
                    # no-op) must not mint an entry nobody will evict
                    with eng._cache_lock:
                        engine_holds = prepared["key"] in eng._prefix_cache
                    if n_full <= 0 or n_full >= prompt_pages:
                        pass                  # nothing shareable
                    elif cand is not None:
                        shared, skip = cand, n_full
                    elif engine_holds and self._alloc.available >= need:
                        # first shared admission on this scene: write the
                        # prefix KV into its own pool pages once (the
                        # capacity check covers n_full + this request's
                        # private remainder = exactly `need` pages)
                        spages = self._alloc.alloc(n_full)
                        try:
                            self.state = self.state._replace(
                                cache=write_shared_prefix(
                                    self.state.cache, entry.cache,
                                    jnp.asarray(spages, jnp.int32),
                                    n_pages=n_full))
                        except BaseException:
                            self._alloc.free(spages)
                            raise
                        shared = {"pages": spages, "refs": 1,
                                  "dead": False, "sig": sig}
                        self._shared[prepared["key"]] = shared
                        self.prefix_share_stats[1] += 1
                        skip = n_full
                private_need = need - skip
                if private_need > self._alloc.num_pages - 1:
                    raise ValueError(
                        f"request footprint ({private_need} pages) exceeds "
                        f"the page pool ({self._alloc.num_pages - 1} usable)")
                if private_need > self._alloc.available:
                    return self._DEFER        # wait for pages to free up
                pages = self._alloc.alloc(private_need)
                try:
                    row = jnp.asarray(
                        (shared["pages"][:skip] if shared else []) + pages
                        + [0] * (self.max_pages - need), jnp.int32)
                    if self.spec:
                        from video3d_tpu.models.speculative import (
                            insert_paged_spec_slot, spec_start)

                        if isinstance(prepared, dict):
                            sub, first = eng.start_spec_request(
                                prepared, self.draft_params, self.draft_cfg,
                                max_cache_len=prompt_pages * page,
                                draft_max_cache_len=self.state.d_cache
                                .k.shape[2])
                        else:
                            sub, first = spec_start(
                                eng.params, self.draft_params, eng.cfg,
                                self.draft_cfg, batch,
                                max_cache_len=prompt_pages * page,
                                cache_dtype=eng._cache_dtype(),
                                temperature=eng.ecfg.temperature,
                                top_p=eng.ecfg.top_p, top_k=eng.ecfg.top_k,
                                vision_features=vision_features,
                                draft_max_cache_len=self.state.d_cache
                                .k.shape[2])
                        self.state = insert_paged_spec_slot(
                            self.state, jnp.asarray(slot, jnp.int32), sub,
                            row, n_pages=prompt_pages, skip_pages=skip)
                    else:
                        if isinstance(prepared, dict) \
                                and prepared.get("mode") == "chunked_state":
                            sub = prepared["state"]
                        elif isinstance(prepared, dict):
                            sub = eng.start_request(
                                prepared, max_cache_len=prompt_pages * page)
                        else:
                            sub = start_decode(
                                eng.params, eng.cfg, batch,
                                max_cache_len=prompt_pages * page,
                                cache_dtype=eng._cache_dtype(),
                                vision_features=vision_features)
                        self.state = insert_paged_slot(
                            self.state, jnp.asarray(slot, jnp.int32), sub,
                            row, n_pages=prompt_pages, skip_pages=skip)
                except BaseException:
                    self._alloc.free(pages)
                    raise
                self._slot_pages[slot] = pages
                if shared is not None:
                    shared["refs"] += 1
                    self._slot_shared[slot] = shared
                    self.prefix_share_stats[0] += 1
                self.slots[slot] = req
                self.emitted[slot] = 0
                if self.spec:
                    # the prefill itself emits the first token
                    tok0 = int(first[0])
                    if tok0 == eng.ecfg.eos_token_id \
                            or req.max_new_tokens == 0:
                        self._finish(slot)
                    else:
                        req.tokens.append(tok0)
                        self.emitted[slot] = 1
                        req._q.put(1)
                return True
            if self.spec:
                from video3d_tpu.models.speculative import (insert_spec_slot,
                                                            spec_start)

                if isinstance(prepared, dict):
                    sub, first = eng.start_spec_request(
                        prepared, self.draft_params, self.draft_cfg,
                        max_cache_len=self.max_cache_len)
                else:
                    sub, first = spec_start(
                        eng.params, self.draft_params, eng.cfg,
                        self.draft_cfg, batch,
                        max_cache_len=self.max_cache_len,
                        cache_dtype=eng._cache_dtype(),
                        temperature=eng.ecfg.temperature,
                        top_p=eng.ecfg.top_p,
                        top_k=eng.ecfg.top_k,
                        vision_features=vision_features)
                tok0 = int(first[0])
                self.state = insert_spec_slot(
                    self.state, jnp.asarray(slot, jnp.int32), sub)
                self.slots[slot] = req
                self.emitted[slot] = 0
                # the prefill itself emits the first token
                if tok0 == eng.ecfg.eos_token_id or req.max_new_tokens == 0:
                    self._finish(slot)
                else:
                    req.tokens.append(tok0)
                    self.emitted[slot] = 1
                    req._q.put(1)
                return True
            if isinstance(prepared, dict) \
                    and prepared.get("mode") == "chunked_state":
                sub = prepared["state"]
            elif isinstance(prepared, dict):
                sub = eng.start_request(prepared,
                                        max_cache_len=self.max_cache_len)
            else:
                sub = start_decode(eng.params, eng.cfg, batch,
                                   max_cache_len=self.max_cache_len,
                                   cache_dtype=eng._cache_dtype(),
                                   vision_features=vision_features)
            self.state = insert_decode_slot(self.state,
                                            jnp.asarray(slot, jnp.int32), sub)
            self.slots[slot] = req
            self.emitted[slot] = 0
            return True
        except Exception as e:  # noqa: BLE001 — request-level failure
            req.error = e
            req._q.put(BatchedRequest._DONE)
            return False

    def _step_admission_job(self):
        """One bounded unit of a cold admission (chunked prefill): start
        the next queued job, advance the current one by one chunk, or
        graft a finished state into a free slot. Runs on the scheduler
        thread between decode chunks — the decode stall per iteration is
        ~max(tower, one chunk forward) instead of the whole prefill."""
        from video3d_tpu.models.generate import ChunkedPrefill

        eng = self.engine
        self._job_blocked = False
        with self._lock:
            if self._job is None and self._chunkq:
                req, prep = self._chunkq.pop(0)
                if req.cancelled.is_set():
                    req._q.put(BatchedRequest._DONE)
                    return
                self._job = {"req": req, "prep": prep, "stepper": None,
                             "bucket": None}
            job = self._job
        if job is None:
            return
        req = job["req"]
        if req.cancelled.is_set():
            with self._lock:
                self._job = None
            req._q.put(BatchedRequest._DONE)
            return
        try:
            if job["stepper"] is None:
                prep = job["prep"]
                if isinstance(prep, dict):
                    # a prefix may have appeared while queued: refresh
                    # decides (prefix-upgraded preps come back as a
                    # finished state from start_request_chunked). Same
                    # outgrow fallback as _admit: keep the full prep when
                    # the upgraded prefix bucket (total+max_new) doesn't
                    # fit this pool's rows.
                    refreshed = eng._refresh_prep(prep)
                    if refreshed is not prep \
                            and self.max_cache_len \
                            - refreshed["bucket"] > 0:
                        prep = refreshed
                    job["prep"] = prep
                    job["bucket"] = prep["bucket"]
                else:
                    job["bucket"] = int(prep[0].text_ids.shape[1])
                if self.paged:
                    from video3d_tpu.models.paged_kv import pages_needed

                    mcl = pages_needed(job["bucket"],
                                       self.page_size) * self.page_size
                else:
                    mcl = self.max_cache_len
                if isinstance(prep, dict):
                    job["stepper"] = eng.start_request_chunked(
                        prep, max_cache_len=mcl,
                        chunk_len=self.chunk_prefill)
                else:
                    batch, vf = prep
                    job["stepper"] = ChunkedPrefill(
                        eng.params, eng.cfg, batch, max_cache_len=mcl,
                        chunk_len=self.chunk_prefill,
                        cache_dtype=eng._cache_dtype(),
                        vision_features=vf)
            stepper = job["stepper"]
            if isinstance(stepper, ChunkedPrefill):
                if not stepper.step():
                    return                      # more chunks to go
                state = stepper.result()
                if isinstance(job["prep"], dict):
                    # harvest the scene prefix like the atomic full path
                    state = eng.finish_chunked(job["prep"], state)
                job["stepper"] = state
            state = job["stepper"]              # a finished DecodeState
        except Exception as e:  # noqa: BLE001 — request-level failure
            with self._lock:
                self._job = None
            req.error = e
            req._q.put(BatchedRequest._DONE)
            return
        with self._lock:
            slot = next((s for s in range(self.num_slots)
                         if self.slots[s] is None), None)
            if slot is None:
                self._job_blocked = True        # retry when a slot frees
                return
            prepared = {"mode": "chunked_state", "state": state,
                        "bucket": job["bucket"]}
            if self._admit(slot, req, prepared) is self._DEFER:
                self._job_blocked = True        # retry when pages free
                return
            self._job = None

    def _fail_chunk_pipeline(self, err: Exception):
        """Fail the in-progress job and every queued chunk admission
        (decode-failure reset / shutdown). Caller holds ``_lock``."""
        if self._job is not None:
            req = self._job["req"]
            self._job = None
            req.error = err
            req._q.put(BatchedRequest._DONE)
        for req, _ in self._chunkq:
            req.error = err
            req._q.put(BatchedRequest._DONE)
        self._chunkq.clear()

    def _finish(self, slot: int):
        import jax.numpy as jnp

        if self.paged:
            if self.spec:
                from video3d_tpu.models.speculative import \
                    release_paged_spec_slot

                self.state = release_paged_spec_slot(
                    self.state, jnp.asarray(slot, jnp.int32))
            else:
                self.state = release_paged_slot(
                    self.state, jnp.asarray(slot, jnp.int32))
            if self._slot_pages[slot]:
                self._alloc.free(self._slot_pages[slot])
                self._slot_pages[slot] = None
            sh = self._slot_shared[slot]
            if sh is not None:
                self._slot_shared[slot] = None
                sh["refs"] -= 1
                if sh["dead"] and sh["refs"] == 0:
                    self._alloc.free(sh["pages"])
        elif self.spec:
            from video3d_tpu.models.speculative import release_spec_slot

            self.state = release_spec_slot(self.state,
                                           jnp.asarray(slot, jnp.int32))
        else:
            self.state = release_decode_slot(self.state,
                                             jnp.asarray(slot, jnp.int32))
        req = self.slots[slot]
        self.slots[slot] = None
        if req is not None:
            req._q.put(BatchedRequest._DONE)

    def _loop(self):
        # The mesh context is thread-local; enter it on the scheduler
        # thread so admissions (start_decode) and the shared decode chunk
        # trace under the engine's mesh when one is attached
        # (multi-chip serving, eval/drivers.py InferenceEngine(mesh=...)).
        with self.engine._mesh_ctx():
            self._loop_impl()

    def _loop_impl(self):
        eng = self.engine
        eos = eng.ecfg.eos_token_id
        while not self._stop.is_set():
            with self._lock:
                if self._stop.is_set():
                    break
                # ---- drop shared prefix pages for evicted scenes ----
                if self.paged and self.share_prefix:
                    while True:
                        try:
                            k = self._evicted_keys.get_nowait()
                        except queue.Empty:
                            break
                        sh = self._shared.pop(k, None)
                        if sh is None:
                            continue
                        sh["dead"] = True
                        sh["refs"] -= 1            # the cache-hold ref
                        if sh["refs"] == 0:
                            self._alloc.free(sh["pages"])
                # ---- demote from speculative at an idle boundary ----
                if self._spec_demote and self.spec \
                        and all(r is None for r in self.slots):
                    print("[batcher] speculative acceptance below "
                          f"{eng.ecfg.speculative_min_acceptance}; demoting "
                          "to plain continuous batching")
                    self.spec = False
                    if self.paged:
                        self.state = empty_paged_state(
                            eng.cfg, self.num_slots, self.total_pages,
                            self.page_size, self.max_pages,
                            cache_dtype=eng._cache_dtype())
                        from video3d_tpu.models.paged_kv import \
                            PageAllocator
                        self._alloc = PageAllocator(self.total_pages)
                        self._slot_pages = [None] * self.num_slots
                        self._shared = {}
                        self._slot_shared = [None] * self.num_slots
                    else:
                        self.state = empty_decode_state(
                            eng.cfg, self.num_slots, self.max_cache_len,
                            cache_dtype=eng._cache_dtype())
                # ---- release cancelled in-flight requests ----
                for s in range(self.num_slots):
                    req = self.slots[s]
                    if req is not None and req.cancelled.is_set():
                        self._finish(s)
                # ---- admit into free slots (deferred-first FIFO);
                # cancelled queued requests drop WITHOUT consuming the
                # slot (the while-loop retries the same s) ----
                s = 0
                while s < self.num_slots:
                    if self.slots[s] is not None:
                        s += 1
                        continue
                    if self.paged and self._deferred:
                        req, prepared = self._deferred[0]
                        if req.cancelled.is_set():
                            self._deferred.pop(0)
                            req._q.put(BatchedRequest._DONE)
                            continue          # same slot, next candidate
                        if self._admit(s, req, prepared) is self._DEFER:
                            break     # still not enough pages: keep FIFO
                        self._deferred.pop(0)
                        s += 1
                        continue
                    try:
                        req, prepared = self._pending.get_nowait()
                    except queue.Empty:
                        break
                    if req.cancelled.is_set():
                        req._q.put(BatchedRequest._DONE)
                        continue              # same slot, next candidate
                    if self.chunk_prefill and isinstance(prepared, dict):
                        # refresh ONCE here and forward the result (an
                        # upgraded prefix dict re-refreshes as a no-op in
                        # _admit / the job, so the suffix batch is never
                        # built twice); keep the original full prep when
                        # the upgraded bucket outgrows this pool's rows
                        # (same fallback as _admit's atomic path)
                        refreshed = eng._refresh_prep(prepared)
                        if refreshed is not prepared \
                                and self.max_cache_len \
                                - refreshed["bucket"] > 0:
                            prepared = refreshed
                    if self.chunk_prefill and (
                            not isinstance(prepared, dict)
                            or prepared["mode"] == "full"):
                        # cold admission: chunked-prefill job pipeline
                        # (prefix-mode admissions stay atomic — ~1 step)
                        self._chunkq.append((req, prepared))
                        continue              # same slot, next candidate
                    if self._admit(s, req, prepared) is self._DEFER:
                        self._deferred.append((req, prepared))
                        break
                    s += 1
            # ---- one bounded chunk of an in-progress cold admission ----
            if self.chunk_prefill:
                self._step_admission_job()
            if all(r is None for r in self.slots):
                if (self._job is None and not self._chunkq) \
                        or self._job_blocked:
                    self._wake.wait(timeout=0.1)
                    self._wake.clear()
                continue
            # ---- one decode chunk for every in-flight request ----
            try:
                if self.paged and not self.spec:
                    self.state, toks = paged_decode_chunk(
                        eng.params, eng.cfg, self.state, chunk=self.chunk,
                        eos_token_id=eos, temperature=eng.ecfg.temperature,
                        top_p=eng.ecfg.top_p, top_k=eng.ecfg.top_k)
                    rows = np.asarray(toks).tolist()
                elif self.spec:
                    from video3d_tpu.models.speculative import (
                        paged_spec_decode_chunk, spec_decode_chunk)

                    chunk_fn = (paged_spec_decode_chunk if self.paged
                                else spec_decode_chunk)
                    self.state, emit, keep = chunk_fn(
                        eng.params, self.draft_params, eng.cfg,
                        self.draft_cfg, self.state, iters=self.chunk,
                        num_draft_tokens=eng.ecfg.speculative_k,
                        eos_token_id=eos,
                        temperature=eng.ecfg.temperature,
                        top_p=eng.ecfg.top_p, top_k=eng.ecfg.top_k)
                    # flatten each slot's kept emissions, EOS as terminator
                    emit, keep = np.asarray(emit), np.asarray(keep)
                    min_acc = eng.ecfg.speculative_min_acceptance
                    if min_acc > 0 and not self._spec_demote:
                        # each non-empty iteration keeps 1 correction/bonus
                        # token + its accepted drafts out of K offered
                        kept = keep.sum(axis=2)                 # (S, iters)
                        active = int((kept > 0).sum())
                        self._spec_offered += active \
                            * eng.ecfg.speculative_k
                        self._spec_accepted += max(
                            int(kept.sum()) - active, 0)
                        if self._spec_offered >= 20 * eng.ecfg.speculative_k:
                            rate = self._spec_accepted / self._spec_offered
                            if rate < min_acc:
                                self._spec_demote = True
                    rows = []
                    for s in range(self.num_slots):
                        row = []
                        for j in range(emit.shape[1]):
                            for i in range(emit.shape[2]):
                                if keep[s, j, i]:
                                    row.append(int(emit[s, j, i]))
                        rows.append(row)
                else:
                    self.state, toks = decode_chunk(
                        eng.params, eng.cfg, self.state, chunk=self.chunk,
                        eos_token_id=eos, temperature=eng.ecfg.temperature,
                        top_p=eng.ecfg.top_p, top_k=eng.ecfg.top_k)
                    rows = np.asarray(toks).tolist()
            except Exception as e:  # noqa: BLE001 — keep the loop alive
                # a decode failure must not strand callers: fail every
                # in-flight request, reset the state, keep serving
                print(f"[batcher] decode failed: {e!r}; failing "
                      f"{sum(r is not None for r in self.slots)} requests")
                with self._lock:
                    self._fail_chunk_pipeline(e)
                    for s in range(self.num_slots):
                        req = self.slots[s]
                        if req is not None:
                            self.slots[s] = None
                            req.error = e
                            req._q.put(BatchedRequest._DONE)
                    if self.paged:
                        from video3d_tpu.models.paged_kv import PageAllocator

                        if self.spec:
                            from video3d_tpu.models.speculative import \
                                empty_paged_spec_slots

                            self.state = empty_paged_spec_slots(
                                eng.cfg, self.draft_cfg, self.num_slots,
                                self.total_pages, self.page_size,
                                self.max_pages,
                                self.state.d_cache.k.shape[2],
                                cache_dtype=eng._cache_dtype())
                        else:
                            self.state = empty_paged_state(
                                eng.cfg, self.num_slots, self.total_pages,
                                self.page_size, self.max_pages,
                                cache_dtype=eng._cache_dtype())
                        self._alloc = PageAllocator(self.total_pages)
                        self._slot_pages = [None] * self.num_slots
                        self._shared = {}
                        self._slot_shared = [None] * self.num_slots
                    elif self.spec:
                        from video3d_tpu.models.speculative import \
                            empty_spec_slots

                        self.state = empty_spec_slots(
                            eng.cfg, self.draft_cfg, self.num_slots,
                            self.max_cache_len,
                            cache_dtype=eng._cache_dtype())
                    else:
                        self.state = empty_decode_state(
                            eng.cfg, self.num_slots, self.max_cache_len,
                            cache_dtype=eng._cache_dtype())
                continue
            with self._lock:
                for s in range(self.num_slots):
                    req = self.slots[s]
                    if req is None:
                        continue
                    finished = False
                    new = []
                    for t in rows[s]:
                        if t == eos or self.emitted[s] >= req.max_new_tokens:
                            finished = True
                            break
                        new.append(int(t))
                        self.emitted[s] += 1
                    if new:
                        req.tokens.extend(new)
                        req._q.put(len(new))
                    if finished or self.emitted[s] >= req.max_new_tokens:
                        self._finish(s)
