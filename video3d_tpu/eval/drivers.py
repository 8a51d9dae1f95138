"""Benchmark inference drivers (ScanQA, SQA3D, Scan2Cap, ScanRefer,
Multi3DRefer).

Shared skeleton mirrors the reference drivers (model_scanqa.py:82-252 etc.):
per question — eval-style ChatML ids with an empty assistant turn, 3D video
processing, greedy generate (max_new_tokens 512) or discriminative grounding
forward, jsonl record append. The reference's Ray 1-actor-per-GPU fan-out
(model_scanqa.py:242-252) becomes question-list striping across host
processes (``questions[rank::world]``); each process drives its TPU chip
with jitted static-bucket calls instead of dynamic-shape eager ops.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

import jax.numpy as jnp

from video3d_tpu.config import DataConfig, ModelConfig
from video3d_tpu.constants import DEFAULT_IMAGE_TOKEN, IGNORE_INDEX
from video3d_tpu.data.image_processor import SigLipImageProcessor
from video3d_tpu.data.tokenization import preprocess_qwen, preprocess_qwen_eval
from video3d_tpu.data.video_processor import VideoProcessor
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models.generate import generate_greedy
from video3d_tpu.models.splice import build_splice_plan
from video3d_tpu.ops import geometry

DEFAULT_BUCKETS = (1024, 2048, 4096, 8192, 16384)


def pick_bucket(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclass
class EngineConfig:
    max_new_tokens: int = 512
    eos_token_id: int = 151645          # <|im_end|>
    max_frames: int = 32
    buckets: Tuple[int, ...] = DEFAULT_BUCKETS
    stop_str: str = "<|im_end|>"
    # Prepended to the question text for REAL (the reference's eval
    # scripts take --extra-prompt, defaulting to the 3D-spatial
    # instruction, but only concatenate it into the LOGGED prompt —
    # model_scanqa.py:140 `cur_prompt`, never fed to the model — so
    # reference-parity eval keeps this ""; training does inject the
    # instruction, data/dataset.py:182 == train_3d.py:1262).
    extra_prompt: str = ""
    ground_token_id: Optional[int] = None
    max_objects: int = 150
    # "bfloat16" (default), "int8", or "int4" — int8/int4 store a quantized
    # KV cache (per-token scales, models/qwen2.py KVCache) cutting decode
    # HBM traffic 2x/4x (int4 doubles context/batch capacity again at a
    # looser 4-bit quantization)
    kv_cache_dtype: str = "bfloat16"
    # sampling (reference generate kwargs, model_scanqa.py:176-180:
    # do_sample = temperature > 0); 0.0 -> greedy, the eval default
    temperature: float = 0.0
    top_p: float = 1.0
    top_k: int = 0
    # beam search (model_scanqa.py:230 --num_beams; 1 = greedy/sampled)
    num_beams: int = 1
    length_penalty: float = 1.0
    early_stopping: bool = False
    # speculative decoding (beyond-reference; models/speculative.py):
    # draft-layers > 0 enables an early-exit self-draft of that many target
    # layers (or call engine.set_draft_model for standalone draft weights);
    # greedy output is bit-identical, sampled output follows the exact
    # warped target distribution
    speculative_draft_layers: int = 0
    speculative_k: int = 4
    # truncate the self-draft's lm_head to the first N token columns
    # (0 = full vocab): for self-drafts the shared 1.1 GB head dominates
    # draft cost; output stays exact (verification corrects proposals)
    speculative_draft_vocab: int = 0
    # production guard: if > 0 and the measured draft acceptance rate drops
    # below this after a few requests, fall back to vanilla decoding (a bad
    # draft makes speculation slower, never wrong)
    speculative_min_acceptance: float = 0.0
    # scene-level vision-feature cache (beyond-reference): Video-3D-LLM
    # evals ask ~50-200 questions per scene and the reference re-runs the
    # whole SigLIP tower for every one; the spliceable features depend only
    # on the scene's frames, so an LRU of N scenes amortizes the tower to
    # ~zero in steady state. 0 = off. HBM cost per scene:
    # max_frames * tokens_per_frame * D * 2 bytes (~12 MB at 32x210x3584).
    scene_cache_scenes: int = 0
    # scene-PREFIX KV cache (beyond-reference): every question on a scene
    # shares the spliced prefix (system + user header + vision block,
    # ~1700 of ~1750 prefill tokens), and causal attention makes its KV
    # question-independent. An LRU of N scene prefixes lets later questions
    # prefill only their suffix (question + assistant header) into a fresh
    # cache seeded with the prefix — skipping video IO, geometry, the tower
    # AND ~95% of prefill FLOPs (models/generate.py start_decode_prefix).
    # bf16 answers are identical to the full-prefill path
    # (tests/test_prefix_cache.py). HBM per scene:
    # prefix_len * layers * 2 * kv_width bytes (~98 MB at 7B/1712 tokens).
    # 0 = off. Covers greedy/sampled, streaming, grounding, self-draft
    # speculation, batcher admissions, and mesh (tp/dp) engines; beam
    # search and llava3d fall back to full prefills.
    prefix_cache_scenes: int = 0
    # suffix prefill buckets (compiled once per bucket size)
    suffix_buckets: Tuple[int, ...] = (64, 128, 256, 512)


SPATIAL_INSTRUCTION = ("The video captures 3D spatial information of a scene. "
                       "Please focus on the spatial relationships in the video "
                       "and answer the following questions.")


class _PrefixEntry(NamedTuple):
    """Scene-prefix KV cache entry (EngineConfig.prefix_cache_scenes)."""

    cache: object          # qwen2.KVCache slice (layers, 1, P, KV, hd)
    prefix_len: int        # P — spliced index one past the vision block
    num_frames: int        # V used when the prefix was built
    ids_prefix: tuple      # prompt token ids up to AND incl. the <image> slot


class InferenceEngine:
    """One-model inference wrapper used by all five drivers.

    ``device_geometry=True`` (default on TPU) loads raw depths/poses and runs
    the decode -> unproject -> pool -> voxelize chain through the fused
    Pallas kernel instead of host numpy — the reference's CPU dataloader hot
    loop moved on-device (SURVEY.md §3.1). Grounding drivers always take the
    host path since they need full-resolution world coords for the object
    patch masks.
    """

    def __init__(self, params, model_cfg: ModelConfig, tokenizer,
                 video_processor: VideoProcessor,
                 image_processor: Optional[SigLipImageProcessor] = None,
                 engine_cfg: Optional[EngineConfig] = None,
                 device_geometry: Optional[bool] = None,
                 mesh=None):
        self.mesh = mesh
        if mesh is not None:
            # Multi-chip inference (tensor parallelism + batch dp): params
            # live sharded per parallel/mesh.py rules (serving meshes are
            # usually pure tp: create_mesh(tp=N)); every jitted engine call
            # then traces under the mesh context so attention picks its
            # shard_map kernel paths. The reference has no sharded-inference
            # path (one GPU per eval process, llava/eval/model_*.py) — this
            # is how a >16 GB model serves on a v5e pod slice at all.
            from video3d_tpu.parallel.mesh import shard_params
            params = shard_params(params, mesh)
        self.params = params
        self.cfg = model_cfg
        self.tokenizer = tokenizer
        self.vp = video_processor
        self.ip = image_processor or SigLipImageProcessor(
            size=(model_cfg.vision.image_size,) * 2)
        self.ecfg = engine_cfg or EngineConfig()
        if device_geometry is None:
            import jax

            device_geometry = jax.default_backend() not in ("cpu",)
        self.device_geometry = device_geometry
        self.draft_params = None
        self.draft_cfg = None
        # cumulative speculative stats: [accepted drafts, draft slots offered]
        self.spec_stats = [0, 0]
        self._spec_disabled = False
        # scene cache: video_id -> (spliceable features, V); LRU over
        # ecfg.scene_cache_scenes (guarded by _cache_lock — the batcher's
        # prep pool calls _prepare_generation from several threads)
        from collections import OrderedDict
        from threading import Lock

        self._scene_cache: "OrderedDict" = OrderedDict()
        self._cache_lock = Lock()
        self.scene_cache_stats = [0, 0]       # [hits, misses]
        # scene-prefix KV cache: video_id -> _PrefixEntry (LRU over
        # ecfg.prefix_cache_scenes; same lock discipline)
        self._prefix_cache: "OrderedDict" = OrderedDict()
        self.prefix_cache_stats = [0, 0]      # [hits, misses]
        # grounding companion cache: video_id -> (obj_feats, valid,
        # objects np, n) — the question-independent object features
        # (lv3d._grounding_object_features), harvested with the prefix
        self._ground_obj_cache: "OrderedDict" = OrderedDict()
        # called with each evicted scene key AFTER _cache_lock is released
        # (the paged batcher drops its shared prefix pages on eviction —
        # serve/batcher.py prefix sharing). Callbacks must not re-enter
        # the engine's caches.
        self._prefix_evict_hooks: list = []

    def set_draft_model(self, draft_params, draft_cfg):
        """Attach standalone draft weights (same vocab + hidden size) for
        speculative decoding, e.g. a pruned/distilled checkpoint."""
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg

    def _cache_dtype(self):
        return {"int8": jnp.int8, "int4": jnp.int4}.get(
            self.ecfg.kv_cache_dtype, jnp.bfloat16)

    def _mesh_ctx(self):
        """Ambient-mesh context for jitted call sites (nullcontext when
        single-device). Tracing under the mesh lets kernels/attention.py
        pick its shard_map decode/flash wrappers; committed single-device
        inputs are re-laid-out by :meth:`_shard_inputs` first."""
        import contextlib

        return self.mesh if self.mesh is not None else \
            contextlib.nullcontext()

    def _shard_inputs(self, batch, vision_features):
        """Lay the (tiny) host batch out for the mesh: batch dims over
        dp/fsdp when they divide, everything else replicated. Needed because
        scene-cached features may be committed to one device from a
        pre-mesh jit, and committed mismatched inputs make jit raise."""
        if self.mesh is None:
            return batch, vision_features
        import jax

        from video3d_tpu.parallel.mesh import replicated, shard_batch

        batch = type(batch)(*shard_batch(list(batch), self.mesh))
        if vision_features is not None:
            vision_features = jax.tree.map(
                lambda x: jax.device_put(x, replicated(self.mesh)),
                vision_features)
        return batch, vision_features

    def _generate(self, batch, vision_features=None, cfg=None):
        batch, vision_features = self._shard_inputs(batch, vision_features)
        with self._mesh_ctx():
            return self._generate_impl(batch, vision_features, cfg)

    def _generate_impl(self, batch, vision_features=None, cfg=None):
        """generate_greedy / generate_beam / generate_speculative dispatch.

        ``cfg`` overrides the model config for this call only (the
        plain-video path swaps the PE type) — passed down, never mutated on
        the shared engine (worker threads + the batcher scheduler all read
        self.cfg concurrently)."""
        cfg = cfg if cfg is not None else self.cfg
        speculative = (self.draft_params is not None
                       or self.ecfg.speculative_draft_layers > 0) \
            and not self._spec_disabled
        if speculative and self.ecfg.num_beams == 1:
            from video3d_tpu.models import speculative as spec

            if self.draft_params is not None:
                dp, dc = self.draft_params, self.draft_cfg
            elif cfg.llm == self.cfg.llm:
                # the common case: reuse the cached self-draft (its
                # draft_vocab head slice is an eager device copy)
                dp, dc = self._self_draft()
            else:
                k = self.ecfg.speculative_draft_layers
                dp = spec.self_draft_params(
                    self.params, k,
                    draft_vocab=self.ecfg.speculative_draft_vocab)
                dc = spec.self_draft_config(cfg.llm, k)
            res = spec.generate_speculative(
                self.params, dp, cfg, dc, batch,
                num_draft_tokens=self.ecfg.speculative_k,
                max_new_tokens=self.ecfg.max_new_tokens,
                eos_token_id=self.ecfg.eos_token_id,
                cache_dtype=self._cache_dtype(),
                temperature=self.ecfg.temperature,
                top_p=self.ecfg.top_p, top_k=self.ecfg.top_k,
                vision_features=vision_features)
            # offered slots counted on-device per LIVE row per iteration
            # (SpecResult.offered_drafts) — deriving it from target_forwards
            # would over-count already-done rows at B>1 and bias the
            # acceptance rate low, spuriously tripping the min-acceptance guard
            self.spec_stats[0] += int(res.accepted_drafts)
            self.spec_stats[1] += int(res.offered_drafts)
            self._check_spec_acceptance()
            from video3d_tpu.models.generate import GenerateResult

            return GenerateResult(tokens=res.tokens, lengths=res.lengths)
        if self.ecfg.num_beams > 1:
            from video3d_tpu.models.beam_search import generate_beam

            return generate_beam(self.params, cfg, batch,
                                 num_beams=self.ecfg.num_beams,
                                 max_new_tokens=self.ecfg.max_new_tokens,
                                 eos_token_id=self.ecfg.eos_token_id,
                                 cache_dtype=self._cache_dtype(),
                                 length_penalty=self.ecfg.length_penalty,
                                 early_stopping=self.ecfg.early_stopping,
                                 vision_features=vision_features)
        return generate_greedy(self.params, cfg, batch,
                               max_new_tokens=self.ecfg.max_new_tokens,
                               eos_token_id=self.ecfg.eos_token_id,
                               cache_dtype=self._cache_dtype(),
                               temperature=self.ecfg.temperature,
                               top_p=self.ecfg.top_p,
                               top_k=self.ecfg.top_k,
                               vision_features=vision_features)

    # ------------- shared assembly -------------

    def _discretize_box(self, box_input):
        vox = self.cfg.world_3d.voxel
        if box_input is None or not self.cfg.world_3d.discrete:
            return box_input
        box_input = np.clip(box_input, vox.min_xyz_range, vox.max_xyz_range)
        return np.round((box_input - np.asarray(vox.min_xyz_range, np.float32))
                        / vox.voxel_size)

    def _video_arrays_device(self, video_id: str, box_input=None):
        """TPU fast path: fused geometry kernel for the patch voxel coords."""
        from video3d_tpu.kernels.fused_geometry import fused_patch_voxel_coords

        mc = self.cfg
        S = mc.vision.image_size
        g = -(-mc.vision.num_patches_per_side // mc.spatial_pool_stride)
        Vmax = self.ecfg.max_frames
        raw = self.vp.load_raw(video_id, self.ip, force_sample=True,
                               frames_upbound=Vmax)
        V = raw["video_size"]
        images = np.zeros((1, Vmax, 3, S, S), np.float32)
        images[0, :V] = raw["images"][:V]
        vox = mc.world_3d.voxel
        patch = fused_patch_voxel_coords(
            jnp.asarray(raw["depths"]), jnp.asarray(raw["intrinsic"]),
            jnp.asarray(raw["poses"]), crop=S, grid=g,
            min_xyz=vox.min_xyz_range, max_xyz=vox.max_xyz_range,
            voxel=vox.voxel_size, discretize=mc.world_3d.discrete)
        patch_full = np.zeros((1, Vmax, g, g, 3), np.float32)
        patch_full[0, :V] = np.asarray(patch)
        return raw, V, images, None, patch_full, self._discretize_box(box_input)

    def _video_arrays(self, video_id: str, box_input=None,
                      need_full_coords: bool = False):
        if self.device_geometry and not need_full_coords \
                and self.cfg.world_3d.pooling.n_points == 1:
            return self._video_arrays_device(video_id, box_input)
        vd = self.vp.process_3d_video(video_id, self.ip, force_sample=True,
                                      frames_upbound=self.ecfg.max_frames)
        V = vd["video_size"]
        mc = self.cfg
        S = mc.vision.image_size
        g = -(-mc.vision.num_patches_per_side // mc.spatial_pool_stride)
        Vmax = self.ecfg.max_frames

        images = np.zeros((1, Vmax, 3, S, S), np.float32)
        images[0, :V] = vd["images"][:V]
        coords_full = np.zeros((1, Vmax, S, S, 3), np.float32)
        coords_full[0, :V] = vd["world_coords"][:V]

        pooled = geometry.average_coordinate_in_patch(
            jnp.asarray(coords_full[0]), patch_size=S // g)
        patch = np.asarray(pooled)[None]
        vox = mc.world_3d.voxel
        if mc.world_3d.discrete:
            patch = np.clip(patch, vox.min_xyz_range, vox.max_xyz_range)
            patch = np.round((patch - np.asarray(vox.min_xyz_range, np.float32))
                             / vox.voxel_size)
        return (vd, V, images, coords_full, patch.astype(np.float32),
                self._discretize_box(box_input))

    def _question_text(self, record) -> str:
        qs = record["conversations"][0]["value"]
        qs = self.ecfg.extra_prompt + qs
        if DEFAULT_IMAGE_TOKEN not in qs:
            qs = f"{DEFAULT_IMAGE_TOKEN}\n{qs}"
        return qs

    def _build_batch(self, ids, labels, V, images, patch, box_input=None,
                     coord_token_id=None):
        mc = self.cfg
        g = -(-mc.vision.num_patches_per_side // mc.spatial_pool_stride)
        T = mc.tokens_per_frame
        total = len(ids) + V * T
        L = pick_bucket(total + self.ecfg.max_new_tokens, self.ecfg.buckets)
        plan = build_splice_plan([ids], [labels] if labels is not None else None,
                                 [V], tokens_per_frame=T, max_len=L,
                                 grid_side=g, coord_token_id=coord_token_id,
                                 truncate_to=mc.tokenizer_model_max_length)
        batch = lv3d.Batch(
            images=jnp.asarray(images) if images is not None else None,
            patch_coords=jnp.asarray(patch) if patch is not None else None,
            text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
            vision_index=jnp.asarray(plan.vision_index),
            labels=jnp.asarray(plan.labels),
            position_ids=jnp.asarray(plan.position_ids),
            mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
            seq_len=jnp.asarray(plan.seq_len),
            coord_mask=jnp.asarray(plan.coord_mask),
            box_input=(jnp.asarray(box_input[None].astype(np.float32))
                       if box_input is not None else None))
        return batch, plan

    def _build_llava3d_batch(self, ids, V, images, patch):
        """'llava3d' variant: one flat block of voxel-dedup tokens replaces
        the grid layout. Only the V real frames feed the dedup (padded zero
        frames would alias into voxel 0)."""
        import jax

        feat, _ = lv3d.encode_video_llava3d(
            self.params, self.cfg, jnp.asarray(images[:, :V]),
            jnp.asarray(patch[0, :V]), key=jax.random.PRNGKey(0))
        T = int(feat.shape[0])
        L = pick_bucket(len(ids) + T + self.ecfg.max_new_tokens,
                        self.ecfg.buckets)
        plan = build_splice_plan([ids], None, [1], tokens_per_frame=T,
                                 max_len=L, grid_side=1,
                                 truncate_to=self.cfg.tokenizer_model_max_length)
        batch = lv3d.Batch(
            images=None, patch_coords=None,
            text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
            vision_index=jnp.asarray(plan.vision_index),
            labels=jnp.asarray(plan.labels),
            position_ids=jnp.asarray(plan.position_ids),
            mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
            seq_len=jnp.asarray(plan.seq_len),
            coord_mask=jnp.asarray(plan.coord_mask))
        return batch, feat

    # ------------- generative -------------

    def _tokenize_prompt(self, record):
        """Prompt token ids exactly as generation will see them — the single
        source of truth for both _prepare_generation and cache-footprint
        estimation (serve/router.py), so pool routing can never use a
        different template than the engine itself. Swap the preprocessor
        here if an engine is ever built for a non-Qwen template family.

        Records with more than one human turn are MULTI-TURN chat (the
        reference's interactive serve/cli.py keeps a conversation object
        and re-prompts with the full history): every turn goes through the
        ChatML construction, the <image> splice stays anchored in turn 0,
        and the trailing ``{"from": "gpt", "value": None}`` emits the
        generation header. The scene-prefix KV cache still applies — the
        prefix (system + turn-0 header + vision block) is history-
        independent; only the suffix grows with history."""
        convs = record["conversations"]
        if len(convs) > 2:
            source = [dict(c) for c in convs]
            source[0]["value"] = self.ecfg.extra_prompt + source[0]["value"]
            # inject the splice token only when NO turn carries one (a
            # reference-style history may anchor <image> in a later turn;
            # a second sentinel would fail the splice plan's single-image
            # contract, models/splice.py)
            if all(DEFAULT_IMAGE_TOKEN not in (c.get("value") or "")
                   for c in source):
                source[0]["value"] = (f"{DEFAULT_IMAGE_TOKEN}\n"
                                      f"{source[0]['value']}")
            return preprocess_qwen_eval(source, self.tokenizer)
        question = {"from": "human", "value": self._question_text(record)}
        return preprocess_qwen_eval(
            [question, {"from": "gpt", "value": None}], self.tokenizer)

    def _prepare_generation(self, record, box_input=None,
                            coord_token_id=None):
        """record -> (batch, vision_features): the shared question/video
        assembly in front of every generate path (incl. the batcher).

        With ``ecfg.scene_cache_scenes > 0`` the spliceable vision features
        (tower -> projector -> pool -> world PE -> newline) are cached per
        scene: they depend only on the scene's frame selection, never the
        question, yet the reference recomputes them for every question
        (model_scanqa.py one full encode per sample). A cache hit skips
        video IO + geometry + the whole tower; answers are identical
        (tests/test_scene_cache.py)."""
        return self._prepare_generation_ids(
            self._tokenize_prompt(record), record, box_input,
            coord_token_id)

    def _prepare_generation_ids(self, ids, record, box_input=None,
                                coord_token_id=None):
        cache_on = (self.ecfg.scene_cache_scenes > 0
                    and not self.cfg.world_3d.llava3d)
        if cache_on:
            with self._cache_lock:
                hit = self._scene_cache.get(record["video"])
                if hit is not None:
                    self._scene_cache.move_to_end(record["video"])
                    self.scene_cache_stats[0] += 1
            if hit is not None:
                spliceable, V = hit
                batch, _ = self._build_batch(
                    ids, None, V, None, None,
                    self._discretize_box(box_input), coord_token_id)
                return batch, spliceable

        vd, V, images, _, patch, box_input = self._video_arrays(
            record["video"], box_input)
        if self.cfg.world_3d.llava3d:
            batch, feat = self._build_llava3d_batch(ids, V, images, patch)
            return batch, feat[None]
        if cache_on:
            self.scene_cache_stats[1] += 1
            vt = lv3d.encode_video(self.params, self.cfg,
                                   jnp.asarray(images), jnp.asarray(patch))
            spliceable = vt.spliceable
            with self._cache_lock:
                self._scene_cache[record["video"]] = (spliceable, V)
                while len(self._scene_cache) > self.ecfg.scene_cache_scenes:
                    self._scene_cache.popitem(last=False)
            batch, _ = self._build_batch(ids, None, V, None, None,
                                         box_input, coord_token_id)
            return batch, spliceable
        batch, _ = self._build_batch(ids, None, V, images, patch, box_input,
                                     coord_token_id)
        return batch, None

    # ------------- scene-prefix KV cache -------------

    def _prefix_cache_base(self, record) -> bool:
        """Common scene-prefix preconditions: non-llava3d (its vision
        block is question-seeded), no beam (beam prefill reshapes the
        cache). Mesh engines are supported: suffix batches lay out through
        _shard_inputs and the prefix KV keeps the sharding the miss-path
        prefill gave it."""
        return (self.ecfg.prefix_cache_scenes > 0
                and not self.cfg.world_3d.llava3d
                and self.ecfg.num_beams == 1
                and isinstance(record.get("video"), str))

    def _prefix_cache_on(self, record) -> bool:
        """Scene-prefix KV for the PLAIN decode path (no speculation —
        the speculative path has its own prefix machinery,
        :meth:`start_spec_request`)."""
        return (self._prefix_cache_base(record)
                and self.draft_params is None
                and self.ecfg.speculative_draft_layers == 0)

    def _prefix_cache_spec_on(self, record) -> bool:
        """Scene-prefix KV for SELF-draft speculation: the draft shares the
        target's first k layers, so both caches seed from the same stored
        prefix (models/speculative.py spec_prefill_prefix). Standalone
        draft weights (set_draft_model) cannot reuse the target's prefix."""
        return (self._prefix_cache_base(record)
                and self.draft_params is None
                and self.ecfg.speculative_draft_layers > 0
                and not self._spec_disabled)

    @staticmethod
    def _batch_from_plan(plan, box_input=None) -> "lv3d.Batch":
        """SplicePlan (full or suffix slice) -> image-free lv3d.Batch.
        ``box_input``: already-discretized (B, 3) float32 array or None."""
        return lv3d.Batch(
            images=None, patch_coords=None,
            text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
            vision_index=jnp.asarray(plan.vision_index),
            labels=jnp.asarray(plan.labels),
            position_ids=jnp.asarray(plan.position_ids),
            mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
            seq_len=jnp.asarray(plan.seq_len),
            coord_mask=jnp.asarray(plan.coord_mask),
            box_input=(jnp.asarray(box_input)
                       if box_input is not None else None))

    def _suffix_slice(self, plan, prefix_len: int):
        """Suffix slice of a full plan at the engine's suffix buckets, or
        None when it doesn't fit / truncation cut into the prefix."""
        from video3d_tpu.models.splice import slice_suffix_plan

        suffix_true = int(np.max(plan.seq_len)) - prefix_len
        if np.any(plan.seq_len <= prefix_len):
            return None
        Ls = next((b for b in self.ecfg.suffix_buckets if suffix_true <= b),
                  None)
        if Ls is None:
            return None
        return slice_suffix_plan(plan, prefix_len, Ls)

    def _build_suffix_batch(self, ids, entry: _PrefixEntry, box_input,
                            coord_token_id):
        """Full splice plan -> suffix-only Batch for start_decode_prefix,
        or None when the suffix doesn't fit the engine's suffix buckets /
        truncation cut into the prefix (caller falls back to full prefill)."""
        mc = self.cfg
        g = -(-mc.vision.num_patches_per_side // mc.spatial_pool_stride)
        T = mc.tokens_per_frame
        V = entry.num_frames
        total = len(ids) + V * T
        L = pick_bucket(total + self.ecfg.max_new_tokens, self.ecfg.buckets)
        plan = build_splice_plan(
            [ids], None, [V], tokens_per_frame=T, max_len=L, grid_side=g,
            coord_token_id=coord_token_id,
            truncate_to=mc.tokenizer_model_max_length)
        suf = self._suffix_slice(plan, entry.prefix_len)
        if suf is None:
            return None
        box = self._discretize_box(box_input)
        batch = self._batch_from_plan(
            suf, box[None].astype(np.float32) if box is not None else None)
        return batch, L

    def _store_prefix(self, key: str, ids, img: int, batch, cache) -> None:
        """Slice the scene prefix out of a freshly-prefilled KV cache and
        LRU-insert it. Must run BEFORE the cache is donated to a decode
        call (generate_from_state/decode_chunk donate their state)."""
        from video3d_tpu.models import qwen2
        from video3d_tpu.models.splice import KIND_VISION, vision_end_from_kind

        kind0 = np.asarray(batch.kind[0])
        P = vision_end_from_kind(kind0)
        if P == 0:
            return
        T = self.cfg.tokens_per_frame
        V = int((kind0 == KIND_VISION).sum()) // T
        if P >= cache.k.shape[2]:
            return
        pre = qwen2.KVCache(
            cache.k[:, :, :P], cache.v[:, :, :P],
            None if cache.k_scale is None else cache.k_scale[:, :, :P],
            None if cache.v_scale is None else cache.v_scale[:, :, :P])
        entry = _PrefixEntry(cache=pre, prefix_len=P, num_frames=V,
                             ids_prefix=tuple(ids[:img + 1]))
        evictions = []
        with self._cache_lock:
            self._prefix_cache[key] = entry
            while len(self._prefix_cache) > self.ecfg.prefix_cache_scenes:
                evicted, _ = self._prefix_cache.popitem(last=False)
                # companion grounding features are useless (and hold HBM)
                # without their prefix entry — evict together
                self._ground_obj_cache.pop(evicted, None)
                evictions.append(evicted)
        for evicted in evictions:
            for hook in self._prefix_evict_hooks:
                hook(evicted)

    def prepare_request(self, record, box_input=None, coord_token_id=None):
        """Host-side request prep for the prefix-aware path: tokenize, look
        up the scene-prefix KV, and either build the suffix batch (hit) or
        run the full preparation (miss). Thread-safe (the batcher's prep
        pool calls it); device prefill happens in :meth:`start_request`."""
        from video3d_tpu.constants import IMAGE_TOKEN_INDEX

        ids = self._tokenize_prompt(record)
        img = ids.index(IMAGE_TOKEN_INDEX) if IMAGE_TOKEN_INDEX in ids else -1
        key = record.get("video")
        if img >= 0:
            with self._cache_lock:
                entry = self._prefix_cache.get(key)
                if entry is not None:
                    self._prefix_cache.move_to_end(key)
            if entry is not None and tuple(ids[:img + 1]) == entry.ids_prefix:
                built = self._build_suffix_batch(ids, entry, box_input,
                                                 coord_token_id)
                if built is not None:
                    suffix_batch, L = built
                    return {"mode": "prefix", "batch": suffix_batch,
                            "entry": entry, "key": key, "bucket": L,
                            "total": int(suffix_batch.seq_len[0])}
        batch, vision_features = self._prepare_generation_ids(
            ids, record, box_input, coord_token_id)
        return {"mode": "full", "batch": batch, "vf": vision_features,
                "ids": ids, "img": img, "key": key,
                "box_input": box_input, "coord_token_id": coord_token_id,
                "bucket": int(batch.text_ids.shape[1]),
                "total": int(batch.seq_len[0])}

    def _refresh_prep(self, prep):
        """Upgrade a full-mode prep to prefix mode when a matching scene
        prefix appeared AFTER prepare_request ran — a burst of requests on
        one scene all prepares as misses before the first admission
        harvests the prefix; re-checking at prefill time lets every
        admission after the first reuse it."""
        if prep["mode"] != "full" or prep["img"] < 0 \
                or not isinstance(prep["key"], str):
            return prep
        with self._cache_lock:
            entry = self._prefix_cache.get(prep["key"])
        if entry is None or \
                tuple(prep["ids"][:prep["img"] + 1]) != entry.ids_prefix:
            return prep
        built = self._build_suffix_batch(prep["ids"], entry,
                                         prep.get("box_input"),
                                         prep.get("coord_token_id"))
        if built is None:
            return prep
        suffix_batch, L = built
        return {"mode": "prefix", "batch": suffix_batch, "entry": entry,
                "key": prep["key"], "bucket": L,
                "total": int(suffix_batch.seq_len[0])}

    def start_request(self, prep, max_cache_len: Optional[int] = None):
        """Prefill a :meth:`prepare_request` result into a DecodeState.

        ``max_cache_len`` overrides the cache size (the continuous batcher
        passes its row length); default is bucket + max_new_tokens. On a
        full-prefill miss the scene prefix is harvested for later
        questions."""
        from video3d_tpu.models.generate import (start_decode,
                                                 start_decode_prefix)

        ecfg = self.ecfg
        prep = self._refresh_prep(prep)
        mcl = (max_cache_len if max_cache_len is not None
               else prep["bucket"] + ecfg.max_new_tokens)
        if prep["mode"] == "prefix":
            entry = prep["entry"]
            self.prefix_cache_stats[0] += 1
            batch, _ = self._shard_inputs(prep["batch"], None)
            with self._mesh_ctx():
                return start_decode_prefix(
                    self.params, self.cfg, batch, entry.cache,
                    prefix_len=entry.prefix_len, max_cache_len=mcl,
                    cache_dtype=self._cache_dtype())
        batch, vf = self._shard_inputs(prep["batch"], prep["vf"])
        with self._mesh_ctx():
            state = start_decode(
                self.params, self.cfg, batch, max_cache_len=mcl,
                cache_dtype=self._cache_dtype(), vision_features=vf)
        if (self.ecfg.prefix_cache_scenes > 0 and prep["img"] >= 0
                and isinstance(prep["key"], str)):
            self.prefix_cache_stats[1] += 1
            self._store_prefix(prep["key"], prep["ids"], prep["img"],
                               prep["batch"], state.cache)
        return state

    def start_request_chunked(self, prep, max_cache_len: Optional[int] = None,
                              chunk_len: int = 256):
        """ChunkedPrefill stepper for a FULL-mode prep (the continuous
        batcher's bounded-stall cold admission): the scheduler runs one
        chunk per iteration between shared decode chunks instead of
        stalling for the whole prompt prefill. Prefix-mode preps (already
        ~1 decode step) return a finished DecodeState via
        :meth:`start_request`."""
        from video3d_tpu.models.generate import ChunkedPrefill

        prep = self._refresh_prep(prep)
        if prep["mode"] != "full":
            return self.start_request(prep, max_cache_len=max_cache_len)
        mcl = (max_cache_len if max_cache_len is not None
               else prep["bucket"] + self.ecfg.max_new_tokens)
        batch, vf = self._shard_inputs(prep["batch"], prep["vf"])
        return ChunkedPrefill(self.params, self.cfg, batch,
                              max_cache_len=mcl, chunk_len=chunk_len,
                              cache_dtype=self._cache_dtype(),
                              vision_features=vf)

    def finish_chunked(self, prep, state):
        """Post-chunked-prefill bookkeeping, mirroring the atomic full
        path (:meth:`start_request`): harvest the scene prefix for later
        same-scene questions. Must run BEFORE the state is grafted
        (inserts donate the cache)."""
        if (self.ecfg.prefix_cache_scenes > 0 and prep.get("img", -1) >= 0
                and isinstance(prep.get("key"), str)):
            self.prefix_cache_stats[1] += 1
            self._store_prefix(prep["key"], prep["ids"], prep["img"],
                               prep["batch"], state.cache)
        return state

    def _start_state(self, record, box_input=None, coord_token_id=None):
        """DecodeState for one request, reusing the scene-prefix KV when
        possible (hit: suffix-only prefill, no video IO / geometry / tower;
        miss: full prefill, then harvest the prefix for later questions)."""
        return self.start_request(
            self.prepare_request(record, box_input, coord_token_id))

    def _self_draft(self):
        """Cached self-draft (params share target storage, but the
        draft_vocab head slice is an eager device copy — rebuild only when
        the knobs change, like ContinuousBatcher.__init__)."""
        from video3d_tpu.models import speculative as spec

        k = self.ecfg.speculative_draft_layers
        key = (k, self.ecfg.speculative_draft_vocab)
        if getattr(self, "_self_draft_key", None) != key:
            self._self_draft_cached = (
                spec.self_draft_params(
                    self.params, k,
                    draft_vocab=self.ecfg.speculative_draft_vocab),
                spec.self_draft_config(self.cfg.llm, k))
            self._self_draft_key = key
        return self._self_draft_cached

    def _check_spec_acceptance(self):
        """speculative_min_acceptance guard shared by _generate_impl and
        the prefix-path speculative loop: demote to vanilla decoding on
        sustained low measured acceptance (a bad draft makes speculation
        slower, never wrong)."""
        min_acc = self.ecfg.speculative_min_acceptance
        if min_acc > 0 and not self._spec_disabled \
                and self.spec_stats[1] >= 5 * self.ecfg.speculative_k:
            rate = self.spec_stats[0] / max(self.spec_stats[1], 1)
            if rate < min_acc:
                print(f"[engine] speculative acceptance {rate:.2f} < "
                      f"{min_acc}; falling back to vanilla decoding")
                self._spec_disabled = True

    def start_spec_request(self, prep, draft_params, draft_cfg,
                           max_cache_len: Optional[int] = None,
                           draft_max_cache_len: Optional[int] = None):
        """Speculative analogue of :meth:`start_request`: prefill both
        models from a :meth:`prepare_request` result into a one-slot
        SpecSlots (+ first token) — suffix-only against the cached prefix
        on a hit (self-drafts only), full spec_start with prefix harvest
        on a miss."""
        from video3d_tpu.models import speculative as spec

        ecfg = self.ecfg
        prep = self._refresh_prep(prep)
        mcl = (max_cache_len if max_cache_len is not None
               else prep["bucket"] + ecfg.max_new_tokens
               + ecfg.speculative_k + 2)
        if prep["mode"] == "prefix":
            entry = prep["entry"]
            self.prefix_cache_stats[0] += 1
            batch, _ = self._shard_inputs(prep["batch"], None)
            with self._mesh_ctx():
                return spec.spec_start_prefix(
                    self.params, draft_params, self.cfg, draft_cfg,
                    batch, entry.cache, prefix_len=entry.prefix_len,
                    max_cache_len=mcl, cache_dtype=self._cache_dtype(),
                    temperature=ecfg.temperature, top_p=ecfg.top_p,
                    top_k=ecfg.top_k,
                    draft_max_cache_len=draft_max_cache_len)
        batch, vf = self._shard_inputs(prep["batch"], prep["vf"])
        with self._mesh_ctx():
            sub, first = spec.spec_start(
                self.params, draft_params, self.cfg, draft_cfg, batch,
                max_cache_len=mcl, cache_dtype=self._cache_dtype(),
                temperature=ecfg.temperature, top_p=ecfg.top_p,
                top_k=ecfg.top_k, vision_features=vf,
                draft_max_cache_len=draft_max_cache_len)
        if (self.ecfg.prefix_cache_scenes > 0 and prep["img"] >= 0
                and isinstance(prep["key"], str)):
            self.prefix_cache_stats[1] += 1
            self._store_prefix(prep["key"], prep["ids"], prep["img"],
                               prep["batch"], sub.t_cache)
        return sub, first

    def _answer_from_prep(self, prep) -> str:
        """Plain (non-speculative) decode of a prepare_request result —
        the timed device half when the host half ran on a prep thread."""
        from video3d_tpu.models.generate import generate_from_state

        state = self.start_request(prep)
        with self._mesh_ctx():
            res = generate_from_state(
                self.params, self.cfg, state,
                max_new_tokens=self.ecfg.max_new_tokens,
                eos_token_id=self.ecfg.eos_token_id,
                temperature=self.ecfg.temperature, top_p=self.ecfg.top_p,
                top_k=self.ecfg.top_k)
        toks = np.asarray(res.tokens)[0][: int(res.lengths[0])]
        return self._decode_text(toks)

    def _generate_answer_spec_prefix(self, record, box_input=None,
                                     coord_token_id=None, prep=None) -> str:
        """One-shot speculative generation through the scene-prefix cache:
        spec_start(_prefix) + chunked spec rounds (the same kernels the
        batcher uses). Greedy output is bit-identical to vanilla greedy,
        exactly like the full-prefill speculative path."""
        from video3d_tpu.models import speculative as spec

        ecfg = self.ecfg
        draft_params, draft_cfg = self._self_draft()
        if prep is None:
            prep = self.prepare_request(record, box_input, coord_token_id)
        sub, first = self.start_spec_request(prep, draft_params, draft_cfg)
        tok0 = int(first[0])
        if tok0 == ecfg.eos_token_id or ecfg.max_new_tokens == 0:
            return self._decode_text([])
        emitted = [tok0]
        K = ecfg.speculative_k
        done = False
        while not done and len(emitted) < ecfg.max_new_tokens:
            with self._mesh_ctx():
                sub, emit, keep = spec.spec_decode_chunk(
                    self.params, draft_params, self.cfg, draft_cfg, sub,
                    iters=4, num_draft_tokens=K,
                    eos_token_id=ecfg.eos_token_id,
                    temperature=ecfg.temperature, top_p=ecfg.top_p,
                    top_k=ecfg.top_k)
            emit0 = np.asarray(emit)[0]
            keep0 = np.asarray(keep)[0]
            for j in range(emit0.shape[0]):
                kept = emit0[j][keep0[j]]
                if not len(kept):        # row finished in an earlier round
                    break
                self.spec_stats[0] += max(int(keep0[j].sum()) - 1, 0)
                self.spec_stats[1] += K
                for t in kept:
                    if int(t) == ecfg.eos_token_id:
                        done = True
                        break
                    emitted.append(int(t))
                    if len(emitted) >= ecfg.max_new_tokens:
                        done = True
                        break
                if done:
                    break
            if bool(np.asarray(sub.done)[0]):
                done = True
        self._check_spec_acceptance()
        return self._decode_text(emitted)

    def _decode_text(self, toks) -> str:
        text = self.tokenizer.decode(toks, skip_special_tokens=True).strip()
        if self.ecfg.stop_str and text.endswith(self.ecfg.stop_str):
            text = text[: -len(self.ecfg.stop_str)].strip()
        return text

    def generate_answer(self, record, box_input=None,
                        coord_token_id=None) -> str:
        if self._prefix_cache_spec_on(record):
            return self._generate_answer_spec_prefix(record, box_input,
                                                     coord_token_id)
        if self._prefix_cache_on(record):
            return self._answer_from_prep(
                self.prepare_request(record, box_input, coord_token_id))
        batch, vision_features = self._prepare_generation(
            record, box_input, coord_token_id)
        res = self._generate(batch, vision_features=vision_features)
        toks = np.asarray(res.tokens)[0][: int(res.lengths[0])]
        return self._decode_text(toks)

    def generate_answer_stream(self, record, box_input=None,
                               coord_token_id=None, chunk: int = 16,
                               max_new_tokens: Optional[int] = None,
                               temperature: Optional[float] = None,
                               top_p: Optional[float] = None,
                               top_k: Optional[int] = None):
        """Streaming variant of generate_answer: yields the cumulative
        generated text after every ``chunk`` decoded tokens (the engine-side
        equivalent of the reference's TextIteratorStreamer loop,
        serve/model_worker.py:108-166). Decode state carries across jitted
        chunk calls — the prefill runs once. ``max_new_tokens`` caps the
        emission per request (<= the engine budget) with no recompile —
        the chunk loop is host-driven, unlike generate_answer's static
        while_loop bound. ``temperature``/``top_p``/``top_k`` override the
        engine defaults per request (the reference worker honors them per
        request, llava/serve/model_worker.py:140-167); sampling knobs are
        jit-static, so each DISTINCT value combination compiles the chunk
        once and is cached after."""
        from video3d_tpu.models.generate import decode_chunk, start_decode

        temp = (self.ecfg.temperature if temperature is None
                else float(temperature))
        tp = self.ecfg.top_p if top_p is None else float(top_p)
        tk = self.ecfg.top_k if top_k is None else int(top_k)

        if self._prefix_cache_on(record):
            state = self._start_state(record, box_input, coord_token_id)
        else:
            batch, vision_features = self._prepare_generation(
                record, box_input, coord_token_id)
            batch, vision_features = self._shard_inputs(batch,
                                                        vision_features)
            L = batch.text_ids.shape[1]
            with self._mesh_ctx():
                state = start_decode(
                    self.params, self.cfg, batch,
                    max_cache_len=L + self.ecfg.max_new_tokens,
                    cache_dtype=self._cache_dtype(),
                    vision_features=vision_features)
        with self._mesh_ctx():
            emitted: list = []
            remaining = self.ecfg.max_new_tokens
            if max_new_tokens is not None:
                remaining = max(0, min(remaining, int(max_new_tokens)))
            while remaining > 0:
                state, toks = decode_chunk(
                    self.params, self.cfg, state, chunk=chunk,
                    eos_token_id=self.ecfg.eos_token_id,
                    temperature=temp, top_p=tp, top_k=tk)
                row = np.asarray(toks)[0].tolist()
                for t in row:
                    if t == self.ecfg.eos_token_id or remaining <= 0:
                        remaining = 0
                        break
                    emitted.append(t)
                    remaining -= 1
                yield self._decode_text(emitted)
                if bool(np.asarray(state.done).all()):
                    break

    def generate_answer_video_file(self, prompt: str, video_path: str,
                                   video_fps: int = 1,
                                   add_time_instruction: bool = False) -> str:
        """Legacy LLaVA-Video modality: a REAL video file (mp4/avi/...),
        frames sampled with the decord contract (llava/utils.py:25-46 via
        data/video_file.py), encoded WITHOUT 3D world PE — the reference's
        plain-video path carries no video_dict, so PE injection is skipped
        (llava_arch.py:381-429). ``add_time_instruction`` prepends the
        duration/timestamps prompt exactly as train_3d.py:1258-1260."""
        from dataclasses import replace as dc_replace

        from video3d_tpu.config import PosEmbedType
        from video3d_tpu.data.video_file import (load_video_file,
                                                 time_instruction)

        frames, vtime, ftime, n = load_video_file(
            video_path, video_fps, self.ecfg.max_frames, force_sample=True)
        text = prompt if DEFAULT_IMAGE_TOKEN in prompt \
            else f"{DEFAULT_IMAGE_TOKEN}\n{prompt}"
        if add_time_instruction:
            ti = time_instruction(vtime, n, ftime)
            text = (f"{DEFAULT_IMAGE_TOKEN}\n{ti}\n"
                    f"{text.replace(DEFAULT_IMAGE_TOKEN, '')}")
        ids = preprocess_qwen_eval(
            [{"from": "human", "value": text},
             {"from": "gpt", "value": None}], self.tokenizer)

        mc = self.cfg
        S = mc.vision.image_size
        g = -(-mc.vision.num_patches_per_side // mc.spatial_pool_stride)
        Vmax = self.ecfg.max_frames
        V = min(n, Vmax)
        images = np.zeros((1, Vmax, 3, S, S), np.float32)
        images[0, :V] = self.ip.preprocess(list(frames[:V]))
        patch = np.zeros((1, Vmax, g, g, 3), np.float32)
        plain_cfg = dc_replace(
            mc, world_3d=dc_replace(mc.world_3d,
                                    pos_embed=PosEmbedType.NONE))
        batch, _ = self._build_batch(ids, None, V, images, patch)
        res = self._generate(batch, cfg=plain_cfg)
        toks = np.asarray(res.tokens)[0][: int(res.lengths[0])]
        return self._decode_text(toks)

    def generate_answer_image(self, prompt: str, image,
                              image_aspect_ratio: Optional[str] = None,
                              grid_pinpoints=None,
                              patch_merge_type: Optional[str] = None,
                              crop_resolution: int = 768,
                              split_resolution: int = 384) -> str:
        """2D-image (non-video) inference through the tiling paths.

        Equivalent of the reference's legacy image branch
        (llava_arch.py:518-634 + mm_utils aspect dispatch :303-338): tile the
        image (anyres / anyres_max_N / highres / crop_split), encode per
        tile, arrange (flat / spatial / spatial_unpad / nobase), splice,
        decode.

        Args:
          prompt: user text; an '<image>' placeholder marks the insertion
            point (prepended if absent).
          image: PIL image (or anything PIL can be built from via fromarray).
          crop_resolution, split_resolution: crop_split knobs
            (train_3d.py:135-136; the reference leaves them None — pass
            explicitly when using crop_split).
        """
        from video3d_tpu.data.anyres import (process_anyres_image,
                                             process_highres_image,
                                             process_highres_image_crop_split)
        from video3d_tpu.models.anyres import encode_image_2d

        aspect = image_aspect_ratio or self.cfg.image_aspect_ratio
        pin = grid_pinpoints if grid_pinpoints is not None else \
            self.cfg.image_grid_pinpoints
        merge = patch_merge_type or self.cfg.mm_patch_merge_type

        if not isinstance(image, Image.Image):
            image = Image.fromarray(np.asarray(image).astype(np.uint8))
        if "<image>" not in prompt:
            prompt = "<image>\n" + prompt
        ids = preprocess_qwen_eval(
            [{"from": "human", "value": prompt},
             {"from": "gpt", "value": None}], self.tokenizer)

        if aspect == "pad":
            # pad = ONE expand2square tile, full unpooled feature grid
            # (mm_utils.py:329-333 + llava_arch.py image branch, no tiling)
            from video3d_tpu.data.anyres import expand2square
            from video3d_tpu.models import siglip
            from video3d_tpu.models.llava_video3d import project_features

            bg = tuple(int(x * 255) for x in self.ip.image_mean)
            px = self.ip.preprocess([expand2square(image.convert("RGB"),
                                                   bg)])
            f = siglip.vision_tower_forward(
                self.params["vision"], jnp.asarray(px), self.cfg.vision,
                pad_seq_to=self.cfg.vision.tower_pad_seq)
            feat = project_features(self.params["projector"], f)[0]  # (P, D)
        else:
            if aspect == "highres":
                tiles = process_highres_image(image, self.ip, pin)
            elif aspect == "crop_split":
                tiles = process_highres_image_crop_split(
                    image, self.ip, crop_resolution, split_resolution)
            else:
                tiles = process_anyres_image(image, self.ip, pin)
            feat = encode_image_2d(self.params, self.cfg, jnp.asarray(tiles),
                                   image.size, pin, image_aspect_ratio=aspect,
                                   patch_merge_type=merge)      # (T, D)
        T = int(feat.shape[0])
        L = pick_bucket(len(ids) + T + self.ecfg.max_new_tokens,
                        self.ecfg.buckets)
        plan = build_splice_plan([ids], None, [1], tokens_per_frame=T,
                                 max_len=L, grid_side=1,
                                 truncate_to=self.cfg.tokenizer_model_max_length)
        batch = lv3d.Batch(
            images=None, patch_coords=None,
            text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
            vision_index=jnp.asarray(plan.vision_index),
            labels=jnp.asarray(plan.labels),
            position_ids=jnp.asarray(plan.position_ids),
            mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
            seq_len=jnp.asarray(plan.seq_len),
            coord_mask=jnp.asarray(plan.coord_mask))
        res = self._generate(batch, vision_features=feat[None])
        toks = np.asarray(res.tokens)[0][: int(res.lengths[0])]
        return self._decode_text(toks)

    def generate_answer_images(self, prompt: Optional[str], images,
                               conversations: Optional[Sequence[dict]] = None,
                               max_new_tokens: Optional[int] = None,
                               temperature: Optional[float] = None,
                               top_p: Optional[float] = None,
                               top_k: Optional[int] = None) -> str:
        """Multi-image 2D chat: N images, each spliced at its own
        ``<image>`` sentinel (reference gradio_multi_image.py:1-448 wire
        contract + llava_arch.py:441-470's image-list branch: every image
        is encoded independently by the tower and keeps its FULL unpooled
        feature grid — only video modalities go through get_2dPool — with
        image_aspect_ratio='pad' preprocessing (expand2square onto the
        mean color, mm_utils.py:329-333) and no 3D world PE).

        Missing sentinels are prepended as ``'<image>\\n' * k`` exactly as
        the reference's multi-image gradio server injects them (anchored in
        turn 0 when ``conversations`` is given).

        Args:
          prompt: single-turn user text with up to N '<image>' placeholders
            (ignored when ``conversations`` is given).
          images: sequence of PIL images (or arrays PIL accepts).
          conversations: optional full multi-turn history as
            [{'from': 'human'|'gpt', 'value': str}, ...]; the model sees
            every turn, matching the reference gradio server's re-templated
            conversation each round.
          max_new_tokens: optional per-call cap (<= the engine budget),
            honored with no recompile via the host-chunked decode loop.
          temperature/top_p/top_k: per-call sampling overrides (each novel
            combination compiles the decode chunk once, then cached).
        """
        from video3d_tpu.data.anyres import expand2square
        from video3d_tpu.models import siglip
        from video3d_tpu.models.llava_video3d import project_features

        N = len(images)
        assert N >= 1, "generate_answer_images needs at least one image"
        if conversations is not None:
            convs = [dict(c) for c in conversations]
            have = sum((c.get("value") or "").count(DEFAULT_IMAGE_TOKEN)
                       for c in convs)
            assert have <= N, (f"{have} <image> placeholders but only "
                               f"{N} images")
            if have < N:
                convs[0]["value"] = ((DEFAULT_IMAGE_TOKEN + "\n")
                                     * (N - have)) + (convs[0].get("value")
                                                      or "")
            if convs[-1].get("value"):       # append the generation header
                convs.append({"from": "gpt", "value": None})
            ids = preprocess_qwen_eval(convs, self.tokenizer)
        else:
            have = prompt.count(DEFAULT_IMAGE_TOKEN)
            assert have <= N, (f"{have} <image> placeholders but only "
                               f"{N} images")
            if have < N:
                prompt = (DEFAULT_IMAGE_TOKEN + "\n") * (N - have) + prompt
            ids = preprocess_qwen_eval(
                [{"from": "human", "value": prompt},
                 {"from": "gpt", "value": None}], self.tokenizer)

        mc = self.cfg
        side = mc.vision.num_patches_per_side
        bg = tuple(int(x * 255) for x in self.ip.image_mean)
        pil = [im if isinstance(im, Image.Image)
               else Image.fromarray(np.asarray(im).astype(np.uint8))
               for im in images]
        px = self.ip.preprocess(
            [expand2square(im.convert("RGB"), bg) for im in pil])
        feats = siglip.vision_tower_forward(
            self.params["vision"], jnp.asarray(px), mc.vision,
            pad_seq_to=mc.vision.tower_pad_seq)          # (N, P, Dv)
        feats = project_features(self.params["projector"], feats)
        T = side * side
        feat = feats.reshape(N * T, -1)                  # frame-major flat

        L = pick_bucket(len(ids) + N * T + self.ecfg.max_new_tokens,
                        self.ecfg.buckets)
        plan = build_splice_plan([ids], None, [N], tokens_per_frame=T,
                                 max_len=L, grid_side=1,
                                 truncate_to=mc.tokenizer_model_max_length)
        batch = lv3d.Batch(
            images=None, patch_coords=None,
            text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
            vision_index=jnp.asarray(plan.vision_index),
            labels=jnp.asarray(plan.labels),
            position_ids=jnp.asarray(plan.position_ids),
            mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
            seq_len=jnp.asarray(plan.seq_len),
            coord_mask=jnp.asarray(plan.coord_mask))

        if (max_new_tokens is None and temperature is None
                and top_p is None and top_k is None):
            res = self._generate(batch, vision_features=feat[None])
            toks = np.asarray(res.tokens)[0][: int(res.lengths[0])]
            return self._decode_text(toks)

        # per-call cap / sampling without recompiling the static greedy
        # while_loop: host-chunked decode (same contract as
        # generate_answer_stream)
        from video3d_tpu.models.generate import decode_chunk, start_decode

        temp = (self.ecfg.temperature if temperature is None
                else float(temperature))
        tp = self.ecfg.top_p if top_p is None else float(top_p)
        tk = self.ecfg.top_k if top_k is None else int(top_k)
        batch, vf = self._shard_inputs(batch, feat[None])
        with self._mesh_ctx():
            state = start_decode(
                self.params, self.cfg, batch,
                max_cache_len=L + self.ecfg.max_new_tokens,
                cache_dtype=self._cache_dtype(), vision_features=vf)
            emitted: list = []
            remaining = self.ecfg.max_new_tokens
            if max_new_tokens is not None:
                remaining = max(0, min(remaining, int(max_new_tokens)))
            while remaining > 0:
                state, toks = decode_chunk(
                    self.params, self.cfg, state, chunk=16,
                    eos_token_id=self.ecfg.eos_token_id,
                    temperature=temp, top_p=tp, top_k=tk)
                for t in np.asarray(toks)[0].tolist():
                    if t == self.ecfg.eos_token_id or remaining <= 0:
                        remaining = 0
                        break
                    emitted.append(t)
                    remaining -= 1
                if bool(np.asarray(state.done).all()):
                    break
        return self._decode_text(emitted)

    def generate_answers_batch(self, records: Sequence[dict],
                               box_inputs: Optional[Sequence] = None,
                               coord_token_id=None) -> List[str]:
        """Batched greedy generation: one prefill + one decode loop for B
        questions. Decode is HBM-bound (weight reads dominate), so batching
        multiplies throughput at nearly constant latency.
        """
        batch = self.prepare_answers_batch(records, box_inputs,
                                           coord_token_id)
        return self.answers_from_batch(batch, len(records))

    def prepare_answers_batch(self, records: Sequence[dict],
                              box_inputs: Optional[Sequence] = None,
                              coord_token_id=None):
        """Host half of :meth:`generate_answers_batch` (video IO, geometry
        preprocessing, tokenization, splice planning) — split out so the
        eval loop can pipeline it against the previous batch's device work
        (run_generative prefetch; the reference's loop is fully serial,
        model_scanqa.py:129-206)."""
        B = len(records)
        mc = self.cfg
        g = -(-mc.vision.num_patches_per_side // mc.spatial_pool_stride)
        T = mc.tokens_per_frame
        Vmax = self.ecfg.max_frames
        S = mc.vision.image_size

        ids_list, vids, frames, images_list, patch_list, boxes = [], [], [], [], [], []
        has_box = False
        for bi, record in enumerate(records):
            question = {"from": "human", "value": self._question_text(record)}
            ids_list.append(preprocess_qwen_eval(
                [question, {"from": "gpt", "value": None}], self.tokenizer))
            box = None if box_inputs is None else box_inputs[bi]
            _, V, images, _, patch, box = self._video_arrays(record["video"], box)
            frames.append(V)
            images_list.append(images[0])
            patch_list.append(patch[0])
            boxes.append(box if box is not None else np.zeros((3,), np.float32))
            has_box = has_box or box is not None

        total = max(len(i) for i in ids_list) + Vmax * T
        L = pick_bucket(total + self.ecfg.max_new_tokens, self.ecfg.buckets)
        plan = build_splice_plan(ids_list, None, frames, tokens_per_frame=T,
                                 max_len=L, grid_side=g,
                                 coord_token_id=coord_token_id,
                                 truncate_to=mc.tokenizer_model_max_length)
        batch = lv3d.Batch(
            images=jnp.asarray(np.stack(images_list)),
            patch_coords=jnp.asarray(np.stack(patch_list)),
            text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
            vision_index=jnp.asarray(plan.vision_index),
            labels=jnp.asarray(plan.labels),
            position_ids=jnp.asarray(plan.position_ids),
            mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
            seq_len=jnp.asarray(plan.seq_len),
            coord_mask=jnp.asarray(plan.coord_mask),
            box_input=(jnp.asarray(np.stack(boxes).astype(np.float32))
                       if has_box else None))
        return batch

    def answers_from_batch(self, batch, B: int) -> List[str]:
        """Device half of :meth:`generate_answers_batch`."""
        res = self._generate(batch)
        out = []
        for b in range(B):
            toks = np.asarray(res.tokens)[b][: int(res.lengths[b])]
            out.append(self._decode_text(toks))
        return out

    # ------------- scene-grouped batched suffix decode -------------

    def prepare_answers_batch_prefix(self, records: Sequence[dict],
                                     box_inputs: Optional[Sequence] = None,
                                     coord_token_id=None):
        """B-row SUFFIX batch for records that all sit on one scene with a
        cached prefix: the scene's prefix KV broadcasts across every row
        (models/generate.py _write_prefix), so one suffix prefill serves B
        questions at roughly B=1 cost. Returns None when the records span
        scenes, the prefix is absent/mismatched, or a suffix doesn't fit
        (caller falls back to the full batched path)."""
        from video3d_tpu.constants import IMAGE_TOKEN_INDEX

        B = len(records)
        key = records[0].get("video")
        if not isinstance(key, str) or \
                not all(r.get("video") == key for r in records):
            return None
        ids_list = [self._tokenize_prompt(r) for r in records]
        imgs = [ids.index(IMAGE_TOKEN_INDEX) if IMAGE_TOKEN_INDEX in ids
                else -1 for ids in ids_list]
        if min(imgs) < 0:
            return None
        with self._cache_lock:
            entry = self._prefix_cache.get(key)
            if entry is not None:
                self._prefix_cache.move_to_end(key)
        if entry is None or any(
                tuple(ids[:img + 1]) != entry.ids_prefix
                for ids, img in zip(ids_list, imgs)):
            return None

        mc = self.cfg
        g = -(-mc.vision.num_patches_per_side // mc.spatial_pool_stride)
        T = mc.tokens_per_frame
        V, P = entry.num_frames, entry.prefix_len
        total = max(len(ids) for ids in ids_list) + V * T
        L = pick_bucket(total + self.ecfg.max_new_tokens, self.ecfg.buckets)
        plan = build_splice_plan(
            ids_list, None, [V] * B, tokens_per_frame=T, max_len=L,
            grid_side=g, coord_token_id=coord_token_id,
            truncate_to=mc.tokenizer_model_max_length)
        suf = self._suffix_slice(plan, P)
        if suf is None:
            return None
        has_box = box_inputs is not None and any(
            b is not None for b in box_inputs)
        boxes = None
        if has_box:
            boxes = np.stack([
                self._discretize_box(np.asarray(b, np.float32))
                if b is not None else np.zeros((3,), np.float32)
                for b in box_inputs]).astype(np.float32)
        batch = self._batch_from_plan(suf, boxes)
        return {"mode": "prefix_batch", "batch": batch, "entry": entry,
                "bucket": L}

    def answers_from_prefix_batch(self, prep) -> List[str]:
        """Device half of the scene-grouped suffix batch."""
        from video3d_tpu.models.generate import (generate_from_state,
                                                 start_decode_prefix)

        entry = prep["entry"]
        batch, _ = self._shard_inputs(prep["batch"], None)
        B = int(batch.text_ids.shape[0])
        with self._mesh_ctx():
            state = start_decode_prefix(
                self.params, self.cfg, batch, entry.cache,
                prefix_len=entry.prefix_len,
                max_cache_len=prep["bucket"] + self.ecfg.max_new_tokens,
                cache_dtype=self._cache_dtype())
            res = generate_from_state(
                self.params, self.cfg, state,
                max_new_tokens=self.ecfg.max_new_tokens,
                eos_token_id=self.ecfg.eos_token_id,
                temperature=self.ecfg.temperature, top_p=self.ecfg.top_p,
                top_k=self.ecfg.top_k)
        self.prefix_cache_stats[0] += B
        return [self._decode_text(
            np.asarray(res.tokens)[b][: int(res.lengths[b])])
            for b in range(B)]

    def generate_answers_batch_prefix(self, records: Sequence[dict],
                                      box_inputs: Optional[Sequence] = None,
                                      coord_token_id=None) -> List[str]:
        """Batched answers with the scene-prefix fast path: a same-scene
        chunk with a cached prefix decodes as one B-row suffix batch; a
        same-scene chunk WITHOUT one answers its first record alone (full
        prefill, harvesting the prefix) then suffix-batches the rest;
        anything else falls back to the plain batched path."""
        if box_inputs is None:
            box_inputs = [None] * len(records)
        prep = self.prepare_answers_batch_prefix(records, box_inputs,
                                                 coord_token_id)
        if prep is not None:
            return self.answers_from_prefix_batch(prep)
        key = records[0].get("video")
        same_scene = isinstance(key, str) and \
            all(r.get("video") == key for r in records)
        with self._cache_lock:
            have_entry = key in self._prefix_cache
        # harvest-then-suffix only when the scene has NO prefix yet; if an
        # entry exists but was unusable (e.g. the suffix exceeds every
        # suffix bucket), per-record recursion would degrade the chunk to B
        # sequential full prefills — the plain B-row batched prefill is the
        # right fallback there
        if same_scene and len(records) > 1 and not have_entry \
                and self._prefix_cache_on(records[0]):
            first = self.generate_answer(records[0], box_inputs[0],
                                         coord_token_id)
            rest = self.generate_answers_batch_prefix(
                records[1:], box_inputs[1:], coord_token_id)
            return [first] + rest
        batch = self.prepare_answers_batch(records, box_inputs=box_inputs,
                                           coord_token_id=coord_token_id)
        return self.answers_from_batch(batch, len(records))

    # ------------- discriminative (grounding) -------------

    def _ground_tokenize(self, record):
        question = {"from": "human", "value": self._question_text(record)}
        answer = record["conversations"][1]
        tok = preprocess_qwen([[question, answer]], self.tokenizer,
                              has_image=True)
        return tok["input_ids"][0].tolist(), tok["labels"][0].tolist()

    def ground(self, record,
               prepared_video=None) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (scores (N_valid+1,), objects (N_valid, 6))."""
        assert self.ecfg.ground_token_id is not None
        # grounding has no mesh path (matching the non-prefix ground())
        if self.mesh is None and self._prefix_cache_on(record):
            return self._ground_prefix(record, prepared_video)
        ids, labels = self._ground_tokenize(record)
        vd, V, images, coords_full, patch, _ = (
            prepared_video if prepared_video is not None
            else self._video_arrays(record["video"], need_full_coords=True))
        batch, plan = self._build_batch(ids, labels, V, images, patch)

        objects = np.asarray(vd["objects"], np.float32).reshape(-1, 6)
        N = self.ecfg.max_objects
        obj = np.zeros((N, 6), np.float32)
        valid = np.zeros((N,), bool)
        n = min(len(objects), N)
        obj[:n] = objects[:n]
        valid[:n] = True

        hits = np.nonzero(plan.labels[0] == self.ecfg.ground_token_id)[0]
        slot = int(hits[0]) if len(hits) else int(plan.seq_len[0]) - 1

        scores = lv3d.grounding_forward(
            self.params, self.cfg, batch,
            jnp.asarray(coords_full[0]), jnp.asarray(obj), jnp.asarray(valid),
            jnp.asarray(slot))
        scores = np.asarray(scores)
        # compact: real objects then zero-target (reference scores layout)
        return np.concatenate([scores[:n], scores[-1:]]), objects[:n]

    def _ground_prefix(self, record,
                       prepared_video=None) -> Tuple[np.ndarray, np.ndarray]:
        """:meth:`ground` through the scene-prefix KV cache: the prefix KV,
        the object proposals AND their masked-mean features are all
        question-independent, so a hit prefills only the query suffix
        (which contains the <ground> token) and scores the cached object
        features — no video IO, full-res coords, masks, tower, or full
        prefill. ScanRefer/Multi3DRefer ask dozens of queries per scene.
        ``prepared_video``: optional pre-loaded _video_arrays result for
        the miss path (the grounding runner pipelines it off-thread)."""
        from video3d_tpu.constants import IMAGE_TOKEN_INDEX
        from video3d_tpu.models.generate import ground_suffix

        ids, labels = self._ground_tokenize(record)
        img = ids.index(IMAGE_TOKEN_INDEX) if IMAGE_TOKEN_INDEX in ids else -1
        key = record.get("video")
        mc = self.cfg
        g = -(-mc.vision.num_patches_per_side // mc.spatial_pool_stride)
        T = mc.tokens_per_frame
        entry = obj_entry = None
        if img >= 0:
            with self._cache_lock:
                entry = self._prefix_cache.get(key)
                obj_entry = self._ground_obj_cache.get(key)
                if entry is not None:
                    self._prefix_cache.move_to_end(key)
                if obj_entry is not None:
                    self._ground_obj_cache.move_to_end(key)
        if (entry is not None and obj_entry is not None
                and tuple(ids[:img + 1]) == entry.ids_prefix):
            V = entry.num_frames
            P = entry.prefix_len
            total = len(ids) + V * T
            L = pick_bucket(total, self.ecfg.buckets)
            plan = build_splice_plan(
                [ids], [labels], [V], tokens_per_frame=T, max_len=L,
                grid_side=g, truncate_to=mc.tokenizer_model_max_length)
            hits = np.nonzero(plan.labels[0] == self.ecfg.ground_token_id)[0]
            slot = int(hits[0]) if len(hits) else int(plan.seq_len[0]) - 1
            suf = self._suffix_slice(plan, P)
            if suf is not None and slot >= P:
                Ls = int(suf.text_ids.shape[1])
                obj_feats, valid_j, objects, n = obj_entry
                batch = self._batch_from_plan(suf)
                scores = np.asarray(ground_suffix(
                    self.params, self.cfg, batch, entry.cache,
                    prefix_len=P, max_cache_len=P + Ls,
                    cache_dtype=self._cache_dtype(),
                    obj_feats=obj_feats, object_valid=valid_j,
                    ground_slot=jnp.asarray(slot)))
                self.prefix_cache_stats[0] += 1
                return (np.concatenate([scores[:n], scores[-1:]]),
                        objects[:n])
        # miss (or unusable suffix): full grounding forward, harvesting the
        # prefix KV + object features for later queries on this scene
        vd, V, images, coords_full, patch, _ = (
            prepared_video if prepared_video is not None
            else self._video_arrays(record["video"], need_full_coords=True))
        batch, plan = self._build_batch(ids, labels, V, images, patch)
        objects = np.asarray(vd["objects"], np.float32).reshape(-1, 6)
        N = self.ecfg.max_objects
        obj = np.zeros((N, 6), np.float32)
        valid = np.zeros((N,), bool)
        n = min(len(objects), N)
        obj[:n] = objects[:n]
        valid[:n] = True
        hits = np.nonzero(plan.labels[0] == self.ecfg.ground_token_id)[0]
        slot = int(hits[0]) if len(hits) else int(plan.seq_len[0]) - 1
        L = int(batch.text_ids.shape[1])
        valid_j = jnp.asarray(valid)
        scores, cache, obj_feats = lv3d.grounding_forward_cached(
            self.params, self.cfg, batch, jnp.asarray(coords_full[0]),
            jnp.asarray(obj), valid_j, jnp.asarray(slot),
            max_cache_len=L, cache_dtype=self._cache_dtype())
        if img >= 0 and isinstance(key, str):
            self.prefix_cache_stats[1] += 1
            self._store_prefix(key, ids, img, batch, cache)
            with self._cache_lock:
                # companion features only make sense next to their prefix
                # entry — don't hold HBM for features that can never hit
                if key in self._prefix_cache:
                    self._ground_obj_cache[key] = (obj_feats, valid_j,
                                                   objects, n)
                    while len(self._ground_obj_cache) > \
                            self.ecfg.prefix_cache_scenes:
                        self._ground_obj_cache.popitem(last=False)
        scores = np.asarray(scores)
        return np.concatenate([scores[:n], scores[-1:]]), objects[:n]

    def ground_batch(self, records: Sequence[dict]
                     ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Batched :meth:`ground`: one prefill scores B queries (the
        reference grounds one at a time; queries per scene are plentiful in
        ScanRefer/Multi3DRefer so the prefill amortizes)."""
        return self.ground_from_prepared(self.prepare_ground_batch(records))

    def prepare_ground_batch(self, records: Sequence[dict]):
        """Host half of :meth:`ground_batch` (IO/tokenize/splice/masks) —
        split out so the grounding runners can pipeline it against the
        previous batch's device prefill (same pattern as run_generative)."""
        assert self.ecfg.ground_token_id is not None
        B = len(records)
        mc = self.cfg
        g = -(-mc.vision.num_patches_per_side // mc.spatial_pool_stride)
        T = mc.tokens_per_frame
        N = self.ecfg.max_objects

        ids_list, labels_list, frames = [], [], []
        images_l, patch_l, coords_l, objects_l = [], [], [], []
        for record in records:
            question = {"from": "human", "value": self._question_text(record)}
            tok = preprocess_qwen([[question, record["conversations"][1]]],
                                  self.tokenizer, has_image=True)
            ids_list.append(tok["input_ids"][0].tolist())
            labels_list.append(tok["labels"][0].tolist())
            vd, V, images, coords_full, patch, _ = self._video_arrays(
                record["video"], need_full_coords=True)
            frames.append(V)
            images_l.append(images[0])
            patch_l.append(patch[0])
            coords_l.append(coords_full[0])
            objects_l.append(np.asarray(vd["objects"], np.float32).reshape(-1, 6))

        total = max(len(i) + v * T for i, v in zip(ids_list, frames))
        L = pick_bucket(total, self.ecfg.buckets)
        plan = build_splice_plan(ids_list, labels_list, frames,
                                 tokens_per_frame=T, max_len=L, grid_side=g,
                                 truncate_to=mc.tokenizer_model_max_length)
        batch = lv3d.Batch(
            images=jnp.asarray(np.stack(images_l)),
            patch_coords=jnp.asarray(np.stack(patch_l)),
            text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
            vision_index=jnp.asarray(plan.vision_index),
            labels=jnp.asarray(plan.labels),
            position_ids=jnp.asarray(plan.position_ids),
            mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
            seq_len=jnp.asarray(plan.seq_len),
            coord_mask=jnp.asarray(plan.coord_mask))

        obj = np.zeros((B, N, 6), np.float32)
        valid = np.zeros((B, N), bool)
        slots = np.zeros((B,), np.int32)
        counts = []
        for b, objects in enumerate(objects_l):
            n = min(len(objects), N)
            obj[b, :n] = objects[:n]
            valid[b, :n] = True
            counts.append(n)
            hits = np.nonzero(plan.labels[b] == self.ecfg.ground_token_id)[0]
            slots[b] = int(hits[0]) if len(hits) else int(plan.seq_len[b]) - 1

        return (batch, jnp.asarray(np.stack(coords_l)), jnp.asarray(obj),
                jnp.asarray(valid), jnp.asarray(slots), counts, objects_l)

    def ground_from_prepared(self, prepared
                             ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Device half of :meth:`ground_batch`."""
        batch, coords, obj, valid, slots, counts, objects_l = prepared
        scores = np.asarray(lv3d.grounding_forward_batch(
            self.params, self.cfg, batch, coords, obj, valid, slots))
        return [(np.concatenate([scores[b, :counts[b]], scores[b, -1:]]),
                 objects_l[b][:counts[b]]) for b in range(len(counts))]


# ---------------------------------------------------------------------------
# Drivers — each mirrors the corresponding model_*.py record format
# ---------------------------------------------------------------------------

def _append_jsonl(path: str, record: dict) -> None:
    """Locked append: several --rank/--world driver processes share one
    answer file, like the reference's Ray workers guarded by
    fasteners.InterProcessLock (model_scanqa.py:117,194)."""
    import fcntl

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "a") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            f.write(json.dumps(record) + "\n")
            f.flush()
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)


def run_generative(engine: InferenceEngine, questions: Sequence[dict],
                   answer_file: str, gt_from_annotations: bool = False,
                   coord_token_id=None, batch_size: int = 1) -> List[float]:
    """ScanQA / SQA3D / Scan2Cap loop (model_scanqa.py:129-206).

    ``batch_size > 1`` runs batched prefill+decode (decode is HBM-bound, so
    this multiplies throughput at ~constant step latency).

    Host/device pipelining (beyond the reference's fully serial loop): one
    worker thread prepares batch i+1 (video IO, geometry, tokenization,
    splice plan) while the device generates batch i — numpy/PIL release
    the GIL for the heavy parts, so the two halves genuinely overlap.
    """
    from concurrent.futures import ThreadPoolExecutor

    if not questions:
        return []
    plain_prefix = bool(questions) and engine._prefix_cache_on(questions[0])
    spec_prefix = (bool(questions) and batch_size == 1
                   and engine._prefix_cache_spec_on(questions[0]))
    prefix_on = plain_prefix or spec_prefix
    if plain_prefix and batch_size > 1:
        # group same-scene questions into chunks so the scene-prefix KV
        # broadcasts across whole batches (output order changes; the jsonl
        # records are keyed by sample_id, so metrics are unaffected)
        questions = sorted(questions,
                           key=lambda q: str(q.get("video")))

    def prep(s):
        chunk = list(questions[s:s + batch_size])
        box_inputs = [np.asarray(l["box_input"][:3], np.float32)
                      if l.get("box_input") is not None else None
                      for l in chunk]
        if prefix_on and batch_size == 1:
            # scene-prefix KV path: host half (tokenize + suffix plan on a
            # hit, full video prep on a miss) pipelines here; the device
            # prefill runs in the timed section via start_request (which
            # also re-checks the prefix, so a prep that raced an admission
            # still upgrades)
            prepared = engine.prepare_request(
                chunk[0], box_inputs[0], coord_token_id)
        elif prefix_on:
            # batched suffix path: prep is host-cheap on hits; the miss
            # (once per scene) harvests inside the timed section
            prepared = None
        elif batch_size == 1:
            prepared = engine._prepare_generation(
                chunk[0], box_inputs[0], coord_token_id)
        else:
            prepared = engine.prepare_answers_batch(
                chunk, box_inputs=box_inputs, coord_token_id=coord_token_id)
        return chunk, box_inputs, prepared

    times = []
    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(prep, 0)
        for s in range(0, len(questions), batch_size):
            chunk, box_inputs, prepared = fut.result()
            if s + batch_size < len(questions):
                fut = ex.submit(prep, s + batch_size)
            t0 = time.time()
            if prefix_on and batch_size > 1:
                texts = engine.generate_answers_batch_prefix(
                    chunk, box_inputs, coord_token_id)
            elif spec_prefix:
                if engine._spec_disabled:
                    # min-acceptance guard demoted mid-run: the prep dict
                    # decodes vanilla through the plain prefix path
                    texts = [engine._answer_from_prep(prepared)]
                else:
                    texts = [engine._generate_answer_spec_prefix(
                        chunk[0], box_inputs[0], coord_token_id,
                        prep=prepared)]
            elif prefix_on:
                texts = [engine._answer_from_prep(prepared)]
            elif batch_size == 1:
                batch, vision_features = prepared
                res = engine._generate(batch,
                                       vision_features=vision_features)
                toks = np.asarray(res.tokens)[0][: int(res.lengths[0])]
                texts = [engine._decode_text(toks)]
            else:
                texts = engine.answers_from_batch(prepared, len(chunk))
            dt = (time.time() - t0) / len(chunk)
            for line, text in zip(chunk, texts):
                times.append(dt)
                gt = (line.get("annotations",
                               [line["conversations"][1]["value"]])
                      if gt_from_annotations
                      else line["conversations"][1]["value"])
                _append_jsonl(answer_file, {
                    "dataset": line["metadata"]["dataset"],
                    "sample_id": line["id"],
                    "prompt": line["conversations"][0]["value"],
                    "pred_response": text,
                    "gt_response": gt,
                    "question_type": line["metadata"].get("question_type"),
                })
    return times


def run_scanqa(engine, questions, answer_file):
    return run_generative(engine, questions, answer_file)


def run_sqa3d(engine, questions, answer_file):
    return run_generative(engine, questions, answer_file)


def run_scan2cap(engine, questions, answer_file, coord_token_id):
    return run_generative(engine, questions, answer_file,
                          gt_from_annotations=True,
                          coord_token_id=coord_token_id)


def _run_grounding(engine: InferenceEngine, questions: Sequence[dict],
                   batch_size: int, emit) -> List[float]:
    """Shared ScanRefer/Multi3DRefer loop with host/device pipelining:
    one worker thread prepares batch i+1 while the device scores batch i
    (batch_size 1 routes through the B=1 batched path — numerics-identical
    to :meth:`InferenceEngine.ground`, asserted by
    tests/test_drivers.py::test_ground_batch_matches_single)."""
    from concurrent.futures import ThreadPoolExecutor

    if not questions:
        return []

    _PREFIX = object()

    def prep(s0):
        chunk = list(questions[s0:s0 + batch_size])
        if batch_size == 1 and engine.mesh is None \
                and engine._prefix_cache_on(chunk[0]):
            # scene-prefix grounding path: a hit does no host video work;
            # for a MISS (no prefix entry yet) pre-load the video arrays
            # here so the harvest still pipelines against device work
            with engine._cache_lock:
                have = chunk[0].get("video") in engine._prefix_cache
            pv = None if have else engine._video_arrays(
                chunk[0]["video"], need_full_coords=True)
            return chunk, (_PREFIX, pv)
        return chunk, engine.prepare_ground_batch(chunk)

    times = []
    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(prep, 0)
        for s0 in range(0, len(questions), batch_size):
            chunk, prepared = fut.result()
            if s0 + batch_size < len(questions):
                fut = ex.submit(prep, s0 + batch_size)
            t0 = time.time()
            if isinstance(prepared, tuple) and prepared[0] is _PREFIX:
                results = [engine.ground(chunk[0],
                                         prepared_video=prepared[1])]
            else:
                results = engine.ground_from_prepared(prepared)
            dt = (time.time() - t0) / len(chunk)
            for line, (scores, objects) in zip(chunk, results):
                times.append(dt)
                emit(line, scores, objects)
    return times


def run_scanrefer(engine: InferenceEngine, questions: Sequence[dict],
                  answer_file: str, batch_size: int = 1) -> List[float]:
    """Argmax grounding box (model_scanrefer.py:163-190).

    ``batch_size > 1`` scores several queries per prefill
    (InferenceEngine.ground_batch).
    """
    return _run_grounding(
        engine, questions, batch_size,
        lambda line, scores, objects:
            _emit_scanrefer(answer_file, line, scores, objects))


def _emit_scanrefer(answer_file, line, scores, objects):
    if len(objects) and int(np.argmax(scores)) < len(objects):
        pred_box = objects[int(np.argmax(scores))].tolist()
    elif len(objects):
        pred_box = objects[int(np.argmax(scores[:-1]))].tolist()
    else:
        pred_box = [0.0] * 6
    _append_jsonl(answer_file, {
        "dataset": line["metadata"]["dataset"],
        "sample_id": line["id"],
        "pred_response": pred_box,
        "gt_response": line["metadata"]["gt_box"] if "gt_box" in line["metadata"]
        else line.get("box"),
        "question_type": line["metadata"].get("question_type"),
    })


def run_vqa(engine: InferenceEngine, questions: Sequence[dict],
            answer_file: str) -> List[float]:
    """Generic VQA driver (model_vqa.py equivalent): free-form prompts over
    scenes, no gt assumptions."""
    times = []
    for line in questions:
        t0 = time.time()
        text = engine.generate_answer(line)
        times.append(time.time() - t0)
        _append_jsonl(answer_file, {
            "sample_id": line.get("id"),
            "prompt": line["conversations"][0]["value"],
            "pred_response": text,
            "gt_response": (line["conversations"][1].get("value")
                            if len(line["conversations"]) > 1 else None),
        })
    return times


def run_multi3drefer(engine: InferenceEngine, questions: Sequence[dict],
                     answer_file: str, batch_size: int = 1) -> List[float]:
    """Dump all scores + objects (model_multi3drefer.py:163-180)."""
    def emit(line, scores, objects):
        _append_jsonl(answer_file, {
            "dataset": line["metadata"]["dataset"],
            "sample_id": line["id"],
            "scores": scores.tolist(),
            "objects": objects.tolist(),
            "gt_response": line.get("box", []),
            "question_type": line["metadata"].get("question_type"),
        })

    return _run_grounding(engine, questions, batch_size, emit)
