"""Qwen2 decoder with 3-axis mRoPE, GQA, and a static-shape KV cache —
pure-functional JAX.

Behavior mirrors the reference's vendored Qwen2
(/root/reference/llava/model/language_model/qwen2/modeling_qwen2.py):
  * RMSNorm in float32 with ``x * rsqrt(mean(x^2) + eps) * w`` (:85-90)
  * rotary embedding computed per axis from (B, L, 3) position ids (:106-129)
  * mRoPE section split [32, 16, 16] interleaved over the doubled freq dim
    (:141-173); replicating a 1D position id across the 3 axes reproduces
    standard RoPE exactly, which is how text-only positions behave (:997-1004)
  * GQA with num_key_value_heads < num_heads; SwiGLU MLP; untied lm_head.

TPU-first design notes:
  * all shapes static; decode uses a preallocated (B, max_len, kv_heads, hd)
    cache updated with dynamic_update_slice per step
  * attention runs through ``video3d_tpu.kernels.attention.mha`` which
    dispatches to a Pallas flash kernel on TPU and a jnp reference path on CPU
  * matmuls stay in the params' dtype (bf16 in production) with f32 softmax.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from video3d_tpu.config import LLMConfig
from video3d_tpu.kernels.attention import mha

Params = Dict[str, Any]


#: KV-cache storage dtypes that carry per-token dequant scales. int8 halves
#: decode HBM traffic vs bf16; int4 halves it again (XLA stores s4 packed,
#: two values per byte), doubling the context/batch a chip's HBM can hold
#: at a looser quantization (4-bit symmetric per-token-per-head).
QUANT_KV_DTYPES = (jnp.int8, jnp.int4)


class KVCache(NamedTuple):
    """Stacked KV cache: k/v (num_layers, B, max_len, kv_heads * head_dim).

    The head dims are stored FLAT (r5): the decode kernel's block-diagonal
    head fold consumes (.., S, KV*hd) blocks, and with the heads flattened
    the array's DEFAULT XLA layout is exactly the layout the pallas
    custom-call mandates — so the whole stacked cache threads through the
    per-layer dus-append + kernel-read chain as ONE buffer with zero
    copies. (Head-split (.., S, KV, hd) storage got a custom
    {4,3,2,0,1}:T(4,128) layout from XLA while pallas required the
    default — every layer's kernel call then RELAYOUT-copied the entire
    0.875 GiB cache: 22 -> 137 ms/step measured at 32k. Per-layer views
    are ``k[i].reshape(B, S, KV, hd)`` where heads are needed.)

    ``dtype=jnp.int8`` / ``jnp.int4`` stores a quantized cache: symmetric
    per-token-per-head values plus float32 scales (num_layers, B, max_len,
    kv_heads, 1). Cuts decode HBM traffic 2x/4x vs bf16 — the
    convert+rescale fuses into the attention matmuls, so only the quantized
    bytes and tiny scales stream from HBM.
    """

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @classmethod
    def zeros(cls, cfg: LLMConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.num_hidden_layers, batch, max_len,
                 cfg.num_key_value_heads * cfg.head_dim)
        if dtype in QUANT_KV_DTYPES:
            sshape = shape[:-1] + (cfg.num_key_value_heads, 1)
            return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                       jnp.zeros(sshape, jnp.float32),
                       jnp.zeros(sshape, jnp.float32))
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def layer(self, i: int, kv_heads: int):
        """Head-split per-layer view: (k, v[, k_scale, v_scale]) with k/v
        (B, S, KV, hd) — a relayout copy on TPU; CPU/reference use."""
        NL, B, S, C = self.k.shape
        k = self.k[i].reshape(B, S, kv_heads, C // kv_heads)
        v = self.v[i].reshape(B, S, kv_heads, C // kv_heads)
        if self.k_scale is None:
            return k, v
        return k, v, self.k_scale[i], self.v_scale[i]


def _quantize_kv(x: jax.Array, dtype=jnp.int8):
    """(B, L, KV, hd) -> int8/int4 values + (B, L, KV, 1) f32 scales
    (symmetric, per token per head: scale = max|x| / qmax over head_dim)."""
    qmax = 7.0 if dtype == jnp.int4 else 127.0
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / qmax,
                        1e-8)
    q = jnp.clip(jnp.round(xf / scale), -qmax, qmax).astype(dtype)
    return q, scale


def rms_norm(x: jax.Array, weight: jax.Array, eps: float,
             add_unit_offset: bool = False) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = (x32 * x32).mean(axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    if add_unit_offset:
        # Gemma: (1 + w) applied in float32 before the cast
        # (HF GemmaRMSNorm.forward)
        return ((1.0 + weight.astype(jnp.float32)) * normed).astype(x.dtype)
    return weight * normed.astype(x.dtype)


def layer_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """Mean-subtracting LayerNorm, scale only (MPT no_bias=True default;
    HF modeling_mpt MptBlock norm_1/norm_2)."""
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return weight * ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _norm(x: jax.Array, weight: jax.Array, cfg: LLMConfig) -> jax.Array:
    if cfg.norm_type == "layernorm":
        return layer_norm(x, weight, cfg.rms_norm_eps)
    return rms_norm(x, weight, cfg.rms_norm_eps, cfg.rms_norm_add_unit_offset)


def alibi_slopes(num_heads: int, alibi_bias_max: float = 8.0) -> jax.Array:
    """Per-head ALiBi slopes (HF build_mpt_alibi_tensor; the MPT variant's
    odd/even re-interleave for non-power-of-2 head counts)."""
    import math

    n_pow2 = 2 ** math.ceil(math.log2(num_heads))
    base = jnp.arange(1, n_pow2 + 1, dtype=jnp.float32) * (alibi_bias_max / n_pow2)
    slopes = 1.0 / (2.0 ** base)
    if n_pow2 != num_heads:
        slopes = jnp.concatenate([slopes[1::2], slopes[::2]])[:num_heads]
    return slopes


def alibi_bias(cfg: LLMConfig, key_len: int) -> jax.Array:
    """(H, S) key-position bias: slope_h * j. HF anchors at
    slope * (j - (K-1)); the per-row constant shift is softmax-invariant, so
    the unanchored form works for any valid-length prefix of a preallocated
    cache."""
    slopes = alibi_slopes(cfg.num_attention_heads, cfg.alibi_bias_max)
    return slopes[:, None] * jnp.arange(key_len, dtype=jnp.float32)[None, :]


def compute_mrope_cos_sin(position_ids: jax.Array, cfg: LLMConfig,
                          dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """(B, L, 3) position ids -> (cos, sin) each (B, L, head_dim), with the
    mrope section mixing already applied.

    Reference computes per-axis (3, B, L, head_dim) cos/sin then interleaves
    sections [32,16,16]*2, picking section i from axis i%3 (:162-169). We fold
    the section-select into the frequency computation: each of the head_dim
    rotary channels has a fixed (axis, freq) pair, so one gather suffices.
    """
    half = cfg.head_dim // 2
    assert sum(cfg.mrope_section) == half, (cfg.mrope_section, cfg.head_dim)
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))

    # Which axis each of the `half` frequency channels reads from.
    s1, s2, s3 = cfg.mrope_section
    axis_for_freq = jnp.concatenate([
        jnp.zeros((s1,), jnp.int32),
        jnp.ones((s2,), jnp.int32),
        jnp.full((s3,), 2, jnp.int32),
    ])  # (half,)

    pos = position_ids.astype(jnp.float32)              # (B, L, 3)
    freqs_per_axis = pos[..., None, :] * inv_freq[None, None, :, None]  # (B, L, half, 3)
    freqs = jnp.take_along_axis(
        freqs_per_axis, axis_for_freq[None, None, :, None].astype(jnp.int32), axis=-1
    )[..., 0]                                            # (B, L, half)
    emb = jnp.concatenate([freqs, freqs], axis=-1)       # (B, L, head_dim)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rotary(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array):
    """q, k: (B, L, heads, hd); cos/sin: (B, L, hd)."""
    cos = cos[:, :, None, :].astype(q.dtype)
    sin = sin[:, :, None, :].astype(q.dtype)
    q_rot = q * cos + rotate_half(q) * sin
    k_rot = k * cos + rotate_half(k) * sin
    return q_rot, k_rot


def decoder_layer(p: Params, x: jax.Array, cos: jax.Array, sin: jax.Array,
                  cfg: LLMConfig,
                  kv: Optional[Tuple[jax.Array, jax.Array]] = None,
                  cache_positions: Optional[jax.Array] = None,
                  kv_len: Optional[jax.Array] = None,
                  attn_mask: Optional[jax.Array] = None,
                  prefill: bool = False,
                  paged: Optional[tuple] = None,
                  contiguous_update: bool = False,
                  shared_prefix: Optional[tuple] = None,
                  layer_idx: int = 0,
                  kv_stacked: bool = False):
    """One decoder block.

    Args:
      x: (B, L, D) hidden states.
      kv: optional (k_cache, v_cache) each (B, max_len, kv_heads, hd). When
        given, new K/V are scattered at ``cache_positions`` and attention runs
        against the cache (decode / chunked prefill).
      cache_positions: (B, L) absolute slot indices for the new tokens.
      kv_len: (B,) number of valid cache entries AFTER this call's insert.
      contiguous_update: static promise that ``cache_positions`` rows are
        the SAME contiguous range for every batch row (chunked prefill /
        suffix-over-prefix). Writes become one ``dynamic_update_slice``
        instead of a vmapped scatter — XLA lowers the per-row scatter to a
        serial loop over the L inserted slots on TPU, which dominated the
        suffix-prefill profile (scripts/bench/prefix_split.py r3).
      attn_mask: (B, L, S) boolean (True = attend) when kv is None.
      paged: optional paged-KV decode step (L == 1, mutually exclusive with
        ``kv``): (layer_pools 4-tuple, page_table, pids, off, lens_after)
        — see models/paged_kv.py. New K/V append into the layer's pages at
        (pids, off) and attention streams the slot's pages.
      shared_prefix: optional (pk, pv[, pk_scale, pv_scale]) with pk/pv
        (P, KV, hd) — the SHARED scene-prefix KV of this layer (no batch
        dim). Requires ``kv`` + ``contiguous_update`` with every row's
        ``cache_positions`` == [P, P+L): the cache write proceeds
        unchanged (decode reads it later), but attention runs
        :func:`~video3d_tpu.kernels.attention.mha_shared_prefix` over
        (shared prefix) + (this chunk's raw K/V) instead of re-streaming
        the per-row cache — the prefix KV is read once for ALL rows
        (VERDICT r3 #1; scene-grouped suffix prefill).
    Returns:
      (out, new layer cache — dense kv tuple, paged pools 4-tuple, or None)
    """
    B, L, D = x.shape
    H, KV, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    from video3d_tpu.models.quant import matmul as _mm

    h = _norm(x, p["input_layernorm"], cfg)
    attn_p = p["attn"]
    q = _mm(h, attn_p["wq"])
    k = _mm(h, attn_p["wk"])
    v = _mm(h, attn_p["wv"])
    if "bq" in attn_p:       # Qwen2 qkv bias; LLaMA-family omits it
        q = q + attn_p["bq"]
        k = k + attn_p["bk"]
        v = v + attn_p["bv"]
    q = q.reshape(B, L, H, hd)
    k = k.reshape(B, L, KV, hd)
    v = v.reshape(B, L, KV, hd)
    score_bias = None
    if cfg.position_embedding == "alibi":     # MPT: no rotary, key-pos bias
        kv_size = kv[0].shape[1] if kv is not None else k.shape[1]
        score_bias = alibi_bias(cfg, kv_size)
    else:
        q, k = apply_rotary(q, k, cos, sin)

    new_kv = None
    if paged is not None:
        from video3d_tpu.kernels.attention import paged_mha
        from video3d_tpu.models.paged_kv import append_layer_kv

        assert score_bias is None, "paged decode does not support ALiBi"
        pools, page_table, pids, off, lens_after = paged
        # r5 stacked-threading: rank-4 FLAT pools (layers, P, page, C)
        # are the WHOLE buffers; appends dus per (slot, token) row and
        # the kernel addresses the stack by layer id — the per-layer
        # layer_view + restack re-wrote the pools every step
        # (BENCH_NOTES r5). Rank-3 (P, page, C) = legacy per-layer view.
        stackedp = pools[0].ndim == 4
        lay = layer_idx if stackedp else None
        if q.shape[1] == 1:
            pools = append_layer_kv(pools, k[:, 0], v[:, 0], pids, off,
                                    layer=lay)
            attn = paged_mha(q, pools[0], pools[1], page_table, lens_after,
                             k_scale=pools[2], v_scale=pools[3], layer=lay)
        else:
            # multi-token block (speculative verify): append all L tokens
            # ((S, L) coordinates), then per-query causal attention at
            # global positions lens_after - L .. lens_after - 1
            from video3d_tpu.kernels.paged_attention import \
                paged_attention_multi

            L = q.shape[1]
            pools = append_layer_kv(pools, k, v, pids, off, layer=lay)
            mp = ([x if x is None or not stackedp else x[layer_idx]
                   for x in pools])          # gather path stays per-layer
            q_positions = (lens_after[:, None] - L
                           + jnp.arange(L)[None])
            attn = paged_attention_multi(
                q, mp[0], mp[1], page_table, q_positions,
                k_scale=mp[2], v_scale=mp[3])
        new_kv = pools
    elif kv is not None:
        k_cache, v_cache = kv[0], kv[1]
        k_scale = kv[2] if len(kv) > 2 else None
        v_scale = kv[3] if len(kv) > 3 else None
        # r5 stacked-cache mode (kv_stacked=True): k/v are the WHOLE
        # flat (layers, B, S, KV*hd) cache with ``layer_idx`` naming this
        # layer (scales stay head-split (layers, B, S, KV, 1)). Writes dus
        # straight into the stacked buffer and attention addresses it via
        # the kernel's BlockSpec index map — the per-step slice+restack of
        # the old per-layer plumbing re-wrote the entire cache every
        # decode step (measured ~9.6 ms at a 32k cache, BENCH_NOTES r5
        # 32k-decode section), and the flat head layout keeps the buffer
        # in the default XLA layout the pallas custom-call mandates (see
        # KVCache docstring for the 137 ms relayout tale).
        stacked5 = kv_stacked

        def scatter(cache, new):
            five = cache.ndim == new.ndim + 1
            li = (jnp.asarray(layer_idx, jnp.int32),) if five else ()
            if contiguous_update:
                # every row inserts the same [start, start+L) range: one
                # dynamic_update_slice, no scatter. CONTRACT: the range
                # must fit the cache — dynamic_update_slice CLAMPS an
                # out-of-range start to max_len - L (overwriting the most
                # recent valid slots), unlike the per-row path below,
                # which silently DROPS out-of-range rows. Every current
                # caller sizes max_cache_len >= start + L statically
                # (chunked prefill bounds the chunk, ground_suffix /
                # start_decode_prefix allocate prefix+suffix exactly).
                start = cache_positions[0, 0]
                zero = jnp.zeros((), start.dtype)
                idx = li + (zero, start) + (zero,) * (new.ndim - 2)
                upd = new[None] if five else new
                return jax.lax.dynamic_update_slice(cache, upd, idx)

            # r5: per-row dynamic_update_slice instead of the batched
            # ``at[pos].set`` scatter. XLA lowered the vmapped scatter to
            # whole-array select FUSIONS that re-write the ENTIRE cache
            # buffer for each of the four (k, v, k_scale, v_scale)
            # appends of every layer, every step (the optimized HLO shows
            # s8[1,32768,4,128]-shaped fusion outputs). Every caller of
            # this path builds per-row CONTIGUOUS positions
            # (start_b + arange(L): decode L == 1, speculative verify
            # blocks, beam steps), so a per-row slice insert is exact;
            # the scatter's silent DROP of out-of-range positions is
            # reproduced by selecting the old values for masked rows.
            B, L = new.shape[0], new.shape[1]
            max_len = cache.shape[2] if five else cache.shape[1]

            def row(b, c):
                pos = cache_positions[b, 0]
                start = li + (b, jnp.clip(pos, 0, max_len - L)) \
                    + (0,) * (new.ndim - 2)
                sizes = ((1,) if five else ()) + (1, L) + new.shape[2:]
                old = jax.lax.dynamic_slice(c, start, sizes)
                ok = ((pos + jnp.arange(L) < max_len) & (pos >= 0))
                ok = ok.reshape((1,) * (len(sizes) - new.ndim + 1)
                                + (L,) + (1,) * (new.ndim - 2))
                new_b = jax.lax.dynamic_slice_in_dim(new, b, 1, 0)
                if five:
                    new_b = new_b[None]
                upd = jnp.where(ok, new_b.astype(cache.dtype), old)
                return jax.lax.dynamic_update_slice(c, upd, start)

            return jax.lax.fori_loop(0, B, row, cache,
                                     unroll=True)

        def flatten_heads(t):
            # stacked caches store heads FLAT; (B, L, KV, hd) -> (B, L, C)
            return t.reshape(t.shape[0], t.shape[1], -1) if stacked5 else t

        if k_cache.dtype in QUANT_KV_DTYPES:
            kq, ks = _quantize_kv(k, k_cache.dtype)
            vq, vs = _quantize_kv(v, k_cache.dtype)
            k_cache = scatter(k_cache, flatten_heads(kq))
            v_cache = scatter(v_cache, flatten_heads(vq))
            k_scale = scatter(k_scale, ks)
            v_scale = scatter(v_scale, vs)
            new_kv = (k_cache, v_cache, k_scale, v_scale)
        else:
            k_cache = scatter(k_cache, flatten_heads(k.astype(k_cache.dtype)))
            v_cache = scatter(v_cache, flatten_heads(v.astype(v_cache.dtype)))
            new_kv = (k_cache, v_cache)
        if shared_prefix is not None and not prefill:
            # scene-grouped suffix chunk over a SHARED prefix: stream the
            # prefix KV once for all rows; the chunk's own K/V attend raw
            # (no cache round-trip — same values full prefill attends)
            from video3d_tpu.kernels.attention import mha_shared_prefix

            assert contiguous_update and score_bias is None
            P = shared_prefix[0].shape[0]
            pks = shared_prefix[2] if len(shared_prefix) > 2 else None
            pvs = shared_prefix[3] if len(shared_prefix) > 3 else None
            attn = mha_shared_prefix(q, shared_prefix[0], shared_prefix[1],
                                     k, v, kv_len - P,
                                     pk_scale=pks, pv_scale=pvs)
        elif prefill:
            # Prefill fills slots 0..L-1, so attention over the raw K/V with
            # plain causal + length masking is identical to reading the cache
            # back — and flash-eligible. (int8 caches still prefill at full
            # precision here; quantization only affects later decode reads.)
            attn = mha(q, k, v, causal=True, kv_len=kv_len,
                       score_bias=(score_bias[:, :k.shape[1]]
                                   if score_bias is not None else None))
        elif stacked5:
            # stacked-cache read: the kernel addresses the flat
            # (layers, B, S, KV*hd) buffer directly (scales — tiny — are
            # sliced per layer); non-kernel paths slice + head-split inside
            from video3d_tpu.kernels.attention import mha_cached_stacked

            attn = mha_cached_stacked(
                q, k_cache, v_cache, layer_idx, KV,
                q_positions=cache_positions, kv_len=kv_len,
                k_scale=(k_scale[layer_idx] if k_scale is not None
                         else None),
                v_scale=(v_scale[layer_idx] if v_scale is not None
                         else None),
                score_bias=score_bias)
        elif k_cache.dtype in QUANT_KV_DTYPES:
            # the quantized cache flows to attention as-is: on the TPU
            # decode kernel HBM streams int8/int4 + scales; other paths
            # dequantize inside mha
            attn = mha(q, k_cache, v_cache,
                       q_positions=cache_positions, kv_len=kv_len,
                       causal=True, k_scale=k_scale, v_scale=v_scale,
                       score_bias=score_bias)
        else:
            attn = mha(q, k_cache.astype(q.dtype), v_cache.astype(q.dtype),
                       q_positions=cache_positions, kv_len=kv_len,
                       causal=True, score_bias=score_bias)
    else:
        attn = mha(q, k, v, mask=attn_mask, causal=True, kv_len=kv_len,
                   score_bias=score_bias)

    x = x + _mm(attn.reshape(B, L, D), p["attn"]["wo"])

    h = _norm(x, p["post_attention_layernorm"], cfg)
    if "moe" in p:     # sparse-MoE layer (models/moe.py)
        from video3d_tpu.models.moe import moe_block

        x = x + moe_block(p["moe"], h, cfg.moe)
    elif "w_gate" not in p["mlp"]:
        # ungated MLP (MPT ffn: up_proj -> exact GELU -> down_proj)
        up = jax.nn.gelu(_mm(h, p["mlp"]["w_up"]), approximate=False)
        x = x + _mm(up, p["mlp"]["w_down"])
    else:
        act = (jax.nn.silu if cfg.hidden_act == "silu"
               else functools.partial(jax.nn.gelu, approximate=True))
        gate = act(_mm(h, p["mlp"]["w_gate"]))
        up = _mm(h, p["mlp"]["w_up"])
        x = x + _mm(gate * up, p["mlp"]["w_down"])
    return x, new_kv


def qwen2_forward(params: Params, cfg: LLMConfig,
                  inputs_embeds: jax.Array,
                  position_ids: jax.Array,
                  attn_mask: Optional[jax.Array] = None,
                  kv_cache: Optional[KVCache] = None,
                  cache_positions: Optional[jax.Array] = None,
                  kv_len: Optional[jax.Array] = None,
                  prefill: bool = False,
                  remat: bool = False,
                  paged_cache=None,
                  paged_active: Optional[jax.Array] = None,
                  scan_layers: bool = False,
                  contiguous_update: bool = False,
                  shared_prefix: Optional[KVCache] = None):
    """Run the decoder stack.

    Args:
      inputs_embeds: (B, L, D) already-spliced embeddings.
      position_ids: (B, L, 3) mRoPE ids (replicate a 1D id for plain RoPE).
      attn_mask: optional (B, L, S) boolean dense mask. For the common
        right-padded causal case pass ``kv_len`` (B,) instead — that routes
        through the Pallas flash kernel.
      kv_cache: optional KVCache; ``prefill=True`` marks the cache fill pass
        (slots 0..L-1), which attends on the raw K/V flash path.
      paged_cache: optional models/paged_kv.PagedKVCache for decode
        (B == num_slots; mutually exclusive with kv_cache). L == 1 is the
        plain decode step; L > 1 appends the whole block at positions
        lens..lens+L-1 with per-query causal attention — the speculative
        verify pass. ``paged_active`` (B,) bool masks dead slots: their
        append lands on the sacrificial scratch page and their length does
        not advance.
      contiguous_update: static promise that every batch row's
        ``cache_positions`` are the same contiguous range (chunked prefill,
        suffix-over-prefix); cache writes use one dynamic_update_slice
        instead of a per-row scatter (see decoder_layer).
      shared_prefix: optional KVCache with arrays (layers, P, KV, hd) —
        the batch-free SHARED scene prefix. Requires ``kv_cache`` +
        ``contiguous_update`` with cache_positions == [P, P+L) on every
        row; attention streams the prefix once for all rows
        (decoder_layer ``shared_prefix``).
      scan_layers: run the stack as ONE ``lax.scan`` over stacked layer
        params (cache-free paths only). Numerically identical to the
        unrolled loop; structurally bounds the fsdp all-gather liveness to
        a single layer (the unrolled 28-layer graph lets the scheduler keep
        every layer's gathered weights alive at once — measured +12 GiB of
        peak temp on the v5e-8 recipe, scripts/bench/train_memory_v5e8.py)
        and compiles the body once instead of 28 times. Train-step default;
        kept OFF for single-chip decode where the unrolled graph measured
        faster through the remote-compile tunnel (BENCH_NOTES).
    Returns:
      (hidden_states (B, L, D), new cache of the same kind or None)
    """
    from video3d_tpu.parallel.mesh import sequence_sharding_constraint

    if cfg.position_embedding == "alibi":      # MPT: no rotary tables
        cos = sin = None
    else:
        cos, sin = compute_mrope_cos_sin(position_ids, cfg)
    if cfg.embed_scale:
        # Gemma scales whatever enters the stack (incl. spliced vision
        # features) by sqrt(D) cast to the activation dtype (GemmaModel)
        inputs_embeds = inputs_embeds * jnp.asarray(
            cfg.hidden_size ** 0.5, inputs_embeds.dtype)
    # seed sequence parallelism: under an sp>1 mesh the token dim of every
    # activation shards here and GSPMD propagates it through the stack
    x = sequence_sharding_constraint(inputs_embeds)

    layer = decoder_layer
    if remat:
        layer = jax.checkpoint(
            functools.partial(decoder_layer, prefill=prefill,
                              contiguous_update=contiguous_update),
            static_argnums=(4,),
            policy=jax.checkpoint_policies.nothing_saveable,
        )
    else:
        layer = functools.partial(decoder_layer, prefill=prefill,
                                  contiguous_update=contiguous_update)

    if (scan_layers and kv_cache is None and paged_cache is None
            and len(params["layers"]) > 1
            and _homogeneous(params["layers"])):
        from video3d_tpu.parallel.mesh import stacked_layer_constraint

        stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *params["layers"])
        stacked = stacked_layer_constraint(stacked)

        def body(carry, lp):
            out, _ = decoder_layer(lp, carry, cos, sin, cfg, None, None,
                                   kv_len, attn_mask, prefill=prefill)
            return out, None

        if remat:
            body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.nothing_saveable)
        x, _ = jax.lax.scan(body, x, stacked)
        return _norm(x, params["norm"], cfg), None

    paged_coords = None
    if paged_cache is not None:
        from video3d_tpu.models import paged_kv as _pkv

        assert kv_cache is None, "paged_cache and kv_cache are exclusive"
        Lp = inputs_embeds.shape[1]
        if Lp == 1:
            paged_coords = _pkv.append_positions(paged_cache, paged_active)
            inc = (1 if paged_active is None
                   else paged_active.astype(jnp.int32))
        else:
            # multi-token decode block (speculative verify)
            paged_coords = _pkv.append_positions_multi(
                paged_cache, Lp, paged_active)
            inc = (Lp if paged_active is None
                   else Lp * paged_active.astype(jnp.int32))
        lens_after = paged_cache.lens + inc

    # r5: the dense cache is threaded through the layer loop as the WHOLE
    # stacked (layers, B, S, KV, hd) buffer — each layer dus's its row in
    # place and attention addresses the stack by layer index
    # (kernels/attention.py mha_cached_stacked). The previous per-layer
    # slice + final jnp.stack re-wrote the ENTIRE cache every step
    # (~9.6 ms at a 32k cache, BENCH_NOTES r5 32k-decode section).
    dense_running = None
    if kv_cache is not None:
        dense_running = (kv_cache.k, kv_cache.v,
                         kv_cache.k_scale, kv_cache.v_scale)
    # paged pools keep the r4 per-layer view + restack plumbing: the
    # stacked-threading variant (rank-4 flat pools + per-row dus + layer
    # prefetch in the kernel, all implemented and CPU-tested) sent XLA
    # compile time pathological (>20 min for the 32k-mix decode chunk,
    # never completed inside the bench budget) — parked as the known
    # next lever for the paged gap; see BENCH_NOTES r5.
    new_cols = ([], [], [], [])
    for i, lp in enumerate(params["layers"]):
        kv = paged = None
        if paged_cache is not None:
            paged = (_pkv.layer_view(paged_cache, i),
                     paged_cache.page_table, *paged_coords, lens_after)
        elif dense_running is not None:
            kv = (dense_running[0], dense_running[1])
            if dense_running[2] is not None:
                kv += (dense_running[2], dense_running[3])
        sp = None
        if shared_prefix is not None:
            # prefix k/v store heads flat like the main cache; the
            # shared-prefix kernel wants (P, KV, hd) per layer
            KVh = cfg.num_key_value_heads
            sp_k = shared_prefix.k[i]
            sp_v = shared_prefix.v[i]
            if sp_k.ndim == 2:
                P_ = sp_k.shape[0]
                sp_k = sp_k.reshape(P_, KVh, -1)
                sp_v = sp_v.reshape(P_, KVh, -1)
            sp = (sp_k, sp_v)
            if shared_prefix.k_scale is not None:
                sp += (shared_prefix.k_scale[i], shared_prefix.v_scale[i])
        # stacked-mode kwargs only when a cache is threaded — the
        # remat-wrapped layer would otherwise trace these python scalars
        extra = {}
        if dense_running is not None:
            extra = dict(layer_idx=i, kv_stacked=True)
        x, nkv = layer(lp, x, cos, sin, cfg, kv, cache_positions, kv_len,
                       attn_mask, paged=paged, shared_prefix=sp, **extra)
        if nkv is not None:
            if dense_running is not None:
                dense_running = tuple(nkv) + (None,) * (4 - len(nkv))
            elif paged_cache is not None:
                for col, part in zip(new_cols, nkv):
                    if part is not None:
                        col.append(part)

    x = _norm(x, params["norm"], cfg)
    new_cache = None
    if new_cols[0] and paged_cache is not None:
        stacked = [jnp.stack(c) if c else None for c in new_cols]
        new_cache = paged_cache._replace(
            k=stacked[0], v=stacked[1], lens=lens_after,
            k_scale=stacked[2], v_scale=stacked[3])
    elif dense_running is not None:
        new_cache = KVCache(*dense_running)
    return x, new_cache


def _homogeneous(layers) -> bool:
    """True when every layer tree has the same structure AND every leaf the
    same shape/dtype (scan-over-layers stacking requirement; False for
    mixed dense/MoE stacks)."""
    ref = jax.tree.structure(layers[0])
    ref_leaves = [(l.shape, l.dtype) for l in jax.tree.leaves(layers[0])]
    for lay in layers[1:]:
        if jax.tree.structure(lay) != ref:
            return False
        if [(l.shape, l.dtype) for l in jax.tree.leaves(lay)] != ref_leaves:
            return False
    return True


def lm_head(params: Params, hidden: jax.Array) -> jax.Array:
    """(B, L, D) -> (B, L, vocab) logits."""
    from video3d_tpu.models.quant import matmul as _mm

    return _mm(hidden, params["lm_head"])


def embed_tokens(params: Params, input_ids: jax.Array) -> jax.Array:
    from video3d_tpu.parallel.mesh import embed_gather

    return embed_gather(params["embed_tokens"], input_ids)


def init_qwen2(key: jax.Array, cfg: LLMConfig, dtype=jnp.float32) -> Params:
    """Random init with production shapes (tests / from-scratch)."""
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, KV, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    keys = jax.random.split(key, 3 + cfg.num_hidden_layers)

    def linear(k, din, dout, std=0.02):
        return std * jax.random.normal(k, (din, dout), dtype)

    def layer(k):
        ks = jax.random.split(k, 7)
        attn = {
            "wq": linear(ks[0], D, H * hd),
            "wk": linear(ks[1], D, KV * hd),
            "wv": linear(ks[2], D, KV * hd),
            "wo": linear(ks[3], H * hd, D),
        }
        if cfg.attention_bias:
            attn.update({"bq": jnp.zeros((H * hd,), dtype),
                         "bk": jnp.zeros((KV * hd,), dtype),
                         "bv": jnp.zeros((KV * hd,), dtype)})
        if cfg.position_embedding == "alibi":     # MPT: ungated GELU MLP
            mlp = {"w_up": linear(ks[5], D, I), "w_down": linear(ks[6], I, D)}
        else:
            mlp = {
                "w_gate": linear(ks[4], D, I),
                "w_up": linear(ks[5], D, I),
                "w_down": linear(ks[6], I, D),
            }
        return {
            "input_layernorm": jnp.ones((D,), dtype),
            "attn": attn,
            "post_attention_layernorm": jnp.ones((D,), dtype),
            "mlp": mlp,
        }

    return {
        "embed_tokens": 0.02 * jax.random.normal(keys[0], (cfg.vocab_size, D), dtype),
        "layers": [layer(keys[2 + i]) for i in range(cfg.num_hidden_layers)],
        "norm": jnp.ones((D,), dtype),
        "lm_head": 0.02 * jax.random.normal(keys[1], (D, cfg.vocab_size), dtype),
    }
