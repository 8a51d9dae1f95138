"""Pallas flash-attention kernel correctness vs the jnp reference path,
run in Pallas interpreter mode on CPU (kernel logic validation without TPU;
the same kernel compiles for TPU via Mosaic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.kernels.attention import mha_reference


def flash_interpret(q, k, v, block_q=64, block_k=64):
    """Run the production kernel in Pallas interpreter mode."""
    from video3d_tpu.kernels.flash_attention import flash_attention

    return flash_attention(q, k, v, block_q=block_q, block_k=block_k,
                           interpret=True)


class TestFlashKernel:
    @pytest.mark.parametrize("L,H,KV,hd", [(128, 2, 2, 128), (256, 4, 2, 128)])
    def test_matches_reference(self, L, H, KV, hd):
        rng = np.random.default_rng(0)
        B = 1
        q = rng.normal(size=(B, L, H, hd)).astype(np.float32)
        k = rng.normal(size=(B, L, KV, hd)).astype(np.float32)
        v = rng.normal(size=(B, L, KV, hd)).astype(np.float32)
        ref = np.asarray(mha_reference(jnp.asarray(q), jnp.asarray(k),
                                       jnp.asarray(v), causal=True))
        got = np.asarray(flash_interpret(jnp.asarray(q), jnp.asarray(k),
                                         jnp.asarray(v)))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_gqa_head_mapping(self):
        """With distinct kv heads, each q head must read its own group."""
        rng = np.random.default_rng(1)
        B, L, H, KV, hd = 1, 128, 4, 2, 128
        q = rng.normal(size=(B, L, H, hd)).astype(np.float32)
        k = rng.normal(size=(B, L, KV, hd)).astype(np.float32)
        v = rng.normal(size=(B, L, KV, hd)).astype(np.float32)
        ref = np.asarray(mha_reference(jnp.asarray(q), jnp.asarray(k),
                                       jnp.asarray(v), causal=True))
        got = np.asarray(flash_interpret(jnp.asarray(q), jnp.asarray(k),
                                         jnp.asarray(v)))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_bf16_inputs(self):
        rng = np.random.default_rng(2)
        B, L, H, KV, hd = 1, 128, 2, 1, 128
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, L, KV, hd)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, L, KV, hd)), jnp.bfloat16)
        ref = np.asarray(mha_reference(q, k, v, causal=True)).astype(np.float32)
        got = np.asarray(flash_interpret(q, k, v)).astype(np.float32)
        np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)


class TestLengthMasking:
    def test_lengths_match_reference(self):
        """Per-sample right-pad masking agrees with the jnp reference at
        valid query rows."""
        rng = np.random.default_rng(3)
        B, L, H, KV, hd = 2, 128, 2, 1, 128
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, L, KV, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, L, KV, hd)).astype(np.float32))
        lengths = jnp.asarray([100, 64], jnp.int32)
        from video3d_tpu.kernels.flash_attention import flash_attention

        got = np.asarray(flash_attention(q, k, v, lengths=lengths,
                                         block_q=64, block_k=64,
                                         interpret=True))
        ref = np.asarray(mha_reference(q, k, v, causal=True, kv_len=lengths))
        for b, n in enumerate([100, 64]):
            np.testing.assert_allclose(got[b, :n], ref[b, :n],
                                       rtol=2e-4, atol=2e-4)
        assert np.isfinite(got).all()   # padded rows finite (not NaN)


class TestBackward:
    def _setup(self, B=2, L=128, H=4, KV=2, hd=128, seed=5):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, L, KV, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, L, KV, hd)).astype(np.float32))
        lengths = jnp.asarray([L, 100][:B] if B > 1 else [L], jnp.int32)
        return q, k, v, lengths

    def test_grads_match_reference(self):
        from video3d_tpu.kernels.flash_attention import flash_attention

        q, k, v, lengths = self._setup()
        # loss reads only valid rows so padded-row garbage has zero cotangent
        row_mask = (jnp.arange(128)[None, :, None, None]
                    < lengths[:, None, None, None])

        def loss_flash(q, k, v):
            out = flash_attention(q, k, v, lengths=lengths, block_q=64,
                                  block_k=64, interpret=True)
            return jnp.sum((out * row_mask) ** 2)

        def loss_ref(q, k, v):
            out = mha_reference(q, k, v, causal=True, kv_len=lengths)
            return jnp.sum((out * row_mask) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, gf, gr in zip("qkv", g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       rtol=2e-3, atol=2e-3,
                                       err_msg=f"d{name}")

    def test_gqa_grad_accumulates_over_group(self):
        """dK/dV must sum contributions from all q heads in a group."""
        from video3d_tpu.kernels.flash_attention import flash_attention

        q, k, v, lengths = self._setup(B=1, H=4, KV=1)

        def loss_flash(k):
            out = flash_attention(q, k, v, lengths=lengths, block_q=64,
                                  block_k=64, interpret=True)
            return jnp.sum(out ** 2)

        def loss_ref(k):
            return jnp.sum(mha_reference(q, k, v, causal=True,
                                         kv_len=lengths) ** 2)

        gf = jax.grad(loss_flash)(k)
        gr = jax.grad(loss_ref)(k)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3)


class TestBlockPadding:
    """L not divisible by the requested blocks: the wrapper zero-pads the
    sequence up to a block multiple instead of shrinking blocks (shrinking
    ran the flagship 6784-token prefill at 128x128 blocks, ~40% MFU —
    BENCH_NOTES r3). Padded keys are masked via lengths; padded query rows
    are sliced off; the pad VJP zeroes their upstream grads."""

    @pytest.mark.parametrize("L,bq,bk", [(320, 256, 256), (192, 128, 128),
                                         (100, 64, 64)])
    def test_nondivisible_matches_reference(self, L, bq, bk):
        from video3d_tpu.kernels.flash_attention import flash_attention

        rng = np.random.default_rng(7)
        B, H, KV, hd = 2, 2, 1, 128
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, L, KV, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, L, KV, hd)).astype(np.float32))
        got = np.asarray(flash_attention(q, k, v, block_q=bq, block_k=bk,
                                         interpret=True))
        ref = np.asarray(mha_reference(q, k, v, causal=True))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
        assert np.isfinite(got).all()

    def test_nondivisible_with_lengths(self):
        from video3d_tpu.kernels.flash_attention import flash_attention

        rng = np.random.default_rng(8)
        B, L, H, KV, hd = 2, 320, 2, 1, 128
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, L, KV, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, L, KV, hd)).astype(np.float32))
        lengths = jnp.asarray([300, 200], jnp.int32)
        got = np.asarray(flash_attention(q, k, v, lengths=lengths,
                                         block_q=256, block_k=256,
                                         interpret=True))
        ref = np.asarray(mha_reference(q, k, v, causal=True, kv_len=lengths))
        for b, n in enumerate([300, 200]):
            np.testing.assert_allclose(got[b, :n], ref[b, :n],
                                       rtol=2e-4, atol=2e-4)
        assert np.isfinite(got).all()

    def test_nondivisible_grads_match_reference(self):
        from video3d_tpu.kernels.flash_attention import flash_attention

        rng = np.random.default_rng(9)
        B, L, H, KV, hd = 1, 320, 2, 1, 128
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, L, KV, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, L, KV, hd)).astype(np.float32))

        def loss_flash(q, k, v):
            out = flash_attention(q, k, v, block_q=256, block_k=256,
                                  interpret=True)
            return jnp.sum(out ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, gf, gr in zip("qkv", g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       rtol=2e-3, atol=2e-3,
                                       err_msg=f"d{name}")


class TestQueryOffsets:
    """Chunked cached prefill: an L-token query chunk at absolute positions
    q_offsets[b] + r attends an S-slot KV cache (S != L) with causal-by-
    position masking. This is the flash path kernels/attention.py::mha
    dispatches for multi-token cached chunks (the dense path materialized
    a (B, H, L, S) score tensor — 7 GB at the 4096 x 32768 flagship scale)."""

    def _setup(self, B=2, L=128, S=512, H=2, KV=1, hd=128, seed=11):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, S, KV, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, S, KV, hd)).astype(np.float32))
        offs = jnp.asarray([128, 300][:B], jnp.int32)
        kv_len = jnp.asarray([S, 400][:B], jnp.int32)
        qpos = offs[:, None] + jnp.arange(L)[None]
        return q, k, v, offs, kv_len, qpos

    def test_chunk_matches_reference(self):
        from video3d_tpu.kernels.flash_attention import flash_attention

        q, k, v, offs, kv_len, qpos = self._setup()
        got = np.asarray(flash_attention(q, k, v, lengths=kv_len,
                                         q_offsets=offs, block_q=64,
                                         block_k=64, interpret=True))
        ref = np.asarray(mha_reference(q, k, v, causal=True,
                                       q_positions=qpos, kv_len=kv_len))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
        assert np.isfinite(got).all()

    def test_multi_chunk_equals_full_prefill(self):
        """Running a 256-seq as two offset-128 chunks over a filled cache
        equals the one-shot causal prefill at the same rows."""
        from video3d_tpu.kernels.flash_attention import flash_attention

        rng = np.random.default_rng(12)
        B, S, H, KV, hd = 1, 256, 2, 2, 128
        q = jnp.asarray(rng.normal(size=(B, S, H, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, S, KV, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, S, KV, hd)).astype(np.float32))
        full = np.asarray(flash_attention(q, k, v, block_q=64, block_k=64,
                                          interpret=True))
        lens = jnp.full((B,), S, jnp.int32)
        for c0 in (0, 128):
            # cache beyond the chunk's own rows is masked causally, so
            # passing the fully-filled k/v is equivalent to a chunked fill
            part = np.asarray(flash_attention(
                q[:, c0:c0 + 128], k, v, lengths=lens,
                q_offsets=jnp.full((B,), c0, jnp.int32),
                block_q=64, block_k=64, interpret=True))
            np.testing.assert_allclose(part, full[:, c0:c0 + 128],
                                       rtol=2e-4, atol=2e-4)

    def test_offset_grads_match_reference(self):
        from video3d_tpu.kernels.flash_attention import flash_attention

        q, k, v, offs, kv_len, qpos = self._setup(B=1, L=64, S=256, seed=13)

        def loss_flash(q, k, v):
            out = flash_attention(q, k, v, lengths=kv_len, q_offsets=offs,
                                  block_q=64, block_k=64, interpret=True)
            return jnp.sum(out ** 2)

        def loss_ref(q, k, v):
            out = mha_reference(q, k, v, causal=True, q_positions=qpos,
                                kv_len=kv_len)
            return jnp.sum(out ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, gf, gr in zip("qkv", g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       rtol=2e-3, atol=2e-3,
                                       err_msg=f"d{name}")


class TestNonCausalHeadPad:
    """The SigLIP tower path: bidirectional attention at N = 729, hd = 72.
    The wrapper lane-pads the head dim (72 -> 128) and the sequence
    (729 -> block multiple, pad keys masked via the default lengths)."""

    def test_tower_shape_matches_reference(self):
        from video3d_tpu.kernels.flash_attention import flash_attention

        rng = np.random.default_rng(21)
        B, N, H, hd = 2, 729, 4, 72
        q = jnp.asarray(rng.normal(size=(B, N, H, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, N, H, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, N, H, hd)).astype(np.float32))
        got = np.asarray(flash_attention(q, k, v, causal=False, block_q=256,
                                         block_k=256, interpret=True))
        ref = np.asarray(mha_reference(q, k, v, causal=False))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
        assert np.isfinite(got).all()

    def test_tower_grads_match_reference(self):
        from video3d_tpu.kernels.flash_attention import flash_attention

        rng = np.random.default_rng(22)
        B, N, H, hd = 1, 320, 2, 72
        q = jnp.asarray(rng.normal(size=(B, N, H, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, N, H, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, N, H, hd)).astype(np.float32))

        def loss_flash(q, k, v):
            out = flash_attention(q, k, v, causal=False, block_q=64,
                                  block_k=64, interpret=True)
            return jnp.sum(out ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v, causal=False) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, gf, gr in zip("qkv", g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       rtol=2e-3, atol=2e-3,
                                       err_msg=f"d{name}")


class TestShardMapFlash:
    def test_sharded_forward_and_grad(self):
        """flash under shard_map on the 8-dev CPU mesh: output stays sharded
        and gradients match the reference (XLA would otherwise gather a
        pallas_call replicated)."""
        from jax import shard_map
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from video3d_tpu.kernels.flash_attention import flash_attention

        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                    ("dp", "fsdp", "tp"))
        B, L, H, KV, hd = 4, 128, 4, 2, 128
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, L, KV, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, L, KV, hd)).astype(np.float32))
        lens = jnp.asarray([L, 96, L, 64], jnp.int32)
        spec = P(("dp", "fsdp"), None, "tp", None)

        def local(qs, ks, vs, ls):
            return flash_attention(qs, ks, vs, lengths=ls, causal=True,
                                   block_q=64, block_k=64, interpret=True)

        smapped = shard_map(local, mesh=mesh,
                            in_specs=(spec, spec, spec, P(("dp", "fsdp"))),
                            out_specs=spec, check_vma=False)
        with mesh:
            out = jax.jit(smapped)(
                jax.device_put(q, NamedSharding(mesh, spec)),
                jax.device_put(k, NamedSharding(mesh, spec)),
                jax.device_put(v, NamedSharding(mesh, spec)), lens)
        assert "tp" in str(out.sharding.spec)
        ref = mha_reference(q, k, v, causal=True, kv_len=lens)
        rmask = np.arange(L)[None, :, None, None] < np.asarray(lens)[:, None, None, None]
        np.testing.assert_allclose(np.asarray(out) * rmask,
                                   np.asarray(ref) * rmask,
                                   rtol=2e-4, atol=2e-4)

        # gradient through shard_map
        msk = jnp.asarray(rmask)

        def loss(q, k, v):
            return jnp.sum((smapped(q, k, v, lens) * msk) ** 2)

        with mesh:
            gq = jax.jit(jax.grad(loss))(q, k, v)
        def ref_loss(q, k, v):
            return jnp.sum((mha_reference(q, k, v, causal=True, kv_len=lens) * msk) ** 2)
        gq_ref = jax.grad(ref_loss)(q, k, v)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_ref),
                                   rtol=2e-3, atol=2e-3)


class TestGqaFolded:
    """GQA-folded cached-chunk kernel (flash_attention_gqa_folded): the
    group's q heads ride the query-row dim so each KV head streams once.
    Must match the per-head reference exactly in semantics (same masking,
    same online softmax) for every (group, L, S, offsets) combination the
    serving path produces."""

    @pytest.mark.parametrize("H,KV,L", [(4, 2, 64), (6, 2, 64), (7, 7, 64),
                                        (8, 1, 128)])
    def test_matches_reference(self, H, KV, L):
        from video3d_tpu.kernels.flash_attention import (
            flash_attention_gqa_folded)

        rng = np.random.default_rng(21)
        B, S, hd = 2, 512, 128
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, S, KV, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, S, KV, hd)).astype(np.float32))
        offs = jnp.asarray([100, 257][:B], jnp.int32)
        kv_len = jnp.asarray([S, 333][:B], jnp.int32)
        qpos = offs[:, None] + jnp.arange(L)[None]
        got = np.asarray(flash_attention_gqa_folded(
            q, k, v, lengths=kv_len, q_offsets=offs,
            block_q=64, block_k=64, interpret=True))
        ref = np.asarray(mha_reference(q, k, v, causal=True,
                                       q_positions=qpos, kv_len=kv_len))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
        assert np.isfinite(got).all()

    def test_group_rows_span_q_blocks(self):
        """group*L not divisible by block_q: fold rows cross q-block
        boundaries mid-group and the pos_div masking must still hold."""
        from video3d_tpu.kernels.flash_attention import (
            flash_attention_gqa_folded)

        rng = np.random.default_rng(22)
        B, L, H, KV, S, hd = 1, 96, 3, 1, 256, 128   # LG = 288, bq = 64
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, S, KV, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, S, KV, hd)).astype(np.float32))
        offs = jnp.asarray([64], jnp.int32)
        kv_len = jnp.asarray([200], jnp.int32)
        qpos = offs[:, None] + jnp.arange(L)[None]
        got = np.asarray(flash_attention_gqa_folded(
            q, k, v, lengths=kv_len, q_offsets=offs,
            block_q=64, block_k=64, interpret=True))
        ref = np.asarray(mha_reference(q, k, v, causal=True,
                                       q_positions=qpos, kv_len=kv_len))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_int8_cache_streams_raw(self):
        """k_scale/v_scale path: int8 K/V + per-position f32 scales must
        match attention over the dequantized cache (dequant folds into the
        score scale / p.V weights in VMEM — decode_attention's contract)."""
        from video3d_tpu.kernels.flash_attention import (
            flash_attention_gqa_folded)

        rng = np.random.default_rng(23)
        B, L, H, KV, S, hd = 2, 64, 4, 2, 384, 128
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        k8 = jnp.asarray(rng.integers(-127, 128, size=(B, S, KV, hd))
                         .astype(np.int8))
        v8 = jnp.asarray(rng.integers(-127, 128, size=(B, S, KV, hd))
                         .astype(np.int8))
        ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, S, KV, 1))
                         .astype(np.float32))
        vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, S, KV, 1))
                         .astype(np.float32))
        offs = jnp.asarray([256, 300], jnp.int32)
        kv_len = jnp.asarray([320, S], jnp.int32)
        qpos = offs[:, None] + jnp.arange(L)[None]
        got = np.asarray(flash_attention_gqa_folded(
            q, k8, v8, lengths=kv_len, q_offsets=offs,
            k_scale=ks, v_scale=vs, block_q=64, block_k=128,
            interpret=True))
        ref = np.asarray(mha_reference(
            q, k8.astype(jnp.float32) * ks, v8.astype(jnp.float32) * vs,
            causal=True, q_positions=qpos, kv_len=kv_len))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


class TestMeshChunkedDispatch:
    """mha()'s shard_map mesh wrapper for cached MULTI-token chunks
    (attention.py: q_positions + L >= 64 under an active mesh). Before r3
    only L == 1 decode took the wrapper; a chunked prefill / suffix under
    tp fell back to dense (B, H, L, S) scores — an OOM at 32k context.
    On the CPU mesh the per-shard recursive mha() resolves to the jnp
    reference, so this validates the spec plumbing (head/batch splits,
    scale specs), not kernel numerics (tpu_check covers those on chip)."""

    def _data(self, rng, B, L, H, KV, hd, S):
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, S, KV, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, S, KV, hd)).astype(np.float32))
        offs = jnp.asarray(rng.integers(0, S - L, size=(B,)), jnp.int32)
        qpos = offs[:, None] + jnp.arange(L)[None]
        kv_len = jnp.minimum(offs + L, S).astype(jnp.int32)
        return q, k, v, qpos, kv_len

    def test_chunk_under_dp_tp_mesh(self):
        from jax.sharding import Mesh
        from video3d_tpu.kernels.attention import mha

        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                    ("dp", "tp"))
        rng = np.random.default_rng(31)
        q, k, v, qpos, kv_len = self._data(rng, 2, 64, 4, 2, 128, 256)
        with mesh:
            out = jax.jit(lambda *a: mha(a[0], a[1], a[2], causal=True,
                                         q_positions=a[3], kv_len=a[4]))(
                q, k, v, qpos, kv_len)
        ref = mha_reference(q, k, v, causal=True, q_positions=qpos,
                            kv_len=kv_len)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_chunk_int8_scales_under_tp_mesh(self):
        from jax.sharding import Mesh
        from video3d_tpu.kernels.attention import mha

        mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(1, 2),
                    ("dp", "tp"))
        rng = np.random.default_rng(32)
        B, L, H, KV, hd, S = 1, 64, 4, 2, 128, 192
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        k8 = jnp.asarray(rng.integers(-127, 128, (B, S, KV, hd)), jnp.int8)
        v8 = jnp.asarray(rng.integers(-127, 128, (B, S, KV, hd)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, S, KV, 1)),
                         jnp.float32)
        vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, S, KV, 1)),
                         jnp.float32)
        offs = jnp.asarray([100], jnp.int32)
        qpos = offs[:, None] + jnp.arange(L)[None]
        kv_len = jnp.asarray([164], jnp.int32)
        with mesh:
            out = jax.jit(lambda *a: mha(a[0], a[1], a[2], causal=True,
                                         q_positions=a[3], kv_len=a[4],
                                         k_scale=a[5], v_scale=a[6]))(
                q, k8, v8, qpos, kv_len, ks, vs)
        ref = mha_reference(q, k8.astype(jnp.float32) * ks,
                            v8.astype(jnp.float32) * vs, causal=True,
                            q_positions=qpos, kv_len=kv_len)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestSharedPrefix:
    """Shared-prefix split-softmax attention
    (flash_attention_shared_prefix): prefix pass (non-causal, all rows
    folded per kv head) + per-row causal suffix pass + exact lse merge.
    Must equal one softmax over [broadcast prefix ++ suffix] per row
    (mha_shared_prefix_reference)."""

    @pytest.mark.parametrize("H,KV,L,P,Ls", [
        (4, 2, 64, 512, 64),        # flagship-shaped (group 2)
        (7, 1, 64, 300, 64),        # group 7 (Qwen2-7B), ragged P
        (8, 8, 32, 256, 32),        # MHA (group 1)
        (6, 2, 80, 640, 96),        # L != Ls, rows cross q blocks
    ])
    def test_matches_reference(self, H, KV, L, P, Ls):
        from video3d_tpu.kernels.attention import mha_shared_prefix_reference
        from video3d_tpu.kernels.flash_attention import (
            flash_attention_shared_prefix)

        rng = np.random.default_rng(31)
        B, hd = 3, 128
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        pk = jnp.asarray(rng.normal(size=(P, KV, hd)).astype(np.float32))
        pv = jnp.asarray(rng.normal(size=(P, KV, hd)).astype(np.float32))
        sk = jnp.asarray(rng.normal(size=(B, Ls, KV, hd)).astype(np.float32))
        sv = jnp.asarray(rng.normal(size=(B, Ls, KV, hd)).astype(np.float32))
        # per-row ragged suffix lengths (one full, one short, one mid)
        slens = jnp.asarray([Ls, max(1, Ls // 3), max(1, Ls - 7)][:B],
                            jnp.int32)
        got = np.asarray(flash_attention_shared_prefix(
            q, pk, pv, sk, sv, slens, block_q_prefix=128, block_k=128,
            interpret=True))
        ref = np.asarray(mha_shared_prefix_reference(q, pk, pv, sk, sv,
                                                     slens))
        # compare only real rows (r < suffix_len): pad-query outputs are
        # garbage by contract
        for b in range(3):
            n = int(slens[b])
            np.testing.assert_allclose(got[b, :n], ref[b, :n],
                                       rtol=2e-4, atol=2e-4)
        assert np.isfinite(got[:, :1]).all()

    def test_int8_prefix_scales(self):
        from video3d_tpu.kernels.attention import mha_shared_prefix_reference
        from video3d_tpu.kernels.flash_attention import (
            flash_attention_shared_prefix)

        rng = np.random.default_rng(32)
        B, L, H, KV, P, Ls, hd = 2, 64, 4, 2, 384, 64, 128
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        pk8 = jnp.asarray(rng.integers(-127, 128, size=(P, KV, hd)),
                          jnp.int8)
        pv8 = jnp.asarray(rng.integers(-127, 128, size=(P, KV, hd)),
                          jnp.int8)
        pks = jnp.asarray(rng.uniform(0.005, 0.02, size=(P, KV, 1))
                          .astype(np.float32))
        pvs = jnp.asarray(rng.uniform(0.005, 0.02, size=(P, KV, 1))
                          .astype(np.float32))
        sk = jnp.asarray(rng.normal(size=(B, Ls, KV, hd)).astype(np.float32))
        sv = jnp.asarray(rng.normal(size=(B, Ls, KV, hd)).astype(np.float32))
        slens = jnp.asarray([Ls, 17], jnp.int32)
        got = np.asarray(flash_attention_shared_prefix(
            q, pk8, pv8, sk, sv, slens, pk_scale=pks, pv_scale=pvs,
            block_q_prefix=128, block_k=128, interpret=True))
        ref = np.asarray(mha_shared_prefix_reference(
            q, pk8, pv8, sk, sv, slens, pk_scale=pks, pv_scale=pvs))
        for b in range(2):
            n = int(slens[b])
            np.testing.assert_allclose(got[b, :n], ref[b, :n],
                                       rtol=2e-3, atol=2e-3)

    def test_dispatch_cpu_uses_reference(self):
        """mha_shared_prefix on the CPU backend must route to the oracle
        (and therefore agree with it bitwise)."""
        from video3d_tpu.kernels.attention import (mha_shared_prefix,
                                                   mha_shared_prefix_reference)

        rng = np.random.default_rng(33)
        B, L, H, KV, P, Ls, hd = 2, 16, 4, 2, 64, 16, 32
        q = jnp.asarray(rng.normal(size=(B, L, H, hd)).astype(np.float32))
        pk = jnp.asarray(rng.normal(size=(P, KV, hd)).astype(np.float32))
        pv = jnp.asarray(rng.normal(size=(P, KV, hd)).astype(np.float32))
        sk = jnp.asarray(rng.normal(size=(B, Ls, KV, hd)).astype(np.float32))
        sv = jnp.asarray(rng.normal(size=(B, Ls, KV, hd)).astype(np.float32))
        slens = jnp.asarray([Ls, Ls], jnp.int32)
        got = mha_shared_prefix(q, pk, pv, sk, sv, slens)
        ref = mha_shared_prefix_reference(q, pk, pv, sk, sv, slens)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
