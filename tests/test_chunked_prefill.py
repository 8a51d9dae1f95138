"""ChunkedPrefill (models/generate.py): running the prefill in bounded
chunks through the cached-attention path must produce a DecodeState
equivalent to the atomic start_decode — logits and subsequent greedy
decode identical — for chunk sizes that do and don't divide the padded
length, and under the engine's int8 KV mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.config import ModelConfig
from video3d_tpu.constants import IMAGE_TOKEN_INDEX
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models.generate import (ChunkedPrefill, decode_chunk,
                                         start_decode)
from video3d_tpu.models.splice import build_splice_plan

CFG = ModelConfig.tiny()


@pytest.fixture(scope="module")
def setup():
    params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    B, V, S = 1, 2, CFG.vision.image_size
    images = rng.normal(size=(B, V, 3, S, S)).astype(np.float32)
    g = -(-CFG.vision.num_patches_per_side // CFG.spatial_pool_stride)
    coords = rng.uniform(0, 50, size=(B, V, g, g, 3)).astype(np.float32)
    T = CFG.tokens_per_frame
    ids = [3, 4, IMAGE_TOKEN_INDEX, 5, 6, 8, 9, 10, 11]
    L = 64
    plan = build_splice_plan([ids], None, [V], tokens_per_frame=T,
                             max_len=L, grid_side=g)
    batch = lv3d.Batch(
        images=jnp.asarray(images), patch_coords=jnp.asarray(coords),
        text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
        vision_index=jnp.asarray(plan.vision_index),
        labels=jnp.asarray(plan.labels),
        position_ids=jnp.asarray(plan.position_ids),
        mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
        seq_len=jnp.asarray(plan.seq_len))
    return params, batch


@pytest.mark.parametrize("chunk_len", [16, 24, 64, 128])
def test_matches_start_decode(setup, chunk_len):
    params, batch = setup
    # fresh buffers: DecodeState.pos aliases batch.seq_len and
    # decode_chunk donates its state (would delete the shared fixture)
    batch = batch._replace(seq_len=batch.seq_len + 0)
    mcl = 96
    want = start_decode(params, CFG, batch, max_cache_len=mcl)

    cp = ChunkedPrefill(params, CFG, batch, max_cache_len=mcl,
                        chunk_len=chunk_len)
    steps = 0
    while not cp.step():
        steps += 1
        assert steps <= cp.total_steps
    got = cp.result()

    np.testing.assert_allclose(np.asarray(got.next_logits),
                               np.asarray(want.next_logits),
                               rtol=2e-2, atol=2e-2)
    assert int(np.argmax(got.next_logits[0])) == \
        int(np.argmax(want.next_logits[0]))
    # identical greedy continuation (the actual contract)
    _, toks_a = decode_chunk(params, CFG, want, chunk=8, eos_token_id=-1)
    _, toks_b = decode_chunk(params, CFG, got, chunk=8, eos_token_id=-1)
    assert np.array_equal(np.asarray(toks_a), np.asarray(toks_b))


def test_int8_cache_mode(setup):
    params, batch = setup
    batch = batch._replace(seq_len=batch.seq_len + 0)
    mcl = 96
    want = start_decode(params, CFG, batch, max_cache_len=mcl,
                        cache_dtype=jnp.int8)
    cp = ChunkedPrefill(params, CFG, batch, max_cache_len=mcl,
                        chunk_len=16, cache_dtype=jnp.int8)
    while not cp.step():
        pass
    got = cp.result()
    _, toks_a = decode_chunk(params, CFG, want, chunk=8, eos_token_id=-1)
    _, toks_b = decode_chunk(params, CFG, got, chunk=8, eos_token_id=-1)
    assert np.array_equal(np.asarray(toks_a), np.asarray(toks_b))
