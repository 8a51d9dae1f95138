"""Padded-sequence tower fast path (pad_seq_to) equals the unpadded run.

The 729-patch so400m sequence can be zero-padded to an MXU-aligned 768
(VERDICT r2 #7); pad keys are masked out of every softmax with a -1e30
score bias so real-token outputs are unchanged up to reduction-tree
rounding (softmax sums group 768 vs 729 terms differently; the extra
terms are exact zeros). Reference tower contract: hidden_states[-1] of
/root/reference/llava/model/multimodal_encoder/siglip_encoder.py:570-589.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video3d_tpu.config import VisionConfig
from video3d_tpu.models import siglip


@pytest.fixture(scope="module")
def small_tower():
    cfg = dataclasses.replace(VisionConfig(), num_hidden_layers=3)
    params = siglip.init_vision_tower(jax.random.PRNGKey(0), cfg, jnp.float32)
    px = jax.random.normal(jax.random.PRNGKey(1),
                           (2, 3, cfg.image_size, cfg.image_size))
    return cfg, params, px


def test_pad768_matches_unpadded_f32(small_tower):
    cfg, params, px = small_tower
    a = np.asarray(siglip.vision_tower_forward(params, px, cfg))
    b = np.asarray(siglip.vision_tower_forward(params, px, cfg,
                                               pad_seq_to=768))
    assert b.shape == a.shape == (2, cfg.num_patches, cfg.hidden_size)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=3e-6)


def test_pad768_matches_unpadded_bf16(small_tower):
    cfg, params, px = small_tower
    pb = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    a = np.asarray(siglip.vision_tower_forward(pb, px, cfg)
                   .astype(jnp.float32))
    b = np.asarray(siglip.vision_tower_forward(pb, px, cfg, pad_seq_to=768)
                   .astype(jnp.float32))
    # bf16 activations: one ulp at the observed magnitudes
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
    assert np.abs(a - b).mean() < 2e-3


def test_pad_noop_when_not_larger(small_tower):
    cfg, params, px = small_tower
    a = np.asarray(siglip.vision_tower_forward(params, px, cfg))
    b = np.asarray(siglip.vision_tower_forward(params, px, cfg,
                                               pad_seq_to=cfg.num_patches))
    assert np.array_equal(a, b)
