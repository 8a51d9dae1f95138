"""Numerical parity of the JAX SigLIP tower against HF transformers
SiglipVisionModel (torch CPU) on a tiny random config, reproducing the
reference tower behavior: last layer dropped, raw hidden states out."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from video3d_tpu.config import VisionConfig
from video3d_tpu.models.siglip import vision_tower_forward, patchify
from video3d_tpu.models.weights import convert_siglip

# 3 HF layers; our tower runs the first 2 (reference deletes the last,
# siglip_encoder.py:570-571)
TINY_HF_LAYERS = 3
TINY = VisionConfig(hidden_size=32, intermediate_size=64,
                    num_hidden_layers=TINY_HF_LAYERS - 1,
                    num_attention_heads=4, image_size=42, patch_size=14)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(0)
    cfg = SiglipVisionConfig(
        hidden_size=TINY.hidden_size, intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY_HF_LAYERS,
        num_attention_heads=TINY.num_attention_heads,
        image_size=TINY.image_size, patch_size=TINY.patch_size,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=TINY.layer_norm_eps,
        attn_implementation="eager",
    )
    return SiglipVisionModel(cfg).eval()


class TestSigLIPParity:
    def test_features_match_hf_penultimate_hidden(self, hf_model):
        rng = np.random.default_rng(0)
        pixels = rng.normal(size=(2, 3, TINY.image_size, TINY.image_size)).astype(np.float32)
        with torch.no_grad():
            out = hf_model(torch.tensor(pixels), output_hidden_states=True)
        # hidden_states = (embeddings, layer1, layer2, layer3); the reference
        # tower with the last layer deleted returns index -1 of a 3-element
        # tuple == output of layer 2 == hidden_states[2] here.
        ref = out.hidden_states[TINY.num_hidden_layers].numpy()

        params = convert_siglip(hf_model.state_dict(), TINY)
        got = np.asarray(vision_tower_forward(params, jnp.asarray(pixels), TINY))
        assert got.shape == ref.shape == (2, 9, TINY.hidden_size)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_patchify_matches_conv(self, hf_model):
        """Patchify+matmul must equal the HF conv patch embedding."""
        rng = np.random.default_rng(1)
        pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
        conv = hf_model.vision_model.embeddings.patch_embedding
        with torch.no_grad():
            ref = conv(torch.tensor(pixels)).flatten(2).transpose(1, 2).numpy()
        w = conv.weight.detach().numpy().reshape(TINY.hidden_size, -1).T
        b = conv.bias.detach().numpy()
        got = np.asarray(patchify(jnp.asarray(pixels), 14)) @ w + b
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
