"""Golden parity against the REFERENCE'S OWN vendored code (not a
re-derivation): the custom Qwen2 with 3-axis mRoPE
(/root/reference/llava/model/language_model/qwen2/modeling_qwen2.py) run on
torch CPU with a tiny config, compared to our JAX decoder on identical
weights and (B, L, 3) position ids. Skipped when the reference tree is
absent."""

import importlib.util
import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from video3d_tpu.config import LLMConfig
from video3d_tpu.models import qwen2
from video3d_tpu.models.weights import convert_qwen2

REF_QWEN = "/root/reference/llava/model/language_model/qwen2/modeling_qwen2.py"
HAS_REF = os.path.exists(REF_QWEN)

# the reference hard-codes mrope_section=[32,16,16] -> head_dim must be 128
TINY = LLMConfig(vocab_size=128, hidden_size=512, intermediate_size=256,
                 num_hidden_layers=2, num_attention_heads=4,
                 num_key_value_heads=2, head_dim=128,
                 rope_theta=10000.0, max_position_embeddings=512,
                 mrope_section=(32, 16, 16))


@pytest.fixture(scope="module")
def ref_model():
    if not HAS_REF:
        pytest.skip("reference tree not mounted")
    sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location("ref_qwen2", REF_QWEN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from transformers import Qwen2Config

    cfg = Qwen2Config(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        num_key_value_heads=TINY.num_key_value_heads,
        max_position_embeddings=TINY.max_position_embeddings,
        rope_theta=TINY.rope_theta, rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=False, attn_implementation="eager",
        use_cache=False)
    torch.manual_seed(0)
    return mod.Qwen2ForCausalLM(cfg).eval()


class TestReferenceGolden:
    def test_default_3axis_ids_match(self, ref_model):
        """The reference builds replicated (B, L, 3) ids by default
        (modeling_qwen2.py:997-1004); our decoder must match its logits."""
        params = convert_qwen2(ref_model.state_dict(), TINY)
        rng = np.random.default_rng(0)
        ids = rng.integers(0, TINY.vocab_size, size=(2, 7))
        with torch.no_grad():
            ref = ref_model(torch.tensor(ids), use_cache=False).logits.numpy()
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        pos = jnp.broadcast_to(jnp.arange(7)[None, :, None], (2, 7, 3))
        hidden, _ = qwen2.qwen2_forward(params, TINY, embeds, pos)
        got = np.asarray(qwen2.lm_head(params, hidden))
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)

    def test_true_mrope_voxel_ids_match(self, ref_model):
        """Distinct per-axis voxel ids through the reference's hard-coded
        [32,16,16] section split (modeling_qwen2.py:141-173) vs ours."""
        params = convert_qwen2(ref_model.state_dict(), TINY)
        rng = np.random.default_rng(1)
        ids = rng.integers(0, TINY.vocab_size, size=(1, 9))
        pos = rng.integers(0, 300, size=(1, 9, 3))
        with torch.no_grad():
            ref = ref_model(torch.tensor(ids),
                            position_ids=torch.tensor(pos),
                            use_cache=False).logits.numpy()
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        hidden, _ = qwen2.qwen2_forward(params, TINY, embeds, jnp.asarray(pos))
        got = np.asarray(qwen2.lm_head(params, hidden))
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


class TestReferencePEGolden:
    def test_sin3d_matches_reference_module(self):
        """PositionEmbeddingSine3D imported from the reference itself."""
        if not os.path.exists("/root/reference/llava/model/position_encoding.py"):
            pytest.skip("reference tree not mounted")
        spec = importlib.util.spec_from_file_location(
            "ref_pe", "/root/reference/llava/model/position_encoding.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        from video3d_tpu.ops.pos_embed import sin3d_position_embedding

        rng = np.random.default_rng(2)
        for D, n_points in ((3584, 1), (3584, 2), (512, 1)):
            pe = mod.PositionEmbeddingSine3D(D, n_points=n_points)
            shape = (2, 5, n_points, 3) if n_points > 1 else (2, 5, 3)
            coords = rng.uniform(0, 300, size=shape).astype(np.float32)
            with torch.no_grad():
                ref = pe(torch.tensor(coords)).numpy()
            got = np.asarray(sin3d_position_embedding(
                jnp.asarray(coords), D, n_points=n_points))
            np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4,
                                       err_msg=f"D={D} n={n_points}")
