"""Golden parity for every reference mm-projector variant
(/root/reference/llava/model/multimodal_projector/builder.py:32-65,
pooler_projector.py): build the reference torch module, convert its
state_dict with convert_projector, and compare project_features output —
plus an export round-trip back to the HF key layout."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from video3d_tpu.models.llava_video3d import init_projector, project_features
from video3d_tpu.models.weights import convert_projector

REF_DIR = "/root/reference/llava/model/multimodal_projector"
HAS_REF = os.path.exists(os.path.join(REF_DIR, "builder.py"))

IN_DIM, OUT_DIM = 24, 40


@pytest.fixture(scope="module")
def ref_builder():
    if not HAS_REF:
        pytest.skip("reference tree not mounted")
    pkg = types.ModuleType("refproj")
    pkg.__path__ = [REF_DIR]
    sys.modules["refproj"] = pkg
    for name in ("pooler_projector", "builder"):
        spec = importlib.util.spec_from_file_location(
            f"refproj.{name}", os.path.join(REF_DIR, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refproj.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refproj.builder"]


def _build_ref(ref_builder, projector_type, image_size=112, patch_size=14):
    import torch

    cfg = types.SimpleNamespace(mm_projector_type=projector_type,
                                mm_hidden_size=IN_DIM, hidden_size=OUT_DIM)
    vision_cfg = types.SimpleNamespace(image_size=image_size,
                                       patch_size=patch_size)
    torch.manual_seed(0)
    return ref_builder.build_vision_projector(cfg, vision_cfg=vision_cfg).eval()


def _compare(ref_mod, x_np, prefix=""):
    import torch

    with torch.no_grad():
        want = ref_mod(torch.from_numpy(x_np)).numpy()
    params = convert_projector(
        {k: v for k, v in ref_mod.state_dict().items()}, prefix=prefix)
    got = np.asarray(project_features(params, jnp.asarray(x_np)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    return params


class TestProjectorVariants:
    @pytest.mark.parametrize("ptype", [
        "linear", "mlp2x_gelu", "mlp3x_gelu", "mlp2x_res2x_gelu",
    ])
    def test_matches_reference(self, ref_builder, ptype):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 9, IN_DIM)).astype(np.float32)
        self._roundtrip(_compare(_build_ref(ref_builder, ptype), x), x)

    @pytest.mark.parametrize("hw", [8, 5])   # even grid + odd grid (floor rule)
    def test_pooler_matches_reference(self, ref_builder, hw):
        ref = _build_ref(ref_builder, "pooler", image_size=hw * 14,
                         patch_size=14)
        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, hw * hw, IN_DIM)).astype(np.float32)
        self._roundtrip(_compare(ref, x), x)

    def _roundtrip(self, params, x):
        """Export to HF keys and re-convert: output must be identical."""
        from video3d_tpu.config import LLMConfig
        from video3d_tpu.models import qwen2
        from video3d_tpu.models.weights import export_llava_checkpoint

        import jax

        tiny = LLMConfig.tiny()
        llm = qwen2.init_qwen2(jax.random.PRNGKey(0), tiny)
        state = export_llava_checkpoint({"llm": llm, "projector": params}, tiny)
        re_params = convert_projector(state)
        a = np.asarray(project_features(params, jnp.asarray(x)))
        b = np.asarray(project_features(re_params, jnp.asarray(x)))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    def test_identity(self):
        x = jnp.ones((1, 4, 8))
        assert (project_features({}, x) == x).all()

    @pytest.mark.parametrize("ptype", [
        "linear", "mlp2x_gelu", "mlp3x_gelu", "mlp2x_res2x_gelu", "pooler",
        "identity",
    ])
    def test_init_shapes_run(self, ptype):
        import jax

        p = init_projector(jax.random.PRNGKey(0), IN_DIM, OUT_DIM,
                           projector_type=ptype)
        n = 16 if ptype == "pooler" else 9
        y = project_features(p, jnp.ones((1, n, IN_DIM)))
        if ptype == "identity":
            assert y.shape == (1, n, IN_DIM)
        elif ptype == "pooler":
            assert y.shape == (1, 4, OUT_DIM)
        else:
            assert y.shape == (1, n, OUT_DIM)
