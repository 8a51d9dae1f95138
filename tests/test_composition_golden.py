"""Full-composition golden test: the reference's OWN model vs ours.

The strongest parity proof in the suite: the reference's real
``LlavaQwenForCausalLM`` (llava_qwen.py:45-205) — whose forward runs the
real ``prepare_inputs_labels_for_multimodal`` (llava_arch.py:336-836) and
the vendored 3-axis-mRoPE Qwen2 (qwen2/modeling_qwen2.py) — is imported
from /root/reference as a package, instantiated at tiny scale with random
weights on torch CPU, and driven on a 2-sample multimodal batch. The same
``state_dict()`` is converted into our pytree with
``models.weights.convert_llava_checkpoint`` and our full forward
(encode_video -> static splice plan -> qwen2) must reproduce its logits
and loss.

The tiny geometry keeps every production invariant intact:

* tower patch grid 27x27 (image 54 / patch 2) — satisfies the reference
  tower's hard 729-patch assert (siglip_encoder.py:582,587) and its
  delete-last-encoder-layer load rule (:570-571);
* bilinear stride-2 pool 27 -> 14 (llava_arch.py:191-210), grid-newline
  layout = 210 tokens/frame (:307-328);
* avg-27px coordinate pooling on full-res 384x384 world coords
  (:213-223), voxel discretization (:259-272), sin3d PE
  (position_encoding.py:5-49);
* head_dim 128 (the vendored rotary hard-codes mrope_section=[32,16,16],
  modeling_qwen2.py:162);
* B=2 with different text lengths — exercises the right-padding +
  splice-order contract (llava_arch.py:765-836) against our static plan.

Import note: the vendored qformer imports three helpers from
``transformers.modeling_utils`` that newer transformers moved to
``transformers.pytorch_utils``; a shim restores them before the package
import. Skipped when /root/reference is absent.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from video3d_tpu.config import LLMConfig, ModelConfig, VisionConfig  # noqa: E402
from video3d_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX  # noqa: E402
from video3d_tpu.models import llava_video3d as lv3d  # noqa: E402
from video3d_tpu.models.splice import build_splice_plan  # noqa: E402
from video3d_tpu.models.weights import convert_llava_checkpoint  # noqa: E402
from video3d_tpu.ops import geometry  # noqa: E402

REF = "/root/reference"

V = 2               # frames per scene
D_LLM = 256         # 2 heads x head_dim 128 (mrope_section constraint)
D_VIS = 32
VOCAB = 512

IDS = [
    [3, 4, 5, IMAGE_TOKEN_INDEX, 6, 7, 8, 9, 10, 11, 12, 13],
    [20, 21, IMAGE_TOKEN_INDEX, 22, 23, 24, 25],
]
LABELS = [
    [IGNORE_INDEX] * 9 + [11, 12, 13],
    [IGNORE_INDEX] * 4 + [23, 24, 25],
]


def _import_reference():
    """Import the reference package with the transformers compat shim."""
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pu, name))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from llava.model.language_model.llava_qwen import (LlavaQwenConfig,
                                                       LlavaQwenForCausalLM)
    from llava.model.multimodal_encoder.siglip_encoder import (
        SigLipVisionConfig, SigLipVisionModel, SigLipVisionTower)
    from llava.model.multimodal_projector.builder import build_vision_projector
    return (LlavaQwenConfig, LlavaQwenForCausalLM, SigLipVisionConfig,
            SigLipVisionModel, SigLipVisionTower, build_vision_projector)


@pytest.fixture(scope="module")
def pair():
    """(reference outputs, our logits/loss, plan) on the same tiny batch."""
    if not os.path.exists(os.path.join(REF, "llava")):
        pytest.skip("reference tree not mounted")
    (LlavaQwenConfig, LlavaQwenForCausalLM, SigLipVisionConfig,
     SigLipVisionModel, SigLipVisionTower, build_vision_projector) = \
        _import_reference()

    # --- reference model, tiny config, random weights ---------------------
    qcfg = LlavaQwenConfig(
        vocab_size=VOCAB, hidden_size=D_LLM, intermediate_size=384,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=1024, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager",
        use_cache=False)
    # 3D / multimodal knobs exactly as train_multi.sh persists them into
    # config.json (train_3d.py:1425-1475); world_position_embedding_type
    # must exist before LlavaQwenModel.__init__ builds the sine PE module
    # (llava_arch.py:49-65)
    qcfg.world_position_embedding_type = "avg-discrete-sin3d"
    qcfg.voxel_size = 0.1
    qcfg.min_xyz_range = [-15.0, -15.0, -5.0]
    qcfg.max_xyz_range = [15.0, 15.0, 5.0]
    qcfg.mm_patch_merge_type = "spatial_unpad"
    qcfg.mm_newline_position = "grid"
    qcfg.mm_spatial_pool_mode = "bilinear"
    qcfg.mm_spatial_pool_stride = 2
    qcfg.tokenizer_model_max_length = 2048
    qcfg.tokenizer_padding_side = "right"
    qcfg.image_aspect_ratio = "square"
    qcfg.add_faster_video = False

    torch.manual_seed(0)
    model = LlavaQwenForCausalLM(qcfg).float().eval()

    # vision tower: the tiny vendored SigLipVisionModel, attached the way
    # load_model wires it (siglip_encoder.py:568-575: delete last encoder
    # layer, pooling head -> Identity, frozen)
    sig_cfg = SigLipVisionConfig(
        hidden_size=D_VIS, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=54, patch_size=2)
    torch.manual_seed(1)
    vt_model = SigLipVisionModel(sig_cfg).float()
    del vt_model.vision_model.encoder.layers[-1:]
    vt_model.vision_model.head = nn.Identity()
    vt_model.requires_grad_(False)

    tower = SigLipVisionTower.__new__(SigLipVisionTower)
    nn.Module.__init__(tower)
    tower.vision_tower_name = "siglip-tiny"
    tower.config = sig_cfg
    tower.vision_tower = vt_model
    tower.is_loaded = True
    model.model.vision_tower = tower

    qcfg.mm_projector_type = "mlp2x_gelu"
    qcfg.mm_hidden_size = D_VIS
    torch.manual_seed(2)
    model.model.mm_projector = build_vision_projector(qcfg).float()
    model.model.image_newline = nn.Parameter(torch.randn(D_LLM) * 0.1)

    # --- shared inputs -----------------------------------------------------
    rng = np.random.default_rng(7)
    images = rng.normal(size=(2, V, 3, 54, 54)).astype(np.float32)
    world_coords = rng.uniform(-3.0, 4.9, size=(2, V, 384, 384, 3)) \
        .astype(np.float32)

    Lmax_text = max(len(x) for x in IDS)
    input_ids = torch.zeros((2, Lmax_text), dtype=torch.long)
    attn = torch.zeros((2, Lmax_text), dtype=torch.bool)
    labels_t = torch.full((2, Lmax_text), IGNORE_INDEX, dtype=torch.long)
    for i, (ids, lab) in enumerate(zip(IDS, LABELS)):
        input_ids[i, :len(ids)] = torch.tensor(ids)
        attn[i, :len(ids)] = True
        labels_t[i, :len(lab)] = torch.tensor(lab)

    video_dict = {
        "world_coords": torch.from_numpy(world_coords),
        "box_input": [],
    }
    images_list = [torch.from_numpy(images[i]) for i in range(2)]

    with torch.no_grad():
        ref = model(input_ids=input_ids, attention_mask=attn,
                    labels=labels_t, images=images_list,
                    modalities=["video", "video"], video_dict=video_dict,
                    use_cache=False, return_dict=True)

    # --- ours ---------------------------------------------------------------
    llm_cfg = LLMConfig(
        vocab_size=VOCAB, hidden_size=D_LLM, intermediate_size=384,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=128, rope_theta=10000.0, max_position_embeddings=1024,
        tie_word_embeddings=False)
    vis_cfg = VisionConfig(
        hidden_size=D_VIS, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=54, patch_size=2)
    cfg = ModelConfig(vision=vis_cfg, llm=llm_cfg)
    assert cfg.tokens_per_frame == 210  # 14 rows x (14 + newline)

    params = convert_llava_checkpoint(model.state_dict(), llm_cfg, vis_cfg,
                                      dtype=jnp.float32)

    spliced = [len(ids) - 1 + V * cfg.tokens_per_frame for ids in IDS]
    L = max(spliced)
    plan = build_splice_plan(IDS, LABELS, [V, V],
                             tokens_per_frame=cfg.tokens_per_frame,
                             max_len=L, grid_side=14)

    # same coordinate path as the reference: avg-pool 27px patches on the
    # full-res coords, then voxel-discretize
    wc = jnp.asarray(world_coords.reshape(2 * V, 384, 384, 3))
    pooled = geometry.average_coordinate_in_patch(wc, 27)
    vox = geometry.discrete_coords(pooled, (-15.0, -15.0, -5.0),
                                   (15.0, 15.0, 5.0), 0.1)
    batch = lv3d.Batch(
        images=jnp.asarray(images), patch_coords=vox.reshape(2, V, 14, 14, 3),
        text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
        vision_index=jnp.asarray(plan.vision_index),
        labels=jnp.asarray(plan.labels),
        position_ids=jnp.asarray(plan.position_ids),
        mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
        seq_len=jnp.asarray(plan.seq_len))

    logits = lv3d.forward(params, cfg, batch)
    loss = lv3d.language_model_loss(logits, jnp.asarray(plan.labels))
    return ref, np.asarray(logits), float(loss), plan


class TestCompositionGolden:
    def test_sequence_layout_matches(self, pair):
        """Our static splice plan realizes exactly the reference's spliced
        lengths and padded width."""
        ref, ours, _, plan = pair
        assert ref.logits.shape == ours.shape
        for i, ids in enumerate(IDS):
            assert int(plan.seq_len[i]) == len(ids) - 1 + V * 210

    def test_logits_match(self, pair):
        """Valid-position logits equal the reference's through the whole
        tower -> projector -> pool -> PE -> grid-newline -> splice -> Qwen2
        chain (f32, eager torch vs jax)."""
        ref, ours, _, plan = pair
        ref_np = ref.logits.float().numpy()
        for i in range(len(IDS)):
            n = int(plan.seq_len[i])
            np.testing.assert_allclose(ours[i, :n], ref_np[i, :n],
                                       rtol=2e-4, atol=2e-4)

    def test_loss_matches(self, pair):
        """Shifted-CE mean over valid targets equals the reference's
        (qwen2/modeling_qwen2.py:1196-1207)."""
        ref, _, loss, _ = pair
        np.testing.assert_allclose(loss, float(ref.loss), rtol=1e-4,
                                   atol=1e-5)
