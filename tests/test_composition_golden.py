"""Full-composition golden tests: the reference's OWN model vs ours.

The strongest parity proof in the suite: the reference's real
``LlavaQwenForCausalLM`` (llava_qwen.py:45-205) — whose forward runs the
real ``prepare_inputs_labels_for_multimodal`` (llava_arch.py:336-836) and
the vendored 3-axis-mRoPE Qwen2 (qwen2/modeling_qwen2.py) — is imported
from /root/reference as a package, instantiated at tiny scale with random
weights on torch CPU, and driven on multimodal batches. The same
``state_dict()`` is converted into our pytree with
``models.weights.convert_llava_checkpoint`` and our forwards must
reproduce its outputs:

* base: sin3d voxel PE, B=2 with different text lengths (right padding +
  splice order, llava_arch.py:765-836) — logits + LM loss;
* mrope: 3-axis voxel position ids incl. the zeroed newline column
  (llava_arch.py:719-729) — logits;
* <coord>: Scan2Cap box-input PE added at the coord token
  (llava_arch.py:697-700) — logits;
* grounding: use_object_proposals — patch membership masks, masked-mean
  object features + box-center PE, infonce scores and loss
  (llava_arch.py:351-378,:479-501 + llava_qwen.py:239-331).

The tiny geometry keeps every production invariant intact: 27x27 tower
patch grid (image 54 / patch 2 -> the reference tower's hard 729-patch
assert, siglip_encoder.py:582), bilinear stride-2 pool to 14x14, grid
newline = 210 tokens/frame, avg-27px coordinate pooling on full-res
384x384 world coords, voxel discretize, head_dim 128 (the vendored
rotary hard-codes mrope_section=[32,16,16], modeling_qwen2.py:162).

Import note: the vendored qformer imports three helpers from
``transformers.modeling_utils`` that newer transformers moved to
``transformers.pytorch_utils``; a shim restores them before the package
import. Skipped when /root/reference is absent.
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from video3d_tpu.config import (LLMConfig, ModelConfig, PosEmbedType,  # noqa: E402
                                VisionConfig)
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
GROUND_ID = 500
COORD_ID = 499

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

    # Other golden tests (test_anyres / test_hf_vision / test_preprocess_
    # golden) register a plain-ModuleType "llava" stub so they can exec
    # single reference FILES without the package's heavy __init__. A stub
    # has no __path__, so importing the real package through it fails with
    # "'llava' is not a package" — purge stub entries first (suite-order
    # dependent: only hit when those files run before this one).
    stub = sys.modules.get("llava")
    if stub is not None and not hasattr(stub, "__path__"):
        for name in [m for m in sys.modules
                     if m == "llava" or m.startswith("llava.")]:
            del sys.modules[name]

    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pu, name))
    from transformers.cache_utils import DynamicCache

    if not hasattr(DynamicCache, "get_usable_length"):
        # removed in newer transformers; for non-sliding caches it returned
        # the current past length
        DynamicCache.get_usable_length = (
            lambda self, new_seq_length, layer_idx=0:
            self.get_seq_length(layer_idx))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from llava.model.language_model.llava_qwen import (LlavaQwenConfig,
                                                       LlavaQwenForCausalLM)
    from llava.model.multimodal_encoder.siglip_encoder import (
        SigLipVisionConfig, SigLipVisionModel, SigLipVisionTower)
    from llava.model.multimodal_projector.builder import build_vision_projector
    return (LlavaQwenConfig, LlavaQwenForCausalLM, SigLipVisionConfig,
            SigLipVisionModel, SigLipVisionTower, build_vision_projector)


class Harness:
    """One tiny reference model + the converted pytree + shared inputs."""

    def __init__(self):
        (LlavaQwenConfig, LlavaQwenForCausalLM, SigLipVisionConfig,
         SigLipVisionModel, SigLipVisionTower, build_vision_projector) = \
            _import_reference()

        qcfg = LlavaQwenConfig(
            vocab_size=VOCAB, hidden_size=D_LLM, intermediate_size=384,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, max_position_embeddings=1024,
            rope_theta=10000.0, rms_norm_eps=1e-6,
            tie_word_embeddings=False, attn_implementation="eager",
            use_cache=False)
        # 3D / multimodal knobs exactly as train_multi.sh persists them
        # into config.json (train_3d.py:1425-1475); these must exist before
        # LlavaQwenModel.__init__ builds the sine PE + ground head modules
        # (llava_arch.py:49-65, llava_qwen.py:57-113)
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
        qcfg.ground_head_type = "infonce"
        qcfg.ground_head_temperature = 0.07
        qcfg.ground_token_ids = [GROUND_ID]
        qcfg.coord_token_ids = [COORD_ID]
        qcfg.object_feature_type = "patch14-pe"

        torch.manual_seed(0)
        model = LlavaQwenForCausalLM(qcfg).float().eval()

        # vision tower: tiny vendored SigLipVisionModel, wired the way
        # load_model does (siglip_encoder.py:568-575: delete last encoder
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
        self.model = model

        # --- ours ----------------------------------------------------------
        self.llm_cfg = LLMConfig(
            vocab_size=VOCAB, hidden_size=D_LLM, intermediate_size=384,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, head_dim=128, rope_theta=10000.0,
            max_position_embeddings=1024, tie_word_embeddings=False)
        vis_cfg = VisionConfig(
            hidden_size=D_VIS, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=54, patch_size=2)
        self.cfg = ModelConfig(vision=vis_cfg, llm=self.llm_cfg)
        assert self.cfg.tokens_per_frame == 210  # 14 rows x (14 + newline)
        self.params = convert_llava_checkpoint(
            model.state_dict(), self.llm_cfg, vis_cfg, dtype=jnp.float32,
            ground_head=True)

        # --- shared inputs --------------------------------------------------
        rng = np.random.default_rng(7)
        self.images = rng.normal(size=(2, V, 3, 54, 54)).astype(np.float32)
        self.world_coords = rng.uniform(
            -3.0, 4.9, size=(2, V, 384, 384, 3)).astype(np.float32)
        # same coordinate path as the reference: avg-pool 27px patches on
        # the full-res coords, then voxel-discretize
        wc = jnp.asarray(self.world_coords.reshape(2 * V, 384, 384, 3))
        pooled = geometry.average_coordinate_in_patch(wc, 27)
        self.vox = np.asarray(
            geometry.discrete_coords(pooled, (-15.0, -15.0, -5.0),
                                     (15.0, 15.0, 5.0), 0.1)
        ).reshape(2, V, 14, 14, 3)

    # -- torch-side helpers ------------------------------------------------

    def ref_forward(self, ids_list, labels_list, scene_idx, **extra):
        B = len(ids_list)
        Lt = max(len(x) for x in ids_list)
        input_ids = torch.zeros((B, Lt), dtype=torch.long)
        attn = torch.zeros((B, Lt), dtype=torch.bool)
        labels_t = torch.full((B, Lt), IGNORE_INDEX, dtype=torch.long)
        for i, (ids, lab) in enumerate(zip(ids_list, labels_list)):
            input_ids[i, :len(ids)] = torch.tensor(ids)
            attn[i, :len(ids)] = True
            labels_t[i, :len(lab)] = torch.tensor(lab)
        video_dict = {
            "world_coords": torch.from_numpy(self.world_coords[scene_idx]),
            "box_input": extra.pop("box_input", []),
        }
        if "objects" in extra:
            video_dict["objects"] = extra.pop("objects")
        images_list = [torch.from_numpy(self.images[i]) for i in scene_idx]
        with torch.no_grad():
            return self.model(
                input_ids=input_ids, attention_mask=attn, labels=labels_t,
                images=images_list, modalities=["video"] * B,
                video_dict=video_dict, use_cache=False, return_dict=True,
                **extra)

    # -- our-side helpers ---------------------------------------------------

    def plan_and_batch(self, ids_list, labels_list, scene_idx, cfg=None,
                       coord_token_id=None, box_input=None):
        cfg = cfg or self.cfg
        scene_idx = list(scene_idx)
        spliced = [len(ids) - 1 + V * cfg.tokens_per_frame
                   for ids in ids_list]
        mrope = None
        if cfg.world_3d.pos_embed == PosEmbedType.MROPE:
            mrope = [self.vox[i] for i in scene_idx]
        plan = build_splice_plan(ids_list, labels_list, [V] * len(ids_list),
                                 tokens_per_frame=cfg.tokens_per_frame,
                                 max_len=max(spliced), grid_side=14,
                                 mrope_coords=mrope,
                                 coord_token_id=coord_token_id)
        batch = lv3d.Batch(
            images=jnp.asarray(self.images[scene_idx]),
            patch_coords=jnp.asarray(self.vox[scene_idx]),
            text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
            vision_index=jnp.asarray(plan.vision_index),
            labels=jnp.asarray(plan.labels),
            position_ids=jnp.asarray(plan.position_ids),
            mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
            seq_len=jnp.asarray(plan.seq_len),
            coord_mask=(jnp.asarray(plan.coord_mask)
                        if coord_token_id is not None else None),
            box_input=box_input)
        return plan, batch


@pytest.fixture(scope="module")
def H():
    if not os.path.exists(os.path.join(REF, "llava")):
        pytest.skip("reference tree not mounted")
    return Harness()


class TestCompositionGolden:
    def test_base_logits_and_loss(self, H):
        """sin3d path, B=2, different text lengths: valid-position logits
        and the LM loss equal the reference's through the whole tower ->
        projector -> pool -> PE -> grid-newline -> splice -> Qwen2 chain."""
        ref = H.ref_forward(IDS, LABELS, [0, 1])
        plan, batch = H.plan_and_batch(IDS, LABELS, [0, 1])
        logits = np.asarray(lv3d.forward(H.params, H.cfg, batch))
        loss = float(lv3d.language_model_loss(logits,
                                              jnp.asarray(plan.labels)))
        ref_np = ref.logits.float().numpy()
        assert ref_np.shape == logits.shape
        for i, ids in enumerate(IDS):
            n = int(plan.seq_len[i])
            assert n == len(ids) - 1 + V * 210
            np.testing.assert_allclose(logits[i, :n], ref_np[i, :n],
                                       rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(loss, float(ref.loss), rtol=1e-4,
                                   atol=1e-5)

    def test_mrope_logits(self, H):
        """3-axis mRoPE position ids (voxel ids for vision tokens with the
        zeroed newline column, llava_arch.py:711-729) through the vendored
        rotary's [32,16,16] section split."""
        H.model.config.world_position_embedding_type = "avg-discrete-mrope"
        try:
            ref = H.ref_forward(IDS, LABELS, [0, 1])
        finally:
            H.model.config.world_position_embedding_type = \
                "avg-discrete-sin3d"
        cfg = dataclasses.replace(
            H.cfg, world_3d=dataclasses.replace(
                H.cfg.world_3d, pos_embed=PosEmbedType.MROPE))
        plan, batch = H.plan_and_batch(IDS, LABELS, [0, 1], cfg=cfg)
        logits = np.asarray(lv3d.forward(H.params, cfg, batch))
        ref_np = ref.logits.float().numpy()
        for i in range(len(IDS)):
            n = int(plan.seq_len[i])
            np.testing.assert_allclose(logits[i, :n], ref_np[i, :n],
                                       rtol=2e-4, atol=2e-4)

    def test_coord_token_pe(self, H):
        """Scan2Cap <coord> input PE: the box-center sine embedding is
        added to the coord token's text embedding (llava_arch.py:697-700)."""
        ids = [[40, 41, COORD_ID, 42, IMAGE_TOKEN_INDEX, 43, 44, 45]]
        lab = [[IGNORE_INDEX] * 6 + [44, 45]]
        center = np.array([[1.5, -0.5, 2.0]], dtype=np.float32)
        ref = H.ref_forward(ids, lab, [0],
                            box_input=torch.from_numpy(center))
        vox_center = geometry.discrete_coords(
            jnp.asarray(center), (-15.0, -15.0, -5.0), (15.0, 15.0, 5.0), 0.1)
        plan, batch = H.plan_and_batch(ids, lab, [0],
                                       coord_token_id=COORD_ID,
                                       box_input=vox_center)
        assert plan.coord_mask.sum() == 1
        logits = np.asarray(lv3d.forward(H.params, H.cfg, batch))
        n = int(plan.seq_len[0])
        np.testing.assert_allclose(logits[0, :n],
                                   ref.logits.float().numpy()[0, :n],
                                   rtol=2e-4, atol=2e-4)

    def test_grounding_scores_and_loss(self, H):
        """Discriminative grounding: patch membership masks on the raw 729
        grid, masked-mean object features + box-center PE, infonce cosine
        scores with the zero-target slot, and the InfoNCE loss
        (llava_arch.py:351-378,:479-501; llava_qwen.py:283-308)."""
        ids = [[30, 31, IMAGE_TOKEN_INDEX, 32, 33, GROUND_ID]]
        lab = [[IGNORE_INDEX] * 5 + [GROUND_ID]]
        boxes = np.array([
            [1.0, 1.0, 1.0, 6.0, 6.0, 6.0],     # covers many patches
            [-1.0, 2.0, 0.5, 5.0, 5.0, 5.0],
            [12.0, 12.0, 4.0, 0.5, 0.5, 0.5],   # empty -> zero feature
        ], dtype=np.float32)
        ref_loss, ref_scores = H.ref_forward(
            ids, lab, [0], objects=[torch.from_numpy(boxes)],
            use_object_proposals=True, box_labels=[[1]])

        plan, batch = H.plan_and_batch(ids, lab, [0])
        slot = int(np.argmax(plan.labels[0] == GROUND_ID))
        scores = lv3d.grounding_forward(
            H.params, H.cfg, batch, jnp.asarray(H.world_coords[0]),
            jnp.asarray(boxes), jnp.ones((3,), bool), jnp.asarray(slot))
        np.testing.assert_allclose(np.asarray(scores),
                                   ref_scores.float().numpy(),
                                   rtol=2e-4, atol=2e-4)
        target = np.zeros(4, np.float32)
        target[1] = 1.0
        loss = float(lv3d.infonce_loss(scores, jnp.asarray(target),
                                       H.cfg.ground_head_temperature))
        np.testing.assert_allclose(loss, float(ref_loss), rtol=1e-4,
                                   atol=1e-5)

    def test_gradients_match(self, H):
        """Training backward: d(loss)/d(param) through the whole multimodal
        chain equals torch autograd on the reference model — projector,
        image_newline, lm_head, embed_tokens, and a decoder q_proj."""
        ref = H.ref_forward(IDS, LABELS, [0, 1])
        H.model.zero_grad(set_to_none=True)
        # re-run with grad enabled (ref_forward is no_grad)
        Lt = max(len(x) for x in IDS)
        input_ids = torch.zeros((2, Lt), dtype=torch.long)
        attn = torch.zeros((2, Lt), dtype=torch.bool)
        labels_t = torch.full((2, Lt), IGNORE_INDEX, dtype=torch.long)
        for i, (ids, lab) in enumerate(zip(IDS, LABELS)):
            input_ids[i, :len(ids)] = torch.tensor(ids)
            attn[i, :len(ids)] = True
            labels_t[i, :len(lab)] = torch.tensor(lab)
        out = H.model(
            input_ids=input_ids, attention_mask=attn, labels=labels_t,
            images=[torch.from_numpy(H.images[i]) for i in range(2)],
            modalities=["video", "video"],
            video_dict={"world_coords": torch.from_numpy(H.world_coords),
                        "box_input": []},
            use_cache=False, return_dict=True)
        assert torch.allclose(out.loss, ref.loss)
        out.loss.backward()

        plan, batch = H.plan_and_batch(IDS, LABELS, [0, 1])

        def loss_fn(p):
            logits = lv3d.forward(p, H.cfg, batch)
            return lv3d.language_model_loss(logits, jnp.asarray(plan.labels))

        grads = jax.grad(loss_fn)(H.params)
        m = H.model
        pairs = [
            (grads["projector"]["w1"],
             m.model.mm_projector[0].weight.grad.T),
            (grads["image_newline"], m.model.image_newline.grad),
            (grads["llm"]["lm_head"], m.lm_head.weight.grad.T),
            (grads["llm"]["embed_tokens"], m.model.embed_tokens.weight.grad),
            (grads["llm"]["layers"][0]["attn"]["wq"],
             m.model.layers[0].self_attn.q_proj.weight.grad.T),
        ]
        for ours_g, ref_g in pairs:
            np.testing.assert_allclose(np.asarray(ours_g),
                                       ref_g.float().numpy(),
                                       rtol=5e-4, atol=5e-6)

    def test_greedy_decode_matches(self, H):
        """KV-cache greedy decode: our prefill + while_loop decode emits the
        same tokens as a torch greedy loop over the reference forward (whose
        prepare() passes length-1 steps straight through, skipping the PE
        branch — llava_arch.py:437)."""
        from video3d_tpu.models import generate as gen

        ids = [IDS[0]]
        lab = [[IGNORE_INDEX] * len(IDS[0])]
        steps, eos = 12, VOCAB - 1

        input_ids = torch.tensor(ids)
        attn = torch.ones_like(input_ids, dtype=torch.bool)
        toks = []
        with torch.no_grad():
            out = H.model(
                input_ids=input_ids, attention_mask=attn,
                images=[torch.from_numpy(H.images[0])], modalities=["video"],
                video_dict={"world_coords":
                            torch.from_numpy(H.world_coords[:1]),
                            "box_input": []},
                use_cache=True, return_dict=True)
            past = out.past_key_values
            n_spliced = out.logits.shape[1]
            tok = int(out.logits[0, -1].argmax())
            for t in range(steps):
                toks.append(tok)
                if tok == eos:
                    break
                pos = torch.full((1, 1, 3), n_spliced + t, dtype=torch.long)
                out = H.model(input_ids=torch.tensor([[tok]]),
                              position_ids=pos, past_key_values=past,
                              use_cache=True, return_dict=True)
                past = out.past_key_values
                tok = int(out.logits[0, -1].argmax())

        plan, batch = H.plan_and_batch(ids, lab, [0])
        state = gen.start_decode(H.params, H.cfg, batch,
                                 max_cache_len=n_spliced + steps + 1,
                                 cache_dtype=jnp.float32)
        res = gen.generate_from_state(H.params, H.cfg, state,
                                      max_new_tokens=steps,
                                      eos_token_id=eos)
        # res.tokens is the emission stream, eos-padded once done — pad the
        # torch stream the same way and compare verbatim
        ref_padded = (toks + [eos] * steps)[:steps]
        ours_padded = [int(t) for t in np.asarray(res.tokens[0])]
        assert ours_padded == ref_padded
