"""Integration tests for the full model assembly: grid-newline token layout,
static splice plan, object patch masks, grounding scores/loss — each checked
against a literal torch/numpy re-derivation of the reference formulas."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from video3d_tpu.config import ModelConfig, ObjectFeatureType
from video3d_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.models import qwen2
from video3d_tpu.models.splice import (KIND_PAD, KIND_TEXT, KIND_VISION,
                                       build_splice_plan)

CFG = ModelConfig.tiny()


def torch_add_token_per_grid(image_feature, image_newline):
    """Literal re-derivation of llava_arch.py:307-328."""
    import math

    resize_h = int(math.sqrt(image_feature.shape[1]))
    num_frames = image_feature.shape[0]
    x = image_feature.view(num_frames, 1, resize_h, resize_h, -1)
    x = x.permute(4, 0, 2, 1, 3).contiguous()
    x = x.flatten(1, 2).flatten(2, 3)
    x = torch.cat((x, image_newline[:, None, None].expand(*x.shape[:-1], 1)), dim=-1)
    return x.flatten(1, 2).transpose(0, 1)


class TestGridNewlineLayout:
    def test_matches_reference_ordering(self):
        """encode_video's spliceable layout == reference add_token_per_grid."""
        rng = np.random.default_rng(0)
        V, g, D = 3, 4, 8
        pooled = rng.normal(size=(V, g * g, D)).astype(np.float32)
        newline = rng.normal(size=(D,)).astype(np.float32)

        ref = torch_add_token_per_grid(torch.tensor(pooled), torch.tensor(newline)).numpy()

        grid = jnp.asarray(pooled).reshape(1, V, g, g, D)
        nl = jnp.broadcast_to(jnp.asarray(newline), (1, V, g, 1, D))
        got = np.asarray(jnp.concatenate([grid, nl], axis=3).reshape(1, -1, D))[0]
        np.testing.assert_allclose(got, ref, rtol=1e-6)


class TestSplicePlan:
    def test_basic_layout(self):
        T = 10  # tokens per frame in this test
        ids = [5, 6, IMAGE_TOKEN_INDEX, 7, 8, 9]
        labs = [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 8, 9]
        plan = build_splice_plan([ids], [labs], [2], tokens_per_frame=T,
                                 max_len=32, grid_side=3)
        n = 5 + 2 * T
        assert plan.seq_len[0] == n
        np.testing.assert_array_equal(plan.kind[0, :2], [KIND_TEXT] * 2)
        np.testing.assert_array_equal(plan.kind[0, 2:2 + 2 * T], [KIND_VISION] * (2 * T))
        np.testing.assert_array_equal(plan.kind[0, 2 + 2 * T:n], [KIND_TEXT] * 3)
        np.testing.assert_array_equal(plan.kind[0, n:], KIND_PAD)
        np.testing.assert_array_equal(plan.vision_index[0, 2:2 + 2 * T], np.arange(2 * T))
        np.testing.assert_array_equal(plan.text_ids[0, :2], [5, 6])
        np.testing.assert_array_equal(plan.text_ids[0, 2 + 2 * T:n], [7, 8, 9])
        # labels: vision masked, trailing supervised text kept
        assert (plan.labels[0, 2:2 + 2 * T] == IGNORE_INDEX).all()
        np.testing.assert_array_equal(plan.labels[0, n - 2:n], [8, 9])
        np.testing.assert_array_equal(plan.position_ids[0, :n], np.arange(n))

    def test_mrope_layout(self):
        """Vision tokens carry voxel ids; newline -> (0,0,0); text counter
        skips over the vision block (llava_arch.py:711-729)."""
        g = 2
        T = g * (g + 1)   # 6 tokens/frame
        ids = [5, IMAGE_TOKEN_INDEX, 7]
        coords = np.arange(1 * g * g * 3).reshape(1, g, g, 3) + 1
        plan = build_splice_plan([ids], None, [1], tokens_per_frame=T,
                                 max_len=16, grid_side=g, mrope_coords=[coords])
        m = plan.mrope_position_ids[0]
        np.testing.assert_array_equal(m[0], [0, 0, 0])          # text pos 0
        np.testing.assert_array_equal(m[1], coords[0, 0, 0])     # patch (0,0)
        np.testing.assert_array_equal(m[2], coords[0, 0, 1])     # patch (0,1)
        np.testing.assert_array_equal(m[3], [0, 0, 0])           # newline
        np.testing.assert_array_equal(m[4], coords[0, 1, 0])
        np.testing.assert_array_equal(m[6], [0, 0, 0])           # newline
        # text after image: counter = 1 + T
        np.testing.assert_array_equal(m[7], [1 + T] * 3)

    def test_truncation(self):
        ids = [1, IMAGE_TOKEN_INDEX, 2, 3, 4]
        plan = build_splice_plan([ids], None, [2], tokens_per_frame=10,
                                 max_len=64, truncate_to=15)
        assert plan.seq_len[0] == 15
        assert (plan.kind[0, 15:] == KIND_PAD).all()

    def test_no_image(self):
        plan = build_splice_plan([[1, 2, 3]], None, [0], tokens_per_frame=10,
                                 max_len=8)
        assert plan.seq_len[0] == 3
        np.testing.assert_array_equal(plan.text_ids[0, :3], [1, 2, 3])


class TestFullForward:
    @pytest.fixture(scope="class")
    def setup(self):
        key = jax.random.PRNGKey(0)
        params = lv3d.init_model(key, CFG)
        B, V = 1, 2
        S = CFG.vision.image_size
        rng = np.random.default_rng(0)
        images = rng.normal(size=(B, V, 3, S, S)).astype(np.float32)
        g = -(-CFG.vision.num_patches_per_side // CFG.spatial_pool_stride)
        coords = rng.uniform(0, 50, size=(B, V, g, g, 3)).astype(np.float32)
        T = CFG.tokens_per_frame
        ids = [3, 4, IMAGE_TOKEN_INDEX, 5, 6]
        plan = build_splice_plan([ids], None, [V], tokens_per_frame=T,
                                 max_len=4 + 2 * T + 8, grid_side=g)
        batch = lv3d.Batch(
            images=jnp.asarray(images), patch_coords=jnp.asarray(coords),
            text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
            vision_index=jnp.asarray(plan.vision_index),
            labels=jnp.asarray(plan.labels),
            position_ids=jnp.asarray(plan.position_ids),
            mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
            seq_len=jnp.asarray(plan.seq_len))
        return params, batch, plan, V, T

    def test_logits_match_manual_assembly(self, setup):
        """forward() == qwen2 run on manually gathered embeddings."""
        params, batch, plan, V, T = setup
        logits = np.asarray(lv3d.forward(params, CFG, batch))

        vt = lv3d.encode_video(params, CFG, batch.images, batch.patch_coords)
        n = int(plan.seq_len[0])
        manual = []
        for t in range(n):
            if plan.kind[0, t] == KIND_TEXT:
                manual.append(np.asarray(params["llm"]["embed_tokens"])[plan.text_ids[0, t]])
            else:
                manual.append(np.asarray(vt.spliceable)[0, plan.vision_index[0, t]])
        manual = jnp.asarray(np.stack(manual))[None]
        pos = jnp.broadcast_to(jnp.arange(n)[None, :, None], (1, n, 3))
        hidden, _ = qwen2.qwen2_forward(params["llm"], CFG.llm, manual, pos)
        ref = np.asarray(qwen2.lm_head(params["llm"], hidden))
        np.testing.assert_allclose(logits[:, :n], ref, rtol=2e-4, atol=2e-4)

    def test_pe_injection_changes_vision_tokens_only(self, setup):
        params, batch, plan, V, T = setup
        vt_with = lv3d.encode_video(params, CFG, batch.images, batch.patch_coords)
        vt_without = lv3d.encode_video(params, CFG, batch.images, None)
        g = -(-CFG.vision.num_patches_per_side // CFG.spatial_pool_stride)
        from video3d_tpu.ops.pos_embed import sin3d_position_embedding
        pe = sin3d_position_embedding(
            batch.patch_coords.reshape(1, -1, 3), CFG.llm.hidden_size)
        diff = np.asarray(vt_with.pooled - vt_without.pooled).reshape(1, -1, CFG.llm.hidden_size)
        np.testing.assert_allclose(diff, np.asarray(pe), rtol=1e-4, atol=1e-5)

    def test_coord_pe_added_at_coord_slots(self, setup):
        params, batch, plan, V, T = setup
        coord_mask = np.zeros_like(plan.coord_mask)
        coord_mask[0, 1] = True
        box = jnp.asarray(np.array([[10.0, 20.0, 30.0]], np.float32))
        batch2 = batch._replace(coord_mask=jnp.asarray(coord_mask), box_input=box)
        vt = lv3d.encode_video(params, CFG, batch.images, batch.patch_coords)
        base = lv3d.assemble_embeds(params, CFG, vt.spliceable, batch.text_ids,
                                    batch.kind, batch.vision_index)
        with_pe = lv3d.assemble_embeds(params, CFG, vt.spliceable, batch.text_ids,
                                       batch.kind, batch.vision_index,
                                       batch2.coord_mask, batch2.box_input)
        from video3d_tpu.ops.pos_embed import sin3d_position_embedding
        pe = np.asarray(sin3d_position_embedding(box[:, None, :], CFG.llm.hidden_size))[0, 0]
        diff = np.asarray(with_pe - base)
        np.testing.assert_allclose(diff[0, 1], pe, rtol=1e-5, atol=1e-6)
        assert np.abs(diff[0, 2:]).max() < 1e-6 and np.abs(diff[0, 0]).max() < 1e-6


class TestObjectMasks:
    def _torch_patch_masks(self, world_coords, boxes, kind):
        """Literal llava_arch.py:362-378."""
        wc = torch.tensor(world_coords)
        out = []
        for l in range(len(boxes)):
            box = torch.tensor(boxes[l])
            mn, mx = box[:3] - box[3:] / 2, box[:3] + box[3:] / 2
            if kind == "patch27":
                w = wc[:, :378, :378, :].reshape(-1, 14, 27, 14, 27, 3).transpose(2, 3).flatten(3, 4)
                m = torch.all((mn <= w) & (w <= mx), dim=-1)
                out.append(m.sum(dim=3) >= int(27 * 27 * 0.25))
            else:
                w = wc[:, :378, :378, :].reshape(-1, 27, 14, 27, 14, 3).transpose(2, 3).flatten(3, 4)
                m = torch.all((mn <= w) & (w <= mx), dim=-1)
                out.append(m.sum(dim=3) >= int(14 * 14 * 0.5))
        return torch.stack(out).numpy()

    @pytest.mark.parametrize("kind", ["patch14", "patch27"])
    def test_masks_match_torch(self, kind):
        rng = np.random.default_rng(0)
        V = 2
        wc = rng.uniform(-3, 3, size=(V, 384, 384, 3)).astype(np.float32)
        # smooth the field so patches have coherent coords
        wc = np.cumsum(wc, axis=1) * 0.01
        boxes = np.stack([
            np.array([0.5, 1.0, 0.2, 2.0, 3.0, 1.0], np.float32),
            np.array([-1.0, 0.0, 0.0, 1.0, 1.0, 1.0], np.float32),
        ])
        ref = self._torch_patch_masks(wc, boxes, kind)
        ft = ObjectFeatureType.PATCH14 if kind == "patch14" else ObjectFeatureType.PATCH27
        got = np.asarray(lv3d.object_patch_masks(jnp.asarray(wc), jnp.asarray(boxes), ft))
        ref_flat = ref.reshape(ref.shape[0], V, -1)
        np.testing.assert_array_equal(got, ref_flat)
        assert got.any(), "test should exercise nonempty masks"


class TestGroundingHead:
    def test_infonce_loss_matches_reference(self):
        """Stable-logsumexp loss == reference exp/log formula (:307-308)."""
        rng = np.random.default_rng(0)
        scores = rng.normal(size=(9,)).astype(np.float32)
        pos = [2, 5]
        t = 0.07
        logits = torch.exp(torch.tensor(scores) / t)
        ref = -torch.log(logits[pos].sum() / logits.sum())
        hot = np.zeros(9, np.float32)
        hot[pos] = 1
        got = lv3d.infonce_loss(jnp.asarray(scores), jnp.asarray(hot), t)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    def test_scores_shape_and_padding(self):
        key = jax.random.PRNGKey(1)
        D = CFG.llm.hidden_size
        params = {"ground_head": lv3d.init_ground_head(key, D)}
        rng = np.random.default_rng(1)
        feats = jnp.asarray(rng.normal(size=(5, D)).astype(np.float32))
        valid = jnp.asarray([True, True, False, True, False])
        q = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
        s = np.asarray(lv3d.ground_scores(params, q, feats, valid, CFG))
        assert s.shape == (6,)
        assert np.isinf(s[[2, 4]]).all() and np.isfinite(s[[0, 1, 3, 5]]).all()
        assert np.abs(s[np.isfinite(s)]).max() <= 1.0 + 1e-5  # cosine range


class TestSpliceFuzz:
    def test_randomized_plan_invariants(self):
        """50 random (prompt, answer, V, truncation) cases: the plan must
        keep text order, vision contiguity, label alignment, and position
        arithmetic exactly."""
        rng = np.random.default_rng(0)
        for case in range(50):
            T = int(rng.integers(2, 12))
            V = int(rng.integers(0, 5))
            n_pre = int(rng.integers(1, 8))
            n_post = int(rng.integers(1, 8))
            ids = rng.integers(1, 400, size=n_pre + n_post).tolist()
            labels = [IGNORE_INDEX] * n_pre + ids[n_pre:]
            has_image = V > 0 and rng.random() > 0.2
            if has_image:
                ids = ids[:n_pre] + [IMAGE_TOKEN_INDEX] + ids[n_pre:]
                labels = labels[:n_pre] + [IGNORE_INDEX] + labels[n_pre:]
            total = len([i for i in ids if i != IMAGE_TOKEN_INDEX]) + \
                (V * T if has_image else 0)
            max_len = int(total + rng.integers(0, 16))
            truncate = int(rng.integers(4, total + 4)) if rng.random() < 0.3 else None

            plan = build_splice_plan([ids], [labels], [V],
                                     tokens_per_frame=T, max_len=max_len,
                                     grid_side=3, truncate_to=truncate)
            n = int(plan.seq_len[0])
            expect = min(total, max_len, truncate or 10**9)
            assert n == expect, (case, n, expect)
            # positions are arange over the whole buffer
            np.testing.assert_array_equal(plan.position_ids[0],
                                          np.arange(max_len))
            # pad tail
            assert (plan.kind[0, n:] == KIND_PAD).all()
            # text ids appear in original order at text slots
            text_slots = plan.text_ids[0][plan.kind[0] == KIND_TEXT]
            ref_text = [i for i in ids if i != IMAGE_TOKEN_INDEX]
            np.testing.assert_array_equal(text_slots,
                                          np.asarray(ref_text)[:len(text_slots)])
            if has_image and n > n_pre:
                # vision block contiguous right after the prefix
                vis = np.nonzero(plan.kind[0] == KIND_VISION)[0]
                if len(vis):
                    assert vis[0] == n_pre
                    np.testing.assert_array_equal(
                        vis, np.arange(vis[0], vis[0] + len(vis)))
                    np.testing.assert_array_equal(
                        plan.vision_index[0][vis], np.arange(len(vis)))
                    # vision slots never supervised
                    assert (plan.labels[0][vis] == IGNORE_INDEX).all()
            # supervised labels only at answer text slots
            sup = np.nonzero(plan.labels[0] != IGNORE_INDEX)[0]
            assert all(plan.kind[0][s] == KIND_TEXT for s in sup)
