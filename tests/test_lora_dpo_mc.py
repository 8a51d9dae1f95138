"""Tests for the LoRA adapters, DPO loss, and on-device max-coverage
selection."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from video3d_tpu.config import ModelConfig
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.train.lora import (LoraConfig, apply_lora, init_lora,
                                    lora_size)

CFG = ModelConfig.tiny()


class TestLora:
    @pytest.fixture(scope="class")
    def setup(self):
        params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
        lcfg = LoraConfig(r=4, alpha=8)
        lora = init_lora(jax.random.PRNGKey(1), params, lcfg)
        return params, lora, lcfg

    def test_targets_llm_only(self, setup):
        params, lora, lcfg = setup
        assert lora["llm"]["layers"][0]["attn"]["wq"] is not None
        assert lora["llm"]["layers"][0]["mlp"]["w_gate"] is not None
        assert lora["projector"]["w1"] is None
        assert lora["vision"]["patch_embed"]["w"] is None
        assert lora["llm"]["embed_tokens"] is None
        assert lora_size(lora) > 0

    def test_zero_init_is_identity(self, setup):
        params, lora, lcfg = setup
        merged = apply_lora(params, lora, lcfg)
        np.testing.assert_allclose(
            np.asarray(merged["llm"]["layers"][0]["attn"]["wq"]),
            np.asarray(params["llm"]["layers"][0]["attn"]["wq"]))

    def test_nonzero_delta_and_gradient_flow(self, setup):
        params, lora, lcfg = setup
        # set B nonzero -> weights change by A@B * scale
        ad = lora["llm"]["layers"][0]["attn"]["wq"]
        lora2 = jax.tree.map(lambda x: x, lora,
                             is_leaf=lambda x: x is None or
                             (isinstance(x, dict) and set(x) == {"A", "B"}))
        lora2["llm"]["layers"][0]["attn"]["wq"] = {
            "A": ad["A"], "B": jnp.ones_like(ad["B"])}
        merged = apply_lora(params, lora2, lcfg)
        delta = np.asarray(merged["llm"]["layers"][0]["attn"]["wq"]) - \
            np.asarray(params["llm"]["layers"][0]["attn"]["wq"])
        expected = np.asarray(ad["A"]) @ np.ones((4, ad["A"].shape[0] and
                                                  merged["llm"]["layers"][0]["attn"]["wq"].shape[1])) * lcfg.scale
        np.testing.assert_allclose(delta, expected, rtol=1e-5, atol=1e-6)

        # gradient flows into lora only
        def loss(lo):
            m = apply_lora(params, lo, lcfg)
            return jnp.sum(m["llm"]["layers"][0]["attn"]["wq"] ** 2)

        g = jax.grad(loss)(lora2)
        assert float(jnp.abs(g["llm"]["layers"][0]["attn"]["wq"]["A"]).sum()) > 0


class TestDPO:
    def test_loss_matches_manual_formula(self):
        from video3d_tpu.train.dpo import DPOConfig, dpo_loss

        rng = np.random.default_rng(0)
        pc, pr, rc, rr = (jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
                          for _ in range(4))
        cfg = DPOConfig(beta=0.1)
        loss, metrics = dpo_loss(pc, pr, rc, rr, cfg)
        logits = 0.1 * ((np.asarray(pc) - np.asarray(rc))
                        - (np.asarray(pr) - np.asarray(rr)))
        ref = float(-np.log(1 / (1 + np.exp(-logits))).mean())
        np.testing.assert_allclose(float(loss), ref, rtol=1e-5)
        assert 0 <= float(metrics["reward_accuracy"]) <= 1

    def test_sequence_logprob_masks_ignore(self):
        from video3d_tpu.constants import IGNORE_INDEX
        from video3d_tpu.train.dpo import sequence_logprob

        logits = jnp.asarray(np.random.default_rng(1)
                             .normal(size=(1, 5, 7)).astype(np.float32))
        labels = jnp.asarray([[IGNORE_INDEX, IGNORE_INDEX, 3, 4, IGNORE_INDEX]])
        lp = sequence_logprob(logits, labels)
        logp = np.asarray(jax.nn.log_softmax(logits[:, :-1], axis=-1))
        ref = logp[0, 1, 3] + logp[0, 2, 4]
        np.testing.assert_allclose(float(lp[0]), ref, rtol=1e-5)

    def test_dpo_prefers_chosen_after_step(self):
        """One DPO step on the tiny model increases the chosen/rejected
        log-prob margin."""
        import optax

        from video3d_tpu.models import qwen2
        from video3d_tpu.train.dpo import DPOConfig, dpo_loss, sequence_logprob

        cfg = CFG.llm
        params = qwen2.init_qwen2(jax.random.PRNGKey(0), cfg)
        ref_params = jax.tree.map(lambda x: x, params)
        rng = np.random.default_rng(2)
        chosen_ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)))
        rejected_ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)))
        pos = jnp.broadcast_to(jnp.arange(8)[None, :, None], (2, 8, 3))

        def seq_lp(p, ids):
            h, _ = qwen2.qwen2_forward(p, cfg, qwen2.embed_tokens(p, ids), pos)
            return sequence_logprob(qwen2.lm_head(p, h), ids)

        def loss_fn(p):
            loss, m = dpo_loss(seq_lp(p, chosen_ids), seq_lp(p, rejected_ids),
                               seq_lp(ref_params, chosen_ids),
                               seq_lp(ref_params, rejected_ids), DPOConfig())
            return loss, m

        (l0, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        tx = optax.sgd(1e-2)
        updates, _ = tx.update(grads, tx.init(params))
        params2 = optax.apply_updates(params, updates)
        l1, _ = loss_fn(params2)
        assert float(l1) < float(l0)


class TestMCSelect:
    def test_matches_host_greedy(self):
        """Device greedy == exact host set-cover on a collision-free case."""
        from video3d_tpu.ops.mc_select import greedy_select_frames
        from video3d_tpu.tools.max_coverage import greedy_max_coverage

        rng = np.random.default_rng(0)
        V, N = 5, 200
        frame_vox = rng.integers(0, 12, size=(V, N, 3)).astype(np.int32)
        scene_vox = np.unique(frame_vox.reshape(-1, 3), axis=0)

        order, gains, num_all = greedy_select_frames(
            jnp.asarray(frame_vox), jnp.asarray(scene_vox), max_frames=V)

        fv = {i: set(map(tuple, frame_vox[i].reshape(-1, 3).tolist()))
              for i in range(V)}
        pc = set(map(tuple, scene_vox.tolist()))

        # host greedy with first-index tie break for comparability
        import random

        class FirstChoice(random.Random):
            def choice(self, seq):
                return seq[0]

        h_order, h_gains = greedy_max_coverage(fv, pc, max_frames=V,
                                               rng=FirstChoice())
        assert [int(x) for x in order] == list(h_order)
        assert [int(x) for x in gains] == list(h_gains)
        assert int(num_all) == len(pc)

    def test_prefix_by_ratio(self):
        from video3d_tpu.ops.mc_select import select_prefix_by_ratio

        order = np.array([3, 0, 2, 1], np.int32)
        gains = np.array([50, 30, 15, 5], np.int32)
        picked = select_prefix_by_ratio(order, gains, 100, 0.9)
        assert picked == [0, 2, 3]  # 50+30+15 >= 90, sorted chronologically

    def test_exact_on_hash_colliding_voxels(self):
        """Membership is exact: voxels that COLLIDED under the old 2^20
        spatial hash (x*73856093 ^ y*19349663 mod 2^20) are kept distinct."""
        from video3d_tpu.ops.mc_select import greedy_select_frames

        # birthday-search a genuine collision of the retired hash
        mask = (1 << 20) - 1
        seen, pair = {}, None
        for x in range(2048):
            for y in range(8):
                h = ((x * 73856093) ^ (y * 19349663)) & mask
                if h in seen and seen[h] != (x, y):
                    pair = (seen[h], (x, y))
                    break
                seen[h] = (x, y)
            if pair:
                break
        assert pair is not None, "no collision found in search range"
        (x1, y1), (x2, y2) = pair
        va, vb = np.array([x1, y1, 0]), np.array([x2, y2, 0])

        scene_vox = jnp.asarray(np.stack([va, vb]).astype(np.int32))
        frame_vox = jnp.asarray(np.stack([
            np.broadcast_to(va, (4, 3)),     # frame 0 covers only va
            np.broadcast_to(vb, (4, 3)),     # frame 1 covers only vb
        ]).astype(np.int32))
        order, gains, num_all = greedy_select_frames(
            frame_vox, scene_vox, max_frames=2)
        assert int(num_all) == 2            # hash would have merged -> 1
        assert sorted(int(o) for o in order) == [0, 1]
        assert [int(g) for g in gains] == [1, 1]

    def test_padded_scene_valid(self):
        from video3d_tpu.ops.mc_select import greedy_select_frames

        scene = np.array([[1, 1, 1], [2, 2, 2], [9, 9, 9], [9, 9, 9]],
                         np.int32)
        valid = np.array([True, True, False, False])
        frames = np.array([[[1, 1, 1], [9, 9, 9]],
                           [[2, 2, 2], [2, 2, 2]]], np.int32)
        order, gains, num_all = greedy_select_frames(
            jnp.asarray(frames), jnp.asarray(scene), max_frames=2,
            scene_valid=jnp.asarray(valid))
        # padded (9,9,9) slots must not count even though a frame hits them
        assert int(num_all) == 2
        assert [int(g) for g in gains] == [1, 1]


class TestWeightDelta:
    def test_delta_roundtrip(self):
        from video3d_tpu.tools.weight_delta import apply_delta, make_delta

        base = {"w": jnp.ones((3, 2)), "nested": {"b": jnp.zeros((4,))}}
        tuned = {"w": jnp.full((3, 2), 2.5), "nested": {"b": jnp.ones((4,))}}
        delta = make_delta(tuned, base)
        back = apply_delta(base, delta)
        for a, b in zip(jax.tree_util.tree_leaves(back),
                        jax.tree_util.tree_leaves(tuned)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_vocab_extension_rows_kept(self):
        from video3d_tpu.tools.weight_delta import apply_delta, make_delta

        base = {"embed": jnp.ones((10, 4))}
        tuned = {"embed": jnp.concatenate(
            [jnp.full((10, 4), 3.0), jnp.full((2, 4), 7.0)])}  # +2 tokens
        delta = make_delta(tuned, base)
        assert delta["embed"].shape == (12, 4)
        np.testing.assert_allclose(np.asarray(delta["embed"][10:]), 7.0)
        back = apply_delta(base, delta)
        np.testing.assert_allclose(np.asarray(back["embed"]), np.asarray(tuned["embed"]))


class TestDPODataPath:
    def test_pair_collation_and_step(self, tmp_path):
        import os
        from fixtures import FakeTokenizer, make_fake_scene
        from video3d_tpu.config import DataConfig
        from video3d_tpu.data.dataset import Collator, CollatorConfig
        from video3d_tpu.data.image_processor import SigLipImageProcessor
        from video3d_tpu.data.video_processor import VideoProcessor
        from video3d_tpu.train.dpo import DPOConfig, dpo_step_loss
        from video3d_tpu.train.dpo_data import DPOCollator, DPODataset

        root = str(tmp_path / "data")
        info = make_fake_scene(root, n_frames=2)
        dc = DataConfig(video_folder=root,
                        annotation_dir=os.path.join(root, "embodiedscan"),
                        metadata_dir=os.path.join(root, "metadata"),
                        frames_upbound=2)
        tok = FakeTokenizer()
        records = [{"video": info["sample_idx"],
                    "prompt": "what color is the chair",
                    "chosen": "brown wooden chair",
                    "rejected": "blue sofa"}]
        ds = DPODataset(records, tok, VideoProcessor(dc),
                        SigLipImageProcessor(size=(56, 56)), frames_upbound=2)
        col = DPOCollator(Collator(CFG, CollatorConfig(max_len=160,
                                                       frames_upbound=2)))
        chosen_arr, rejected_arr = col([ds[0]])
        assert (chosen_arr["labels"] != rejected_arr["labels"]).any()

        def to_batch(a):
            return lv3d.Batch(**{k: jnp.asarray(v) for k, v in a.items()
                                 if k in lv3d.Batch._fields})

        params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
        ref_params = jax.tree.map(lambda x: x, params)
        loss, metrics = dpo_step_loss(params, ref_params, CFG,
                                      to_batch(chosen_arr),
                                      to_batch(rejected_arr),
                                      DPOConfig(), remat=False)
        # identical policies -> logits 0 -> loss = log 2
        np.testing.assert_allclose(float(loss), np.log(2.0), rtol=1e-4)


class TestOccupancyImpls:
    """Round-4 sort-free MXU occupancy (frame_occupancy_mm) must be
    BIT-IDENTICAL to the round-3 sort+searchsorted membership bitmaps —
    including duplicate scene slots (first-occurrence dedup), padded
    scene entries, out-of-grid voxels, and all-miss frames."""

    def _both(self, frame_vox, scene_vox, scene_valid=None):
        from video3d_tpu.ops import mc_select as m

        sorted_ids, lo, sizes = m.scene_universe(
            jnp.asarray(scene_vox),
            None if scene_valid is None else jnp.asarray(scene_valid))
        ref = jax.vmap(lambda fv: m.membership_bitmap(
            fv, sorted_ids, lo, sizes))(jnp.asarray(frame_vox))
        got = m.frame_occupancy_mm(jnp.asarray(frame_vox), sorted_ids,
                                   lo, sizes)
        return np.asarray(got), np.asarray(ref)

    def test_random_bitmaps_identical(self):
        rng = np.random.default_rng(5)
        V, N, M = 6, 500, 300
        frame_vox = rng.integers(-3, 15, size=(V, N, 3)).astype(np.int32)
        scene_vox = rng.integers(0, 14, size=(M, 3)).astype(np.int32)
        got, ref = self._both(frame_vox, scene_vox)
        np.testing.assert_array_equal(got, ref)

    def test_duplicate_scene_slots_and_padding(self):
        rng = np.random.default_rng(6)
        scene = rng.integers(0, 6, size=(40, 3)).astype(np.int32)
        scene = np.concatenate([scene, scene[:10]])      # duplicates
        valid = np.ones((50,), bool)
        valid[45:] = False                               # padded tail
        frames = rng.integers(0, 6, size=(3, 64, 3)).astype(np.int32)
        got, ref = self._both(frames, scene, valid)
        np.testing.assert_array_equal(got, ref)

    def test_all_miss_frame(self):
        scene = np.asarray([[1, 1, 1], [2, 2, 2]], np.int32)
        frames = np.stack([
            np.broadcast_to(np.asarray([9, 9, 9], np.int32), (8, 3)),
            np.broadcast_to(np.asarray([1, 1, 1], np.int32), (8, 3)),
        ])
        got, ref = self._both(frames, scene)
        np.testing.assert_array_equal(got, ref)
        assert not got[0].any() and got[1].sum() == 1

    def test_greedy_same_result_under_both_impls(self):
        from video3d_tpu.ops import mc_select as m

        rng = np.random.default_rng(7)
        frame_vox = rng.integers(0, 12, size=(5, 200, 3)).astype(np.int32)
        scene_vox = np.unique(frame_vox.reshape(-1, 3), axis=0)
        out = {}
        orig = m.OCC_IMPL                # restore the PRODUCTION default
        for impl in ("mm", "sort"):
            m.OCC_IMPL = impl
            try:
                jax.clear_caches()       # greedy_select_frames is jitted
                out[impl] = [np.asarray(x) for x in m.greedy_select_frames(
                    jnp.asarray(frame_vox), jnp.asarray(scene_vox),
                    max_frames=5)]
            finally:
                m.OCC_IMPL = orig
        for a, b in zip(out["mm"], out["sort"]):
            np.testing.assert_array_equal(a, b)


class TestGreedyEarlyExit:
    def test_ratio_early_exit_matches_host_prefix(self):
        """ratio=0.95 on device == full ordering + host prefix cut
        (video_utils.py:142-151): same picks, tail slots -1."""
        from video3d_tpu.ops.mc_select import (greedy_select_frames,
                                               select_prefix_by_ratio)

        rng = np.random.default_rng(11)
        frame_vox = rng.integers(0, 10, size=(6, 300, 3)).astype(np.int32)
        scene_vox = np.unique(frame_vox.reshape(-1, 3), axis=0)
        full_o, full_g, num_all = greedy_select_frames(
            jnp.asarray(frame_vox), jnp.asarray(scene_vox), max_frames=6)
        want = select_prefix_by_ratio(full_o, full_g, int(num_all), 0.95)

        o95, g95, na95 = greedy_select_frames(
            jnp.asarray(frame_vox), jnp.asarray(scene_vox), max_frames=6,
            ratio=0.95)
        got = sorted(int(x) for x in np.asarray(o95) if int(x) >= 0)
        assert got == want
        assert int(na95) == int(num_all)
        # early exit: slots past the cut are untouched
        k = len(want)
        assert all(int(x) == -1 for x in np.asarray(o95)[k:])
        np.testing.assert_array_equal(np.asarray(g95)[:k],
                                      np.asarray(full_g)[:k])
