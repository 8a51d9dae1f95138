"""'llava3d' PE variant: voxel-deduplicated mean features match a torch
re-derivation of the reference's defaultdict loop (llava_arch.py:731-746),
and the static-budget sampling keeps the reference's semantics."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from video3d_tpu.config import ModelConfig, World3DConfig, replace
from video3d_tpu.ops.voxel_dedup import linearize_voxels, voxel_dedup_features

GRID = (12, 12, 8)


def torch_dedup(feats, coords):
    """Reference loop re-derivation: group by coord tuple (insertion order),
    mean each group (llava_arch.py:736-742, without the random sample)."""
    from collections import defaultdict
    coord2feat = defaultdict(list)
    for f, c in zip(torch.tensor(feats), coords.reshape(-1, 3)):
        coord2feat[tuple(c.tolist())].append(f)
    keys = list(coord2feat.keys())
    means = [torch.mean(torch.stack(v), dim=0).numpy()
             for v in coord2feat.values()]
    return {k: m for k, m in zip(keys, means)}


class TestVoxelDedup:
    def _data(self, P=200, D=16, seed=0):
        rng = np.random.default_rng(seed)
        feats = rng.normal(size=(P, D)).astype(np.float32)
        coords = rng.integers(0, 6, size=(P, 3)).astype(np.int32)  # many dups
        return feats, coords

    def test_means_match_reference_loop(self):
        feats, coords = self._data()
        ref = torch_dedup(feats, coords)
        got, mask = voxel_dedup_features(jnp.asarray(feats),
                                         jnp.asarray(coords), GRID,
                                         budget=len(ref))
        assert int(mask.sum()) == len(ref)
        # deterministic order (key=None) = ascending linearized voxel id
        ids = sorted(ref.keys(),
                     key=lambda c: (c[0] * GRID[1] + c[1]) * GRID[2] + c[2])
        for i, c in enumerate(ids):
            np.testing.assert_allclose(np.asarray(got[i]), ref[c],
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=str(c))

    def test_budget_sampling_is_subset(self):
        feats, coords = self._data(seed=1)
        ref = torch_dedup(feats, coords)
        K = max(4, len(ref) // 2)
        got, mask = voxel_dedup_features(jnp.asarray(feats),
                                         jnp.asarray(coords), GRID, budget=K,
                                         key=jax.random.PRNGKey(0))
        assert mask.all()           # enough uniques to fill the budget
        ref_rows = np.stack(list(ref.values()))
        for row in np.asarray(got):
            dists = np.abs(ref_rows - row[None]).max(axis=1)
            assert dists.min() < 1e-5   # every output is a genuine voxel mean

    def test_cycling_fill_below_budget(self):
        feats, coords = self._data(P=20, seed=2)
        n_unique = len({tuple(c) for c in coords.tolist()})
        K = n_unique + 7
        got, mask = voxel_dedup_features(jnp.asarray(feats),
                                         jnp.asarray(coords), GRID, budget=K)
        assert int(mask.sum()) == n_unique
        # fill rows cycle the valid prefix
        np.testing.assert_allclose(np.asarray(got[n_unique]),
                                   np.asarray(got[0]), rtol=1e-6)

    def test_linearize_unique(self):
        ids = linearize_voxels(jnp.asarray([[0, 0, 0], [0, 0, 1], [1, 0, 0]]),
                               GRID)
        assert len(set(np.asarray(ids).tolist())) == 3


class TestEncodeLlava3d:
    def test_end_to_end_generate(self):
        """Full pipeline: encode_video_llava3d -> splice -> greedy decode."""
        from video3d_tpu.models import llava_video3d as lv3d
        from video3d_tpu.models.generate import generate_greedy
        from video3d_tpu.models.splice import build_splice_plan

        cfg = replace(ModelConfig.tiny(),
                      world_3d=World3DConfig.from_reference_string(
                          "avg-discrete-llava3d"))
        cfg = replace(cfg, world_3d=replace(cfg.world_3d, llava3d_budget=24))
        assert cfg.world_3d.llava3d and cfg.world_3d.pos_embed.value == "none"
        params = lv3d.init_model(jax.random.PRNGKey(0), cfg)

        rng = np.random.default_rng(0)
        V, S = 2, cfg.vision.image_size
        g = -(-cfg.vision.num_patches_per_side // cfg.spatial_pool_stride)
        images = jnp.asarray(rng.normal(size=(1, V, 3, S, S)), jnp.float32)
        coords = jnp.asarray(rng.integers(0, 5, size=(V, g, g, 3)), jnp.float32)

        feat, mask = lv3d.encode_video_llava3d(params, cfg, images, coords,
                                               key=jax.random.PRNGKey(1))
        K = cfg.world_3d.llava3d_budget
        assert feat.shape == (K, cfg.llm.hidden_size)

        ids = [100, 331, 198, -200, 198, 332, 101]
        plan = build_splice_plan([ids], None, [1], tokens_per_frame=K,
                                 max_len=64, grid_side=1)
        batch = lv3d.Batch(
            images=None, patch_coords=None,
            text_ids=jnp.asarray(plan.text_ids), kind=jnp.asarray(plan.kind),
            vision_index=jnp.asarray(plan.vision_index),
            labels=jnp.asarray(plan.labels),
            position_ids=jnp.asarray(plan.position_ids),
            mrope_position_ids=jnp.asarray(plan.mrope_position_ids),
            seq_len=jnp.asarray(plan.seq_len),
            coord_mask=jnp.asarray(plan.coord_mask))
        res = generate_greedy(params, cfg, batch, max_new_tokens=3,
                              eos_token_id=-1, vision_features=feat[None])
        assert np.asarray(res.tokens).shape == (1, 3)
        assert np.isfinite(np.asarray(res.lengths)).all()


class TestEngineLlava3d:
    def test_generate_answer_llava3d(self, tmp_path):
        import os, sys
        sys.path.insert(0, os.path.dirname(__file__))
        from fixtures import FakeTokenizer, make_fake_scene
        from video3d_tpu.config import DataConfig
        from video3d_tpu.data.image_processor import SigLipImageProcessor
        from video3d_tpu.data.video_processor import VideoProcessor
        from video3d_tpu.eval.drivers import EngineConfig, InferenceEngine
        from video3d_tpu.models import llava_video3d as lv3d

        root = str(tmp_path)
        info = make_fake_scene(root, n_frames=3)
        cfg = replace(ModelConfig.tiny(),
                      world_3d=World3DConfig.from_reference_string(
                          "avg-discrete-llava3d"))
        cfg = replace(cfg, world_3d=replace(cfg.world_3d, llava3d_budget=24))
        params = lv3d.init_model(jax.random.PRNGKey(0), cfg)
        tok = FakeTokenizer()
        engine = InferenceEngine(
            params, cfg, tok,
            VideoProcessor(DataConfig(
                video_folder=root,
                annotation_dir=os.path.join(root, "embodiedscan"),
                metadata_dir=os.path.join(root, "metadata"),
                frames_upbound=3)),
            SigLipImageProcessor(size=(cfg.vision.image_size,) * 2),
            EngineConfig(max_new_tokens=3, eos_token_id=tok.eos_token_id,
                         max_frames=3, buckets=(128,), stop_str=""),
            device_geometry=False)
        ans = engine.generate_answer({
            "video": info["sample_idx"],
            "conversations": [
                {"from": "human", "value": "<image>\nwhat is here"}]})
        assert isinstance(ans, str)
