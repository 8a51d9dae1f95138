"""Fused geometry kernel (interpret mode) vs the composed jnp ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from video3d_tpu.kernels.fused_geometry import (fused_patch_voxel_coords,
                                                reference_patch_voxel_coords)


def make_inputs(V=2, H=480, W=640, seed=0):
    rng = np.random.default_rng(seed)
    depths = rng.integers(200, 8000, size=(V, H, W)).astype(np.int32)
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 577.87
    intr[0, 2], intr[1, 2] = W / 2 - 0.5, H / 2 + 0.3
    poses = np.stack([np.eye(4, dtype=np.float32)] * V)
    poses[:, :3, 3] = rng.uniform(-2, 2, (V, 3)).astype(np.float32)
    # add rotation
    th = 0.3
    poses[:, 0, 0] = poses[:, 1, 1] = np.cos(th)
    poses[:, 0, 1], poses[:, 1, 0] = -np.sin(th), np.sin(th)
    return jnp.asarray(depths), jnp.asarray(intr), jnp.asarray(poses)


class TestFusedGeometry:
    def test_matches_composed_ops(self):
        depths, intr, poses = make_inputs()
        ref = np.asarray(reference_patch_voxel_coords(depths, intr, poses))
        got = np.asarray(fused_patch_voxel_coords(depths, intr, poses,
                                                  interpret=True))
        assert got.shape == (2, 14, 14, 3)
        # voxel ids are integers; identical up to rounding at .5 boundaries
        mismatch = np.abs(got - ref) > 0
        assert mismatch.mean() < 1e-3, f"{mismatch.mean()} of voxels differ"

    def test_continuous_coords_close(self):
        depths, intr, poses = make_inputs(seed=1)
        ref = np.asarray(reference_patch_voxel_coords(depths, intr, poses,
                                                      discretize=False))
        got = np.asarray(fused_patch_voxel_coords(depths, intr, poses,
                                                  discretize=False,
                                                  interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_small_frame_config(self):
        """Tiny-config geometry (56px, grid 2)."""
        depths, intr, poses = make_inputs(V=1, H=96, W=128, seed=2)
        ref = np.asarray(reference_patch_voxel_coords(depths, intr, poses,
                                                      crop=56, grid=2))
        got = np.asarray(fused_patch_voxel_coords(depths, intr, poses,
                                                  crop=56, grid=2,
                                                  interpret=True))
        mismatch = np.abs(got - ref) > 0
        assert mismatch.mean() < 1e-2
