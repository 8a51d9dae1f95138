"""Golden tests for the 3D sinusoidal PE against a literal torch
re-derivation of PositionEmbeddingSine3D (position_encoding.py:5-49)."""

import numpy as np
import torch

import jax.numpy as jnp

from video3d_tpu.ops.pos_embed import sin3d_position_embedding


def torch_sine3d(x: torch.Tensor, embedding_size: int, temperature=10000, n_points=1):
    num_feats = embedding_size // (3 * n_points)
    if n_points > 1:
        x = x.flatten(1, 2)
    B, N, _ = x.shape
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    parts = []
    for axis in range(3):
        pos = x[:, :, axis][..., None] / dim_t
        if num_feats % 2 != 0:
            pos = torch.cat([pos, torch.zeros(B, N, 1)], dim=-1)
            pos = torch.stack((pos[:, :, 0::2].sin(), pos[:, :, 1::2].cos()), dim=3).flatten(2)[..., :-1]
        else:
            pos = torch.stack((pos[:, :, 0::2].sin(), pos[:, :, 1::2].cos()), dim=3).flatten(2)
        parts.append(pos)
    pos = torch.cat(parts, dim=2)
    if n_points > 1:
        pos = pos.view(B, N // n_points, n_points * 3 * num_feats)
    out = torch.zeros((B, N // n_points if n_points > 1 else N, embedding_size), dtype=x.dtype)
    out[:, :, : pos.shape[2]] = pos
    return out


class TestSin3D:
    def test_even_num_feats(self):
        """3584 // 3 = 1194 (even) — the production config."""
        rng = np.random.default_rng(0)
        coords = rng.uniform(0, 300, size=(2, 17, 3)).astype(np.float32)
        ref = torch_sine3d(torch.tensor(coords), 3584).numpy()
        got = np.asarray(sin3d_position_embedding(jnp.asarray(coords), 3584))
        assert got.shape == (2, 17, 3584)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
        # zero padding at the tail
        assert np.all(got[:, :, 3 * 1194:] == 0)

    def test_odd_num_feats(self):
        """D=66 -> num_feats = 22; D=69 -> 23 (odd interleave path)."""
        rng = np.random.default_rng(1)
        coords = rng.uniform(-5, 5, size=(1, 7, 3)).astype(np.float32)
        for D in (66, 69, 128):
            ref = torch_sine3d(torch.tensor(coords), D).numpy()
            got = np.asarray(sin3d_position_embedding(jnp.asarray(coords), D))
            np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4, err_msg=f"D={D}")

    def test_minmax_two_points(self):
        """n_points=2 (minmax pooling): num_feats = 3584//6 = 597, odd."""
        rng = np.random.default_rng(2)
        coords = rng.uniform(0, 300, size=(2, 9, 2, 3)).astype(np.float32)
        ref = torch_sine3d(torch.tensor(coords), 3584, n_points=2).numpy()
        got = np.asarray(sin3d_position_embedding(jnp.asarray(coords), 3584, n_points=2))
        assert got.shape == (2, 9, 3584)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)

    def test_integer_voxel_coords(self):
        """Discretized coords are whole numbers in [0, 300]."""
        coords = np.array([[[0.0, 150.0, 300.0], [1.0, 2.0, 3.0]]], np.float32)
        ref = torch_sine3d(torch.tensor(coords), 512).numpy()
        got = np.asarray(sin3d_position_embedding(jnp.asarray(coords), 512))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
