"""Golden tests for the geometry core against torch-computed references.

The reference formulas live in /root/reference/llava/video_utils.py and
llava_arch.py; we recompute them here with torch (CPU) from the documented
math and check our jnp implementations match to float32 tolerance.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from video3d_tpu.ops import geometry


def _rand_pose(rng):
    """Random rigid transform as a 4x4 matrix."""
    a, b, c = rng.uniform(-np.pi, np.pi, 3)

    def rot_z(t):
        return np.array([[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0], [0, 0, 1]])

    def rot_x(t):
        return np.array([[1, 0, 0], [0, np.cos(t), -np.sin(t)], [0, np.sin(t), np.cos(t)]])

    R = rot_z(a) @ rot_x(b) @ rot_z(c)
    out = np.eye(4)
    out[:3, :3] = R
    out[:3, 3] = rng.uniform(-3, 3, 3)
    return out


def torch_unproject(intrinsics, poses, depths):
    """Literal re-derivation of video_utils.py:38-68 in torch."""
    intrinsics = intrinsics.float()
    V, H, W = depths.shape
    ys, xs = torch.meshgrid(torch.arange(H), torch.arange(W), indexing="ij")
    xs = xs.reshape(1, -1).repeat(V, 1).float()
    ys = ys.reshape(1, -1).repeat(V, 1).float()
    fx = intrinsics[:, 0, 0].unsqueeze(-1)
    fy = intrinsics[:, 1, 1].unsqueeze(-1)
    cx = intrinsics[:, 0, 2].unsqueeze(-1)
    cy = intrinsics[:, 1, 2].unsqueeze(-1)
    z = depths.reshape(V, -1).float() / 1000
    x = (xs - cx) * z / fx
    y = (ys - cy) * z / fy
    cam = torch.stack([x, y, z, torch.ones_like(x)], -1)
    world = (poses.float() @ cam.permute(0, 2, 1)).permute(0, 2, 1)
    world = world[..., :3] / world[..., 3:]
    return world.reshape(V, H, W, 3)


class TestUnproject:
    def test_matches_torch(self):
        rng = np.random.default_rng(0)
        V, H, W = 3, 12, 16
        intr = np.eye(4)
        intr[0, 0], intr[1, 1] = 580.0, 578.0
        intr[0, 2], intr[1, 2] = W / 2 - 0.5, H / 2 + 0.3
        intrinsics = np.stack([intr] * V)
        poses = np.stack([_rand_pose(rng) for _ in range(V)])
        depths = rng.integers(0, 6000, size=(V, H, W)).astype(np.int32)

        ref = torch_unproject(torch.tensor(intrinsics), torch.tensor(poses),
                              torch.tensor(depths)).numpy()
        got = np.asarray(geometry.unproject(jnp.asarray(intrinsics),
                                            jnp.asarray(poses), jnp.asarray(depths)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)

    def test_round_trip(self):
        """Project a known world point and unproject it back."""
        fx = fy = 500.0
        cx, cy = 8.0, 6.0
        intr = np.eye(4)
        intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2] = fx, fy, cx, cy
        pose = np.eye(4)
        H, W = 13, 17
        depth = np.full((1, H, W), 2000.0)  # 2 m everywhere
        world = np.asarray(geometry.unproject(jnp.asarray(intr), jnp.asarray(pose[None]),
                                              jnp.asarray(depth)))
        # Pixel (v=6, u=8) is the principal point -> x=y=0, z=2
        np.testing.assert_allclose(world[0, 6, 8], [0.0, 0.0, 2.0], atol=1e-6)
        # Pixel one to the right: x = (9-8)*2/500
        np.testing.assert_allclose(world[0, 6, 9], [2.0 / 500, 0.0, 2.0], atol=1e-6)

    def test_pose_composition(self):
        rng = np.random.default_rng(1)
        axis_align = _rand_pose(rng)
        cams = np.stack([_rand_pose(rng) for _ in range(4)])
        got = np.asarray(geometry.compose_poses(jnp.asarray(axis_align), jnp.asarray(cams)))
        ref = np.stack([axis_align @ c for c in cams])
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


class TestCoordResize:
    def test_nearest_matches_opencv_rule(self):
        """cv2.INTER_NEAREST picks src = floor(dst * in/out)."""
        rng = np.random.default_rng(2)
        arr = rng.normal(size=(20, 30, 3)).astype(np.float32)
        out = np.asarray(geometry.resize_nearest(jnp.asarray(arr), (10, 12)))
        for i in range(10):
            for j in range(12):
                si = int(np.floor(i * 20 / 10))
                sj = int(np.floor(j * 30 / 12))
                np.testing.assert_array_equal(out[i, j], arr[si, sj])

    def test_nearest_upscale(self):
        arr = np.arange(12, dtype=np.float32).reshape(2, 2, 3)
        out = np.asarray(geometry.resize_nearest(jnp.asarray(arr), (4, 4)))
        assert out.shape == (4, 4, 3)
        np.testing.assert_array_equal(out[0, 0], arr[0, 0])
        np.testing.assert_array_equal(out[3, 3], arr[1, 1])

    def test_center_crop(self):
        arr = np.arange(7 * 9 * 2, dtype=np.float32).reshape(7, 9, 2)
        out = np.asarray(geometry.center_crop(jnp.asarray(arr), (5, 5)))
        # top = (7-5)//2 = 1, left = (9-5)//2 = 2
        np.testing.assert_array_equal(out, arr[1:6, 2:7])

    def test_resize_then_crop_pipeline(self):
        """The center_crop strategy of video_utils.py:296-308 at full scale."""
        rng = np.random.default_rng(3)
        H, W, crop = 480, 640, 384
        coords = rng.normal(size=(2, H, W, 3)).astype(np.float32)
        new_w = int(W * (crop / H))  # 512
        resized = geometry.resize_nearest(jnp.asarray(coords), (crop, new_w))
        cropped = np.asarray(geometry.center_crop(resized, (crop, crop)))
        assert cropped.shape == (2, crop, crop, 3)
        # Spot-check one pixel against the composed index rule
        left = (new_w - crop) // 2
        i, j = 100, 200
        si = int(np.floor(i * H / crop))
        sj = int(np.floor((j + left) * W / new_w))
        np.testing.assert_array_equal(cropped[0, i, j], coords[0, si, sj])


class TestPatchPooling:
    def _coords(self, v=2, h=384, w=384):
        rng = np.random.default_rng(4)
        return rng.normal(size=(v, h, w, 3)).astype(np.float32)

    def test_average_matches_torch(self):
        wc = self._coords()
        t = torch.tensor(wc)[:, :-6, :-6, :].permute(0, 3, 1, 2)
        ref = F.avg_pool2d(t, kernel_size=27, stride=27).permute(0, 2, 3, 1).numpy()
        got = np.asarray(geometry.average_coordinate_in_patch(jnp.asarray(wc)))
        assert got.shape == (2, 14, 14, 3)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_minmax_matches_torch(self):
        wc = self._coords()
        t = torch.tensor(wc)[:, :-6, :-6, :].permute(0, 3, 1, 2)
        mx = F.max_pool2d(t, kernel_size=27, stride=27).permute(0, 2, 3, 1)
        mn = -F.max_pool2d(-t, kernel_size=27, stride=27).permute(0, 2, 3, 1)
        ref = torch.stack([mn, mx], dim=3).numpy()
        got = np.asarray(geometry.minmax_coordinate_in_patch(jnp.asarray(wc)))
        assert got.shape == (2, 14, 14, 2, 3)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_sample_points_matches_torch(self):
        wc = self._coords()
        t = torch.tensor(wc)[:, :-6, :-6, :]
        t = t.reshape(-1, 14, 27, 14, 27, 3).permute(0, 1, 3, 2, 4, 5)
        nine = t[:, :, :, 4::9, 4::9, :].reshape(2, 14, 14, 9, 3).numpy()
        got9 = np.asarray(geometry.sample_n_points(jnp.asarray(wc), 9))
        np.testing.assert_allclose(got9, nine, rtol=1e-6)
        got5 = np.asarray(geometry.sample_n_points(jnp.asarray(wc), 5))
        np.testing.assert_allclose(got5, nine[:, :, :, 0::2, :], rtol=1e-6)
        got1 = np.asarray(geometry.sample_n_points(jnp.asarray(wc), 1))
        np.testing.assert_allclose(got1, nine[:, :, :, 4, :], rtol=1e-6)


class TestDiscretize:
    def test_matches_torch(self):
        rng = np.random.default_rng(5)
        wc = rng.uniform(-20, 20, size=(2, 14, 14, 3)).astype(np.float32)
        mn = np.array([-15.0, -15.0, -5.0], np.float32)
        mx = np.array([15.0, 15.0, 5.0], np.float32)
        t = torch.tensor(wc)
        t = torch.maximum(t, torch.tensor(mn))
        t = torch.minimum(t, torch.tensor(mx))
        ref = torch.round((t - torch.tensor(mn)) / 0.1).numpy()
        got = np.asarray(geometry.discrete_coords(jnp.asarray(wc), mn, mx, 0.1))
        np.testing.assert_allclose(got, ref, atol=1e-4)
        assert got.min() >= 0 and got.max() <= 300

    def test_voxel_index_range(self):
        wc = jnp.zeros((1, 4, 4, 3))
        got = np.asarray(geometry.discrete_coords(wc, (-15, -15, -5), (15, 15, 5), 0.1))
        np.testing.assert_allclose(got[..., 0], 150)
        np.testing.assert_allclose(got[..., 2], 50)


class TestTokenPooling:
    def test_bilinear_matches_torch_interpolate(self):
        rng = np.random.default_rng(6)
        feats = rng.normal(size=(3, 729, 24)).astype(np.float32)
        t = torch.tensor(feats).view(3, 27, 27, 24).permute(0, 3, 1, 2)
        ref = F.interpolate(t, size=[14, 14], mode="bilinear")
        ref = ref.permute(0, 2, 3, 1).reshape(3, 196, 24).numpy()
        got = np.asarray(geometry.pool_2d_tokens(jnp.asarray(feats), side=27,
                                                 stride=2, mode="bilinear"))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_avg_max_match_torch(self):
        rng = np.random.default_rng(7)
        feats = rng.normal(size=(2, 729, 8)).astype(np.float32)
        t = torch.tensor(feats).view(2, 27, 27, 8).permute(0, 3, 1, 2)
        ref_avg = F.avg_pool2d(t, 2).permute(0, 2, 3, 1).reshape(2, -1, 8).numpy()
        ref_max = F.max_pool2d(t, 2).permute(0, 2, 3, 1).reshape(2, -1, 8).numpy()
        got_avg = np.asarray(geometry.pool_2d_tokens(jnp.asarray(feats), 27, 2, "average"))
        got_max = np.asarray(geometry.pool_2d_tokens(jnp.asarray(feats), 27, 2, "max"))
        np.testing.assert_allclose(got_avg, ref_avg, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got_max, ref_max, rtol=1e-5, atol=1e-6)
