"""Tests for axis-aligned 3D box math vs the reference corner-based IoU
(box_utils.py) recomputed literally in numpy."""

import numpy as np

from video3d_tpu.ops import box as box_ops


def ref_box3d_iou_corners(c1, c2):
    mn1, mx1 = c1.min(axis=0), c1.max(axis=0)
    mn2, mx2 = c2.min(axis=0), c2.max(axis=0)
    lo, hi = np.maximum(mn1, mn2), np.minimum(mx1, mx2)
    inter = np.prod(np.maximum(hi - lo, 0))
    v1 = np.prod(mx1 - mn1)
    v2 = np.prod(mx2 - mn2)
    return inter / (v1 + v2 - inter + 1e-8)


class TestBoxIoU:
    def test_identity(self):
        b = np.array([1.0, 2.0, 3.0, 2.0, 2.0, 2.0])
        assert abs(box_ops.box3d_iou(b, b) - 1.0) < 1e-6

    def test_disjoint(self):
        b1 = np.array([0, 0, 0, 1, 1, 1.0])
        b2 = np.array([5, 5, 5, 1, 1, 1.0])
        assert box_ops.box3d_iou(b1, b2) == 0.0

    def test_half_overlap(self):
        b1 = np.array([0, 0, 0, 2, 2, 2.0])
        b2 = np.array([1, 0, 0, 2, 2, 2.0])
        # intersection = 1*2*2 = 4, union = 8+8-4 = 12
        np.testing.assert_allclose(box_ops.box3d_iou(b1, b2), 4 / 12, rtol=1e-6)

    def test_matches_corner_reference(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            c1 = rng.uniform(-5, 5, 3)
            s1 = rng.uniform(0.1, 4, 3)
            c2 = c1 + rng.uniform(-2, 2, 3)
            s2 = rng.uniform(0.1, 4, 3)
            corners1 = box_ops.get_3d_box_corners(c1, s1)
            corners2 = box_ops.get_3d_box_corners(c2, s2)
            ref = ref_box3d_iou_corners(corners1, corners2)
            got = box_ops.box3d_iou(np.concatenate([c1, s1]), np.concatenate([c2, s2]))
            np.testing.assert_allclose(got, ref, rtol=1e-6)

    def test_iou_matrix_shape(self):
        rng = np.random.default_rng(1)
        a = rng.uniform(0.5, 2, size=(4, 6))
        b = rng.uniform(0.5, 2, size=(7, 6))
        m = box_ops.iou_matrix(a, b)
        assert m.shape == (4, 7)
        np.testing.assert_allclose(m[2, 3], box_ops.box3d_iou(a[2], b[3]))

    def test_corner_layout_matches_reference(self):
        """get_3d_box_corners extents equal center ± size/2."""
        c, s = [1.0, -2.0, 0.5], [2.0, 4.0, 1.0]
        corners = box_ops.get_3d_box_corners(c, s)
        np.testing.assert_allclose(corners.min(axis=0), np.array(c) - np.array(s) / 2)
        np.testing.assert_allclose(corners.max(axis=0), np.array(c) + np.array(s) / 2)

    def test_convert_pc_to_box(self):
        pc = np.array([[0, 0, 0], [2, 4, 6.0]])
        center, size = box_ops.convert_pc_to_box(pc)
        np.testing.assert_allclose(center, [1, 2, 3])
        np.testing.assert_allclose(size, [2, 4, 6])
