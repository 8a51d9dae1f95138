"""Native C++ depth-PNG decoder: PIL parity across sizes and content."""

import os

import numpy as np
import pytest
from PIL import Image

from video3d_tpu.native import _ensure_lib, load_depth_png


@pytest.mark.skipif(_ensure_lib() is None, reason="no C++ toolchain")
class TestDepthPng:
    @pytest.mark.parametrize("shape", [(480, 640), (7, 13), (1, 1), (96, 128)])
    def test_matches_pil(self, tmp_path, shape):
        rng = np.random.default_rng(0)
        depth = rng.integers(0, 65535, size=shape).astype(np.uint16)
        p = str(tmp_path / "d.png")
        Image.fromarray(depth).save(p)
        got = load_depth_png(p)
        with Image.open(p) as im:
            ref = np.asarray(im).astype(np.uint16)
        np.testing.assert_array_equal(got, ref)

    def test_smooth_depth_all_filters(self, tmp_path):
        """Smooth gradients exercise Sub/Up/Average/Paeth filters."""
        y, x = np.mgrid[0:200, 0:300]
        depth = (1000 + 3 * y + 2 * x).astype(np.uint16)
        p = str(tmp_path / "smooth.png")
        Image.fromarray(depth).save(p)
        np.testing.assert_array_equal(load_depth_png(p), depth)

    def test_fallback_on_8bit(self, tmp_path):
        """8-bit PNGs fall back to PIL without error."""
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        p = str(tmp_path / "gray8.png")
        Image.fromarray(img).save(p)
        got = load_depth_png(p)
        np.testing.assert_array_equal(got, img.astype(np.uint16))
