"""AnyRes 2D-image tiling (host preprocessing).

The reference's variable-resolution image path (mm_utils.py:87-338): pick the
grid resolution that wastes the least area for the image's aspect ratio,
resize-and-pad onto it, split into tower-sized tiles, and prepend a plain
resize of the original as the "base" view. Also the ``pad`` (expand2square)
aspect mode. Matches the reference exactly, including its documented quirk of
*resizing* (not padding) the base view (mm_utils.py:283-289).
"""

from __future__ import annotations

import ast
import math
import re
from typing import List, Sequence, Tuple, Union

import numpy as np
from PIL import Image

GridPinpoints = Union[str, Sequence[Sequence[int]]]


def parse_grid_pinpoints(grid_pinpoints: GridPinpoints,
                         patch_size: int) -> List[List[int]]:
    """'(1x1),...,(6x6)' range syntax / literal-list string / list ->
    [[w, h], ...] pixel resolutions (mm_utils.py:226-238, 256-271)."""
    if isinstance(grid_pinpoints, str) and "x" in grid_pinpoints:
        assert patch_size in (224, 336, 384, 448, 512), patch_size
        matches = re.findall(r"\((\d+)x(\d+)\)", grid_pinpoints)
        start, end = (tuple(map(int, matches[0])),
                      tuple(map(int, matches[-1])))
        grid = [(i, j) for i in range(start[0], end[0] + 1)
                for j in range(start[1], end[1] + 1)]
        return [[dim * patch_size for dim in pair] for pair in grid]
    if isinstance(grid_pinpoints, str):
        return [list(p) for p in ast.literal_eval(grid_pinpoints)]
    return [list(p) for p in grid_pinpoints]


def select_best_resolution(original_size: Tuple[int, int],
                           possible_resolutions: Sequence[Sequence[int]]
                           ) -> Tuple[int, int]:
    """Max effective resolution, then min wasted area (mm_utils.py:119-149)."""
    ow, oh = original_size
    best, max_eff, min_waste = None, 0, float("inf")
    for width, height in possible_resolutions:
        scale = min(width / ow, height / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = width * height - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            max_eff, min_waste, best = eff, waste, (width, height)
    return best


def resize_and_pad_image(image: Image.Image,
                         target_resolution: Tuple[int, int]) -> Image.Image:
    """Aspect-preserving resize centred on a black canvas
    (mm_utils.py:152-188; note math.ceil on the short side)."""
    ow, oh = image.size
    tw, th = target_resolution
    scale_w, scale_h = tw / ow, th / oh
    if scale_w < scale_h:
        nw, nh = tw, min(math.ceil(oh * scale_w), th)
    else:
        nh, nw = th, min(math.ceil(ow * scale_h), tw)
    resized = image.resize((nw, nh))
    out = Image.new("RGB", (tw, th), (0, 0, 0))
    out.paste(resized, ((tw - nw) // 2, (th - nh) // 2))
    return out


def divide_to_patches(image: Image.Image, patch_size: int) -> List[Image.Image]:
    """Row-major patch_size tiles (mm_utils.py:191-210)."""
    patches = []
    w, h = image.size
    for i in range(0, h, patch_size):
        for j in range(0, w, patch_size):
            patches.append(image.crop((j, i, j + patch_size, i + patch_size)))
    return patches


def get_anyres_image_grid_shape(image_size: Tuple[int, int],
                                grid_pinpoints: GridPinpoints,
                                patch_size: int) -> Tuple[int, int]:
    """(n_patches_wide, n_patches_high) for the selected resolution
    (mm_utils.py:213-240)."""
    res = parse_grid_pinpoints(grid_pinpoints, patch_size)
    w, h = select_best_resolution(image_size, res)
    return w // patch_size, h // patch_size


def expand2square(image: Image.Image, background_color) -> Image.Image:
    """Pad to square, image centred (mm_utils.py:305-316)."""
    w, h = image.size
    if w == h:
        return image
    side = max(w, h)
    out = Image.new(image.mode, (side, side), background_color)
    out.paste(image, ((side - w) // 2 if h > w else 0,
                      (side - h) // 2 if w > h else 0))
    return out


def process_anyres_image(image: Image.Image, processor,
                         grid_pinpoints: GridPinpoints) -> np.ndarray:
    """-> (n_tiles + 1, 3, S, S): [base resize] + row-major tiles
    (mm_utils.py:243-299; the base view is a plain resize — the reference
    keeps this known quirk for checkpoint compatibility and so do we)."""
    tile = processor.crop_size["height"]
    res = parse_grid_pinpoints(grid_pinpoints, tile)
    best = select_best_resolution(image.size, res)
    padded = resize_and_pad_image(image, best)
    patches = divide_to_patches(padded, tile)
    base = image.resize((tile, tile))
    return processor.preprocess([base] + patches)


def process_images_2d(images: Sequence[Image.Image], processor,
                      image_aspect_ratio: str,
                      grid_pinpoints: GridPinpoints = None):
    """The reference's ``process_images`` dispatch (mm_utils.py:319-338) for
    the modes this framework supports: anyres / anyres_max_* / pad / plain.
    Returns a list of (n_tiles+1, 3, S, S) arrays for anyres modes, else a
    stacked (N, 3, S, S) array."""
    if image_aspect_ratio == "anyres" or "anyres_max" in image_aspect_ratio:
        return [process_anyres_image(im, processor, grid_pinpoints)
                for im in images]
    if image_aspect_ratio == "pad":
        bg = tuple(int(x * 255) for x in processor.image_mean)
        return processor.preprocess([expand2square(im, bg) for im in images])
    return processor.preprocess(list(images))
