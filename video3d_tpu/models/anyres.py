"""AnyRes 2D-image feature arrangement (the spatial_unpad merge).

Equivalent of the reference's multi-patch branch in prepare_inputs_labels
(llava_arch.py:572-634): tile features are laid out on the anyres grid,
padding introduced by resize_and_pad is cropped off (``unpad_image``,
llava_arch.py's mm_utils import), an ``image_newline`` embedding terminates
every pixel row, anyres_max optionally bilinearly downsamples the grid, and
the base-view features are prepended.

Host-side shapes are data-dependent (every image picks its own grid), so this
runs per sample before splicing — exactly like the reference — and the
resulting flat token block goes through the standard static splice plan.
"""

from __future__ import annotations

import math
import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from video3d_tpu.data.anyres import get_anyres_image_grid_shape


def unpad_image(tensor: jax.Array, original_size: Tuple[int, int]) -> jax.Array:
    """Crop the letterbox padding off (C, H, W) features.

    ``original_size`` is (width, height) of the raw image; the feature map was
    produced from resize_and_pad onto the tile grid (mm_utils.py unpad_image).
    """
    ow, oh = original_size
    _, ch, cw = tensor.shape
    if ow / oh > cw / ch:            # image wider than canvas: rows padded
        scale = cw / ow
        nh = int(oh * scale)
        pad = (ch - nh) // 2
        return tensor[:, pad:ch - pad, :]
    scale = ch / oh                   # image taller: columns padded
    nw = int(ow * scale)
    pad = (cw - nw) // 2
    return tensor[:, :, pad:cw - pad]


def arrange_anyres_features(tile_features: jax.Array,
                            image_size: Tuple[int, int],
                            grid_pinpoints,
                            vision_image_size: int,
                            num_patches_per_side: int,
                            image_newline: jax.Array,
                            image_aspect_ratio: str = "anyres",
                            patch_merge_type: str = "spatial_unpad") -> jax.Array:
    """(n_tiles + 1, P, D) projected tile features -> (tokens, D) block.

    Follows llava_arch.py:574-629 for merge types ``spatial_unpad`` (unpad +
    newline per row + base prepended) and ``spatial`` (plain grid flatten),
    with the ``anyres_max_N`` bilinear shrink (llava_arch.py:603-614).
    """
    if patch_merge_type == "flat":
        # llava_arch.py:518-519: all tiles (incl. base) flattened in order
        return tile_features.reshape(-1, tile_features.shape[-1])

    base = tile_features[0]
    tiles = tile_features[1:]
    hw = num_patches_per_side
    assert base.shape[0] == hw * hw, (base.shape, hw)

    max_num_patches = None
    m = re.match(r"anyres_max_(\d+)", image_aspect_ratio)
    if m:
        max_num_patches = int(m.group(1))

    if image_aspect_ratio == "anyres" or "anyres_max" in image_aspect_ratio:
        npw, nph = get_anyres_image_grid_shape(image_size, grid_pinpoints,
                                               vision_image_size)
    else:
        # non-anyres multi-tile aspects (highres / crop_split) view the
        # tiles as a fixed 2x2 grid (llava_arch.py:596-597)
        npw = nph = 2
    D = tiles.shape[-1]
    feat = tiles.reshape(nph, npw, hw, hw, D)

    if "unpad" in patch_merge_type:
        # (D, nph*hw, npw*hw) pixel-row-major grid
        feat = feat.transpose(4, 0, 2, 1, 3).reshape(D, nph * hw, npw * hw)
        feat = unpad_image(feat, image_size)
        if max_num_patches is not None:
            c, h, w = feat.shape
            times = math.sqrt(h * w / (max_num_patches * hw ** 2))
            if times > 1.1:
                # antialias=False matches torch F.interpolate(bilinear)
                # (llava_arch.py:612)
                feat = jax.image.resize(
                    feat, (c, int(h // times), int(w // times)),
                    method="bilinear", antialias=False)
        nl = jnp.broadcast_to(image_newline[:, None, None].astype(feat.dtype),
                              (D, feat.shape[1], 1))
        feat = jnp.concatenate([feat, nl], axis=-1)
        feat = feat.reshape(D, -1).T                      # (tokens, D)
    else:
        # 'spatial': tile-major flatten, no unpad/newline (llava_arch.py:622-624)
        feat = feat.transpose(0, 2, 1, 3, 4).reshape(-1, D)

    if "nobase" not in patch_merge_type:
        feat = jnp.concatenate([base, feat], axis=0)
    return feat


def encode_image_2d(params, cfg, tiles: jax.Array,
                    image_size: Tuple[int, int],
                    grid_pinpoints,
                    image_aspect_ratio: str = "anyres",
                    patch_merge_type: str = "spatial_unpad") -> jax.Array:
    """Full 2D path: (n_tiles + 1, 3, S, S) pixel tiles -> (tokens, D) block.

    Tower + projector per tile (no video pooling / 3D PE — the reference's 2D
    branch bypasses get_2dPool and world-coordinate PE entirely), then the
    anyres arrangement above.
    """
    from video3d_tpu.models import siglip
    from video3d_tpu.models.llava_video3d import project_features

    feats = siglip.vision_tower_forward(params["vision"], tiles, cfg.vision)
    feats = project_features(params["projector"], feats)  # (n+1, P, D)
    return arrange_anyres_features(
        feats, image_size, grid_pinpoints, cfg.vision.image_size,
        cfg.vision.num_patches_per_side, params["image_newline"],
        image_aspect_ratio=image_aspect_ratio,
        patch_merge_type=patch_merge_type)
