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


def build_anyres_gather_plan(image_size: Tuple[int, int],
                             grid_pinpoints,
                             vision_image_size: int,
                             num_patches_per_side: int,
                             image_aspect_ratio: str = "anyres",
                             patch_merge_type: str = "spatial_unpad"):
    """Host-side integer plan equivalent of :func:`arrange_anyres_features`.

    The arrangement (base-prepend, grid layout, unpad crop, newline
    insertion) is pure index arithmetic on the (tile, row, col) feature
    grid, so it can be precomputed as a gather over the flattened
    ``(n_tiles+1) * hw*hw`` projected features plus a newline mask — which
    makes the 2D-image path STATIC-SHAPE batchable under jit (training,
    batched inference), unlike the reference's per-sample dynamic reshapes
    (llava_arch.py:574-629).

    Not expressible as a gather: the ``anyres_max_N`` bilinear shrink
    (llava_arch.py:603-614) — use the dynamic path for that.

    Returns:
      (gather (T,) int32 indices into the flat feature rows,
       newline (T,) bool — True rows read ``image_newline`` instead).
    """
    import numpy as np

    hw = num_patches_per_side
    if "anyres_max" in image_aspect_ratio:
        raise NotImplementedError("anyres_max interpolates; no gather plan")
    if patch_merge_type == "flat":
        n_tiles = 1 + _n_grid_tiles(image_size, grid_pinpoints,
                                    vision_image_size, image_aspect_ratio)
        return (np.arange(n_tiles * hw * hw, dtype=np.int32),
                np.zeros((n_tiles * hw * hw,), bool))

    if image_aspect_ratio == "anyres":
        npw, nph = get_anyres_image_grid_shape(image_size, grid_pinpoints,
                                               vision_image_size)
    else:                              # highres / crop_split: fixed 2x2 view
        npw = nph = 2

    def flat_idx(tile, r, c):
        return (1 + tile) * hw * hw + r * hw + c   # tiles follow the base

    gather: list = []
    newline: list = []
    if "unpad" in patch_merge_type:
        # pixel-row-major grid (nph*hw, npw*hw), then the unpad crop
        ch, cw = nph * hw, npw * hw
        ow, oh = image_size
        if ow / oh > cw / ch:
            pad = (ch - int(oh * (cw / ow))) // 2
            r0, r1, c0, c1 = pad, ch - pad, 0, cw
        else:
            pad = (cw - int(ow * (ch / oh))) // 2
            r0, r1, c0, c1 = 0, ch, pad, cw - pad
        for R in range(r0, r1):
            t_row, r = divmod(R, hw)
            for C in range(c0, c1):
                t_col, c = divmod(C, hw)
                gather.append(flat_idx(t_row * npw + t_col, r, c))
                newline.append(False)
            gather.append(0)
            newline.append(True)       # image_newline terminates each row
    else:                              # 'spatial': tile-major, no newline
        for t_row in range(nph):
            for r in range(hw):
                for t_col in range(npw):
                    for c in range(hw):
                        gather.append(flat_idx(t_row * npw + t_col, r, c))
                        newline.append(False)

    if "nobase" not in patch_merge_type:
        gather = list(range(hw * hw)) + gather     # base view first (tile 0)
        newline = [False] * (hw * hw) + newline
    return (np.asarray(gather, np.int32), np.asarray(newline, bool))


def _n_grid_tiles(image_size, grid_pinpoints, vision_image_size,
                  image_aspect_ratio):
    if image_aspect_ratio == "anyres":
        npw, nph = get_anyres_image_grid_shape(image_size, grid_pinpoints,
                                               vision_image_size)
        return npw * nph
    return 4


def encode_image_2d_batch(params, cfg, tiles: jax.Array,
                          gather: jax.Array, newline: jax.Array,
                          valid: jax.Array, remat: bool = False) -> jax.Array:
    """Batched static-shape 2D-image encoder (training / batched serving).

    Args:
      tiles: (B, maxT, 3, S, S) pixel tiles, zero-padded past each sample's
        tile count (padded tiles are never gathered).
      gather: (B, Tv) int32 plan rows (build_anyres_gather_plan, padded 0).
      newline: (B, Tv) bool — read ``image_newline`` instead.
      valid: (B, Tv) bool — False rows zero out (padding).
    Returns:
      (B, Tv, D) spliceable vision block.
    """
    from video3d_tpu.models import siglip
    from video3d_tpu.models.llava_video3d import project_features

    B, maxT = tiles.shape[:2]
    flat = tiles.reshape(B * maxT, *tiles.shape[2:])
    feats = siglip.vision_tower_forward(params["vision"], flat, cfg.vision,
                                        remat=remat)
    feats = project_features(params["projector"], feats)
    D = feats.shape[-1]
    feats = feats.reshape(B, -1, D)                      # (B, maxT*hw*hw, D)
    block = jnp.take_along_axis(feats, gather[:, :, None], axis=1)
    nl = params["image_newline"].astype(block.dtype)
    block = jnp.where(newline[:, :, None], nl[None, None, :], block)
    return jnp.where(valid[:, :, None], block, 0)


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
