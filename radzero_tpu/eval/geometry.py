"""Similarity-map inverse geometry: 37x37 patch maps -> original pixels.

Rebuilds the 4-way processor-specific projection of
exp/cxr_pt/inference/segmentation_utils.py:36-122 and
grounding_utils.py:166-261. The map produced at the model's input
geometry must be warped back through the *inverse* of the preprocessing
(resize / pad-then-resize / resize-then-crop / M3AE pad+crop) so pixel
coordinates line up with ground-truth boxes and masks.

Bilinear upsampling runs on device via the torch-parity matmul resize
(radzero_tpu.ops.resize) — per-size compiled once, batched over any
leading dims, so the segmentation path can process same-sized DICOMs
in one shot instead of the reference's batch-1 loop
(SURVEY.md §7 'quirks to fix').
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radzero_tpu.ops.resize import bilinear_resize_2d

FILL = -999.0  # out-of-crop filler (ref grounding_utils.py:214, seg:85,96)


@functools.lru_cache(maxsize=512)
def _resize_fn(in_h: int, in_w: int, out_h: int, out_w: int):
    return jax.jit(lambda x: bilinear_resize_2d(x, out_h, out_w))


def _bilinear(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    in_h, in_w = x.shape[-2], x.shape[-1]
    return np.asarray(_resize_fn(in_h, in_w, out_h, out_w)(jnp.asarray(x, jnp.float32)))


def upsample_similarity_map(
    scores: np.ndarray, origin_size: Tuple[int, int], geometry: str = "resize"
) -> np.ndarray:
    """Project flat patch scores (..., L) with L=g*g to (..., H, W)."""
    height, width = origin_size
    g = int(round(scores.shape[-1] ** 0.5))
    grid = scores.reshape(*scores.shape[:-1], g, g)

    if geometry == "resize":  # Blip / XrayDINOv2 (seg_utils.py:62-70)
        return _bilinear(grid, height, width)

    if geometry == "aspect_pad":  # AspectRatio processor (seg_utils.py:41-60)
        padded = max(height, width)
        up = _bilinear(grid, padded, padded)
        top = (padded - height) // 2
        left = (padded - width) // 2
        return up[..., top : top + height, left : left + width]

    if geometry == "center_crop":  # Bit processor (seg_utils.py:72-91)
        short = min(height, width)
        up = _bilinear(grid, short, short)
        out = np.full((*scores.shape[:-1], height, width), FILL, np.float32)
        top = (height - short) // 2
        left = (width - short) // 2
        out[..., top : top + short, left : left + short] = up
        return out

    if geometry == "m3ae":  # M3AE pad+crop composite (seg_utils.py:92-121)
        padded = max(height, width)
        cropped = int(padded * 224 / 256)
        up = _bilinear(grid, cropped, cropped)
        canvas = np.full((*scores.shape[:-1], padded, padded), FILL, np.float32)
        off = (padded - cropped) // 2
        canvas[..., off : off + cropped, off : off + cropped] = up
        top = (padded - height) // 2
        left = (padded - width) // 2
        return canvas[..., top : top + height, left : left + width]

    raise NotImplementedError(f"geometry {geometry!r}")


def grounding_point(
    scores: np.ndarray, origin_size: Tuple[int, int], geometry: str = "resize"
) -> Tuple[int, int]:
    """(x, y) of the map argmax in original pixel coordinates
    (ref grounding_utils.py:166-261)."""
    height, width = origin_size
    up = upsample_similarity_map(scores, origin_size, geometry)
    flat_idx = int(np.argmax(up.reshape(-1)))
    y, x = np.unravel_index(flat_idx, (height, width))
    return int(x), int(y)


def is_point_in_bbox(bbox_list, point) -> bool:
    """point-in-any-box test (ref grounding_utils.py:264-280)."""
    x, y = point
    for x_min, y_min, x_max, y_max in bbox_list:
        if x_min <= x <= x_max and y_min <= y <= y_max:
            return True
    return False
