"""Similarity-map extraction and overlay rendering.

Rebuilds the core of the reference's visualization suite
(exp/cxr_pt/inference/visualization/attention_map_base.py:12-57,
openvocab_attention_map.py:51-169, visualize_utils.py:74-150):
extract the sigmoid similarity map for (image, prompts), render it over
the radiograph with the inferno colormap and optional Gaussian smoothing,
and draw ground-truth boxes / mask contours.

All host-side numpy/matplotlib; the device work goes through the same
ZeroShotScorer as the eval harness (one code path for maps everywhere).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from radzero_tpu.data.dicom import load_eval_image
from radzero_tpu.eval.geometry import upsample_similarity_map
from radzero_tpu.eval.scorer import ZeroShotScorer


def extract_similarity_map(
    scorer: ZeroShotScorer,
    image_path: str,
    prompts: List[str],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (probs (N,), maps (N, H, W) in [0,1], image uint8 (H, W, 3)).

    Same flow as the reference's attention-map base
    (attention_map_base.py:12-42): compute_logits -> per-prompt map ->
    inverse-geometry upsample -> sigmoid.
    """
    with load_eval_image(image_path) as im:
        image = np.asarray(im.convert("RGB"))
    h, w = image.shape[:2]

    def load(_):
        return load_eval_image(image_path)

    logits, scores = scorer.score([image_path], load, prompts, need_scores=True)
    maps = upsample_similarity_map(scores[0], (h, w), scorer.image_processor.geometry)
    probs = 1.0 / (1.0 + np.exp(-logits[0]))
    maps = 1.0 / (1.0 + np.exp(-maps))
    return probs, maps, image


def _gaussian_blur(arr: np.ndarray, sigma: float) -> np.ndarray:
    if sigma <= 0:
        return arr
    try:
        import cv2

        k = int(sigma * 4) | 1
        return cv2.GaussianBlur(arr, (k, k), sigma)
    except ImportError:
        return arr


def overlay_heatmap(
    image: np.ndarray,
    heat: np.ndarray,
    alpha: float = 0.5,
    cmap: str = "inferno",
    blur_sigma: float = 0.0,
    vmin: Optional[float] = None,
    vmax: Optional[float] = None,
) -> np.ndarray:
    """Blend a [0,1] heatmap over an RGB image (uint8 in/out)."""
    import matplotlib.cm as cm

    heat = _gaussian_blur(heat.astype(np.float32), blur_sigma)
    lo = heat.min() if vmin is None else vmin
    hi = heat.max() if vmax is None else vmax
    norm = (heat - lo) / max(hi - lo, 1e-8)
    colored = (cm.get_cmap(cmap)(np.clip(norm, 0, 1))[..., :3] * 255).astype(np.uint8)
    out = (alpha * colored + (1 - alpha) * image.astype(np.float32)).astype(np.uint8)
    return out


def draw_boxes(
    image: np.ndarray, boxes: Sequence[Sequence[float]], color=(0, 255, 0), width: int = 3
) -> np.ndarray:
    out = image.copy()
    h, w = out.shape[:2]
    for x0, y0, x1, y1 in boxes:
        x0, y0 = max(int(x0), 0), max(int(y0), 0)
        x1, y1 = min(int(x1), w - 1), min(int(y1), h - 1)
        out[y0 : y0 + width, x0:x1] = color
        out[max(y1 - width, 0) : y1, x0:x1] = color
        out[y0:y1, x0 : x0 + width] = color
        out[y0:y1, max(x1 - width, 0) : x1] = color
    return out


def draw_mask_contours(
    image: np.ndarray, mask: np.ndarray, color=(0, 255, 0), width: int = 2
) -> np.ndarray:
    """Outline a binary mask (cv2 contours when available, edge mask fallback)."""
    out = image.copy()
    mask = mask.astype(np.uint8)
    try:
        import cv2

        contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        cv2.drawContours(out, contours, -1, color, width)
    except ImportError:
        edge = mask ^ np.roll(mask, 1, 0) | mask ^ np.roll(mask, 1, 1)
        out[edge > 0] = color
    return out


def render_attention_panel(
    scorer: ZeroShotScorer,
    image_path: str,
    prompts: List[str],
    save_path: str,
    *,
    boxes: Optional[Sequence[Sequence[float]]] = None,
    mask: Optional[np.ndarray] = None,
    blur_sigma: float = 8.0,
    alpha: float = 0.5,
    ncols: int = 4,
) -> np.ndarray:
    """Grid of per-prompt overlays with probabilities in the title
    (the open-vocab study renderer, openvocab_attention_map.py:172-276)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    probs, maps, image = extract_similarity_map(scorer, image_path, prompts)

    n = len(prompts) + 1
    ncols = min(ncols, n)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 4 * nrows), squeeze=False)

    base = image
    if boxes is not None:
        base = draw_boxes(base, boxes)
    if mask is not None:
        base = draw_mask_contours(base, mask)
    axes[0][0].imshow(base)
    axes[0][0].set_title("input")
    axes[0][0].axis("off")

    for i, prompt in enumerate(prompts):
        r, c = divmod(i + 1, ncols)
        over = overlay_heatmap(image, maps[i], alpha=alpha, blur_sigma=blur_sigma)
        axes[r][c].imshow(over)
        axes[r][c].set_title(f"{prompt}\np={probs[i]:.3f}", fontsize=9)
        axes[r][c].axis("off")
    for j in range(n, nrows * ncols):
        r, c = divmod(j, ncols)
        axes[r][c].axis("off")

    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return maps
