"""Qualitative-assessment renderers and per-disease attention drivers.

Completes the visualization suite with the reference's dataset-study
flows (exp/cxr_pt/inference/visualization/):

- :func:`visualize_segmap` — argmax multi-class segmentation overlay
  with an explicit "background" class, two saved artifacts per image
  (side-by-side panel + overlay-only), per-class bbox drawing
  (qualitative_assessment_utils.py:11-155).
- :func:`visualize_disease_segmap` — same flow with a fixed
  class-name -> color dict and class-colored boxes
  (disease_qualitative_assessment_utils.py:11-214).
- :func:`filter_top_k_percent` — quantile filter keeping the top-k%
  of a similarity map (qualitative_assessment_utils.py:158-188).
- :func:`process_and_visualize_map` — the per-disease attention-map
  driver: blurred inferno blend saved as nobox_/orig_/labeled artifacts
  with ground-truth boxes (disease_attention_map.py:93-181).
- :func:`process_and_visualize_segmentation` — per-text maps + zero
  background map -> visualize_segmap (disease_attention_map.py:53-90).

Unlike the reference (one compute_logits call per text,
disease_attention_map.py:66-74), all prompts of a study run in ONE
batched scorer call.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Union

import numpy as np
from PIL import Image, ImageDraw

from radzero_tpu.eval.scorer import ZeroShotScorer
from radzero_tpu.viz.overlays import _gaussian_blur, extract_similarity_map


def filter_top_k_percent(similarity_map: np.ndarray, k: float) -> np.ndarray:
    """Keep the top k% of values, set the rest to -1
    (qualitative_assessment_utils.py:158-188)."""
    if not (0 < k <= 100):
        raise ValueError("k must be between 0 and 100")
    thr = np.quantile(similarity_map.ravel(), 1 - k / 100.0)
    return np.where(similarity_map >= thr, similarity_map, -1.0)


def _stem(image_path: str) -> str:
    return os.path.splitext(os.path.basename(image_path))[0]


def _resolve_colors(colors, class_names: List[str]) -> np.ndarray:
    """-> (num_classes, 3) float RGB in [0,1]."""
    import matplotlib.colors as mcolors
    import matplotlib.pyplot as plt

    if isinstance(colors, dict):
        missing = [c for c in class_names if c not in colors]
        if missing:
            raise NotImplementedError(f"{missing[0]} is not in colors")
        return np.array([mcolors.to_rgb(colors[c]) for c in class_names])
    if isinstance(colors, list):
        return np.array([mcolors.to_rgb(c) for c in colors])[: len(class_names)]
    if isinstance(colors, str):
        cmap = plt.get_cmap(colors)
        return cmap(np.linspace(0, 1, max(len(class_names), 2)))[: len(class_names), :3]
    raise ValueError("colors must be a dict, list, or colormap name")


def visualize_segmap(
    image: Union[str, np.ndarray],
    probability_map: np.ndarray,        # (num_classes, H, W)
    class_names: List[str],
    save_dir: str,
    *,
    overlay_alpha: float = 0.5,
    colors: Union[str, List[str], Dict[str, str]] = "tab10",
    bbox: Optional[Sequence[Sequence[float]]] = None,
    dpi: int = 200,
    name: Optional[str] = None,
) -> List[str]:
    """argmax segmentation overlay. Saves ``seg_map_<name>.png``
    (original | overlay panel with legend) and ``only_segmap_<name>.png``
    (overlay only). A class literally named "background" renders fully
    transparent and is dropped from the legend. Returns the saved paths.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.patches as mpatches
    import matplotlib.pyplot as plt

    if isinstance(image, str):
        name = name or _stem(image)
        with Image.open(image) as im:
            image = np.asarray(im.convert("RGB"))
    elif name is None:
        name = "image"
    h, w = image.shape[:2]

    segmap = np.argmax(probability_map, axis=0)
    bg_index = class_names.index("background") if "background" in class_names else None
    rgb = _resolve_colors(colors, class_names)

    alpha_mask = np.full((h, w), overlay_alpha, np.float32)
    if bg_index is not None:
        alpha_mask = np.where(segmap == bg_index, 0.0, overlay_alpha)
    colored = rgb[segmap]                                  # (H, W, 3)
    base = image.astype(np.float32) / 255.0
    composite = alpha_mask[..., None] * colored + (1 - alpha_mask[..., None]) * base
    composite = (composite * 255).astype(np.uint8)

    os.makedirs(save_dir, exist_ok=True)
    handles = [
        mpatches.Patch(color=rgb[i], label=class_names[i])
        for i in range(len(class_names))
        if i != bg_index
    ]

    # panel artifact: original | overlay + legend
    fig, axes = plt.subplots(1, 2, figsize=(2 * w / dpi * 2, h / dpi * 2), dpi=dpi)
    axes[0].imshow(image)
    axes[0].set_title("Original Image")
    axes[0].axis("off")
    axes[1].imshow(composite)
    axes[1].set_title("Segmentation Map Overlay")
    axes[1].axis("off")
    if bbox is not None:
        _draw_bboxes_mpl(axes[1], bbox, rgb, bg_index)
    if handles:
        fig.legend(handles=handles, loc="center left", bbox_to_anchor=(1, 0.5))
    panel_path = os.path.join(save_dir, f"seg_map_{name}.png")
    fig.savefig(panel_path, bbox_inches="tight")
    plt.close(fig)

    # overlay-only artifact
    fig = plt.figure(figsize=(w / dpi * 2, h / dpi * 2), dpi=dpi)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.imshow(composite)
    if bbox is not None:
        _draw_bboxes_mpl(ax, bbox, rgb, bg_index)
    ax.axis("off")
    only_path = os.path.join(save_dir, f"only_segmap_{name}.png")
    fig.savefig(only_path, pad_inches=0)
    plt.close(fig)
    return [panel_path, only_path]


def _draw_bboxes_mpl(ax, bbox, rgb: np.ndarray, bg_index) -> None:
    """Boxes colored by class order, skipping the background color
    (qualitative_assessment_utils.py draw_bboxes)."""
    import matplotlib.patches as mpatches

    fg = [rgb[i] for i in range(len(rgb)) if i != bg_index]
    for j, box in enumerate(bbox):
        x0, y0, x1, y1 = box
        color = fg[j % len(fg)] if fg else (1, 0, 0)
        ax.add_patch(
            mpatches.Rectangle((x0, y0), x1 - x0, y1 - y0, fill=False,
                               edgecolor=color, linewidth=2)
        )


def visualize_disease_segmap(
    image: Union[str, np.ndarray],
    probability_map: np.ndarray,
    class_names: List[str],
    save_dir: str,
    colors: Dict[str, str],
    *,
    overlay_alpha: float = 0.5,
    bbox: Optional[Sequence[Sequence[float]]] = None,
    dpi: int = 200,
    name: Optional[str] = None,
) -> List[str]:
    """Disease variant: colors MUST be a class-name -> color dict (a
    missing class raises, matching
    disease_qualitative_assessment_utils.py:34-39)."""
    if not isinstance(colors, dict):
        raise ValueError("visualize_disease_segmap requires a class->color dict")
    return visualize_segmap(
        image, probability_map, class_names, save_dir,
        overlay_alpha=overlay_alpha, colors=colors, bbox=bbox, dpi=dpi, name=name,
    )


def process_and_visualize_map(
    scorer: ZeroShotScorer,
    image_path: str,
    text_list: List[str],
    save_dir: str,
    *,
    bbox: Optional[Sequence] = None,
    bbox_color: str = "red",
    alpha: float = 0.2,
    width: int = 3,
    image_key: Optional[str] = None,
) -> List[str]:
    """Per-disease attention-map driver (disease_attention_map.py:93-181):
    sigmoid full-res map of text_list[0] -> Gaussian blur -> inferno ->
    PIL blend; saves ``nobox_<texts>_<key>``, ``orig_<key>`` (original +
    boxes), and ``<texts>_<key>`` (blend + boxes). Returns saved paths.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _, maps, image = extract_similarity_map(scorer, image_path, [text_list[0]])
    sim = _gaussian_blur(maps[0].astype(np.float32), 1.0)

    cmap = plt.get_cmap("inferno")
    colored = (cmap(np.clip(sim, 0, 1))[..., :3] * 255).astype(np.uint8)
    pil_image = Image.fromarray(image)
    blended = Image.blend(pil_image, Image.fromarray(colored), alpha=alpha)

    key = image_key or os.path.basename(image_path)
    tag = "_".join(text_list)
    os.makedirs(save_dir, exist_ok=True)
    paths = []

    nobox = os.path.join(save_dir, f"nobox_{tag}_{key}")
    blended.save(nobox)
    paths.append(nobox)

    def draw_on(img: Image.Image) -> Image.Image:
        if bbox is None:
            return img
        d = ImageDraw.Draw(img)
        boxes = bbox if isinstance(bbox[0], (list, tuple)) else [bbox]
        for box in boxes:
            d.rectangle(list(box), outline=bbox_color, width=width)
        return img

    orig = os.path.join(save_dir, f"orig_{key}")
    draw_on(pil_image).save(orig)
    paths.append(orig)

    labeled = os.path.join(save_dir, f"{tag}_{key}")
    draw_on(blended).save(labeled)
    paths.append(labeled)
    return paths


def process_and_visualize_segmentation(
    scorer: ZeroShotScorer,
    image_path: str,
    text_list: List[str],
    save_dir: str,
    *,
    k: Optional[float] = None,
    dpi: int = 200,
    overlay_alpha: float = 0.5,
    bbox: Optional[Sequence[Sequence[float]]] = None,
    colors: Union[str, List[str], Dict[str, str]] = "tab10",
) -> List[str]:
    """Open-vocabulary segmentation study (disease_attention_map.py:53-90):
    per-text sigmoid maps (optionally top-k filtered) + an explicit zero
    "background" map -> argmax visualize_segmap. One batched scorer call
    replaces the reference's per-text loop."""
    _, maps, image = extract_similarity_map(scorer, image_path, list(text_list))
    if k is not None:
        maps = np.stack([filter_top_k_percent(m, k) for m in maps])
    class_names = list(text_list) + ["background"]
    prob = np.concatenate([maps, np.zeros_like(maps[:1])], axis=0)
    if isinstance(colors, dict) and "background" not in colors:
        colors = {**colors, "background": "#000000"}
    return visualize_segmap(
        image, prob, class_names, save_dir,
        overlay_alpha=overlay_alpha, colors=colors, bbox=bbox, dpi=dpi,
        name=_stem(image_path),
    )
