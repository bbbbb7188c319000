"""Open-vocabulary segmentation-map renderers.

Rebuilds the reference's qualitative assessment renderers
(qualitative_assessment_utils.py:11-188,
disease_qualitative_assessment_utils.py:11-214, anatomy_segmentation.py,
disease_segmentation.py): per-class similarity maps -> argmax /
thresholded multi-class segmentation maps rendered with a color legend.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from radzero_tpu.eval.scorer import ZeroShotScorer
from radzero_tpu.viz.overlays import extract_similarity_map

# anatomy / disease prompt catalogs from the reference study scripts
ANATOMY_CLASSES = [
    "right lung", "left lung", "heart", "mediastinum", "trachea",
    "right clavicle", "left clavicle", "spine", "aortic arch", "diaphragm",
]
DISEASE_CLASSES = [
    "Atelectasis", "Cardiomegaly", "Consolidation", "Edema",
    "Pleural Effusion", "Pneumonia", "Pneumothorax", "Mass", "Nodule",
]


def compute_segmap(
    scorer: ZeroShotScorer,
    image_path: str,
    class_names: List[str],
    *,
    prompt_template: str = "There is {}",
    threshold: Optional[float] = 0.5,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (segmap (H, W) int; -1 = background, maps (N, H, W), image).

    argmax over per-class sigmoid maps; pixels whose winning probability
    is below ``threshold`` become background (threshold=None disables).
    """
    prompts = [prompt_template.format(c) for c in class_names]
    _, maps, image = extract_similarity_map(scorer, image_path, prompts)
    seg = maps.argmax(axis=0).astype(np.int32)
    if threshold is not None:
        seg = np.where(maps.max(axis=0) >= threshold, seg, -1)
    return seg, maps, image


def render_segmap(
    image: np.ndarray,
    segmap: np.ndarray,
    class_names: List[str],
    save_path: str,
    alpha: float = 0.45,
    cmap: str = "tab10",
) -> None:
    """Colored class overlay with a legend (visualize_segmap flow)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.cm as cm
    import matplotlib.patches as mpatches
    import matplotlib.pyplot as plt

    colors = cm.get_cmap(cmap)(np.linspace(0, 1, max(len(class_names), 2)))[:, :3]
    overlay = image.astype(np.float32).copy()
    for i in range(len(class_names)):
        m = segmap == i
        overlay[m] = (1 - alpha) * overlay[m] + alpha * (colors[i] * 255)

    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(overlay.astype(np.uint8))
    ax.axis("off")
    present = sorted(set(segmap[segmap >= 0].ravel().tolist()))
    handles = [
        mpatches.Patch(color=colors[i], label=class_names[i]) for i in present
    ]
    if handles:
        ax.legend(handles=handles, loc="lower right", fontsize=8)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(save_path, dpi=120)
    plt.close(fig)


def anatomy_segmentation(
    scorer: ZeroShotScorer, image_path: str, save_dir: str
) -> str:
    seg, _, image = compute_segmap(scorer, image_path, ANATOMY_CLASSES, threshold=None)
    out = os.path.join(save_dir, "anatomy_segmap.png")
    render_segmap(image, seg, ANATOMY_CLASSES, out)
    return out


def disease_segmentation(
    scorer: ZeroShotScorer, image_path: str, save_dir: str, threshold: float = 0.5
) -> str:
    seg, _, image = compute_segmap(
        scorer, image_path, DISEASE_CLASSES, threshold=threshold
    )
    out = os.path.join(save_dir, "disease_segmap.png")
    render_segmap(image, seg, DISEASE_CLASSES, out)
    return out
