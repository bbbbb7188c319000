"""Visualization suite tests: panels and segmaps render and save."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from radzero_tpu.data.processing import BlipStyleImageProcessor
from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer
from radzero_tpu.eval.scorer import ZeroShotScorer
from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
    ViTConfig,
)
from radzero_tpu.models.radzero import init_radzero
from radzero_tpu.viz.overlays import (
    draw_boxes,
    draw_mask_contours,
    extract_similarity_map,
    overlay_heatmap,
    render_attention_panel,
)
from radzero_tpu.viz.segmap import compute_segmap, render_segmap

D = 32
CFG = RadZeroConfig(
    vision=ViTConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0,
        patch_size=14, pretrain_img_size=28, img_size=28,
    ),
    text=TextConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
        vocab_size=5003, max_position_embeddings=40,
    ),
    align=AlignConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0),
    loss=LossConfig(hidden_dim=D),
)


@pytest.fixture(scope="module")
def scorer():
    params = init_radzero(jax.random.PRNGKey(0), CFG)
    return ZeroShotScorer(
        params, CFG, BlipStyleImageProcessor(size=28),
        WhitespaceHashTokenizer(vocab_size=5003, max_length=12), batch_size=1,
    )


@pytest.fixture(scope="module")
def image_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("viz") / "x.png"
    arr = np.random.default_rng(0).integers(0, 256, (90, 70, 3), dtype=np.uint8)
    Image.fromarray(arr).save(p)
    return str(p)


def test_extract_similarity_map(scorer, image_path):
    probs, maps, image = extract_similarity_map(
        scorer, image_path, ["There is Edema", "There is no finding"]
    )
    assert probs.shape == (2,) and maps.shape == (2, 90, 70)
    assert image.shape == (90, 70, 3)
    assert np.all((maps >= 0) & (maps <= 1))


def test_overlay_and_drawing_primitives():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (50, 40, 3), dtype=np.uint8)
    heat = rng.random((50, 40)).astype(np.float32)
    out = overlay_heatmap(img, heat, blur_sigma=2.0)
    assert out.shape == img.shape and out.dtype == np.uint8

    boxed = draw_boxes(img, [[5, 5, 30, 30]])
    assert (boxed[5, 5:30] == (0, 255, 0)).all()

    mask = np.zeros((50, 40), bool)
    mask[10:20, 10:20] = True
    contoured = draw_mask_contours(img, mask)
    assert contoured.shape == img.shape


def test_render_attention_panel(scorer, image_path, tmp_path):
    out = str(tmp_path / "panel.png")
    maps = render_attention_panel(
        scorer, image_path, ["There is Edema", "There is Mass"], out,
        boxes=[[2, 2, 30, 30]],
    )
    assert os.path.exists(out)
    assert maps.shape == (2, 90, 70)


def test_segmap(scorer, image_path, tmp_path):
    seg, maps, image = compute_segmap(
        scorer, image_path, ["heart", "left lung"], threshold=None
    )
    assert seg.shape == (90, 70)
    assert set(np.unique(seg)) <= {0, 1}
    out = str(tmp_path / "seg.png")
    render_segmap(image, seg, ["heart", "left lung"], out)
    assert os.path.exists(out)


def test_filter_top_k_percent():
    from radzero_tpu.viz.qualitative import filter_top_k_percent

    m = np.arange(100, dtype=np.float32).reshape(10, 10) / 100.0
    out = filter_top_k_percent(m, 10)
    kept = out > -1.0
    assert kept.sum() == 10            # top 10% of 100 pixels
    assert out[kept].min() >= 0.90
    with pytest.raises(ValueError):
        filter_top_k_percent(m, 0)


def test_visualize_segmap_artifacts(image_path, tmp_path):
    from radzero_tpu.viz.qualitative import visualize_segmap

    rng = np.random.default_rng(1)
    prob = rng.random((3, 90, 70)).astype(np.float32)
    paths = visualize_segmap(
        image_path, prob, ["left lung", "right lung", "background"],
        str(tmp_path), overlay_alpha=0.5, colors=["#E377C2", "#66C2A5", "#000000"],
        bbox=[[5, 5, 30, 40]],
    )
    assert len(paths) == 2
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0
    assert os.path.basename(paths[0]).startswith("seg_map_")
    assert os.path.basename(paths[1]).startswith("only_segmap_")


def test_visualize_disease_segmap_requires_color_dict(image_path, tmp_path):
    from radzero_tpu.viz.qualitative import visualize_disease_segmap

    prob = np.random.default_rng(2).random((2, 90, 70)).astype(np.float32)
    with pytest.raises(ValueError):
        visualize_disease_segmap(image_path, prob, ["a", "b"], str(tmp_path), colors="tab10")
    with pytest.raises(NotImplementedError):
        visualize_disease_segmap(
            image_path, prob, ["a", "b"], str(tmp_path), colors={"a": "red"}
        )
    paths = visualize_disease_segmap(
        image_path, prob, ["Pneumothorax", "background"], str(tmp_path),
        colors={"Pneumothorax": "red", "background": "black"},
    )
    assert all(os.path.exists(p) for p in paths)


def test_process_and_visualize_map_driver(scorer, image_path, tmp_path):
    from radzero_tpu.viz.qualitative import process_and_visualize_map

    paths = process_and_visualize_map(
        scorer, image_path, ["There is Pneumothorax"], str(tmp_path),
        bbox=[10, 10, 40, 60], image_key="case1.png",
    )
    names = [os.path.basename(p) for p in paths]
    assert names == [
        "nobox_There is Pneumothorax_case1.png",
        "orig_case1.png",
        "There is Pneumothorax_case1.png",
    ]
    for p in paths:
        assert os.path.getsize(p) > 0


def test_process_and_visualize_segmentation_driver(scorer, image_path, tmp_path):
    from radzero_tpu.viz.qualitative import process_and_visualize_segmentation

    paths = process_and_visualize_segmentation(
        scorer, image_path, ["There is Pneumothorax", "There is Cardiomegaly"],
        str(tmp_path), k=20.0,
    )
    assert len(paths) == 2
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0
