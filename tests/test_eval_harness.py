"""End-to-end zero-shot eval harness test on synthetic disk datasets.

Builds miniature Chexpert / ChestXDet10 / MS-CXR / SIIM / RSNA datasets
(PNG images; the DICOM reader is suffix-dispatched) and runs the full
Inference facade with a small random model, asserting every task
produces finite metrics and result.json files.
"""

import os

import jax
import numpy as np
import pandas as pd
import pytest

from radzero_tpu.data.processing import BlipStyleImageProcessor
from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer
from radzero_tpu.eval.inference import Inference
from radzero_tpu.eval.scorer import ZeroShotScorer
from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
    ViTConfig,
)
from radzero_tpu.models.radzero import init_radzero

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
def data_root(tmp_path_factory):
    from tools import synthetic_eval_data as sd

    root = str(tmp_path_factory.mktemp("evaldata"))
    sd.build_eval_root(root, n=8)  # imgs + Chexpert + ChestXDet10 + MS-CXR
    sd.build_siim(root, n=8)  # png instead of dcm; suffix-dispatched loader
    sd.build_rsna(root, n=8)
    return root


@pytest.fixture(scope="module")
def scorer():
    params = init_radzero(jax.random.PRNGKey(0), CFG)
    return ZeroShotScorer(
        params,
        CFG,
        BlipStyleImageProcessor(size=28),
        WhitespaceHashTokenizer(vocab_size=5003, max_length=12),
        batch_size=4,
    )


def test_classification_suite(data_root, scorer, tmp_path):
    inf = Inference(["Chexpert"], [], [], data_root, batch_size=4)
    out = inf.classification(scorer, str(tmp_path / "cls"))
    assert out is not None and "Chexpert" in out
    assert 0.0 <= out["Chexpert"]["Total AUC"] <= 1.0
    assert os.path.exists(tmp_path / "cls" / "result.json")
    assert os.path.exists(tmp_path / "cls" / "Chexpert.csv")
    sims = pd.read_csv(tmp_path / "cls" / "Chexpert.csv")
    assert sims.shape == (8, 5)


def test_grounding_suite(data_root, scorer, tmp_path):
    inf = Inference([], ["ChestXDet10", "MS-CXR"], [], data_root, batch_size=4)
    out = inf.grounding(scorer, str(tmp_path / "det"))
    assert out is not None
    assert 0.0 <= out["ChestXDet10"]["mean_pointing_score"] <= 1.0
    assert 0.0 <= out["MS-CXR"] <= 1.0
    # every MS-CXR bbox covers the whole image -> accuracy must be 1
    assert out["MS-CXR"] == 1.0


def test_segmentation_suite(data_root, scorer, tmp_path):
    inf = Inference([], [], ["SIIM", "RSNA"], data_root, batch_size=4)
    out = inf.segmentation(scorer, str(tmp_path / "seg"), compute_pixel_level_auroc=True)
    assert out is not None
    for k in ("SIIM", "RSNA"):
        r = out[k]
        assert 0.0 <= r["auc"] <= 1.0
        assert 0.0 <= r["dice"] <= 1.0
        assert 0.0 <= r["best_threshold"] <= 1.0
        assert "pixel_level_auroc" in r


def test_model_inference_public_api(data_root, scorer):
    """README quickstart parity: (similarity_prob, similarity_map)."""
    from radzero_tpu.eval.api import model_inference

    params = scorer.params
    prob, smap = model_inference(
        os.path.join(data_root, "imgs/0.png"),
        "There is fibrosis",
        WhitespaceHashTokenizer(vocab_size=5003, max_length=12),
        BlipStyleImageProcessor(size=28),
        (params, CFG),
    )
    assert prob.shape == (1,)
    assert 0.0 <= float(prob[0]) <= 1.0
    assert smap.shape == (1, 70, 60)
    assert np.all((smap >= 0) & (smap <= 1))


def test_segmentation_streaming_matches_materializing(data_root, scorer):
    """streaming=True must reproduce the materializing path's dice,
    threshold, specificity, and image AUC exactly."""
    import pandas as pd

    from radzero_tpu.eval.segmentation import eval_segmentation_siim

    csv = pd.read_csv(os.path.join(data_root, "SIIM", "test.csv"))
    ref = eval_segmentation_siim(scorer, csv, "There is Pneumothorax", data_root)
    out = eval_segmentation_siim(
        scorer, csv, "There is Pneumothorax", data_root, streaming=True
    )
    for key in ("auc", "dice", "best_threshold", "specificity"):
        import numpy as np

        np.testing.assert_allclose(out[key], ref[key], rtol=0, atol=1e-12,
                                   err_msg=key)
