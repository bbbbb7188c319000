"""Runbook ``--datasets`` dry-run: the FULL zero-shot registry end to
end through the real-checkpoint CLI (VERDICT r3 next-step #6).

Builds a hermetic hub snapshot at the TRUE reference key layout (tiny
dims so CPU can run it), with tokenizer + preprocessor assets, plus
miniature versions of EVERY registry dataset — including OpenI /
PadChest / ChestXray14, whose CARZero-style mergers
(eval/mergers.py:74-131) were previously untested — and runs

    python tools/run_real_checkpoint.py --hub_snapshot ... --config ...
        --image ... --datasets --data_root ... --batch_size 4

asserting every stage: conversion, public-API inference, vocab
token-for-token parity (WordPieceTokenizer vs AutoTokenizer on the same
vocab.txt), full-registry selection, and all three task families'
metrics in result.json. With the real Deepnoid/RadZero snapshot the
invocation is identical minus --config (flagship dims are the default).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

D = 32
VOCAB = [
    "<s>", "<pad>", "</s>", "[UNK]", "[CLS]", "[SEP]", "[PAD]", "<mask>",
    "there", "is", "no", "of", "the", "a", "in", "with", "and", "may", "be",
    "pleural", "effusion", "pneumo", "##thorax", "##nia", "consolidation",
    "left", "right", "lower", "upper", "lobe", "lung", "cardio", "##megaly",
    "atelectasis", "mass", "nodule", "fibrosis", "fracture", "emphysema",
    "calcification", "edema", "opacity", "mild", "severe", "clear",
    ".", ",", "-", ";", ":", "!", "?", "(", ")",
    "1", "2", "3", "c", "##0", "##1", "##2", "##5", "##9",
]


def _tiny_reference_stack():
    from transformers import Dinov2Config, Dinov2Model, MPNetConfig, MPNetModel
    from transformers.models.dinov2.modeling_dinov2 import Dinov2Layer

    torch.manual_seed(0)
    vcfg = Dinov2Config(
        image_size=28, patch_size=14, hidden_size=D, num_hidden_layers=1,
        num_attention_heads=2, mlp_ratio=2,
    )
    vision = Dinov2Model(vcfg).eval()
    align = torch.nn.ModuleList([Dinov2Layer(vcfg)]).eval()
    tcfg = MPNetConfig(
        vocab_size=len(VOCAB), hidden_size=D, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64, max_position_embeddings=72,
    )
    text = MPNetModel(tcfg).eval()
    shared_ln = torch.nn.LayerNorm(D).eval()
    return vision, align, text, shared_ln


MODEL_CONFIG = {
    "vision_config": {
        "model_type": "dinov2", "hidden_size": D, "num_hidden_layers": 1,
        "num_attention_heads": 2, "mlp_ratio": 2.0, "patch_size": 14,
        "pretrain_img_size": 28, "img_size": 28, "attn_impl": "xla",
    },
    "text_config": {
        "hidden_size": D, "num_hidden_layers": 1, "num_attention_heads": 2,
        "intermediate_size": 64, "vocab_size": len(VOCAB),
        "max_position_embeddings": 72,
    },
    "align_transformer_config": {
        "hidden_size": D, "num_hidden_layers": 1, "num_attention_heads": 2,
        "mlp_ratio": 2.0,
    },
    "loss": {"RadZeroLoss": {"hidden_dim": D}},
}


def _build_snapshot(snap: str) -> None:
    from safetensors.numpy import save_file

    vision, align, text, shared_ln = _tiny_reference_stack()
    sd = {}
    for k, v in vision.state_dict().items():
        sd[f"vision_model.{k}"] = v.numpy()
    for k, v in align.state_dict().items():
        sd[f"align_transformer.transformer_layers.layer.{k}"] = v.numpy()
    for k, v in text.state_dict().items():
        sd[f"text_model.{k}"] = v.numpy()
    sd["loss_fns.RadZeroLoss.loss_temperature"] = np.array([np.log(0.07)], np.float32)
    sd["loss_fns.RadZeroLoss.layer_norm.weight"] = np.ones((D,), np.float32)
    sd["loss_fns.RadZeroLoss.layer_norm.bias"] = np.zeros((D,), np.float32)
    os.makedirs(snap, exist_ok=True)
    save_file(sd, os.path.join(snap, "model.safetensors"))

    with open(os.path.join(snap, "vocab.txt"), "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    with open(os.path.join(snap, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "MPNetTokenizer",
                   "do_lower_case": True, "model_max_length": 64}, f)
    with open(os.path.join(snap, "preprocessor_config.json"), "w") as f:
        json.dump({"image_mean": [0.5, 0.5, 0.5], "image_std": [0.25, 0.25, 0.25],
                   "size": {"height": 28, "width": 28}}, f)


# ---------------------------------------------------------------------------
# Miniature full registry. OpenI/PadChest need >10 positives for some
# classes so the long-tail head/medium/tail buckets (metrics.py:55-64)
# are all non-empty — medium requires frequency in (10, head_thr].
# ---------------------------------------------------------------------------

N_IMGS = 24


def _build_data_root(root: str) -> None:
    """Full registry via the canonical builders
    (tools/synthetic_eval_data.py): 24 images so the OpenI/PadChest
    long-tail head/medium/tail buckets are all non-empty; ChestXDet10
    with two boxes per image."""
    from tools import synthetic_eval_data as sd

    sd.build_images(root, n=N_IMGS)
    sd.build_openi(root, n=N_IMGS)
    sd.build_padchest(root, n=N_IMGS)
    sd.build_chestxray14(root, n=8)
    sd.build_chexpert(root, n=8)
    sd.build_chestxdet10(root, n=8, boxes_per_image=2)
    sd.build_mscxr(root, n=4)
    sd.build_siim(root, n=8)
    sd.build_rsna(root, n=8)


def test_select_datasets_present_absent(tmp_path):
    from tools.run_real_checkpoint import FULL_REGISTRY, select_datasets

    root = tmp_path / "root"
    _build_data_root(str(root))
    present, absent = select_datasets(str(root))
    assert present == FULL_REGISTRY and absent == []

    # drop one dataset's files -> it must be reported absent, not crash
    os.remove(root / "SIIM" / "test.csv")
    present, absent = select_datasets(str(root))
    assert "SIIM" not in present and absent == ["SIIM"]


@pytest.mark.slow
def test_runbook_datasets_cli_end_to_end(tmp_path):
    snap = str(tmp_path / "snapshot")
    _build_snapshot(snap)
    root = str(tmp_path / "data")
    _build_data_root(root)
    cfg_path = str(tmp_path / "model_config.json")
    with open(cfg_path, "w") as f:
        json.dump(MODEL_CONFIG, f)
    out = str(tmp_path / "out")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_real_checkpoint.py"),
         "--hub_snapshot", snap, "--config", cfg_path,
         "--image", os.path.join(root, "imgs", "0.png"),
         "--text", "There is pneumothorax",
         "--tokenizer", snap,
         "--datasets", "--data_root", root, "--batch_size", "4",
         "--out", out],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-4000:]

    # stage 1+2: conversion + public API inference
    with open(os.path.join(out, "inference.json")) as f:
        inf = json.load(f)
    assert len(inf["similarity_prob"]) == 1
    assert np.isfinite(inf["similarity_prob"]).all()

    # stage 3: vocab parity on the snapshot's real vocab.txt
    with open(os.path.join(out, "result.json")) as f:
        res = json.load(f)
    vp = res["vocab_parity"]
    assert vp["token_for_token"] is True, vp

    # stage 4: the FULL registry ran — every task family, every dataset
    cls = res["classification"]
    for name in ("OpenI", "PadChest", "ChestXray14", "Chexpert", "ChestXDet10"):
        assert name in cls, sorted(cls)
        for metric, val in cls[name].items():
            assert np.isfinite(val), (name, metric, val)
    assert 0.0 <= cls["OpenI"]["Medium AUC"] <= 1.0  # long-tail buckets engaged
    assert np.isfinite(res["classification"]["PadChest"]["Padhcest20 AUROC"])
    det = res["grounding"]
    assert set(det) == {"ChestXDet10", "MS-CXR"}
    seg = res["segmentation"]
    assert set(seg) == {"SIIM", "RSNA"}
    for name in ("SIIM", "RSNA"):
        assert np.isfinite(seg[name]["dice"]), seg[name]
