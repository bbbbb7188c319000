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
import pandas as pd
import pytest
import torch
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from radzero_tpu.eval.mergers import (  # noqa: E402
    CHESTXRAY14_CLASSES,
    CHEXPERT5_CLASSES,
    OPENI_PATHOLOGIES,
)

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


def _prompt_json(path, names):
    with open(path, "w") as f:
        json.dump({str(i): [f"There is {n}"] for i, n in enumerate(names)}, f)


def _image_csv(path, n):
    pd.DataFrame({"Path": [f"imgs/{i}.png" for i in range(n)]}).to_csv(
        path, index=False
    )


def _build_data_root(root: str) -> None:
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
    for i in range(N_IMGS):
        arr = rng.integers(0, 256, (70 + i, 60, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(root, "imgs", f"{i}.png"))

    # ---- OpenI: 18 scored pathologies via substring match on
    # labels_automatic (mergers.py:74-88). Frequencies engineered per
    # class index: 0-5 -> 20 (head), 6-11 -> 13 (medium), 12-17 -> 6
    # (tail); substring collisions (Granuloma in "calcified granuloma")
    # only add positives, never produce a degenerate all-pos column.
    d = os.path.join(root, "OpenI")
    os.makedirs(d, exist_ok=True)
    _image_csv(os.path.join(d, "openi_multi_label_image.csv"), N_IMGS)
    _prompt_json(os.path.join(d, "openi_multi_label_text.json"),
                 OPENI_PATHOLOGIES[:-1])
    freqs = [20] * 6 + [13] * 6 + [6] * 6
    rows = []
    for i in range(N_IMGS):
        labs = [
            p.lower()
            for j, p in enumerate(OPENI_PATHOLOGIES[:-1])
            if (i + j) % N_IMGS < freqs[j]
        ]
        rows.append(";".join(labs) if labs else "normal")
    pd.DataFrame({"labels_automatic": rows}).to_csv(
        os.path.join(d, "custom.csv"), index=False
    )

    # ---- PadChest: sorted unique label space minus 'normal'
    # (mergers.py:91-121); prompts must follow that sorted order.
    d = os.path.join(root, "PadChest")
    os.makedirs(d, exist_ok=True)
    _image_csv(os.path.join(d, "padchest_multi_label_image.csv"), N_IMGS)
    pc_classes = [f"c{k:02d}" for k in range(12)]  # sorted by construction
    pc_freqs = [20] * 4 + [13] * 4 + [6] * 4
    manual = {}
    for i in range(N_IMGS):
        labs = [c for j, c in enumerate(pc_classes) if (i + j) % N_IMGS < pc_freqs[j]]
        manual[f"imgs/{i}.png"] = labs if labs else ["normal"]
    # 'normal' must exist in the label space (the merger indexes it)
    manual["imgs/0.png"] = manual["imgs/0.png"] + ["normal"]
    with open(os.path.join(d, "manual_image.json"), "w") as f:
        json.dump(manual, f)
    _prompt_json(os.path.join(d, "padchest_multi_label_text.json"), pc_classes)

    # ---- ChestXray14: space-separated test list (mergers.py:124-131)
    d = os.path.join(root, "ChestXray14")
    os.makedirs(d, exist_ok=True)
    _image_csv(os.path.join(d, "chestxray14_test_image.csv"), 8)
    _prompt_json(os.path.join(d, "chestxray14_test_text.json"), CHESTXRAY14_CLASSES)
    with open(os.path.join(d, "test_list.txt"), "w") as f:
        for i in range(8):
            labels = [(i + j) % 2 for j in range(len(CHESTXRAY14_CLASSES))]
            f.write(f"imgs/{i}.png " + " ".join(map(str, labels)) + "\n")

    # ---- Chexpert
    d = os.path.join(root, "Chexpert")
    os.makedirs(d, exist_ok=True)
    _image_csv(os.path.join(d, "chexpert5_test_image.csv"), 8)
    _prompt_json(os.path.join(d, "chexpert5_test_text.json"), CHEXPERT5_CLASSES)
    labels = np.random.default_rng(1).integers(0, 2, (8, 5))
    labels[0] = 1
    labels[1] = 0
    pd.DataFrame(labels, columns=CHEXPERT5_CLASSES).to_csv(
        os.path.join(d, "test_labels.csv"), index=False
    )

    # ---- ChestXDet10 (classification AND grounding)
    xdet_prompts = ["Atelectasis", "Tissue Calcification", "Pulmonary Consolidation",
                    "Pleural Effusion", "Pulmonary Emphysema", "Fibrosis",
                    "Bone Fracture", "Pulmonary Mass", "Lung Nodule", "Pneumothorax"]
    xdet_classes = ["Atelectasis", "Calcification", "Consolidation", "Effusion",
                    "Emphysema", "Fibrosis", "Fracture", "Mass", "Nodule",
                    "Pneumothorax"]
    d = os.path.join(root, "ChestXDet10")
    os.makedirs(d, exist_ok=True)
    _image_csv(os.path.join(d, "chestXDet10_test_image.csv"), 8)
    _prompt_json(os.path.join(d, "chestXDet10_test_text.json"), xdet_prompts)
    rows = [
        {"file_name": f"imgs/{i}.png",
         "syms": [xdet_classes[i % 10], xdet_classes[(i + 3) % 10]],
         "boxes": [[5, 5, 40, 40], [10, 10, 30, 30]]}
        for i in range(8)
    ]
    with open(os.path.join(d, "test.json"), "w") as f:
        json.dump(rows, f)

    # ---- MS-CXR
    d = os.path.join(root, "MS-CXR")
    os.makedirs(d, exist_ok=True)
    mscxr = [
        {"image": f"imgs/{i}.png",
         "det": [{"name": f"left lung opacity {i}", "label": [[0, 0, 59, 69]]}]}
        for i in range(4)
    ]
    with open(os.path.join(d, "test.json"), "w") as f:
        json.dump(mscxr, f)

    # ---- SIIM / RSNA
    d = os.path.join(root, "SIIM")
    os.makedirs(d, exist_ok=True)
    rows = [
        {"ImageId": f"id{i}", "dicom_path": f"imgs/{i}.png",
         " EncodedPixels": "10 6" if i % 2 == 0 else " -1"}
        for i in range(8)
    ]
    pd.DataFrame(rows).to_csv(os.path.join(d, "test.csv"), index=False)
    d = os.path.join(root, "RSNA")
    os.makedirs(d, exist_ok=True)
    rows = [
        {"img_path": f"imgs/{i}.png",
         "boxes": "5;5;20;20" if i % 2 == 0 else np.nan}
        for i in range(8)
    ]
    pd.DataFrame(rows).to_csv(os.path.join(d, "test.csv"), index=False)


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
