"""Miniature on-disk zero-shot eval datasets (synthetic, PNG-backed).

One canonical builder per registry dataset, shared by
tests/test_eval_harness.py, tests/test_runbook_datasets.py and
tools/multiprocess_worker.py (previously three divergent copies).

Each builder reproduces the on-disk layout the reference's eval harness
consumes (file names and column/JSON schemas pinned by
/root/reference/exp/cxr_pt/inference/utils.py:109-178 and the dataset
loaders in grounding_utils.py / segmentation_utils.py), at miniature
scale so the suites run on a 1-core CPU host. Images are PNG — the
readers dispatch on suffix, so the DICOM path is exercised elsewhere.
"""

from __future__ import annotations

import json
import os

import numpy as np

from radzero_tpu.eval.grounding import FINDING_MAPPING
from radzero_tpu.eval.mergers import CHESTXDET10_CLASSES, CHEXPERT5_CLASSES

XDET10_PROMPTS = list(FINDING_MAPPING)  # prompt text -> annotation class
XDET10_CLASSES = CHESTXDET10_CLASSES


def prompt_json(path: str, names) -> None:
    with open(path, "w") as f:
        json.dump({str(i): [f"There is {n}"] for i, n in enumerate(names)}, f)


def image_csv(path: str, n: int) -> None:
    import pandas as pd

    pd.DataFrame({"Path": [f"imgs/{i}.png" for i in range(n)]}).to_csv(
        path, index=False
    )


def build_images(root: str, n: int = 8, seed: int = 0) -> None:
    """imgs/{i}.png with per-image distinct sizes (70+i, 60) so the
    inverse-geometry upsample paths see non-square, non-uniform shapes."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    d = os.path.join(root, "imgs")
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        arr = rng.integers(0, 256, (70 + i, 60, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"{i}.png"))


def build_chexpert(root: str, n: int = 8, label_seed: int = 1) -> None:
    import pandas as pd

    d = os.path.join(root, "Chexpert")
    os.makedirs(d, exist_ok=True)
    image_csv(os.path.join(d, "chexpert5_test_image.csv"), n)
    prompt_json(os.path.join(d, "chexpert5_test_text.json"), CHEXPERT5_CLASSES)
    labels = np.random.default_rng(label_seed).integers(0, 2, (n, 5))
    labels[0] = 1  # both classes present in every column (AUC well-defined)
    labels[1] = 0
    pd.DataFrame(labels, columns=CHEXPERT5_CLASSES).to_csv(
        os.path.join(d, "test_labels.csv"), index=False
    )


def build_chestxdet10(root: str, n: int = 8, boxes_per_image: int = 1) -> None:
    d = os.path.join(root, "ChestXDet10")
    os.makedirs(d, exist_ok=True)
    image_csv(os.path.join(d, "chestXDet10_test_image.csv"), n)
    prompt_json(os.path.join(d, "chestXDet10_test_text.json"), XDET10_PROMPTS)
    rows = [
        {
            "file_name": f"imgs/{i}.png",
            "syms": [XDET10_CLASSES[(i + 3 * k) % 10] for k in range(boxes_per_image)],
            "boxes": [[5 + 5 * k, 5 + 5 * k, 40 - 10 * k, 40 - 10 * k]
                      for k in range(boxes_per_image)],
        }
        for i in range(n)
    ]
    with open(os.path.join(d, "test.json"), "w") as f:
        json.dump(rows, f)


def build_mscxr(root: str, n: int = 4) -> None:
    """Every bbox covers the whole (60 x 70+i) image, so pointing
    accuracy on these miniatures must be exactly 1.0."""
    d = os.path.join(root, "MS-CXR")
    os.makedirs(d, exist_ok=True)
    rows = [
        {"image": f"imgs/{i}.png",
         "det": [{"name": f"left lung opacity {i}", "label": [[0, 0, 59, 69]]}]}
        for i in range(n)
    ]
    with open(os.path.join(d, "test.json"), "w") as f:
        json.dump(rows, f)


def build_siim(root: str, n: int = 8) -> None:
    import pandas as pd

    d = os.path.join(root, "SIIM")
    os.makedirs(d, exist_ok=True)
    rows = [
        {"ImageId": f"id{i}", "dicom_path": f"imgs/{i}.png",
         " EncodedPixels": "10 6" if i % 2 == 0 else " -1"}
        for i in range(n)
    ]
    pd.DataFrame(rows).to_csv(os.path.join(d, "test.csv"), index=False)


def build_rsna(root: str, n: int = 8) -> None:
    import pandas as pd

    d = os.path.join(root, "RSNA")
    os.makedirs(d, exist_ok=True)
    rows = [
        {"img_path": f"imgs/{i}.png",
         "boxes": "5;5;20;20" if i % 2 == 0 else np.nan}
        for i in range(n)
    ]
    pd.DataFrame(rows).to_csv(os.path.join(d, "test.csv"), index=False)


def build_openi(root: str, n: int = 24) -> None:
    """18 scored pathologies via substring match on labels_automatic
    (eval/mergers.py:74-88). Frequencies engineered per class index:
    0-5 -> 20 (head), 6-11 -> 13 (medium), 12-17 -> 6 (tail), so all
    three long-tail buckets are non-empty at n=24; substring collisions
    (Granuloma in "calcified granuloma") only add positives, never a
    degenerate all-positive column."""
    import pandas as pd

    from radzero_tpu.eval.mergers import OPENI_PATHOLOGIES

    d = os.path.join(root, "OpenI")
    os.makedirs(d, exist_ok=True)
    image_csv(os.path.join(d, "openi_multi_label_image.csv"), n)
    prompt_json(os.path.join(d, "openi_multi_label_text.json"),
                OPENI_PATHOLOGIES[:-1])
    freqs = [20] * 6 + [13] * 6 + [6] * 6
    rows = []
    for i in range(n):
        labs = [
            p.lower()
            for j, p in enumerate(OPENI_PATHOLOGIES[:-1])
            if (i + j) % n < freqs[j]
        ]
        rows.append(";".join(labs) if labs else "normal")
    pd.DataFrame({"labels_automatic": rows}).to_csv(
        os.path.join(d, "custom.csv"), index=False
    )


def build_padchest(root: str, n: int = 24) -> None:
    """Sorted unique label space minus 'normal' (eval/mergers.py:91-121);
    prompts must follow that sorted order, and 'normal' must exist in
    the label space (the merger indexes it)."""
    d = os.path.join(root, "PadChest")
    os.makedirs(d, exist_ok=True)
    image_csv(os.path.join(d, "padchest_multi_label_image.csv"), n)
    pc_classes = [f"c{k:02d}" for k in range(12)]  # sorted by construction
    pc_freqs = [20] * 4 + [13] * 4 + [6] * 4
    manual = {}
    for i in range(n):
        labs = [c for j, c in enumerate(pc_classes) if (i + j) % n < pc_freqs[j]]
        manual[f"imgs/{i}.png"] = labs if labs else ["normal"]
    manual["imgs/0.png"] = manual["imgs/0.png"] + ["normal"]
    with open(os.path.join(d, "manual_image.json"), "w") as f:
        json.dump(manual, f)
    prompt_json(os.path.join(d, "padchest_multi_label_text.json"), pc_classes)


def build_chestxray14(root: str, n: int = 8) -> None:
    from radzero_tpu.eval.mergers import CHESTXRAY14_CLASSES

    d = os.path.join(root, "ChestXray14")
    os.makedirs(d, exist_ok=True)
    image_csv(os.path.join(d, "chestxray14_test_image.csv"), n)
    prompt_json(os.path.join(d, "chestxray14_test_text.json"), CHESTXRAY14_CLASSES)
    with open(os.path.join(d, "test_list.txt"), "w") as f:
        for i in range(n):
            labels = [(i + j) % 2 for j in range(len(CHESTXRAY14_CLASSES))]
            f.write(f"imgs/{i}.png " + " ".join(map(str, labels)) + "\n")


def build_eval_root(root: str, n: int = 8) -> str:
    """Chexpert/ChestXDet10/MS-CXR over a shared imgs/ pool — the
    cls+det subset the multiprocess distributed-eval leg exercises."""
    build_images(root, n=n)
    build_chexpert(root, n=n)
    build_chestxdet10(root, n=n)
    build_mscxr(root, n=min(n, 4))
    return root
