"""Preprocess CLI end-to-end on a synthetic MIMIC-CXR tree."""

import json
import os
import subprocess
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REPORT = """FINDINGS: There is a left lower lobe opacity. No pleural effusion.

IMPRESSION: Left lower lobe pneumonia.
"""


def test_preprocess_cli(tmp_path):
    reports = tmp_path / "reports" / "files" / "p10" / "p1000"
    reports.mkdir(parents=True)
    for sid in (500, 501):
        (reports / f"s{sid}.txt").write_text(REPORT)

    pd.DataFrame(
        {
            "dicom_id": ["d1", "d2", "d3"],
            "study_id": [500, 501, 500],
            "subject_id": [1000, 1000, 1000],
            "split": ["train", "train", "validate"],
        }
    ).to_csv(tmp_path / "split.csv", index=False)
    pd.DataFrame(
        {"dicom_id": ["d1", "d2", "d3"], "ViewPosition": ["PA", "AP", "PA"]}
    ).to_csv(tmp_path / "meta.csv", index=False)

    out = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [
            sys.executable, "-m", "radzero_tpu.cli.preprocess",
            "--reports_root", str(tmp_path / "reports"),
            "--split_csv", str(tmp_path / "split.csv"),
            "--metadata_csv", str(tmp_path / "meta.csv"),
            "--output_dir", str(out),
        ],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    train = json.load(open(out / "train.json"))
    val = json.load(open(out / "validate.json"))
    assert len(train) == 2 and len(val) == 1
    rec = train[0]
    assert rec["dicom_id"].endswith(".jpg")
    assert rec["view_position"] in ("PA", "AP")
    assert any("pneumonia" in p.lower() or "opacity" in p.lower() for p in rec["key_phrases"])
    # resumable batch files exist
    assert os.path.isdir(out / "keyphrase_batches_train")
