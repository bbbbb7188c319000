"""Preprocessing pipeline tests: section parsing, record join,
key-phrase extraction (rule-based + LLM retry/quarantine/resume), MS-CXR."""

import json

import pandas as pd

from radzero_tpu.preprocess.findings import build_records
from radzero_tpu.preprocess.keyphrases import (
    LLMKeyPhraseExtractor,
    RuleBasedKeyPhraseExtractor,
    extract_key_phrases,
)
from radzero_tpu.preprocess.mscxr import multi_task_format
from radzero_tpu.preprocess.sections import section_text

REPORT = """FINAL REPORT:
EXAMINATION: Chest radiograph PA and lateral.

INDICATION: Cough and fever.

COMPARISON: None.

FINDINGS: There is a right lower lobe opacity concerning for pneumonia.
Heart size is normal. No pleural effusion.

IMPRESSION: Right lower lobe pneumonia.
"""


def test_section_parser():
    sections, order = section_text(REPORT)
    assert "findings" in sections and "impression" in sections
    assert "pneumonia" in sections["findings"].lower()
    assert sections["impression"].startswith("Right lower lobe pneumonia")
    assert order.index("findings") < order.index("impression")


def test_section_parser_no_headers():
    sections, order = section_text("just some text without headers")
    assert order == ["full_report"]


def test_build_records(tmp_path):
    split = tmp_path / "split.csv"
    pd.DataFrame(
        {
            "dicom_id": ["d1", "d2", "d3"],
            "study_id": [100, 100, 200],
            "subject_id": [1, 1, 2],
            "split": ["train", "train", "validate"],
        }
    ).to_csv(split, index=False)
    meta = tmp_path / "meta.csv"
    pd.DataFrame({"dicom_id": ["d1", "d2", "d3"], "ViewPosition": ["PA", "LATERAL", "AP"]}).to_csv(
        meta, index=False
    )
    sections = {"100": {"findings": "F", "impression": "I"}}
    recs = build_records(str(split), str(meta), sections, "train")
    assert len(recs) == 2
    assert recs[0]["dicom_id"] == "d1.jpg"
    assert recs[0]["view_position"] == "PA"
    # validate split excluded; study 200 has no sections anyway
    recs_v = build_records(str(split), str(meta), sections, "validate")
    assert recs_v == []


def test_rule_based_extractor():
    ex = RuleBasedKeyPhraseExtractor()
    phrases = ex(
        "There is a right lower lobe opacity. Heart size is normal. No pleural effusion.",
        "Right lower lobe pneumonia is present.",
    )
    assert any(p.lower().startswith("there is") for p in phrases)
    assert any("no" in p.lower() for p in phrases)  # negation normalised
    assert len(phrases) >= 3


def test_llm_extractor_retry_and_quarantine():
    calls = {"n": 0}

    def flaky(system, user):
        calls["n"] += 1
        if calls["n"] < 3:
            return "not json"
        return 'Here you go: ["There is pneumonia of the right lower lobe"]'

    ex = LLMKeyPhraseExtractor(complete=flaky, max_retries=5)
    out = ex("findings", "impression")
    assert out == ["There is pneumonia of the right lower lobe"]
    assert calls["n"] == 3

    def broken(system, user):
        return "never json"

    ex2 = LLMKeyPhraseExtractor(complete=broken, max_retries=2)
    assert ex2("f", "i") == []
    assert len(ex2.failed) == 1


def test_extract_key_phrases_resumable(tmp_path):
    recs = [{"dicom_id": f"d{i}", "findings": f"Finding number {i} is present.", "impression": ""} for i in range(5)]
    ex = RuleBasedKeyPhraseExtractor()
    out1 = extract_key_phrases(recs, ex, str(tmp_path), batch_size=2)
    assert len(out1) == 5 and all("key_phrases" in r for r in out1)

    # resume: pre-existing batch files are reused, not recomputed
    marker = json.load(open(tmp_path / "batch_0.json"))
    marker[0]["key_phrases"] = ["SENTINEL"]
    json.dump(marker, open(tmp_path / "batch_0.json", "w"))
    out2 = extract_key_phrases(recs, ex, str(tmp_path), batch_size=2)
    assert out2[0]["key_phrases"] == ["SENTINEL"]


def test_mscxr_multi_task_format():
    raw = [{"image": "a.jpg", "phrase": "left basilar opacity", "bbox": [1, 2, 30, 40]}]
    out = multi_task_format(raw)
    assert out == [
        {"image": "a.jpg", "det": [{"name": "left basilar opacity", "label": [[1, 2, 30, 40]]}]}
    ]
