"""Data pipeline tests: MIMIC loading, packing, loader determinism."""

import json
import os

import numpy as np

from radzero_tpu.data.mimic import from_list_with_missing, input_json_file_load, load_datasets
from radzero_tpu.data.pipeline import PackSpec, TrainLoader, pack_batch
from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer


def _write_mimic(tmp_path, n=10):
    (tmp_path / "MIMIC-CXR").mkdir(parents=True, exist_ok=True)
    (tmp_path / "MS-CXR").mkdir(exist_ok=True)
    rows = []
    for i in range(n):
        rows.append(
            {
                "dicom_id": f"img_{i}.jpg",
                "view_position": "PA" if i % 2 == 0 else "LATERAL",
                "key_phrases": [f"There is finding {j} of img {i}" for j in range(1 + i % 4)],
            }
        )
    # one record without key phrases -> dropped
    rows.append({"dicom_id": "empty.jpg", "view_position": "PA", "key_phrases": []})
    with open(tmp_path / "MIMIC-CXR" / "train.json", "w") as f:
        json.dump(rows, f)
    # MS-CXR leak: img_0 is in the grounding test set
    with open(tmp_path / "MS-CXR" / "test.json", "w") as f:
        json.dump([{"image": "somewhere/img_0.jpg"}], f)
    return tmp_path


def test_input_json_load_filters(tmp_path):
    root = _write_mimic(tmp_path)
    recs = input_json_file_load(
        "MIMIC-CXR/train.json", str(root), True,
        rm_mscxr=True, MS_CXR_test="MS-CXR/test.json",
    )
    names = {os.path.basename(r["image"]) for r in recs}
    assert "img_0.jpg" not in names      # de-leaked
    assert "empty.jpg" not in names      # no key phrases
    assert "img_1.jpg" in names          # lateral kept (filter off)

    recs_f = input_json_file_load(
        "MIMIC-CXR/train.json", str(root), True, use_frontal_view_only=True,
    )
    assert all("img_%d" % i not in {os.path.basename(r["image"])} for i, r in enumerate(recs_f))
    assert {os.path.basename(r["image"]) for r in recs_f} == {
        f"img_{i}.jpg" for i in range(10) if i % 2 == 0
    }


def test_load_datasets_splits(tmp_path):
    root = _write_mimic(tmp_path)
    cfg = {
        "data_root": str(root),
        "train": ["T"], "eval": ["T"],
        "T": "MIMIC-CXR/train.json",
        "rm_mscxr": False,
    }
    ds = load_datasets(cfg)
    assert len(ds["train"]) == 10 and len(ds["eval"]) == 10
    assert all(set(r.keys()) == set(ds["train"][0].keys()) for r in ds["train"])


def test_from_list_with_missing_unions_keys():
    out = from_list_with_missing([{"a": 1}, {"b": 2}])
    assert out == [{"a": 1, "b": None}, {"a": None, "b": 2}]


def test_pack_batch_layout():
    tok = WhitespaceHashTokenizer(max_length=12)
    recs = [
        {"key_phrases": ["a b", "c d", "e"]},
        {"key_phrases": ["x"]},
    ]
    imgs = np.zeros((2, 28, 28, 3), np.float32)
    spec = PackSpec(max_sentences_per_image=4, max_text_tokens=12, with_random_positive=True)
    b = pack_batch(recs, imgs, tok, spec, np.random.default_rng(0), global_offset=16)

    assert b["input_ids"].shape == (8, 12)
    assert b["row_mask"].sum() == 4  # 3 + 1 real sentences
    assert list(b["group_map"][:4]) == [16, 16, 16, 17]
    assert b["random_input_ids"].shape == (2, 12)
    # padded rows are empty text
    assert b["attention_mask"][4:].sum() == 2 * 4  # only bos/eos per padded row


def test_pack_batch_subsamples_excess_sentences():
    tok = WhitespaceHashTokenizer(max_length=8)
    recs = [{"key_phrases": [f"s{j}" for j in range(10)]}]
    b = pack_batch(recs, np.zeros((1, 4, 4, 3), np.float32), tok, PackSpec(3, 8))
    assert b["row_mask"].sum() == 3


def test_train_loader_epochs_and_shapes():
    tok = WhitespaceHashTokenizer(max_length=8)
    recs = [{"key_phrases": [f"finding {i}"], "image": None} for i in range(10)]

    def loader(rec):
        return np.zeros((8, 8, 3), np.float32)

    dl = TrainLoader(recs, loader, tok, batch_size=4, spec=PackSpec(2, 8), seed=1)
    batches = list(dl)
    assert len(batches) == 2  # drop_last
    assert batches[0]["pixel_values"].shape == (4, 8, 8, 3)
    assert batches[0]["input_ids"].shape == (8, 8)

    # different epoch -> different order (shuffle advances)
    b2 = list(dl)
    assert len(b2) == 2


def test_text_length_buckets_trim_batch():
    """Bucketed packing trims the text block to the smallest covering
    bucket; loss is invariant (the trimmed columns are all padding)."""
    import numpy as np

    from radzero_tpu.data.pipeline import PackSpec, pack_batch
    from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer

    tok = WhitespaceHashTokenizer(vocab_size=1009, max_length=64)
    records = [
        {"key_phrases": ["short one", "a slightly longer finding sentence here"]},
        {"key_phrases": ["another short"]},
    ]
    imgs = np.zeros((2, 8, 8, 3), np.float32)

    spec = PackSpec(max_sentences_per_image=2, max_text_tokens=64,
                    text_length_buckets=(16, 32))
    b = pack_batch(records, imgs, tok, spec)
    assert b["input_ids"].shape[1] == 16  # longest sentence ~8 tokens -> bucket 16
    assert b["attention_mask"].shape[1] == 16

    full = pack_batch(records, imgs, tok,
                      PackSpec(max_sentences_per_image=2, max_text_tokens=64))
    np.testing.assert_array_equal(b["input_ids"], full["input_ids"][:, :16])
    # trimmed columns were pure padding
    assert full["attention_mask"][:, 16:].sum() == 0


def test_data_echoing_repeats_batches():
    import numpy as np

    from radzero_tpu.data.pipeline import PackSpec, TrainLoader
    from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer

    records = [{"id": i, "key_phrases": [f"f {i}"]} for i in range(8)]
    tok = WhitespaceHashTokenizer(vocab_size=1009, max_length=8)

    def load(rec):
        return np.full((8, 8, 3), rec["id"], np.float32)

    loader = TrainLoader(records, load, tok, 4,
                         PackSpec(max_sentences_per_image=1, max_text_tokens=8),
                         num_threads=2, echo=3)
    assert len(loader) == 6  # 2 unique batches x 3 echoes
    batches = list(loader)
    assert len(batches) == 6
    for k in range(0, 6, 3):
        ids0 = batches[k]["pixel_values"][:, 0, 0, 0]
        for j in (1, 2):
            np.testing.assert_array_equal(
                batches[k + j]["pixel_values"][:, 0, 0, 0], ids0
            )


def test_multihost_disables_buckets_and_requires_drop_last():
    """process_count > 1: per-batch length bucketing is process-local
    (shape desync across hosts) so it is forced off; drop_last=False can
    give processes unequal batch counts, so it is rejected."""
    import pytest

    from radzero_tpu.data.pipeline import PackSpec, TrainLoader
    from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer

    tok = WhitespaceHashTokenizer(vocab_size=101, max_length=64)
    recs = [
        {"image": None, "key_phrases": ["short", "a much longer finding sentence here"]}
        for _ in range(16)
    ]
    spec = PackSpec(max_sentences_per_image=2, max_text_tokens=64,
                    text_length_buckets=(16, 32))

    loader = TrainLoader(
        recs, lambda r: np.zeros((8, 8, 3), np.float32), tok, 4, spec,
        process_index=0, process_count=2,
    )
    assert loader.spec.text_length_buckets == ()  # forced off
    batches = list(loader)
    assert all(b["input_ids"].shape[1] == 64 for b in batches)

    # single-process loaders keep bucketing
    solo = TrainLoader(
        recs, lambda r: np.zeros((8, 8, 3), np.float32), tok, 4, spec,
    )
    assert solo.spec.text_length_buckets == (16, 32)

    with pytest.raises(ValueError, match="drop_last"):
        TrainLoader(
            recs, lambda r: np.zeros((8, 8, 3), np.float32), tok, 4,
            PackSpec(max_sentences_per_image=2, max_text_tokens=64),
            process_index=0, process_count=2, drop_last=False,
        )
