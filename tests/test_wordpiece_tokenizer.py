"""First-party WordPiece tokenizer parity vs HF MPNet/BERT tokenizers.

The reference tokenizes with MPNetTokenizerFast
(/root/reference/exp/cxr_pt/dataset.py:147-154). The real
all-mpnet-base-v2 vocab is not fetchable here (zero egress), so parity
is proven at the ALGORITHM level: both sides read the same synthetic
vocab.txt and must agree token-for-token on a battery of MIMIC-style
finding sentences plus unicode/punctuation/truncation edge cases. With
the real vocab.txt (dumped at checkpoint conversion via
dump_hf_vocab), the same code path reproduces the reference ids.
"""

import numpy as np
import pytest

from radzero_tpu.data.tokenizer import (
    WordPieceTokenizer,
    dump_hf_vocab,
    load_tokenizer,
)

# Wordpieces chosen so common radiology words split multiple ways.
_PIECES = [
    "<s>", "<pad>", "</s>", "[UNK]", "[CLS]", "[SEP]", "[PAD]", "<mask>",
    "there", "is", "no", "of", "the", "a", "in", "with", "and",
    "pleural", "effusion", "pneumo", "##thorax", "##nia", "consolidation",
    "left", "right", "lower", "upper", "lobe", "lung", "cardio",
    "##mediastinal", "silhouette", "normal", "acute", "process",
    "evidence", "focal", "air", "##space", "disease", "opacity",
    "##opacity", "opac", "##ities", "mild", "moderate", "severe",
    "degenerative", "changes", "spine", "deja", "vu", "e",
    ".", ",", "-", "/", "(", ")", ":", ";", "'", '"', "$", "`", "^",
    "1", "2", "3", "5", "##0", "##5", "cm", "##mm", "mm",
    "un", "##aff", "##able", "word",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(_PIECES) + "\n", encoding="utf-8")
    return str(p)


SENTENCES = [
    "There is a left pleural effusion.",
    "There is no pneumothorax.",
    "There is consolidation of the right lower lobe",
    "No evidence of focal airspace disease.",
    "THERE IS NO ACUTE CARDIOMEDIASTINAL PROCESS",  # uppercase -> lower
    "mild-to-moderate degenerative changes (spine).",
    "opacity 1.5 cm; unaffable word",
    "déjà vu",                  # accents: déjà -> deja
    "weird \x00control\ufffdchars",    # NUL/FFFD stripped
    "tabs\tand\nnewlines  collapse",
    "trailing punctuation...",
    "unknownword shouldbeunk",
    "",                                    # empty -> just specials
    "e " * 200,                            # long sentence -> truncation
    "x" * 150,                             # >100-char word -> [UNK]
    "中文 cjk",                   # CJK chars get spaced
]


def test_mpnet_parity_token_for_token(vocab_file):
    from transformers import MPNetTokenizer

    hf = MPNetTokenizer(vocab_file=vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer(vocab_file, style="mpnet", max_length=24)

    for L in (24, 8):
        enc = hf(SENTENCES, padding="max_length", truncation=True,
                 max_length=L, return_tensors="np")
        ids, mask = ours(SENTENCES, max_length=L)
        np.testing.assert_array_equal(ids, enc["input_ids"].astype(np.int32))
        np.testing.assert_array_equal(mask, enc["attention_mask"].astype(np.int32))


def test_mpnet_fast_parity(vocab_file):
    """The reference's actual runtime class is the fast (Rust) variant."""
    try:
        from transformers import MPNetTokenizerFast

        hf = MPNetTokenizerFast(vocab_file=vocab_file, do_lower_case=True,
                                from_slow=True)
    except Exception as e:  # pragma: no cover - conversion unavailable
        pytest.skip(f"fast tokenizer unavailable: {e}")
    ours = WordPieceTokenizer(vocab_file, style="mpnet", max_length=24)
    enc = hf(SENTENCES, padding="max_length", truncation=True,
             max_length=24, return_tensors="np")
    ids, mask = ours(SENTENCES, max_length=24)
    np.testing.assert_array_equal(ids, enc["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(mask, enc["attention_mask"].astype(np.int32))


def test_bert_style_parity(vocab_file):
    """BioClinical-BERT text path uses BertTokenizer ([CLS]/[SEP]/[PAD])."""
    from transformers import BertTokenizer

    hf = BertTokenizer(vocab_file=vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer(vocab_file, style="bert", max_length=24)
    enc = hf(SENTENCES, padding="max_length", truncation=True,
             max_length=24, return_tensors="np")
    ids, mask = ours(SENTENCES, max_length=24)
    np.testing.assert_array_equal(ids, enc["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(mask, enc["attention_mask"].astype(np.int32))


def test_dump_hf_vocab_roundtrip(vocab_file, tmp_path):
    """Conversion helper: HF tokenizer -> vocab.txt -> WordPieceTokenizer
    reproduces the same ids (the deployment flow: dump once at checkpoint
    conversion, run transformers-free at serving)."""
    from transformers import MPNetTokenizer

    hf = MPNetTokenizer(vocab_file=vocab_file, do_lower_case=True)
    out = dump_hf_vocab(hf, str(tmp_path / "dumped_vocab.txt"))
    ours = WordPieceTokenizer(out, style="mpnet", max_length=16)
    enc = hf(SENTENCES, padding="max_length", truncation=True,
             max_length=16, return_tensors="np")
    ids, mask = ours(SENTENCES, max_length=16)
    np.testing.assert_array_equal(ids, enc["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(mask, enc["attention_mask"].astype(np.int32))


def test_load_tokenizer_prefers_first_party(vocab_file, tmp_path):
    tok = load_tokenizer(vocab_file, max_length=12)
    assert isinstance(tok, WordPieceTokenizer)
    ids, mask = tok(["there is effusion"])
    assert ids.shape == (1, 12)
    assert ids[0, 0] == tok.cls_id and ids[0, mask[0].sum() - 1] == tok.sep_id

    # directory containing vocab.txt also resolves first-party
    d = tmp_path / "ckpt"
    d.mkdir()
    (d / "vocab.txt").write_text("\n".join(_PIECES) + "\n", encoding="utf-8")
    tok2 = load_tokenizer(str(d), max_length=12)
    assert isinstance(tok2, WordPieceTokenizer)


def test_missing_specials_rejected(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("hello\nworld\n", encoding="utf-8")
    with pytest.raises(ValueError, match="special tokens"):
        WordPieceTokenizer(str(p), style="mpnet")
