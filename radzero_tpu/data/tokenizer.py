"""Tokenizer adapters.

The reference tokenizes with HF ``MPNetTokenizerFast`` (dataset.py:147-
154). Here a thin protocol produces *static-shape* (N, max_length)
int32 blocks — the TPU contract — with two implementations:

- :class:`HFTokenizer` — wraps any HF tokenizer loaded from a local
  path/name (padding='max_length', truncation=True).
- :class:`WhitespaceHashTokenizer` — dependency-free deterministic
  fallback for tests/benches with MPNet-style special ids
  (bos=0, pad=1, eos=2).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


class HFTokenizer:
    def __init__(self, name_or_path: str, max_length: int = 64):
        from transformers import AutoTokenizer

        try:
            # local-first: instant on a cached/downloaded snapshot, instant
            # failure in zero-egress environments (the online path retries
            # against the hub with ~30 s of backoff before giving up)
            self.tok = AutoTokenizer.from_pretrained(name_or_path, local_files_only=True)
        except Exception:
            self.tok = AutoTokenizer.from_pretrained(name_or_path)
        self.max_length = max_length

    def __call__(self, texts: List[str], max_length: int | None = None) -> Tuple[np.ndarray, np.ndarray]:
        enc = self.tok(
            texts,
            padding="max_length",
            truncation=True,
            max_length=max_length or self.max_length,
            return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32), enc["attention_mask"].astype(np.int32)


class WhitespaceHashTokenizer:
    """Deterministic hash tokenizer: <s> tok* </s> padded with pad=1."""

    bos, pad, eos = 0, 1, 2

    def __init__(self, vocab_size: int = 30527, max_length: int = 64):
        self.vocab_size = vocab_size
        self.max_length = max_length

    def _tok(self, word: str) -> int:
        h = 2166136261
        for ch in word.encode():
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        return 3 + (h % (self.vocab_size - 3))

    def __call__(self, texts: List[str], max_length: int | None = None) -> Tuple[np.ndarray, np.ndarray]:
        L = max_length or self.max_length
        ids = np.full((len(texts), L), self.pad, np.int32)
        mask = np.zeros((len(texts), L), np.int32)
        for i, t in enumerate(texts):
            toks = [self.bos] + [self._tok(w) for w in t.lower().split()][: L - 2] + [self.eos]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask


def load_tokenizer(name_or_path: str | None, max_length: int = 64):
    """HF tokenizer when loadable, hash fallback otherwise (zero-egress envs)."""
    from radzero_tpu.utils.logging import logger

    if name_or_path:
        try:
            return HFTokenizer(name_or_path, max_length)
        except Exception as e:
            logger.warning(
                f"could not load tokenizer {name_or_path!r} ({e}); "
                "falling back to WhitespaceHashTokenizer (tokens will NOT match "
                "a pretrained text tower's vocabulary)"
            )
    return WhitespaceHashTokenizer(max_length=max_length)
