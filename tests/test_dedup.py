"""Sentence dedup in the packed text batch (PackSpec.dedup_slots).

The reference encodes every per-image sentence including duplicates
(exp/cxr_pt/model/losses.py:135-147); real MIMIC finding phrases repeat
heavily across a batch. Dedup runs the text tower on unique rows only
and gathers features back — loss and gradients must equal the plain
layout exactly (the gather VJP scatter-adds duplicate grads)."""

import numpy as np
import pytest

from radzero_tpu.data.pipeline import PackSpec, TrainLoader, pack_batch
from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer
from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
    ViTConfig,
)

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

TOK = WhitespaceHashTokenizer(vocab_size=5003, max_length=10)

# 4 images x up to 4 sentences with heavy repeats: 6 unique among 13 real
RECORDS = [
    {"key_phrases": ["no pleural effusion", "clear lungs", "no pneumothorax"]},
    {"key_phrases": ["no pleural effusion", "clear lungs", "cardiomegaly mild"]},
    {"key_phrases": ["no pleural effusion", "left basilar opacity", "no pneumothorax",
                     "clear lungs"]},
    {"key_phrases": ["right effusion large", "no pleural effusion", "clear lungs"]},
]


def _images(n):
    rng = np.random.default_rng(0)
    return rng.standard_normal((n, 28, 28, 3)).astype(np.float32)


def _pack(spec):
    return pack_batch(RECORDS, _images(len(RECORDS)), TOK, spec,
                      rng=np.random.default_rng(1))


def test_pack_dedup_layout():
    spec = PackSpec(max_sentences_per_image=4, max_text_tokens=10, dedup_slots=8)
    plain = _pack(PackSpec(max_sentences_per_image=4, max_text_tokens=10))
    b = _pack(spec)
    assert "row_gather" in b
    assert b["input_ids"].shape == (8, 10)
    assert b["attention_mask"].shape == (8, 10)
    assert b["row_gather"].shape == (16,)
    # gathering the unique block reproduces every plain row exactly
    np.testing.assert_array_equal(b["input_ids"][b["row_gather"]], plain["input_ids"])
    np.testing.assert_array_equal(
        b["attention_mask"][b["row_gather"]], plain["attention_mask"])
    # loss-side keys are untouched
    np.testing.assert_array_equal(b["group_map"], plain["group_map"])
    np.testing.assert_array_equal(b["row_mask"], plain["row_mask"])
    # actual dedup happened: 6 unique real + 1 padding row
    n_uniq = len(np.unique(b["row_gather"]))
    assert n_uniq == 7


def test_pack_dedup_fallback_when_over_slots():
    spec = PackSpec(max_sentences_per_image=4, max_text_tokens=10, dedup_slots=4)
    b = _pack(spec)  # 7 unique rows > 4 slots -> plain layout
    assert "row_gather" not in b
    assert b["input_ids"].shape == (16, 10)


def test_pack_dedup_respects_length_buckets():
    spec = PackSpec(max_sentences_per_image=4, max_text_tokens=10,
                    text_length_buckets=(8,), dedup_slots=8)
    b = _pack(spec)
    assert b["input_ids"].shape == (8, 8)  # trimmed to the bucket
    assert b["attention_mask"].shape == (8, 8)


def test_forward_train_dedup_loss_and_grads_match():
    import jax
    import jax.numpy as jnp

    from radzero_tpu.models.radzero import forward_train, init_radzero

    params = init_radzero(jax.random.PRNGKey(0), CFG)
    plain = _pack(PackSpec(max_sentences_per_image=4, max_text_tokens=10))
    dedup = _pack(PackSpec(max_sentences_per_image=4, max_text_tokens=10,
                           dedup_slots=8))

    @jax.jit
    def loss_and_grads(p, batch):
        def f(pp):
            return forward_train(pp, CFG, batch)["losses"]["loss"]

        return jax.value_and_grad(f)(p)

    l0, g0 = loss_and_grads(params, {k: jnp.asarray(v) for k, v in plain.items()})
    l1, g1 = loss_and_grads(params, {k: jnp.asarray(v) for k, v in dedup.items()})
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_dedup_multihost_guard():
    recs = [{"id": i, "key_phrases": ["a b", "c d"]} for i in range(8)]

    def load_image(rec):
        return np.zeros((28, 28, 3), np.float32)

    with pytest.raises(ValueError, match="dedup_slots requires"):
        TrainLoader(
            recs, load_image, TOK, 2,
            PackSpec(max_sentences_per_image=2, max_text_tokens=10, dedup_slots=4),
            process_index=0, process_count=2,
        )
