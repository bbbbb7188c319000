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


def test_pack_dedup_drop_policy_over_slots():
    """"drop" policy (multi-process): the dedup layout is emitted even
    when uniques exceed the slots — overflow rows (latest-first-seen
    uniques) leave the loss via row_mask=0. Rank-consistent shapes."""
    spec = PackSpec(max_sentences_per_image=4, max_text_tokens=10, dedup_slots=4)
    plain = _pack(PackSpec(max_sentences_per_image=4, max_text_tokens=10))
    stats = {}
    b = pack_batch(RECORDS, _images(len(RECORDS)), TOK, spec,
                   rng=np.random.default_rng(1), dedup_overflow="drop",
                   stats=stats)
    assert b["input_ids"].shape == (4, 10)
    assert b["row_gather"].shape == (16,)
    kept = b["row_mask"] > 0
    # kept rows reproduce their plain counterparts exactly
    np.testing.assert_array_equal(
        b["input_ids"][b["row_gather"][kept]], plain["input_ids"][kept])
    np.testing.assert_array_equal(
        b["group_map"][kept], plain["group_map"][kept])
    # overflow really dropped: 7 uniques (6 real + "") > 4 slots
    n_plain_real = int(plain["row_mask"].sum())
    n_kept = int(b["row_mask"].sum())
    assert n_kept < n_plain_real
    assert stats["dedup_dropped"] == n_plain_real - n_kept
    # dropped rows are inert: masked out and gather slot 0
    assert np.all(b["group_map"][~kept] == 0)


def test_pack_dedup_drop_policy_exact_when_under_slots():
    """Under the slot budget the "drop" policy is byte-identical to the
    exact layout — drops only ever happen on overflow."""
    spec = PackSpec(max_sentences_per_image=4, max_text_tokens=10, dedup_slots=8)
    stats = {}
    a = _pack(spec)
    b = pack_batch(RECORDS, _images(len(RECORDS)), TOK, spec,
                   rng=np.random.default_rng(1), dedup_overflow="drop",
                   stats=stats)
    assert stats.get("dedup_dropped", 0) == 0
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_pack_dedup_text_offset():
    """row_gather carries the rank's global text-block offset so local
    batches concatenate into a correct global batch (the group_map
    rank-offset analogue, losses.py:149-151)."""
    spec = PackSpec(max_sentences_per_image=4, max_text_tokens=10, dedup_slots=8)
    b0 = _pack(spec)
    b1 = pack_batch(RECORDS, _images(len(RECORDS)), TOK, spec,
                    rng=np.random.default_rng(1), text_offset=8)
    np.testing.assert_array_equal(b1["row_gather"], b0["row_gather"] + 8)
    np.testing.assert_array_equal(b1["input_ids"], b0["input_ids"])


def test_dedup_multihost_loader_layout():
    """Multi-process loaders emit the dedup layout unconditionally
    ("drop" policy) with rank-offset row_gather — no batch-content-
    dependent shape divergence across ranks."""
    recs = [{"id": i, "key_phrases": [f"p {i % 3}", "q common"]} for i in range(8)]

    def load_image(rec):
        return np.zeros((28, 28, 3), np.float32)

    spec = PackSpec(max_sentences_per_image=2, max_text_tokens=10, dedup_slots=4)
    batches = {}
    for pi in range(2):
        loader = TrainLoader(
            recs, load_image, TOK, 2, spec,
            process_index=pi, process_count=2, num_threads=1,
        )
        assert loader.dedup_overflow == "drop"
        batches[pi] = list(loader)
    for b0, b1 in zip(batches[0], batches[1]):
        assert b0["input_ids"].shape == b1["input_ids"].shape == (4, 10)
        # rank 0 gathers into [0, 4), rank 1 into [4, 8) of the
        # concatenated global unique block
        assert b0["row_gather"].max() < 4
        assert 4 <= b1["row_gather"].min() and b1["row_gather"].max() < 8


def test_echoed_batches_are_independent_dicts():
    """echo > 1 must yield shallow copies: an in-place consumer pop on
    one yield must not corrupt the next (ADVICE r4)."""
    recs = [{"id": i, "key_phrases": ["a b"]} for i in range(4)]

    def load_image(rec):
        return np.zeros((28, 28, 3), np.float32)

    loader = TrainLoader(
        recs, load_image, TOK, 2,
        PackSpec(max_sentences_per_image=1, max_text_tokens=10),
        echo=2, num_threads=1, with_indices=True,
    )
    out = list(loader)
    assert len(out) == 4
    out[0].pop("record_indices")
    assert "record_indices" in out[1]  # the echoed repeat is unharmed
