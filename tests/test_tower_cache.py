"""Frozen-tower activation cache: storage round-trips, loader index
plumbing, and trainer integration (epoch-2 tower skip with numerics
matching the uncached path)."""

import dataclasses

import numpy as np
import pytest

from radzero_tpu.data.pipeline import PackSpec, TrainLoader
from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer
from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
    ViTConfig,
)
from radzero_tpu.train.tower_cache import TowerCache
from radzero_tpu.train.trainer import RadZeroTrainer, TrainerArgs

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


# ---------------------------------------------------------------------------
# Storage unit tests
# ---------------------------------------------------------------------------

def test_tower_cache_ram_roundtrip():
    c = TowerCache("ram")
    tok = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    assert c.get(np.array([5, 9])) is None  # cold
    c.put(np.array([5, 9]), tok)
    got = c.get(np.array([9, 5]))  # any order
    np.testing.assert_array_equal(got, tok[::-1])
    # partial presence is a miss (the whole batch recomputes)
    assert c.get(np.array([5, 7])) is None
    s = c.stats()
    assert s["cached_records"] == 2 and s["hits"] == 1 and s["misses"] == 2
    assert s["bytes"] == tok.nbytes


def test_tower_cache_memmap_roundtrip(tmp_path):
    import ml_dtypes

    c = TowerCache("memmap", path=str(tmp_path), n_records=8)
    rng = np.random.default_rng(0)
    tok = rng.standard_normal((3, 5, 4)).astype(ml_dtypes.bfloat16)
    idx = np.array([1, 6, 3])
    assert c.get(idx) is None
    c.put(idx, tok)
    got = c.get(idx)
    assert got.dtype == ml_dtypes.bfloat16  # bit-exact bf16 round-trip
    np.testing.assert_array_equal(
        got.view(np.uint16), tok.view(np.uint16)
    )
    assert c.get(np.array([1, 2])) is None  # 2 never stored
    assert c.n_cached == 3


def test_tower_cache_memmap_cross_run_reuse(tmp_path):
    """A fresh TowerCache pointed at a warm directory must reuse the
    persisted tokens (epoch-1 work survives a restart); a mismatched
    geometry recreates from scratch instead of reading garbage."""
    import ml_dtypes

    rng = np.random.default_rng(1)
    tok = rng.standard_normal((2, 4, 8)).astype(ml_dtypes.bfloat16)
    c1 = TowerCache("memmap", path=str(tmp_path), n_records=6)
    c1.put(np.array([0, 3]), tok)
    del c1

    c2 = TowerCache("memmap", path=str(tmp_path), n_records=6)
    got = c2.get(np.array([0, 3]))  # warm get BEFORE any put
    assert got is not None and got.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(got.view(np.uint16), tok.view(np.uint16))
    assert c2.get(np.array([1])) is None  # never stored
    assert c2.n_cached == 2

    # changed record count -> stale meta -> cold start, no crash
    c3 = TowerCache("memmap", path=str(tmp_path), n_records=7)
    assert c3.get(np.array([0, 3])) is None
    c3.put(np.array([2]), tok[:1])
    assert c3.get(np.array([0, 3])) is None  # old contents were wiped
    assert c3.n_cached == 1


def test_tower_cache_bad_args(tmp_path):
    with pytest.raises(ValueError, match="backing"):
        TowerCache("disk")
    with pytest.raises(ValueError, match="memmap"):
        TowerCache("memmap", path=str(tmp_path))
    with pytest.raises(ValueError, match="memmap"):
        TowerCache("memmap", n_records=4)


# ---------------------------------------------------------------------------
# Loader index plumbing
# ---------------------------------------------------------------------------

def _records(n):
    rng = np.random.default_rng(0)
    recs, images = [], {}
    for i in range(n):
        recs.append({"key_phrases": [f"finding alpha {i}", f"observation beta {i}"],
                     "image": i})
        images[i] = rng.standard_normal((28, 28, 3)).astype(np.float32) * 0.5 + 0.2 * i / n
    return recs, (lambda rec: images[rec["image"]])


def test_loader_with_indices_matches_order():
    recs, image_loader = _records(16)
    tok = WhitespaceHashTokenizer(vocab_size=5003, max_length=10)
    spec = PackSpec(max_sentences_per_image=2, max_text_tokens=10)
    loader = TrainLoader(recs, image_loader, tok, 8, spec, seed=3, num_threads=2,
                         with_indices=True)
    seen = []
    for batch in loader:
        idx = batch["record_indices"]
        assert idx.shape == (8,)
        # indices identify the records: re-loading by index reproduces pixels
        ref = np.stack([image_loader(recs[i]) for i in idx])
        np.testing.assert_array_equal(batch["pixel_values"], ref.astype(np.float32))
        seen.extend(idx.tolist())
    assert sorted(seen) == list(range(16))  # full epoch, each record once


# ---------------------------------------------------------------------------
# Trainer integration
# ---------------------------------------------------------------------------

def _loaders(with_indices, n=16, batch=8):
    recs, image_loader = _records(n)
    tok = WhitespaceHashTokenizer(vocab_size=5003, max_length=10)
    spec = PackSpec(max_sentences_per_image=2, max_text_tokens=10)
    train = TrainLoader(recs, image_loader, tok, batch, spec, seed=0, num_threads=2,
                        with_indices=with_indices)
    evalset = TrainLoader(recs[:8], image_loader, tok, batch, spec, seed=0,
                          shuffle=False, num_threads=2)
    return train, evalset


def _args(tmp_path, sub):
    return TrainerArgs(
        output_dir=str(tmp_path / sub), num_train_epochs=2, warmup_steps=1,
        logging_steps=100, bf16=False, learning_rate=3e-4,
    )


def test_trainer_tower_cache_matches_uncached(tmp_path):
    """Two epochs cached vs uncached from the same seed: identical final
    trainable params (tower output round-trips the host cache bit-exactly;
    only XLA fusion boundaries differ between the two programs)."""
    import jax

    train_u, eval_u = _loaders(with_indices=False)
    t_u = RadZeroTrainer(CFG, _args(tmp_path, "uncached"), train_u, eval_u)
    t_u.train()

    train_c, eval_c = _loaders(with_indices=True)
    cache = TowerCache("ram")
    t_c = RadZeroTrainer(CFG, _args(tmp_path, "cached"), train_c, eval_c,
                         tower_cache=cache)
    t_c.train()

    # epoch 1 all misses, epoch 2 all hits — the tower ran once per record
    assert cache.misses == len(train_c) and cache.hits == len(train_c)

    flat_u = jax.tree.leaves(t_u.trainable)
    flat_c = jax.tree.leaves(t_c.trainable)
    for a, b in zip(flat_u, flat_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_trainer_tower_cache_hit_miss_accounting(tmp_path):
    train, evalset = _loaders(with_indices=True)
    cache = TowerCache("ram")
    t = RadZeroTrainer(CFG, _args(tmp_path, "acct"), train, evalset,
                       tower_cache=cache)
    t.train()
    per_epoch = len(train)
    assert cache.misses == per_epoch          # epoch 1: every batch computes
    assert cache.hits == per_epoch            # epoch 2: every batch cached
    assert cache.n_cached == 16


def test_tower_cache_requires_frozen_tower(tmp_path):
    train, evalset = _loaders(with_indices=True)
    args = dataclasses.replace(
        _args(tmp_path, "bad"),
        module_to_update=("vision_model", "align_transformer", "text_model", "loss_fns"),
    )
    with pytest.raises(ValueError, match="frozen"):
        RadZeroTrainer(CFG, args, train, evalset, tower_cache=TowerCache("ram"))


def test_tower_cache_without_indices_errors(tmp_path):
    """A loader that doesn't emit record_indices can't be cached — fail
    loudly on the first batch rather than silently recompute forever."""
    train, evalset = _loaders(with_indices=False)
    t = RadZeroTrainer(CFG, _args(tmp_path, "noidx"), train, evalset,
                       tower_cache=TowerCache("ram"))
    with pytest.raises(ValueError, match="record_indices"):
        t.train()


def test_tower_cache_defaults_align_no_remat(tmp_path):
    """With the cache on, the tower never enters the train-step graph, so
    the trainer defaults AlignConfig.remat None -> False (measured +3.5%
    cached L32 on-chip; with the tower in the graph the same setting OOMs
    a 16 GB part at batch 64). Explicit True must survive; no cache ->
    the None default is untouched."""
    train, evalset = _loaders(with_indices=True)
    t = RadZeroTrainer(CFG, _args(tmp_path, "nr"), train, evalset,
                       tower_cache=TowerCache("ram"))
    assert t.cfg.align.remat is False

    train2, eval2 = _loaders(with_indices=True)
    cfg_explicit = dataclasses.replace(
        CFG, align=dataclasses.replace(CFG.align, remat=True))
    t2 = RadZeroTrainer(cfg_explicit, _args(tmp_path, "nr2"), train2, eval2,
                        tower_cache=TowerCache("ram"))
    assert t2.cfg.align.remat is True

    train3, eval3 = _loaders(with_indices=False)
    t3 = RadZeroTrainer(CFG, _args(tmp_path, "nr3"), train3, eval3)
    assert t3.cfg.align.remat is None


def test_tower_cache_device_roundtrip():
    """Device backing: on-chip store, gather/scatter semantics identical
    to the host backings (bit-exact), zero host bytes on the get path."""
    import jax.numpy as jnp

    c = TowerCache("device", n_records=8)
    rng = np.random.default_rng(2)
    tok = jnp.asarray(rng.standard_normal((3, 5, 4)), jnp.bfloat16)
    idx = np.array([1, 6, 3])
    assert c.get(idx) is None  # cold
    c.put(idx, tok)
    got = c.get(np.array([3, 1, 6]))  # any order, device array out
    assert got is not None and got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(tok, np.float32)[[2, 0, 1]]
    )
    assert c.get(np.array([1, 2])) is None  # 2 never stored -> whole-batch miss
    assert c.n_cached == 3
    assert c.nbytes == 8 * 5 * 4 * 2  # full preallocated store, bf16
    with pytest.raises(ValueError, match="device"):
        TowerCache("device")


def test_trainer_tower_cache_device_matches_ram(tmp_path):
    """Trainer integration: device backing trains to the same params as
    the RAM backing (same seed, same data) with the same hit/miss
    profile — the store never leaves the chip."""
    import jax

    train_r, eval_r = _loaders(with_indices=True)
    ram = TowerCache("ram")
    t_r = RadZeroTrainer(CFG, _args(tmp_path, "ram"), train_r, eval_r,
                         tower_cache=ram)
    t_r.train()

    train_d, eval_d = _loaders(with_indices=True)
    dev = TowerCache("device", n_records=16)
    t_d = RadZeroTrainer(CFG, _args(tmp_path, "dev"), train_d, eval_d,
                         tower_cache=dev)
    t_d.train()

    assert dev.misses == len(train_d) and dev.hits == len(train_d)
    for a, b in zip(jax.tree.leaves(t_r.trainable), jax.tree.leaves(t_d.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)
