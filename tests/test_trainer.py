"""Trainer-loop tests: loss decreases, multi-loss logging, checkpointing,
resume, early stopping, best-model selection."""

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
from radzero_tpu.train.checkpoint import get_last_checkpoint, list_checkpoints
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


def _loaders(n=16, batch=8):
    rng = np.random.default_rng(0)
    recs = []
    images = {}
    for i in range(n):
        recs.append({"key_phrases": [f"finding alpha {i}", f"observation beta {i}"], "image": i})
        images[i] = rng.standard_normal((28, 28, 3)).astype(np.float32) * 0.5 + 0.2 * i / n

    def image_loader(rec):
        return images[rec["image"]]

    tok = WhitespaceHashTokenizer(vocab_size=5003, max_length=10)
    spec = PackSpec(max_sentences_per_image=2, max_text_tokens=10)
    train = TrainLoader(recs, image_loader, tok, batch, spec, seed=0, num_threads=2)
    evalset = TrainLoader(recs[:8], image_loader, tok, batch, spec, seed=0, shuffle=False, num_threads=2)
    return train, evalset


def test_trainer_trains_checkpoints_and_selects_best(tmp_path):
    train, evalset = _loaders()
    args = TrainerArgs(
        output_dir=str(tmp_path),
        num_train_epochs=3,
        warmup_steps=1,
        logging_steps=1,
        bf16=False,
        learning_rate=3e-4,
        early_stopping_patience=5,
    )
    trainer = RadZeroTrainer(CFG, args, train, evalset)
    state = trainer.train()

    assert state.step == 3 * len(train)
    assert state.best_checkpoint is not None
    assert len(list_checkpoints(str(tmp_path))) == 3

    # multi-loss telemetry present in logs
    step_logs = [r for r in state.log_history if "t2i_loss" in r]
    assert step_logs, "per-step sub-loss telemetry missing"
    eval_logs = [r for r in state.log_history if "eval_loss" in r]
    assert len(eval_logs) == 3

    # loss should drop from first to last epoch on this toy task
    first, last = eval_logs[0]["eval_loss"], eval_logs[-1]["eval_loss"]
    assert last < first + 0.5  # non-divergence (toy batches are tiny)


def test_trainer_resume(tmp_path):
    train, evalset = _loaders()
    args = TrainerArgs(
        output_dir=str(tmp_path), num_train_epochs=1, warmup_steps=1,
        logging_steps=100, bf16=False,
    )
    t1 = RadZeroTrainer(CFG, args, train, evalset)
    t1.train()
    last = get_last_checkpoint(str(tmp_path))
    assert last is not None

    args2 = TrainerArgs(
        output_dir=str(tmp_path), num_train_epochs=2, warmup_steps=1,
        logging_steps=100, bf16=False,
    )
    t2 = RadZeroTrainer(CFG, args2, train, evalset)
    t2.maybe_resume(True)
    assert t2.state.step == t1.state.step
    assert t2.state.epoch == 1
    state = t2.train(resume_from_checkpoint=False)  # continue from restored state
    assert state.epoch == 2


def test_fresh_train_does_not_auto_resume(tmp_path):
    """HF semantics (ref common/trainer.py:561-570): train() with no resume
    flag must start from step 0 even when output_dir holds checkpoints."""
    train, evalset = _loaders()
    args = TrainerArgs(
        output_dir=str(tmp_path), num_train_epochs=1, warmup_steps=1,
        logging_steps=100, bf16=False,
    )
    t1 = RadZeroTrainer(CFG, args, train, evalset)
    t1.train()
    assert get_last_checkpoint(str(tmp_path)) is not None

    t2 = RadZeroTrainer(CFG, args, train, evalset)
    t2.maybe_resume(None)
    assert t2.state.step == 0
    assert t2.state.epoch == 0
    state = t2.train()  # fresh run into the dirty dir
    assert state.epoch == 1  # ran epoch 1 again, not skipped


def test_early_stopping(tmp_path):
    train, evalset = _loaders()
    args = TrainerArgs(
        output_dir=str(tmp_path), num_train_epochs=10, warmup_steps=1000000,
        logging_steps=100, bf16=False, early_stopping_patience=1,
        learning_rate=0.0,  # lr 0 -> eval loss constant -> never improves after 1st
    )
    trainer = RadZeroTrainer(CFG, args, train, evalset)
    state = trainer.train()
    assert state.epoch < 10  # stopped early


def test_save_total_limit_keeps_best(tmp_path):
    from radzero_tpu.train.checkpoint import list_checkpoints

    train, evalset = _loaders()
    args = TrainerArgs(
        output_dir=str(tmp_path), num_train_epochs=4, warmup_steps=1,
        logging_steps=100, bf16=False, save_total_limit=1,
        early_stopping_patience=10,
    )
    trainer = RadZeroTrainer(CFG, args, train, evalset)
    state = trainer.train()
    kept = list_checkpoints(str(tmp_path))
    # at most the limit + the best checkpoint survive pruning
    assert 1 <= len(kept) <= 2
    assert state.best_checkpoint in kept


def test_metrics_callback_enrichment_is_durable(tmp_path):
    """The callback runs BEFORE persistence, so fields it adds land in
    log_history.jsonl (tools/soak_train.py stamps per-step wall time and
    the learned temperatures this way; a round-4 bug persisted the line
    first, so the soak's final assembly KeyError'd on its own fields)."""
    import json
    import os

    train, evalset = _loaders()
    args = TrainerArgs(
        output_dir=str(tmp_path), num_train_epochs=1, warmup_steps=1,
        logging_steps=1, bf16=False, early_stopping_patience=5,
    )

    def enrich(rec):
        if "loss" in rec:
            rec["enriched_field"] = 123.0

    trainer = RadZeroTrainer(CFG, args, train, evalset, metrics_callback=enrich)
    trainer.train()
    with open(os.path.join(str(tmp_path), "log_history.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    step_recs = [r for r in recs if "loss" in r and "step" in r]
    assert step_recs, "no per-step records logged"
    assert all(r.get("enriched_field") == 123.0 for r in step_recs), (
        "callback enrichment missing from the durable log"
    )


def test_metrics_callback_raise_still_persists_record(tmp_path):
    """A raising callback (the soak's NaN guard) must not lose the
    record that triggered it — persistence runs before the exception
    propagates, so the failing step's loss breakdown is on disk."""
    import json
    import os

    train, evalset = _loaders()
    args = TrainerArgs(
        output_dir=str(tmp_path), num_train_epochs=1, warmup_steps=1,
        logging_steps=1, bf16=False,
    )

    def guard(rec):
        if "loss" in rec:
            rec["guard_saw"] = True
            raise AssertionError("synthetic NaN guard")

    trainer = RadZeroTrainer(CFG, args, train, evalset, metrics_callback=guard)
    with pytest.raises(AssertionError, match="synthetic NaN guard"):
        trainer.train()
    with open(os.path.join(str(tmp_path), "log_history.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    step_recs = [r for r in recs if "loss" in r]
    assert len(step_recs) == 1           # the triggering record survived
    assert step_recs[0]["guard_saw"] is True  # with the enrichment


def test_echo_reports_decoded_sample_rate(tmp_path):
    """With data echoing, train_samples_per_second counts echoed repeats
    (device rate); the trainer must also report the decoded-sample rate
    so echo runs stay comparable to non-echo baselines (ADVICE r4)."""
    rng = np.random.default_rng(0)
    recs = []
    images = {}
    for i in range(8):
        recs.append({"key_phrases": [f"finding alpha {i}"], "image": i})
        images[i] = rng.standard_normal((28, 28, 3)).astype(np.float32)

    tok = WhitespaceHashTokenizer(vocab_size=5003, max_length=10)
    spec = PackSpec(max_sentences_per_image=1, max_text_tokens=10)
    train = TrainLoader(recs, lambda r: images[r["image"]], tok, 8, spec,
                        seed=0, num_threads=2, echo=3)
    evalset = TrainLoader(recs, lambda r: images[r["image"]], tok, 8, spec,
                          seed=0, shuffle=False, num_threads=2)
    args = TrainerArgs(output_dir=str(tmp_path), num_train_epochs=1,
                       warmup_steps=1, logging_steps=10, bf16=False)
    trainer = RadZeroTrainer(CFG, args, train, evalset)
    state = trainer.train()

    epoch_recs = [r for r in state.log_history
                  if "train_samples_per_second" in r]
    assert len(epoch_recs) == 1
    rec = epoch_recs[0]
    assert "train_decoded_samples_per_second" in rec
    # device rate counts each echoed repeat; decoded rate divides it out
    assert rec["train_decoded_samples_per_second"] == pytest.approx(
        rec["train_samples_per_second"] / 3
    )


def test_pruning_improving_epochs_keep_newest_rollback(tmp_path):
    """HF semantics: the best checkpoint counts WITHIN save_total_limit.
    On an improving epoch the trainer updates best BEFORE saving, so
    pruning keeps {new best, newest rollback} and deletes the oldest —
    not {new best, stale old best} (regression: stale best_path)."""
    import os

    from radzero_tpu.train.checkpoint import (
        checkpoint_dir,
        list_checkpoints,
        save_checkpoint,
    )

    out = str(tmp_path)
    state = {"w": np.zeros(2, np.float32)}

    def names():
        return sorted(os.path.basename(p) for p in list_checkpoints(out))

    # epochs 1-3 each improve: best == the just-saved checkpoint
    for step in (1, 2, 3):
        save_checkpoint(out, step, state, {}, save_total_limit=2,
                        best_path=checkpoint_dir(out, step))
    assert names() == ["checkpoint-2", "checkpoint-3"]  # oldest pruned

    # epochs 4-5 do NOT improve: best stays checkpoint-3; the newest
    # non-best rotates out, the best survives
    best = checkpoint_dir(out, 3)
    save_checkpoint(out, 4, state, {}, save_total_limit=2, best_path=best)
    assert names() == ["checkpoint-3", "checkpoint-4"]
    save_checkpoint(out, 5, state, {}, save_total_limit=2, best_path=best)
    assert names() == ["checkpoint-3", "checkpoint-5"]


def test_checkpoint_meta_carries_current_best(tmp_path):
    """The persisted trainer_state.json of an improving epoch's
    checkpoint must name THAT checkpoint as best (not last epoch's) —
    a crash before the next save must not leave stale selection state."""
    import os

    from radzero_tpu.train.checkpoint import get_last_checkpoint, load_trainer_state

    train, evalset = _loaders()
    args = TrainerArgs(
        output_dir=str(tmp_path), num_train_epochs=1, warmup_steps=1,
        logging_steps=100, bf16=False,
    )
    trainer = RadZeroTrainer(CFG, args, train, evalset)
    state = trainer.train()
    last = get_last_checkpoint(str(tmp_path))
    meta = load_trainer_state(last)
    # single epoch: its eval is the first -> it IS the best
    assert meta["best_checkpoint"] == state.best_checkpoint
    assert os.path.abspath(meta["best_checkpoint"]) == os.path.abspath(last)
    assert meta["best_metric"] == state.best_metric
