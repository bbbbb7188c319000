#!/usr/bin/env python
"""Flagship-scale training soak with mid-run kill + resume equivalence
(VERDICT r3 next-step #3).

The reference's implicit stability proof is its 20-epoch early-stopped
recipe (/root/reference/exp/cxr_pt/config.yaml:13-27, radzero.yaml:1-72);
ours so far rested on 2-step tests and a 100-step tiny-shape harness.
This tool runs hundreds of steps of the REAL recipe on the bench chip —
batch 64 x 8 sentences, bf16 + remat, bucketed text packing, fused
kernels, frozen-tower activation cache (RAM) over a synthetic ~2k-image
dataset so epoch transitions (cache build -> cache hit) occur many
times — logging loss, both learned temperatures, and samples/s every
step, with a NaN guard on every loss (the round-3 tau-overflow NaN is
exactly the class only sustained runs surface).

Three legs (the parent mode runs them all and writes soak_result.json):

  control   steps 0..N straight through; per-step loss curve recorded
  killed    same seed/data, separate dir; hard os._exit() mid-epoch at
            step K (no atexit, no checkpoint flush — a real SIGKILL
            analogue)
  resumed   restarts from the killed dir's last epoch checkpoint and
            completes; its post-resume trajectory must match the
            control's at every shared step number

Determinism note: identical programs + identical data order => the
resumed leg must reproduce the control bit-for-bit from the restored
epoch boundary; the assertion uses rtol=1e-5 to stay robust to
off-device reduction of the logged scalars, and reports the max delta.

Usage:
  python tools/soak_train.py --steps 500 --out /tmp/soak       # full protocol
  python tools/soak_train.py --leg control --steps N --out DIR # one leg
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

N_RECORDS = 2000
BATCH = 64
SENTS = 8
IMG = 518


def build_loader(n_records: int = N_RECORDS, first_id: int = 0,
                 shuffle: bool = True, seed: int = 11,
                 learnable: bool = False):
    """``learnable=True``: images carry a quadrant-brightness signal
    correlated with a keyword in their sentences (the sanity-harness
    task) — train and a held-out eval split then share structure, so
    eval loss genuinely improves over many epochs before overfitting
    sets in. The stability legs keep the pure-noise data (learnability
    is irrelevant to NaN/resume proofs); the model-selection leg needs
    the learnable variant or eval loss bottoms out at epoch ~1."""
    from radzero_tpu.data.pipeline import PackSpec, TrainLoader
    from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer

    # deterministic per-record synthetic CXR-shaped images + texts with
    # realistic sentence-length spread so the [16, 32] buckets engage.
    # Images are memoized (2000 x 3.2 MB ~= 6.4 GB host RAM): generating
    # 805k gaussians costs ~24 ms/image on this 1-core host, which would
    # add ~1.5 s/step of pure RNG to every batch — a synthetic-data cost
    # a real dataset (decoded once to a processed array) does not have.
    _img_memo = {}

    def load_image(rec):
        arr = _img_memo.get(rec["id"])
        if arr is None:
            rng = np.random.default_rng(rec["id"] + 1)
            arr = rng.standard_normal((IMG, IMG, 3)).astype(np.float32) * 0.5
            if learnable:
                q = rec["id"] % 4  # quadrant signal, keyed like sentences()
                h = IMG // 2
                r0, c0 = (q // 2) * h, (q % 2) * h
                arr[r0:r0 + h, c0:c0 + h] += 1.0
            _img_memo[rec["id"]] = arr
        return arr

    words = ["opacity", "effusion", "consolidation", "cardiomegaly", "clear",
             "left", "right", "lower", "upper", "lobe", "mild", "severe",
             "pleural", "basilar", "atelectasis", "unchanged"]

    def sentences(i):
        rng = np.random.default_rng(10_000 + i)
        out = []
        for _ in range(int(rng.integers(3, SENTS + 1))):
            n = int(rng.integers(4, 24))  # ~real MIMIC phrase lengths
            toks = list(rng.choice(words, n))
            if learnable:
                # every sentence names its image's quadrant — the
                # cross-modal signal the contrastive loss can learn
                toks[int(rng.integers(0, n))] = f"quadrant{i % 4}"
            out.append(" ".join(toks))
        return out

    records = [{"id": i, "key_phrases": sentences(i)}
               for i in range(first_id, first_id + n_records)]
    return TrainLoader(
        records, load_image,
        WhitespaceHashTokenizer(vocab_size=30522, max_length=64),
        BATCH,
        PackSpec(max_sentences_per_image=SENTS, max_text_tokens=64,
                 text_length_buckets=(16, 32)),
        seed=seed, num_threads=2, drop_last=True, with_indices=True,
        shuffle=shuffle,
    )


def run_leg(leg: str, steps: int, out_dir: str, kill_at: int,
            backing: str = "device") -> None:
    from radzero_tpu.utils import stall_guard

    prodder = stall_guard.install()  # noqa: F841 — tunnel wedge watchdog
    import jax
    import jax.numpy as jnp  # noqa: F401

    cache = os.path.join(REPO, ".jax_cache")
    if jax.default_backend() != "cpu":
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    from radzero_tpu.models.configuration import RadZeroConfig
    from radzero_tpu.train.tower_cache import TowerCache
    from radzero_tpu.train.trainer import RadZeroTrainer, TrainerArgs

    loader = build_loader()
    steps_per_epoch = len(loader)
    epochs = math.ceil(steps / steps_per_epoch)
    args = TrainerArgs(
        output_dir=out_dir,
        num_train_epochs=epochs,
        logging_steps=1,
        bf16=True,
        gradient_checkpointing=True,
        load_best_model_at_end=False,
        save_total_limit=3,
        seed=42,
    )

    t_last = [time.perf_counter()]

    def on_metrics(rec):
        if "loss" not in rec:
            return  # epoch summary record
        now = time.perf_counter()
        rec["step_wall_s"] = round(now - t_last[0], 4)
        t_last[0] = now
        assert np.isfinite(rec["loss"]), f"NaN/inf loss at step {rec['step']}: {rec}"
        # learned temperatures (log-parameterised, losses/radzero_loss.py)
        lp = trainer.trainable["loss_fns"]["RadZeroLoss"]
        rec["loss_temperature"] = float(np.exp(np.asarray(lp["log_loss_temperature"])[0]))
        if "log_attn_temperature" in lp:
            rec["attn_temperature"] = float(np.exp(np.asarray(lp["log_attn_temperature"])[0]))
        assert rec["loss_temperature"] > 1e-4, (
            f"learned temperature collapsed at step {rec['step']}: {rec}"
        )
        if leg == "killed" and rec["step"] >= kill_at:
            print(f"soak[{leg}]: hard-exit at step {rec['step']}", flush=True)
            sys.stdout.flush()
            os._exit(17)  # no cleanup: a kill -9 analogue

    # device backing: the token store lives in HBM (4.3 GB for these 2k
    # records), so cached epochs move zero token bytes over the host
    # link — on this 60 MB/s bench tunnel the RAM backing would pay
    # 2.3 s/batch of upload, an environment artifact the soak's
    # stability purpose doesn't need (--backing ram measures that mode)
    cache = (TowerCache(backing="device", n_records=N_RECORDS)
             if backing == "device" else TowerCache(backing=backing))
    trainer = RadZeroTrainer(
        RadZeroConfig(), args, loader,
        tower_cache=cache,
        metrics_callback=on_metrics,
    )
    trainer.train(resume_from_checkpoint=(True if leg == "resumed" else None))
    print(f"soak[{leg}]: done ({trainer.state.step} steps)", flush=True)


def run_selection(out_dir: str, epochs: int = 24, backing: str = "device") -> dict:
    """Model-selection control-flow soak (VERDICT r4 missing #4).

    The reference's entire model-selection story is per-epoch eval with
    ``eval_loss`` best-checkpoint selection, early-stopping patience and
    save_total_limit pruning (/root/reference/exp/cxr_pt/config.yaml:13-19,
    run.py:109-121) — machinery our short unit tests exercise but no
    sustained run ever had. This leg runs >= 20 epochs of the flagship
    recipe over a SMALL train split (deliberately overfittable) with a
    held-out synthetic eval split, everything active, then asserts
    against the on-disk outcome:

      - state.best_checkpoint is exactly the checkpoint whose logged
        eval_loss is minimal over all epochs run;
      - pruning kept exactly ``save_total_limit`` checkpoints, and the
        best one survived pruning;
      - load_best_model_at_end restored bit-identical params to the
        best checkpoint's;
      - the NaN/temperature guards stayed green throughout.
    """
    import jax
    import numpy as np

    from radzero_tpu.utils import stall_guard

    prodder = stall_guard.install()  # noqa: F841 — tunnel wedge watchdog

    cache = os.path.join(REPO, ".jax_cache")
    if jax.default_backend() != "cpu":
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    from radzero_tpu.models.configuration import RadZeroConfig
    from radzero_tpu.train.checkpoint import (
        list_checkpoints,
        load_trainer_state,
        restore_checkpoint,
    )
    from radzero_tpu.train.tower_cache import TowerCache
    from radzero_tpu.train.trainer import RadZeroTrainer, TrainerArgs

    n_train, n_eval, limit, patience = 512, 128, 3, 6
    train = build_loader(n_records=n_train, learnable=True)
    # held-out split: disjoint record ids, fixed order, same learnable
    # quadrant<->keyword structure so eval can genuinely improve
    evalset = build_loader(n_records=n_eval, first_id=N_RECORDS + 1000,
                           shuffle=False, learnable=True)
    args = TrainerArgs(
        output_dir=out_dir,
        num_train_epochs=epochs,
        learning_rate=5e-5,          # gentle: improve for many epochs on
                                     # the quadrant signal, then overfit
        warmup_steps=16,
        logging_steps=1,
        bf16=True,
        gradient_checkpointing=True,
        load_best_model_at_end=True,
        metric_for_best_model="eval_loss",
        early_stopping_patience=patience,
        save_total_limit=limit,
        seed=42,
    )

    def guard(rec):
        if "loss" in rec:
            assert np.isfinite(rec["loss"]), f"NaN loss: {rec}"
        if "eval_loss" in rec:
            assert np.isfinite(rec["eval_loss"]), f"NaN eval loss: {rec}"

    cache_obj = (TowerCache(backing="device", n_records=n_train)
                 if backing == "device" else TowerCache(backing=backing))
    trainer = RadZeroTrainer(
        RadZeroConfig(), args, train, evalset,
        tower_cache=cache_obj, metrics_callback=guard,
    )
    t0 = time.perf_counter()
    state = trainer.train()
    wall = time.perf_counter() - t0

    eval_recs = [r for r in state.log_history if "eval_loss" in r]
    epochs_run = len(eval_recs)
    assert epochs_run >= 20 or state.patience_left == 0, (
        f"only {epochs_run} eval epochs and no early stop"
    )

    # 1) best checkpoint == argmin of the logged eval losses
    best_logged = min(eval_recs, key=lambda r: r["eval_loss"])
    assert state.best_metric == best_logged["eval_loss"], (
        state.best_metric, best_logged)
    assert state.best_checkpoint is not None
    assert state.best_checkpoint.endswith(f"checkpoint-{best_logged['step']}"), (
        state.best_checkpoint, best_logged)

    # 2) pruning kept exactly the limit, best survived
    kept = list_checkpoints(out_dir)
    assert len(kept) == limit, f"pruning kept {len(kept)} != limit {limit}: {kept}"
    assert os.path.abspath(state.best_checkpoint) in [
        os.path.abspath(p) for p in kept
    ], f"best checkpoint pruned: {state.best_checkpoint} not in {kept}"

    # 2b) the best checkpoint's own persisted meta agrees with the log
    best_meta = load_trainer_state(state.best_checkpoint)
    assert best_meta["metrics"]["eval_loss"] == best_logged["eval_loss"]

    # 3) load_best_model_at_end restored the best params bit-for-bit
    restored = restore_checkpoint(
        state.best_checkpoint,
        {"trainable": trainer.trainable, "opt_state": trainer.opt_state},
    )
    flat_now = jax.tree_util.tree_leaves(trainer.trainable)
    flat_best = jax.tree_util.tree_leaves(restored["trainable"])
    for a, b in zip(flat_now, flat_best):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    result = {
        "metric": "model_selection_soak",
        "epochs_run": epochs_run,
        "epochs_budget": epochs,
        "steps": state.step,
        "early_stopped": epochs_run < epochs,
        "patience": patience,
        "best_metric": state.best_metric,
        "best_checkpoint": os.path.basename(state.best_checkpoint),
        "best_epoch": int(best_logged["epoch"]),
        "eval_loss_curve": [round(r["eval_loss"], 4) for r in eval_recs],
        "save_total_limit": limit,
        "checkpoints_kept": [os.path.basename(p) for p in kept],
        "checkpoints_pruned": epochs_run - limit,
        "best_params_restored_bit_identical": True,
        "nan_guard": "green",
        "wall_s": round(wall, 1),
    }
    with open(os.path.join(out_dir, "selection_result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return result


def read_log(out_dir: str):
    recs = {}
    with open(os.path.join(out_dir, "log_history.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if "loss" in r and "step" in r:
                recs[r["step"]] = r  # later records win (resume overwrites)
    return recs


def assemble(out: str, kill_at: int) -> dict:
    """Compare the control and resumed logs and write soak_result.json.

    Factored out of the parent protocol so an interrupted run (e.g. a
    session death mid-leg) can re-run only the missing leg and then
    assemble, instead of repeating completed legs.
    """
    ctrl_dir = os.path.join(out, "control")
    kill_dir = os.path.join(out, "killed")
    control = read_log(ctrl_dir)
    resumed = read_log(kill_dir)
    shared = sorted(set(control) & set(resumed))
    assert shared, "no shared steps between control and resumed logs"
    deltas = [abs(control[s]["loss"] - resumed[s]["loss"]) for s in shared]
    rel = [d / max(abs(control[s]["loss"]), 1e-9) for d, s in zip(deltas, shared)]
    max_rel = max(rel)
    post_resume = [s for s in shared if s > kill_at]
    assert post_resume, "resumed leg never got past the kill point"
    assert max_rel < 1e-5, (
        f"resumed trajectory diverged from control: max rel delta {max_rel:.2e}"
    )

    losses = [control[s]["loss"] for s in sorted(control)]
    k = max(len(losses) // 10, 1)
    result = {
        "metric": "train_soak",
        "steps": len(losses),
        "loss_first10_mean": float(np.mean(losses[:k])),
        "loss_last10_mean": float(np.mean(losses[-k:])),
        "loss_curve_every10": [round(v, 4) for v in losses[::10]],
        "loss_temperature_final": control[max(control)]["loss_temperature"],
        "attn_temperature_final": control[max(control)].get("attn_temperature"),
        "samples_per_sec_last_epoch_mean": round(
            BATCH / float(np.mean([control[s]["step_wall_s"]
                                   for s in sorted(control)[-len(losses) // 10:]])), 1),
        "kill_at_step": kill_at,
        "resume_max_rel_loss_delta": max_rel,
        "nan_guard": "green",
    }
    assert result["loss_last10_mean"] < result["loss_first10_mean"], result
    with open(os.path.join(out, "soak_result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return result


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--out", default="/tmp/radzero_soak")
    ap.add_argument("--leg", choices=["control", "killed", "resumed"], default=None)
    ap.add_argument("--selection", action="store_true",
                    help="run the model-selection leg instead of the "
                         "kill/resume protocol: >= 20 epochs over a small "
                         "overfittable split with per-epoch eval, eval_loss "
                         "best-ckpt selection, early stopping and "
                         "save_total_limit pruning all active, asserted "
                         "against the on-disk outcome")
    ap.add_argument("--epochs", type=int, default=24,
                    help="epoch budget for --selection")
    ap.add_argument("--kill-at", type=int, default=None)
    ap.add_argument("--assemble-only", action="store_true",
                    help="skip the legs; compare existing control/killed "
                         "logs under --out and write soak_result.json")
    ap.add_argument("--backing", choices=["ram", "device"], default="device",
                    help="tower-cache store: 'device' keeps tokens in HBM "
                         "(zero per-step token transfer); 'ram' exercises "
                         "the host store + per-step upload path")
    args = ap.parse_args()
    kill_at = args.kill_at or args.steps // 2

    if args.selection:
        run_selection(os.path.join(args.out, "selection"),
                      epochs=args.epochs, backing=args.backing)
        return
    if args.assemble_only:
        assemble(args.out, kill_at)
        return
    if args.leg:
        run_leg(args.leg, args.steps, args.out, kill_at, backing=args.backing)
        return

    # parent protocol: three legs in child processes (the killed leg
    # must be able to os._exit without taking the parent down)
    ctrl_dir = os.path.join(args.out, "control")
    kill_dir = os.path.join(args.out, "killed")
    os.makedirs(ctrl_dir, exist_ok=True)
    os.makedirs(kill_dir, exist_ok=True)

    def spawn(leg, out_dir):
        cmd = [sys.executable, os.path.abspath(__file__), "--leg", leg,
               "--steps", str(args.steps), "--out", out_dir,
               "--kill-at", str(kill_at), "--backing", args.backing]
        t0 = time.perf_counter()
        r = subprocess.run(cmd, cwd=REPO)
        print(f"leg {leg}: rc={r.returncode} in {time.perf_counter() - t0:.0f}s",
              flush=True)
        return r.returncode

    rc = spawn("control", ctrl_dir)
    assert rc == 0, f"control leg failed rc={rc}"
    rc = spawn("killed", kill_dir)
    assert rc == 17, f"killed leg should hard-exit 17, got rc={rc}"
    rc = spawn("resumed", kill_dir)
    assert rc == 0, f"resumed leg failed rc={rc}"

    assemble(args.out, kill_at)


if __name__ == "__main__":
    main()
