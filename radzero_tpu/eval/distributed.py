"""Distributed zero-shot eval driver: shard DATASETS across processes.

The reference runs the whole suite serially on rank 0
(/root/reference/exp/cxr_pt/run.py:123-169 — the quirk SURVEY.md §7
flags to fix). Batches were already mesh-sharded inside the scorer;
this module adds the outer level: each process evaluates a disjoint,
deterministic slice of every task's dataset registry, writes its
metrics as ``result.part{k}.json``, and process 0 polls the shared
filesystem for all parts and unions them into the same ``result.json``
the serial run produces.

Filesystem rendezvous (rather than a collective) is deliberate: eval
runs at fp32 on loaded checkpoints and often outlives any jit context;
on multi-host TPU pods the output dir is shared storage, which is also
exactly the medium of the merged artifact. Metrics are per-dataset, so
union-of-dicts reproduces the serial result bit-for-bit.

Parts are tagged with a per-run token (rank-0 random broadcast in real
multi-process runs, a config fingerprint otherwise) so re-evaluating
into the same output dir — e.g. after further training — never merges
a previous run's leftover part files.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Dict, List, Optional, Sequence

from radzero_tpu.eval.inference import Inference
from radzero_tpu.utils.json_io import save_json
from radzero_tpu.utils.logging import logger

_PART_FMT = "result.part{k}.json"


def agree_run_id(process_index: int, process_count: int) -> Optional[str]:
    """A token shared by every process of THIS eval run, distinguishing
    its part files from stale ones a previous run left in the same
    output dir (re-eval after further training is the common case).
    Rank 0 draws a random 63-bit value and broadcasts it — unique per
    run with no filesystem coordination. Requires an initialized
    distributed runtime (which is what made process_count > 1 true);
    returns None if the broadcast is unavailable."""
    if process_count <= 1:
        return "serial"
    try:
        import secrets

        import numpy as np
        from jax.experimental import multihost_utils

        token = np.asarray([secrets.randbits(63)], np.int64)
        token = multihost_utils.broadcast_one_to_all(token)
        return f"{int(token[0]):016x}"
    except Exception:
        return None


def _params_digest(scorer) -> str:
    """Deterministic fingerprint of the scorer's model state: per-leaf
    shape/dtype plus the leading 64 elements (sliced on device — only a
    few KB ever cross to host). Used by the fallback run token so that
    re-evaluating into the same dir after further training — which
    changes essentially every trainable leaf — can never merge a stale
    part produced by a DIFFERENT model state. Parts from an identical
    state carry bit-identical metrics, so matching them is harmless."""
    import numpy as np

    params = getattr(scorer, "params", None)
    if params is None:
        return "no-params"
    import jax

    h = hashlib.sha1()
    for leaf in jax.tree.leaves(params):
        try:
            head = leaf.reshape(-1)[:64] if hasattr(leaf, "reshape") else leaf
            a = np.asarray(head)
            h.update(str(getattr(leaf, "shape", ())).encode())
            h.update(str(a.dtype).encode())
            h.update(a.tobytes())
        except Exception:
            h.update(repr(leaf).encode())
    return h.hexdigest()[:16]


def partition_datasets(names: Sequence[str], process_index: int,
                       process_count: int) -> List[str]:
    """Deterministic strided slice of a dataset list (same pattern as
    data/shards.py multi-host record sharding): process k takes names
    k, k+P, k+2P, ... — order-preserving, disjoint, exhaustive."""
    if not (0 <= process_index < process_count):
        raise ValueError(f"process_index {process_index} not in [0, {process_count})")
    return list(names[process_index::process_count])


def write_partial_result(save_dir: str, process_index: int, payload: Dict,
                         run_id: Optional[str] = None,
                         error: Optional[str] = None) -> str:
    """Atomically publish one process's metrics slice, tagged with the
    run token so a later run's merge never consumes it as fresh.
    ``error`` marks a contained task failure on this rank: the part
    still publishes (so the merge never stalls waiting for a crashed
    rank) with whatever metrics the rank completed."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, _PART_FMT.format(k=process_index))
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"run_id": run_id, "metrics": payload, "error": error}, f, indent=2)
    os.replace(tmp, path)  # atomic on POSIX: readers never see partials
    return path


def _read_part(path: str, run_id: Optional[str]) -> Optional[Dict]:
    """The part dict ({"metrics", "error"}) if it belongs to this run,
    else None (a stale file from a previous eval into the same dir —
    the owning rank will overwrite it; treat as not-yet-present and
    keep polling)."""
    try:
        with open(path) as f:
            part = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    if not isinstance(part, dict) or "metrics" not in part:
        return None  # pre-run_id layout: can't attribute, treat as stale
    if part.get("run_id") != run_id:
        return None
    return {"metrics": part["metrics"], "error": part.get("error")}


def merge_partial_results(save_dir: str, process_count: int,
                          timeout_s: float = 3600.0,
                          poll_s: float = 1.0,
                          run_id: Optional[str] = None) -> Dict:
    """Process-0 side: wait for every rank's part file FROM THIS RUN
    (matching ``run_id``), union the per-dataset dicts, write the
    canonical ``result.json``. Stale parts — earlier runs into the same
    dir, or ranks beyond a shrunk process_count — are ignored.

    A part carrying an ``error`` (contained task failure on that rank)
    is merged for whatever metrics it completed; the error is logged —
    matching the serial driver's degrade-to-logged-error contract
    rather than stalling or crashing the merge."""
    paths = [os.path.join(save_dir, _PART_FMT.format(k=k)) for k in range(process_count)]
    deadline = time.monotonic() + timeout_s
    while True:
        parts = [_read_part(p, run_id) for p in paths]
        missing = [p for p, part in zip(paths, parts) if part is None]
        if not missing:
            break
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"distributed eval merge timed out after {timeout_s:.0f}s; "
                f"missing or stale (run_id != {run_id!r}): {missing}"
            )
        time.sleep(poll_s)
    merged: Dict = {}
    for k, part in enumerate(parts):
        if part["error"]:
            logger.error(
                f"[distributed eval] rank {k} reported a contained "
                f"failure: {part['error']} — merging its completed "
                "metrics; its remaining datasets are absent from result.json"
            )
        overlap = set(merged) & set(part["metrics"])
        if overlap:
            raise ValueError(f"dataset(s) {sorted(overlap)} reported by multiple ranks")
        merged.update(part["metrics"])
    save_json(merged, os.path.join(save_dir, "result.json"))
    return merged


class DistributedInference:
    """Inference facade that shards each task family's dataset list
    across processes and merges metrics on process 0.

    Per task the flow is: every process evaluates ONLY its slice into
    the shared save dir (per-dataset artifact files are disjoint by
    construction), publishes ``result.part{k}.json``, and process 0
    merges. With ``process_count=1`` this degenerates to the serial
    driver byte-for-byte.
    """

    def __init__(
        self,
        cls_dataset: List[str],
        det_dataset: List[str],
        seg_dataset: List[str],
        data_root_dir: str,
        batch_size: int = 64,
        num_workers: int = 8,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        merge_timeout_s: float = 3600.0,
        run_id: Optional[str] = None,
    ):
        if (process_index is None) != (process_count is None):
            # silently auto-filling the other half would discard an
            # explicit rank and evaluate the wrong dataset slice
            raise ValueError(
                "pass BOTH process_index and process_count (manual "
                "launcher) or NEITHER (auto-detect from the JAX "
                f"distributed runtime); got process_index={process_index} "
                f"process_count={process_count}"
            )
        auto = process_index is None
        if auto:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        if run_id is None and auto:
            # real multi-process run: agree on a fresh token via the
            # distributed runtime so re-evals into the same output dir
            # never merge a previous run's parts
            run_id = agree_run_id(process_index, process_count)
        self.run_id = run_id
        self.process_index = process_index
        self.process_count = process_count
        self.merge_timeout_s = merge_timeout_s
        self.data_root_dir = data_root_dir
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.cls_dataset = cls_dataset
        self.det_dataset = det_dataset
        self.seg_dataset = seg_dataset

    # ------------------------------------------------------------------
    def _run_task(self, task: str, full_list: List[str], scorer,
                  save_dir: str, **kwargs) -> Optional[Dict]:
        run_id = self.run_id
        if run_id is None:
            # explicitly-constructed ranks with no caller token (tests,
            # manual launchers): a deterministic fingerprint of (task,
            # registry, world size, MODEL STATE) — every rank of the
            # same launch computes the same value; a changed registry,
            # world size, or checkpoint invalidates old parts. The model
            # digest is what makes "re-eval the same dir after further
            # training" safe without a broadcast: a leftover part can
            # only match if it was produced by an identical model state,
            # in which case its metrics are bit-identical anyway.
            run_id = hashlib.sha1(
                f"{task}|{','.join(full_list)}|{self.process_count}|"
                f"{_params_digest(scorer)}".encode()
            ).hexdigest()[:16]
        mine = partition_datasets(full_list, self.process_index, self.process_count)
        lists = {"classification": [], "grounding": [], "segmentation": []}
        lists[task] = mine
        inf = Inference(
            lists["classification"], lists["grounding"], lists["segmentation"],
            self.data_root_dir, self.batch_size, self.num_workers,
            write_result_json=False,
        )
        logger.info(
            f"[distributed eval] process {self.process_index}/{self.process_count} "
            f"{task}: {mine or '(no slice)'}"
        )
        # containment (the serial driver's contract: a failed task is a
        # logged error, not a crash): ALWAYS publish this rank's part —
        # a rank that dies before publishing would leave rank 0 blocked
        # in merge_partial_results for the full merge timeout
        error = None
        try:
            part = getattr(inf, task)(scorer, save_dir, **kwargs) if mine else {}
            if part is None:  # task raised inside its containment wrapper
                part, error = {}, f"{task} failed on process {self.process_index}; see log"
        except Exception as e:
            part, error = {}, (
                f"{task} crashed on process {self.process_index}: {e!r}"
            )
        if error:
            logger.error(f"[distributed eval] {error}")
        write_partial_result(
            save_dir, self.process_index, part, run_id=run_id, error=error
        )
        if self.process_index == 0:
            return merge_partial_results(
                save_dir, self.process_count, self.merge_timeout_s,
                run_id=run_id,
            )
        return None

    def classification(self, scorer, save_root_dir: str,
                       compute_metric: bool = True) -> Optional[Dict]:
        return self._run_task(
            "classification", self.cls_dataset, scorer, save_root_dir,
            compute_metric=compute_metric,
        )

    def grounding(self, scorer, save_root_dir: str) -> Optional[Dict]:
        return self._run_task("grounding", self.det_dataset, scorer, save_root_dir)

    def segmentation(self, scorer, save_root_dir: str,
                     compute_pixel_level_auroc: bool = False) -> Optional[Dict]:
        return self._run_task(
            "segmentation", self.seg_dataset, scorer, save_root_dir,
            compute_pixel_level_auroc=compute_pixel_level_auroc,
        )
