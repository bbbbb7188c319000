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
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence

from radzero_tpu.eval.inference import Inference
from radzero_tpu.utils.json_io import save_json
from radzero_tpu.utils.logging import logger

_PART_FMT = "result.part{k}.json"


def partition_datasets(names: Sequence[str], process_index: int,
                       process_count: int) -> List[str]:
    """Deterministic strided slice of a dataset list (same pattern as
    data/shards.py multi-host record sharding): process k takes names
    k, k+P, k+2P, ... — order-preserving, disjoint, exhaustive."""
    if not (0 <= process_index < process_count):
        raise ValueError(f"process_index {process_index} not in [0, {process_count})")
    return list(names[process_index::process_count])


def write_partial_result(save_dir: str, process_index: int, payload: Dict) -> str:
    """Atomically publish one process's metrics slice."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, _PART_FMT.format(k=process_index))
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2)
    os.replace(tmp, path)  # atomic on POSIX: readers never see partials
    return path


def merge_partial_results(save_dir: str, process_count: int,
                          timeout_s: float = 3600.0,
                          poll_s: float = 1.0) -> Dict:
    """Process-0 side: wait for every rank's part file, union the
    per-dataset dicts, write the canonical ``result.json``."""
    paths = [os.path.join(save_dir, _PART_FMT.format(k=k)) for k in range(process_count)]
    deadline = time.monotonic() + timeout_s
    while True:
        missing = [p for p in paths if not os.path.exists(p)]
        if not missing:
            break
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"distributed eval merge timed out after {timeout_s:.0f}s; "
                f"missing {missing}"
            )
        time.sleep(poll_s)
    merged: Dict = {}
    for p in paths:
        with open(p) as f:
            part = json.load(f)
        overlap = set(merged) & set(part)
        if overlap:
            raise ValueError(f"dataset(s) {sorted(overlap)} reported by multiple ranks")
        merged.update(part)
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
    ):
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
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
        part = getattr(inf, task)(scorer, save_dir, **kwargs) if mine else {}
        if part is None:  # task raised inside its containment wrapper
            raise RuntimeError(
                f"{task} failed on process {self.process_index}; see log"
            )
        write_partial_result(save_dir, self.process_index, part)
        if self.process_index == 0:
            return merge_partial_results(
                save_dir, self.process_count, self.merge_timeout_s
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
