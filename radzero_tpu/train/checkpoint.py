"""Orbax checkpointing: save / resume / best-model selection.

The TPU equivalent of HF Trainer checkpointing as used by the reference
(SURVEY.md §5 checkpoint row: epoch-wise save, resume with step/epoch
restore, best-model-at-end, save_total_limit pruning, eval-time
rehydration). State is one pytree: trainable/frozen params, optimizer
state, step/epoch counters, and RNG seed state.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, List, Optional

import orbax.checkpoint as ocp

from radzero_tpu.utils.json_io import load_json, save_json
from radzero_tpu.utils.logging import logger

_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


def checkpoint_dir(output_dir: str, step: int) -> str:
    return os.path.join(output_dir, f"checkpoint-{step}")


def list_checkpoints(output_dir: str) -> List[str]:
    if not os.path.isdir(output_dir):
        return []
    out = []
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(output_dir, name)))
    return [p for _, p in sorted(out)]


def get_last_checkpoint(output_dir: str) -> Optional[str]:
    """Latest checkpoint dir (ref exp/cxr_pt/trainer.py:105 semantics)."""
    ckpts = list_checkpoints(output_dir)
    return ckpts[-1] if ckpts else None


def save_checkpoint(
    output_dir: str,
    step: int,
    state: Dict[str, Any],
    metadata: Dict[str, Any],
    save_total_limit: Optional[int] = None,
    best_path: Optional[str] = None,
) -> str:
    """Save state pytree + metadata JSON; prune old ckpts keeping the best."""
    path = checkpoint_dir(output_dir, step)
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(path), "state"), state)
    ckptr.wait_until_finished()
    save_json(metadata, os.path.join(path, "trainer_state.json"))

    if save_total_limit:
        # Reference (HF) semantics: the best checkpoint counts WITHIN
        # the limit — ``limit`` total survive (best + the most recent
        # ones), not ``limit`` recent PLUS the best. One documented HF
        # corner kept: the just-saved checkpoint is never pruned, so
        # ``save_total_limit=1`` with a distinct older best retains two
        # (ref common/trainer.py:925-936).
        ckpts = list_checkpoints(output_dir)
        by_abs = {os.path.abspath(p): p for p in ckpts}
        keep = [path]
        if best_path and os.path.abspath(best_path) in by_abs:
            best = by_abs[os.path.abspath(best_path)]
            if best not in keep:
                keep.append(best)
        for p in reversed(ckpts):  # newest first
            if len(keep) >= save_total_limit:
                break
            if p not in keep:
                keep.append(p)
        for p in ckpts:
            if p not in keep:
                logger.info(f"pruning checkpoint {p}")
                shutil.rmtree(p, ignore_errors=True)
    return path


def restore_checkpoint(path: str, target_state: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a state pytree shaped like ``target_state``."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(os.path.abspath(path), "state"), target_state)


def load_trainer_state(path: str) -> Dict[str, Any]:
    return load_json(os.path.join(path, "trainer_state.json"))
