"""Distributed eval driver: dataset-sharded runs reproduce serial metrics.

The reference evaluates every dataset serially on rank 0
(/root/reference/exp/cxr_pt/run.py:123-169); the distributed driver
partitions each task family's dataset registry across processes and
merges per-rank result parts on the shared filesystem. Two "processes"
are exercised in one interpreter — the code path (slice → evaluate →
atomic part publish → poll-and-merge) is identical to two hosts over
shared storage, which is the real deployment medium.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_eval_harness import data_root, scorer  # noqa: F401,E402 (fixtures)

from radzero_tpu.eval.distributed import (  # noqa: E402
    DistributedInference,
    merge_partial_results,
    partition_datasets,
    write_partial_result,
)
from radzero_tpu.eval.inference import Inference  # noqa: E402


def test_partition_is_disjoint_exhaustive_deterministic():
    names = ["A", "B", "C", "D", "E"]
    parts = [partition_datasets(names, k, 3) for k in range(3)]
    assert parts == [["A", "D"], ["B", "E"], ["C"]]
    flat = [n for p in parts for n in p]
    assert sorted(flat) == sorted(names)
    with pytest.raises(ValueError):
        partition_datasets(names, 3, 3)


def test_merge_waits_and_unions(tmp_path):
    d = str(tmp_path / "task")
    write_partial_result(d, 0, {"A": {"auc": 0.5}})
    write_partial_result(d, 1, {"B": {"auc": 0.7}})
    merged = merge_partial_results(d, 2, timeout_s=5)
    assert merged == {"A": {"auc": 0.5}, "B": {"auc": 0.7}}
    assert json.load(open(os.path.join(d, "result.json"))) == merged

    with pytest.raises(TimeoutError, match="missing"):
        merge_partial_results(str(tmp_path / "other"), 1, timeout_s=0.2, poll_s=0.05)

    # duplicate dataset across ranks is a hard error, not silent overwrite
    d2 = str(tmp_path / "dup")
    write_partial_result(d2, 0, {"A": {"auc": 0.5}})
    write_partial_result(d2, 1, {"A": {"auc": 0.6}})
    with pytest.raises(ValueError, match="multiple ranks"):
        merge_partial_results(d2, 2, timeout_s=5)


def test_merge_ignores_stale_parts_from_previous_run(tmp_path):
    """Re-running eval into the same output dir must not union a
    previous run's part files: parts are tagged with a run token and
    the merge treats a mismatched token as not-yet-present."""
    d = str(tmp_path / "task")
    # previous run left both parts behind
    write_partial_result(d, 0, {"A": {"auc": 0.1}}, run_id="old")
    write_partial_result(d, 1, {"B": {"auc": 0.2}}, run_id="old")
    # new run: rank 0 has finished, rank 1 hasn't overwritten yet
    write_partial_result(d, 0, {"A": {"auc": 0.9}}, run_id="new")
    with pytest.raises(TimeoutError, match="stale"):
        merge_partial_results(d, 2, timeout_s=0.3, poll_s=0.05, run_id="new")
    # rank 1 publishes -> merge sees only this run's parts
    write_partial_result(d, 1, {"B": {"auc": 0.8}}, run_id="new")
    merged = merge_partial_results(d, 2, timeout_s=5, run_id="new")
    assert merged == {"A": {"auc": 0.9}, "B": {"auc": 0.8}}

    # legacy/untagged files are likewise not attributable to this run
    d2 = str(tmp_path / "legacy")
    os.makedirs(d2)
    with open(os.path.join(d2, "result.part0.json"), "w") as f:
        json.dump({"A": {"auc": 0.1}}, f)  # raw pre-envelope layout
    with pytest.raises(TimeoutError):
        merge_partial_results(d2, 1, timeout_s=0.3, poll_s=0.05, run_id="new")


def _dist(data_root, k, n, **kw):
    return DistributedInference(
        ["Chexpert"], ["ChestXDet10", "MS-CXR"], ["SIIM", "RSNA"], data_root,
        batch_size=4, process_index=k, process_count=n,
        merge_timeout_s=30, **kw,
    )


def test_two_process_eval_matches_serial(data_root, scorer, tmp_path):
    serial = Inference(["Chexpert"], ["ChestXDet10", "MS-CXR"], ["SIIM", "RSNA"],
                       data_root, batch_size=4)
    s_dir = tmp_path / "serial"
    serial_cls = serial.classification(scorer, str(s_dir / "cls"))
    serial_det = serial.grounding(scorer, str(s_dir / "det"))
    serial_seg = serial.segmentation(scorer, str(s_dir / "seg"))

    d_dir = tmp_path / "dist"
    # rank 1 publishes its parts first (no merge), then rank 0 merges
    r1 = _dist(data_root, 1, 2)
    assert r1.classification(scorer, str(d_dir / "cls")) is None
    assert r1.grounding(scorer, str(d_dir / "det")) is None
    assert r1.segmentation(scorer, str(d_dir / "seg")) is None

    r0 = _dist(data_root, 0, 2)
    dist_cls = r0.classification(scorer, str(d_dir / "cls"))
    dist_det = r0.grounding(scorer, str(d_dir / "det"))
    dist_seg = r0.segmentation(scorer, str(d_dir / "seg"))

    def assert_same(a, b):
        assert sorted(a) == sorted(b)
        for name in a:
            va, vb = a[name], b[name]
            items = va.items() if isinstance(va, dict) else [("", va)]
            for metric, val in items:
                got = vb[metric] if isinstance(vb, dict) else vb
                if isinstance(val, (int, float)) and isinstance(got, (int, float)):
                    np.testing.assert_allclose(got, val, rtol=1e-12, err_msg=f"{name}.{metric}")
                else:
                    assert got == val, f"{name}.{metric}"

    assert_same(serial_cls, dist_cls)
    assert_same(serial_det, dist_det)
    assert_same(serial_seg, dist_seg)

    # merged artifact exists and equals the returned dict
    assert json.load(open(d_dir / "det" / "result.json")) == json.loads(
        json.dumps(dist_det)
    )


def test_failed_rank_publishes_error_part_and_merge_proceeds(
    data_root, scorer, tmp_path, monkeypatch
):
    """Containment contract: a task failure on a non-zero rank must not
    leave rank 0 blocked for the whole merge timeout — the failing rank
    publishes an error-tagged part and the merge unions the completed
    slices (serial driver parity: degrade to a logged error)."""
    d = tmp_path / "det"

    def boom(self, scorer, save_dir, **kw):
        raise RuntimeError("synthetic task failure")

    monkeypatch.setattr(Inference, "grounding", boom)
    r1 = _dist(data_root, 1, 2)
    assert r1.grounding(scorer, str(d)) is None  # error part published
    monkeypatch.undo()

    r0 = _dist(data_root, 0, 2)
    merged = r0.grounding(scorer, str(d))  # must NOT TimeoutError
    assert sorted(merged) == ["ChestXDet10"]  # rank 0's slice only
    assert json.load(open(d / "result.json")) == json.loads(json.dumps(merged))


def test_params_digest_distinguishes_model_states(scorer):
    """The fallback run token fingerprints the MODEL STATE: re-eval of a
    further-trained checkpoint into the same dir must never match a
    stale part (the old fingerprint of task|registry|world-size collided
    across sequential runs with the same config)."""
    import jax
    import jax.numpy as jnp

    from radzero_tpu.eval.distributed import _params_digest

    d1 = _params_digest(scorer)
    assert d1 == _params_digest(scorer)  # deterministic

    leaves, treedef = jax.tree.flatten(scorer.params)
    idx = next(
        i for i, l in enumerate(leaves)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
    )
    leaves = list(leaves)
    leaves[idx] = leaves[idx] + 1.0  # one training step's worth of drift

    class S:
        params = jax.tree.unflatten(treedef, leaves)

    assert _params_digest(S()) != d1

    class N:
        params = None

    assert _params_digest(N()) == "no-params"


def test_fallback_run_id_ignores_parts_from_other_model_state(
    data_root, scorer, tmp_path, monkeypatch
):
    """Integration: a part published by rank 1 under checkpoint A must
    read as stale to a rank-0 merge running checkpoint B, even with an
    identical dataset registry and world size."""
    import radzero_tpu.eval.distributed as dist_mod

    d = tmp_path / "cls"
    monkeypatch.setattr(dist_mod, "_params_digest", lambda s: "ckpt-old")
    r1 = _dist(data_root, 1, 2)
    assert r1.classification(scorer, str(d)) is None  # part published

    monkeypatch.setattr(dist_mod, "_params_digest", lambda s: "ckpt-new")
    r0 = DistributedInference(
        ["Chexpert"], [], [], data_root, batch_size=4,
        process_index=0, process_count=2, merge_timeout_s=1.0,
    )
    with pytest.raises(TimeoutError, match="stale"):
        r0.classification(scorer, str(d))
