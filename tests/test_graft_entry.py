"""Driver-contract checks for __graft_entry__ (shape-level, no TPU)."""

import importlib.util
import os

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(REPO, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_traces_and_shapes():
    mod = _load_entry_module()
    fn, args = mod.entry()
    out = jax.eval_shape(fn, *args)  # trace only — no flagship compute on CPU
    logits, scores = out
    b, n = 4, 10
    assert logits.shape == (b, n)
    assert scores.shape == (b, n, 37 * 37)


def test_dryrun_multichip_two_devices():
    mod = _load_entry_module()
    mod.dryrun_multichip(2)  # dp-only branch (odd/small device counts)
