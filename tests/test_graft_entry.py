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


def test_dryrun_multichip_driver_mode_n8():
    """Invoke dryrun_multichip(8) exactly as the driver does: a fresh
    interpreter whose host exposes fewer than 8 devices, forcing the
    virtual-CPU-mesh re-exec path and the data-x-model branch.

    Round-1 regression: MULTICHIP_r01.json rc=1 because the entry sliced
    jax.devices()[:8] on a 1-device host.
    """
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # simulate the 1-chip bench host: exactly one visible device
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if not f.startswith("--xla_force_host_platform_device_count")
    )
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=1").strip()
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import jax; assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    res = subprocess.run(
        [sys.executable, "-c", code, REPO],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "dryrun_multichip(8)" in res.stdout and "ok" in res.stdout, res.stdout
