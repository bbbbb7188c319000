"""Import-matrix: every subpackage must import first in a fresh interpreter.

Round-1 regression: ``import radzero_tpu.losses`` crashed with a circular
import (losses/__init__ -> radzero_loss -> models/__init__ -> radzero.py ->
partially-initialized losses). The alphabetical pytest order masked it
because models always loaded first. This matrix imports each subpackage as
the *first* radzero_tpu import of a fresh interpreter.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUBPACKAGES = [
    "radzero_tpu",
    "radzero_tpu.cli",
    "radzero_tpu.config",
    "radzero_tpu.data",
    "radzero_tpu.eval",
    "radzero_tpu.losses",
    "radzero_tpu.losses.radzero_loss",
    "radzero_tpu.models",
    "radzero_tpu.ops",
    "radzero_tpu.parallel",
    "radzero_tpu.preprocess",
    "radzero_tpu.train",
    "radzero_tpu.utils",
    "radzero_tpu.viz",
]


@pytest.mark.parametrize("module", SUBPACKAGES)
def test_cold_import(module):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # keep the matrix off the TPU tunnel
    env.setdefault("PYTHONPATH", REPO)
    res = subprocess.run(
        [sys.executable, "-c", f"import {module}"],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert res.returncode == 0, f"cold import of {module} failed:\n{res.stderr[-2000:]}"
