"""Tracing / profiling / debugging hooks.

The TPU-native equivalents of the reference's observability row
(SURVEY.md §5): HF speed_metrics -> :func:`speed_metrics`; the dormant
torch_xla metrics-report branches -> :func:`trace` (jax.profiler);
``full_determinism`` + DebugUnderflowOverflow -> :func:`debug_flags`.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


def speed_metrics(prefix: str, start_time: float, num_samples: int, num_steps: int) -> Dict[str, float]:
    """samples/sec + steps/sec (HF Trainer speed_metrics semantics,
    common/trainer.py:903-909)."""
    runtime = time.perf_counter() - start_time
    out = {f"{prefix}_runtime": round(runtime, 4)}
    if runtime > 0:
        out[f"{prefix}_samples_per_second"] = round(num_samples / runtime, 3)
        out[f"{prefix}_steps_per_second"] = round(num_steps / runtime, 3)
    return out


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace scope (view with TensorBoard / xprof)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def debug_flags(nans: bool = False, deterministic: bool = False) -> None:
    """NaN checking + deterministic-ops mode.

    ``nans`` -> jax_debug_nans (raises on first NaN, the equivalent of the
    reference's DebugUnderflowOverflow option); ``deterministic`` ->
    xla_gpu-independent deterministic reductions via
    jax_default_matmul_precision='highest' + disabling autotune-induced
    nondeterminism (TPU compute is deterministic per compile by default;
    this pins the numerics across recompiles, the reference's
    ``full_determinism`` analogue, config.yaml:26).
    """
    import jax

    if nans:
        jax.config.update("jax_debug_nans", True)
    if deterministic:
        jax.config.update("jax_default_matmul_precision", "highest")


class StepTimer:
    """Lightweight per-step wall-clock accumulator for the train loop."""

    def __init__(self):
        self.t0 = None
        self.total = 0.0
        self.count = 0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.total += time.perf_counter() - self.t0
        self.count += 1
        return False

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)
