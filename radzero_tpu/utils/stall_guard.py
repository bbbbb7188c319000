"""Watchdog for the shared axon device tunnel (bench environment).

The tunnel occasionally wedges MID-RUN — a blocked claim/compile RPC;
observed repeatedly on this host. The signature: the stuck client
accumulates ~zero CPU indefinitely. Empirically, a NEW client's
connection attempt unwedges it, even if that probe itself then blocks
behind the revived claim.

``StallProdder`` runs a daemon thread watching a progress heartbeat;
when it goes stale it fires a tiny bounded jax probe subprocess.
Harmless when healthy (the probe runs one 128x128 matmul), decisive
when wedged. Every long-running chip tool (bench.py, tools/bench_*.py,
tools/soak_train.py, tools/profile_*.py) should hold one for the
duration of its device work — without it, a wedge during an unattended
run silently eats the whole job.

Call ``beat()`` at natural progress points (optional — without beats
the prodder simply fires one harmless probe per stale period) and
``stop()`` on the way out.
"""

from __future__ import annotations

import threading
import time


class StallProdder:
    def __init__(self, stale_s: float = 300.0):
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._stale = stale_s

        def watch():
            import subprocess
            import sys

            while not self._stop.wait(30.0):
                if time.monotonic() - self._last > self._stale:
                    self.beat()  # one probe per stale period
                    try:
                        subprocess.run(
                            [sys.executable, "-c",
                             "import jax, jax.numpy as jnp;"
                             "x = jnp.ones((128, 128));"
                             "print(float((x @ x).sum()))"],
                            timeout=240, capture_output=True, check=False,
                        )
                    except Exception:
                        pass  # a blocked probe is expected post-unwedge

        self._thread = threading.Thread(target=watch, daemon=True)
        self._thread.start()

    def beat(self) -> None:
        self._last = time.monotonic()

    def stop(self) -> None:
        self._stop.set()


def install(stale_s: float = 300.0) -> StallProdder:
    """One-line arming for tool entry points:
    ``prodder = stall_guard.install()``. Returns the instance so call
    sites can ``beat()``/``stop()`` if they want; the daemon thread dies
    with the process either way."""
    return StallProdder(stale_s=stale_s)
