"""Multi-host (multi-process) TPU support.

The reference scales with torchrun process-per-GPU + NCCL
(SURVEY.md §2.3); the JAX equivalent is one process per host, each
feeding its local shard of the global batch:

- :func:`initialize_distributed` — `jax.distributed.initialize` with
  env autodetection (no-op single-process).
- :func:`local_batch_to_global` — assemble a globally-sharded array
  from per-process local data (`jax.make_array_from_process_local_data`),
  the analogue of each DDP rank holding its slice.
- :func:`process_offset` — the global-index offset for ``group_map``
  construction, mirroring the reference's ``rank * B_local`` offset
  (losses.py:149-151).
- :func:`sync` — cross-host barrier (dist.barrier analogue).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise JAX's distributed runtime when running multi-process.

    With no arguments, relies on cluster autodetection (TPU pods set the
    environment automatically) and logs (rather than raising) when
    autodetection concludes single-process — that is the normal
    single-host path. With EXPLICIT arguments the caller has declared a
    multi-process topology, so failure to rendezvous is a genuine
    misconfiguration and is re-raised: silently degrading to a
    single-process run would train on 1/k of the data with wrong
    contrastive negatives.
    """
    import logging

    log = logging.getLogger("radzero")
    if coordinator_address:
        # Explicit topology: let RuntimeError/ValueError propagate.
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "jax.distributed initialised: process %d/%d via %s",
            jax.process_index(), jax.process_count(), coordinator_address,
        )
        return
    try:
        jax.distributed.initialize()
        log.info(
            "jax.distributed initialised via cluster autodetection: "
            "process %d/%d", jax.process_index(), jax.process_count(),
        )
    except (RuntimeError, ValueError) as e:
        log.info(
            "jax.distributed not initialised (%s: %s); continuing "
            "single-process", type(e).__name__, e,
        )


def process_offset(per_process_batch: int) -> int:
    """Global image-index offset of this process's shard."""
    return jax.process_index() * per_process_batch


def local_batch_to_global(batch: Dict[str, np.ndarray], mesh) -> dict:
    """Per-process local arrays -> globally sharded jax.Arrays on dim 0."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    out = {}
    for k, v in batch.items():
        if jax.process_count() == 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out


def sync(name: str = "barrier") -> None:
    """Cross-host barrier (the reference's dist.barrier analogue,
    common/trainer.py:892-893)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
