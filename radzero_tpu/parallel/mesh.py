"""Device mesh + sharding rules: the distributed-communication layer.

The reference's L1 layer is torchrun DDP + NCCL with a hand-rolled
differentiable ``dist.nn.all_gather`` inside the loss
(SURVEY.md §2.3; losses.py:87-88,386-439). The TPU-native equivalent is
declarative: one ``jax.sharding.Mesh`` with a ``data`` axis, batch
arrays sharded along it, params replicated, and a jitted global-view
train step — XLA's SPMD partitioner derives the all-gathers (for the
global contrastive product) and the gradient reduce-scatters, all
differentiable by construction, riding ICI within a slice and DCN
across slices.

Axis vocabulary (extensible beyond the reference's DP-only design):
    data   — batch dimension (DP); the only axis RadZero training needs
    model  — reserved for tensor sharding of the 2*768 feature dims
             (SURVEY.md §2.3: optional; not required at ~300M params)
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    axes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh from an axis->size dict; -1 sizes absorb remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    axes = dict(axes or {"data": -1})
    sizes = list(axes.values())
    n_free = sizes.count(-1)
    fixed = int(np.prod([s for s in sizes if s != -1])) if len(sizes) > n_free else 1
    if n_free > 1:
        raise ValueError("at most one mesh axis may be -1")
    if n_free == 1:
        free = len(devices) // fixed
        sizes = [free if s == -1 else s for s in sizes]
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {dict(zip(axes, sizes))} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(axes.keys()))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Device-put every batch array sharded on its leading dim.

    All batch arrays (images AND the flattened sentence block) shard on
    dim 0: S_max is a per-image static budget, so sentence rows co-shard
    with their owning images.
    """
    sharding = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
