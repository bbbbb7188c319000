"""Parameter sharding rules: optional tensor parallelism over a 'model' axis.

The reference is DP-only (SURVEY.md §2.3) and RadZero's ~300M params fit
per chip, but the framework supports Megatron-style tensor sharding for
scale-out via GSPMD: annotate the param layout, and XLA inserts the
collectives.

Rules (classic column/row split, per transformer layer):
    attn q/k/v kernel  (…, D, D)  -> split output dim ('model')  [heads]
    attn o kernel      (…, D, D)  -> split input dim
    mlp fc1 kernel     (…, D, F)  -> split output dim
    mlp fc2 kernel     (…, F, D)  -> split input dim
    matching biases of column-split layers -> split
    embeddings (V, D)             -> split vocab rows
    everything else               -> replicated

Stacked (scanned) layers carry a leading layer dim -> specs shift right.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple, leaf, model_axis: str):
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    ndim = leaf.ndim

    def pad(spec_tail):
        """Right-align the spec against the leaf rank (scan-stacked leaves
        have a leading layer dim that stays unsharded)."""
        lead = ndim - len(spec_tail)
        return P(*([None] * lead + spec_tail))

    if joined.endswith("kernel"):
        if any(f"attn/{k}/kernel" in joined for k in ("q", "k", "v")):
            return pad([None, model_axis])
        if "attn/o/kernel" in joined:
            return pad([model_axis, None])
        if "fc1/kernel" in joined:
            return pad([None, model_axis])
        if "fc2/kernel" in joined:
            return pad([model_axis, None])
    if joined.endswith("bias"):
        if any(f"attn/{k}/bias" in joined for k in ("q", "k", "v")) or "fc1/bias" in joined:
            return pad([model_axis])
    if joined.endswith("embeddings/word") or joined.endswith("embeddings/position"):
        return pad([model_axis, None])
    return P()


def param_shardings(params: dict, mesh: Mesh, model_axis: str = "model") -> dict:
    """Pytree of NamedShardings implementing the TP rules (replicated-only
    when the mesh has no model axis)."""
    if model_axis not in mesh.axis_names or mesh.shape[model_axis] == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)

    def to_sharding(path, leaf):
        spec = _spec_for(path, leaf, model_axis)
        # only shard dims divisible by the axis size
        axis_size = mesh.shape[model_axis]
        for dim, name in enumerate(spec):
            if name == model_axis and leaf.shape[dim] % axis_size != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params: dict, mesh: Mesh, model_axis: str = "model") -> dict:
    shardings = param_shardings(params, mesh, model_axis)
    return jax.tree.map(jax.device_put, params, shardings)
