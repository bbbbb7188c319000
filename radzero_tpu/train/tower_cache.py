"""Frozen-tower activation cache: skip the vision tower after epoch 1.

Under the reference finetune policy the vision tower is FROZEN and
training augmentation is disabled (ref configs/radzero.yaml:50,
model/processing.py:170-174), so the tower's output tokens for a given
image are identical in every epoch — yet the reference recomputes the
full ViT forward for all 20 epochs (exp/cxr_pt/run.py training loop).
On the flagship recipe that forward is ~35% of the train step
(BASELINE.md train-step roofline: 163 ms of 464 ms at batch 64).

This cache stores the tower's output tokens per *record index* on the
host after their first computation and feeds them back on later
epochs, replacing ``pixel_values`` with ``tower_tokens`` in the batch
(models/radzero.py:forward_train dispatches on the key). The trade is
HBM-compute for host<->device bandwidth + host memory:

Measured on the v5e chip at the flagship recipe (batch 64, bf16,
remat, fused frozen tower — ``tools/bench_train.py --tower-cache``):

    | step                 | L64 slot        | L32 bucket      |
    |----------------------|-----------------|-----------------|
    | full train step      | 114.2 samp/s    | 150.9 samp/s    |
    | cached step (no tower)| 159.5 (+40%)   | 240.6 (+59%)    |
    | tower forward alone  | ~193-205 ms     | (same)          |

Costs:
- tokens are (L_pad, D) bf16 per image — 2.16 MB at the flagship
  1408 x 768 shape; a 240k-image MIMIC-CXR epoch is ~520 GB, which fits
  ``backing="memmap"`` on NVMe (read ~5 GB/s -> ~28 ms/batch-64 vs
  192.8 ms of recompute) but NOT host RAM; small/medium datasets can
  use ``backing="ram"``.
- upload becomes 64 x 1408 x 768 bf16 = 138.4 MB tokens/batch instead
  of pixels. Break-even host->device bandwidth is 138.4 MB per ~160 ms
  of step time saved ~= 0.9 GB/s: any PCIe-attached host clears it
  (~16 GB/s -> ~9 ms/batch, keeping nearly the full +40-59%); the
  60 MB/s bench tunnel here does NOT (2.3 s/batch — recompute wins).
  The feature is therefore OPT-IN (``RadZeroTrainer(tower_cache=...)``,
  ``train.tower_cache`` in YAML), with the break-even documented
  rather than assumed.
- epoch 1 pays the tower once per batch anyway (cached step + tower
  forward ~= the full step), so enabling the cache never costs time.

Numerics: the cache's tower function is built from the SAME config
(including the trainer's frozen-tower fused-layer substitution) and
dtype the train step would use, and bf16/fp32 tokens round-trip host
memory bit-exactly — so epochs 2+ are bit-identical to epoch 1 of the
cached run. Cached vs UNCACHED runs agree to float tolerance only (the
tower sits in a different XLA program, so fusion boundaries differ);
tests/test_tower_cache.py pins both properties.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np


class TowerCache:
    """Host-side store of frozen-tower tokens keyed by record index.

    ``backing="ram"``: a dict of per-record arrays — any dataset size
    the host's memory allows, zero configuration.
    ``backing="memmap"``: preallocated ``tokens.dat`` + ``present.dat``
    under ``path`` (requires ``n_records``) — for datasets larger than
    host RAM. Both files persist, so a SECOND run pointed at the same
    ``path`` reuses epoch-1 work: ``meta.json`` records (n_records,
    token shape, dtype) and existing files are reopened in place when
    it matches, recreated from scratch when it doesn't. The meta does
    NOT capture the (checkpoint, processor) pair that produced the
    tokens — point ``path`` at a run-scoped directory unless you know
    the tower inputs are unchanged.
    ``backing="device"``: the store lives in HBM as one (n_records,
    L, D) array (requires ``n_records``); ``get`` is an on-device
    gather and ``put`` an on-device scatter, so cached epochs move ZERO
    token bytes across the host link — on hosts where that link paces
    the loop (the reference's token payload is 2.16 MB/image; a
    60 MB/s tunnel pays 2.3 s/batch-64, even PCIe pays ~9 ms) this
    removes the cache's entire transfer cost. HBM must hold the store
    (flagship tokens: ~2.16 MB/record -> ~4.3 GB per 2k records)
    alongside the cached train step; sized for small/medium datasets or
    per-host shards of a distributed one. Single-store semantics match
    the host backings bit-for-bit (tests/test_tower_cache.py).
    """

    def __init__(
        self,
        backing: str = "ram",
        *,
        path: Optional[str] = None,
        n_records: Optional[int] = None,
    ):
        if backing not in ("ram", "memmap", "device"):
            raise ValueError(
                f"backing must be 'ram', 'memmap' or 'device', got {backing!r}"
            )
        if backing == "memmap" and (path is None or n_records is None):
            raise ValueError("memmap backing requires path= and n_records=")
        if backing == "device" and n_records is None:
            raise ValueError("device backing requires n_records=")
        self.backing = backing
        self.path = path
        self.n_records = n_records
        self._ram: Dict[int, np.ndarray] = {}
        self._mm: Optional[np.memmap] = None
        self._present: Optional[np.ndarray] = None
        self._store = None       # device backing: (n_records, L, D) on-chip
        self._scatter = None     # jitted donate-in-place store update
        self._gather = None      # jitted store row gather
        self.hits = 0
        self.misses = 0

    # ------------------------------------------------------------------
    def _meta(self, token_shape, dtype) -> dict:
        return {
            "shape": [int(self.n_records), *map(int, token_shape)],
            "dtype": str(np.dtype(dtype)),
        }

    def _ensure_memmap(self, token_shape, dtype) -> None:
        if self._mm is not None:
            return
        import json

        os.makedirs(self.path, exist_ok=True)
        fn = os.path.join(self.path, "tokens.dat")
        pn = os.path.join(self.path, "present.dat")
        mn = os.path.join(self.path, "meta.json")
        meta = self._meta(token_shape, dtype)
        reuse = False
        if os.path.exists(mn) and os.path.exists(fn) and os.path.exists(pn):
            try:
                with open(mn) as f:
                    reuse = json.load(f) == meta
            except (OSError, ValueError):
                reuse = False
        # 'r+' reopens a matching cache in place (cross-run reuse of
        # epoch-1 work); any mismatch recreates from scratch — it is a
        # cache, never the source of truth
        mode = "r+" if reuse else "w+"
        self._mm = np.memmap(
            fn, dtype=dtype, mode=mode, shape=tuple(meta["shape"])
        )
        self._present = np.memmap(pn, dtype=np.uint8, mode=mode,
                                  shape=(self.n_records,))
        if not reuse:
            with open(mn, "w") as f:
                json.dump(meta, f)

    def _ensure_device_store(self, token_shape, dtype) -> None:
        if self._store is not None:
            return
        import jax
        import jax.numpy as jnp

        self._store = jnp.zeros((self.n_records, *token_shape), dtype)
        self._present = np.zeros((self.n_records,), np.uint8)
        # donate the store so the update is in place (no 2x HBM spike)
        self._scatter = jax.jit(
            lambda store, idx, tok: store.at[idx].set(tok), donate_argnums=(0,)
        )
        self._gather = jax.jit(lambda store, idx: jnp.take(store, idx, axis=0))

    def put(self, indices: np.ndarray, tokens) -> None:
        """Store ``tokens[i]`` under record index ``indices[i]``.
        ``tokens`` may be a device array; host backings copy it to host,
        the device backing scatters it into the on-chip store directly
        (no device->host readback)."""
        indices = np.asarray(indices)
        if self.backing == "device":
            self._ensure_device_store(tokens.shape[1:], tokens.dtype)
            self._store = self._scatter(self._store, indices, tokens)
            self._present[indices] = 1
            return
        tokens = np.asarray(tokens)
        if self.backing == "ram":
            for i, idx in enumerate(indices):
                self._ram[int(idx)] = np.array(tokens[i], copy=True)
            return
        self._ensure_memmap(tokens.shape[1:], tokens.dtype)
        self._mm[indices] = tokens
        self._present[indices] = 1

    def _open_existing(self) -> bool:
        """Reopen a persisted cache before the first put() (fresh run
        over a warm directory): shape/dtype come from meta.json."""
        import json

        mn = os.path.join(self.path, "meta.json")
        if not os.path.exists(mn):
            return False
        try:
            with open(mn) as f:
                meta = json.load(f)
            if meta["shape"][0] != self.n_records:
                return False
            try:
                dt = np.dtype(meta["dtype"])
            except TypeError:
                import ml_dtypes  # registers bfloat16 et al.  # noqa: F401

                dt = np.dtype(meta["dtype"])
            self._ensure_memmap(meta["shape"][1:], dt)
            return True
        except (OSError, ValueError, KeyError):
            return False

    def get(self, indices: np.ndarray):
        """The stacked tokens for ``indices`` (np array for host
        backings, device array for ``backing="device"``), or None unless
        ALL are present (a partial batch would still need a tower
        dispatch, so the caller recomputes the whole batch and re-puts)."""
        indices = np.asarray(indices)
        if self.backing == "device":
            if self._present is None or not self._present[indices].all():
                self.misses += 1
                return None
            self.hits += 1
            return self._gather(self._store, indices)
        if self.backing == "ram":
            if any(int(i) not in self._ram for i in indices):
                self.misses += 1
                return None
            self.hits += 1
            return np.stack([self._ram[int(i)] for i in indices])
        if self._present is None and not self._open_existing():
            self.misses += 1
            return None
        if not self._present[indices].all():
            self.misses += 1
            return None
        self.hits += 1
        return np.asarray(self._mm[indices])

    # ------------------------------------------------------------------
    @property
    def n_cached(self) -> int:
        if self.backing == "ram":
            return len(self._ram)
        return 0 if self._present is None else int(self._present.sum())

    @property
    def nbytes(self) -> int:
        if self.backing == "ram":
            return sum(a.nbytes for a in self._ram.values())
        if self.backing == "device":
            return 0 if self._store is None else int(
                np.prod(self._store.shape)) * self._store.dtype.itemsize
        return 0 if self._mm is None else self._mm.nbytes

    def stats(self) -> Dict[str, int]:
        return {
            "cached_records": self.n_cached,
            "bytes": self.nbytes,
            "hits": self.hits,
            "misses": self.misses,
        }


def make_tower_fn(cfg, *, dtype) -> Callable:
    """Jitted ``tower(vision_params, pixel_values) -> tokens`` computing
    exactly the tower output ``forward_vision`` would feed the align
    adapter (models/radzero.py:129-147), so cached tokens are drop-in
    replacements for the in-step tower. ``cfg`` must be the trainer's
    POST-substitution config (the frozen-tower fused-layer swap), and
    ``dtype`` the step compute dtype."""
    import jax

    model_type = getattr(cfg.vision, "model_type", "dinov2")

    def tower(vision_params, pixel_values):
        if model_type in ("dinov2", "raddino"):
            from radzero_tpu.models.vit import vit_forward

            keep_padded = getattr(cfg.vision, "attn_impl", "xla") in (
                "flash", "fused", "packed", "fused_vjp",
            )
            return vit_forward(
                vision_params, cfg.vision, pixel_values, dtype=dtype,
                keep_padded=keep_padded,
            )
        from radzero_tpu.models.encoders import build_vision_encoder

        _, vision_apply = build_vision_encoder(model_type)
        return vision_apply(vision_params, cfg.vision, pixel_values, dtype=dtype)

    return jax.jit(tower)
