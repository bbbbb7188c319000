#!/usr/bin/env python
"""Measure the device-backed tower cache's capacity limit on this chip.

``TowerCache(backing="device")`` keeps the frozen-tower token store in
HBM as one (n_records, L, D) bf16 array — 2.16 MB/record at the
flagship 1408 x 768 shape — alongside the cached train step's own
working set (params + Adam state + batch-64 activations). The cached
throughput claims in BASELINE.md therefore carry an unstated capacity
boundary: past some dataset size the store must fall back to the RAM /
memmap backings and pay the per-batch host upload instead.

This probe binary-searches the largest n_records whose store coexists
with one full cached train step (batch 64, bf16 + remat, L32 bucket,
align no-remat — the production cached configuration) without OOM on
the 16 GB part, then prints one JSON line for MIGRATION.md's knob
table. Each trial actually executes the step with the store allocated
(allocation alone would miss XLA's transient peaks).

Ref: the 4-GPU reference trains ~240k MIMIC-CXR images/epoch
(README.md:130-156) — far past any HBM store; device backing targets
per-host shards or small finetune sets.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def trial(n_records: int) -> bool:
    """One OOM trial in a CHILD process: a failed HBM allocation can
    poison the client, so each trial gets a fresh runtime."""
    r = os.system(
        f"{sys.executable} {os.path.abspath(__file__)} --one {n_records} "
        f">/tmp/towercap_trial.log 2>&1"
    )
    return r == 0


def run_one(n_records: int) -> None:
    from radzero_tpu.utils import stall_guard

    prodder = stall_guard.install()  # noqa: F841 — tunnel wedge watchdog
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(REPO, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from radzero_tpu.models.configuration import RadZeroConfig
    from radzero_tpu.train.optim import build_optimizer, partition_params
    from radzero_tpu.train.step import make_train_step
    from radzero_tpu.train.tower_cache import TowerCache
    from radzero_tpu.models.radzero import init_radzero
    import dataclasses

    cfg = RadZeroConfig()
    # production cached configuration: align no-remat (the trainer's
    # cached-mode default)
    cfg = dataclasses.replace(
        cfg, align=dataclasses.replace(cfg.align, remat=False)
    )
    params = init_radzero(jax.random.PRNGKey(0), cfg)
    trainable, frozen = partition_params(
        params, ["align_transformer", "text_model", "loss_fns"]
    )
    tx, _ = build_optimizer(trainable, total_steps=10000)
    opt_state = tx.init(trainable)
    step = make_train_step(cfg, tx, dtype=jnp.bfloat16, donate=True, remat=True)

    from radzero_tpu.train.tower_cache import make_tower_fn

    tower_fn = make_tower_fn(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    b, spi, l = 64, 8, 32
    s = b * spi

    cache = TowerCache(backing="device", n_records=n_records)
    pixels = jnp.asarray(rng.standard_normal((b, 518, 518, 3)), jnp.float32)
    tokens = tower_fn(frozen["vision_model"], pixels)
    idx = np.arange(b)
    cache.put(idx, tokens)          # forces the full store allocation
    got = cache.get(idx)
    assert got is not None

    batch = {
        "tower_tokens": got,
        "input_ids": jnp.asarray(rng.integers(3, 30000, (s, l)), jnp.int32),
        "attention_mask": jnp.ones((s, l), jnp.int32),
        "group_map": jnp.asarray(np.repeat(np.arange(b), spi), jnp.int32),
        "row_mask": jnp.ones((s,), jnp.float32),
    }
    t, o, losses = step(trainable, frozen, opt_state, batch)
    float(losses["loss"])  # sync: surfaces the OOM if the step didn't fit
    print(f"ok n_records={n_records}")


def main() -> None:
    if "--one" in sys.argv:
        run_one(int(sys.argv[sys.argv.index("--one") + 1]))
        return

    record_mb = 1408 * 768 * 2 / 1e6  # bf16 flagship tokens
    lo, hi = 64, 8192                  # 8192 x 2.16 MB = 17.7 GB > HBM: sure fail
    t0 = time.perf_counter()
    assert trial(lo), "even the floor OOMs — something else is wrong"
    if trial(hi):
        print(json.dumps({"metric": "tower_cache_device_capacity",
                          "max_records": hi, "note": "ceiling never OOMed"}))
        return
    # bisect to 64-record granularity
    while hi - lo > 64:
        mid = (lo + hi) // 2
        if trial(mid):
            lo = mid
        else:
            hi = mid
    out = {
        "metric": "tower_cache_device_capacity",
        "max_records": lo,
        "first_failing_records": hi,
        "store_gb_at_max": round(lo * record_mb / 1e3, 2),
        "record_mb": round(record_mb, 2),
        "step": "cached train step, batch 64, L32, bf16+remat, align no-remat",
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
