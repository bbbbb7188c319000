#!/usr/bin/env python
"""Training-throughput micro-benchmark (flagship recipe, one chip).

Measures the jitted train step — ViT-B/14@518 frozen tower, 2-layer
align transformer, MPNet, VL-CABS MP-NCE — at the reference's
per-device batch 64 with the static sentence packing (8/image), bf16
compute + remat (the radzero preset). Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from radzero_tpu.utils import stall_guard

    prodder = stall_guard.install()  # noqa: F841 — tunnel wedge watchdog
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    if jax.default_backend() != "cpu":
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    from radzero_tpu.models.configuration import RadZeroConfig
    from radzero_tpu.models.radzero import init_radzero
    from radzero_tpu.train.optim import build_optimizer, partition_params
    from radzero_tpu.train.step import make_train_step

    import dataclasses

    from radzero_tpu.models.configuration import ViTConfig

    # frozen-tower policy: the forward-only fused serving layers are
    # legal in the train step (no gradient flows through the tower) —
    # same substitution RadZeroTrainer makes
    cfg = RadZeroConfig(vision=ViTConfig(attn_impl="fused"))
    # per-module remat override probes (ROADMAP training levers):
    # --text-remat=0/1 / --align-remat=0/1 force the module-level
    # TextConfig.remat / AlignConfig.remat instead of following the
    # global remat flag
    for flag, field in (("--text-remat", "text"), ("--align-remat", "align")):
        for a in sys.argv:
            if a.startswith(flag + "="):
                sub = dataclasses.replace(
                    getattr(cfg, field), remat=bool(int(a.split("=")[1]))
                )
                cfg = dataclasses.replace(cfg, **{field: sub})
    # --align-remat-policy=save_attn keeps the adapter attention output
    # live under remat (ViTConfig.remat_policy)
    for a in sys.argv:
        if a.startswith("--align-remat-policy="):
            cfg = dataclasses.replace(
                cfg,
                align=dataclasses.replace(
                    cfg.align, remat_policy=a.split("=", 1)[1] or None
                ),
            )
    # --batch=N / --grad-accum=K: the grad-accum probe (VERDICT r4 #4) —
    # e.g. batch 32 x accum 2 buys back the HBM that blocks align
    # no-remat at batch 64 while keeping the effective batch at the
    # reference's 64. Throughput is reported per MICRO-step (params
    # update every K calls; the decoded-sample rate is unchanged).
    b, accum = 64, 1
    for a in sys.argv:
        if a.startswith("--batch="):
            b = int(a.split("=")[1])
        if a.startswith("--grad-accum="):
            accum = int(a.split("=")[1])

    params = init_radzero(jax.random.PRNGKey(0), cfg)
    trainable, frozen = partition_params(params, ["align_transformer", "text_model", "loss_fns"])
    tx, _ = build_optimizer(trainable, total_steps=10000,
                            gradient_accumulation_steps=accum)
    opt_state = tx.init(trainable)
    step = make_train_step(cfg, tx, dtype=jnp.bfloat16, donate=True, remat=True)

    rng = np.random.default_rng(0)
    spi = 8
    s = b * spi
    state = {"trainable": trainable, "opt_state": opt_state}

    # --dedup-slots=U: ALSO measure the sentence-dedup text layout
    # (PackSpec.dedup_slots) alongside the plain one — U unique rows +
    # a row_gather map. U=256 models 2x sentence duplication across the
    # batch's 512 sentence rows, U=128 4x (real MIMIC finding phrases
    # repeat heavily; loss/grads are exactly the plain computation,
    # tests/test_dedup.py). Reported under "dedup" / tower_cache keys,
    # never replacing the plain numbers.
    # accepts a comma-separated list ("--dedup-slots=128,256,320") to
    # sweep slot counts in ONE invocation — the plain/cached programs
    # compile once and every slot value reuses them (only the dedup
    # text-block programs differ per U)
    dedup_sweep = []
    for a in sys.argv:
        if a.startswith("--dedup-slots="):
            dedup_sweep = [int(v) for v in a.split("=")[1].split(",") if v]
    dedup_slots = dedup_sweep[0] if dedup_sweep else 0

    def text_block(l, dedup=0):
        if dedup:
            return {
                "input_ids": jnp.asarray(
                    rng.integers(3, 30000, (dedup, l)), jnp.int32),
                "attention_mask": jnp.ones((dedup, l), jnp.int32),
                "row_gather": jnp.asarray(
                    rng.integers(0, dedup, (s,)), jnp.int32),
            }
        return {
            "input_ids": jnp.asarray(rng.integers(3, 30000, (s, l)), jnp.int32),
            "attention_mask": jnp.ones((s, l), jnp.int32),
        }

    def run(l, dedup=0):
        batch = {
            "pixel_values": jnp.asarray(rng.standard_normal((b, 518, 518, 3)), jnp.float32),
            **text_block(l, dedup),
            "group_map": jnp.asarray(np.repeat(np.arange(b), spi), jnp.int32),
            "row_mask": jnp.ones((s,), jnp.float32),
        }
        t, o, losses = step(state["trainable"], frozen, state["opt_state"], batch)
        state["trainable"], state["opt_state"] = t, o
        float(losses["loss"])  # sync
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            t, o, losses = step(state["trainable"], frozen, state["opt_state"], batch)
            state["trainable"], state["opt_state"] = t, o
        float(losses["loss"])
        return (time.perf_counter() - t0) / iters

    # --cached-only skips the uncached pixel-path runs: the
    # align-no-remat probe (VERDICT r3 #2b) is only legal in the cached
    # step — with the tower in the graph AlignConfig.remat=False OOMs
    # the 16 GB part at batch 64, so the uncached warmup would crash
    # before the measurement of interest ever ran.
    cached_only = "--cached-only" in sys.argv
    if cached_only and "--tower-cache" not in sys.argv:
        sys.argv.append("--tower-cache")
    dt64 = dt32 = float("inf")
    if not cached_only:
        dt64 = run(64)   # worst case: every sentence fills the static 64 slot
        dt32 = run(32)   # the bucket real MIMIC sentences land in (~20 tokens)

    # Derived A100 train baselines (tools/baseline_torch_train.py,
    # methodology + caveats in BASELINE.md: the bf16 estimate is
    # optimistic-HIGH for the A100, i.e. conservative for these ratios;
    # v5e bf16 peak is 0.63x the A100's, so per-chip ratios carry that
    # hardware gap in addition to software efficiency)
    a100_bf16_estimate = 318.0
    a100_bf16_bound = 550.0
    out = {
        "metric": "train_step_throughput",
        "batch": b,
        "grad_accum": accum,
        "value": None if cached_only else round(b / dt64, 1),
        "unit": "samples/sec/chip",
        "step_ms": None if cached_only else round(dt64 * 1e3, 1),
        "bucketed_L32_samples_per_sec": None if cached_only else round(b / dt32, 1),
        "vs_a100_bf16_estimate": None if cached_only else round(b / dt32 / a100_bf16_estimate, 2),
        "vs_a100_bf16_peak_bound": None if cached_only else round(b / dt32 / a100_bf16_bound, 2),
    }
    if dedup_slots and not cached_only:
        dt32d = run(32, dedup_slots)
        out["dedup"] = {
            "slots": dedup_slots,
            "duplication_modeled": round(s / dedup_slots, 1),
            "L32_samples_per_sec": round(b / dt32d, 1),
            "vs_a100_bf16_estimate": round(b / dt32d / a100_bf16_estimate, 2),
        }
        if len(dedup_sweep) > 1:
            out["dedup_sweep"] = [
                {"slots": u, "static_row_reduction": round(s / u, 2),
                 "L32_samples_per_sec": round(b / (dt32d if u == dedup_slots
                                                   else run(32, u)), 1)}
                for u in dedup_sweep
            ]

    if "--tower-cache" in sys.argv:
        # Frozen-tower activation-cache A/B (train/tower_cache.py):
        # same step fn fed device-resident tower_tokens instead of
        # pixel_values (epoch-2+ steady state, transfer excluded), the
        # tower forward alone (the epoch-1 extra), and the token bytes
        # that must cross host<->device per batch in cached mode.
        from radzero_tpu.train.tower_cache import make_tower_fn

        # mirror RadZeroTrainer: with the tower out of the step graph the
        # align adapter defaults to no-remat (explicit --align-remat wins)
        cfg_cached = cfg
        if cfg.align.remat is None:
            cfg_cached = dataclasses.replace(
                cfg, align=dataclasses.replace(cfg.align, remat=False)
            )
        step_cached = make_train_step(
            cfg_cached, tx, dtype=jnp.bfloat16, donate=True, remat=True
        )

        tower_fn = make_tower_fn(cfg, dtype=jnp.bfloat16)
        pixels = jnp.asarray(rng.standard_normal((b, 518, 518, 3)), jnp.float32)
        tokens = tower_fn(frozen["vision_model"], pixels)
        tokens.block_until_ready()

        def run_cached(l, dedup=0):
            batch = {
                "tower_tokens": tokens,
                **text_block(l, dedup),
                "group_map": jnp.asarray(np.repeat(np.arange(b), spi), jnp.int32),
                "row_mask": jnp.ones((s,), jnp.float32),
            }
            t, o, losses = step_cached(state["trainable"], frozen, state["opt_state"], batch)
            state["trainable"], state["opt_state"] = t, o
            float(losses["loss"])
            iters = 5
            t0 = time.perf_counter()
            for _ in range(iters):
                t, o, losses = step_cached(state["trainable"], frozen, state["opt_state"], batch)
                state["trainable"], state["opt_state"] = t, o
            float(losses["loss"])
            return (time.perf_counter() - t0) / iters

        dtc64 = run_cached(64)
        dtc32 = run_cached(32)
        t0 = time.perf_counter()
        for _ in range(5):
            tower_fn(frozen["vision_model"], pixels).block_until_ready()
        dt_tower = (time.perf_counter() - t0) / 5
        out["tower_cache"] = {
            "cached_step_samples_per_sec": round(b / dtc64, 1),
            "cached_step_ms": round(dtc64 * 1e3, 1),
            "cached_bucketed_L32_samples_per_sec": round(b / dtc32, 1),
            "tower_forward_ms": round(dt_tower * 1e3, 1),
            "token_bytes_per_batch": int(np.prod(tokens.shape)) * tokens.dtype.itemsize,
        }
        if dedup_slots:
            dtc32d = run_cached(32, dedup_slots)
            out["tower_cache"]["cached_dedup_L32_samples_per_sec"] = round(b / dtc32d, 1)
            out["tower_cache"]["dedup_slots"] = dedup_slots
            if len(dedup_sweep) > 1:
                out["tower_cache"]["cached_dedup_sweep"] = [
                    {"slots": u,
                     "L32_samples_per_sec": round(
                         b / (dtc32d if u == dedup_slots
                              else run_cached(32, u)), 1)}
                    for u in dedup_sweep
                ]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
