#!/usr/bin/env python
"""Serving batch-size sweep: chip-side zero-shot throughput vs batch.

The headline bench (bench.py) times the serving path at the reference's
per-device batch 64 (`/root/reference/exp/cxr_pt/configs/radzero.yaml`
train.per_device_train_batch_size; eval uses the same order). This probe
asks whether a larger serving batch buys per-image throughput on the
fused tower (more rows per kernel launch, better MXU occupancy on the
small align/text towers) or loses it (VMEM pressure, scheduling).

Prints one JSON line: {"batch": imgs_per_sec, ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from radzero_tpu.data.processing import CLIP_MEAN, CLIP_STD
    from radzero_tpu.models.configuration import AlignConfig, RadZeroConfig, ViTConfig
    from radzero_tpu.models.radzero import compute_logits, init_radzero
    from radzero_tpu.ops.layers import normalize_pixels

    cfg = RadZeroConfig(
        vision=ViTConfig(attn_impl="fused"), align=AlignConfig(attn_impl="fused")
    )
    params = init_radzero(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)

    n_prompts, ltxt = 20, 32
    rng = np.random.default_rng(0)
    input_ids = jnp.asarray(rng.integers(3, 30000, (n_prompts, ltxt)), jnp.int32)
    attention_mask = jnp.ones((n_prompts, ltxt), jnp.int32)

    @jax.jit
    def fn(params, pixel_values, input_ids, attention_mask, acc):
        pv = normalize_pixels(pixel_values, CLIP_MEAN, CLIP_STD, dtype=jnp.bfloat16)
        out = compute_logits(
            params, cfg, pv, input_ids, attention_mask, dtype=jnp.bfloat16
        )
        acc = acc + out["logits"][0, 0].astype(jnp.float32)
        return out["logits"], out["similarity_scores"], acc

    batches = [int(b) for b in (sys.argv[1:] or ["32", "64", "96", "128"])]
    out = {}
    for batch in batches:
        pixel_values = jnp.asarray(
            rng.integers(0, 256, (batch, 518, 518, 3)), jnp.uint8
        )
        acc = jnp.zeros((), jnp.float32)
        try:
            logits, scores, acc = fn(params, pixel_values, input_ids, attention_mask, acc)
            float(acc)
        except Exception as e:  # OOM etc.
            out[str(batch)] = f"{type(e).__name__}"[:60]
            continue
        iters = max(2, 640 // batch)
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                logits, scores, acc = fn(
                    params, pixel_values, input_ids, attention_mask, acc
                )
            float(acc)
            rates.append(batch * iters / (time.perf_counter() - t0))
        rates.sort()
        out[str(batch)] = round(rates[1], 2)
    print(json.dumps({"metric": "serving_imgs_per_sec_by_batch", "value": out}))


if __name__ == "__main__":
    main()
