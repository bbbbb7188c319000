"""Benchmark: batched zero-shot CXR inference throughput on one TPU chip.

Measures the reference's hot serving path (SURVEY.md §3.2:
``compute_logits`` over batches of 518px images x a fixed prompt set —
the zero-shot classification workload) end-to-end on device, bf16.

North star (BASELINE.md): >= 5x the A100 reference throughput on a
v5e chip. The reference measures ~batch-64 fp32 single-GPU eval
(config.yaml:54-60); the A100 reference throughput for ViT-B@518 + 2
align layers + VL-CABS over 20 prompts is estimated at ~55 img/s
(fp32, torch eager). ``vs_baseline`` reports ours / 55.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


A100_REFERENCE_IMGS_PER_SEC = 55.0  # fp32 torch-eager estimate (see docstring)


def main():
    import os

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the Pallas path compiles slowly through
    # the remote-compile tunnel; cache hits make reruns start in seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from radzero_tpu.models.configuration import RadZeroConfig
    from radzero_tpu.models.radzero import compute_logits, init_radzero

    cfg = RadZeroConfig()
    params = init_radzero(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    batch, n_prompts, ltxt = 64, 20, 32
    rng = np.random.default_rng(0)
    pixel_values = jnp.asarray(
        rng.standard_normal((batch, 518, 518, 3)), jnp.bfloat16
    )
    input_ids = jnp.asarray(rng.integers(3, 30000, (n_prompts, ltxt)), jnp.int32)
    attention_mask = jnp.ones((n_prompts, ltxt), jnp.int32)

    @jax.jit
    def fn(params, pixel_values, input_ids, attention_mask, acc):
        out = compute_logits(
            params, cfg, pixel_values, input_ids, attention_mask, dtype=jnp.bfloat16
        )
        # checksum folded into the same dispatch: serialises iterations
        # without an extra host round-trip per step
        acc = acc + out["logits"][0, 0].astype(jnp.float32)
        return out["logits"], out["similarity_scores"], acc

    # warmup / compile (force host sync — block_until_ready can be a no-op
    # through the axon device tunnel, so fetch a scalar instead)
    acc = jnp.zeros((), jnp.float32)
    logits, scores, acc = fn(params, pixel_values, input_ids, attention_mask, acc)
    float(acc)

    # chain a data dependency between iterations so laziness can't elide work
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        logits, scores, acc = fn(params, pixel_values, input_ids, attention_mask, acc)
    float(acc)  # host sync
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "zero_shot_throughput",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / A100_REFERENCE_IMGS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
