"""Benchmark: batched zero-shot CXR inference throughput on one TPU chip.

Headline: the device serving path (SURVEY.md §3.2: ``compute_logits``
over batches of 518px images x a fixed prompt set — zero-shot
classification), bf16, uint8 upload + on-device normalisation (the
production ServingEngine configuration).

``vs_baseline`` divides by the DERIVED A100 fp32 reference throughput of
45 img/s — measured methodology in BASELINE.md ("Derived A100 reference
throughput"): torch-eager utilization of the reference stack measured on
this host (0.70-0.81 over three runs), applied to A100 fp32 peak /
355.2 GFLOP per image; the 100%-of-peak bound is 54.9 img/s. 45 is the
max-utilization estimate rounded UP (conservative for us).

Also measured (reported under "extra"): END-TO-END serving — real JPEG
bytes through ServingEngine (native C++ decode+resize -> uint8 upload ->
device normalise+model -> probs + similarity maps). On this bench host
the e2e number is HOST-bound: the machine has 1 CPU core (nproc=1), and
one core decodes 1024px JPEGs at ~95/s. The engine scales host workers
across cores on a production host; the device path (headline) is what
the chip sustains.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import io
import json
import time

import numpy as np


A100_REFERENCE_IMGS_PER_SEC = 45.0  # derived, see BASELINE.md + tools/baseline_torch.py


def make_jpegs(n: int, src: int = 1024, quality: int = 90):
    """Synthetic smooth CXR-like JPEGs (decode cost matches real scans
    of the same resolution)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    out = []
    for _ in range(n):
        base = rng.integers(0, 256, (src // 8, src // 8), dtype=np.uint8)
        img = np.asarray(Image.fromarray(base).resize((src, src), Image.BILINEAR))
        buf = io.BytesIO()
        # single-component JPEG, like real CXR exports
        Image.fromarray(img, "L").save(buf, "JPEG", quality=quality)
        out.append(buf.getvalue())
    return out


def bench_device_path(params, cfg, jnp, jax):
    """Chip-side throughput: uint8 batch -> normalise -> compute_logits."""
    from radzero_tpu.models.radzero import compute_logits
    from radzero_tpu.ops.layers import normalize_pixels
    from radzero_tpu.data.processing import CLIP_MEAN, CLIP_STD

    batch, n_prompts, ltxt = 64, 20, 32
    rng = np.random.default_rng(0)
    pixel_values = jnp.asarray(rng.integers(0, 256, (batch, 518, 518, 3)), jnp.uint8)
    input_ids = jnp.asarray(rng.integers(3, 30000, (n_prompts, ltxt)), jnp.int32)
    attention_mask = jnp.ones((n_prompts, ltxt), jnp.int32)

    @jax.jit
    def fn(params, pixel_values, input_ids, attention_mask, acc):
        pv = normalize_pixels(pixel_values, CLIP_MEAN, CLIP_STD, dtype=jnp.bfloat16)
        out = compute_logits(
            params, cfg, pv, input_ids, attention_mask, dtype=jnp.bfloat16
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

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        logits, scores, acc = fn(params, pixel_values, input_ids, attention_mask, acc)
    float(acc)  # host sync
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_end_to_end(params, cfg, jnp, n_imgs: int = 192):
    """Real JPEG bytes -> ServingEngine -> probs + patch maps."""
    from radzero_tpu.data import native
    from radzero_tpu.data.processing import BlipStyleImageProcessor
    from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer
    from radzero_tpu.eval.serving import ServingEngine

    if not native.available():
        return None
    jpegs = make_jpegs(n_imgs)
    proc = BlipStyleImageProcessor(size=518)
    tok = WhitespaceHashTokenizer(vocab_size=30522, max_length=32)
    prompts = [f"There is finding {i}" for i in range(20)]
    with ServingEngine(
        params, cfg, proc, tok, max_batch=32, max_delay_ms=20.0,
        dtype=jnp.bfloat16, host_backend="native",
        channels=1,  # CXR sources are grayscale: 3x fewer upload bytes
    ) as engine:
        engine.register_prompt_set("cls", prompts)
        engine.warmup()
        # untimed burst: the first dispatches pay one-off executable
        # load/upload costs beyond warmup()'s compile
        for f in [engine.submit(j, "cls") for j in jpegs[:32]]:
            f.result(timeout=600)
        # measure steady state: submit everything, wait for the last future
        t0 = time.perf_counter()
        futs = [engine.submit(j, "cls", want_maps=True) for j in jpegs]
        results = [f.result(timeout=600) for f in futs]
        dt = time.perf_counter() - t0
    assert all(r["probs"].shape == (20,) for r in results)
    return n_imgs / dt


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
    from radzero_tpu.models.radzero import init_radzero

    cfg = RadZeroConfig()
    params = init_radzero(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    device_ips = bench_device_path(params, cfg, jnp, jax)
    # watchdog: the shared device tunnel occasionally stalls; a hung e2e
    # pass must not suppress the headline line
    import concurrent.futures as cf

    pool = cf.ThreadPoolExecutor(1)
    hung = False
    try:
        e2e_ips = pool.submit(bench_end_to_end, params, cfg, jnp).result(timeout=420)
    except cf.TimeoutError:
        e2e_ips, hung = None, True
    except Exception:
        e2e_ips = None
    pool.shutdown(wait=False)  # a hung e2e must not block the headline

    extra = {
        "a100_fp32_baseline_imgs_per_sec": A100_REFERENCE_IMGS_PER_SEC,
        "baseline_method": "derived (BASELINE.md): measured torch-eager utilization x A100 fp32 peak",
        "e2e_serving_jpeg1024_imgs_per_sec": round(e2e_ips, 2) if e2e_ips else None,
        "e2e_note": "e2e (JPEG bytes -> probs+maps) is host/tunnel-bound on this 1-CPU-core bench host; headline is the chip-side serving path",
    }
    print(
        json.dumps(
            {
                "metric": "zero_shot_throughput",
                "value": round(device_ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(device_ips / A100_REFERENCE_IMGS_PER_SEC, 2),
                "extra": extra,
            }
        ),
        flush=True,
    )
    if hung:
        # non-daemon worker stuck on a stalled tunnel: don't let interpreter
        # shutdown join it forever — the headline is already out
        os._exit(0)


if __name__ == "__main__":
    main()
