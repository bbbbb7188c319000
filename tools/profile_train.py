#!/usr/bin/env python
"""Train-step segment roofline (flagship recipe, one chip).

Decomposes the jitted train step — frozen fused ViT-B/14@518 tower,
trainable 2-layer align (flash attention custom VJP), trainable MPNet,
fused VL-CABS MP-NCE custom VJP, AdamW — into independently-timed
segments at the reference's batch 64 x 8 sentences/image:

  tower_fwd      frozen vision tower forward (fused serving layers)
  align_fwd_bwd  align adapter forward + backward at tower-token shapes
  text_fwd_bwd   MPNet forward + backward (512 sentences)
  loss_fwd_bwd   fused VL-CABS + MP-NCE forward + backward
  optimizer      AdamW update + global-norm clip on the trainable tree

Segments overlap imperfectly with the fused whole (XLA schedules across
boundaries), so the table reports the full step alongside the sum — the
gap is scheduling overlap, not error. Timing is scalar-fetch based:
``block_until_ready`` is a no-op through the device tunnel.

Prints one JSON line; publish the table in BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, iters=5):
    import numpy as np

    float(np.asarray(fn(*args)))  # compile + first dispatch
    float(np.asarray(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    r = float(np.asarray(out))
    dt = (time.perf_counter() - t0) / iters * 1e3
    assert np.isfinite(r), "segment produced non-finite output"
    return dt


def _gsum(tree):
    """Reduce EVERY leaf of a grad tree to one scalar. Timing
    ``leaves(grad)[0].sum()`` lets XLA dead-code-eliminate the other
    leaves' weight-gradient GEMMs (only the dgrad chain feeding leaf 0
    survives), so fwd+bwd variants undercount backward work by the
    pruned wgrads; summing all leaves keeps them live."""
    import jax
    import jax.numpy as jnp

    return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(tree))


def main():
    from radzero_tpu.utils import stall_guard

    prodder = stall_guard.install()  # noqa: F841 — tunnel wedge watchdog
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    if jax.default_backend() != "cpu":
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    import dataclasses

    from radzero_tpu.models.configuration import RadZeroConfig, ViTConfig
    from radzero_tpu.models.mpnet import mpnet_forward
    from radzero_tpu.models.radzero import forward_train, init_radzero
    from radzero_tpu.models.vit import vit_forward
    from radzero_tpu.losses.radzero_loss import radzero_loss
    from radzero_tpu.train.optim import build_optimizer, partition_params
    from radzero_tpu.train.step import make_train_step

    cfg = RadZeroConfig(vision=ViTConfig(attn_impl="fused"))
    params = init_radzero(jax.random.PRNGKey(0), cfg)
    trainable, frozen = partition_params(
        params, ["align_transformer", "text_model", "loss_fns"]
    )
    tx, _ = build_optimizer(trainable, total_steps=10000)
    opt_state = tx.init(trainable)
    step = make_train_step(cfg, tx, dtype=jnp.bfloat16, donate=False, remat=True)

    rng = np.random.default_rng(0)
    b, spi, l = 64, 8, 32  # the bucket real MIMIC sentences land in
    s = b * spi
    batch = {
        "pixel_values": jnp.asarray(rng.standard_normal((b, 518, 518, 3)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(3, 30000, (s, l)), jnp.int32),
        "attention_mask": jnp.ones((s, l), jnp.int32),
        "group_map": jnp.asarray(np.repeat(np.arange(b), spi), jnp.int32),
        "row_mask": jnp.ones((s,), jnp.float32),
    }

    segments = {}

    # full step (fwd + bwd + optimizer), non-donated so reruns reuse inputs
    segments["full_step"] = _timeit(
        lambda: step(trainable, frozen, opt_state, batch)[2]["loss"]
    )

    # tower forward only (frozen: fused serving layers, fp->bf16 inside)
    tower = jax.jit(
        lambda p, x: jnp.sum(
            vit_forward(p, cfg.vision, x.astype(jnp.bfloat16), dtype=jnp.bfloat16,
                        keep_padded=True).astype(jnp.float32)
        )
    )
    segments["tower_fwd"] = _timeit(tower, frozen["vision_model"], batch["pixel_values"])

    # text tower fwd+bwd
    def text_loss(tp):
        h = mpnet_forward(tp, cfg.text, batch["input_ids"], batch["attention_mask"],
                          dtype=jnp.bfloat16, remat=True)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    text_g = jax.jit(lambda tp: _gsum(jax.grad(text_loss)(tp)))
    segments["text_fwd_bwd"] = _timeit(text_g, trainable["text_model"])

    # align adapter fwd+bwd at tower-token shapes (padded 1408 x 768)
    from radzero_tpu.models.align import build_align_adapter

    _, align_apply = build_align_adapter(cfg.align.model_type)
    tokens = jnp.asarray(rng.standard_normal((b, 1408, 768)), jnp.bfloat16)

    def align_loss(ap):
        out = align_apply(ap, cfg.align, tokens, remat=True, real_len=1370)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    align_g = jax.jit(lambda ap: _gsum(jax.grad(align_loss)(ap)))
    segments["align_fwd_bwd"] = _timeit(align_g, trainable["align_transformer"])

    # fused VL-CABS + MP-NCE fwd+bwd at loss shapes
    feats = jnp.asarray(rng.standard_normal((s, 768)), jnp.bfloat16)
    vtok = jnp.asarray(rng.standard_normal((b, 1370, 768)), jnp.bfloat16)

    def vl_loss(lp, f, vt):
        out = radzero_loss(
            lp, cfg.loss, f, f / jnp.linalg.norm(f, axis=-1, keepdims=True),
            batch["group_map"], batch["row_mask"], vt, compute_loss=True,
            impl="fused_train" if cfg.loss.sim_op == "cos" else "xla",
        )
        return out["losses"]["loss"]

    vl_g = jax.jit(
        lambda lp, f, vt: _gsum(jax.grad(vl_loss)(lp, f, vt))
    )
    segments["loss_fwd_bwd"] = _timeit(
        vl_g, trainable["loss_fns"]["RadZeroLoss"], feats, vtok
    )

    # optimizer update alone (grads := params as a stand-in tree)
    opt = jax.jit(
        lambda g, o, t: _gsum(tx.update(g, o, t)[0])
    )
    segments["optimizer"] = _timeit(opt, trainable, opt_state, trainable)

    seg_sum = sum(v for k, v in segments.items() if k != "full_step")
    out = {
        "metric": "train_step_segments_ms",
        "batch": b, "sentences": s, "text_len": l,
        "segments_ms": {k: round(v, 2) for k, v in segments.items()},
        "segment_sum_ms": round(seg_sum, 2),
        "samples_per_sec_full": round(b / (segments["full_step"] / 1e3), 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
