#!/usr/bin/env python
"""Attention-aware token filtering: measured accuracy/throughput trade.

VERDICT r2 #10: the flag-gated mechanism (ViTConfig.token_filter_ratio,
PAPERS.md arXiv 2506.01519) needs NUMBERS, not just a switch. Two
measurements in one run:

1. Accuracy: train the sanity-harness quadrant-localisation task once
   (tools/sanity_train.py recipe, frozen tower), then evaluate retrieval
   and pointing accuracy with the filter OFF and at each ratio — the
   filter is a serving-time knob, so train-once/eval-many is the real
   deployment shape.
2. Throughput: time the flagship 12-layer fused tower (batch 64, 518px
   shapes) at each ratio.

Prints one JSON object with the table.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUADRANTS = ["left upper", "right upper", "left lower", "right lower"]


def make_example(rng, img=56):
    q = int(rng.integers(4))
    x = rng.standard_normal((img, img, 3)).astype(np.float32) * 0.1
    half = img // 2
    oy = 0 if q < 2 else half
    ox = 0 if q % 2 == 0 else half
    cy = oy + int(rng.integers(6, half - 6))
    cx = ox + int(rng.integers(6, half - 6))
    x[cy - 5 : cy + 5, cx - 5 : cx + 5] += 2.0
    text = f"There is opacity in the {QUADRANTS[q]} lung"
    return x, text, q


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--ratios", type=float, nargs="*", default=[0.0, 0.25, 0.5])
    p.add_argument("--skip_flagship", action="store_true")
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    except Exception:
        pass

    from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer
    from radzero_tpu.models.configuration import (
        AlignConfig, LossConfig, RadZeroConfig, TextConfig, ViTConfig,
    )
    from radzero_tpu.models.radzero import compute_logits, init_radzero
    from radzero_tpu.train.optim import build_optimizer, partition_params
    from radzero_tpu.train.step import make_train_step

    D = 64
    cfg = RadZeroConfig(
        vision=ViTConfig(hidden_size=D, num_hidden_layers=2, num_attention_heads=4,
                         mlp_ratio=2.0, patch_size=14, pretrain_img_size=56, img_size=56),
        text=TextConfig(hidden_size=D, num_hidden_layers=2, num_attention_heads=4,
                        intermediate_size=128, vocab_size=30527, max_position_embeddings=40),
        align=AlignConfig(hidden_size=D, num_hidden_layers=2, num_attention_heads=4, mlp_ratio=2.0),
        loss=LossConfig(hidden_dim=D),
    )
    tok = WhitespaceHashTokenizer(max_length=12)
    params = init_radzero(jax.random.PRNGKey(0), cfg)
    trainable, frozen = partition_params(params, ["align_transformer", "text_model", "loss_fns"])
    tx, _ = build_optimizer(trainable, learning_rate=3e-4, warmup_steps=10,
                            total_steps=args.steps)
    opt_state = tx.init(trainable)
    step = make_train_step(cfg, tx, dtype=jnp.float32, donate=False)

    rng = np.random.default_rng(0)

    def batch_of(n):
        imgs, texts = [], []
        for _ in range(n):
            x, t, _ = make_example(rng)
            imgs.append(x)
            texts.append(t)
        ids, mask = tok(texts, 12)
        return {
            "pixel_values": np.stack(imgs), "input_ids": ids,
            "attention_mask": mask, "group_map": np.arange(n, dtype=np.int32),
            "row_mask": np.ones(n, np.float32),
        }

    for i in range(args.steps):
        trainable, opt_state, losses = step(trainable, frozen, opt_state, batch_of(args.batch))
        if i % 25 == 0:
            print(f"train step {i}: loss={float(losses['loss']):.4f}",
                  file=sys.stderr, flush=True)
    params = {**trainable, **frozen}

    prompts = [f"There is opacity in the {q} lung" for q in QUADRANTS]
    ids, mask = tok(prompts, 12)
    n_eval = 64
    imgs, labels = [], []
    for _ in range(n_eval):
        x, _, q = make_example(rng)
        imgs.append(x)
        labels.append(q)
    imgs = np.stack(imgs)

    table = {}
    for ratio in args.ratios:
        cfg_r = dataclasses.replace(
            cfg, vision=dataclasses.replace(
                cfg.vision, token_filter_ratio=ratio, token_filter_layer=1
            )
        )
        out = compute_logits(params, cfg_r, imgs, ids, mask, dtype=jnp.float32)
        logits = np.asarray(out["logits"])
        maps = np.asarray(out["similarity_scores"])
        correct = pointed = 0
        for i, q in enumerate(labels):
            if logits[i].argmax() == q:
                correct += 1
            grid = maps[i, q].reshape(4, 4)
            gy, gx = np.unravel_index(grid.argmax(), (4, 4))
            if (gy < 2) == (q < 2) and (gx < 2) == (q % 2 == 0):
                pointed += 1
        table[f"ratio_{ratio}"] = {
            "retrieval_accuracy": correct / n_eval,
            "pointing_accuracy": pointed / n_eval,
        }
        print(f"eval ratio {ratio}: {table[f'ratio_{ratio}']}",
              file=sys.stderr, flush=True)

    # flagship tower throughput at each ratio (fused serving path)
    if not args.skip_flagship and jax.default_backend() != "cpu":
        from radzero_tpu.models.vit import init_vit, vit_forward

        fcfg = ViTConfig(attn_impl="fused")
        fparams = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16), init_vit(jax.random.PRNGKey(0), fcfg)
        )
        pv = jax.random.normal(jax.random.PRNGKey(1), (64, 518, 518, 3), jnp.bfloat16)
        sync = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
        for ratio in args.ratios:
            cfg_r = dataclasses.replace(fcfg, token_filter_ratio=ratio,
                                        token_filter_layer=6)
            g = jax.jit(lambda pv, c=cfg_r: vit_forward(fparams, c, pv, dtype=jnp.bfloat16))
            out = g(pv)
            float(sync(out))
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(5):
                    out = g(pv)
                float(sync(out))
                best = min(best, (time.perf_counter() - t0) / 5)
            table[f"ratio_{ratio}"]["flagship_tower_imgs_per_sec"] = round(64 / best, 1)

    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
