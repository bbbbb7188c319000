#!/usr/bin/env python
"""End-to-end zero-shot demo (README quickstart, runnable offline).

Runs a chest X-ray (or a synthetic one when no path is given) against a
set of finding prompts, printing per-prompt probabilities and saving a
similarity-map overlay panel. With --ckpt pointing at a converted
reference checkpoint (tools/convert_checkpoint.py) this reproduces the
published model's behavior; without it the towers are random-initialised
(pipeline demo only).

    python examples/zero_shot_demo.py --image chest.jpg \
        --prompts "There is fibrosis" "There is pleural effusion" \
        --ckpt ckpt_dir --save overlay.png
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", default=None)
    p.add_argument("--prompts", nargs="*", default=["There is fibrosis", "There is no finding"])
    p.add_argument("--ckpt", default=None)
    p.add_argument("--tokenizer", default="sentence-transformers/all-mpnet-base-v2")
    p.add_argument("--save", default="overlay.png")
    args = p.parse_args()

    import jax

    from radzero_tpu.data.processing import build_image_processor
    from radzero_tpu.data.tokenizer import load_tokenizer
    from radzero_tpu.eval.api import model_inference
    from radzero_tpu.models.configuration import RadZeroConfig
    from radzero_tpu.models.radzero import init_radzero

    cfg = RadZeroConfig()
    params = init_radzero(jax.random.PRNGKey(0), cfg)
    if args.ckpt:
        from radzero_tpu.train.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.ckpt, params)

    image_path = args.image
    if image_path is None:
        from PIL import Image

        image_path = "/tmp/radzero_demo.png"
        arr = np.random.default_rng(0).integers(0, 256, (512, 512, 3), dtype=np.uint8)
        Image.fromarray(arr).save(image_path)
        print(f"(no --image given: using synthetic {image_path})")

    processor = build_image_processor({"model_type": "dinov2", "img_size": cfg.vision.img_size})
    tokenizer = load_tokenizer(args.tokenizer)

    probs, maps = model_inference(image_path, args.prompts, tokenizer, processor, (params, cfg))
    for prompt, prob in zip(args.prompts, probs):
        print(f"  p({prompt!r}) = {prob:.4f}")

    from radzero_tpu.eval.scorer import ZeroShotScorer
    from radzero_tpu.viz.overlays import render_attention_panel

    scorer = ZeroShotScorer(params, cfg, processor, tokenizer, batch_size=1)
    render_attention_panel(scorer, image_path, args.prompts, args.save)
    print(f"overlay panel saved to {args.save}")


if __name__ == "__main__":
    main()
