"""Visualization driver CLI.

Rebuild of the reference's visualization entry
(exp/cxr_pt/inference/visualize.py + the per-file __main__ study
scripts — the working paths, since the top-level driver there calls a
nonexistent method, SURVEY.md §2 C22 note). Runs the requested studies
from a trained checkpoint over one image or dataset samples.

Usage:
    python -m radzero_tpu.cli.visualize --ckpt CKPT_DIR --image x.jpg \
        --studies open_vocab positional pos_neg --save_dir out/
    python -m radzero_tpu.cli.visualize --ckpt CKPT_DIR \
        --dataset ChestXDet10 --data_root /data --save_dir out/
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from radzero_tpu.data.processing import build_image_processor
from radzero_tpu.data.tokenizer import load_tokenizer
from radzero_tpu.eval.scorer import ZeroShotScorer
from radzero_tpu.models.configuration import RadZeroConfig, radzero_config_from_dict
from radzero_tpu.models.radzero import init_radzero
from radzero_tpu.utils.logging import load_logger


def build_scorer(args) -> ZeroShotScorer:
    logger = load_logger()
    cfg = RadZeroConfig()
    params = init_radzero(jax.random.PRNGKey(0), cfg)
    if args.ckpt:
        from radzero_tpu.train.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.ckpt, params)
        logger.info(f"loaded checkpoint {args.ckpt}")
    processor = build_image_processor({"model_type": "dinov2", "img_size": cfg.vision.img_size})
    tokenizer = load_tokenizer(args.tokenizer)
    return ZeroShotScorer(params, cfg, processor, tokenizer, batch_size=args.batch_size,
                          dtype=jnp.float32 if args.fp32 else jnp.bfloat16)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--tokenizer", default="sentence-transformers/all-mpnet-base-v2")
    p.add_argument("--image", default=None)
    p.add_argument("--dataset", default=None,
                   choices=[None, "ChestXDet10", "SIIM", "RSNA"])
    p.add_argument("--data_root", default=None)
    p.add_argument("--save_dir", default="viz_out")
    p.add_argument("--studies", nargs="*",
                   default=["open_vocab"],
                   choices=["open_vocab", "positional", "pos_neg", "anatomy",
                            "disease", "disease_map", "open_vocab_seg"])
    p.add_argument("--top_k_percent", type=float, default=None,
                   help="open_vocab_seg: keep only the top-k%% of each map")
    p.add_argument("--prompts", nargs="*", default=None)
    p.add_argument("--num_samples", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--fp32", action="store_true")
    args = p.parse_args()

    scorer = build_scorer(args)
    os.makedirs(args.save_dir, exist_ok=True)

    if args.image:
        from radzero_tpu.viz.segmap import anatomy_segmentation, disease_segmentation
        from radzero_tpu.viz.studies import (
            open_vocab_study,
            pos_neg_prompt_study,
            positional_prompt_study,
        )

        for study in args.studies:
            if study == "open_vocab":
                open_vocab_study(scorer, args.image, args.save_dir, args.prompts)
            elif study == "positional":
                positional_prompt_study(scorer, args.image, args.save_dir)
            elif study == "pos_neg":
                findings = args.prompts or ["Pneumothorax", "Pleural Effusion", "Cardiomegaly"]
                pos_neg_prompt_study(scorer, args.image, args.save_dir, findings)
            elif study == "anatomy":
                anatomy_segmentation(scorer, args.image, args.save_dir)
            elif study == "disease":
                disease_segmentation(scorer, args.image, args.save_dir)
            elif study == "disease_map":
                from radzero_tpu.viz.qualitative import process_and_visualize_map

                texts = args.prompts or ["There is Pneumothorax"]
                process_and_visualize_map(scorer, args.image, texts, args.save_dir)
            elif study == "open_vocab_seg":
                from radzero_tpu.viz.qualitative import (
                    process_and_visualize_segmentation,
                )

                texts = args.prompts or [
                    "There is Pneumothorax", "There is Cardiomegaly",
                ]
                process_and_visualize_segmentation(
                    scorer, args.image, texts, args.save_dir, k=args.top_k_percent
                )

    if args.dataset:
        assert args.data_root, "--data_root required with --dataset"
        from radzero_tpu.viz.studies import (
            visualize_chestxdet10_samples,
            visualize_rsna_samples,
            visualize_siim_samples,
        )

        fn = {
            "ChestXDet10": visualize_chestxdet10_samples,
            "SIIM": visualize_siim_samples,
            "RSNA": visualize_rsna_samples,
        }[args.dataset]
        fn(scorer, args.data_root, args.save_dir, args.num_samples)


if __name__ == "__main__":
    main()
