"""Training + zero-shot evaluation entry point.

Rebuild of exp/cxr_pt/run.py:18-169: config (base + ordered overlays +
CLI), output-dir/snapshot setup, model + data wiring, training with
early stopping, then the zero-shot suite from the best checkpoint.

Usage:
    python -m radzero_tpu.cli.run --add_cfg_list radzero paths \
        [--train true] [--inference true] [--compute_metric true]
        [--no_report] [--user U] [--name N]

No torchrun: one process drives the whole Mesh (multi-host TPU uses the
same program per host via jax.distributed).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from radzero_tpu.config.config import Config, str2bool
from radzero_tpu.data.mimic import load_datasets
from radzero_tpu.data.pipeline import PackSpec, TrainLoader, pil_image_loader
from radzero_tpu.data.processing import build_image_processor
from radzero_tpu.data.tokenizer import load_tokenizer
from radzero_tpu.eval.inference import Inference
from radzero_tpu.eval.scorer import ZeroShotScorer
from radzero_tpu.models.configuration import radzero_config_from_dict
from radzero_tpu.models.radzero import init_radzero
from radzero_tpu.parallel.mesh import create_mesh
from radzero_tpu.train.trainer import RadZeroTrainer, TrainerArgs
from radzero_tpu.utils.experiment import code_snapshot, output_directory_setting
from radzero_tpu.utils.logging import load_logger


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="RadZero-TPU train/eval entry")
    default_cfg = os.path.join(os.path.dirname(__file__), "..", "config", "defaults.yaml")
    p.add_argument("--cfg_path", default=os.path.abspath(default_cfg))
    p.add_argument("--add_cfg_list", nargs="*", default=[])
    p.add_argument("--train", type=str2bool, default=True)
    p.add_argument("--inference", type=str2bool, default=True)
    p.add_argument("--compute_metric", type=str2bool, default=True)
    p.add_argument("--no_report", action="store_true")
    p.add_argument("--user", default=None)
    p.add_argument("--name", default=None)
    p.add_argument("--resume_from_checkpoint", type=str2bool, default=None)
    return p.parse_args()


def build_everything(cfg: dict, seed: int = 42):
    """Wire model config, params, processor, tokenizer from the config dict
    (ref load_model, exp/cxr_pt/model/__init__.py:14-55)."""
    import jax

    model_block = cfg["model"]
    model_cfg = radzero_config_from_dict(model_block["model_config"])

    loss_block = model_block["model_config"].get("loss") or {}
    loss_apply = tuple(loss_block.get("apply", ["RadZeroLoss"]))
    loss_ratio = dict(zip(loss_apply, loss_block.get("ratio", [1.0] * len(loss_apply))))

    params = init_radzero(jax.random.PRNGKey(seed), model_cfg, loss_apply=loss_apply)
    pretrained = model_block.get("pretrained_ckpt")
    if pretrained:
        from radzero_tpu.train.checkpoint import restore_checkpoint

        params = restore_checkpoint(pretrained, params)

    vision_cfg_dict = model_block["model_config"]["vision_config"]
    image_processor = build_image_processor(vision_cfg_dict)
    tokenizer = load_tokenizer(
        model_block["model_config"]["text_config"].get("pretrained_tokenizer_name_or_path"),
        max_length=cfg["train"].get("max_text_tokens", 64),
    )
    return model_cfg, params, image_processor, tokenizer, loss_apply, loss_ratio


def enable_compilation_cache() -> None:
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main() -> None:
    enable_compilation_cache()
    args = parse_args()
    cfg = Config(args).config
    logger = load_logger()
    output_dir = output_directory_setting(cfg, logger)
    code_snapshot(cfg, output_dir)

    from radzero_tpu.utils.profiling import debug_flags

    debug_flags(
        nans=bool(cfg["train"].get("debug_nans", False)),
        deterministic=bool(cfg["train"].get("full_determinism", False)),
    )

    model_cfg, params, image_processor, tokenizer, loss_apply, loss_ratio = build_everything(
        cfg, seed=cfg["train"].get("seed", 42)
    )

    mesh = create_mesh(cfg["train"].get("mesh", {"data": -1}))
    spec = PackSpec(
        max_sentences_per_image=cfg["train"].get("max_sentences_per_image", 8),
        max_text_tokens=cfg["train"].get("max_text_tokens", 64),
        text_length_buckets=tuple(cfg["train"].get("text_length_buckets", ())),
        # opt-in sentence dedup (PackSpec.dedup_slots): encode only the
        # unique sentences per batch; calibrated budget in
        # DEDUP_CALIBRATION_r05.json / tools/dedup_calibration.py
        # (multi-process loaders use the rank-consistent drop-overflow
        # layout, data/pipeline.py)
        dedup_slots=int(cfg["train"].get("dedup_slots", 0)),
        # CLIP/SigLIP aux losses consume one random positive per image
        # (ref dataset.py:164-170 encoded_random_key_phrases)
        with_random_positive=any(
            name in ("OpenClipLoss", "OpenSigLipLoss") for name in loss_apply
        ),
    )

    trainer = None
    if cfg["args"]["train"]:
        datasets = load_datasets(cfg["dataset"], train=True)
        loader = pil_image_loader(image_processor)

        # opt-in frozen-tower activation cache (train/tower_cache.py):
        # train.tower_cache: "ram" | {"backing": "memmap", "path": ...}
        tower_cache = None
        tc_cfg = cfg["train"].get("tower_cache")
        if tc_cfg:
            from radzero_tpu.train.tower_cache import TowerCache

            if isinstance(tc_cfg, str):
                tc_cfg = {"backing": tc_cfg}
            backing = tc_cfg.get("backing", "ram")
            if backing == "memmap":
                import os as _os

                tower_cache = TowerCache(
                    "memmap",
                    path=tc_cfg.get("path") or _os.path.join(output_dir, "tower_cache"),
                    n_records=len(datasets["train"]),
                )
            elif backing == "device":
                tower_cache = TowerCache(
                    "device", n_records=len(datasets["train"])
                )
            else:
                # TowerCache validates the string, so a YAML typo
                # ('memap', 'hbm', ...) errors here instead of silently
                # training on the RAM backing
                tower_cache = TowerCache(backing)

        train_loader = TrainLoader(
            datasets["train"], loader, tokenizer,
            cfg["train"]["per_device_train_batch_size"] * mesh.devices.size,
            spec, seed=cfg["train"].get("seed", 42),
            with_indices=tower_cache is not None,
            # train.echo: data echoing for host-bound phases — each
            # decoded batch yields `echo` optimizer steps (Choi et al.
            # 2019; TrainLoader docstring). Counts toward the LR
            # schedule and epoch length.
            echo=int(cfg["train"].get("echo", 1)),
        )
        eval_loader = TrainLoader(
            datasets["eval"], loader, tokenizer,
            cfg["train"]["per_device_eval_batch_size"] * mesh.devices.size,
            spec, shuffle=False,
        )

        targs = TrainerArgs(
            output_dir=output_dir,
            learning_rate=float(cfg["train"]["learning_rate"]),
            num_train_epochs=cfg["train"]["num_train_epochs"],
            weight_decay=cfg["train"].get("weight_decay", 0.05),
            max_grad_norm=cfg["train"].get("max_grad_norm", 1.0),
            warmup_steps=cfg["train"].get("warmup_steps", 50),
            logging_steps=cfg["train"].get("logging_steps", 10),
            save_total_limit=cfg["train"].get("save_total_limit"),
            early_stopping_patience=cfg["experiment"].get("early_stopping_patience"),
            bf16=cfg["train"].get("bf16", True),
            gradient_checkpointing=cfg["train"].get("gradient_checkpointing", False),
            gradient_accumulation_steps=cfg["train"].get("gradient_accumulation_steps", 1),
            seed=cfg["train"].get("seed", 42),
            module_to_update=tuple(
                cfg["model"].get("module_to_update", ["align_transformer", "text_model", "loss_fns"])
            ),
            loss_ratio=loss_ratio,
            report_to=cfg["experiment"].get("report_to", "none"),
        )
        trainer = RadZeroTrainer(
            model_cfg, targs, train_loader, eval_loader, params=params, mesh=mesh,
            tower_cache=tower_cache,
        )
        resume = cfg["args"].get("resume_from_checkpoint")
        if resume is None:
            resume = cfg["experiment"].get("resume_from_checkpoint", False)
        trainer.train(resume_from_checkpoint=resume or None)
        params = trainer.params

    # post-train zero-shot suite from the best model, fp32
    # (ref run.py:123-169: rank-0, fp32 eval)
    if cfg["args"]["inference"]:
        scorer = ZeroShotScorer(
            params, model_cfg, image_processor, tokenizer,
            batch_size=cfg["inference"]["batch_size"], dtype=jnp.float32,
        )
        # Multi-process runs shard the dataset registry across processes
        # and merge result.json on process 0 (fixes the reference's
        # rank-0-serial eval quirk, SURVEY.md §7 / ref run.py:123-169).
        if jax.process_count() > 1:
            from radzero_tpu.eval.distributed import DistributedInference

            inference = DistributedInference(
                cfg["inference"]["cls_dataset"],
                cfg["inference"]["det_dataset"],
                cfg["inference"]["seg_dataset"],
                cfg["dataset"]["data_root"],
                batch_size=cfg["inference"]["batch_size"],
            )
        else:
            inference = Inference(
                cfg["inference"]["cls_dataset"],
                cfg["inference"]["det_dataset"],
                cfg["inference"]["seg_dataset"],
                cfg["dataset"]["data_root"],
                batch_size=cfg["inference"]["batch_size"],
            )
        save_dir = os.path.join(output_dir, "inference")
        inference.classification(
            scorer, os.path.join(save_dir, "classification"),
            compute_metric=cfg["args"].get("compute_metric", True),
        )
        inference.grounding(scorer, os.path.join(save_dir, "grounding"))
        inference.segmentation(
            scorer,
            os.path.join(save_dir, "segmentation"),
            cfg["inference"].get("compute_pixel_level_auroc", False),
        )


if __name__ == "__main__":
    main()
