#!/usr/bin/env python
"""One-command runbook: real Deepnoid/RadZero weights -> converted model
-> parity check -> zero-shot inference.

This environment has no egress, so the hub snapshot cannot be fetched
here; on a connected machine the full flow is:

    # 1. fetch the weights (outside this tool)
    huggingface-cli download Deepnoid/RadZero --local-dir /ckpt/radzero

    # 2. convert + verify + run
    python tools/run_real_checkpoint.py \
        --hub_snapshot /ckpt/radzero \
        --image chest_xray.jpg --text "There is pneumothorax" \
        --out out/

Steps performed:
1. Convert the torch/safetensors snapshot to a JAX pytree
   (tools/convert_checkpoint.py --kind radzero) unless --converted
   already points at one.
2. Build the tokenizer (HF files in the snapshot) and the Blip-style
   image processor from the snapshot's preprocessor_config.json.
3. Run the public API ``model_inference`` (eval/api.py — the reference
   README.md:60-112 contract) on (--image, --text); print
   similarity_prob and map statistics, save the map as .npy.
4. ``--torch_check``: rebuild the reference stack in torch fp32 eager
   from the SAME state dict (HF Dinov2Model/Dinov2Layer/MPNetModel +
   VL-CABS — the tools/baseline_torch.py modules, with real weights
   loaded) and report the similarity-map MAE and prob deltas vs our
   fp32 path. BASELINE.md pins MAE < 1e-3.
5. ``--data_root`` + ``--tasks``: run the zero-shot eval suite
   (classification/grounding/segmentation registries, eval/inference.py)
   and write result.json per task.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_converted(converted_dir: str, cfg=None):
    """Restore the converted pytree. Default config is the flagship
    recipe with ``pretrain_img_size=518`` — the XrayDINOv2 tower ships
    its pos-embed table at the 37x37 grid (radzero.yaml:17-19), unlike
    hub dinov2-base (224)."""
    import orbax.checkpoint as ocp

    from radzero_tpu.models.configuration import RadZeroConfig, ViTConfig

    if cfg is None:
        cfg = RadZeroConfig(vision=ViTConfig(pretrain_img_size=518, img_size=518))
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(os.path.abspath(converted_dir), "state"))
    return params, cfg


def build_processor(converted_dir: str):
    from radzero_tpu.data.processing import BlipStyleImageProcessor, CLIP_MEAN, CLIP_STD

    pc = os.path.join(converted_dir, "processor_config.json")
    mean, std, size = CLIP_MEAN, CLIP_STD, 518
    if os.path.exists(pc):
        with open(pc) as f:
            conf = json.load(f)
        mean = tuple(conf.get("image_mean") or mean)
        std = tuple(conf.get("image_std") or std)
        s = conf.get("size")
        if isinstance(s, dict):
            size = s.get("height") or s.get("shortest_edge") or size
        elif isinstance(s, int):
            size = s
    return BlipStyleImageProcessor(size=size, mean=mean, std=std)


def torch_parity_check(hub_snapshot: str, image_path: str, texts, tokenizer,
                       image_processor, params, cfg) -> dict:
    """Reference stack in torch fp32 with the REAL weights; returns the
    pre-softmax patch-score MAE and prob delta vs our fp32 path
    (BASELINE.md pins map MAE < 1e-3)."""
    import torch

    from tools.baseline_torch import build_reference_stack, compute_logits_torch
    from tools.convert_checkpoint import load_state_dict

    sd = load_state_dict(hub_snapshot)
    for prefix in ("model.", "module."):
        if all(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()}

    vision, align, text_model, shared_ln = build_reference_stack()
    vision.load_state_dict(
        {k[len("vision_model."):]: torch.from_numpy(np.asarray(v))
         for k, v in sd.items() if k.startswith("vision_model.")}
    )
    align.load_state_dict(
        {k[len("align_transformer.transformer_layers.layer."):]: torch.from_numpy(np.asarray(v))
         for k, v in sd.items()
         if k.startswith("align_transformer.transformer_layers.layer.")}
    )
    text_model.load_state_dict(
        {k[len("text_model."):]: torch.from_numpy(np.asarray(v))
         for k, v in sd.items() if k.startswith("text_model.")}
    )
    ln_w = sd.get("loss_fns.RadZeroLoss.layer_norm.weight")
    ln_b = sd.get("loss_fns.RadZeroLoss.layer_norm.bias")
    if ln_w is not None:
        shared_ln.weight.data = torch.from_numpy(np.asarray(ln_w))
        shared_ln.bias.data = torch.from_numpy(np.asarray(ln_b))
    tau = float(np.exp(np.asarray(sd["loss_fns.RadZeroLoss.loss_temperature"])[0]))

    pv = image_processor(_open_image(image_path))["pixel_values"]
    ids, mask = tokenizer(texts)
    logits_t, scores_t = compute_logits_torch(
        vision, align, text_model, shared_ln,
        torch.from_numpy(pv.transpose(0, 3, 1, 2)),
        torch.from_numpy(ids.astype(np.int64)),
        torch.from_numpy(mask.astype(np.int64)),
        tau=tau,
    )
    probs_t = torch.sigmoid(logits_t)[0].numpy()
    scores_t = scores_t[0].numpy()  # (n_texts, L) pre-softmax, CLS stripped

    # our patch-resolution scores on the same preprocessed input (the
    # upsampling beyond this point is shared host code)
    import jax.numpy as jnp

    from radzero_tpu.models.radzero import compute_logits

    out = compute_logits(
        params, cfg, jnp.asarray(pv), jnp.asarray(ids), jnp.asarray(mask),
        dtype=jnp.float32,
    )
    probs_ours = 1.0 / (1.0 + np.exp(-np.asarray(out["logits"])[0]))
    scores_ours = np.asarray(out["similarity_scores"])[0]
    return {
        "prob_max_abs_delta": float(np.abs(probs_ours - probs_t).max()),
        "patch_score_mae": float(np.abs(scores_ours - scores_t).mean()),
    }


def _open_image(path):
    from radzero_tpu.data.dicom import load_eval_image

    return load_eval_image(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hub_snapshot", help="Deepnoid/RadZero snapshot dir (torch)")
    ap.add_argument("--converted", help="already-converted dir (skip conversion)")
    ap.add_argument("--image", help="input image (jpg/png/dcm)")
    ap.add_argument("--text", nargs="*", default=["There is pneumothorax"])
    ap.add_argument("--tokenizer", default="sentence-transformers/all-mpnet-base-v2")
    ap.add_argument("--torch_check", action="store_true",
                    help="similarity-map MAE vs the torch reference stack")
    ap.add_argument("--data_root", help="benchmark datasets root for the eval suite")
    ap.add_argument("--tasks", nargs="*", default=[],
                    help="e.g. Chexpert ChestXDet10 SIIM RSNA MS-CXR")
    ap.add_argument("--out", default="real_ckpt_out")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    converted = args.converted
    if converted is None:
        if not args.hub_snapshot:
            ap.error("need --hub_snapshot or --converted")
        converted = os.path.join(args.out, "converted")
        from tools.convert_checkpoint import convert

        convert(args.hub_snapshot, converted, "radzero")

    params, cfg = load_converted(converted)
    processor = build_processor(converted)
    from radzero_tpu.data.tokenizer import load_tokenizer

    tokenizer = load_tokenizer(args.tokenizer)

    if args.image:
        from radzero_tpu.eval.api import model_inference

        probs, maps = model_inference(
            args.image, args.text, tokenizer, processor, (params, cfg)
        )
        np.save(os.path.join(args.out, "similarity_map.npy"), maps)
        report = {
            "similarity_prob": probs.tolist(),
            "map_shape": list(maps.shape),
            "map_minmax": [float(maps.min()), float(maps.max())],
        }
        if args.torch_check:
            report["torch_parity"] = torch_parity_check(
                args.hub_snapshot, args.image, list(args.text), tokenizer,
                processor, params, cfg,
            )
        print(json.dumps(report, indent=2))
        with open(os.path.join(args.out, "inference.json"), "w") as f:
            json.dump(report, f, indent=2)

    if args.tasks:
        if not args.data_root:
            ap.error("--tasks requires --data_root")
        import jax.numpy as jnp

        from radzero_tpu.eval.inference import Inference
        from radzero_tpu.eval.scorer import ZeroShotScorer

        scorer = ZeroShotScorer(params, cfg, processor, tokenizer,
                                batch_size=64, dtype=jnp.float32)
        cls = [t for t in args.tasks if t not in ("ChestXDet10", "MS-CXR", "SIIM", "RSNA")]
        det = [t for t in args.tasks if t in ("ChestXDet10", "MS-CXR")]
        seg = [t for t in args.tasks if t in ("SIIM", "RSNA")]
        inf = Inference(cls, det, seg, args.data_root)
        results = {}
        if cls:
            results["classification"] = inf.classification(scorer, os.path.join(args.out, "cls"))
        if det:
            results["grounding"] = inf.grounding(scorer, os.path.join(args.out, "det"))
        if seg:
            results["segmentation"] = inf.segmentation(scorer, os.path.join(args.out, "seg"))
        with open(os.path.join(args.out, "result.json"), "w") as f:
            json.dump(results, f, indent=2, default=float)
        print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
