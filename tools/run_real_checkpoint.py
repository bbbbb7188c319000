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


# The reference's full zero-shot registry (exp/cxr_pt/inference/
# inference.py:36-170 + inference/utils.py:109-178): which task family
# each dataset belongs to. ChestXDet10 runs BOTH classification (CARZero
# merger, external/CARZero/inference.py:371-418) and grounding.
CLS_SETS = ["OpenI", "PadChest", "ChestXray14", "Chexpert", "ChestXDet10"]
DET_SETS = ["ChestXDet10", "MS-CXR"]
SEG_SETS = ["SIIM", "RSNA"]
FULL_REGISTRY = ["OpenI", "PadChest", "ChestXray14", "Chexpert",
                 "ChestXDet10", "MS-CXR", "SIIM", "RSNA"]


def select_datasets(data_root: str):
    """(present, absent) split of the full registry by on-disk files."""
    from radzero_tpu.eval.registry import get_infer_dirs

    dirs = get_infer_dirs(data_root)
    present, absent = [], []
    for name in FULL_REGISTRY:
        if all(os.path.exists(p) for p in dirs[name].values()):
            present.append(name)
        else:
            absent.append(name)
    return present, absent


# Representative + adversarial probe corpus for the tokenizer parity
# dump: real prompt shapes, casing/accents/unicode, long words that
# force WordPiece splits, and degenerate inputs.
VOCAB_PROBE_SENTENCES = [
    "There is pneumothorax",
    "There is no focal consolidation of the left lower lobe.",
    "There may be mild cardiomegaly with small bilateral pleural effusions",
    "Hazy bibasilar opacities, likely atelectasis; cannot exclude pneumonia.",
    "Lungs are clear. No effusion, edema, or pneumothorax.",
    "post-surgical changes from CABG, stable since 2019-03-12",
    "IMPRESSION: 1. Unchanged right PICC line tip at the cavoatrial junction",
    "costophrenic angle blunting (possible trace effusion?)",
    "naïve café coördinate — ümlaut test",
    "supercalifragilisticexpialidocious hypertransradiancy",
    "漢字 mixed with latin words",
    "",
    "   ",
    "UPPERCASE SENTENCE WITH Pneumothorax AND Effusion!!!",
]


def vocab_parity_check(converted_dir: str, hf_source: str, max_length: int = 64):
    """Token-for-token parity of the first-party WordPiece tokenizer
    against the HF tokenizer on the REAL vocab (VERDICT r3 missing #5):
    compares (ids, mask) over VOCAB_PROBE_SENTENCES. Returns None (with
    a log line) when either side is unavailable — e.g. zero-egress and
    no tokenizer files in the snapshot."""
    vocab_path = os.path.join(converted_dir, "vocab.txt")
    if not os.path.exists(vocab_path):
        print(f"vocab parity: skipped ({vocab_path} not found)")
        return None
    try:
        from transformers import AutoTokenizer

        hf_tok = AutoTokenizer.from_pretrained(hf_source, local_files_only=True)
    except Exception as e:
        print(f"vocab parity: skipped (HF tokenizer unavailable: {e})")
        return None

    from radzero_tpu.data.tokenizer import WordPieceTokenizer

    ours = WordPieceTokenizer(vocab_path, style="mpnet", max_length=max_length)
    enc = hf_tok(
        VOCAB_PROBE_SENTENCES, padding="max_length", truncation=True,
        max_length=max_length, return_tensors="np",
    )
    ids_hf = enc["input_ids"].astype(np.int32)
    mask_hf = enc["attention_mask"].astype(np.int32)
    ids_ours, mask_ours = ours(VOCAB_PROBE_SENTENCES, max_length)

    mism = [
        i for i in range(len(VOCAB_PROBE_SENTENCES))
        if not (np.array_equal(ids_hf[i], ids_ours[i])
                and np.array_equal(mask_hf[i], mask_ours[i]))
    ]
    report = {
        "vocab_path": vocab_path,
        "n_sentences": len(VOCAB_PROBE_SENTENCES),
        "n_mismatched": len(mism),
        "token_for_token": not mism,
    }
    if mism:
        i = mism[0]
        report["first_mismatch"] = {
            "text": VOCAB_PROBE_SENTENCES[i],
            "hf_ids": ids_hf[i][mask_hf[i] == 1].tolist(),
            "our_ids": ids_ours[i][mask_ours[i] == 1].tolist(),
        }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hub_snapshot", help="Deepnoid/RadZero snapshot dir (torch)")
    ap.add_argument("--converted", help="already-converted dir (skip conversion)")
    ap.add_argument("--image", help="input image (jpg/png/dcm)")
    ap.add_argument("--text", nargs="*", default=["There is pneumothorax"])
    ap.add_argument("--tokenizer", default="sentence-transformers/all-mpnet-base-v2")
    ap.add_argument("--config", help="model_config JSON (the YAML model.model_config "
                                     "block shape) overriding the flagship default — "
                                     "for snapshots with non-default dims")
    ap.add_argument("--batch_size", type=int, default=64,
                    help="eval scorer batch size (partial batches pad to it)")
    ap.add_argument("--torch_check", action="store_true",
                    help="similarity-map MAE vs the torch reference stack")
    ap.add_argument("--data_root", help="benchmark datasets root for the eval suite")
    ap.add_argument("--tasks", nargs="*", default=[],
                    help="e.g. Chexpert ChestXDet10 SIIM RSNA MS-CXR")
    ap.add_argument("--datasets", action="store_true",
                    help="run the FULL zero-shot registry (every dataset of "
                         "the reference's post-train eval, run.py:123-169) — "
                         "datasets whose files are missing under --data_root "
                         "are listed and skipped")
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

    cfg_override = None
    if args.config:
        from radzero_tpu.models.configuration import radzero_config_from_dict

        with open(args.config) as f:
            cfg_override = radzero_config_from_dict(json.load(f))
    params, cfg = load_converted(converted, cfg=cfg_override)
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

    # tokenizer parity on the real vocab rides along with every run that
    # has the assets (VERDICT r3 missing #5); recorded in result.json
    vocab_parity = vocab_parity_check(
        converted, args.hub_snapshot or args.tokenizer
    )
    if vocab_parity is not None:
        print(json.dumps({"vocab_parity": vocab_parity}, indent=2))

    tasks = list(args.tasks)
    if args.datasets:
        if not args.data_root:
            ap.error("--datasets requires --data_root")
        tasks, absent = select_datasets(args.data_root)
        if absent:
            print(f"--datasets: skipping absent datasets: {absent}")
        print(f"--datasets: running {tasks}")

    if tasks:
        if not args.data_root:
            ap.error("--tasks requires --data_root")
        import jax.numpy as jnp

        from radzero_tpu.eval.inference import Inference
        from radzero_tpu.eval.scorer import ZeroShotScorer

        scorer = ZeroShotScorer(params, cfg, processor, tokenizer,
                                batch_size=args.batch_size, dtype=jnp.float32)
        # ChestXDet10 belongs to BOTH classification and grounding (the
        # reference evaluates it in each, inference/inference.py:36-112);
        # unknown names fall through to classification so custom
        # registry extensions keep working
        cls = [t for t in tasks if t in CLS_SETS
               or t not in (DET_SETS + SEG_SETS)]
        det = [t for t in tasks if t in DET_SETS]
        seg = [t for t in tasks if t in SEG_SETS]
        inf = Inference(cls, det, seg, args.data_root, batch_size=args.batch_size)
        results = {}
        if vocab_parity is not None:
            results["vocab_parity"] = vocab_parity
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
