#!/usr/bin/env python
"""Offline checkpoint converter: torch/HF safetensors -> JAX (Orbax).

The only place torch is used in this project (SURVEY.md §7 guiding
decision: HF checkpoints are converted once offline). Supports:

  --kind radzero   full reference CxrAlignModel checkpoint
                   (e.g. Deepnoid/RadZero hub snapshot or a Trainer
                   checkpoint dir containing model.safetensors)
  --kind dinov2    a Dinov2Model checkpoint (e.g. XrayDINOv2)
  --kind mpnet     an MPNetModel checkpoint (all-mpnet-base-v2)

Usage:
  python tools/convert_checkpoint.py --src /path/to/ckpt_dir \
      --dst /path/to/out --kind radzero

Reads preprocessor_config.json next to the weights (when present) and
emits processor_config.json with image mean/std/size for
radzero_tpu.data.processing.build_image_processor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_state_dict(src: str) -> dict:
    """Load {name: np.ndarray} from safetensors or torch .bin files."""
    sd = {}
    files = []
    if os.path.isdir(src):
        for f in sorted(os.listdir(src)):
            if f.endswith(".safetensors") or f.endswith(".bin") or f == "pytorch_model.bin":
                files.append(os.path.join(src, f))
    else:
        files = [src]
    if not files:
        raise FileNotFoundError(f"no weight files under {src}")

    for path in files:
        if path.endswith(".safetensors"):
            from safetensors import safe_open

            with safe_open(path, framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        else:
            import torch

            state = torch.load(path, map_location="cpu", weights_only=True)
            for k, v in state.items():
                sd[k] = v.float().numpy() if v.dtype.is_floating_point else v.numpy()
    return sd


def convert(src: str, dst: str, kind: str) -> None:
    from radzero_tpu.models.convert import (
        convert_dinov2,
        convert_mpnet,
        convert_radzero_checkpoint,
        convert_sam,
    )

    sd = load_state_dict(src)
    # strip common wrappers
    for prefix in ("model.", "module."):
        if all(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()}

    def n_layers(pat: str) -> int:
        idx = set()
        for k in sd:
            if pat in k:
                try:
                    idx.add(int(k.split(pat)[1].split(".")[0]))
                except (ValueError, IndexError):
                    pass
        return max(idx) + 1 if idx else 0

    if kind == "radzero":
        params = convert_radzero_checkpoint(
            sd,
            vision_layers=n_layers("vision_model.encoder.layer."),
            align_layers=n_layers("align_transformer.transformer_layers.layer."),
            text_layers=n_layers("text_model.encoder.layer."),
        )
    elif kind == "dinov2":
        params = convert_dinov2(sd, n_layers("encoder.layer."))
    elif kind == "mpnet":
        params = convert_mpnet(sd, n_layers("encoder.layer."))
    elif kind == "sam":
        params = convert_sam(
            sd, n_layers("vision_encoder.layers.") or n_layers("layers.")
        )
    else:
        raise ValueError(kind)

    import jax
    import orbax.checkpoint as ocp

    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(dst), "state"), params)
    ckptr.wait_until_finished()

    # carry the tokenizer vocabulary along so the serving/eval runtime
    # resolves the first-party WordPieceTokenizer (no transformers needed)
    src_dir = src if os.path.isdir(src) else os.path.dirname(src)
    vocab_src = os.path.join(src_dir, "vocab.txt")
    if os.path.exists(vocab_src):
        import shutil

        shutil.copyfile(vocab_src, os.path.join(dst, "vocab.txt"))
    else:
        try:  # tokenizer.json-only snapshots: extract via transformers
            from transformers import AutoTokenizer

            from radzero_tpu.data.tokenizer import dump_hf_vocab

            tok = AutoTokenizer.from_pretrained(src_dir, local_files_only=True)
            dump_hf_vocab(tok, os.path.join(dst, "vocab.txt"))
        except Exception:
            pass

    # carry image-processor statistics along when available
    pc = os.path.join(src_dir, "preprocessor_config.json")
    if os.path.exists(pc):
        with open(pc) as f:
            conf = json.load(f)
        out = {
            "image_mean": conf.get("image_mean"),
            "image_std": conf.get("image_std"),
            "size": conf.get("size"),
            "resample": conf.get("resample"),
        }
        with open(os.path.join(dst, "processor_config.json"), "w") as f:
            json.dump(out, f, indent=2)

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"converted {kind}: {n_params / 1e6:.1f}M params -> {dst}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument(
        "--kind", choices=["radzero", "dinov2", "mpnet", "sam"], default="radzero"
    )
    a = p.parse_args()
    convert(a.src, a.dst, a.kind)
