"""Measure/derive the A100 reference throughput for BASELINE.md.

The reference (deepnoid-ai/RadZero) publishes no throughput numbers, and
this environment has no GPU, so the A100 fp32 zero-shot throughput is
DERIVED, not guessed:

1. Rebuild the reference's serving hot path in torch fp32 eager — the
   exact stack `compute_logits` runs (modeling.py:278-328): HF
   ``Dinov2Model`` @ 518px (12 layers, 768d — the XrayDINOv2 tower),
   2 extra ``Dinov2Layer``s (the align transformer,
   align_transformers.py:23-45), HF ``MPNetModel`` for the prompt batch,
   shared LayerNorm + VL-CABS cos-attention (losses.py:187-240).
2. Measure its achieved FLOP/s on this host CPU, and the host's peak
   GEMM FLOP/s (big square torch.mm). The ratio is the *eager-torch
   utilization* of the stack — how much of the machine's matmul peak the
   reference's Python/eager layer structure actually extracts. That
   ratio transfers across backends far better than absolute numbers do:
   both MKL/oneDNN and cuBLAS saturate on these shapes (768/3072-wide
   GEMMs, 1370-token attention), and the non-GEMM residue (softmax, LN,
   bias, GELU — memory-bound on both) is what eats the gap from peak.
3. Estimated A100 throughput = utilization x A100 fp32 peak
   (19.5 TFLOP/s, non-TF32 — the reference casts the model to fp32 for
   eval, run.py:137, and torch.backends.cuda.matmul.allow_tf32 defaults
   to False) / analytic FLOPs per image.
   The 100%-of-peak bound (19.5e12 / FLOPs_per_image) is also printed:
   no fp32 A100 run of this model can exceed it.

Run:  python tools/baseline_torch.py [--batch 2] [--iters 2]
Prints one JSON dict with every measured and derived number.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch
import torch.nn.functional as F

A100_FP32_PEAK = 19.5e12  # FLOP/s, non-tensor-core fp32


# ---------------------------------------------------------------------------
# Analytic forward FLOPs (multiply-accumulate = 2 FLOP)
# ---------------------------------------------------------------------------

def vit_flops(n_tokens: int, d: int, layers: int, mlp_ratio: float = 4.0) -> float:
    per_layer = (
        4 * n_tokens * d * d * 2          # qkv + out projections
        + 2 * n_tokens * n_tokens * d * 2  # QK^T and AV
        + 2 * n_tokens * d * (mlp_ratio * d) * 2  # MLP up/down
    )
    return layers * per_layer


def flops_per_image(img: int = 518, patch: int = 14, d: int = 768,
                    vit_layers: int = 12, align_layers: int = 2) -> float:
    grid = img // patch
    n = grid * grid + 1
    patch_embed = grid * grid * d * (patch * patch * 3) * 2
    return patch_embed + vit_flops(n, d, vit_layers + align_layers)


def text_flops_per_batch(n_prompts: int, seq: int, d: int = 768,
                         layers: int = 12) -> float:
    return n_prompts * vit_flops(seq, d, layers) / 1.0


# ---------------------------------------------------------------------------
# Reference stack in torch fp32 eager (HF modules, random init — throughput
# does not depend on weight values)
# ---------------------------------------------------------------------------

def build_reference_stack():
    from transformers import Dinov2Config, Dinov2Model, MPNetConfig, MPNetModel
    from transformers.models.dinov2.modeling_dinov2 import Dinov2Layer

    vcfg = Dinov2Config(image_size=518, patch_size=14, hidden_size=768,
                        num_hidden_layers=12, num_attention_heads=12)
    vision = Dinov2Model(vcfg).eval()
    align = torch.nn.ModuleList([Dinov2Layer(vcfg) for _ in range(2)]).eval()
    tcfg = MPNetConfig()
    text = MPNetModel(tcfg).eval()
    shared_ln = torch.nn.LayerNorm(768).eval()
    return vision, align, text, shared_ln


@torch.no_grad()
def compute_logits_torch(vision, align, text, shared_ln, pixel_values, ids, mask,
                         tau: float = 0.07):
    """The zero-shot scoring path (modeling.py:278-328 + losses.py:187-240)."""
    tokens = vision(pixel_values).last_hidden_state          # (B, 1+L, 768)
    for layer in align:
        out = layer(tokens)
        tokens = out[0] if isinstance(out, tuple) else out
    hidden = text(input_ids=ids, attention_mask=mask).last_hidden_state
    m = mask.unsqueeze(-1).float()
    query = (hidden * m).sum(1) / m.sum(1)                   # masked mean pool
    tokens = shared_ln(tokens)
    query = shared_ln(query)
    qn = F.normalize(query, dim=-1)                          # (N, 768)
    tn = F.normalize(tokens, dim=-1)                         # (B, 1+L, 768)
    scores = torch.einsum("nd,bld->bnl", qn, tn) / tau
    attn = scores.softmax(-1)
    agg = torch.einsum("bnl,bld->bnd", attn, tn)
    logits = torch.einsum("bnd,bnd->bn", F.normalize(agg, dim=-1),
                          qn.unsqueeze(0).expand_as(agg))
    return logits / tau, scores[:, :, 1:]


def measure_peak_gemm(n: int = 1536, iters: int = 8) -> float:
    a = torch.randn(n, n)
    b = torch.randn(n, n)
    torch.mm(a, b)  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        c = torch.mm(a, b)
    dt = time.perf_counter() - t0
    float(c.sum())
    return 2 * n**3 * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--n_prompts", type=int, default=20)
    ap.add_argument("--seq", type=int, default=32)
    ap.add_argument("--ref_batch", type=int, default=64,
                    help="reference eval batch (config.yaml:54-60) used to "
                         "amortise the per-batch text FLOPs in the A100 derivation")
    args = ap.parse_args()

    vision, align, text, shared_ln = build_reference_stack()
    rng = np.random.default_rng(0)
    pv = torch.from_numpy(rng.standard_normal((args.batch, 3, 518, 518)).astype(np.float32))
    ids = torch.from_numpy(rng.integers(3, 30000, (args.n_prompts, args.seq)).astype(np.int64))
    mask = torch.ones(args.n_prompts, args.seq, dtype=torch.long)

    compute_logits_torch(vision, align, text, shared_ln, pv, ids, mask)  # warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        logits, _ = compute_logits_torch(vision, align, text, shared_ln, pv, ids, mask)
    dt = time.perf_counter() - t0
    float(logits.sum())

    f_img = flops_per_image()
    f_txt = text_flops_per_batch(args.n_prompts, args.seq)
    total_flops = (f_img * args.batch + f_txt) * args.iters
    achieved = total_flops / dt
    peak = measure_peak_gemm()
    util = achieved / peak

    # the reference evaluates at batch 64 (config.yaml:54-60): amortise the
    # per-batch prompt-tower FLOPs at that batch for the A100 derivation
    per_img_flops = f_img + f_txt / args.ref_batch
    a100_upper = A100_FP32_PEAK / per_img_flops
    a100_est = util * A100_FP32_PEAK / per_img_flops

    print(json.dumps({
        "host_seconds_per_batch": round(dt / args.iters, 3),
        "host_images_per_sec": round(args.batch * args.iters / dt, 4),
        "flops_per_image": f_img,
        "text_flops_per_batch": f_txt,
        "host_achieved_gflops": round(achieved / 1e9, 2),
        "host_peak_gemm_gflops": round(peak / 1e9, 2),
        "eager_utilization": round(util, 4),
        "a100_fp32_upper_bound_imgs_per_sec": round(a100_upper, 2),
        "a100_fp32_estimated_imgs_per_sec": round(a100_est, 2),
    }, indent=1))


if __name__ == "__main__":
    main()
