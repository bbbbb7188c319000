"""Derive the A100 reference TRAINING throughput for BASELINE.md.

Companion to tools/baseline_torch.py (the serving derivation). The
reference trains with bf16 mixed precision on 4x A100 (config.yaml:22
``bf16: true``, README.md:156 ``torchrun --nproc_per_node=4``), batch 64
per device. It publishes no throughput numbers and this environment has
no GPU, so the per-A100 train-step throughput is DERIVED the same way:

1. Rebuild the reference's train step in torch eager — the exact stack
   of SURVEY.md §3.1: frozen ``Dinov2Model`` tower forward under
   no_grad (radzero.yaml:50 freezes the vision tower), 2 trainable
   ``Dinov2Layer`` align layers, the reference's PER-IMAGE ragged MPNet
   forward loop (losses.py:135-147 — B separate variable-length
   forwards, its biggest inefficiency, faithfully reproduced), shared
   LayerNorm + VL-CABS cos-attention + MP-NCE row/col loss
   (losses.py:187-344), backward over the trainable modules, AdamW
   step (config.yaml lr 1e-4, wd 0.05).
2. Measure achieved FLOP/s on this host CPU against the host's peak
   GEMM FLOP/s -> the *eager-torch training utilization* of the stack.
3. Estimated A100 throughput = utilization x A100 peak / analytic
   train FLOPs per sample. Printed against BOTH peaks:
   - bf16 tensor-core peak 312 TFLOP/s (the recipe's precision); the
     utilization transfer is LESS reliable here than for the serving
     fp32 derivation — tensor-core GEMMs finish so fast that eager
     Python/launch overhead and the ragged text loop eat relatively
     more — so the bf16-peak estimate is an OPTIMISTIC (high) baseline,
     i.e. conservative for our ``vs_baseline`` claims.
   - the 100%-of-peak bound: no A100 run of this recipe, at any
     efficiency, can exceed it.

Analytic FLOPs per sample (MAC = 2 FLOP): frozen tower forward x1,
align layers x3 (fwd+bwd), text encoder x3 at the ACTUAL ragged padded
lengths the per-image loop runs, patch embed, VL-CABS/loss/optimizer
negligible (<1%). DDP gradient all-reduce over the ~125M trainable
params overlaps compute on NVLink and is excluded (again optimistic
for the A100 side).

Run:  python tools/baseline_torch_train.py [--batch 2] [--iters 2]
Prints one JSON dict with every measured and derived number.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch
import torch.nn.functional as F

from baseline_torch import (  # noqa: E402  (same directory)
    A100_FP32_PEAK,
    build_reference_stack,
    flops_per_image,
    measure_peak_gemm,
    vit_flops,
)

A100_BF16_PEAK = 312e12  # FLOP/s, bf16 tensor core (the recipe's precision)

# the reference's LLM-extracted finding sentences average ~20 tokens;
# the per-image tokenizer pads each image's sentence list to ITS OWN max
# (dataset.py:172-181), so lengths vary per image
SENTENCE_LEN_MEAN, SENTENCE_LEN_JITTER = 20, 8


def ragged_text_batches(batch: int, spi: int, rng) -> list[torch.Tensor]:
    """Per-image tokenized sentence batches, ragged like the reference's
    ``encoded_key_phrases`` (a list of B tensors, each padded to that
    image's longest sentence)."""
    out = []
    for _ in range(batch):
        lens = rng.integers(
            SENTENCE_LEN_MEAN - SENTENCE_LEN_JITTER,
            SENTENCE_LEN_MEAN + SENTENCE_LEN_JITTER + 1,
            spi,
        )
        lmax = int(lens.max())
        ids = torch.from_numpy(rng.integers(3, 30000, (spi, lmax)).astype(np.int64))
        mask = torch.zeros(spi, lmax, dtype=torch.long)
        for i, l in enumerate(lens):
            mask[i, : int(l)] = 1
        out.append((ids, mask))
    return out


def train_step(vision, align, text, shared_ln, log_tau, optimizer,
               pixel_values, text_batches):
    """One reference train step (SURVEY.md §3.1 hot loop), single rank."""
    optimizer.zero_grad(set_to_none=True)
    with torch.no_grad():  # frozen tower (radzero.yaml:50)
        tokens = vision(pixel_values).last_hidden_state
    for layer in align:
        out = layer(tokens)
        tokens = out[0] if isinstance(out, tuple) else out

    # per-image ragged MPNet forwards (losses.py:135-147)
    queries, group = [], []
    for img_idx, (ids, mask) in enumerate(text_batches):
        hidden = text(input_ids=ids, attention_mask=mask).last_hidden_state
        m = mask.unsqueeze(-1).float()
        queries.append((hidden * m).sum(1) / m.sum(1))
        group.extend([img_idx] * ids.shape[0])
    query = torch.cat(queries, 0)                        # (S, 768)
    group = torch.tensor(group)

    # VL-CABS (losses.py:187-240) + MP-NCE (losses.py:243-344)
    tau = log_tau.exp()
    tok = shared_ln(tokens)
    q = shared_ln(query)
    qn = F.normalize(q, dim=-1)
    tn = F.normalize(tok, dim=-1)
    scores = torch.einsum("nd,bld->bnl", qn, tn) / tau
    attn = scores.softmax(-1)
    agg = torch.einsum("bnl,bld->bnd", attn, tn)
    logits = torch.einsum(
        "bnd,bnd->bn", F.normalize(agg, dim=-1), qn.unsqueeze(0).expand_as(agg)
    ) / tau                                              # (B, S)
    pos = (group.unsqueeze(0) == torch.arange(logits.shape[0]).unsqueeze(1)).float()
    row = -(logits.log_softmax(0).T * pos.T).sum(1).mean()
    col = -((logits.log_softmax(1) * pos).sum(1) / pos.sum(1)).mean()
    loss = (row + col) / 2
    loss.backward()
    optimizer.step()
    return loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--spi", type=int, default=8,
                    help="sentences per image (the flagship static packing)")
    args = ap.parse_args()
    torch.manual_seed(0)

    vision, align, text, shared_ln = build_reference_stack()
    vision.eval()
    align.train()
    text.train()
    shared_ln.train()
    for p in vision.parameters():
        p.requires_grad_(False)
    log_tau = torch.nn.Parameter(torch.tensor(float(np.log(0.07))))
    trainable = (
        list(align.parameters()) + list(text.parameters())
        + list(shared_ln.parameters()) + [log_tau]
    )
    optimizer = torch.optim.AdamW(trainable, lr=1e-4, weight_decay=0.05)

    rng = np.random.default_rng(0)
    pv = torch.from_numpy(
        rng.standard_normal((args.batch, 3, 518, 518)).astype(np.float32)
    )
    text_batches = ragged_text_batches(args.batch, args.spi, rng)

    train_step(vision, align, text, shared_ln, log_tau, optimizer, pv, text_batches)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        loss = train_step(
            vision, align, text, shared_ln, log_tau, optimizer, pv, text_batches
        )
    dt = time.perf_counter() - t0
    float(loss)

    # ---- analytic train FLOPs per sample ----
    f_img_fwd = flops_per_image(align_layers=0)          # frozen tower, x1
    grid2 = (518 // 14) ** 2 + 1
    f_align = 3 * vit_flops(grid2, 768, 2)               # trainable, x3
    f_text = 0.0
    for ids, _ in text_batches:
        f_text += 3 * vit_flops(ids.shape[1], 768, 12) * ids.shape[0]
    f_text /= args.batch                                  # per image
    f_sample = f_img_fwd + f_align + f_text

    achieved = f_sample * args.batch * args.iters / dt
    peak = measure_peak_gemm()
    util = achieved / peak

    print(json.dumps({
        "host_seconds_per_step": round(dt / args.iters, 3),
        "train_flops_per_sample": f_sample,
        "flops_split": {
            "frozen_tower_fwd": f_img_fwd,
            "align_fwd_bwd": f_align,
            "text_fwd_bwd_per_image": f_text,
        },
        "host_achieved_gflops": round(achieved / 1e9, 2),
        "host_peak_gemm_gflops": round(peak / 1e9, 2),
        "eager_train_utilization": round(util, 4),
        "a100_bf16_upper_bound_samples_per_sec": round(A100_BF16_PEAK / f_sample, 1),
        "a100_bf16_estimated_samples_per_sec": round(
            util * A100_BF16_PEAK / f_sample, 1
        ),
        "a100_fp32_upper_bound_samples_per_sec": round(A100_FP32_PEAK / f_sample, 1),
        "note": "bf16 estimate is optimistic for the A100 (eager overhead "
                "weighs more against tensor-core GEMMs; DDP all-reduce "
                "excluded) — i.e. a conservative baseline for vs_baseline",
    }, indent=1))


if __name__ == "__main__":
    main()
