"""Dice threshold-sweep A/B vs an independent torch oracle.

torchmetrics cannot be installed in this environment, so the oracle
re-implements ``torchmetrics.segmentation.DiceScore(num_classes=1)``
(v1.6.1, the reference pin) micro-average math independently in torch:
per update, numerator = 2*(pred*target).sum() and denominator =
pred.sum() + target.sum() pooled over every dim; compute = num/denom.
The sweep mirrors segmentation_utils.py:254-268 exactly: thresholds
np.arange(0, 1.01, 0.01), positives only, strict ``>`` keeps the FIRST
maximal threshold.
"""

import numpy as np
import torch

from radzero_tpu.eval.metrics import best_threshold_dice, compute_specificity, micro_dice


def _oracle_dice(preds: torch.Tensor, target: torch.Tensor) -> float:
    num = 2.0 * (preds * target).sum()
    denom = preds.sum() + target.sum()
    return float(num / denom) if denom > 0 else 0.0


def _oracle_sweep(pos_probs: torch.Tensor, pos_masks: torch.Tensor):
    best_dice, best_t = 0.0, 0.0
    for t in np.arange(0, 1.01, 0.01):
        d = _oracle_dice((pos_probs > t).long(), pos_masks)
        if d > best_dice:
            best_dice, best_t = d, float(t)
    return best_dice, best_t


def test_micro_dice_matches_torch_oracle():
    rng = np.random.default_rng(0)
    probs = rng.random((6, 16, 16)).astype(np.float32)
    masks = (rng.random((6, 16, 16)) > 0.7).astype(np.int64)
    for t in (0.2, 0.5, 0.8):
        ours = micro_dice((probs > t).astype(np.int64), masks)
        ref = _oracle_dice(torch.from_numpy((probs > t).astype(np.int64)),
                           torch.from_numpy(masks))
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)


def test_best_threshold_sweep_matches_torch_oracle():
    rng = np.random.default_rng(1)
    # structured maps so the sweep has a clear interior optimum
    masks = np.zeros((5, 24, 24), np.int64)
    probs = rng.random((5, 24, 24)).astype(np.float32) * 0.4
    for i in range(5):
        masks[i, 4 + i : 14 + i, 6:18] = 1
        probs[i, 4 + i : 14 + i, 6:18] += 0.5 + 0.02 * i
    ours_d, ours_t = best_threshold_dice(probs, masks)
    ref_d, ref_t = _oracle_sweep(torch.from_numpy(probs), torch.from_numpy(masks))
    np.testing.assert_allclose(ours_d, ref_d, rtol=1e-5, atol=1e-7)
    assert abs(ours_t - ref_t) < 1e-9


def test_specificity_matches_reference_formula():
    """compute_specificity (segmentation_utils.py:136-158): fraction of
    negative images whose thresholded map is entirely empty."""
    rng = np.random.default_rng(2)
    neg = rng.random((8, 10, 10)).astype(np.float32) * 0.6
    t = 0.55
    ours = compute_specificity(neg, t)
    ref = float(np.mean([(neg[i] > t).sum() == 0 for i in range(8)]))
    np.testing.assert_allclose(ours, ref)


def test_streaming_metrics_match_materializing_path():
    """StreamingSegmentationMetrics must equal the batch computation
    exactly (dice/threshold/specificity/image-AUC) and approximate pixel
    AUROC to ~1/bins."""
    from sklearn.metrics import roc_auc_score

    from radzero_tpu.eval.metrics import StreamingSegmentationMetrics, pixel_auroc

    rng = np.random.default_rng(3)
    probs, masks, logits = [], [], []
    for i in range(10):
        h, w = 30 + i, 25 + i
        m = np.zeros((h, w), np.int64)
        if i % 3 != 0:  # mix of positives and negatives
            m[5 : 5 + i + 2, 4 : 4 + i + 3] = 1
        p = rng.random((h, w)).astype(np.float32) * 0.5 + 0.25 * m
        probs.append(p)
        masks.append(m)
        logits.append(float(rng.standard_normal()))

    # materializing reference
    pos_p = np.concatenate([p.ravel() for p, m in zip(probs, masks) if m.sum() > 0])
    pos_m = np.concatenate([m.ravel() for m in masks if m.sum() > 0])
    ref_dice, ref_t = best_threshold_dice(pos_p, pos_m)
    negs = [p for p, m in zip(probs, masks) if m.sum() == 0]
    ref_spec = float(np.mean([(p > ref_t).sum() == 0 for p in negs]))
    labels = [int(m.sum() > 0) for m in masks]
    ref_auc = float(roc_auc_score(labels, logits))
    ref_px = pixel_auroc(
        np.concatenate([p.ravel() for p in probs]),
        np.concatenate([m.ravel() for m in masks]),
    )

    acc = StreamingSegmentationMetrics()
    for lg, p, m in zip(logits, probs, masks):
        acc.update(lg, p, m)
    out = acc.finalize(compute_pixel_level_auroc=True)

    np.testing.assert_allclose(out["dice"], ref_dice, rtol=0, atol=1e-12)
    assert out["best_threshold"] == ref_t
    np.testing.assert_allclose(out["specificity"], ref_spec)
    np.testing.assert_allclose(out["auc"], ref_auc)
    np.testing.assert_allclose(out["pixel_level_auroc_streaming"], ref_px, atol=2e-3)
