"""Metric primitives for zero-shot evaluation.

Torch-free reimplementation of the metric math the reference imports
from its vendored CARZero copy (external/CARZero/utils.py:19-199):
AUROC variants, micro/macro AUPRC, F1, long-tail class splits — plus
micro-average Dice (the torchmetrics ``DiceScore(num_classes=1)``
default the reference uses, segmentation_utils.py:254-268) and
image-level specificity (segmentation_utils.py:136-158).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from sklearn.metrics import (
    auc,
    f1_score,
    precision_recall_curve,
    roc_auc_score,
)


def eval_auc(results: np.ndarray, gt_labels: np.ndarray):
    """(macro, micro, weighted, per-class) AUROC (ref utils.py:151-156)."""
    macro = roc_auc_score(gt_labels, results, average="macro")
    micro = roc_auc_score(gt_labels, results, average="micro")
    weighted = roc_auc_score(gt_labels, results, average="weighted")
    per = roc_auc_score(gt_labels, results, average=None)
    return macro, micro, weighted, per


def eval_f1(y_pred: np.ndarray, gt_labels: np.ndarray):
    micro = f1_score(gt_labels, y_pred, average="micro")
    macro = f1_score(gt_labels, y_pred, average="macro")
    weighted = f1_score(gt_labels, y_pred, average="weighted")
    return micro, macro, weighted


def calculate_micro_macro_auprc(y_true: np.ndarray, y_scores: np.ndarray) -> Tuple[float, float]:
    """Micro + macro AUPRC over multi-label arrays (ref utils.py:19-47)."""
    n_labels = y_true.shape[1]
    per = []
    for i in range(n_labels):
        precision, recall, _ = precision_recall_curve(y_true[:, i], y_scores[:, i])
        per.append(auc(recall, precision))
    macro_auprc = float(np.mean(per))

    precision, recall, _ = precision_recall_curve(y_true.ravel(), y_scores.ravel())
    micro_auprc = float(auc(recall, precision))
    return micro_auprc, macro_auprc


def long_tail_multi_label_split(y_true: np.ndarray):
    """head/medium/tail class indices: head > 65th-percentile frequency,
    tail <= 10 positives (ref utils.py:184-199)."""
    class_freq = np.sum(y_true, axis=0)
    head_thr = np.percentile(class_freq, 65)
    medium_thr = 10
    head = np.where(class_freq > head_thr)[0]
    medium = np.where((class_freq <= head_thr) & (class_freq > medium_thr))[0]
    tail = np.where(class_freq <= medium_thr)[0]
    return head, medium, tail


def micro_dice(pred: np.ndarray, target: np.ndarray, eps: float = 1e-12) -> float:
    """Micro-average Dice over the pooled batch: 2|P∩T| / (|P|+|T|)
    (torchmetrics segmentation.DiceScore(num_classes=1) default,
    the reference's dice primitive: segmentation_utils.py:256-258)."""
    pred = pred.astype(np.float64)
    target = target.astype(np.float64)
    inter = float((pred * target).sum())
    denom = float(pred.sum() + target.sum())
    if denom == 0:
        return 0.0
    return 2.0 * inter / denom


def best_threshold_dice(
    positive_probs: np.ndarray, positive_masks: np.ndarray, thresholds=None
) -> Tuple[float, float]:
    """Threshold sweep 0..1 step .01 maximising Dice over positives
    (ref segmentation_utils.py:254-268)."""
    thresholds = thresholds if thresholds is not None else np.arange(0, 1.01, 0.01)
    best_dice, best_t = 0.0, 0.0
    for t in thresholds:
        d = micro_dice((positive_probs > t).astype(np.int64), positive_masks)
        if d > best_dice:
            best_dice, best_t = d, float(t)
    return best_dice, best_t


def compute_specificity(negative_probs: np.ndarray, threshold: float) -> float:
    """Fraction of negative images with NO pixel above threshold
    (ref segmentation_utils.py:136-158)."""
    flat = negative_probs.reshape(len(negative_probs), -1)
    true_neg = ((flat > threshold).sum(axis=1) == 0).sum()
    return float(true_neg / len(negative_probs))


def pixel_auroc(all_probs: np.ndarray, all_masks: np.ndarray) -> float:
    return float(roc_auc_score(all_masks.ravel().astype(np.int64), all_probs.ravel()))


def eval_precision(results: np.ndarray, gt_labels: np.ndarray):
    """Per-class precision of sign predictions + mAP (ref utils.py:103-111)."""
    y_pred = np.asarray(results) > 0
    tp = gt_labels * y_pred
    fp = (1 - gt_labels) * y_pred
    under = np.sum(tp + fp, axis=0)
    under = np.where(under == 0, 1, under)
    precision = np.sum(tp, axis=0) / under
    return float(np.mean(precision)), precision


def eval_recall(results: np.ndarray, gt_labels: np.ndarray):
    """Per-class recall + mAR (ref utils.py:114-120)."""
    y_pred = np.asarray(results) > 0
    tp = gt_labels * y_pred
    fn = gt_labels * (1 - y_pred)
    recall = np.sum(tp, axis=0) / np.sum(tp + fn, axis=0)
    return float(np.mean(recall)), recall


def eval_bacc(y_pred: np.ndarray, gt_labels: np.ndarray):
    """Balanced accuracy (tpr+tnr)/2 per class + mean (ref utils.py:125-135)."""
    tp = gt_labels * y_pred
    tn = (1 - gt_labels) * (1 - y_pred)
    fp = (1 - gt_labels) * y_pred
    fn = gt_labels * (1 - y_pred)
    tpr = np.sum(tp, axis=0) / np.sum(tp + fn, axis=0)
    tnr = np.sum(tn, axis=0) / np.sum(fp + tn, axis=0)
    per_class = (tpr + tnr) / 2
    return float(np.mean(per_class)), per_class


def eval_sensitivity_specificity(y_pred: np.ndarray, gt_labels: np.ndarray):
    """Mean sensitivity and specificity over classes (ref utils.py:138-148)."""
    tp = gt_labels * y_pred
    tn = (1 - gt_labels) * (1 - y_pred)
    fp = (1 - gt_labels) * y_pred
    fn = gt_labels * (1 - y_pred)
    sen = float(np.mean(np.sum(tp, axis=0) / np.sum(tp + fn, axis=0)))
    spe = float(np.mean(np.sum(tn, axis=0) / np.sum(fp + tn, axis=0)))
    return sen, spe


def rle2mask(rle: str, height: int, width: int) -> np.ndarray:
    """SIIM relative-start RLE -> (height, width) binary mask.

    Column-major decode then transpose (ref segmentation_utils.py:21-33;
    the reference's swapped-argument call at :200 is only consistent for
    the square 1024x1024 SIIM DICOMs — this signature is unambiguous and
    identical to the reference on that data)."""
    mask = np.zeros(width * height)
    array = np.asarray([int(x) for x in rle.split()])
    starts, lengths = array[0::2], array[1::2]
    pos = 0
    for start, length in zip(starts, lengths):
        pos += start
        mask[pos : pos + length] = 1
        pos += length
    return mask.reshape(width, height).T


class StreamingSegmentationMetrics:
    """Single-pass segmentation metrics: maps are consumed one image at a
    time and discarded (the materialising path holds EVERY full-res
    probability map — gigabytes for SIIM/RSNA-sized sets).

    Exactly reproduces the sweep semantics of segmentation_utils.py:
    - best-Dice threshold sweep (0..1 step .01, positives only, first
      max) via per-threshold (TP, pred) count accumulation: a pixel with
      prob p contributes to every threshold t < p, so per-image
      ``searchsorted(grid, p, side='left')`` bincounts + a suffix sum
      yield all 101 counts at once — bit-identical to the naive
      ``(p > t)`` comparisons;
    - specificity from per-negative-image max prob (``(p > t).sum()==0``
      iff ``max(p) <= t``);
    - image-level AUC from the (small) logit/label lists;
    - pixel-level AUROC from fixed-bin histograms (``auroc_bins``,
      default 4096) — a streaming approximation with error O(1/bins),
      flagged in the result as ``pixel_level_auroc_streaming``.
    """

    def __init__(self, auroc_bins: int = 4096):
        self.thresholds = np.arange(0, 1.01, 0.01)
        n = len(self.thresholds)
        self._pos_tp = np.zeros(n, np.int64)
        self._pos_pred = np.zeros(n, np.int64)
        self._pos_target = 0
        self._neg_max: list = []
        self._logits: list = []
        self._labels: list = []
        self._bins = auroc_bins
        edges = np.linspace(0.0, 1.0, auroc_bins + 1)
        self._edges = edges
        self._hist_pos = np.zeros(auroc_bins, np.int64)
        self._hist_neg = np.zeros(auroc_bins, np.int64)

    def _counts_above_thresholds(self, p: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.thresholds, p.ravel(), side="left")
        c = np.bincount(idx, minlength=len(self.thresholds) + 1)
        total = c.sum()
        return (total - np.cumsum(c))[: len(self.thresholds)]

    def update(self, logit: float, prob_map: np.ndarray, mask: np.ndarray) -> None:
        mask = mask.astype(bool)
        positive = bool(mask.sum() > 0)
        self._logits.append(float(logit))
        self._labels.append(int(positive))
        if positive:
            self._pos_pred += self._counts_above_thresholds(prob_map)
            self._pos_tp += self._counts_above_thresholds(prob_map[mask])
            self._pos_target += int(mask.sum())
        else:
            self._neg_max.append(float(prob_map.max()))
        flat = np.clip(prob_map.ravel(), 0.0, 1.0)
        self._hist_pos += np.histogram(flat[mask.ravel()], bins=self._edges)[0]
        self._hist_neg += np.histogram(flat[~mask.ravel()], bins=self._edges)[0]

    def finalize(self, compute_pixel_level_auroc: bool = False) -> dict:
        from sklearn.metrics import roc_auc_score

        result: dict = {}
        result["auc"] = float(
            roc_auc_score(np.asarray(self._labels), np.asarray(self._logits))
        )
        dice = 2.0 * self._pos_tp / np.maximum(
            self._pos_pred + self._pos_target, 1e-12
        )
        best_dice, best_t = 0.0, 0.0
        for t, d in zip(self.thresholds, dice):  # strict >: first max wins
            if d > best_dice:
                best_dice, best_t = float(d), float(t)
        result["dice"] = best_dice
        result["best_threshold"] = best_t
        if self._neg_max:
            result["specificity"] = float(
                np.mean(np.asarray(self._neg_max) <= best_t)
            )
        else:
            result["specificity"] = float("nan")
        if compute_pixel_level_auroc:
            result["pixel_level_auroc_streaming"] = self._hist_auc()
        return result

    def _hist_auc(self) -> float:
        """Mann-Whitney AUC from binned score histograms (ties within a
        bin handled as half-credit)."""
        pos, neg = self._hist_pos.astype(np.float64), self._hist_neg.astype(np.float64)
        n_pos, n_neg = pos.sum(), neg.sum()
        if n_pos == 0 or n_neg == 0:
            return float("nan")
        neg_below = np.concatenate([[0.0], np.cumsum(neg)[:-1]])
        u = np.sum(pos * (neg_below + 0.5 * neg))
        return float(u / (n_pos * n_neg))
