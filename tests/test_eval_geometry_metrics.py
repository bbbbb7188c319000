"""Eval geometry + metric parity tests vs torch/reference semantics."""

import numpy as np
import torch
import torch.nn.functional as F

from radzero_tpu.eval.geometry import (
    grounding_point,
    is_point_in_bbox,
    upsample_similarity_map,
)
from radzero_tpu.eval.metrics import (
    best_threshold_dice,
    compute_specificity,
    long_tail_multi_label_split,
    micro_dice,
    rle2mask,
)


def _torch_resize_inverse(scores_flat, hw, mode):
    """Torch oracle mirroring segmentation_utils.py:36-122."""
    h, w = hw
    g = int(len(scores_flat) ** 0.5)
    s = torch.from_numpy(scores_flat).view(1, 1, g, g)

    if mode == "resize":
        return F.interpolate(s, size=(h, w), mode="bilinear", align_corners=False)[0, 0].numpy()
    if mode == "aspect_pad":
        p = max(h, w)
        up = F.interpolate(s, size=(p, p), mode="bilinear", align_corners=False)
        top, left = (p - h) // 2, (p - w) // 2
        return up[0, 0, top : top + h, left : left + w].numpy()
    if mode == "center_crop":
        short = min(h, w)
        up = F.interpolate(s, size=(short, short), mode="bilinear", align_corners=False)
        out = torch.ones(h, w) * -999
        top, left = (h - short) // 2, (w - short) // 2
        out[top : top + short, left : left + short] = up[0, 0]
        return out.numpy()
    if mode == "m3ae":
        p = max(h, w)
        cropped = int(p * 224 / 256)
        up = F.interpolate(s, size=(cropped, cropped), mode="bilinear", align_corners=False)
        canvas = torch.ones(p, p) * -999
        off = (p - cropped) // 2
        canvas[off : off + cropped, off : off + cropped] = up[0, 0]
        top, left = (p - h) // 2, (p - w) // 2
        return canvas[top : top + h, left : left + w].numpy()
    raise ValueError(mode)


def test_upsample_matches_torch_all_geometries():
    rng = np.random.default_rng(0)
    scores = rng.standard_normal(37 * 37).astype(np.float32)
    for hw in [(300, 220), (220, 300), (256, 256)]:
        for mode in ["resize", "aspect_pad", "center_crop", "m3ae"]:
            ref = _torch_resize_inverse(scores, hw, mode)
            ours = upsample_similarity_map(scores, hw, mode)
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4), (hw, mode)


def test_grounding_point_matches_argmax_of_torch_map():
    rng = np.random.default_rng(1)
    scores = rng.standard_normal(37 * 37).astype(np.float32)
    hw = (200, 160)
    for mode in ["resize", "aspect_pad", "center_crop", "m3ae"]:
        ref_map = _torch_resize_inverse(scores, hw, mode)
        ry, rx = np.unravel_index(ref_map.argmax(), hw)
        x, y = grounding_point(scores, hw, mode)
        assert (x, y) == (int(rx), int(ry)), mode


def test_is_point_in_bbox():
    assert is_point_in_bbox([[0, 0, 10, 10]], (5, 5))
    assert not is_point_in_bbox([[0, 0, 10, 10]], (11, 5))
    assert is_point_in_bbox([[0, 0, 2, 2], [5, 5, 9, 9]], (7, 6))


def test_rle2mask_roundtrip():
    # relative-start RLE over column-major ordering, transposed out
    mask = rle2mask("3 2 5 1", 4, 4)
    flat = np.zeros(16)
    flat[3:5] = 1   # start at +3, run 2
    flat[10:11] = 1 # then +5 after run end (5+5=10), run 1
    np.testing.assert_array_equal(mask, flat.reshape(4, 4).T)


def test_micro_dice_and_threshold_sweep():
    probs = np.array([[[0.9, 0.2], [0.4, 0.8]]])
    masks = np.array([[[1, 0], [0, 1]]])
    # at t=0.5: pred == mask exactly -> dice 1
    assert micro_dice((probs > 0.5).astype(int), masks) == 1.0
    best, t = best_threshold_dice(probs, masks)
    assert best == 1.0 and 0.4 <= t <= 0.8


def test_specificity():
    negs = np.array([[[0.1, 0.2]], [[0.9, 0.1]]])
    assert compute_specificity(negs, 0.5) == 0.5
    assert compute_specificity(negs, 0.95) == 1.0


def test_long_tail_split():
    y = np.zeros((100, 4), np.int64)
    y[:80, 0] = 1   # head
    y[:30, 1] = 1   # medium
    y[:5, 2] = 1    # tail (<=10)
    y[:2, 3] = 1    # tail
    head, medium, tail = long_tail_multi_label_split(y)
    # 65th percentile of [80,30,5,2] = 28.75 -> head {80,30}; tail <= 10 positives
    assert list(head) == [0, 1]
    assert list(medium) == []
    assert list(tail) == [2, 3]

    y2 = np.zeros((100, 4), np.int64)
    y2[:80, 0] = 1
    y2[:15, 1] = 1
    y2[:12, 2] = 1
    y2[:2, 3] = 1
    # 65th percentile of [80,15,12,2] = 14.85 -> head {80,15}, medium {12}, tail {2}
    head2, medium2, tail2 = long_tail_multi_label_split(y2)
    assert list(head2) == [0, 1]
    assert list(medium2) == [2]
    assert list(tail2) == [3]


def test_precision_recall_bacc_prims():
    from radzero_tpu.eval.metrics import (
        eval_bacc,
        eval_precision,
        eval_recall,
        eval_sensitivity_specificity,
    )

    gt = np.array([[1, 0], [1, 1], [0, 0], [0, 1]])
    scores = np.array([[0.9, -0.2], [0.8, 0.7], [-0.5, -0.1], [0.2, 0.3]])
    # predictions by sign: col0 -> [1,1,0,1], col1 -> [0,1,0,1]
    mAP, prec = eval_precision(scores, gt)
    np.testing.assert_allclose(prec, [2 / 3, 1.0])
    mAR, rec = eval_recall(scores, gt)
    np.testing.assert_allclose(rec, [1.0, 1.0])
    y_pred = (scores > 0).astype(int)
    acc, per = eval_bacc(y_pred, gt)
    # col0: tpr=1, tnr=0.5 -> .75; col1: tpr=1, tnr=1 -> 1
    np.testing.assert_allclose(per, [0.75, 1.0])
    sen, spe = eval_sensitivity_specificity(y_pred, gt)
    assert sen == 1.0 and spe == 0.75
