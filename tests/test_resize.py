"""Parity tests: ops/resize vs torch F.interpolate (the reference's primitive)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from radzero_tpu.ops.resize import bicubic_resize_2d, bilinear_resize_2d


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((37, 37), (224, 224)), ((37, 37), (513, 427)), ((16, 16), (37, 37)), ((7, 5), (3, 11))],
)
@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_resize_matches_torch(in_hw, out_hw, mode):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)

    ref = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode=mode, align_corners=False
    ).numpy()

    fn = bilinear_resize_2d if mode == "bilinear" else bicubic_resize_2d
    out = np.asarray(fn(x, *out_hw))

    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=5e-5)


def test_downsample_bilinear_matches_torch_no_antialias():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 1, 64, 64)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(16, 24), mode="bilinear", align_corners=False).numpy()
    out = np.asarray(bilinear_resize_2d(x, 16, 24))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=5e-5)
