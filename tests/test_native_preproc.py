"""Native C++ preprocessing library: build, parity, and speed sanity."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from radzero_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler)"
)


def test_resize_bicubic_matches_torch_semantics():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (60, 45, 3), dtype=np.uint8)
    out = native.resize_u8(img, 120, 90, "bicubic")

    ref = F.interpolate(
        torch.from_numpy(img.transpose(2, 0, 1)[None].astype(np.float32)),
        size=(120, 90), mode="bicubic", align_corners=False,
    )[0].numpy().transpose(1, 2, 0)
    ref_u8 = np.clip(np.floor(ref + 0.5), 0, 255).astype(np.uint8)
    # rounding at the .5 boundary may differ by 1 lsb
    assert np.abs(out.astype(int) - ref_u8.astype(int)).max() <= 1


def test_resize_bilinear_matches_torch_semantics():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (33, 50, 1), dtype=np.uint8)
    out = native.resize_u8(img, 66, 100, "bilinear")
    ref = F.interpolate(
        torch.from_numpy(img.transpose(2, 0, 1)[None].astype(np.float32)),
        size=(66, 100), mode="bilinear", align_corners=False,
    )[0].numpy().transpose(1, 2, 0)
    assert np.abs(out.astype(float) - ref).max() <= 1.0


def test_normalize_matches_numpy():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    mean, std = (0.5, 0.4, 0.3), (0.2, 0.25, 0.3)
    out = native.normalize(img, mean, std)
    ref = (img.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_fused_resize_normalize_matches_two_stage():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (70, 55, 3), dtype=np.uint8)
    mean, std = (0.48, 0.45, 0.41), (0.27, 0.26, 0.28)
    fused = native.resize_normalize(img, 56, 56, mean, std, "bicubic")
    two_stage = native.normalize(native.resize_u8(img, 56, 56, "bicubic"), mean, std)
    np.testing.assert_allclose(fused, two_stage, rtol=1e-5, atol=1e-5)


def test_minmax_matches_cv2():
    import cv2

    rng = np.random.default_rng(4)
    img = rng.integers(40, 200, (30, 30), dtype=np.uint8)
    out = native.minmax_normalize(img)
    ref = cv2.normalize(img, None, 0, 255, norm_type=cv2.NORM_MINMAX, dtype=cv2.CV_8U)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_jpeg_decode_matches_pil():
    import io
    from PIL import Image

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (60, 50, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    data = buf.getvalue()

    ours = native.decode_jpeg(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert ours.shape == ref.shape
    # decoders may differ by small IDCT rounding
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def test_fused_jpeg_pipeline_matches_stages():
    import io
    from PIL import Image

    rng = np.random.default_rng(6)
    arr = rng.integers(0, 256, (90, 70, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    data = buf.getvalue()

    mean, std = (0.48, 0.45, 0.41), (0.27, 0.26, 0.28)
    fused = native.decode_resize_normalize(data, 56, 56, mean, std)
    staged = native.normalize(
        native.resize_u8(native.decode_jpeg(data), 56, 56, "bicubic"), mean, std
    )
    np.testing.assert_allclose(fused, staged, rtol=1e-5, atol=1e-5)


def test_native_jpeg_loader(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(7)
    p = tmp_path / "x.jpg"
    Image.fromarray(rng.integers(0, 256, (80, 60, 3), dtype=np.uint8)).save(p, quality=95)
    loader = native.native_jpeg_loader(28, (0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    out = loader({"image": str(p)})
    assert out.shape == (28, 28, 3) and out.dtype == np.float32
