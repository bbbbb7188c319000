"""Image-processor parity vs HF BlipImageProcessor (the reference's
XrayDINOv2 path, processing.py:90-91) and behavior tests for the rest."""

import numpy as np
from PIL import Image

from radzero_tpu.data.processing import (
    AspectRatioImageProcessor,
    BitStyleImageProcessor,
    BlipStyleImageProcessor,
    M3AEImageProcessor,
    aspect_resize_pad,
)


def _rand_image(rng, h=300, w=240):
    return Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))


def test_blip_style_matches_hf_blip_processor():
    from transformers import BlipImageProcessor

    rng = np.random.default_rng(0)
    img = _rand_image(rng)

    hf = BlipImageProcessor(
        do_resize=True,
        size={"height": 112, "width": 112},
        do_rescale=True,
        do_normalize=True,
        do_convert_rgb=True,
    )
    ref = np.asarray(hf(img, return_tensors="np")["pixel_values"])  # (1,3,112,112)

    ours = BlipStyleImageProcessor(size=112)(img)["pixel_values"]  # (1,112,112,3)
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5)


def test_aspect_ratio_pads_to_square_before_resize():
    rng = np.random.default_rng(1)
    img = _rand_image(rng, h=100, w=50)
    out = AspectRatioImageProcessor(size=56)(img)["pixel_values"]
    assert out.shape == (1, 56, 56, 3)
    # padded region (left/right quarter columns) should be the normalized zero value
    zero_val = (0.0 - np.asarray(BlipStyleImageProcessor().mean)) / np.asarray(
        BlipStyleImageProcessor().std
    )
    np.testing.assert_allclose(out[0, :, 0, :], np.tile(zero_val, (56, 1)), atol=0.15)


def test_bit_style_center_crop_shape():
    rng = np.random.default_rng(2)
    out = BitStyleImageProcessor(size=64)(_rand_image(rng, 130, 90))["pixel_values"]
    assert out.shape == (1, 64, 64, 3)


def test_m3ae_processor_shapes_and_padding():
    rng = np.random.default_rng(3)
    img = _rand_image(rng, 120, 80)
    out = M3AEImageProcessor()(img)["pixel_values"]
    assert out.shape == (1, 224, 224, 3)

    arr = np.asarray(img.convert("L"))
    padded = aspect_resize_pad(arr, 256)
    assert padded.shape == (256, 256)
    # width was the short side -> zero pad columns at both edges
    assert padded[:, 0].max() == 0 and padded[:, -1].max() == 0


def test_m3ae_aspect_resize_matches_cv2_reference_semantics():
    """resize long side to scale with INTER_AREA then centered zero pad
    (ref processing.py:182-228)."""
    import cv2

    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (100, 60), dtype=np.uint8)
    out = aspect_resize_pad(arr, 80)
    ref_resized = cv2.resize(arr, (48, 80), interpolation=cv2.INTER_AREA)
    pad = 80 - 48
    left = pad // 2
    np.testing.assert_array_equal(out[:, left : left + 48], ref_resized)
