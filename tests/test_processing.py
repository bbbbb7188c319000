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


def test_bit_style_matches_hf_bit_processor():
    """Value-level parity vs HF BitImageProcessor configured exactly as
    the reference's adapt_img_size does for biomedclip
    (processing.py:86-88: size.shortest_edge=img_size,
    crop_size=img_size)."""
    from transformers import BitImageProcessor

    rng = np.random.default_rng(5)
    for h, w in ((130, 90), (90, 130), (64, 64), (201, 77)):
        img = _rand_image(rng, h, w)
        hf = BitImageProcessor(
            do_resize=True,
            size={"shortest_edge": 64},
            do_center_crop=True,
            crop_size={"height": 64, "width": 64},
            do_rescale=True,
            do_normalize=True,
            image_mean=list(BitStyleImageProcessor.mean),
            image_std=list(BitStyleImageProcessor.std),
            do_convert_rgb=True,
        )
        ref = np.asarray(hf(img, return_tensors="np")["pixel_values"])  # (1,3,64,64)
        ours = BitStyleImageProcessor(size=64)(img)["pixel_values"]  # (1,64,64,3)
        np.testing.assert_allclose(
            ours.transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5,
            err_msg=f"Bit parity failed for {h}x{w}",
        )


def test_m3ae_matches_reference_transform_semantics():
    """Value-level parity vs a line-faithful numpy/cv2 oracle of the
    reference's M3AEImageProcessor inference path (processing.py:147-178:
    grayscale -> resize_img (:182-228) -> RGB -> CenterCrop(224) ->
    ToTensor -> Normalize(0.4978, 0.2449); torchvision itself is not in
    this environment)."""
    import cv2

    rng = np.random.default_rng(6)
    for h, w in ((300, 240), (240, 300), (256, 256)):
        img = _rand_image(rng, h, w)

        # --- oracle: reference lines, independent of our implementation
        arr = np.array(img.convert("L"), dtype=np.uint8)
        size = arr.shape
        max_ind = size.index(max(size))
        if max_ind == 0:
            desireable = (256, int(float(size[1]) * (256 / float(size[0]))))
        else:
            desireable = (int(float(size[0]) * (256 / float(size[1]))), 256)
        resized = cv2.resize(arr, desireable[::-1], interpolation=cv2.INTER_AREA)
        if max_ind == 0:
            pad = 256 - resized.shape[1]
            pads = [(0, 0), (int(np.floor(pad / 2)), int(np.ceil(pad / 2)))]
        else:
            pad = 256 - resized.shape[0]
            pads = [(int(np.floor(pad / 2)), int(np.ceil(pad / 2))), (0, 0)]
        resized = np.pad(resized, pads, "constant", constant_values=0)
        rgb = np.asarray(Image.fromarray(resized).convert("RGB"))
        # torchvision CenterCrop(224): top = round((256-224)/2) = 16
        top = int(round((256 - 224) / 2.0))
        crop = rgb[top : top + 224, top : top + 224]
        ref = (crop.astype(np.float32) / 255.0 - 0.4978) / 0.2449  # ToTensor+Normalize

        ours = M3AEImageProcessor()(img)["pixel_values"][0]
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6,
                                   err_msg=f"M3AE parity failed for {h}x{w}")


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
