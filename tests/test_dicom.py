"""DICOM reader tests against hand-crafted Part-10 files.

pydicom is not in this environment, so the files are assembled byte-by-
byte per the DICOM encoding rules (PS3.5) — an independent oracle for
the built-in parser — and the display semantics are checked against the
reference reader's contract (segmentation_utils.py:125-133:
convertScaleAbs to uint8 + MONOCHROME1 bitwise inversion).
"""

import io
import struct

import numpy as np
import pytest
from PIL import Image

from radzero_tpu.data.dicom import load_eval_image, read_from_dicom
from radzero_tpu.data.dicom_parse import dicom_read

_EXPLICIT_LE = "1.2.840.10008.1.2.1"
_IMPLICIT_LE = "1.2.840.10008.1.2"
_JPEG_BASELINE = "1.2.840.10008.1.2.4.50"

_LONG_VRS = {b"OB", b"OW", b"SQ", b"UN", b"UT"}


def _el_explicit(group, elem, vr, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00"
    head = struct.pack("<HH", group, elem) + vr
    if vr in _LONG_VRS:
        return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + struct.pack("<H", len(value)) + value


def _el_implicit(group, elem, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00"
    return struct.pack("<HHI", group, elem, len(value)) + value


def _meta(transfer_syntax: str) -> bytes:
    ts = transfer_syntax.encode()
    meta_body = _el_explicit(0x0002, 0x0010, b"UI", ts)
    group_len = _el_explicit(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body)))
    return b"\x00" * 128 + b"DICM" + group_len + meta_body


def _us(v):
    return struct.pack("<H", v)


def _make_dicom(pixels: np.ndarray, photometric: str, transfer_syntax: str,
                jpeg_bytes: bytes = None, n_frames: int = None) -> bytes:
    rows, cols = pixels.shape[:2]
    bits = pixels.dtype.itemsize * 8
    explicit = transfer_syntax != _IMPLICIT_LE
    el = (lambda g, e, vr, v: _el_explicit(g, e, vr, v)) if explicit else (
        lambda g, e, vr, v: _el_implicit(g, e, v)
    )
    body = b""
    # an element the parser must skip (PatientName)
    body += el(0x0010, 0x0010, b"PN", b"ANON")
    # a defined-length SQ to skip
    sq_item = struct.pack("<HHI", 0xFFFE, 0xE000, 4) + b"\x00" * 4
    body += el(0x0008, 0x1140, b"SQ", sq_item)
    body += el(0x0028, 0x0002, b"US", _us(1))
    body += el(0x0028, 0x0004, b"CS", photometric.encode())
    if n_frames is not None:
        nf = str(n_frames).encode()
        body += el(0x0028, 0x0008, b"IS", nf + (b" " if len(nf) % 2 else b""))
    body += el(0x0028, 0x0010, b"US", _us(rows))
    body += el(0x0028, 0x0011, b"US", _us(cols))
    body += el(0x0028, 0x0100, b"US", _us(bits))
    body += el(0x0028, 0x0103, b"US", _us(0))
    if jpeg_bytes is not None:
        # encapsulated: undefined length + offset table + fragment(s)
        frag_list = jpeg_bytes if isinstance(jpeg_bytes, list) else [jpeg_bytes]
        px = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" + struct.pack("<I", 0xFFFFFFFF)
        px += struct.pack("<HHI", 0xFFFE, 0xE000, 0)  # empty offset table
        for fb in frag_list:
            frag = fb + (b"\x00" if len(fb) % 2 else b"")
            px += struct.pack("<HHI", 0xFFFE, 0xE000, len(frag)) + frag
        px += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
        body += px
    else:
        raw = pixels.astype("<u2" if bits == 16 else "u1").tobytes()
        body += el(0x7FE0, 0x0010, b"OW" if bits == 16 else b"OB", raw)
    return _meta(transfer_syntax) + body


def test_parse_explicit_16bit_monochrome1(tmp_path):
    rng = np.random.default_rng(0)
    px = rng.integers(0, 4096, (7, 9)).astype(np.uint16)
    p = tmp_path / "m1.dcm"
    p.write_bytes(_make_dicom(px, "MONOCHROME1", _EXPLICIT_LE))

    arr, attrs = dicom_read(str(p))
    np.testing.assert_array_equal(arr, px)
    assert attrs["PhotometricInterpretation"] == "MONOCHROME1"

    # reference display semantics: convertScaleAbs + inversion
    img = np.asarray(read_from_dicom(str(p)))
    expect = np.clip(np.round(px * (255.0 / px.max())), 0, 255).astype(np.uint8)
    expect = 255 - expect
    np.testing.assert_array_equal(img[..., 0], expect)
    assert img.shape == (7, 9, 3)


def test_parse_implicit_8bit_monochrome2(tmp_path):
    rng = np.random.default_rng(1)
    px = rng.integers(0, 200, (5, 6)).astype(np.uint8)
    p = tmp_path / "m2.dcm"
    p.write_bytes(_make_dicom(px, "MONOCHROME2", _IMPLICIT_LE))

    arr, attrs = dicom_read(str(p))
    np.testing.assert_array_equal(arr, px)

    img = np.asarray(load_eval_image(str(p)))  # .dcm dispatch
    expect = np.clip(np.round(px * (255.0 / px.max())), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(img[..., 0], expect)


def test_parse_jpeg_baseline_encapsulated(tmp_path):
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (32, 40)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(px, "L").save(buf, "JPEG", quality=95)
    p = tmp_path / "jb.dcm"
    p.write_bytes(_make_dicom(px, "MONOCHROME2", _JPEG_BASELINE, jpeg_bytes=buf.getvalue()))

    arr, attrs = dicom_read(str(p))
    assert arr.shape == (32, 40)
    # lossy codec: close, not exact
    assert np.abs(arr.astype(int) - px.astype(int)).mean() < 4.0


def test_unsupported_transfer_syntax_raises(tmp_path):
    px = np.zeros((2, 2), np.uint8)
    p = tmp_path / "bad.dcm"
    # JPEG-LS: genuinely unsupported; the error must name the escape hatch
    p.write_bytes(_make_dicom(px, "MONOCHROME2", "1.2.840.10008.1.2.4.80"))
    with pytest.raises(NotImplementedError, match="pydicom"):
        dicom_read(str(p))


def test_parse_jpeg2000_encapsulated_16bit(tmp_path):
    """J2K lossless (the wild-format for SIIM/RSNA DICOMs): raw
    codestream fragment, 16-bit, decoded bit-exactly via OpenJPEG."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 4096, (24, 30)).astype(np.uint16)
    im = Image.fromarray(px.astype(np.int32), "I").convert("I;16")
    buf = io.BytesIO()
    im.save(buf, "JPEG2000", irreversible=False, no_jp2=True)
    assert buf.getvalue()[:4] == b"\xff\x4f\xff\x51"  # raw codestream
    p = tmp_path / "j2k.dcm"
    p.write_bytes(_make_dicom(px, "MONOCHROME2", "1.2.840.10008.1.2.4.90",
                              jpeg_bytes=buf.getvalue()))
    arr, attrs = dicom_read(str(p))
    np.testing.assert_array_equal(arr, px)  # reversible 5/3 wavelet: exact


def _packbits_encode(data: bytes) -> bytes:
    """All-literal PackBits encoding (valid, if not maximally compact)."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i : i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def test_parse_rle_encapsulated_16bit(tmp_path):
    """RLE Lossless (PS3.5 Annex G): MSB/LSB byte planes, PackBits."""
    rng = np.random.default_rng(6)
    px = rng.integers(0, 65536, (12, 18)).astype(np.uint16)
    msb = (px >> 8).astype(np.uint8).tobytes()
    lsb = (px & 0xFF).astype(np.uint8).tobytes()
    segs = [_packbits_encode(msb), _packbits_encode(lsb)]
    offsets = [64, 64 + len(segs[0])]
    header = struct.pack("<16I", 2, *offsets, *([0] * 13))
    frag = header + segs[0] + segs[1]
    p = tmp_path / "rle.dcm"
    p.write_bytes(_make_dicom(px, "MONOCHROME2", "1.2.840.10008.1.2.5",
                              jpeg_bytes=frag))
    arr, attrs = dicom_read(str(p))
    np.testing.assert_array_equal(arr, px)


def test_multiframe_number_of_frames_raises(tmp_path):
    """(0028,0008) NumberOfFrames > 1 must fail loudly on every syntax
    — fragment counting can't see multi-frame JPEG (codestreams may span
    fragments), so the tag is the authoritative guard."""
    import pytest

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (6, 6)).astype(np.uint8)
    p = tmp_path / "mf.dcm"
    p.write_bytes(_make_dicom(px, "MONOCHROME2", _EXPLICIT_LE, n_frames=3))
    with pytest.raises(NotImplementedError, match="NumberOfFrames=3"):
        dicom_read(str(p))
    # NumberOfFrames=1 explicitly present is fine
    p1 = tmp_path / "sf.dcm"
    p1.write_bytes(_make_dicom(px, "MONOCHROME2", _EXPLICIT_LE, n_frames=1))
    arr, _ = dicom_read(str(p1))
    np.testing.assert_array_equal(arr, px)


def test_multiframe_rle_raises(tmp_path):
    """RLE mandates one fragment per frame (PS3.5 G.2): a 2-fragment
    file is multi-frame and must fail loudly, not return frame 0."""
    import pytest

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (4, 6)).astype(np.uint8)
    seg = _packbits_encode(px.tobytes())
    header = struct.pack("<16I", 1, 64, *([0] * 14))
    frag = header + seg
    p = tmp_path / "rle_mf.dcm"
    p.write_bytes(_make_dicom(px, "MONOCHROME2", "1.2.840.10008.1.2.5",
                              jpeg_bytes=[frag, frag]))
    with pytest.raises(NotImplementedError, match="multi-frame RLE"):
        dicom_read(str(p))
