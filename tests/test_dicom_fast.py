"""Golden parity: the native C parser == dicom_lite, field for field.

dicom_lite.parse_dicom_bytes is the reference implementation; every file
the fixture writer can produce (plus hand-built implicit-VR and
sequence-bearing datasets mirroring tests/test_dicom.py's edge cases) must
parse identically through the native path.
"""

import struct

import numpy as np
import pytest

from mrisr_tpu.data import dicom_fast
from mrisr_tpu.data.dicom_lite import (
    IMPLICIT_VR_LE,
    parse_dicom_bytes,
    write_dicom,
)

pytestmark = pytest.mark.skipif(
    not dicom_fast.available(), reason="no C compiler on this machine"
)

_FIELDS = (
    "Modality", "SeriesDescription", "PatientID", "StudyInstanceUID",
    "SeriesInstanceUID", "InstanceNumber", "ImagePositionPatient",
    "ImageOrientationPatient", "PixelSpacing", "RescaleIntercept",
    "RescaleSlope", "Rows", "Columns", "BitsAllocated",
    "PixelRepresentation",
)


def _assert_equal(data: bytes):
    ref = parse_dicom_bytes(data)
    fast = dicom_fast.parse_dicom_bytes_fast(data)
    for name in _FIELDS:
        assert fast.get(name) == ref.get(name), name
    if ref.pixel_array is None:
        assert fast.pixel_array is None
    else:
        np.testing.assert_array_equal(fast.pixel_array, ref.pixel_array)
    assert fast.modality == ref.modality
    assert fast.series_description == ref.series_description
    assert fast.image_position == ref.image_position


def test_writer_roundtrip_parity(tmp_path):
    rng = np.random.RandomState(0)
    p = str(tmp_path / "a.dcm")
    write_dicom(
        p, (rng.rand(16, 12) * 4000).astype(np.uint16), modality="MR",
        series_description="T2 AXIAL PROSTATE", patient_id="Prostate-01",
        series_uid="1.2.840.999.1", instance_number=7,
        image_position=(1.5, -2.25, 33.0),
    )
    with open(p, "rb") as f:
        _assert_equal(f.read())


def _el_implicit(group, elem, value):
    return struct.pack("<HHI", group, elem, len(value)) + value


def test_implicit_vr_parity():
    # raw implicit-VR dataset (no preamble/meta): lite defaults to explicit
    # until meta ends... with no meta group, both parsers read the dataset
    # with the default syntax; build a part-10 file negotiating implicit VR
    meta = b""
    ts = IMPLICIT_VR_LE.encode()
    if len(ts) % 2:
        ts += b"\x00"
    el_ts = struct.pack("<HH", 2, 0x10) + b"UI" + struct.pack("<H", len(ts)) + ts
    meta_len = (
        struct.pack("<HH", 2, 0) + b"UL" + struct.pack("<H", 4)
        + struct.pack("<I", len(el_ts))
    )
    meta = meta_len + el_ts

    arr = (np.arange(6 * 4, dtype=np.uint16) * 100).reshape(6, 4)
    body = b"".join([
        _el_implicit(0x0008, 0x0060, b"MR"),
        _el_implicit(0x0010, 0x0020, b"P42 "),
        _el_implicit(0x0020, 0x0032, b"0\\0\\12.5 "),
        _el_implicit(0x0028, 0x0010, struct.pack("<H", 6)),
        _el_implicit(0x0028, 0x0011, struct.pack("<H", 4)),
        _el_implicit(0x0028, 0x0100, struct.pack("<H", 16)),
        _el_implicit(0x0028, 0x0103, struct.pack("<H", 0)),
        _el_implicit(0x7FE0, 0x0010, arr.astype("<u2").tobytes()),
    ])
    data = b"\x00" * 128 + b"DICM" + meta + body
    _assert_equal(data)


def test_raw_implicit_vr_no_preamble_parity():
    """Raw implicit-VR dataset with NO part-10 header: both parsers must
    sniff the first dataset element (no two-uppercase-letter VR after the
    tag => implicit) instead of misreading it as explicit VR.  This was the
    r2 advisor finding: the C scanner lacked the sniff, returning an empty
    header with ok=1 while dicom_lite parsed the file fully."""
    arr = (np.arange(5 * 3, dtype=np.uint16) * 7).reshape(5, 3)
    body = b"".join([
        _el_implicit(0x0008, 0x0060, b"MR"),
        _el_implicit(0x0008, 0x103E, b"T2 AX PROSTATE"),
        _el_implicit(0x0010, 0x0020, b"P99 "),
        _el_implicit(0x0020, 0x0032, b"1\\2\\3.5 "),
        _el_implicit(0x0028, 0x0010, struct.pack("<H", 5)),
        _el_implicit(0x0028, 0x0011, struct.pack("<H", 3)),
        _el_implicit(0x0028, 0x0100, struct.pack("<H", 16)),
        _el_implicit(0x0028, 0x0103, struct.pack("<H", 0)),
        _el_implicit(0x7FE0, 0x0010, arr.astype("<u2").tobytes()),
    ])
    _assert_equal(body)
    # guard against the vacuous both-empty pass the old parity gap hid behind
    fast = dicom_fast.parse_dicom_bytes_fast(body)
    assert fast.modality == "MR"
    assert fast.get("Rows") == 5 and fast.get("Columns") == 3
    np.testing.assert_array_equal(fast.pixel_array, arr.astype(np.float32))


def test_undefined_sequence_skip_parity():
    # explicit-VR file containing an undefined-length SQ with a nested
    # undefined-length item before the retained tags
    def el(group, elem, vr, value):
        head = struct.pack("<HH", group, elem)
        if vr in (b"OB", b"OW", b"SQ", b"UN"):
            return head + vr + b"\x00\x00" + struct.pack("<I", len(value)) + value
        return head + vr + struct.pack("<H", len(value)) + value

    inner = el(0x0008, 0x0100, b"SH", b"CODE")
    item_undef = (
        struct.pack("<HHI", 0xFFFE, 0xE000, 0xFFFFFFFF)
        + inner
        + struct.pack("<HHI", 0xFFFE, 0xE00D, 0)
    )
    seq = (
        struct.pack("<HH", 0x0008, 0x1115) + b"SQ" + b"\x00\x00"
        + struct.pack("<I", 0xFFFFFFFF)
        + item_undef
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    )
    arr = np.full((2, 2), 7, np.uint16)
    body = seq + b"".join([
        el(0x0008, 0x0060, b"CS", b"MR"),
        el(0x0028, 0x0010, b"US", struct.pack("<H", 2)),
        el(0x0028, 0x0011, b"US", struct.pack("<H", 2)),
        el(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
        el(0x7FE0, 0x0010, b"OW", arr.astype("<u2").tobytes()),
    ])
    _assert_equal(body)  # raw dataset, no preamble


def test_rescale_parity(tmp_path):
    # slope/intercept applied identically (writer doesn't emit them, so
    # build explicit elements by hand)
    def el(group, elem, vr, value):
        if len(value) % 2:
            value += b" "
        head = struct.pack("<HH", group, elem)
        if vr == b"OW":
            return head + vr + b"\x00\x00" + struct.pack("<I", len(value)) + value
        return head + vr + struct.pack("<H", len(value)) + value

    arr = np.array([[0, 1], [2, 3]], np.uint16)
    body = b"".join([
        el(0x0028, 0x0010, b"US", struct.pack("<H", 2)),
        el(0x0028, 0x0011, b"US", struct.pack("<H", 2)),
        el(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
        el(0x0028, 0x1052, b"DS", b"-1024"),
        el(0x0028, 0x1053, b"DS", b"2.0"),
        el(0x7FE0, 0x0010, b"OW", arr.astype("<u2").tobytes()),
    ])
    _assert_equal(body)
    fast = dicom_fast.parse_dicom_bytes_fast(body)
    np.testing.assert_array_equal(
        fast.pixel_array, arr.astype(np.float32) * 2.0 - 1024.0
    )


def test_signed_8bit_parity():
    def el(group, elem, vr, value):
        head = struct.pack("<HH", group, elem)
        if vr == b"OW":
            return head + vr + b"\x00\x00" + struct.pack("<I", len(value)) + value
        return head + vr + struct.pack("<H", len(value)) + value

    arr = np.array([[-5, 3], [120, -128]], np.int8)
    body = b"".join([
        el(0x0028, 0x0010, b"US", struct.pack("<H", 2)),
        el(0x0028, 0x0011, b"US", struct.pack("<H", 2)),
        el(0x0028, 0x0100, b"US", struct.pack("<H", 8)),
        el(0x0028, 0x0103, b"US", struct.pack("<H", 1)),
        el(0x7FE0, 0x0010, b"OW", arr.tobytes()),
    ])
    _assert_equal(body)


def test_compressed_rejected_like_lite():
    # encapsulated pixel data (undefined length) raises in both parsers
    head = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB" + b"\x00\x00"
    data = head + struct.pack("<I", 0xFFFFFFFF)
    with pytest.raises(ValueError):
        parse_dicom_bytes(data)
    with pytest.raises(ValueError):
        dicom_fast.parse_dicom_bytes_fast(data)


def test_best_reader_selects_native():
    assert dicom_fast.best_reader() is dicom_fast.read_dicom_fast


def test_discovery_uses_fast_path(tmp_path):
    # end-to-end: read_series_volume through the native reader
    from mrisr_tpu.data.discovery import read_series_volume

    rng = np.random.RandomState(1)
    d = tmp_path / "series"
    for i in range(3):
        write_dicom(
            str(d / f"{i:03d}.dcm"),
            (rng.rand(8, 8) * 100).astype(np.uint16),
            instance_number=i + 1, image_position=(0, 0, 1.5 * i),
        )
    vol = read_series_volume(str(d))
    assert vol.shape == (3, 8, 8)
