"""DICOM-lite round-trip, discovery, cleaner, extractor, and end-to-end
DICOM-tree -> packed-store tests."""

import os
import zipfile

import numpy as np
import pytest

from mrisr_tpu.data.clean import clean_dataset, is_unwanted_series, scan_dataset
from mrisr_tpu.data.dicom_lite import (
    EXPLICIT_VR_LE,
    parse_dicom_bytes,
    read_dicom,
    write_dicom,
)
from mrisr_tpu.data.discovery import (
    check_z_spacing,
    count_slices,
    discover_series,
    read_series_volume,
)
from mrisr_tpu.data.extract import extract_zip
from mrisr_tpu.data.volumes import VolumeStore


def _write_series(folder, n_slices=6, rows=16, cols=18, modality="MR",
                  desc="T2 AXIAL", z_step=1.5, seed=0):
    rng = np.random.default_rng(seed)
    vols = []
    for i in range(n_slices):
        arr = (rng.random((rows, cols)) * 1000).astype(np.uint16)
        vols.append(arr)
        write_dicom(
            os.path.join(folder, f"slice_{i:03d}.dcm"),
            arr,
            modality=modality,
            series_description=desc,
            instance_number=i + 1,
            image_position=(0.0, 0.0, i * z_step),
        )
    return np.stack(vols)


def test_dicom_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    arr = (rng.random((12, 14)) * 4000).astype(np.uint16)
    p = str(tmp_path / "x.dcm")
    write_dicom(p, arr, modality="MR", series_description="T2 test",
                image_position=(1.5, -2.0, 33.0))
    d = read_dicom(p)
    assert d.modality == "MR"
    assert d.series_description == "T2 test"
    assert int(d.get("Rows")) == 12 and int(d.get("Columns")) == 14
    assert d.image_position == (1.5, -2.0, 33.0)
    np.testing.assert_array_equal(d.pixel_array, arr.astype(np.float32))


def test_dicom_implicit_vr_parse(tmp_path):
    """Re-encode a written file body as implicit VR and parse it."""
    import struct

    arr = np.arange(20, dtype=np.uint16).reshape(4, 5)
    body = b""

    def el(group, elem, value):
        return struct.pack("<HHI", group, elem, len(value)) + value

    body += el(0x0008, 0x0060, b"MR")
    body += el(0x0028, 0x0010, struct.pack("<H", 4))
    body += el(0x0028, 0x0011, struct.pack("<H", 5) + b"\x00\x00")
    body += el(0x0028, 0x0100, struct.pack("<H", 16))
    body += el(0x7FE0, 0x0010, arr.astype("<u2").tobytes())

    # part-10 wrapper with implicit-VR transfer syntax in the meta group
    def mel(group, elem, vr, value):
        if len(value) % 2:
            value += b"\x00"
        return struct.pack("<HH", group, elem) + vr + struct.pack(
            "<H", len(value)
        ) + value

    meta = mel(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2")
    data = b"\x00" * 128 + b"DICM" + mel(
        0x0002, 0x0000, b"UL", struct.pack("<I", len(meta))
    ) + meta + body
    d = parse_dicom_bytes(data)
    assert d.modality == "MR"
    np.testing.assert_array_equal(d.pixel_array, arr.astype(np.float32))


def test_rescale_applied(tmp_path):
    import struct

    arr = (np.ones((4, 4)) * 100).astype(np.uint16)
    p = str(tmp_path / "r.dcm")
    write_dicom(p, arr)
    raw = open(p, "rb").read()
    # append-free check: our writer has slope/intercept absent -> identity
    d = parse_dicom_bytes(raw)
    np.testing.assert_array_equal(d.pixel_array, arr.astype(np.float32))


def test_discovery_and_volume(tmp_path):
    sdir = tmp_path / "P1" / "study" / "series1"
    sdir.mkdir(parents=True)
    truth = _write_series(str(sdir), n_slices=6)
    # discovery with the exactly-N rule
    assert discover_series(str(tmp_path / "P1"), require_slices=6) == [str(sdir)]
    assert discover_series(str(tmp_path / "P1"), require_slices=60) == []
    assert count_slices(str(sdir)) == 6
    vol = read_series_volume(str(sdir))
    assert vol.shape == (6, 16, 18)
    np.testing.assert_array_equal(vol, truth.astype(np.float32))
    # z-spacing check (Data Analysis parity): 1.5 mm
    assert check_z_spacing(str(sdir)) == pytest.approx(1.5)


def test_cleaner(tmp_path):
    root = tmp_path / "ds"
    keep = root / "Prostate-MRI-US-Biopsy-0001" / "study" / "mr_series"
    drop_us = root / "Prostate-MRI-US-Biopsy-0001" / "study" / "us_series"
    drop_3d = root / "Prostate-MRI-US-Biopsy-0002" / "study" / "render"
    for d in (keep, drop_us, drop_3d):
        d.mkdir(parents=True)
    _write_series(str(keep), 3, modality="MR")
    _write_series(str(drop_us), 3, modality="US")
    _write_series(str(drop_3d), 3, modality="MR", desc="3D RENDERING recon")

    assert not is_unwanted_series(str(keep))
    assert is_unwanted_series(str(drop_us))
    assert is_unwanted_series(str(drop_3d))

    to_delete, total = scan_dataset(str(root))
    assert total == 3 and len(to_delete) == 2

    # dry run deletes nothing
    assert clean_dataset(to_delete, dry_run=True) == 0
    assert drop_us.exists()
    # confirm=False blocks deletion
    assert clean_dataset(to_delete, confirm=lambda: False) == 0
    # real deletion
    assert clean_dataset(to_delete) == 2
    assert keep.exists() and not drop_us.exists() and not drop_3d.exists()


def test_extract_zip(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("hello")
    (src / "b.txt").write_text("world")
    zpath = str(tmp_path / "data.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(src / "a.txt", "a.txt")
        zf.write(src / "b.txt", "sub/b.txt")
    ok, failed = extract_zip(zpath, str(tmp_path / "out"))
    assert ok == 2 and failed == 0
    assert (tmp_path / "out" / "sub" / "b.txt").read_text() == "world"


def test_pack_dicom_tree_end_to_end(tmp_path):
    """Full L0 path: DICOM tree -> packed store, 60-slice rule enforced."""
    root = tmp_path / "manifest" / "Prostate-MRI-US-Biopsy"
    good = root / "Prostate-MRI-US-Biopsy-0001" / "study" / "t2"
    short = root / "Prostate-MRI-US-Biopsy-0002" / "study" / "t2"
    good.mkdir(parents=True)
    short.mkdir(parents=True)
    _write_series(str(good), n_slices=6, seed=1)
    _write_series(str(short), n_slices=4, seed=2)

    store = VolumeStore.pack_dicom_tree(
        str(tmp_path / "packed"), str(root), require_slices=6
    )
    assert len(store) == 1
    assert store.entries[0].patient_id == "Prostate-MRI-US-Biopsy-0001"
    vol = store.load_series(0)
    assert vol.shape == (6, 16, 18)


def test_export_volume_roundtrip(tmp_path):
    from mrisr_tpu.data.export import export_volume_dicom
    from mrisr_tpu.data.discovery import read_series_volume

    rng = np.random.default_rng(9)
    vol = rng.standard_normal((5, 16, 16)).astype(np.float32)
    out = export_volume_dicom(vol, str(tmp_path / "pred"), z_spacing=3.0)
    back = read_series_volume(out)
    assert back.shape == (5, 16, 16)
    # affine-mapped: correlation with the original must be ~1
    c = np.corrcoef(vol.ravel(), back.ravel())[0, 1]
    assert c > 0.9999
    assert check_z_spacing(out) == pytest.approx(3.0)


def test_undefined_length_sequence_skipping(tmp_path):
    """Explicit-VR file with an undefined-length SQ containing an
    undefined-length item with explicit-VR elements inside — the parser
    must skip it and still find the tags after it (the real-world
    Prostate-MRI header shape)."""
    import struct

    def el_explicit(group, elem, vr, value):
        if len(value) % 2:
            value += b"\x00"
        head = struct.pack("<HH", group, elem)
        if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
            return head + vr + b"\x00\x00" + struct.pack("<I", len(value)) + value
        return head + vr + struct.pack("<H", len(value)) + value

    # inner elements of the item (explicit VR)
    inner = el_explicit(0x0008, 0x1150, b"UI", b"1.2.840.10008.5.1.4.1.1.4")
    inner += el_explicit(0x0008, 0x1155, b"UI", b"1.2.3.4.5.6.7")
    # undefined-length item
    item = struct.pack("<HHI", 0xFFFE, 0xE000, 0xFFFFFFFF) + inner
    item += struct.pack("<HHI", 0xFFFE, 0xE00D, 0)
    # undefined-length SQ wrapping it
    sq = struct.pack("<HH", 0x0008, 0x1140) + b"SQ" + b"\x00\x00"
    sq += struct.pack("<I", 0xFFFFFFFF) + item
    sq += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)

    arr = np.arange(12, dtype=np.uint16).reshape(3, 4)
    body = el_explicit(0x0008, 0x0060, b"CS", b"MR")
    body += sq  # the sequence sits BEFORE the geometry tags
    body += el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", 3))
    body += el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", 4))
    body += el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += el_explicit(0x7FE0, 0x0010, b"OW", arr.astype("<u2").tobytes())

    meta = el_explicit(0x0002, 0x0010, b"UI", EXPLICIT_VR_LE.encode())
    data = (b"\x00" * 128 + b"DICM"
            + el_explicit(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta)))
            + meta + body)
    d = parse_dicom_bytes(data)
    assert d.modality == "MR"
    assert int(d.get("Rows")) == 3 and int(d.get("Columns")) == 4
    np.testing.assert_array_equal(d.pixel_array, arr.astype(np.float32))


def test_string_vr_space_padding(tmp_path):
    """Odd-length DS values must be space-padded per the standard."""
    p = str(tmp_path / "pad.dcm")
    write_dicom(p, np.zeros((2, 2), np.uint16),
                image_position=(0.0, 0.0, 1.5))
    raw = open(p, "rb").read()
    # the DS value '0\\0\\1.5' is 7 bytes -> padded to 8 with a space
    assert b"0\\0\\1.5 " in raw
    d = parse_dicom_bytes(raw)
    assert d.image_position == (0.0, 0.0, 1.5)


def test_compressed_pixeldata_header_only_parse():
    """Encapsulated (compressed) PixelData: pixels=True raises, but a
    header-only parse must still return the fields — the cleaner reads
    Modality from compressed ultrasound series to delete them."""
    import struct

    import pytest

    from mrisr_tpu.data.dicom_lite import parse_dicom_bytes

    def el_explicit(group, elem, vr, value):
        if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
            return (struct.pack("<HH", group, elem) + vr + b"\x00\x00"
                    + struct.pack("<I", len(value)) + value)
        return (struct.pack("<HH", group, elem) + vr
                + struct.pack("<H", len(value)) + value)

    body = el_explicit(0x0008, 0x0060, b"CS", b"US")
    # encapsulated pixel data: OB, undefined length, one item + delimiter
    frag = struct.pack("<HHI", 0xFFFE, 0xE000, 4) + b"\x01\x02\x03\x04"
    delim = struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    body += (struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
             + struct.pack("<I", 0xFFFFFFFF) + frag + delim)
    data = b"\x00" * 128 + b"DICM" + body

    d = parse_dicom_bytes(data, pixels=False)
    assert d.modality == "US"
    assert d.pixel_array is None
    with pytest.raises(ValueError, match="compressed"):
        parse_dicom_bytes(data, pixels=True)


def test_compressed_pixeldata_header_only_native():
    """Same contract through the native parser (when it compiled)."""
    import struct

    import pytest

    from mrisr_tpu.data import dicom_fast

    if not dicom_fast.available():
        pytest.skip("native parser unavailable")

    def el_explicit(group, elem, vr, value):
        return (struct.pack("<HH", group, elem) + vr
                + struct.pack("<H", len(value)) + value)

    body = el_explicit(0x0008, 0x0060, b"CS", b"US")
    frag = struct.pack("<HHI", 0xFFFE, 0xE000, 4) + b"\x01\x02\x03\x04"
    delim = struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    body += (struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
             + struct.pack("<I", 0xFFFFFFFF) + frag + delim)
    data = b"\x00" * 128 + b"DICM" + body

    d = dicom_fast.parse_dicom_bytes_fast(data, pixels=False)
    assert d.modality == "US"
    assert d.pixel_array is None
    with pytest.raises(ValueError, match="compressed"):
        dicom_fast.parse_dicom_bytes_fast(data, pixels=True)


def test_raw_implicit_vr_dataset_sniffed():
    """A headerless (no part-10 meta) implicit-VR dataset must be parsed
    via the VR sniff, not misread as explicit."""
    import struct

    from mrisr_tpu.data.dicom_lite import parse_dicom_bytes

    arr = np.arange(20, dtype=np.uint16).reshape(4, 5)

    def el(group, elem, value):
        return struct.pack("<HHI", group, elem, len(value)) + value

    body = el(0x0008, 0x0060, b"MR")
    body += el(0x0028, 0x0010, struct.pack("<H", 4))
    body += el(0x0028, 0x0011, struct.pack("<H", 5) + b"\x00\x00")
    body += el(0x0028, 0x0100, struct.pack("<H", 16))
    body += el(0x7FE0, 0x0010, arr.astype("<u2").tobytes())

    d = parse_dicom_bytes(body)  # no preamble, no meta group at all
    assert d.modality == "MR"
    np.testing.assert_array_equal(d.pixel_array, arr.astype(np.float32))


def test_position_sort_falls_back_on_missing_positions(tmp_path):
    """A series where some slices lack ImagePositionPatient must fall back
    to filename order with a warning, not scramble to Z=0."""
    import warnings

    from mrisr_tpu.data.discovery import read_series_volume

    folder = tmp_path / "series"
    folder.mkdir()
    for i in range(4):
        kw = {"image_position": None}  # slice 2 has NO position tag
        if i != 2:
            kw["image_position"] = (0.0, 0.0, float(10 - i))  # descending Z
        write_dicom(
            str(folder / f"s{i:03d}.dcm"),
            np.full((4, 4), i, np.uint16),
            modality="MR", **kw,
        )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        vol = read_series_volume(str(folder), sort_by="position")
    assert vol is not None
    # filename order preserved (slice i has constant value i)
    for i in range(4):
        assert float(vol[i, 0, 0]) == float(i)
    assert any("filename order" in str(x.message) for x in w)
