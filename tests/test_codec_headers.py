"""Header-parser tier (codec_headers.py): builder↔parser round-trips,
pinned byte fixtures (catch builder+parser co-drift), truncation/corruption
fuzz, the EXIF orientation table, and the Spark mapInPandas plumbing.
Reference parity targets: /root/reference/src/parsers/{jpeg,tiff,webp,
jpeg2k}.cpp + exif_orientation.h."""

import hashlib
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nvimagecodec_spark.operators import codec_headers as C


# ------------------------------------------------------------ pinned bytes

def test_tiff_little_endian_pinned_bytes():
    """Exact hex for a minimal LE TIFF — hand-derived from TIFF 6.0, not
    from the builder, so a co-drifting builder+parser pair still fails."""
    expected = bytes.fromhex(
        "49492A0008000000"  # II*\0 + IFD offset 8
        "0600"  # 6 entries
        "000104000100000010000000"  # 256 ImageWidth LONG 16
        "010104000100000008000000"  # 257 ImageLength LONG 8
        "020103000100000008000000"  # 258 BitsPerSample SHORT 8
        "060103000100000001000000"  # 262 Photometric SHORT 1 (gray)
        "120103000100000001000000"  # 274 Orientation SHORT 1
        "150103000100000001000000"  # 277 SamplesPerPixel SHORT 1
        "00000000"  # next-IFD terminator
    )
    assert C.build_tiff(16, 8, 1, 8, 1, little_endian=True) == expected
    info = C.parse_tiff_info(expected)
    assert info == {
        "codec": "tiff", "width": 16, "height": 8, "channels": 1,
        "precision": 8, "progressive": False, "orientation": 1,
    }


def test_jpeg_handcrafted_sof_not_from_builder():
    # SOI + SOF0 (len 11, precision 8, h 16, w 32, 1 component) + EOI
    b = bytes.fromhex("FFD8" "FFC0000B" "08" "0010" "0020" "01" "011100" "FFD9")
    info = C.parse_jpeg_info(b)
    assert info["width"] == 32 and info["height"] == 16
    assert info["channels"] == 1 and not info["progressive"]
    assert info["orientation"] == 1  # no APP1 → default


def test_webp_vp8l_features_formula():
    """VP8L features assembled straight from the spec formula, independent
    of build_webp."""
    w, h = 17, 9
    features = (w - 1) | ((h - 1) << 14) | (1 << 28)
    body = b"\x2f" + struct.pack("<I", features) + bytes(5)
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    b_ = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    info = C.parse_webp_info(b_)
    assert (info["width"], info["height"], info["channels"]) == (17, 9, 4)


def test_jp2_raw_codestream_offsets():
    """SIZ offsets per ISO 15444-1 (width = Xsiz − XOsiz): build with a
    nonzero image offset, which build_jp2 never emits."""
    siz = struct.pack(">HIIIIIIIIH", 0, 100, 60, 4, 10, 100, 60, 0, 0, 2)
    siz += bytes([11, 1, 1]) * 2  # Ssiz 11 → 12-bit precision
    b = b"\xff\x4f\xff\x51" + struct.pack(">H", len(siz) + 2) + siz + b"\xff\xd9"
    info = C.parse_jp2_info(b)
    assert (info["width"], info["height"]) == (96, 50)
    assert info["channels"] == 2 and info["precision"] == 12


def test_exif_orientation_table_matches_reference():
    # exif_orientation.h:37-58 — incl. the CW→CCW conversions for 5-8
    assert C.exif_to_orientation(1) == (0, False, False)
    assert C.exif_to_orientation(2) == (0, True, False)
    assert C.exif_to_orientation(3) == (180, False, False)
    assert C.exif_to_orientation(4) == (0, False, True)
    assert C.exif_to_orientation(5) == (90, False, True)
    assert C.exif_to_orientation(6) == (270, False, False)
    assert C.exif_to_orientation(7) == (270, False, True)
    assert C.exif_to_orientation(8) == (90, False, False)
    assert C.exif_to_orientation(0) == (0, False, False)  # default branch
    assert C.exif_to_orientation(99) == (0, False, False)


# ---------------------------------------------------------- round trips

@given(
    w=st.integers(1, 4000), h=st.integers(1, 4000),
    channels=st.sampled_from([1, 3]), progressive=st.booleans(),
    orientation=st.integers(1, 8),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_roundtrip(w, h, channels, progressive, orientation):
    info = C.parse_jpeg_info(C.build_jpeg(w, h, channels, progressive, orientation))
    assert (info["width"], info["height"], info["channels"]) == (w, h, channels)
    assert info["progressive"] == progressive
    assert info["orientation"] == orientation
    assert info["precision"] == 8


@given(
    w=st.integers(1, 1 << 20), h=st.integers(1, 1 << 20),
    channels=st.sampled_from([1, 3, 4]), bps=st.sampled_from([1, 8, 16]),
    orientation=st.integers(1, 8), le=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_tiff_roundtrip(w, h, channels, bps, orientation, le):
    info = C.parse_tiff_info(C.build_tiff(w, h, channels, bps, orientation, le))
    assert (info["width"], info["height"], info["channels"]) == (w, h, channels)
    assert info["precision"] == bps and info["orientation"] == orientation


@given(
    w=st.integers(1, (1 << 14) - 1), h=st.integers(1, (1 << 14) - 1),
    variant=st.integers(0, 2), alpha=st.booleans(), orientation=st.integers(1, 8),
)
@settings(max_examples=60, deadline=None)
def test_webp_roundtrip(w, h, variant, alpha, orientation):
    info = C.parse_webp_info(C.build_webp(w, h, variant, alpha, orientation))
    assert (info["width"], info["height"]) == (w, h)
    # VP8 lossy has no alpha plane; orientation only rides VP8X EXIF
    assert info["channels"] == (3 if variant == 0 else 3 + int(alpha))
    assert info["orientation"] == (orientation if variant == 2 else 1)


@given(
    w=st.integers(1, 1 << 24), h=st.integers(1, 1 << 24),
    nc=st.sampled_from([1, 2, 3, 4]), bpc=st.sampled_from([1, 8, 12, 16]),
    raw=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_jp2_roundtrip(w, h, nc, bpc, raw):
    info = C.parse_jp2_info(C.build_jp2(w, h, nc, bpc, raw))
    assert (info["width"], info["height"], info["channels"]) == (w, h, nc)
    assert info["precision"] == bpc


# --------------------------------------------------------------- fuzzing

def _all_fixture_payloads():
    out = []
    for i in range(48):
        md5 = hashlib.md5(f"fuzz doc {i}".encode()).hexdigest()
        out.append(C._build_from_params(C.header_params_from_md5(md5)))
    return out


def test_truncation_never_raises_and_returns_none():
    """Every prefix of every fixture either parses (full stream) or returns
    None — never raises, never returns garbage dims (the reference returns
    BAD_CODESTREAM; our analog is the dead-letter None)."""
    for payload in _all_fixture_payloads():
        full = C._PARSERS[C.probe_codec_bytes(payload)](payload)
        assert full is not None
        for n in range(len(payload)):
            t = payload[:n]
            codec = C.probe_codec_bytes(t)
            if codec is None:
                continue
            info = C._PARSERS[codec](t)
            # a prefix long enough to contain the full header may parse;
            # it must then agree with the full parse
            if info is not None:
                assert info["width"] == full["width"]
                assert info["height"] == full["height"]


def test_corrupt_streams_rejected():
    assert C.parse_webp_info(
        C.build_webp(10, 10, 0).replace(b"\x9d\x01\x2a", b"\x9d\x01\x2b")
    ) is None  # VP8 sync code (webp.cpp:107)
    jp2 = bytearray(C.build_jp2(10, 10, 3, 8))
    ihdr_at = bytes(jp2).find(b"ihdr") - 4
    struct.pack_into(">I", jp2, ihdr_at, 23)  # ihdr size must be 22
    assert C.parse_jp2_info(bytes(jp2)) is None
    jpg = bytearray(C.build_jpeg(10, 10))
    jpg[2] = 0x00  # marker stream must stay 0xFF-aligned
    assert C.parse_jpeg_info(bytes(jpg)) is None
    tif = bytearray(C.build_tiff(10, 10))
    struct.pack_into("<I", tif, 4, 10 ** 6)  # IFD offset beyond EOF
    assert C.parse_tiff_info(bytes(tif)) is None
    assert C.probe_codec_bytes(b"\x00\x01\x02\x03garbage") is None


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_random_bytes_never_raise(data):
    codec = C.probe_codec_bytes(data)
    if codec is not None:
        C._PARSERS[codec](data)


# ------------------------------------------------------------- Spark tier

def test_parse_image_headers_spark(spark):
    rows = [(i, f"spark doc {i} body text") for i in range(64)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = C.parse_image_headers(C.attach_codec_headers(df)).collect()
    assert len(out) == 64
    by_id = {r["doc_id"]: r for r in out}
    seen = set()
    for i, txt in rows:
        md5 = hashlib.md5(txt.encode()).hexdigest()
        p = C.header_params_from_md5(md5)
        r = by_id[i]
        seen.add(r["codec"])
        assert r["codec"] == p["fmt"]
        assert (r["width"], r["height"]) == (p["w"], p["h"])
        rot, fx, fy = C.exif_to_orientation(p.get("orientation", 1))
        assert (r["rotated"], r["flip_x"], r["flip_y"]) == (rot, int(fx), int(fy))
    assert seen == {"jpeg", "tiff", "webp", "jpeg2k"}  # all four exercised


def test_parse_image_headers_dead_letter_row(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x00not an image")), (2, bytearray(C.build_jpeg(20, 10)))],
        "doc_id long, image binary",
    )
    out = {r["doc_id"]: r for r in C.parse_image_headers(df).collect()}
    assert len(out) == 2  # row count preserved
    assert out[1]["codec"] is None and out[1]["width"] is None
    assert out[2]["codec"] == "jpeg" and out[2]["width"] == 20


def test_detect_codec_expression_probes_real_formats(spark):
    from nvimagecodec_spark.operators import multimodal as M

    payloads = [
        (0, C.build_jpeg(10, 10), "jpeg"),
        (1, C.build_tiff(10, 10, little_endian=True), "tiff"),
        (2, C.build_tiff(10, 10, little_endian=False), "tiff"),
        (3, C.build_webp(10, 10, 0), "webp"),
        (4, C.build_jp2(10, 10), "jpeg2k"),
        (5, C.build_jp2(10, 10, raw_codestream=True), "jpeg2k"),
        (6, b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b", None),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p, _ in payloads], "doc_id long, image binary"
    )
    got = {r["doc_id"]: r["codec"] for r in
           df.select("doc_id", M.detect_codec("image").alias("codec")).collect()}
    for i, _, want in payloads:
        assert got[i] == want
