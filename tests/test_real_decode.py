"""REAL pixel decode (round-3 verdict #2): pure-numpy BMP/PNM codecs behind
the former ``_real_decode`` seam — mirrors the reference's dependency-free
nvbmp/nvpnm plugin pair (/root/reference/extensions/nvbmp/nvbmp_ext.cpp,
/root/reference/extensions/nvpnm/nvpnm_ext.cpp). Covers container-layout
hazards a fake codec can't: BMP bottom-up rows, BGR order, 4-byte row
padding, top-down (negative height) variants, PNM comment headers."""

import hashlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from nvimagecodec_spark.operators import multimodal as M


def _rand(h, w, c, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8) if c > 1 else rng.randint(
        0, 256, size=(h, w, 1), dtype=np.uint8
    )


@pytest.mark.parametrize("w", [16, 17, 18, 19, 63])  # w*3 % 4 hits every pad size
@pytest.mark.parametrize("h", [1, 7, 48])
def test_bmp_roundtrip_all_paddings(w, h):
    arr = _rand(h, w, 3, seed=w * 100 + h)
    data = M.encode_bmp(arr)
    out, codec = M._real_decode(data)
    assert codec == "bmp"
    np.testing.assert_array_equal(out, arr)


def test_bmp_topdown_negative_height():
    arr = _rand(5, 7, 3, seed=42)
    data = bytearray(M.encode_bmp(arr))
    # flip to top-down: negate biHeight and un-reverse the stored rows
    h, w = 5, 7
    stride = (w * 3 + 3) & ~3
    data[22:26] = (-h).to_bytes(4, "little", signed=True)
    pix_off = int.from_bytes(data[10:14], "little")
    rows = [
        bytes(data[pix_off + r * stride : pix_off + (r + 1) * stride]) for r in range(h)
    ]
    data[pix_off:] = b"".join(reversed(rows))
    out, codec = M._real_decode(bytes(data))
    assert codec == "bmp"
    np.testing.assert_array_equal(out, arr)


@pytest.mark.parametrize("c,codec", [(3, "ppm"), (1, "pgm")])
def test_pnm_roundtrip(c, codec):
    arr = _rand(11, 23, c, seed=c)
    data = M.encode_pnm(arr)
    out, got = M._real_decode(data)
    assert got == codec
    np.testing.assert_array_equal(out, arr)


def test_pnm_header_comments_and_whitespace():
    arr = _rand(3, 4, 3, seed=9)
    data = b"P6\n# a comment line\n  4   3\n# another\n255\n" + arr.tobytes()
    out, codec = M._real_decode(data)
    assert codec == "ppm"
    np.testing.assert_array_equal(out, arr)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: d[: len(d) - 5],  # truncated raster
        lambda d: d[:20],  # truncated header
        lambda d: b"XX" + d[2:],  # unknown magic
    ],
)
def test_corrupt_payloads_raise(mutate):
    data = M.encode_bmp(_rand(4, 4, 3, seed=1))
    with pytest.raises(ValueError):
        M._real_decode(mutate(data))


def test_bmp_unsupported_bpp_raises():
    data = bytearray(M.encode_bmp(_rand(4, 4, 3, seed=2)))
    data[28:30] = (8).to_bytes(2, "little")
    with pytest.raises(ValueError):
        M._real_decode(bytes(data))


def _expected_stats(text: str):
    md5 = hashlib.md5(text.encode()).hexdigest()
    arr, fmt = M._pattern_pixels(md5)
    h, w, ch = arr.shape
    a = arr.astype(np.int64)
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(ch)[None, None, :]
    return {
        "codec": ["bmp", "ppm", "pgm"][fmt],
        "width": w,
        "height": h,
        "channels": ch,
        "px_sum": int(a.sum()),
        "px_wsum": int((a * (x + 2 * y + 3 * c)).sum()),
        "c0_sum": int(a[:, :, 0].sum()),
    }


def test_attach_decode_real_end_to_end(spark):
    texts = [f"document number {i} with words" for i in range(30)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in M.decode_images_real(M.attach_real_images(df)).collect()
    }
    assert len(out) == 30
    codecs = {r["codec"] for r in out.values()}
    assert codecs == {"bmp", "ppm", "pgm"}, codecs  # all three formats exercised
    for i, t in enumerate(texts):
        want = _expected_stats(t)
        got = out[i]
        for k, v in want.items():
            assert got[k] == v, f"doc {i} field {k}: {got[k]} != {v}"


def test_detect_codec_real_formats(spark):
    rows = [
        (0, bytearray(M.encode_bmp(_rand(4, 4, 3, seed=3)))),
        (1, bytearray(M.encode_pnm(_rand(4, 4, 3, seed=4)))),
        (2, bytearray(M.encode_pnm(_rand(4, 4, 1, seed=5)))),
        (3, bytearray(b"????junk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, image binary")
    got = {r["doc_id"]: r["codec"] for r in df.select("doc_id", M.detect_codec("image").alias("codec")).collect()}
    assert got == {0: "bmp", 1: "ppm", 2: "pgm", 3: None}


def test_resize_real_nearest_neighbor(spark):
    texts = ["alpha beta", "gamma delta", "epsilon zeta"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    resized = M.resize_images_real(M.attach_real_images(df), 10, 6)
    out = {r["doc_id"]: r.asDict() for r in M.decode_images_real(resized).collect()}
    for i, t in enumerate(texts):
        md5 = hashlib.md5(t.encode()).hexdigest()
        arr, fmt = M._pattern_pixels(md5)
        h, w, ch = arr.shape
        sx = (np.arange(10) * w) // 10
        sy = (np.arange(6) * h) // 6
        want = arr[sy[:, None], sx[None, :], :].astype(np.int64)
        x = np.arange(10)[None, :, None]
        y = np.arange(6)[:, None, None]
        c = np.arange(ch)[None, None, :]
        got = out[i]
        assert got["codec"] == ["bmp", "ppm", "pgm"][fmt]  # format preserved
        assert (got["width"], got["height"], got["channels"]) == (10, 6, ch)
        assert got["px_sum"] == int(want.sum())
        assert got["px_wsum"] == int((want * (x + 2 * y + 3 * c)).sum())
        assert got["c0_sum"] == int(want[:, :, 0].sum())


# ------------------------------------------------------------------- PNG


def test_png_round_trip_all_filters_and_channels():
    """encode_png cycles all five spec filters (y % 5); any image ≥ 5
    rows drives every unfilter branch. 1/2/3/4 channels cover gray,
    gray+alpha, RGB, RGBA color types."""
    rng = np.random.RandomState(42)
    for ch in (1, 2, 3, 4):
        for h, w in [(1, 1), (5, 3), (17, 23), (48, 64)]:
            arr = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
            dec = M._parse_png(M.encode_png(arr))
            assert dec.shape == (h, w, ch)
            assert (dec == arr).all(), f"ch={ch} {h}x{w}"


def test_png_single_filter_fixtures():
    """Hand-built single-filter images: forward-filter one type across
    every row, decode, compare — isolates each unfilter recurrence."""
    import zlib

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(6, 9, 3), dtype=np.uint8)
    h, w, ch = arr.shape
    flat = arr.reshape(h, w * ch).astype(np.int32)
    for ftype in range(5):
        rows = []
        for y in range(h):
            cur = flat[y]
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            up = flat[y - 1] if y else np.zeros_like(cur)
            upleft = (
                np.concatenate([np.zeros(ch, np.int32), up[:-ch]]) if ch <= len(up) else up
            )
            if ftype == 0:
                filt = cur
            elif ftype == 1:
                filt = cur - left
            elif ftype == 2:
                filt = cur - up
            elif ftype == 3:
                filt = cur - ((left + up) >> 1)
            else:
                p = left + up - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
                filt = cur - pred
            rows.append(bytes([ftype]) + bytes((filt & 0xFF).astype(np.uint8)))
        raw = zlib.compress(b"".join(rows))

        def chunk(t, b):
            crc = zlib.crc32(t + b) & 0xFFFFFFFF
            return len(b).to_bytes(4, "big") + t + b + crc.to_bytes(4, "big")

        ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
        png = M._PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw) + chunk(b"IEND", b"")
        dec = M._parse_png(png)
        assert (dec == arr).all(), f"filter {ftype}"


def test_png_rejects_unsupported():
    import zlib

    def chunk(t, b):
        crc = zlib.crc32(t + b) & 0xFFFFFFFF
        return len(b).to_bytes(4, "big") + t + b + crc.to_bytes(4, "big")

    def png_with(depth=8, color=2, interlace=0, raster=b"\x00" * 100):
        ihdr = (4).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes(
            [depth, color, 0, 0, interlace]
        )
        return (
            M._PNG_SIG
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raster))
            + chunk(b"IEND", b"")
        )

    for kw in ({"depth": 16}, {"color": 3}, {"interlace": 1}):
        with pytest.raises(ValueError):
            M._parse_png(png_with(**kw))
    with pytest.raises(ValueError):
        M._parse_png(b"\x89PNG\r\n\x1a\nnot-chunks")
    with pytest.raises(ValueError):
        M._parse_png(b"BM not a png")
    # truncated raster: 4x4 RGB needs 4*(12+1) bytes
    with pytest.raises(ValueError):
        M._parse_png(png_with(raster=b"\x00" * 10))


def test_png_through_real_decode_seam_and_probe(spark):
    arr = np.random.RandomState(3).randint(0, 256, size=(8, 5, 4), dtype=np.uint8)
    px, codec = M._real_decode(M.encode_png(arr))
    assert codec == "png" and (px == arr).all()
    rows = [(0, bytearray(M.encode_png(arr))), (1, bytearray(b"BM\x00\x00rest"))]
    df = spark.createDataFrame(rows, "doc_id long, image binary")
    got = {
        r["doc_id"]: r["codec"]
        for r in df.select("doc_id", M.detect_codec("image").alias("codec")).collect()
    }
    assert got[0] == "png" and got[1] == "bmp"


def test_attach_png_images_decode_stats(spark):
    """End-to-end over the fixture corpus: decode_images_real stats match
    the deterministic pixel field for PNG payloads (the oracle's maths)."""
    texts = ["png one", "png two", "png three"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in M.decode_images_real(M.attach_png_images(df)).collect()
    }
    for i, t in enumerate(texts):
        md5 = hashlib.md5(t.encode()).hexdigest()
        w = int(md5[0:2], 16) % 48 + 16
        h = int(md5[2:4], 16) % 48 + 16
        s = int(md5[4:6], 16)
        ch = {0: 1, 1: 3, 2: 4}[int(md5[7], 16) % 3]
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        c = np.arange(ch)[None, None, :]
        want = ((s + 3 * x + 7 * y + 11 * c) % 256).astype(np.int64)
        got = out[i]
        assert got["codec"] == "png"
        assert (got["width"], got["height"], got["channels"]) == (w, h, ch)
        assert got["px_sum"] == int(want.sum())
        assert got["px_wsum"] == int((want * (x + 2 * y + 3 * c)).sum())
        assert got["c0_sum"] == int(want[:, :, 0].sum())
