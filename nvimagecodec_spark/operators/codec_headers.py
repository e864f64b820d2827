"""Real-format image header parsers — the ``getImageInfo`` tier.

Mirrors the reference's parser plugin directory
(/root/reference/src/parsers/): each codec contributes ``canParse`` (a
magic-byte probe) and ``getImageInfo`` (header-only metadata extraction —
dimensions, component count, sample precision, progressive flag, EXIF
orientation) WITHOUT decoding any entropy-coded pixel data. This module
covers the four entropy-coded formats whose full decoders need codec
libraries absent from this container, completing the probe/parse half of
the reference's format matrix (decode for BMP/PNM/PNG lives in
``multimodal.py``):

- JPEG    — marker walk to SOFn (dims/precision/components, progressive =
            SOF2/6/10/14 family) + APP1 Exif orientation
            (/root/reference/src/parsers/jpeg.cpp:238-386)
- TIFF    — endian-aware IFD walk: tags 256/257 dims, 258 bits-per-sample,
            274 orientation, 277 samples-per-pixel
            (/root/reference/src/parsers/tiff.cpp:51-64)
- WebP    — RIFF chunk probe; VP8 lossy (sync 9D 01 2A, 14-bit LE dims),
            VP8L lossless (features bitfield, alpha bit 28), VP8X extended
            (24-bit LE dims, ALPHA flag 1<<4, EXIF chunk walk)
            (/root/reference/src/parsers/webp.cpp:98-140)
- JPEG2000— JP2 box walk (jp2h → ihdr: BE height/width/nc/bpc, size-22
            check) and raw codestream SOC+SIZ (Xsiz−XOsiz, Ssiz&0x7F + 1)
            (/root/reference/src/parsers/jpeg2k.cpp:245-300,539)

EXIF orientation codes map to (rotated°, flip_x, flip_y) exactly as the
reference's ``FromExifOrientation``
(/root/reference/src/parsers/exif_orientation.h:37-58): note 90° CW is
reported as rotated=270 (CCW convention) and codes 5/7 combine a rotation
with flip_y.

Spark shape: parsing is an Arrow-batched ``mapInPandas`` over the opaque
binary column — header bytes only are touched per row (the lazy-parse
contract, /root/reference/src/code_stream.cpp:201), so at 100 TB the cost
is O(rows · header_bytes), embarrassingly parallel, no shuffle. The
builders exist so tests and the DuckDB oracle can derive every expected
field from md5 arithmetic without an external codec library: the payloads
they emit are structurally genuine containers (real marker segments, real
IFDs, real RIFF/box layouts) that any external parser opens.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "exif_to_orientation",
    "build_jpeg",
    "build_tiff",
    "build_webp",
    "build_jp2",
    "parse_jpeg_info",
    "parse_tiff_info",
    "parse_webp_info",
    "parse_jp2_info",
    "probe_codec_bytes",
    "parse_image_headers",
    "attach_codec_headers",
]


# --------------------------------------------------------------- orientation

#: EXIF code → (rotated degrees CCW, flip_x, flip_y); identical table to the
#: reference's FromExifOrientation (exif_orientation.h:37-58).
_EXIF_ORIENTATION = {
    1: (0, False, False),
    2: (0, True, False),
    3: (180, False, False),
    4: (0, False, True),
    5: (90, False, True),
    6: (270, False, False),
    7: (270, False, True),
    8: (90, False, False),
}


def exif_to_orientation(code: int) -> tuple:
    """EXIF orientation code (1-8) → (rotated, flip_x, flip_y); unknown
    codes fall back to identity, like the reference's default branch."""
    return _EXIF_ORIENTATION.get(code, (0, False, False))


def _tiff_ifd(entries, little_endian: bool) -> bytes:
    """Minimal well-formed TIFF stream: header + one IFD whose entries all
    fit inline (count 1, SHORT type 3 / LONG type 4). ``entries`` must be
    ascending by tag (TIFF 6.0 §2)."""
    e = "<" if little_endian else ">"
    out = (b"II*\x00" if little_endian else b"MM\x00*") + struct.pack(e + "I", 8)
    out += struct.pack(e + "H", len(entries))
    for tag, typ, val in entries:
        out += struct.pack(e + "HHI", tag, typ, 1)
        if typ == 3:  # SHORT: value left-justified in the 4-byte field
            out += struct.pack(e + "HH", val, 0)
        else:  # LONG
            out += struct.pack(e + "I", val)
    out += struct.pack(e + "I", 0)  # next-IFD terminator
    return out


def _parse_tiff_tags(b: bytes) -> Optional[dict]:
    """Endian-aware IFD walk over a TIFF stream; returns {tag: int} for
    inline SHORT/LONG count-1 entries, or None on a malformed stream."""
    if len(b) < 8:
        return None
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        return None
    (ifd_off,) = struct.unpack_from(e + "I", b, 4)
    if ifd_off + 2 > len(b):
        return None
    (n_entries,) = struct.unpack_from(e + "H", b, ifd_off)
    tags: dict = {}
    pos = ifd_off + 2
    for _ in range(n_entries):
        if pos + 12 > len(b):
            return None
        tag, typ, cnt = struct.unpack_from(e + "HHI", b, pos)
        if cnt == 1 and typ == 3:
            (val,) = struct.unpack_from(e + "H", b, pos + 8)
            tags[tag] = val
        elif cnt == 1 and typ == 4:
            (val,) = struct.unpack_from(e + "I", b, pos + 8)
            tags[tag] = val
        pos += 12
    return tags


# ------------------------------------------------------------------ builders

def build_jpeg(
    w: int, h: int, channels: int = 3, progressive: bool = False, orientation: int = 1
) -> bytes:
    """Structurally genuine JPEG header stream: SOI, APP0/JFIF, APP1/Exif
    (big-endian TIFF IFD carrying tag 0x0112), a DQT filler segment, SOF0
    (baseline) or SOF2 (progressive), EOI. No entropy data — the parser
    tier never reads past SOF (jpeg.cpp:269 stops once shape+orientation
    are in hand)."""
    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    app1 = b"Exif\x00\x00" + _tiff_ifd([(0x0112, 3, orientation)], little_endian=False)
    out += b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof = struct.pack(">BHHB", 8, h, w, channels)
    for i in range(channels):
        sof += bytes([i + 1, 0x11, 0])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0")
    out += struct.pack(">H", len(sof) + 2) + sof
    out += b"\xff\xd9"
    return bytes(out)


def build_tiff(
    w: int,
    h: int,
    channels: int = 3,
    bits_per_sample: int = 8,
    orientation: int = 1,
    little_endian: bool = True,
) -> bytes:
    """Minimal genuine TIFF: header (II or MM) + one IFD with the tag set
    the reference parser reads (tiff.cpp:51-64), ascending tag order."""
    return _tiff_ifd(
        [
            (256, 4, w),  # ImageWidth
            (257, 4, h),  # ImageLength
            (258, 3, bits_per_sample),
            (262, 3, 2 if channels >= 3 else 1),  # PhotometricInterpretation
            (274, 3, orientation),
            (277, 3, channels),  # SamplesPerPixel
        ],
        little_endian=little_endian,
    )


def build_webp(
    w: int, h: int, variant: int = 0, alpha: bool = False, orientation: int = 1
) -> bytes:
    """Genuine RIFF/WEBP container. variant: 0 = VP8 (lossy), 1 = VP8L
    (lossless), 2 = VP8X (extended; carries the ALPHA layout flag and — when
    orientation != 1 — a trailing EXIF chunk, the path webp.cpp:136-162
    walks). VP8 ignores ``alpha`` (lossy WebP has no alpha plane)."""
    if variant == 0:
        body = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", w, h) + bytes(8)
        chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    elif variant == 1:
        features = (w - 1) | ((h - 1) << 14) | (int(alpha) << 28)
        body = b"\x2f" + struct.pack("<I", features) + bytes(5)
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    else:
        flags = (0x10 if alpha else 0) | (0x08 if orientation != 1 else 0)
        body = (
            bytes([flags])
            + bytes(3)
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
        )
        chunk = b"VP8X" + struct.pack("<I", len(body)) + body
        if orientation != 1:
            exif = _tiff_ifd([(0x0112, 3, orientation)], little_endian=False)
            chunk += b"EXIF" + struct.pack("<I", len(exif)) + exif
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _jp2_box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def build_jp2(
    w: int, h: int, nc: int = 3, bpc: int = 8, raw_codestream: bool = False
) -> bytes:
    """Genuine JPEG2000 stream, either boxed JP2 (signature + ftyp + jp2h
    superbox with size-22 ihdr + colr) or a raw codestream (SOC + SIZ).
    Ssiz / ihdr bpc fields store bits−1 per ISO 15444-1; the parser adds
    it back (jpeg2k.cpp:539)."""
    if raw_codestream:
        siz = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0, nc)
        siz += bytes([bpc - 1, 1, 1]) * nc
        return b"\xff\x4f\xff\x51" + struct.pack(">H", len(siz) + 2) + siz + b"\xff\xd9"
    sig = _jp2_box(b"jP  ", b"\x0d\x0a\x87\x0a")
    ftyp = _jp2_box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    ihdr = _jp2_box(b"ihdr", struct.pack(">IIHBBBB", h, w, nc, bpc - 1, 7, 0, 0))
    colr = _jp2_box(b"colr", bytes([1, 0, 0]) + struct.pack(">I", 16 if nc >= 3 else 17))
    jp2c = _jp2_box(b"jp2c", b"\xff\x4f\xff\xd9")
    return sig + ftyp + _jp2_box(b"jp2h", ihdr + colr) + jp2c


# ------------------------------------------------------------------- parsers

#: SOF markers carrying frame headers; C4/C8/CC are DHT/JPG/DAC, not frames.
_SOF_MARKERS = frozenset(
    (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
)
_PROGRESSIVE_SOF = frozenset((0xC2, 0xC6, 0xCA, 0xCE))


def parse_jpeg_info(b: bytes) -> Optional[dict]:
    """Marker walk to the frame header (jpeg.cpp:238-386): skips every
    length-prefixed segment, pulls orientation from an APP1 Exif TIFF blob
    on the way, stops at SOS/EOI. Returns None on truncated or malformed
    streams (the dead-letter disposition)."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    pos = 2
    orientation = 1
    found = None
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone markers
            continue
        if pos + 2 > len(b):
            return None
        (seglen,) = struct.unpack_from(">H", b, pos)
        if seglen < 2 or pos + seglen > len(b):
            return None
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            tags = _parse_tiff_tags(seg[6:])
            if tags and 0x0112 in tags:
                orientation = tags[0x0112]
        if marker in _SOF_MARKERS:
            if len(seg) < 6:
                return None
            precision, height, width, ncomp = struct.unpack_from(">BHHB", seg, 0)
            found = {
                "codec": "jpeg",
                "width": width,
                "height": height,
                "channels": ncomp,
                "precision": precision,
                "progressive": marker in _PROGRESSIVE_SOF,
            }
        if marker == 0xDA:  # SOS: entropy-coded data follows
            break
        pos += seglen
    if found is None:
        return None
    found["orientation"] = orientation
    return found


def parse_tiff_info(b: bytes) -> Optional[dict]:
    """Endian-aware first-IFD walk (tiff.cpp:119-160). Width/height are
    required; samples-per-pixel defaults to 1 and bits-per-sample to 1 per
    TIFF 6.0 when the tags are absent."""
    tags = _parse_tiff_tags(b)
    if tags is None or 256 not in tags or 257 not in tags:
        return None
    return {
        "codec": "tiff",
        "width": tags[256],
        "height": tags[257],
        "channels": tags.get(277, 1),
        "precision": tags.get(258, 1),
        "progressive": False,
        "orientation": tags.get(274, 1),
    }


def parse_webp_info(b: bytes) -> Optional[dict]:
    """RIFF/WEBP chunk parse, all three stills variants (webp.cpp:98-162);
    VP8X walks trailing chunks for EXIF when the layout flag says so."""
    if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    ctype = b[12:16]
    (csize,) = struct.unpack_from("<I", b, 16)
    body_at = 20
    mask14 = (1 << 14) - 1
    alpha = False
    orientation = 1
    if ctype == b"VP8 ":
        # 3-byte frame tag, then the 9D 01 2A sync code, then 14-bit LE dims
        if body_at + 10 > len(b) or b[body_at + 3 : body_at + 6] != b"\x9d\x01\x2a":
            return None
        w, h = struct.unpack_from("<HH", b, body_at + 6)
        width, height = w & mask14, h & mask14
    elif ctype == b"VP8L":
        if body_at + 5 > len(b) or b[body_at] != 0x2F:
            return None
        (features,) = struct.unpack_from("<I", b, body_at + 1)
        width = (features & mask14) + 1
        height = ((features >> 14) & mask14) + 1
        alpha = bool(features & (1 << 28))
    elif ctype == b"VP8X":
        if body_at + 10 > len(b):
            return None
        flags = b[body_at]
        width = int.from_bytes(b[body_at + 4 : body_at + 7], "little") + 1
        height = int.from_bytes(b[body_at + 7 : body_at + 10], "little") + 1
        alpha = bool(flags & 0x10)
        if flags & 0x08:  # EXIF_METADATA layout flag: walk trailing chunks
            pos = body_at + csize + (csize & 1)
            while pos + 8 <= len(b):
                tag = b[pos : pos + 4]
                (size,) = struct.unpack_from("<I", b, pos + 4)
                if tag == b"EXIF":
                    blob = b[pos + 8 : pos + 8 + size]
                    if blob[:6] == b"Exif\x00\x00":  # optional prefix
                        blob = blob[6:]
                    tags = _parse_tiff_tags(blob)
                    if tags and 0x0112 in tags:
                        orientation = tags[0x0112]
                    break
                pos += 8 + size + (size & 1)
    else:
        return None
    return {
        "codec": "webp",
        "width": width,
        "height": height,
        "channels": 3 + int(alpha),
        "precision": 8,
        "progressive": False,
        "orientation": orientation,
    }


_JP2_SIGNATURE = b"\x00\x00\x00\x0cjP  \x0d\x0a\x87\x0a"


def parse_jp2_info(b: bytes) -> Optional[dict]:
    """JP2 box walk to jp2h/ihdr (size-22 check, jpeg2k.cpp:285-300) or raw
    codestream SOC+SIZ (width = Xsiz−XOsiz, precision = (Ssiz&0x7F)+1,
    jpeg2k.cpp:399-447,539)."""
    if b[:4] == b"\xff\x4f\xff\x51":  # raw codestream: SOC + SIZ
        if len(b) < 6 + 38:
            return None
        (_rsiz, xsiz, ysiz, xosiz, yosiz) = struct.unpack_from(">HIIII", b, 6)
        (csiz,) = struct.unpack_from(">H", b, 40)
        if csiz < 1 or 42 + 3 * csiz > len(b):
            return None
        ssiz = b[42]
        return {
            "codec": "jpeg2k",
            "width": xsiz - xosiz,
            "height": ysiz - yosiz,
            "channels": csiz,
            "precision": (ssiz & 0x7F) + 1,
            "progressive": False,
            "orientation": 1,
        }
    if b[:12] != _JP2_SIGNATURE:
        return None
    pos = 0
    while pos + 8 <= len(b):
        (size,) = struct.unpack_from(">I", b, pos)
        btype = b[pos + 4 : pos + 8]
        if size == 0:  # box extends to end of file (ISO 15444-1 I.4)
            size = len(b) - pos
        if size < 8 or pos + size > len(b):
            return None
        if btype == b"jp2h":
            sub = pos + 8
            end = pos + size
            while sub + 8 <= end:
                (ssize,) = struct.unpack_from(">I", b, sub)
                stype = b[sub + 4 : sub + 8]
                if ssize == 0:
                    ssize = end - sub
                if ssize < 8 or sub + ssize > end:
                    return None
                if stype == b"ihdr":
                    if ssize != 22:  # jpeg2k.cpp:286 rejects non-22 ihdr
                        return None
                    height, width, nc, bpc = struct.unpack_from(">IIHB", b, sub + 8)
                    return {
                        "codec": "jpeg2k",
                        "width": width,
                        "height": height,
                        "channels": nc,
                        "precision": (bpc & 0x7F) + 1,
                        "progressive": False,
                        "orientation": 1,
                    }
                sub += ssize
            return None
        pos += size
    return None


def probe_codec_bytes(b: bytes) -> Optional[str]:
    """Python-side canParse probe chain, JPEG forced to the front like the
    reference registry (/root/reference/src/codec_registry.cpp:38-43)."""
    if len(b) >= 3 and b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if len(b) >= 4 and b[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return "webp"
    if b[:12] == _JP2_SIGNATURE or b[:4] == b"\xff\x4f\xff\x51":
        return "jpeg2k"
    return None


_PARSERS = {
    "jpeg": parse_jpeg_info,
    "tiff": parse_tiff_info,
    "webp": parse_webp_info,
    "jpeg2k": parse_jp2_info,
}


# --------------------------------------------------------------- Spark tier

_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("precision", T.IntegerType()),
        T.StructField("progressive", T.IntegerType()),
        T.StructField("rotated", T.IntegerType()),
        T.StructField("flip_x", T.IntegerType()),
        T.StructField("flip_y", T.IntegerType()),
    ]
)


def parse_image_headers(
    df: DataFrame, binary_col: str = "image", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched getImageInfo over an opaque binary column: probe the
    magic, run the matching header parser, convert EXIF orientation to the
    reference's (rotated, flip_x, flip_y) triple. Unparseable payloads emit
    a row with NULL fields (dead-letter disposition, row count preserved).
    Header bytes only — never the payload — so the 100-TB cost is a narrow
    map, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(payload) if payload is not None else b""
                codec = probe_codec_bytes(b)
                info = _PARSERS[codec](b) if codec else None
                if info is None:
                    rows.append((int(did),) + (None,) * 9)
                    continue
                rot, fx, fy = exif_to_orientation(info["orientation"])
                rows.append(
                    (
                        int(did),
                        info["codec"],
                        info["width"],
                        info["height"],
                        info["channels"],
                        info["precision"],
                        int(info["progressive"]),
                        rot,
                        int(fx),
                        int(fy),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _HEADER_SCHEMA.fields])

    return df.select(id_col, binary_col).mapInPandas(batches, schema=_HEADER_SCHEMA)


def header_params_from_md5(md5: str) -> dict:
    """Deterministic fixture parameters from an md5 hex digest — the single
    source of truth the DuckDB oracle mirrors in SQL (1-based substring
    positions: w 1-2, h 3-4, fmt 9, orient 10, chsel 11, varsel 12)."""
    w = int(md5[0:2], 16) % 48 + 16
    h = int(md5[2:4], 16) % 48 + 16
    fmt = int(md5[8], 16) % 4  # 0 jpeg, 1 tiff, 2 webp, 3 jpeg2k
    orient = int(md5[9], 16) % 8 + 1
    chsel = int(md5[10], 16)
    varsel = int(md5[11], 16)
    if fmt == 0:
        return dict(
            fmt="jpeg",
            w=w,
            h=h,
            channels=1 if chsel % 2 == 0 else 3,
            progressive=varsel % 2 == 1,
            orientation=orient,
        )
    if fmt == 1:
        return dict(
            fmt="tiff",
            w=w,
            h=h,
            channels=1 if chsel % 2 == 0 else 3,
            bits_per_sample=8 if varsel % 2 == 0 else 16,
            little_endian=varsel < 8,
            orientation=orient,
        )
    if fmt == 2:
        variant = varsel % 3
        return dict(
            fmt="webp",
            w=w,
            h=h,
            variant=variant,
            alpha=chsel % 2 == 1 and variant != 0,
            orientation=orient if variant == 2 else 1,
        )
    return dict(
        fmt="jpeg2k",
        w=w,
        h=h,
        nc={0: 1, 1: 3, 2: 4}[chsel % 3],
        bpc=8 if chsel < 8 else 16,
        raw_codestream=varsel % 2 == 1,
    )


def _build_from_params(p: dict) -> bytes:
    if p["fmt"] == "jpeg":
        return build_jpeg(p["w"], p["h"], p["channels"], p["progressive"], p["orientation"])
    if p["fmt"] == "tiff":
        return build_tiff(
            p["w"], p["h"], p["channels"], p["bits_per_sample"], p["orientation"],
            p["little_endian"],
        )
    if p["fmt"] == "webp":
        return build_webp(p["w"], p["h"], p["variant"], p["alpha"], p["orientation"])
    return build_jp2(p["w"], p["h"], p["nc"], p["bpc"], p["raw_codestream"])


def attach_codec_headers(
    df: DataFrame, text_col: str = "text", out_col: str = "image"
) -> DataFrame:
    """Mixed-real-format fixture generator: one genuine JPEG / TIFF / WebP /
    JPEG2000 container per row, every parameter (format, dims, channels,
    precision, progressive, endianness, variant, orientation) derived from
    md5 nibbles of the text — the reference's mixed resource corpus
    analog (/root/reference/resources/), Arrow-batched."""
    import hashlib

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.BinaryType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for txt in pdf[text_col]:
                md5 = hashlib.md5(str(txt).encode("utf-8")).hexdigest()
                payloads.append(_build_from_params(header_params_from_md5(md5)))
            out = pdf.copy()
            out[out_col] = payloads
            yield out

    return df.mapInPandas(batches, schema=out_schema)
