"""DICOM source/sink tools — the exotic-connector row (SURVEY §2.1 S10).

Analog of the reference's pydicom-based DICOM toolchain
(/root/reference/python/nvidia/nvimgcodec/tools/dicom/convert_htj2k.py:45-81
and dicom_utils.py): read a directory of DICOM Part 10 files, extract image
metadata + pixel data, transcode to a compressed transfer syntax, write
back. The reference compresses pixel data to HTJ2K via nvimgcodec; this
sandbox has no entropy codec library, so the transcode target is DICOM's
own **Deflated Explicit VR Little Endian** transfer syntax
(UID 1.2.840.10008.1.2.1.99: the entire post-file-meta dataset is one raw
zlib-DEFLATE stream, PS3.5 §A.5) — a genuine standards-conformant
compression round-trip using stdlib zlib, no pydicom required.

Everything here is implemented from the public DICOM PS3.10/PS3.5 layout:

- Part 10 header: 128-byte preamble + ``DICM`` + File Meta group (0002,*)
  always in Explicit VR Little Endian, prefixed by the group-length
  element (0002,0000) UL.
- Explicit VR Little Endian dataset elements: tag (group LE16, element
  LE16) + 2-byte VR; OB/OW/OF/SQ/UT/UN carry 2 reserved bytes + 4-byte
  length, every other VR a 2-byte length.
- Image module tags: (0028,0002) SamplesPerPixel, (0028,0010) Rows,
  (0028,0011) Columns, (0028,0100) BitsAllocated, (7FE0,0010) PixelData.

Spark shape: directory ingest uses the built-in ``binaryFile`` source
(path/length pruned by Catalyst) and all parse/transcode work is
Arrow-batched ``mapInPandas`` — per-file independent, no shuffle, so a
100-TB DICOM archive maps linearly across executors.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "EXPLICIT_VR_LE",
    "DEFLATED_EXPLICIT_VR_LE",
    "build_dicom",
    "parse_dicom",
    "transcode_deflated",
    "transcode_inflated",
    "read_dicom_dir",
    "parse_dicom_files",
    "attach_dicom",
    "dicom_pixel_stats",
]

EXPLICIT_VR_LE = "1.2.840.10008.1.2.1"
DEFLATED_EXPLICIT_VR_LE = "1.2.840.10008.1.2.1.99"

#: VRs whose explicit-VR encoding carries 2 reserved bytes + 32-bit length.
_LONG_VRS = frozenset((b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN"))

_TAG_SOP_UID = (0x0008, 0x0018)
_TAG_PATIENT_ID = (0x0010, 0x0020)
_TAG_SAMPLES = (0x0028, 0x0002)
_TAG_ROWS = (0x0028, 0x0010)
_TAG_COLS = (0x0028, 0x0011)
_TAG_BITS = (0x0028, 0x0100)
_TAG_PIXELDATA = (0x7FE0, 0x0010)


def _element(group: int, elem: int, vr: bytes, value: bytes) -> bytes:
    """One Explicit-VR-LE data element; string values are even-padded."""
    if len(value) % 2:
        value += b"\x00"
    head = struct.pack("<HH", group, elem) + vr
    if vr in _LONG_VRS:
        return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + struct.pack("<H", len(value)) + value


def _ui(s: str) -> bytes:
    return s.encode("ascii")


def build_dicom(
    rows: int,
    cols: int,
    pixels: bytes,
    samples_per_pixel: int = 1,
    bits_allocated: int = 8,
    sop_uid: str = "1.2.3.4.5",
    patient_id: str = "ANON",
    transfer_syntax: str = EXPLICIT_VR_LE,
) -> bytes:
    """Genuine DICOM Part 10 stream: preamble + DICM + file meta group +
    dataset. ``transfer_syntax`` DEFLATED deflates the dataset (PS3.5
    §A.5: raw deflate, no zlib header)."""
    meta_body = _element(0x0002, 0x0001, b"OB", b"\x00\x01")  # version
    meta_body += _element(0x0002, 0x0003, b"UI", _ui(sop_uid))
    meta_body += _element(0x0002, 0x0010, b"UI", _ui(transfer_syntax))
    meta = _element(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body)))
    dataset = _element(*_TAG_SOP_UID, b"UI", _ui(sop_uid))
    dataset += _element(*_TAG_PATIENT_ID, b"LO", patient_id.encode("ascii"))
    dataset += _element(*_TAG_SAMPLES, b"US", struct.pack("<H", samples_per_pixel))
    dataset += _element(*_TAG_ROWS, b"US", struct.pack("<H", rows))
    dataset += _element(*_TAG_COLS, b"US", struct.pack("<H", cols))
    dataset += _element(*_TAG_BITS, b"US", struct.pack("<H", bits_allocated))
    dataset += _element(*_TAG_PIXELDATA, b"OW", pixels)
    if transfer_syntax == DEFLATED_EXPLICIT_VR_LE:
        co = zlib.compressobj(9, zlib.DEFLATED, -zlib.MAX_WBITS)  # raw deflate
        dataset = co.compress(dataset) + co.flush()
    return bytes(128) + b"DICM" + meta + meta_body + dataset


def _walk_elements(b: bytes, want: dict, pos: int = 0) -> Optional[dict]:
    """Explicit-VR-LE element walk collecting ``want``-ed tags; returns
    {tag: raw_value_bytes} or None on a malformed stream."""
    out: dict = {}
    remaining = set(want)
    while pos + 8 <= len(b) and remaining:
        group, elem = struct.unpack_from("<HH", b, pos)
        vr = b[pos + 4 : pos + 6]
        if not (b"AA" <= vr <= b"ZZ"):  # implicit VR / garbage
            return None
        if vr in _LONG_VRS:
            if pos + 12 > len(b):
                return None
            (length,) = struct.unpack_from("<I", b, pos + 8)
            val_at = pos + 12
        else:
            (length,) = struct.unpack_from("<H", b, pos + 6)
            val_at = pos + 8
        if length == 0xFFFFFFFF or val_at + length > len(b):
            return None  # undefined lengths (encapsulation) unsupported
        tag = (group, elem)
        if tag in remaining:
            out[tag] = b[val_at : val_at + length]
            remaining.discard(tag)
        pos = val_at + length
    return out if not remaining else None


def _split_part10(b: bytes):
    """→ (file_meta_dict, dataset_bytes, transfer_syntax) or None."""
    if len(b) < 132 + 12 or b[128:132] != b"DICM":
        return None
    pos = 132
    # (0002,0000) group length: how many bytes of file meta follow it
    group, elem = struct.unpack_from("<HH", b, pos)
    vr = b[pos + 4 : pos + 6]
    if (group, elem) != (0x0002, 0x0000) or vr != b"UL":
        return None
    (gl_len,) = struct.unpack_from("<H", b, pos + 6)
    if gl_len != 4 or pos + 12 > len(b):
        return None
    (meta_len,) = struct.unpack_from("<I", b, pos + 8)
    meta_at = pos + 12
    if meta_at + meta_len > len(b):
        return None
    meta = _walk_elements(b[meta_at : meta_at + meta_len], {(0x0002, 0x0010)})
    if meta is None:
        return None
    ts = meta[(0x0002, 0x0010)].rstrip(b"\x00").decode("ascii", "replace")
    return meta, b[meta_at + meta_len :], ts


def parse_dicom(b: bytes) -> Optional[dict]:
    """Part 10 parse → metadata + raw pixel bytes; inflates a deflated
    dataset transparently. None on malformed streams (dead-letter)."""
    split = _split_part10(b)
    if split is None:
        return None
    _meta, dataset, ts = split
    if ts == DEFLATED_EXPLICIT_VR_LE:
        try:
            dataset = zlib.decompress(dataset, -zlib.MAX_WBITS)
        except zlib.error:
            return None
    elif ts != EXPLICIT_VR_LE:
        return None  # implicit VR / encapsulated syntaxes unsupported
    tags = _walk_elements(
        dataset,
        {
            _TAG_SOP_UID,
            _TAG_PATIENT_ID,
            _TAG_SAMPLES,
            _TAG_ROWS,
            _TAG_COLS,
            _TAG_BITS,
            _TAG_PIXELDATA,
        },
    )
    if tags is None:
        return None
    (spp,) = struct.unpack("<H", tags[_TAG_SAMPLES])
    (rows,) = struct.unpack("<H", tags[_TAG_ROWS])
    (cols,) = struct.unpack("<H", tags[_TAG_COLS])
    (bits,) = struct.unpack("<H", tags[_TAG_BITS])
    pixels = tags[_TAG_PIXELDATA]
    if bits != 8 or len(pixels) < rows * cols * spp:
        return None
    return {
        "sop_uid": tags[_TAG_SOP_UID].rstrip(b"\x00").decode("ascii", "replace"),
        "patient_id": tags[_TAG_PATIENT_ID].rstrip(b"\x00 ").decode("ascii", "replace"),
        "rows": rows,
        "cols": cols,
        "samples_per_pixel": spp,
        "bits_allocated": bits,
        "transfer_syntax": ts,
        "pixels": pixels[: rows * cols * spp],
    }


def _retranscode(b: bytes, target_ts: str) -> Optional[bytes]:
    info = parse_dicom(b)
    if info is None:
        return None
    return build_dicom(
        info["rows"],
        info["cols"],
        info["pixels"],
        samples_per_pixel=info["samples_per_pixel"],
        bits_allocated=info["bits_allocated"],
        sop_uid=info["sop_uid"],
        patient_id=info["patient_id"],
        transfer_syntax=target_ts,
    )


def transcode_deflated(b: bytes) -> Optional[bytes]:
    """Uncompressed → Deflated transfer syntax (the convert_htj2k.py
    read→compress→rewrite shape, with DEFLATE standing in for HTJ2K)."""
    return _retranscode(b, DEFLATED_EXPLICIT_VR_LE)


def transcode_inflated(b: bytes) -> Optional[bytes]:
    """Deflated → uncompressed Explicit VR LE (the decode direction)."""
    return _retranscode(b, EXPLICIT_VR_LE)


def transcode_dicom(
    df: DataFrame,
    binary_col: str = "dicom",
    target: str = DEFLATED_EXPLICIT_VR_LE,
) -> DataFrame:
    """Arrow-batched per-file transcode (the tool's batch loop,
    convert_htj2k.py:45-81): re-encodes every payload under ``target``
    transfer syntax in place; unparseable payloads become NULL."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out[binary_col] = [
                _retranscode(bytes(v), target) if v is not None else None
                for v in pdf[binary_col]
            ]
            yield out

    return df.mapInPandas(batches, schema=df.schema)


# --------------------------------------------------------------- Spark tier

_DICOM_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("sop_uid", T.StringType()),
        T.StructField("patient_id", T.StringType()),
        T.StructField("rows", T.IntegerType()),
        T.StructField("cols", T.IntegerType()),
        T.StructField("samples_per_pixel", T.IntegerType()),
        T.StructField("transfer_syntax", T.StringType()),
        T.StructField("pixel_bytes", T.IntegerType()),
    ]
)


def read_dicom_dir(spark: SparkSession, path: str) -> DataFrame:
    """Directory scan via the built-in binaryFile source (the plugin
    directory-scan analog, /root/reference/src/plugin_framework.cpp:315):
    one row per ``*.dcm`` file with (path, modificationTime, length,
    content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.dcm")
        .load(path)
    )


def parse_dicom_files(df: DataFrame, content_col: str = "content") -> DataFrame:
    """binaryFile rows → parsed DICOM metadata (header-only projection;
    pixel payload is measured, not shipped). Malformed files dead-letter
    as NULL-metadata rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf[content_col]):
                info = parse_dicom(bytes(content))
                if info is None:
                    rows.append((path,) + (None,) * 7)
                else:
                    rows.append(
                        (
                            path,
                            info["sop_uid"],
                            info["patient_id"],
                            info["rows"],
                            info["cols"],
                            info["samples_per_pixel"],
                            info["transfer_syntax"],
                            len(info["pixels"]),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _DICOM_META_SCHEMA.fields]
            )

    return df.select("path", content_col).mapInPandas(
        batches, schema=_DICOM_META_SCHEMA
    )


def attach_dicom(
    df: DataFrame, text_col: str = "text", out_col: str = "dicom"
) -> DataFrame:
    """Deterministic DICOM fixture generator: one genuine uncompressed
    Part 10 file per row — dims from the shared md5 formula (w 1-2, h 3-4,
    seed 5-6), gray/RGB from nibble 13, pixel field (s+3x+7y+11c) mod 256,
    SOP UID derived from the md5 — the mixed-resource-corpus analog."""
    import hashlib

    import numpy as np

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.BinaryType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for txt in pdf[text_col]:
                md5 = hashlib.md5(str(txt).encode("utf-8")).hexdigest()
                w = int(md5[0:2], 16) % 48 + 16
                h = int(md5[2:4], 16) % 48 + 16
                s = int(md5[4:6], 16)
                spp = 1 if int(md5[12], 16) % 2 == 0 else 3
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)
                c = np.arange(spp, dtype=np.int64)
                arr = (
                    (s + 3 * x[None, :, None] + 7 * y[:, None, None] + 11 * c[None, None, :])
                    % 256
                ).astype("uint8")
                payloads.append(
                    build_dicom(
                        h,
                        w,
                        arr.tobytes(),
                        samples_per_pixel=spp,
                        sop_uid="2.25." + str(int(md5[:14], 16)),
                    )
                )
            out = pdf.copy()
            out[out_col] = payloads
            yield out

    return df.mapInPandas(batches, schema=out_schema)


_PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("px_wsum", T.LongType()),
        T.StructField("c0_sum", T.LongType()),
    ]
)


def dicom_pixel_stats(
    df: DataFrame, binary_col: str = "dicom", id_col: str = "doc_id"
) -> DataFrame:
    """Full DICOM decode → the same order-sensitive pixel stats as
    ``decode_images_real`` (px_sum / px_wsum / c0_sum), so the DuckDB
    oracle recomputes them from the deterministic pixel field without a
    DICOM library. codec column carries 'dicom' / 'dicom-deflated' by the
    file's transfer syntax — proving which wire form was actually read."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[binary_col]):
                info = parse_dicom(bytes(payload))
                if info is None:
                    rows.append((int(did),) + (None,) * 7)
                    continue
                h, w, spp = info["rows"], info["cols"], info["samples_per_pixel"]
                arr = np.frombuffer(info["pixels"], dtype=np.uint8).astype(np.int64)
                arr = arr.reshape(h, w, spp)
                x = np.arange(w, dtype=np.int64)[None, :, None]
                y = np.arange(h, dtype=np.int64)[:, None, None]
                c = np.arange(spp, dtype=np.int64)[None, None, :]
                weight = x + 2 * y + 3 * c
                codec = (
                    "dicom-deflated"
                    if info["transfer_syntax"] == DEFLATED_EXPLICIT_VR_LE
                    else "dicom"
                )
                rows.append(
                    (
                        int(did),
                        codec,
                        w,
                        h,
                        spp,
                        int(arr.sum()),
                        int((arr * weight).sum()),
                        int(arr[:, :, 0].sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _PIXEL_STATS_SCHEMA.fields]
            )

    return df.select(id_col, binary_col).mapInPandas(
        batches, schema=_PIXEL_STATS_SCHEMA
    )
