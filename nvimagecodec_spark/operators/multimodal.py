"""Multimodal (image/audio/video) columns — the reference's core domain
re-expressed for Spark: opaque ``binary`` payload columns with typed
metadata, format detection by magic-byte probe, lazy metadata extraction,
batched decode via Arrow, and container frame iteration.

Reference parity map:

- format probe by magic bytes  ↔ ``canParse`` loops per parser factory
  (/root/reference/src/codec.cpp:32-44; JPEG SOI probe
  /root/reference/src/parsers/jpeg.cpp:146)
- header → typed metadata      ↔ ``getImageInfo``
  (/root/reference/src/parsers/jpeg.cpp:238-352)
- batched decode               ↔ ``decodeBatch``
  (/root/reference/extensions/nvjpeg/hw_decoder.cpp:636) — here an
  Arrow-batched ``mapInPandas`` (the batch IS the minibatch)
- resize/transcode             ↔ encoder tier
  (/root/reference/extensions/nvjpeg/cuda_encoder.cpp)
- multi-frame containers       ↔ TIFF pagination / ``next_bitstream_offset``
  (/root/reference/include/nvimgcodec.h:601-612)

Since no image/audio codec library ships in this container, payloads use
the deterministic FAKE codec family below; the *Spark plumbing* — binary
schema, probe expressions, mapInPandas signatures, Arrow batch shapes,
partitioning — is real and tested. Swapping in a real decoder is a
one-function change (see ``decode_images``'s ``_real_decode`` seam).

FAKE codec layout (big-endian):

  FIMG (image):  magic 'FIMG' | width:int32 | height:int32 | channels:uint8
                 | payload: md5(text) = 16 bytes (stands in for entropy-
                 coded pixel data)
  FVID (video):  magic 'FVID' | width:int32 | height:int32 | n_frames:uint8
                 | n_frames × 16-byte frame payloads (md5(text|frame_idx))
  FAUD (audio):  magic 'FAUD' | sample_rate:int32 | duration_ms:int32
                 | channels:uint8 | payload: md5(text) = 16 bytes (stands
                 in for the encoded waveform)

Every derived quantity is md5-based so a DuckDB oracle can recompute it
from the source text without ever seeing the binary. The audio tier gives
the multimodal family its third format the way the reference ships many
parser plugins (/root/reference/extensions/ — nvjpeg, nvjpeg2k, nvtiff,
...): same probe chain, same lazy header-only metadata, same Arrow-batched
content tier (windowed waveform stats ↔ frame sampling).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC_IMAGE = "FIMG"
MAGIC_VIDEO = "FVID"
MAGIC_AUDIO = "FAUD"
_MAGIC_HEX = {MAGIC_IMAGE: "46494D47", MAGIC_VIDEO: "46564944", MAGIC_AUDIO: "46415544"}


def _hx(col: Column, start: int, n: int) -> Column:
    """int value of `n` hex chars of md5 starting at 1-based `start`."""
    return F.conv(F.substring(col, start, n), 16, 10).cast("long")


def _dim_exprs(text_col: str) -> tuple[Column, Column]:
    md5 = F.md5(F.col(text_col))
    width = (_hx(md5, 1, 2) % 48 + 16).cast("int")
    height = (_hx(md5, 3, 2) % 48 + 16).cast("int")
    return width, height


def attach_fake_images(df: DataFrame, text_col: str = "text", out_col: str = "image") -> DataFrame:
    """Deterministic binary image column derived from a text column — the
    fixture generator (analog of the reference's checked-in resource corpus
    /root/reference/resources/). Built entirely JVM-side (hex → unhex)."""
    width, height = _dim_exprs(text_col)
    md5 = F.md5(F.col(text_col))
    header_hex = F.concat(
        F.lit(_MAGIC_HEX[MAGIC_IMAGE]),
        F.lpad(F.hex(width), 8, "0"),
        F.lpad(F.hex(height), 8, "0"),
        F.lit("03"),  # channels = 3
        md5,  # 16-byte payload
    )
    return df.withColumn(out_col, F.unhex(header_hex))


def attach_fake_videos(df: DataFrame, text_col: str = "text", out_col: str = "video") -> DataFrame:
    """Deterministic multi-frame binary container (1-8 frames)."""
    width, height = _dim_exprs(text_col)
    md5 = F.md5(F.col(text_col))
    n_frames = (_hx(md5, 5, 2) % 8 + 1).cast("int")
    frames_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_frames - 1),
            lambda i: F.md5(F.concat(F.col(text_col), F.lit("|frame|"), i.cast("string"))),
        ),
        "",
    )
    header_hex = F.concat(
        F.lit(_MAGIC_HEX[MAGIC_VIDEO]),
        F.lpad(F.hex(width), 8, "0"),
        F.lpad(F.hex(height), 8, "0"),
        F.lpad(F.hex(n_frames), 2, "0"),
        frames_hex,
    )
    return df.withColumn(out_col, F.unhex(header_hex))


def attach_fake_audio(df: DataFrame, text_col: str = "text", out_col: str = "audio") -> DataFrame:
    """Deterministic binary audio column: sample rate from a standard-rate
    table, 1-10s duration, mono/stereo — all md5-derived so the DuckDB
    oracle recomputes every field from the source text."""
    md5 = F.md5(F.col(text_col))
    rates = F.array(F.lit(8000), F.lit(16000), F.lit(22050), F.lit(44100))
    sample_rate = F.element_at(rates, (_hx(md5, 7, 1) % 4 + 1).cast("int")).cast("int")
    duration_ms = (_hx(md5, 9, 4) % 9000 + 1000).cast("int")
    channels = (_hx(md5, 13, 1) % 2 + 1).cast("int")
    header_hex = F.concat(
        F.lit(_MAGIC_HEX[MAGIC_AUDIO]),
        F.lpad(F.hex(sample_rate), 8, "0"),
        F.lpad(F.hex(duration_ms), 8, "0"),
        F.lpad(F.hex(channels), 2, "0"),
        md5,  # 16-byte encoded-waveform stand-in
    )
    return df.withColumn(out_col, F.unhex(header_hex))


# ------------------------------------------------------------ metadata tier

def detect_codec(binary_col: str) -> Column:
    """Magic-byte probe chain, most common format first (the reference
    forces JPEG to the probe front, /root/reference/src/codec_registry.cpp:38-43).
    NULL = unknown format → dead-letter disposition."""
    magic = F.hex(F.substring(F.col(binary_col), 1, 4))
    expr = F.lit(None).cast("string")
    # image probed first (reversed fold), then video, then audio
    for name in (MAGIC_AUDIO, MAGIC_VIDEO, MAGIC_IMAGE):
        expr = F.when(magic == _MAGIC_HEX[name], F.lit(name.lower())).otherwise(expr)
    return expr


def media_metadata(df: DataFrame, binary_col: str = "image") -> DataFrame:
    """Header → typed metadata, pure JVM column expressions (no Python).
    The lazy-parse analog: only the header bytes are touched, never the
    payload (/root/reference/src/code_stream.cpp:201)."""
    b = F.col(binary_col)
    as_int = lambda start, n: F.conv(F.hex(F.substring(b, start, n)), 16, 10).cast("int")  # noqa: E731
    codec = detect_codec(binary_col)
    return df.select(
        *[c for c in df.columns if c != binary_col],
        codec.alias("codec"),
        F.when(codec.isNotNull(), as_int(5, 4)).alias("width"),
        F.when(codec.isNotNull(), as_int(9, 4)).alias("height"),
        F.when(codec == MAGIC_IMAGE.lower(), as_int(13, 1)).alias("channels"),
        F.when(codec == MAGIC_VIDEO.lower(), as_int(13, 1)).alias("n_frames"),
        F.length(b).cast("int").alias("n_bytes"),
    )


def audio_metadata(df: DataFrame, binary_col: str = "audio") -> DataFrame:
    """FAUD header → typed metadata, pure JVM expressions (lazy header-only
    parse, like media_metadata; per-format metadata extractors mirror the
    reference's extension-per-codec layout,
    /root/reference/extensions/nvtiff/metadata_extractor.cpp:317-466)."""
    b = F.col(binary_col)
    as_int = lambda start, n: F.conv(F.hex(F.substring(b, start, n)), 16, 10).cast("int")  # noqa: E731
    codec = detect_codec(binary_col)
    is_audio = codec == MAGIC_AUDIO.lower()
    sample_rate = F.when(is_audio, as_int(5, 4))
    duration_ms = F.when(is_audio, as_int(9, 4))
    return df.select(
        *[c for c in df.columns if c != binary_col],
        codec.alias("codec"),
        sample_rate.alias("sample_rate"),
        duration_ms.alias("duration_ms"),
        F.when(is_audio, as_int(13, 1)).alias("channels"),
        F.when(
            is_audio,
            # floor == integer div for these positive exact-in-double
            # products; the DuckDB oracle uses // — results match exactly
            F.floor(sample_rate.cast("long") * duration_ms.cast("long") / 1000).cast(
                "long"
            ),
        ).alias("n_samples"),
        F.length(b).cast("int").alias("n_bytes"),
    )


_AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("energy", T.IntegerType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def audio_windowed_stats(
    df: DataFrame, window_ms: int = 1000, binary_col: str = "audio", id_col: str = "doc_id"
) -> DataFrame:
    """Windowed waveform stats (the audio analog of frame sampling): one
    row per ``window_ms`` window with deterministic payload-derived
    energy/peak, Arrow-batched. A real implementation would decode PCM and
    compute true RMS per window — the seam is exactly this function's body
    (the ``_real_decode`` pattern); the windowing/explode/batching
    plumbing is the product code either way."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, energies, peaks = [], [], [], []
            for did, b in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(b)
                duration_ms = int.from_bytes(b[8:12], "big")
                payload = b[13:29]
                n_w = -(-duration_ms // window_ms)  # ceil
                for w in range(n_w):
                    s = (2 * w) % 15
                    ids.append(int(did))
                    idxs.append(w)
                    energies.append(int.from_bytes(payload[s : s + 2], "big"))
                    peaks.append(payload[(3 * w) % 16])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(idxs, dtype="int32"),
                    "energy": pd.Series(energies, dtype="int32"),
                    "peak": pd.Series(peaks, dtype="int32"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, schema=_AUDIO_WINDOW_SCHEMA)


# -------------------------------------------------------------- decode tier

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("payload_sum", T.LongType()),
        T.StructField("payload_h32", T.LongType()),
    ]
)


def _real_decode(payload: bytes, width: int, height: int, channels: int):
    """Seam for a real pixel decoder (PIL / libjpeg / nvJPEG). None ship in
    this container, so the engine runs the deterministic fake path; wiring a
    real library means implementing exactly this function."""
    raise NotImplementedError("no image codec library available in this environment")


def decode_images(
    df: DataFrame, binary_col: str = "image", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched 'decode': header parse + payload feature extraction in
    pandas batches (the mapInPandas batch is the reference's decodeBatch
    minibatch). Output features are md5-payload-derived so they are
    oracle-checkable: payload_sum = sum of the 16 payload bytes,
    payload_h32 = big-endian int of the first 4.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raw = pdf[binary_col]
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "width": [int.from_bytes(b[4:8], "big") for b in raw],
                "height": [int.from_bytes(b[8:12], "big") for b in raw],
                "channels": [b[12] for b in raw],
                "payload_sum": [sum(b[13:29]) for b in raw],
                "payload_h32": [int.from_bytes(b[13:17], "big") for b in raw],
            }
            yield pd.DataFrame(out).astype(
                {"width": "int32", "height": "int32", "channels": "int32",
                 "payload_sum": "int64", "payload_h32": "int64"}
            )

    return df.select(id_col, binary_col).mapInPandas(batches, schema=_DECODE_SCHEMA)


def resize_images(
    df: DataFrame, new_width: int, new_height: int, binary_col: str = "image"
) -> DataFrame:
    """Transcode/resize (encoder-tier analog). The pixel resample itself is
    STUBBED (``_real_decode`` seam); the fake path re-emits a valid FIMG
    header with the new dimensions over the original payload — so schema,
    batching and binary round-trip plumbing are fully exercised."""
    hdr = (
        _MAGIC_HEX[MAGIC_IMAGE]
        + format(new_width, "08X")
        + format(new_height, "08X")
        + "03"
    )
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != binary_col]
        + [T.StructField(binary_col, T.BinaryType())]
    )
    other = [c for c in df.columns if c != binary_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        prefix = bytes.fromhex(hdr)
        for pdf in it:
            out = pdf[other].copy()
            out[binary_col] = [prefix + bytes(b)[13:] for b in pdf[binary_col]]
            yield out

    return df.mapInPandas(batches, schema=out_schema)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_h32", T.LongType()),
    ]
)


def sample_frames(
    df: DataFrame, every_n: int = 2, binary_col: str = "video", id_col: str = "doc_id"
) -> DataFrame:
    """Container frame iteration + sampling (TIFF-pagination analog,
    /root/reference/include/nvimgcodec.h:601-612): explode every ``every_n``-th
    frame of each container into its own row, Arrow-batched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, h32s = [], [], []
            for did, b in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(b)
                n_frames = b[12]
                for i in range(0, n_frames, every_n):
                    off = 13 + i * 16
                    ids.append(int(did))
                    idxs.append(i)
                    h32s.append(int.from_bytes(b[off : off + 4], "big"))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_h32": pd.Series(h32s, dtype="int64")}
            )

    return df.select(id_col, binary_col).mapInPandas(batches, schema=_FRAME_SCHEMA)
