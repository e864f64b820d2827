"""Avro single-object encoding for change events — no spark-avro jar needed.

This is REAL Avro wire format, not an Avro-flavored invention:

- Message framing is the Avro *single-object encoding* (Avro spec
  "Single-object encoding"): magic ``C3 01``, then the 8-byte
  **little-endian CRC-64-AVRO fingerprint** of the writer schema's
  Parsing Canonical Form, then the Avro-binary record body.
- The body uses Avro binary primitives: zigzag-varint longs/ints,
  length-prefixed UTF-8 strings, 0/1-indexed ``["null", T]`` unions.

Because the engine's change streams are line-oriented text (one event per
line, any registry format per line), each single-object message is carried
base64-encoded on its own line. The 10-byte header is constant for the
writer schema, so the first 12 base64 characters are a constant magic
prefix — exactly the magic-byte probe the registry contract wants
(the reference probes fixed headers the same way,
/root/reference/src/parsers/jpeg.cpp:146).

The DECODER is an Arrow-batched pandas UDF — the sanctioned Pandas-UDF
use case (variable-length binary framing), same shape as the FVID frame
parse in operators/multimodal.py. A pure-expression decoder was tried
first and is NOT viable — negative finding worth keeping: varint fields
are variable-length, so each field's start position is an expression over
every previous field's decoded length; each ``substr``/length use copies
that position subtree (~2·max_bytes+1 copies per field), compounding
multiplicatively across the six fields to ~10^5 analyzer nodes — the
driver OOMs before the plan even resolves. (An ``aggregate``-fold
byte-machine keeps the tree linear but parses interpreted per byte,
~100x slower than the Arrow batch.) The spark-avro jar (unavailable in
this sandbox, ROADMAP #1) would be the JVM-side drop-in: same probe,
``from_avro`` as ``parse_struct``.

Cost note for mixed streams: Catalyst extracts Python UDFs out of
CaseWhen guards into an ArrowEvalPython node, so the UDF sees EVERY row
of the stream, not just Avro rows. ``avro_parse_struct`` therefore gates
its INPUT with the probe — non-Avro rows cross the Arrow boundary as
nulls (a validity bitmap, not string bytes) and short-circuit in Python.

Decoder limits (validated by the round-trip property tests; the ENCODER
enforces them so a conforming writer can't exceed them):

- ``op``          string ≤ 63 bytes          (1-byte length varint)
- ``lsn``/``commit_ts`` longs in ±2^62       (≤ 9-byte varint)
- ``conv_id``     string ≤ 8191 bytes        (≤ 2-byte length varint)
- ``turn_idx``    full int32 range           (≤ 5-byte varint)
- ``payload``     string ≤ 128 MiB           (≤ 4-byte length varint)

Writer schema (record ``CdcEvent``): op string, lsn long, commit_ts long
(timestamp-micros), conv_id ["null","string"], turn_idx ["null","int"],
payload ["null","string"].  ``payload`` carries the after-image JSON for
I/U, nothing for D, and the schema-change JSON for op=S (same convention
as the binary-v1 envelope in changelog.py).
"""

from __future__ import annotations

import base64

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------ fingerprint

#: Parsing Canonical Form of the writer schema (Avro spec: attributes
#: reduced to name/type/fields, field order preserved, no whitespace,
#: logicalType attributes stripped).
SCHEMA_PCF = (
    '{"name":"CdcEvent","type":"record","fields":['
    '{"name":"op","type":"string"},'
    '{"name":"lsn","type":"long"},'
    '{"name":"commit_ts","type":"long"},'
    '{"name":"conv_id","type":["null","string"]},'
    '{"name":"turn_idx","type":["null","int"]},'
    '{"name":"payload","type":["null","string"]}]}'
)

_CRC64_EMPTY = 0xC15D213AA4D7A795
_CRC64_TABLE = []
for _i in range(256):
    _fp = _i
    for _ in range(8):
        _fp = (_fp >> 1) ^ (_CRC64_EMPTY & -(_fp & 1))
    _CRC64_TABLE.append(_fp)


def crc64_avro(data: bytes) -> int:
    """CRC-64-AVRO schema fingerprint (Avro spec, "Schema Fingerprints")."""
    fp = _CRC64_EMPTY
    for b in data:
        fp = (fp >> 8) ^ _CRC64_TABLE[(fp ^ b) & 0xFF]
    return fp


#: C3 01 magic + little-endian fingerprint: the constant 10-byte header of
#: every single-object message written under this schema.
AVRO_HEADER = b"\xc3\x01" + crc64_avro(SCHEMA_PCF.encode()).to_bytes(8, "little")

#: First 12 base64 chars encode header bytes 0..8 exactly — a constant,
#: collision-safe line prefix usable as the registry probe.
AVRO_B64_PREFIX = base64.b64encode(AVRO_HEADER).decode()[:12]


# ----------------------------------------------------------- Python encode
# (generator/test side; the decode path below is the product code)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ~(v << 1)


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_long(v: int) -> bytes:
    if not -(1 << 62) <= v < (1 << 62):
        raise ValueError(f"long out of decoder range (±2^62): {v}")
    return _varint(_zigzag(v))


def _enc_str(s: str, max_len: int, what: str) -> bytes:
    b = s.encode("utf-8")
    if len(b) > max_len:
        raise ValueError(f"{what} exceeds decoder limit {max_len}: {len(b)} bytes")
    return _varint(_zigzag(len(b))) + b


def encode_avro_record(
    op: str,
    lsn: int,
    ts_micros: int,
    conv_id: str | None,
    turn_idx: int | None,
    payload_json: str | None,
) -> bytes:
    """Avro-binary record body under SCHEMA_PCF."""
    body = _enc_str(op, 63, "op")
    body += _enc_long(lsn)
    body += _enc_long(ts_micros)
    if conv_id is None:
        body += b"\x00"
    else:
        body += b"\x02" + _enc_str(conv_id, 8191, "conv_id")
    if turn_idx is None:
        body += b"\x00"
    else:
        if not -(1 << 31) <= turn_idx < (1 << 31):
            raise ValueError(f"turn_idx out of int32 range: {turn_idx}")
        body += b"\x02" + _varint(_zigzag(turn_idx))
    if payload_json is None or payload_json == "":
        body += b"\x00"
    else:
        body += b"\x02" + _enc_str(payload_json, (1 << 27) - 1, "payload")
    return body


def encode_avro_line(
    op: str,
    lsn: int,
    ts_micros: int,
    conv_id: str | None,
    turn_idx: int | None,
    payload_json: str | None,
) -> str:
    """One change event → base64(single-object message), newline-safe."""
    body = encode_avro_record(op, lsn, ts_micros, conv_id, turn_idx, payload_json)
    return base64.b64encode(AVRO_HEADER + body).decode()


# ----------------------------------------------------------- Spark encode
#
# Pure-expression encoder (round-3 experiment, VERDICT #6): unlike the
# DECODER — where a pure-expression varint parser needs combinatorially
# nested byte positions and OOMs the analyzer (see module docstring) —
# ENCODING is fixed-layout per field: each varint is a ≤9-branch CASE on
# the value's magnitude, assembled as hex text and unhex'd once. It is
# feasible (byte-identical to encode_avro_line on a 20k-value fuzz) but
# it LOSES: 600k rows on local[16], interleaved A/B, warm, best of 4 —
# expression 1.30s vs Arrow pandas-UDF 0.75s (~1.7x). The hex-text
# assembly costs ~60 string expressions per row (lpad/hex per byte +
# concat + unhex + base64 + chunk-strip), far more than one C-speed
# Python loop over an Arrow batch. The pandas UDF stays the product
# encoder (emit_changes, roundtrip queries); this expression form is
# kept for environments without Python workers, and as the measured
# negative finding the decoder docstring's positive one mirrors.


def _zigzag_expr(v: Column) -> Column:
    # two's-complement wrap of shiftleft matches Java semantics, so the
    # standard (n << 1) ^ (n >> 63) works for the full ±2^62 domain
    return F.shiftleft(v, 1).bitwiseXOR(F.shiftright(v, 63))


def _byte_hex(e: Column) -> Column:
    return F.lpad(F.hex(e), 2, "0")


def _varint_hex(z: Column) -> Column:
    """LEB128 hex of a non-negative (zigzagged) long — a 9-branch CASE on
    magnitude; branch k emits k fixed bytes."""
    expr = F.when(z < 128, _byte_hex(z))
    for k in range(2, 9):
        parts = [
            _byte_hex(
                F.shiftright(z, 7 * i).bitwiseAND(F.lit(0x7F)).bitwiseOR(F.lit(0x80))
            )
            for i in range(k - 1)
        ]
        parts.append(_byte_hex(F.shiftright(z, 7 * (k - 1))))
        expr = expr.when(z < F.lit(1 << (7 * k)), F.concat(*parts))
    # 9-byte tail: everything below 2^63 (zigzag of ±2^62 never needs 10)
    parts = [
        _byte_hex(F.shiftright(z, 7 * i).bitwiseAND(F.lit(0x7F)).bitwiseOR(F.lit(0x80)))
        for i in range(8)
    ]
    parts.append(_byte_hex(F.shiftright(z, 56)))
    return expr.otherwise(F.concat(*parts))


def _str_hex(s: Column) -> Column:
    """Avro string: zigzag(byte-length) varint + utf-8 bytes, as hex."""
    b = F.encode(s, "UTF-8")
    return F.concat(_varint_hex(F.shiftleft(F.length(b).cast("long"), 1)), F.hex(b))


def avro_encode_expr(
    op: Column,
    lsn: Column,
    ts_us: Column,
    conv_id: Column,
    turn_idx: Column,
    payload: Column,
) -> Column:
    """One change event → base64 single-object line, entirely JVM-side.

    Byte-identical to ``encode_avro_line`` (property-tested): canonical
    Avro binary has exactly one encoding per value. Null lsn/ts encode as
    0 (the wire longs are non-nullable); empty payload encodes as null,
    matching the Python encoder.
    """
    body = F.concat(
        _str_hex(op),
        _varint_hex(_zigzag_expr(F.coalesce(lsn.cast("long"), F.lit(0).cast("long")))),
        _varint_hex(_zigzag_expr(F.coalesce(ts_us.cast("long"), F.lit(0).cast("long")))),
        F.when(conv_id.isNull(), "00").otherwise(F.concat(F.lit("02"), _str_hex(conv_id))),
        F.when(turn_idx.isNull(), "00").otherwise(
            F.concat(F.lit("02"), _varint_hex(_zigzag_expr(turn_idx.cast("long"))))
        ),
        F.when(payload.isNull() | (payload == ""), "00").otherwise(
            F.concat(F.lit("02"), _str_hex(payload))
        ),
    )
    b64 = F.base64(F.unhex(F.concat(F.lit(AVRO_HEADER.hex().upper()), body)))
    # Spark's base64 may emit MIME-chunked output (76-char lines joined by
    # \r\n) depending on spark.sql.legacy.chunkBase64String.enabled; the
    # wire format is one line per message, so strip unconditionally rather
    # than depend on session conf
    return F.regexp_replace(b64, "[\\r\\n]", "")


# ------------------------------------------------------------ Spark decode

_AVRO_STRUCT = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("payload", T.StringType()),
    ]
)

_NONE_ROW = (None, None, None, None, None, None)


def read_record_body(buf: bytes, pos: int, end: int | None = None) -> tuple[tuple, int]:
    """Avro-binary record body under SCHEMA_PCF at ``pos`` → (row, new_pos).

    Raises ValueError/UnicodeDecodeError on malformed input — callers pick
    the recovery policy (single-object lines null-row per message; the OCF
    container reader dead-letters the enclosing block, since a failed
    record desynchronizes every later position in it).

    Standard Avro binary reader: accepts any conforming writer's minimal
    varints (and non-minimal ones up to 10 bytes)."""
    if end is None:
        end = len(buf)

    def vlong() -> int:
        nonlocal pos
        shift = 0
        acc = 0
        while True:
            if pos >= end or shift > 63:
                raise ValueError("truncated varint")
            b = buf[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if b < 0x80:
                v = (acc >> 1) ^ -(acc & 1)
                # a 10-byte varint can decode past int64 (acc ~ 2^70);
                # letting it escape would overflow the Int64 batch
                # column and crash the SCAN — out-of-range is a
                # malformed message, i.e. a null row (fuzz-pinned)
                if not -(1 << 63) <= v < (1 << 63):
                    raise ValueError("varint out of int64 range")
                return v
            shift += 7

    def vstr() -> str:
        nonlocal pos
        n = vlong()
        if n < 0 or pos + n > end:
            raise ValueError("bad string length")
        s = buf[pos : pos + n].decode("utf-8")
        pos += n
        return s

    def union(reader):
        tag = vlong()
        if tag == 0:
            return None
        if tag == 1:
            return reader()
        raise ValueError("bad union tag")

    def vint() -> int:
        v = vlong()
        if not -(1 << 31) <= v < (1 << 31):  # schema says int, not long
            raise ValueError("int out of int32 range")
        return v

    op = vstr()
    lsn = vlong()
    ts_us = vlong()
    conv_id = union(vstr)
    turn_idx = union(vint)
    payload = union(vstr)
    return (op, lsn, ts_us, conv_id, turn_idx, payload), pos


def decode_avro_message(buf: bytes) -> tuple:
    """One single-object message → (op, lsn, ts_us, conv_id, turn_idx,
    payload); all-None for anything malformed (UNSUPPORTED-status analog —
    a claimed-but-corrupt line becomes a null row, never a scan error)."""
    try:
        if not buf.startswith(AVRO_HEADER):
            return _NONE_ROW
        row, _ = read_record_body(buf, len(AVRO_HEADER))
        return row
    except (ValueError, UnicodeDecodeError):
        return _NONE_ROW


def _decode_line(line: str | None) -> tuple:
    if line is None:
        return _NONE_ROW
    try:
        buf = base64.b64decode(line, validate=False)
    except ValueError:  # binascii.Error: bad padding / stray chars
        return _NONE_ROW
    return decode_avro_message(buf)


@F.pandas_udf(_AVRO_STRUCT)
def _avro_decode(raw: pd.Series) -> pd.DataFrame:
    rows = [_decode_line(line) for line in raw]
    op, lsn, ts_us, conv_id, turn_idx, payload = zip(*rows) if rows else ((),) * 6
    # Nullable Int dtypes, NOT inference: mixed None/int rows would infer
    # float64 and silently round lsn/ts past 2^53 (caught by fuzz test).
    return pd.DataFrame(
        {
            "op": pd.array(op, dtype="object"),
            "lsn": pd.array(lsn, dtype="Int64"),
            "ts_us": pd.array(ts_us, dtype="Int64"),
            "conv_id": pd.array(conv_id, dtype="object"),
            "turn_idx": pd.array(turn_idx, dtype="Int32"),
            "payload": pd.array(payload, dtype="object"),
        }
    )


def avro_probe(raw: Column) -> Column:
    """Magic-byte probe: the schema's constant single-object header."""
    return raw.startswith(AVRO_B64_PREFIX)


def avro_parse_struct(raw: Column) -> Column:
    """base64 line → struct(op, lsn, ts_us, conv_id, turn_idx, payload).

    Probe-gated INPUT (see module docstring): rows other formats claim
    cross the Arrow boundary as nulls, not payload bytes."""
    return _avro_decode(F.when(avro_probe(raw), raw))
