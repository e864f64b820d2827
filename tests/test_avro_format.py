"""Avro single-object encoding (5th registered format, sources/avro_sobj.py).

- Wire-format stability: the schema PCF fingerprint (and hence the
  single-object header and base64 probe prefix) is pinned — an accidental
  schema or canonicalization change breaks cross-version streams.
- Pure-Python decoder properties: round-trip over the full value domain
  (negative ints, unicode, size limits) and no-crash on every truncation
  of a valid message.
- Spark path: registry probe claims avro lines, decode matches the
  encoder, corrupt-but-prefixed lines become null rows (UNSUPPORTED
  analog), other formats are untouched.
"""

import base64
import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nvimagecodec_spark.sources.avro_sobj import (
    AVRO_B64_PREFIX,
    AVRO_HEADER,
    SCHEMA_PCF,
    crc64_avro,
    decode_avro_message,
    encode_avro_line,
    encode_avro_record,
)
from nvimagecodec_spark.sources.changelog import parse_changes


def test_wire_format_pinned():
    # CRC-64-AVRO of the empty input is the spec's EMPTY constant
    assert crc64_avro(b"") == 0xC15D213AA4D7A795
    # pinned fingerprint of the writer schema's PCF: changing the schema,
    # the PCF serialization, or the CRC silently forks the wire format
    assert crc64_avro(SCHEMA_PCF.encode()) == 0xCE4646AC36E923D9
    assert AVRO_HEADER[:2] == b"\xc3\x01"
    assert len(AVRO_HEADER) == 10
    assert AVRO_B64_PREFIX == base64.b64encode(AVRO_HEADER).decode()[:12]
    assert len(AVRO_B64_PREFIX) == 12


events = st.tuples(
    st.sampled_from(["I", "U", "D", "S"]),
    st.integers(min_value=-(2**62) + 1, max_value=2**62 - 1),  # lsn
    st.integers(min_value=0, max_value=2**62 - 1),  # ts_us
    st.one_of(st.none(), st.text(max_size=50)),  # conv_id (any unicode)
    st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31 - 1)),
    st.one_of(st.none(), st.text(max_size=120)),  # payload
)


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(events)
def test_python_round_trip(e):
    op, lsn, ts, conv, turn, payload = e
    line = encode_avro_line(op, lsn, ts, conv, turn, payload)
    assert line.startswith(AVRO_B64_PREFIX)
    got = decode_avro_message(base64.b64decode(line))
    exp_payload = payload if payload else None  # "" encodes as null union
    assert got == (op, lsn, ts, conv, turn, exp_payload)


@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
@given(events, st.integers(min_value=0, max_value=200))
def test_truncation_never_raises(e, cut):
    msg = AVRO_HEADER + encode_avro_record(*e)
    out = decode_avro_message(msg[: min(cut, len(msg))])
    assert isinstance(out, tuple) and len(out) == 6
    if cut < len(AVRO_HEADER):
        assert out == (None,) * 6


def test_encoder_enforces_decoder_limits():
    import pytest

    with pytest.raises(ValueError):
        encode_avro_line("I", 2**62, 0, "c", 0, None)  # long out of range
    with pytest.raises(ValueError):
        encode_avro_line("I" * 64, 0, 0, "c", 0, None)  # op too long
    with pytest.raises(ValueError):
        encode_avro_line("I", 0, 0, "c" * 8192, 0, None)  # conv_id too long


def test_spark_parse_and_registry_claims(spark):
    lines = [
        encode_avro_line("I", 7, 1_700_000_000_000_000, "c-1", 2, '{"text":"hé"}'),
        encode_avro_line("D", 8, 1_700_000_000_000_001, "c-1", 2, None),
        encode_avro_line(
            "S", 9, 1_700_000_000_000_002, None, None,
            '{"kind":"add","column":"rating","new_type":"int"}',
        ),
        AVRO_B64_PREFIX + "@@not-base64@@",  # claimed, corrupt -> null row
        '{"op":"I","lsn":10,"commit_ts":"2025-01-01 00:00:00","conv_id":"j","turn_idx":1,"after":{"x":1}}',
    ]
    df = spark.createDataFrame(
        [(ln, "f", i) for i, ln in enumerate(lines)],
        "value string, src_file string, src_offset long",
    )
    rows = parse_changes(df).orderBy("src_offset").collect()
    assert [r.src_format for r in rows] == ["avro-sobj"] * 4 + ["jsonlines"]
    assert (rows[0].op, rows[0].lsn, rows[0].conv_id, rows[0].turn_idx) == ("I", 7, "c-1", 2)
    assert json.loads(rows[0].after) == {"text": "hé"}
    assert rows[0].commit_ts.isoformat() == "2023-11-14T22:13:20"
    assert rows[1].op == "D" and rows[1].after is None
    assert rows[2].schema_change.kind == "add" and rows[2].schema_change.column == "rating"
    assert rows[2].after is None  # op=S payload routes to schema_change only
    corrupt = rows[3]
    assert corrupt.op is None and corrupt.lsn is None and corrupt.after is None
    assert rows[4].src_format == "jsonlines" and rows[4].lsn == 10


def test_arrow_boundary_is_probe_gated(spark):
    # Non-avro rows must reach Python as nulls: a plan-level proxy is that
    # parsing a pure-jsonl frame still works and yields zero avro claims
    # (the decode UDF sees only nulls and returns all-None structs).
    df = spark.createDataFrame(
        [('{"op":"I","lsn":%d,"commit_ts":"2025-01-01 00:00:00","conv_id":"c","turn_idx":0,"after":{}}' % i,
          "f", i) for i in range(100)],
        "value string, src_file string, src_offset long",
    )
    out = parse_changes(df)
    assert out.where(F.col("src_format") == "avro-sobj").count() == 0
    assert out.count() == 100


def test_out_of_range_values_become_null_rows_not_scan_errors(spark):
    """Review-caught: a conforming-looking message whose varint decodes
    past int64 (10-byte varint) or whose turn_idx exceeds int32 must
    become a NULL row — never an OverflowError out of the Arrow batch."""
    from nvimagecodec_spark.sources.avro_sobj import (
        _enc_long,
        _enc_str,
        _varint,
        decode_avro_message,
    )

    # lsn varint encoding 2^63 (zigzag raw 2^64): 10 bytes on the wire
    big_lsn = _varint(1 << 64)
    body = _enc_str("I", 63, "op") + big_lsn + _enc_long(0) + b"\x00\x00\x00"
    assert decode_avro_message(AVRO_HEADER + body) == (None,) * 6

    # turn_idx = 2^31: valid varint, out of the schema's int range
    body2 = (
        _enc_str("I", 63, "op") + _enc_long(1) + _enc_long(2)
        + b"\x00" + b"\x02" + _varint((1 << 31) << 1) + b"\x00"
    )
    assert decode_avro_message(AVRO_HEADER + body2) == (None,) * 6

    # and through Spark: claimed by the probe, lands as a null row
    lines = [base64.b64encode(AVRO_HEADER + body).decode(),
             base64.b64encode(AVRO_HEADER + body2).decode()]
    df = spark.createDataFrame(
        [(ln, "f", i) for i, ln in enumerate(lines)],
        "value string, src_file string, src_offset long",
    )
    rows = parse_changes(df).orderBy("src_offset").collect()
    assert [r.src_format for r in rows] == ["avro-sobj", "avro-sobj"]
    assert all(r.op is None and r.lsn is None for r in rows)

    # encoder now refuses the out-of-range turn_idx outright
    import pytest

    with pytest.raises(ValueError):
        encode_avro_line("I", 1, 2, "c", 1 << 31, None)


def test_expression_encoder_byte_identical(spark):
    """avro_encode_expr (the JVM-expression encoder) must emit the exact
    bytes encode_avro_line does — canonical Avro binary has one encoding
    per value, so equality is exact, not semantic. (Perf note, measured
    interleaved at 600k rows: the Arrow pandas-UDF encoder is ~1.7x
    FASTER; the expression form exists for pythonless environments — see
    the module docstring's measurement.)"""
    import random

    from pyspark.sql import functions as F

    from nvimagecodec_spark.sources.avro_sobj import (
        avro_encode_expr,
        encode_avro_line,
    )

    random.seed(3)
    rows = [
        ("I", 0, 0, "c", 0, '{"a":1}'),
        ("U", 1, -1, "conv-x", 1, '{"text":"hé😀"}'),
        ("D", (1 << 62) - 1, -(1 << 62) + 1, None, -(2**31), None),
        ("S", 127, 128, "y" * 300, 2**31 - 1, ""),
    ] + [
        (
            random.choice(["I", "U", "D"]),
            random.randint(-(1 << 62) + 1, (1 << 62) - 1),
            random.randint(-(1 << 62) + 1, (1 << 62) - 1),
            None if random.random() < 0.1 else "c" * random.randint(1, 40),
            None if random.random() < 0.1 else random.randint(-(2**31), 2**31 - 1),
            None if random.random() < 0.2 else '{"t":"' + "x" * random.randint(0, 150) + '"}',
        )
        for _ in range(1000)
    ]
    df = spark.createDataFrame(
        rows,
        "op string, lsn long, ts_us long, conv_id string, turn_idx int, payload string",
    )
    got = [
        r[0]
        for r in df.select(
            avro_encode_expr(
                F.col("op"), F.col("lsn"), F.col("ts_us"),
                F.col("conv_id"), F.col("turn_idx"), F.col("payload"),
            )
        ).collect()
    ]
    want = [
        encode_avro_line(o, l, t, c, ti, None if p == "" else p)
        for o, l, t, c, ti, p in rows
    ]
    assert got == want
