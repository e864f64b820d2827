"""Change-stream source: encoding probe registry + vectorized parsers.

Mirrors the reference's parser tier (SURVEY §2.2): each supported event
encoding registers a *probe* (the analog of ``canParse`` magic-byte sniffing,
/root/reference/src/parsers/jpeg.cpp:146) and a *parse* expression (the
analog of ``getImageInfo``, /root/reference/src/parsers/jpeg.cpp:238-352).
Probes are evaluated per record in priority order — a single ``F.when``
chain, mirroring ``CodecRegistry::getParser``'s priority probe loop
(/root/reference/src/codec_registry.cpp:47-59) — with the most common
encoding probed first (the reference forces JPEG to the front of the probe
order, /root/reference/src/codec_registry.cpp:38-43).

Everything is column expressions over ``from_json`` — JVM-side, vectorized,
no per-row Python (BASELINE.json:input_hint).

Unparseable records get ``src_format = NULL`` → dead-letter disposition,
the analog of the UNKNOWN/UNSUPPORTED sentinel statuses
(/root/reference/include/nvimgcodec.h:735-768).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

# ---------------------------------------------------------------- schemas
#
# The `after` row image stays a RAW JSON STRING through parse + LWW and is
# only extracted into typed columns at merge time under the then-current
# (possibly evolved) table schema. Two wins at scale: (1) the expensive
# full-payload JSON decode runs once per *winning* key instead of once per
# event; (2) schema events seen earlier in the same epoch apply to the
# extraction. Mirrors the reference's lazy parse: metadata only
# materializes when requested (/root/reference/src/code_stream.cpp:201).

SCHEMA_CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # add | rename | widen
        T.StructField("column", T.StringType()),
        T.StructField("new_name", T.StringType()),
        T.StructField("new_type", T.StringType()),
    ]
)

# The normalized change-event schema every parser emits (FIXTURES.md §2).
CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),  # I | U | D | S
        T.StructField("lsn", T.LongType()),
        T.StructField("commit_ts", T.TimestampType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("after", T.StringType()),  # raw JSON row image
        T.StructField("schema_change", SCHEMA_CHANGE_SCHEMA),
        # source transaction id (Debezium transaction-metadata analog);
        # null when the wire format carries none — see txn_atomic epochs
        T.StructField("txn_id", T.LongType()),
        T.StructField("src_file", T.StringType()),
        T.StructField("src_offset", T.LongType()),
    ]
)

# Envelope-only schemas: everything except the raw `after` payload.
_PLAIN_ENVELOPE = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("commit_ts", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("schema_change", SCHEMA_CHANGE_SCHEMA),
        T.StructField("txn_id", T.LongType()),
    ]
)

_DBZ_KEY = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
    ]
)
_DEBEZIUM_ENVELOPE = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("op", T.StringType()),
                    T.StructField("before", _DBZ_KEY),
                    T.StructField("after", _DBZ_KEY),
                    T.StructField(
                        "source",
                        T.StructType(
                            [
                                T.StructField("lsn", T.LongType()),
                                T.StructField("ts_ms", T.LongType()),
                            ]
                        ),
                    ),
                    T.StructField("schema_change", SCHEMA_CHANGE_SCHEMA),
                ]
            ),
        )
    ]
)


# ------------------------------------------------------- format registry

@dataclass
class SourceFormat:
    """A registered change-event encoding (analog of a parser plugin, U1/U2).

    Two-stage expression contract, chosen for a measured reason:

    - ``parse_struct(raw)`` — ONE expensive parse (``from_json``) of the
      raw line into the format's native struct. Stage 1 materializes it as
      its own projection column, probe-guarded, so it runs at most once
      per row (CaseWhen short-circuit) and exactly once per claiming
      format.
    - ``normalize(parsed, raw)`` — cheap struct-field accessors mapping the
      parsed struct to the normalized CHANGE_SCHEMA fields, used in stage 2.

    Referencing a ``from_json`` result from N output columns inside a
    single projection re-evaluates the Jackson parse N times (no
    subexpression elimination across fields: 33s vs 1.6s on a 4.8M-row
    scan at 32 cores). Materializing the struct in its own projection —
    which CollapseProject refuses to inline because it is non-cheap and
    multiply-referenced — keeps it at one parse per row. The whole
    registry still fuses into a SINGLE scan of the source.
    """

    name: str
    priority: float  # lower = probed first
    probe: Callable[[Column], Column]  # raw line -> boolean Column
    parse_struct: Callable[[Column], Column]  # raw line -> parsed struct
    normalize: Callable[[Column, Column], dict[str, Column]]  # (parsed, raw) -> fields


def _plain_probe(raw: Column) -> Column:
    # magic-byte analog: a JSON object with a top-level "op" field
    return raw.startswith("{") & raw.contains('"op"') & ~raw.contains('"payload"')


def _plain_struct(raw: Column) -> Column:
    return F.from_json(raw, _PLAIN_ENVELOPE)


def _plain_normalize(j: Column, raw: Column) -> dict[str, Column]:
    return {
        "op": j["op"],
        "lsn": j["lsn"],
        "commit_ts": F.to_timestamp(j["commit_ts"]),
        "conv_id": j["conv_id"],
        "turn_idx": j["turn_idx"],
        "after": F.get_json_object(raw, "$.after"),
        "schema_change": j["schema_change"],
        "txn_id": j["txn_id"],
    }


def _debezium_probe(raw: Column) -> Column:
    return raw.startswith("{") & raw.contains('"payload"')


_DBZ_OP = {"c": "I", "r": "I", "u": "U", "d": "D", "s": "S"}


def _debezium_struct(raw: Column) -> Column:
    return F.from_json(raw, _DEBEZIUM_ENVELOPE)


def _debezium_normalize(j: Column, raw: Column) -> dict[str, Column]:
    p = j["payload"]
    op_map = F.create_map(*[F.lit(x) for kv in _DBZ_OP.items() for x in kv])
    key_src = F.when(p["op"] == "d", p["before"]).otherwise(p["after"])
    return {
        "op": op_map[p["op"]],
        "lsn": p["source"]["lsn"],
        "commit_ts": F.timestamp_millis(p["source"]["ts_ms"]),
        "conv_id": key_src["conv_id"],
        "turn_idx": key_src["turn_idx"],
        "after": F.when(
            p["op"].isin("c", "r", "u"), F.get_json_object(raw, "$.payload.after")
        ),
        "schema_change": p["schema_change"],
    }


# ---------------------------------------------------- binary envelope (v1)
#
# A fixed-offset binary-style change-event encoding — the third registered
# format, proving the registry on a non-JSON wire shape (the reference
# ships 7 parsers probed by magic bytes; tiff/jpeg2k/webp are all
# fixed-header binary, /root/reference/src/parsers/). Needs no external
# jar: fields sit at fixed offsets and decode with substring + base-16
# conv, entirely JVM-side (same technique as operators/multimodal.py's
# FIMG header parse).
#
# Line layout (1-based positions; hex is lowercase):
#   1-5   magic  "CDCB1"
#   6     op     I | U | D | S
#   7-22  lsn          16-hex big-endian
#   23-38 commit_ts    16-hex unix MICROS
#   39-46 turn_idx     8-hex ("ffffffff" = null, e.g. schema events)
#   47-   conv_id (no '|' allowed) + '|' + after-image JSON
#         (for op=S the JSON after the '|' is the schema_change payload;
#          empty payload = null)

_BIN_MAGIC = "CDCB1"
_BIN_NULL_TURN = "ffffffff"


def encode_binary_line(
    op: str,
    lsn: int,
    ts_micros: int,
    conv_id: str | None,
    turn_idx: int | None,
    payload_json: str | None,
) -> str:
    """Python-side encoder (generators/tests); the decoder is pure Spark."""
    turn = _BIN_NULL_TURN if turn_idx is None else f"{turn_idx:08x}"
    conv = conv_id or ""
    if "|" in conv:
        raise ValueError("conv_id may not contain '|'")
    return f"{_BIN_MAGIC}{op}{lsn:016x}{ts_micros:016x}{turn}{conv}|{payload_json or ''}"


def binary_line_expr(
    op: Column, lsn: Column, ts_us: Column, conv_id: Column,
    turn_idx: Column, payload: Column,
) -> Column:
    """Pure-expression binary-v1 encoder (JVM-side twin of
    ``encode_binary_line`` — fixed offsets make this a handful of
    hex/lpad concats). Null lsn/ts encode as 0, null turn as the
    ffffffff sentinel, exactly like the Python encoder's None handling."""
    hex16 = lambda c: F.lpad(  # noqa: E731
        F.lower(F.hex(F.coalesce(c, F.lit(0).cast("long")))), 16, "0"
    )
    turn = F.when(turn_idx.isNull(), _BIN_NULL_TURN).otherwise(
        F.lpad(F.lower(F.hex(turn_idx)), 8, "0")
    )
    return F.concat(
        F.lit(_BIN_MAGIC), op, hex16(lsn), hex16(ts_us), turn,
        F.coalesce(conv_id, F.lit("")), F.lit("|"), F.coalesce(payload, F.lit("")),
    )


def _binary_probe(raw: Column) -> Column:
    return raw.startswith(_BIN_MAGIC)


def _binary_struct(raw: Column) -> Column:
    sep = F.locate("|", raw, 47)  # absolute 1-based position of the separator
    return F.struct(
        F.substring(raw, 6, 1).alias("op"),
        F.conv(F.substring(raw, 7, 16), 16, 10).cast("long").alias("lsn"),
        F.conv(F.substring(raw, 23, 16), 16, 10).cast("long").alias("ts_us"),
        F.substring(raw, 39, 8).alias("turn_hex"),
        F.when(sep >= 47, F.substring(raw, F.lit(47), sep - 47)).alias("conv_id"),
        F.when(sep >= 47, F.substring(raw, sep + 1, F.length(raw))).alias("after_raw"),
    )


def _binary_normalize(j: Column, raw: Column) -> dict[str, Column]:
    return {
        "op": j["op"],
        "lsn": j["lsn"],
        "commit_ts": F.timestamp_micros(j["ts_us"]),
        "conv_id": F.when(F.length(j["conv_id"]) > 0, j["conv_id"]),
        "turn_idx": F.when(
            j["turn_hex"] != _BIN_NULL_TURN, F.conv(j["turn_hex"], 16, 10).cast("int")
        ),
        "after": F.when((j["op"] != "S") & (F.length(j["after_raw"]) > 0), j["after_raw"]),
        "schema_change": F.when(
            (j["op"] == "S") & (F.length(j["after_raw"]) > 0),
            F.from_json(j["after_raw"], SCHEMA_CHANGE_SCHEMA),
        ),
    }


# ------------------------------------------------------------ TSV envelope
#
# Delimited text encoding (the CSV/TSV tier every CDC tool also speaks):
#   op \t lsn \t commit_ts \t conv_id \t turn_idx \t after-json
# Empty fields = null; after-json is the raw row image (may itself
# contain anything but tab/newline — JSON escapes both). For op=S the
# last field is the schema_change JSON. Parsing is a single split() +
# element_at projections — JVM-side, no regex per field.


def encode_tsv_line(
    op: str,
    lsn: int,
    commit_ts: str,
    conv_id: str | None,
    turn_idx: int | None,
    payload_json: str | None,
) -> str:
    turn = "" if turn_idx is None else str(turn_idx)
    return "\t".join([op, str(lsn), commit_ts, conv_id or "", turn, payload_json or ""])


def tsv_line_expr(
    op: Column, lsn: Column, commit_ts: Column, conv_id: Column,
    turn_idx: Column, payload: Column,
) -> Column:
    """Pure-expression TSV encoder (JVM-side twin of ``encode_tsv_line``).
    Every field is null-coalesced to '' BEFORE concat_ws — concat_ws
    silently drops null args, which would shift field positions."""
    e = lambda c: F.coalesce(c.cast("string"), F.lit(""))  # noqa: E731
    return F.concat_ws(
        "\t",
        e(op),
        e(lsn),
        F.coalesce(F.date_format(commit_ts, "yyyy-MM-dd HH:mm:ss.SSSSSS"), F.lit("")),
        e(conv_id),
        e(turn_idx),
        e(payload),
    )


def _tsv_probe(raw: Column) -> Column:
    # first two chars are an op letter + tab — cheap and specific
    return F.substring(raw, 1, 1).isin("I", "U", "D", "S") & (
        F.substring(raw, 2, 1) == "\t"
    )


def _tsv_struct(raw: Column) -> Column:
    # try_to_number-style guards: empty fields are nulls, and under ANSI
    # mode (Spark 4 default) a bare cast('' as int) would kill the scan
    parts = F.split(raw, "\t", 6)

    def num(i: int, t: str) -> Column:
        return F.element_at(parts, i).try_cast(t)

    return F.struct(
        F.element_at(parts, 1).alias("op"),
        num(2, "long").alias("lsn"),
        F.element_at(parts, 3).alias("cts"),
        F.element_at(parts, 4).alias("conv_id"),
        num(5, "int").alias("turn_idx"),
        F.element_at(parts, 6).alias("payload"),
    )


def _tsv_normalize(j: Column, raw: Column) -> dict[str, Column]:
    nonempty = F.length(j["payload"]) > 0
    return {
        "op": j["op"],
        "lsn": j["lsn"],
        "commit_ts": F.to_timestamp(j["cts"]),
        "conv_id": F.when(F.length(j["conv_id"]) > 0, j["conv_id"]),
        "turn_idx": j["turn_idx"],
        "after": F.when((j["op"] != "S") & nonempty, j["payload"]),
        "schema_change": F.when(
            (j["op"] == "S") & nonempty, F.from_json(j["payload"], SCHEMA_CHANGE_SCHEMA)
        ),
    }


# --------------------------------------------------- Avro single-object
#
# Real Avro wire format (C3 01 magic + CRC-64-AVRO schema fingerprint +
# Avro-binary body), base64-framed per line; decode is pure column
# expressions — see sources/avro_sobj.py for the format and limits.

from .avro_sobj import avro_parse_struct, avro_probe, encode_avro_line  # noqa: E402,F401


def _avro_normalize(j: Column, raw: Column) -> dict[str, Column]:
    return {
        "op": j["op"],
        "lsn": j["lsn"],
        "commit_ts": F.timestamp_micros(j["ts_us"]),
        "conv_id": j["conv_id"],
        "turn_idx": j["turn_idx"],
        "after": F.when((j["op"] != "S") & j["payload"].isNotNull(), j["payload"]),
        "schema_change": F.when(
            (j["op"] == "S") & j["payload"].isNotNull(),
            F.from_json(j["payload"], SCHEMA_CHANGE_SCHEMA),
        ),
    }


FORMAT_REGISTRY: list[SourceFormat] = []


def register_format(fmt: SourceFormat) -> None:
    """Entry point for custom encodings (analog of extension module load,
    /root/reference/src/plugin_framework.cpp:338-399)."""
    FORMAT_REGISTRY.append(fmt)
    FORMAT_REGISTRY.sort(key=lambda f: f.priority)


register_format(SourceFormat("jsonlines", 1.0, _plain_probe, _plain_struct, _plain_normalize))
register_format(SourceFormat("debezium", 2.0, _debezium_probe, _debezium_struct, _debezium_normalize))
# magic-byte probe is the cheapest + most specific — probed first
register_format(SourceFormat("binary-v1", 0.5, _binary_probe, _binary_struct, _binary_normalize))
register_format(SourceFormat("tsv", 3.0, _tsv_probe, _tsv_struct, _tsv_normalize))
# 12-char constant-prefix probe — as cheap and specific as binary-v1's
register_format(SourceFormat("avro-sobj", 0.3, avro_probe, avro_parse_struct, _avro_normalize))


def detect_format_expr(raw: Column) -> Column:
    """Priority-ordered probe chain → format-name tag (NULL = dead letter)."""
    expr = F.lit(None).cast("string")
    for fmt in reversed(FORMAT_REGISTRY):
        expr = F.when(fmt.probe(raw), F.lit(fmt.name)).otherwise(expr)
    return expr


_FIELD_ORDER = [
    "op", "lsn", "commit_ts", "conv_id", "turn_idx", "after", "schema_change",
    "txn_id",
]


def parse_changes(
    raw_df: DataFrame, value_col: str = "value", keep_dead: bool = False
) -> DataFrame:
    """Raw text lines → normalized CHANGE_SCHEMA rows, in ONE scan.

    ``raw_df`` must have ``value_col`` plus lineage columns ``src_file`` /
    ``src_offset`` (use :func:`with_lineage` for file sources).

    Stage 1 materializes each registered format's parsed struct as a
    probe-guarded column (one expensive parse per row, total). Stage 2
    projects the normalized fields via when-chains over those structs —
    pure struct-field access, no re-parse. Unclaimed rows (dead letters)
    are filtered out; unused fields are pruned by Catalyst.

    ``keep_dead=True`` keeps unclaimed non-blank rows (``src_format``
    NULL, all normalized fields NULL) and carries the raw line through as
    ``raw_value`` — the epoch driver splits them off for the dead-letter
    sink in the SAME pass that feeds the apply, instead of re-scanning
    the source (UNSUPPORTED-status analog,
    /root/reference/include/nvimgcodec.h:735-768).
    """
    raw = F.col(value_col)
    fmt_col = detect_format_expr(raw)
    df = raw_df.withColumn("src_format", fmt_col)
    if keep_dead:
        df = df.where(F.col("src_format").isNotNull() | (F.length(F.trim(raw)) > 0))
    else:
        df = df.where(F.col("src_format").isNotNull())
    # stage 1: guarded expensive parses, one projection column per format
    for fmt in FORMAT_REGISTRY:
        df = df.withColumn(
            f"_rp_{fmt.name}",
            F.when(F.col("src_format") == fmt.name, fmt.parse_struct(raw)),
        )
    # stage 2: normalized fields from the materialized structs
    per_fmt = [
        (fmt, fmt.normalize(F.col(f"_rp_{fmt.name}"), raw)) for fmt in FORMAT_REGISTRY
    ]
    cols = []
    for field in _FIELD_ORDER:
        target = next(f for f in CHANGE_SCHEMA.fields if f.name == field)
        expr = F.lit(None).cast(target.dataType)
        for fmt, fields in reversed(per_fmt):
            if field not in fields:
                # format doesn't carry this (optional) field — its rows
                # fall through to the null default
                continue
            expr = (
                F.when(F.col("src_format") == fmt.name, fields[field].cast(target.dataType))
                .otherwise(expr)
            )
        cols.append(expr.alias(field))
    extra = [F.col("src_file"), F.col("src_offset"), F.col("src_format")]
    if keep_dead:
        extra.append(raw.alias("raw_value"))
    return df.select(*cols, *extra)


def dead_letters(raw_df: DataFrame, value_col: str = "value") -> DataFrame:
    """Rows no registered format claims (UNSUPPORTED sentinel analog)."""
    raw = F.col(value_col)
    return raw_df.where(detect_format_expr(raw).isNull() & (F.length(F.trim(raw)) > 0))


def with_lineage(df: DataFrame, precise_offsets: bool = False) -> DataFrame:
    """Attach (src_file, src_offset) lineage to a text-file scan.

    Default (scale path): ``src_offset = monotonically_increasing_id()`` —
    shuffle-free, monotone within each scan partition. The LWW tiebreak
    only ever decides between *exact duplicates* (same key + lsn carry the
    same payload, FIXTURES.md §3), so the winning payload is deterministic
    even though the offset is not file-positional.

    ``precise_offsets=True`` computes the true record index within each
    file via a per-file window — a shuffle; use for audits/small streams.
    """
    df = df.withColumn("src_file", F.input_file_name())
    if precise_offsets:
        w = F.row_number().over(
            Window.partitionBy("src_file").orderBy(F.monotonically_increasing_id())
        )
        return df.withColumn("src_offset", w.cast("long"))
    return df.withColumn("src_offset", F.monotonically_increasing_id())


class ChangeStream:
    """A lazily-read change stream over a directory of event files.

    Analog of ``CodeStream`` (/root/reference/src/code_stream.cpp:156-201):
    registration is cheap; parsing happens on access. ``slice`` carves a
    micro-batch view by LSN range — the analog of
    ``nvimgcodecCodeStreamGetSubCodeStream``
    (/root/reference/src/code_stream.cpp:47-95).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._max_lsn_cache: tuple[tuple, int | None] | None = None

    def raw(self) -> DataFrame:
        return with_lineage(self.spark.read.text(self.path))

    def events(self) -> DataFrame:
        return parse_changes(self.raw())

    def dead_letters(self) -> DataFrame:
        return dead_letters(self.raw())

    def slice(self, start_lsn: int | None = None, end_lsn: int | None = None) -> DataFrame:
        """Events with start_lsn < lsn <= end_lsn (half-open micro-batch view).

        The lsn predicate sits directly over the scan so Catalyst pushes
        it into the source once events are stored columnar; for text
        sources it at least prunes before any shuffle."""
        df = self.events()
        if start_lsn is not None:
            df = df.where(F.col("lsn") > F.lit(start_lsn))
        if end_lsn is not None:
            df = df.where(F.col("lsn") <= F.lit(end_lsn))
        return df

    def lsn_counts(
        self, start_lsn: int = 0, granularity: int = 1
    ) -> list[tuple[int, int]]:
        """Real offset accounting for the incremental loop: event counts
        per LSN chunk, ``[(chunk_end_lsn, n_events), ...]`` ascending,
        over events with ``lsn > start_lsn``. Chunk c covers
        ``(c*granularity, (c+1)*granularity]`` so ``chunk_end_lsn`` is a
        valid ``slice`` end bound.

        One combinable aggregate over the remaining stream; the driver
        round-trip is bounded by span/granularity rows (callers pick
        granularity so that's ~10^4). This is what lets epoch sizing
        track EVENT counts when LSNs are sparse/gappy — a database LSN
        is a byte position, not a row number, so assuming density
        under-fills epochs by orders of magnitude."""
        g = max(int(granularity), 1)
        # integer `div`, NOT `/`: Spark's / on longs is double division,
        # which loses low bits past 2^53 — exactly the byte-position-LSN
        # domain this feature serves (an off-by-one chunk at the tail
        # would leave events unapplied). `div` truncates toward zero,
        # which equals floor only for non-negative numerators; callers
        # may pass start_lsn=-1 (run_incremental does, so lsn=0 events
        # aren't dropped by the half-open slice), making lsn-1 = -1 the
        # one negative case — floor(-1/g) is -1 for every g, so pin it
        # explicitly instead of letting `div` bin lsn=0 into chunk 0
        # (advisor-caught: chunk bounds must cover (c*g, (c+1)*g]).
        chunk = F.expr(f"CASE WHEN lsn = 0 THEN -1 ELSE (lsn - 1) div {g} END")
        rows = (
            self.slice(start_lsn=start_lsn)
            .groupBy(chunk.alias("chunk"))
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("chunk").isNotNull())
            .orderBy("chunk")
            .collect()
        )
        return [((int(r["chunk"]) + 1) * g, int(r["n"])) for r in rows]

    def safe_boundaries(
        self, candidates: list[int], start_lsn: int | None = None
    ) -> set[int]:
        """Subset of candidate epoch-end LSNs that split NO source
        transaction — a boundary B splits txn t when some of t's events
        have lsn <= B and some have lsn > B (min_lsn <= B < max_lsn).

        Scale shape: one combinable per-txn (min, max) aggregate over the
        remaining window, range-joined against the BROADCAST candidate
        list (callers pass the ~10^4 epoch-chunk ends from lsn_counts),
        one bounded driver collect of unsafe boundaries. Events without a
        txn_id (formats that carry no transaction metadata) never block a
        boundary — each stands alone, like a Debezium event outside any
        BEGIN/END envelope. Streams whose staged schema predates txn_id
        report every candidate safe."""
        ev = self.slice(start_lsn=start_lsn)
        if "txn_id" not in ev.columns or not candidates:
            return set(candidates)
        ext = (
            ev.where(F.col("txn_id").isNotNull())
            .groupBy("txn_id")
            .agg(F.min("lsn").alias("lo"), F.max("lsn").alias("hi"))
            .where(F.col("lo") < F.col("hi"))
        )
        cand = self.spark.createDataFrame(
            [(int(c),) for c in candidates], "b long"
        )
        unsafe = {
            r["b"]
            for r in ext.join(
                F.broadcast(cand),
                (F.col("lo") <= F.col("b")) & (F.col("b") < F.col("hi")),
            )
            .select("b")
            .distinct()
            .collect()
        }
        return set(int(c) for c in candidates) - unsafe

    def max_lsn(self) -> int | None:
        """High-water LSN. Cached per (file set + sizes) fingerprint: a
        text source has no footer stats, so computing this is a full
        parse — callers polling an unchanged directory (the incremental
        loop) must not pay that per epoch."""
        key = tuple((f, os.path.getsize(f)) for f in self.files())
        if self._max_lsn_cache is not None and self._max_lsn_cache[0] == key:
            return self._max_lsn_cache[1]
        row = self.events().agg(F.max("lsn").alias("m")).collect()[0]
        self._max_lsn_cache = (key, row["m"])
        return row["m"]

    def files(self) -> list[str]:
        out = []
        for root, _dirs, fns in os.walk(self.path):
            for fn in sorted(fns):
                if not fn.startswith((".", "_")):
                    out.append(os.path.join(root, fn))
        return sorted(out)

    def materialize(
        self, path: str, lsn_partition_width: int | None = None
    ) -> "ParquetChangeStream":
        """Stage the parsed stream as parquet — the scale path for
        repeated micro-batch consumption.

        A text source re-parses every line on every ``slice`` (an
        incremental loop over E epochs scans the stream E times);
        materializing once makes each subsequent slice a columnar scan
        with the LSN predicate PUSHED INTO the parquet reader (row-group
        stats skip unmatched groups — asserted in tests). With
        ``lsn_partition_width`` the files are additionally directory-
        partitioned by LSN range, so a slice prunes whole directories
        before any I/O. Dead letters are dropped here — account for them
        (``dead_letters()``) before materializing.
        """
        import json as _json

        ev = self.events()
        if lsn_partition_width:
            ev = ev.withColumn(
                "_lsn_part", F.floor(F.col("lsn") / F.lit(lsn_partition_width))
            )
            ev.write.mode("overwrite").partitionBy("_lsn_part").parquet(path)
        else:
            ev.write.mode("overwrite").parquet(path)
        with open(os.path.join(path, "_stream_meta.json"), "w") as f:
            _json.dump({"lsn_partition_width": lsn_partition_width}, f)
        return ParquetChangeStream(self.spark, path)


class ParquetChangeStream(ChangeStream):
    """A change stream backed by a columnar (parquet) staging area.

    Same interface as :class:`ChangeStream`; ``slice`` predicates reach
    the parquet reader (PushedFilters / PartitionFilters), so per-epoch
    reads cost O(epoch), not O(stream). ``max_lsn`` is a footer-stats
    aggregation, not a parse.
    """

    def __init__(self, spark: SparkSession, path: str):
        super().__init__(spark, path)
        import json as _json

        meta_path = os.path.join(path, "_stream_meta.json")
        self.lsn_partition_width: int | None = None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.lsn_partition_width = _json.load(f).get("lsn_partition_width")

    def raw(self) -> DataFrame:  # pragma: no cover — no raw text exists here
        raise TypeError("ParquetChangeStream has no raw text form")

    def events(self) -> DataFrame:
        df = self.spark.read.parquet(self.path)
        return df.drop("_lsn_part") if "_lsn_part" in df.columns else df

    def slice(self, start_lsn: int | None = None, end_lsn: int | None = None) -> DataFrame:
        df = self.spark.read.parquet(self.path)
        w = self.lsn_partition_width
        if w and "_lsn_part" in df.columns:
            # translate the lsn range onto the partition column so whole
            # directories prune BEFORE any file I/O (the lsn row-group
            # filter then trims within the surviving partitions)
            if start_lsn is not None:
                df = df.where(F.col("_lsn_part") >= F.lit(start_lsn // w))
            if end_lsn is not None:
                df = df.where(F.col("_lsn_part") <= F.lit(end_lsn // w))
        if start_lsn is not None:
            df = df.where(F.col("lsn") > F.lit(start_lsn))
        if end_lsn is not None:
            df = df.where(F.col("lsn") <= F.lit(end_lsn))
        return df.drop("_lsn_part") if "_lsn_part" in df.columns else df

    def dead_letters(self) -> DataFrame:
        return self.spark.createDataFrame([], "value string")
