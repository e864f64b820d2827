"""Avro Object Container Files for change events — no spark-avro jar needed.

ROADMAP #1's jar-only remainder, closed in pure Python: this module reads
and writes REAL Avro *object container files* (Avro spec "Object Container
Files") carrying the same ``CdcEvent`` writer schema as the single-object
wire format in ``avro_sobj.py``:

- File header: magic ``Obj\\x01``, the file-metadata map (``avro.schema``
  = writer schema JSON, ``avro.codec`` = ``null`` | ``deflate``), then the
  16-byte sync marker.
- Data blocks: zigzag-varint record count, zigzag-varint byte size of the
  (post-codec) block body, the body, then the sync marker again. The
  ``deflate`` codec is RFC 1951 **raw** deflate (no zlib header/trailer) —
  ``zlib.compressobj(wbits=-15)`` — exactly what the Java reference
  implementation emits.
- Record bodies are plain Avro binary under the same schema, decoded by
  the shared ``read_record_body`` reader (``avro_sobj.py``), so every
  varint/union/bounds rule (and its fuzz coverage) is inherited.

Reader tolerance follows the engine's dead-letter contract
(UNSUPPORTED-status analog, /root/reference/src/codec_registry.cpp:47-59):

- A file whose header is malformed (bad magic, unreadable metadata map,
  unknown codec, wrong schema) contributes ZERO rows and one dead-file
  count — never a scan error.
- A block whose body fails to decode is dropped WHOLE: a failed record
  desynchronizes every later offset in the block (Avro gives no
  per-record framing inside a block), but the declared block size lets
  the reader skip to the next sync marker and continue, so one corrupt
  block costs its own records only. The sync marker is verified after
  every block; a mismatch means the size field itself lied, and the rest
  of the file is unrecoverable without a resync scan — the reader then
  stops the file (remaining records count as dead).

Schema check: the embedded ``avro.schema`` JSON is reduced to Avro's
*Parsing Canonical Form* and compared to ``SCHEMA_PCF`` — a conforming
writer may attach logicalType/doc/default attributes or reorder JSON keys
freely; a file written under a genuinely different schema is rejected
(dead file), not mis-decoded.

Spark integration (scale notes):

- ``read_ocf``: ``spark.read.format("binaryFile")`` + an Arrow-batched
  ``mapInPandas`` decode — the sanctioned Pandas-UDF use case (binary
  container parsing), same shape as the FVID frame parse in
  operators/multimodal.py. The parallelism unit is the FILE (binaryFile
  delivers whole objects); for a FEW HUGE files, ``read_ocf_split``
  re-implements the sync-marker split protocol of Hadoop's Avro input
  format in pure Python (block-level byte-range tasks via ``pyarrow.fs``
  — see the split section below). The WRITE path shards output into many
  container files (one per shard), the same many-files contract every
  other source in this engine scales by — at 1000 executors you point
  ``shards`` at a multiple of the cluster's parallelism, not at 1.
- ``write_ocf``: deterministic ``xxhash64(key) mod shards`` sharding (the
  ``export_jsonl`` convention, operators/transcripts.py:79), one
  container file per shard written from the executor via
  ``applyInPandas``; records within a shard sort by (lsn, conv_id,
  turn_idx) and the sync marker derives from (schema fingerprint, shard),
  so re-exports are byte-identical — diffable, cache-friendly, and safe
  to rsync incrementally.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import zlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.sources.avro_sobj import (
    SCHEMA_PCF,
    _enc_long,
    encode_avro_record,
    read_record_body,
)

OCF_MAGIC = b"Obj\x01"
SYNC_LEN = 16

#: Writer schema as embedded in file metadata — the PCF plus the
#: timestamp-micros logicalType annotation (readers must canonicalize it
#: away; ours does, and the round-trip test pins that).
SCHEMA_JSON = (
    '{"type":"record","name":"CdcEvent","fields":['
    '{"name":"op","type":"string"},'
    '{"name":"lsn","type":"long"},'
    '{"name":"commit_ts","type":{"type":"long","logicalType":"timestamp-micros"}},'
    '{"name":"conv_id","type":["null","string"]},'
    '{"name":"turn_idx","type":["null","int"]},'
    '{"name":"payload","type":["null","string"]}]}'
)

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


def to_parsing_canonical_form(schema) -> str:
    """Avro Parsing Canonical Form of a JSON-decoded schema.

    Implements the spec's [STRIP]/[ORDER]/[STRINGS] rules for the subset
    of Avro this engine's schemas use (records, unions, primitives,
    arrays/maps/fixed/enum for completeness). Full-name resolution is
    applied when a namespace is present."""
    return json.dumps(_pcf(schema, ""), separators=(",", ":"))


def _fullname(name: str, namespace: str, enclosing: str) -> str:
    if "." in name:
        return name
    ns = namespace if namespace else enclosing
    return f"{ns}.{name}" if ns else name


def _pcf(s, enclosing_ns: str):
    if isinstance(s, str):
        if s in _PRIMITIVES:
            return s
        return _fullname(s, "", enclosing_ns)  # named-type reference
    if isinstance(s, list):  # union
        return [_pcf(b, enclosing_ns) for b in s]
    if not isinstance(s, dict):
        raise ValueError(f"unsupported schema node: {s!r}")
    t = s["type"]
    if t in _PRIMITIVES:
        return t  # logicalType etc. stripped
    if t == "array":
        return {"type": "array", "items": _pcf(s["items"], enclosing_ns)}
    if t == "map":
        return {"type": "map", "values": _pcf(s["values"], enclosing_ns)}
    if t in ("record", "error"):
        full = _fullname(s["name"], s.get("namespace", ""), enclosing_ns)
        ns = full.rsplit(".", 1)[0] if "." in full else ""
        return {
            "name": full,
            "type": "record",
            "fields": [
                {
                    "name": f["name"],
                    "type": _pcf(f["type"], ns),
                }
                for f in s["fields"]
            ],
        }
    if t == "enum":
        full = _fullname(s["name"], s.get("namespace", ""), enclosing_ns)
        return {"name": full, "type": "enum", "symbols": s["symbols"]}
    if t == "fixed":
        full = _fullname(s["name"], s.get("namespace", ""), enclosing_ns)
        return {"name": full, "type": "fixed", "size": s["size"]}
    return _pcf(t, enclosing_ns)  # {"type": <nested schema>} wrapper


# ------------------------------------------------------------------ write


def _enc_map(meta: dict[str, bytes]) -> bytes:
    """Avro map<bytes> encoding: one block of N pairs, then end marker."""
    if not meta:
        return b"\x00"
    out = _enc_long(len(meta))
    for k, v in meta.items():
        kb = k.encode("utf-8")
        out += _enc_long(len(kb)) + kb + _enc_long(len(v)) + v
    return out + b"\x00"


def sync_marker(shard: int) -> bytes:
    """Deterministic per-shard sync marker (re-exports byte-identical)."""
    return hashlib.md5(f"{SCHEMA_PCF}|{shard}".encode()).digest()[:SYNC_LEN]


def encode_ocf(
    records: Iterable[tuple],
    codec: str = "deflate",
    block_records: int = 4096,
    shard: int = 0,
) -> bytes:
    """Records (op, lsn, ts_us, conv_id, turn_idx, payload) → OCF bytes."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro.codec: {codec}")
    sync = sync_marker(shard)
    out = io.BytesIO()
    out.write(OCF_MAGIC)
    out.write(
        _enc_map(
            {
                "avro.schema": SCHEMA_JSON.encode("utf-8"),
                "avro.codec": codec.encode("utf-8"),
            }
        )
    )
    out.write(sync)
    block: list[bytes] = []

    def flush() -> None:
        if not block:
            return
        body = b"".join(block)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)  # RFC1951 raw
            body = co.compress(body) + co.flush()
        out.write(_enc_long(len(block)))
        out.write(_enc_long(len(body)))
        out.write(body)
        out.write(sync)
        block.clear()

    for op, lsn, ts_us, conv_id, turn_idx, payload in records:
        block.append(
            encode_avro_record(op, int(lsn), int(ts_us), conv_id, turn_idx, payload)
        )
        if len(block) >= block_records:
            flush()
    flush()
    return out.getvalue()


# ------------------------------------------------------------------- read


def _read_vlong(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    end = len(buf)
    while True:
        if pos >= end or shift > 63:
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if b < 0x80:
            return (acc >> 1) ^ -(acc & 1), pos
        shift += 7


def _read_meta_map(buf: bytes, pos: int) -> tuple[dict[str, bytes], int]:
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_vlong(buf, pos)
        if n == 0:
            return meta, pos
        if n < 0:  # negative count: abs(count) with a byte-size long next
            n = -n
            _, pos = _read_vlong(buf, pos)
        for _ in range(n):
            klen, pos = _read_vlong(buf, pos)
            if klen < 0 or pos + klen > len(buf):
                raise ValueError("bad metadata key")
            k = buf[pos : pos + klen].decode("utf-8")
            pos += klen
            vlen, pos = _read_vlong(buf, pos)
            if vlen < 0 or pos + vlen > len(buf):
                raise ValueError("bad metadata value")
            meta[k] = buf[pos : pos + vlen]
            pos += vlen


def parse_ocf_header(buf: bytes) -> tuple[str, bytes, int]:
    """OCF header prefix → (codec, sync_marker, header_end_offset).

    Raises ValueError for a malformed header (bad magic, unreadable
    metadata map, unknown codec, non-CdcEvent schema, truncated sync).
    NOTE: a too-short PREFIX of a valid header may fail with ANY of the
    parse errors, not just the 'truncated ...' ones (a cut inside a
    metadata key/value raises 'bad metadata key/value') — callers that
    probe incrementally (:func:`plan_ocf_splits`) must treat every error
    except bad magic as possibly-needs-more-bytes until the probe covers
    the whole header region."""
    if not buf.startswith(OCF_MAGIC):
        raise ValueError("not an Avro object container file")
    meta, pos = _read_meta_map(buf, len(OCF_MAGIC))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro.codec: {codec}")
    try:
        schema = json.loads(meta["avro.schema"].decode("utf-8"))
    except (KeyError, ValueError) as e:
        raise ValueError(f"missing/invalid avro.schema: {e}")
    if to_parsing_canonical_form(schema) != SCHEMA_PCF:
        raise ValueError("writer schema does not canonicalize to CdcEvent")
    if pos + SYNC_LEN > len(buf):
        raise ValueError("truncated header sync marker")
    return codec, buf[pos : pos + SYNC_LEN], pos + SYNC_LEN


def _decode_block_body(body: bytes, count: int, codec: str) -> list[tuple]:
    """One (post-framing) block body → its records. Raises on any damage;
    callers dead-letter the whole block (no per-record framing in Avro)."""
    if codec == "deflate":
        body = zlib.decompress(body, wbits=-15)
    rows: list[tuple] = []
    bpos, bend = 0, len(body)
    for _ in range(count):
        row, bpos = read_record_body(body, bpos, bend)
        rows.append(row)
    if bpos != bend:
        raise ValueError("trailing bytes in block")
    return rows


def decode_ocf(buf: bytes) -> tuple[list[tuple], int]:
    """OCF bytes → (rows, dead_records). Raises ValueError only for a
    malformed HEADER (callers dead-letter the whole file); body damage is
    contained per-block (module docstring)."""
    codec, sync, pos = parse_ocf_header(buf)

    rows: list[tuple] = []
    dead = 0
    end = len(buf)
    while pos < end:
        try:
            count, pos = _read_vlong(buf, pos)
            size, pos = _read_vlong(buf, pos)
            if count < 0 or size < 0 or pos + size + SYNC_LEN > end:
                raise ValueError("bad block framing")
        except ValueError:
            # framing of THIS block header is gone; no size to skip by
            dead += 1  # at least the records of the lost tail
            break
        body = buf[pos : pos + size]
        pos += size
        ok_sync = buf[pos : pos + SYNC_LEN] == sync
        pos += SYNC_LEN
        block_rows: list[tuple] = []
        decode_failed = False
        try:
            block_rows = _decode_block_body(body, count, codec)
        except (ValueError, UnicodeDecodeError, zlib.error):
            decode_failed = True
        if not ok_sync:
            # the size field itself lied — even rows that happened to
            # parse are untrustworthy, and later offsets are garbage
            dead += count
            break
        if decode_failed:
            dead += count  # whole block dead-letters (module docstring)
        else:
            rows.extend(block_rows)
    return rows, dead


# ------------------------------------------------------------ Spark plane

OCF_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("payload", T.StringType()),
        T.StructField("src_file", T.StringType()),
        T.StructField("dead_records", T.LongType()),
    ]
)


#: binaryFile's fixed schema — streaming sources must declare it explicitly
BINARYFILE_SCHEMA = (
    "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"
)


def parse_ocf_files(bin_df: DataFrame) -> DataFrame:
    """(path, content) binaryFile rows → CdcEvent rows (Arrow-batched).

    Columns: op, lsn, ts_us, conv_id, turn_idx, payload, src_file,
    dead_records (per-file damage count, 0 on every data row; a fully
    dead file yields ONE all-null row carrying its count so lineage can
    see it — filter ``op IS NOT NULL`` for the data plane)."""
    bin_df = bin_df.select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows, dead = decode_ocf(bytes(content))
                except ValueError:
                    rows, dead = [], -1  # whole file dead (header)
                for r in rows:
                    out.append(r + (p, 0))
                if dead:
                    out.append((None,) * 6 + (p, dead))
            cols = list(zip(*out)) if out else [[] for _ in range(8)]
            yield pd.DataFrame(
                {
                    "op": pd.array(cols[0], dtype="object"),
                    "lsn": pd.array(cols[1], dtype="Int64"),
                    "ts_us": pd.array(cols[2], dtype="Int64"),
                    "conv_id": pd.array(cols[3], dtype="object"),
                    "turn_idx": pd.array(cols[4], dtype="Int32"),
                    "payload": pd.array(cols[5], dtype="object"),
                    "src_file": pd.array(cols[6], dtype="object"),
                    "dead_records": pd.array(cols[7], dtype="Int64"),
                }
            )

    return bin_df.mapInPandas(parse, OCF_SCHEMA)


def read_ocf(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of ``.avro`` container files → CdcEvent DataFrame
    (column contract: see :func:`parse_ocf_files`)."""
    return parse_ocf_files(spark.read.format("binaryFile").load(path))


def write_ocf(
    df: DataFrame,
    out_dir: str,
    shards: int = 8,
    codec: str = "deflate",
    key_col: str = "conv_id",
    block_records: int = 4096,
) -> DataFrame:
    """CdcEvent DataFrame → ``shards`` container files under ``out_dir``.

    Input columns: op, lsn, ts_us, conv_id, turn_idx, payload. Sharding,
    determinism and sizing contract per the module docstring. Returns the
    per-shard manifest (shard, path, records, bytes) — an ACTION has
    already run by the time this returns (files are on disk)."""
    if shards < 1:
        raise ValueError("shards must be >= 1")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro.codec: {codec}")
    os.makedirs(out_dir, exist_ok=True)
    staged = df.select(
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(shards))
        .cast("int")
        .alias("shard"),
        "op", "lsn", "ts_us", "conv_id", "turn_idx", "payload",
    )

    manifest_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField("path", T.StringType()),
            T.StructField("records", T.LongType()),
            T.StructField("bytes", T.LongType()),
        ]
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=["shard", "path", "records", "bytes"])
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(["lsn", "conv_id", "turn_idx"], kind="mergesort")
        recs = (
            (
                r.op,
                int(r.lsn),
                int(r.ts_us),
                None if pd.isna(r.conv_id) else r.conv_id,
                None if pd.isna(r.turn_idx) else int(r.turn_idx),
                None if pd.isna(r.payload) else r.payload,
            )
            for r in pdf.itertuples()
        )
        blob = encode_ocf(recs, codec=codec, shard=shard, block_records=block_records)
        path = os.path.join(out_dir, f"part-{shard:05d}.avro")
        tmp = path + ".inprogress"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # readers never see a half-written shard
        return pd.DataFrame(
            {
                "shard": [shard],
                "path": [path],
                "records": [len(pdf)],
                "bytes": [len(blob)],
            }
        )

    manifest = staged.groupBy("shard").applyInPandas(write_shard, manifest_schema)
    return manifest.orderBy("shard").localCheckpoint(eager=True)


def ocf_changes(parsed: DataFrame) -> DataFrame:
    """``read_ocf`` output → normalized CHANGE_SCHEMA rows the engine's
    ``apply_epoch`` consumes directly (same field semantics as the
    registered ``avro-sobj`` wire format's normalize: payload carries the
    after-image for I/U and the schema-change JSON for op='S').

    Damage rows (op NULL, per-file ``dead_records``) become dead-letter
    rows in the ``parse_changes(keep_dead=True)`` convention —
    ``src_format`` NULL with a descriptive ``raw_value`` — so the engine
    sinks and counts them per source file. One dead ROW stands for the
    file's whole damage count (the container reader can't recover the
    individual records); ``raw_value`` records that count."""
    from nvimagecodec_spark.sources.changelog import SCHEMA_CHANGE_SCHEMA

    is_dead = F.col("op").isNull()
    return parsed.select(
        F.col("op"),
        F.col("lsn"),
        F.timestamp_micros(F.col("ts_us")).alias("commit_ts"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.when(
            (F.col("op") != "S") & F.col("payload").isNotNull(), F.col("payload")
        ).alias("after"),
        F.when(
            (F.col("op") == "S") & F.col("payload").isNotNull(),
            F.from_json("payload", SCHEMA_CHANGE_SCHEMA),
        ).alias("schema_change"),
        F.lit(None).cast("long").alias("txn_id"),
        F.col("src_file"),
        F.coalesce(F.col("lsn"), F.lit(-1)).alias("src_offset"),
        F.when(~is_dead, F.lit("avro-ocf")).alias("src_format"),
        F.when(
            is_dead,
            F.concat(
                F.lit("ocf-damage:"),
                F.col("src_file"),
                F.lit(":dead_records="),
                F.col("dead_records").cast("string"),
            ),
        ).alias("raw_value"),
    )


# -------------------------------------------- single-file block-level splits
#
# ``read_ocf`` parallelizes per FILE (binaryFile delivers whole objects);
# one 50 GB container file would be one task holding 50 GB. This tier
# closes that gap without the spark-avro jar by re-implementing the
# sync-marker split protocol of Hadoop's Avro input format:
#
# - The DRIVER reads only each file's HEADER (magic + metadata map + sync,
#   a few KB) — the same bounded-metadata cost class as parquet footer
#   reads — and cuts the remaining byte range into ``split_bytes`` ranges.
# - Each EXECUTOR task owns a byte range [s, e): it scans forward from
#   ``s`` for the 16-byte sync marker and decodes every block whose
#   *preceding* sync occurrence starts in [s, e), reading past ``e`` to
#   finish its last block (the standard split-ownership rule, so adjacent
#   tasks partition the blocks exactly: each block is owned by exactly
#   one split because each is preceded by exactly one sync occurrence —
#   the header's trailing sync for the first block). Range reads go
#   through ``pyarrow.fs`` (local/HDFS/S3/GCS from the URI scheme), so
#   the scan works executor-side where the JVM Hadoop gateway isn't
#   reachable from Python workers.
# - Damage containment is STRONGER than the whole-file reader: where
#   ``decode_ocf`` must stop a file at a lying size field (no resync
#   scan), the split scanner RE-SYNCS — scan forward to the next marker
#   occurrence and continue — so mid-file framing damage costs the
#   blocks it touches, not the rest of the file.
#
# A 16-byte marker colliding with block data is possible in principle
# (2^-128 per offset — the same accepted risk as the Java implementation);
# a false positive fails block parse, counts one dead unit and re-syncs,
# never duplicating or dropping real rows.

SPLIT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("start", T.LongType()),     # -1 => whole file dead
        T.StructField("end", T.LongType()),
        T.StructField("file_len", T.LongType()),
        T.StructField("codec", T.StringType()),
        T.StructField("sync", T.BinaryType()),
    ]
)

_HEADER_PROBE = 1 << 16       # first header read; doubles up to the cap
_HEADER_CAP = 1 << 22         # a sane schema-metadata bound


def _fs_for(path: str):
    """Path/URI → (pyarrow FileSystem, fs-relative path)."""
    import pyarrow.fs as pafs

    if "://" in path or path.startswith("file:/"):
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def plan_ocf_splits(path: str, split_bytes: int = 128 << 20) -> list[tuple]:
    """Directory or single ``.avro`` file → SPLIT_SCHEMA tuples.

    Driver-side metadata pass: lists files and reads each HEADER only.
    A file whose header is malformed yields one ``start=-1`` dead-file
    split (the scan emits its dead-row marker); body bytes are never
    read here."""
    import pyarrow.fs as pafs

    if split_bytes < 1:
        raise ValueError("split_bytes must be >= 1")
    fs, rel = _fs_for(path)
    info = fs.get_file_info(rel)
    if info.type == pafs.FileType.Directory:
        infos = [
            i
            for i in fs.get_file_info(pafs.FileSelector(rel, recursive=True))
            if i.is_file and i.base_name.endswith(".avro")
        ]
    elif info.type == pafs.FileType.File:
        infos = [info]
    else:
        raise FileNotFoundError(path)

    splits: list[tuple] = []
    for i in sorted(infos, key=lambda x: x.path):
        fpath, flen = i.path, i.size
        try:
            with fs.open_input_file(fpath) as f:
                probe = _HEADER_PROBE
                buf = f.read_at(min(probe, flen), 0)
                while True:
                    try:
                        codec, sync, header_end = parse_ocf_header(bytes(buf))
                        break
                    except ValueError as e:
                        # A short PREFIX of a valid header can fail with
                        # any parse error, not just 'truncated ...' — a
                        # probe boundary inside a metadata key/value
                        # raises 'bad metadata key/value'. So grow on ANY
                        # error until the probe covers the whole file (or
                        # the metadata sanity cap); only then is the
                        # header genuinely malformed. Bad magic is
                        # decidable from the first 4 bytes — fail fast.
                        if "not an Avro object container file" in str(e):
                            raise
                        if probe >= min(flen, _HEADER_CAP):
                            raise
                        probe = min(probe * 2, _HEADER_CAP)
                        buf = f.read_at(min(probe, flen), 0)
        except (ValueError, OSError):
            splits.append((fpath, -1, -1, flen, None, None))
            continue
        # ranges partition [header_end - SYNC_LEN, flen): every block's
        # preceding sync occurrence (incl. the header's trailing sync for
        # the first block) lands in exactly one range
        s = header_end - SYNC_LEN
        while s < flen:
            e = min(s + max(split_bytes, SYNC_LEN + 1), flen)
            splits.append((fpath, s, e, flen, codec, sync))
            s = e
    return splits


def _scan_ocf_split(
    path: str, start: int, end: int, file_len: int, codec: str, sync: bytes
) -> tuple[list[tuple], int]:
    """Decode the blocks owned by byte range [start, end) → (rows, dead).

    Owns a block iff its preceding sync occurrence starts in [start, end).
    Reads at most one block past ``end``; buffer prefix is dropped as the
    scan advances, so memory is O(chunk + largest block), not O(range)."""
    fs, rel = _fs_for(path)
    chunk = 1 << 22
    rows: list[tuple] = []
    dead = 0
    with fs.open_input_file(rel) as f:
        base = start            # absolute offset of buf[0]
        buf = bytearray()

        def ensure(abs_end: int) -> bool:
            """Grow buf to cover [base, abs_end); False once EOF blocks it."""
            nonlocal buf
            abs_end = min(abs_end, file_len)
            have = base + len(buf)
            while have < abs_end:
                n = max(chunk, abs_end - have)
                got = f.read_at(min(n, file_len - have), have)
                if not got:
                    return False
                buf += got
                have = base + len(buf)
            return base + len(buf) >= abs_end

        def find_sync(abs_from: int, abs_limit: int) -> int:
            """First sync occurrence at offset q with abs_from <= q < abs_limit,
            else -1. Reads ahead chunk-by-chunk; keeps a 15-byte overlap."""
            nonlocal base, buf
            q = max(abs_from, base)
            while q < abs_limit:
                ensure(q + chunk)
                # drop consumed prefix so the buffer stays bounded
                if q - base > chunk:
                    buf = buf[q - base :]
                    base = q
                idx = bytes(buf).find(sync, q - base)
                if idx >= 0 and base + idx < abs_limit:
                    return base + idx
                scanned_to = base + len(buf) - (SYNC_LEN - 1)
                if base + len(buf) >= file_len and idx < 0:
                    return -1
                if scanned_to <= q:   # no progress possible (EOF tail)
                    return -1
                q = scanned_to
            return -1

        q = find_sync(start, end)
        while q != -1 and q < end:
            p = q + SYNC_LEN            # candidate block start
            if p >= file_len:
                break
            # framing: count + size varints, bounds against file length
            framing = None
            try:
                ensure(p + 20)          # two varints worst-case window
                count, pos = _read_vlong(bytes(buf), p - base)
                size, pos = _read_vlong(bytes(buf), pos)
                if count >= 0 and size >= 0 and base + pos + size + SYNC_LEN <= file_len:
                    framing = (count, size, base + pos)
            except ValueError:
                pass
            if framing is None:
                # framing lost at p (damage or a false sync positive):
                # at least one unit dead; RE-SYNC — scan for the next
                # marker occurrence still owned by this range
                dead += 1
                q = find_sync(p, end)
                continue
            count, size, body_start = framing
            ensure(body_start + size + SYNC_LEN)
            off = body_start - base
            body = bytes(buf[off : off + size])
            if bytes(buf[off + size : off + size + SYNC_LEN]) != sync:
                dead += count           # size field lied; rows untrustworthy
                q = find_sync(p, end)
                continue
            try:
                rows.extend(_decode_block_body(body, count, codec))
            except (ValueError, UnicodeDecodeError, zlib.error):
                dead += count           # framing intact: block dead-letters whole
            q = body_start + size       # this block's trailing sync
            # block consumed; drop the prefix before the next iteration
            if q - base > chunk:
                buf = buf[q - base :]
                base = q
    return rows, dead


def parse_ocf_splits(splits_df: DataFrame) -> DataFrame:
    """SPLIT_SCHEMA rows → CdcEvent rows (column contract identical to
    :func:`parse_ocf_files`: data rows carry dead_records=0; a split with
    damage adds one all-null row carrying its dead count; a dead-FILE
    split yields the single dead_records=-1 marker row)."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for r in pdf.itertuples():
                if int(r.start) < 0:
                    out.append((None,) * 6 + (r.path, -1))
                    continue
                rows, dead = _scan_ocf_split(
                    r.path, int(r.start), int(r.end), int(r.file_len),
                    r.codec, bytes(r.sync),
                )
                for row in rows:
                    out.append(row + (r.path, 0))
                if dead:
                    out.append((None,) * 6 + (r.path, dead))
            cols = list(zip(*out)) if out else [[] for _ in range(8)]
            yield pd.DataFrame(
                {
                    "op": pd.array(cols[0], dtype="object"),
                    "lsn": pd.array(cols[1], dtype="Int64"),
                    "ts_us": pd.array(cols[2], dtype="Int64"),
                    "conv_id": pd.array(cols[3], dtype="object"),
                    "turn_idx": pd.array(cols[4], dtype="Int32"),
                    "payload": pd.array(cols[5], dtype="object"),
                    "src_file": pd.array(cols[6], dtype="object"),
                    "dead_records": pd.array(cols[7], dtype="Int64"),
                }
            )

    return splits_df.mapInPandas(scan, OCF_SCHEMA)


def read_ocf_split(
    spark: SparkSession, path: str, split_bytes: int = 128 << 20
) -> DataFrame:
    """Directory or single huge ``.avro`` file → CdcEvent DataFrame with
    BLOCK-LEVEL parallelism inside each file: one task per ``split_bytes``
    byte range (vs. :func:`read_ocf`'s one task per file). Same column
    contract as :func:`parse_ocf_files`."""
    splits = plan_ocf_splits(path, split_bytes)
    if not splits:
        return spark.createDataFrame([], OCF_SCHEMA)
    sdf = spark.createDataFrame(splits, SPLIT_SCHEMA)
    # one split per task: the scan is the work unit, not the row count
    sdf = sdf.repartition(len(splits))
    return parse_ocf_splits(sdf)
