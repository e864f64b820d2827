"""Avro Object Container File connector (sources/avro_ocf.py).

Conformance is checked two independent ways:

1. Pure-Python round-trips + structural damage containment (these pin the
   engine's dead-letter contract for containers).
2. INTEROP with the official Java Avro implementation that ships on
   Spark's classpath (avro-1.12.1.jar): our writer's files read by
   ``org.apache.avro.file.DataFileReader``, and files written by Java's
   ``DataFileWriter`` read by our decoder — both codecs. This is the
   same cross-implementation bar the single-object format meets via its
   pinned CRC-64-AVRO fingerprints.
"""

import json
import os
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nvimagecodec_spark.sources.avro_ocf import (
    OCF_MAGIC,
    SCHEMA_JSON,
    decode_ocf,
    encode_ocf,
    read_ocf,
    sync_marker,
    to_parsing_canonical_form,
    write_ocf,
)
from nvimagecodec_spark.sources.avro_sobj import SCHEMA_PCF

RECS = [
    ("I", 1, 1_000_000, "c1", 0, '{"a":1}'),
    ("U", 2, 2_000_000, "c1", 1, '{"a":2}'),
    ("D", 3, 3_000_000, None, None, None),
    ("S", 4, 4_000_000, "c2", -5, "x" * 10_000),
    ("I", -(1 << 62), 0, "", 2**31 - 1, ""),
]


# ------------------------------------------------------------ pure python


@pytest.mark.parametrize("codec", ["null", "deflate"])
@pytest.mark.parametrize("block_records", [1, 2, 4096])
def test_roundtrip(codec, block_records):
    blob = encode_ocf(RECS, codec=codec, block_records=block_records)
    rows, dead = decode_ocf(blob)
    # empty payload string encodes as null union branch (same convention
    # as the single-object encoder, avro_sobj.encode_avro_record)
    want = [r[:5] + (None if r[5] == "" else r[5],) for r in RECS]
    assert dead == 0
    assert rows == want


def test_schema_json_canonicalizes_to_pcf():
    # the embedded schema carries logicalType; PCF must strip it
    assert to_parsing_canonical_form(json.loads(SCHEMA_JSON)) == SCHEMA_PCF


def test_foreign_schema_rejected():
    blob = bytearray(encode_ocf(RECS))
    foreign = SCHEMA_JSON.replace('"CdcEvent"', '"Other"').encode()
    # rebuild header with the foreign schema (same length not guaranteed,
    # so re-encode via the private map encoder)
    from nvimagecodec_spark.sources.avro_ocf import _enc_map

    hdr = OCF_MAGIC + _enc_map(
        {"avro.schema": foreign, "avro.codec": b"null"}
    )
    # splice: original header length
    orig_hdr = OCF_MAGIC + _enc_map(
        {"avro.schema": SCHEMA_JSON.encode(), "avro.codec": b"deflate"}
    )
    body = bytes(blob[len(orig_hdr):])
    with pytest.raises(ValueError, match="canonicalize"):
        decode_ocf(hdr + body)


def test_key_order_and_attrs_insensitive_schema_accepted():
    """A conforming writer may reorder JSON keys / add doc attributes."""
    schema = json.loads(SCHEMA_JSON)
    schema["doc"] = "anything"
    schema["fields"][0] = {"doc": "op code", "type": "string", "name": "op"}
    reordered = json.dumps(schema)
    from nvimagecodec_spark.sources.avro_ocf import _enc_map

    hdr = OCF_MAGIC + _enc_map(
        {"avro.schema": reordered.encode(), "avro.codec": b"null"}
    )
    orig_hdr = OCF_MAGIC + _enc_map(
        {"avro.schema": SCHEMA_JSON.encode(), "avro.codec": b"null"}
    )
    blob = encode_ocf(RECS, codec="null")
    rows, dead = decode_ocf(hdr + blob[len(orig_hdr):])
    assert dead == 0 and len(rows) == len(RECS)


def test_bad_magic_and_unknown_codec_raise():
    with pytest.raises(ValueError, match="container"):
        decode_ocf(b"NOPE" + b"\x00" * 40)
    from nvimagecodec_spark.sources.avro_ocf import _enc_map

    hdr = OCF_MAGIC + _enc_map(
        {"avro.schema": SCHEMA_JSON.encode(), "avro.codec": b"snappy"}
    )
    with pytest.raises(ValueError, match="codec"):
        decode_ocf(hdr + sync_marker(0))


def test_corrupt_block_dead_letters_only_itself():
    """Damage in one block's body loses that block, not the file."""
    blob = bytearray(encode_ocf(RECS, codec="null", block_records=2))
    # find the SECOND block: after header+sync, blocks are
    # count|size|body|sync — walk one block, then corrupt inside the next
    from nvimagecodec_spark.sources.avro_ocf import _read_meta_map, _read_vlong

    pos = len(OCF_MAGIC)
    _, pos = _read_meta_map(bytes(blob), pos)
    pos += 16  # header sync
    _, p2 = _read_vlong(bytes(blob), pos)
    size, p2 = _read_vlong(bytes(blob), p2)
    pos = p2 + size + 16  # start of block 2
    _, p3 = _read_vlong(bytes(blob), pos)
    _, p3 = _read_vlong(bytes(blob), p3)
    blob[p3] ^= 0xFF  # first body byte of block 2
    rows, dead = decode_ocf(bytes(blob))
    assert dead == 2  # block 2 carried records 3 and 4
    assert [r[1] for r in rows] == [1, 2, RECS[4][1]]  # blocks 1 and 3 kept


def test_sync_mismatch_stops_file():
    blob = bytearray(encode_ocf(RECS, codec="null", block_records=2))
    blob[-1] ^= 0xFF  # last block's sync marker
    rows, dead = decode_ocf(bytes(blob))
    assert len(rows) == 4 and dead == 1


def test_truncated_tail_counts_dead():
    rows, dead = decode_ocf(encode_ocf(RECS)[:-10])
    assert rows == [] and dead >= 1


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["I", "U", "D", "S"]),
            st.integers(-(1 << 62), (1 << 62) - 1),
            st.integers(-(1 << 62), (1 << 62) - 1),
            st.one_of(st.none(), st.text(max_size=40)),
            st.one_of(st.none(), st.integers(-(1 << 31), (1 << 31) - 1)),
            st.one_of(st.none(), st.text(max_size=200)),
        ),
        max_size=30,
    ),
    st.sampled_from(["null", "deflate"]),
    st.integers(1, 7),
)
def test_roundtrip_fuzz(recs, codec, block_records):
    rows, dead = decode_ocf(encode_ocf(recs, codec=codec, block_records=block_records))
    want = [r[:5] + (None if r[5] == "" else r[5],) for r in recs]
    assert dead == 0 and rows == want


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_damage_fuzz_never_raises_past_header(data):
    """Arbitrary single-byte damage / truncation beyond the header never
    raises — it dead-letters (ValueError is reserved for header damage,
    which the Spark reader maps to a whole-dead file)."""
    blob = bytearray(encode_ocf(RECS, codec="deflate", block_records=2))
    from nvimagecodec_spark.sources.avro_ocf import _read_meta_map

    hdr_end = _read_meta_map(bytes(blob), len(OCF_MAGIC))[1] + 16
    mode = data.draw(st.sampled_from(["flip", "trunc"]))
    if mode == "flip":
        i = data.draw(st.integers(hdr_end, len(blob) - 1))
        blob[i] ^= data.draw(st.integers(1, 255))
    else:
        blob = blob[: data.draw(st.integers(hdr_end, len(blob) - 1))]
    rows, dead = decode_ocf(bytes(blob))
    assert len(rows) + dead >= 0  # no exception is the assertion


# ------------------------------------------------------------ spark plane


def _mk_events(spark, n=400):
    return spark.range(n).select(
        F.when(F.col("id") % 7 == 0, "D").otherwise("I").alias("op"),
        F.col("id").alias("lsn"),
        (F.col("id") * 1_000_000).alias("ts_us"),
        F.concat(F.lit("conv-"), (F.col("id") % 37).cast("string")).alias("conv_id"),
        (F.col("id") % 50).cast("int").alias("turn_idx"),
        F.when(F.col("id") % 7 != 0, F.to_json(F.struct("id"))).alias("payload"),
    )


def test_spark_roundtrip(spark, tmp_dir):
    df = _mk_events(spark)
    manifest = write_ocf(df, tmp_dir, shards=5, codec="deflate")
    m = {r["shard"]: r for r in manifest.collect()}
    assert set(m) == set(range(5))
    assert sum(r["records"] for r in m.values()) == 400
    for r in m.values():
        assert os.path.getsize(r["path"]) == r["bytes"]
    back = read_ocf(spark, tmp_dir).where(F.col("op").isNotNull())
    assert back.orderBy("lsn").drop("src_file", "dead_records").collect() == (
        df.orderBy("lsn").collect()
    )


def test_spark_write_deterministic(spark, tmp_dir):
    """Same input → byte-identical shards (sync markers included)."""
    df = _mk_events(spark, 150)
    a_dir, b_dir = tmp_dir + "/a", tmp_dir + "/b"
    wa = {r["shard"]: r["path"] for r in write_ocf(df, a_dir, shards=3).collect()}
    wb = {r["shard"]: r["path"] for r in write_ocf(df, b_dir, shards=3).collect()}
    for s in wa:
        with open(wa[s], "rb") as fa, open(wb[s], "rb") as fb:
            assert fa.read() == fb.read(), f"shard {s} not deterministic"


def test_spark_dead_file_row(spark, tmp_dir):
    df = _mk_events(spark, 50)
    write_ocf(df, tmp_dir, shards=2)
    with open(os.path.join(tmp_dir, "part-00001.avro"), "r+b") as f:
        f.write(b"XXXX")  # kill the magic
    back = read_ocf(spark, tmp_dir)
    dead = back.where(F.col("op").isNull()).collect()
    assert len(dead) == 1 and dead[0]["dead_records"] == -1
    live = back.where(F.col("op").isNotNull())
    assert live.count() == [
        r["records"]
        for r in write_ocf(df, tmp_dir + "/ref", shards=2).collect()
        if r["shard"] == 0
    ][0]


# ------------------------------------------------------- java avro interop


def _java_avro_available(spark):
    try:
        spark._jvm.org.apache.avro.Schema.Parser()
        return True
    except Exception:
        return False


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_java_reads_our_files(spark, tmp_dir, codec):
    if not _java_avro_available(spark):
        pytest.skip("org.apache.avro not on the JVM classpath")
    df = _mk_events(spark, 100)
    manifest = write_ocf(df, tmp_dir, shards=1, codec=codec)
    path = manifest.collect()[0]["path"]
    jvm = spark._jvm
    fr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while fr.hasNext():
        rec = fr.next()
        conv = rec.get("conv_id")
        pay = rec.get("payload")
        got.append(
            (
                str(rec.get("op")),
                rec.get("lsn"),
                rec.get("commit_ts"),
                None if conv is None else str(conv),
                rec.get("turn_idx"),
                None if pay is None else str(pay),
            )
        )
    fr.close()
    want = [tuple(r) for r in df.orderBy("lsn").collect()]
    assert sorted(got, key=lambda t: t[1]) == want


def test_our_reader_reads_java_files(spark, tmp_dir):
    if not _java_avro_available(spark):
        pytest.skip("org.apache.avro not on the JVM classpath")
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(SCHEMA_JSON)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    path = os.path.join(tmp_dir, "java.avro")
    writer.create(schema, jvm.java.io.File(path))
    for op, lsn, ts, conv, turn, pay in [
        ("I", 10, 1_000_000, "c9", 3, '{"k":1}'),
        ("D", 11, 2_000_000, None, None, None),
    ]:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("op", op)
        rec.put("lsn", jvm.java.lang.Long(lsn))
        rec.put("commit_ts", jvm.java.lang.Long(ts))
        rec.put("conv_id", conv)
        rec.put("turn_idx", None if turn is None else jvm.java.lang.Integer(turn))
        rec.put("payload", pay)
        writer.append(rec)
    writer.close()
    with open(path, "rb") as f:
        rows, dead = decode_ocf(f.read())
    assert dead == 0
    assert rows == [
        ("I", 10, 1_000_000, "c9", 3, '{"k":1}'),
        ("D", 11, 2_000_000, None, None, None),
    ]


# ------------------------------------------------------ engine integration


def _lake_events(spark, rows):
    df = spark.createDataFrame(
        rows,
        "op string, conv_id string, turn_idx int, lsn long, commit_ts string, "
        "src_file string, src_offset long, after string",
    )
    return df.withColumn("commit_ts", F.to_timestamp("commit_ts"))


def test_emit_ocf_chains_into_run_stream_ocf(spark, tmp_dir):
    """The binary container closes the same CDC loop the text encodings do:
    table A's snapshot-range changelog emitted as Avro OCF shards
    (emit_changes encoding="ocf"), consumed by a SECOND engine's
    run_stream_ocf, reproduces A's logical state exactly — chained engines
    without a shared lakehouse, over container files instead of lines."""
    from pyspark.sql import types as T

    from nvimagecodec_spark.lakehouse.incremental import emit_changes
    from nvimagecodec_spark.lakehouse.table import LakeTable
    from nvimagecodec_spark.operators.lww import lww_dedupe
    from nvimagecodec_spark.operators.merge import merge_into
    from nvimagecodec_spark.streaming.engine import CdcEngine

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    a = LakeTable.create(spark, os.path.join(tmp_dir, "a"), schema, ["conv_id", "turn_idx"], 4)
    s0 = a.current_snapshot().snapshot_id
    merge_into(a, lww_dedupe(_lake_events(spark, [
        ("I", "c1", 0, 1, "2025-01-01 00:00:00", "f", 0, '{"role":"user","text":"a"}'),
        ("I", "c1", 1, 2, "2025-01-01 00:00:01", "f", 1, '{"role":"assistant","text":"b"}'),
        ("I", "c2", 0, 3, "2025-01-01 00:00:02", "f", 2, '{"role":"user","text":"c"}'),
    ])))
    merge_into(a, lww_dedupe(_lake_events(spark, [
        ("U", "c1", 0, 10, "2025-01-01 01:00:00", "g", 0, '{"role":"user","text":"a2"}'),
        ("D", "c2", 0, 11, "2025-01-01 01:00:01", "g", 1, None),
        ("I", "c3", 0, 12, "2025-01-01 01:00:02", "g", 2, '{"role":"tool","text":"d"}'),
    ])))
    s2 = a.current_snapshot().snapshot_id

    out = os.path.join(tmp_dir, "emit-ocf")
    # read_changes is a SNAPSHOT DIFF over (s0, s2]: c2's insert+delete
    # nets out entirely and c1t0's I+U nets to one insert of the final
    # value — 3 net changes, all inserts
    n = emit_changes(a, s0, s2, out, encoding="ocf", files=3)
    assert n == 3
    shard_files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert 1 <= len(shard_files) <= 3
    # the emitted shards parse back through the container reader
    parsed = read_ocf(spark, out)
    assert parsed.where("dead_records > 0").count() == 0
    assert {(r.conv_id, r.op) for r in parsed.collect()} == {("c1", "I"), ("c3", "I")}
    assert parsed.where("conv_id = 'c1' and turn_idx = 0").collect()[0].lsn == 10

    # a second engine tails the emitted directory and converges to A
    b = LakeTable.create(spark, os.path.join(tmp_dir, "b"), schema, ["conv_id", "turn_idx"], 4)
    engine = CdcEngine(spark, b, source_id="ocf-chain")
    epochs = engine.run_stream_ocf(out, max_files_per_trigger=1)
    assert epochs >= 1
    cols = ["conv_id", "turn_idx", "role", "text"]
    a_rows = sorted(tuple(r) for r in a.read_logical().select(*cols).collect())
    b_rows = sorted(tuple(r) for r in b.read_logical().select(*cols).collect())
    assert a_rows == b_rows and len(a_rows) == 3
    # a re-emit with fewer shards must fully replace the directory
    n2 = emit_changes(a, s0, s2, out, encoding="ocf", files=1)
    assert n2 == 3
    assert len([f for f in os.listdir(out) if f.endswith(".avro")]) == 1


def test_run_stream_ocf_dead_letters_damaged_shard(spark, tmp_dir):
    """A corrupted container block dead-letters only its own records:
    intact shards apply, the damaged file surfaces one dead-letter row
    carrying its lost-record count through the standard sink + lineage."""
    from pyspark.sql import types as T

    from nvimagecodec_spark.config import EngineConfig
    from nvimagecodec_spark.lakehouse.table import LakeTable
    from nvimagecodec_spark.streaming.engine import CdcEngine

    src = os.path.join(tmp_dir, "shards")
    rows = [("I", i, 1_000_000 + i, f"c{i}", 0, '{"role":"user","text":"t"}') for i in range(20)]
    df = spark.createDataFrame(
        rows, "op string, lsn long, ts_us long, conv_id string, turn_idx int, payload string"
    )
    manifest = write_ocf(df, src, shards=4, codec="null")
    paths = {r.shard: r.path for r in manifest.collect()}
    victim = paths[min(paths)]
    blob = bytearray(open(victim, "rb").read())
    blob[2] ^= 0xFF  # corrupt the header: whole file dead, count unknown
    open(victim, "wb").write(bytes(blob))

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    t = LakeTable.create(spark, os.path.join(tmp_dir, "t"), schema, ["conv_id", "turn_idx"], 4)
    dl_dir = os.path.join(tmp_dir, "dead")
    engine = CdcEngine(
        spark, t, source_id="ocf-dmg",
        config=EngineConfig(dead_letter_dir=dl_dir, expire_every_epochs=0),
    )
    engine.run_stream_ocf(src, max_files_per_trigger=4)

    got = {r.conv_id for r in t.read_logical().select("conv_id").collect()}
    victim_keys = {r.conv_id for r in df.collect()} - got
    assert got and victim_keys, "some rows applied, some lost to the damaged shard"
    total_dead = sum(r.get("dead_letters", 0) for r in engine.lineage())
    assert total_dead >= 1
    dead = spark.read.parquet(dl_dir)
    dmg = dead.where(F.col("raw_value").startswith("ocf-damage:")).collect()
    assert len(dmg) == 1
    # header damage -> the container reader can't even count the lost
    # records; -1 is the documented whole-file-dead sentinel (the
    # per-block partial-damage counts are pinned by the unit tests)
    assert dmg[0].raw_value.endswith("dead_records=-1")
    assert dmg[0].src_file == "file:" + victim


# ----------------------------------------------- single-file block splits


def _mk_recs(n, mod=97):
    return [
        (
            "U" if i % 3 else "I",
            i,
            1_000_000 + i,
            f"conv-{i % mod}",
            i % 5,
            f'{{"v":{i}}}' if i % 7 else None,
        )
        for i in range(n)
    ]


def _scan_all(path, split_bytes):
    from nvimagecodec_spark.sources.avro_ocf import _scan_ocf_split, plan_ocf_splits

    rows, dead = [], 0
    splits = plan_ocf_splits(path, split_bytes)
    for (p, s, e, fl, c, sy) in splits:
        r, d = _scan_ocf_split(p, s, e, fl, c, sy)
        rows.extend(r)
        dead += d
    return rows, dead, len(splits)


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_split_scan_equals_whole_file_at_any_split_size(tmp_dir, codec):
    """Block ownership partitions exactly: for every split granularity the
    union of per-range scans is the whole-file decode, no dupes/drops."""
    recs = _mk_recs(5000)
    blob = encode_ocf(recs, codec=codec, block_records=50)  # 100 blocks
    path = os.path.join(tmp_dir, "big.avro")
    with open(path, "wb") as f:
        f.write(blob)
    whole, dead0 = decode_ocf(blob)
    assert dead0 == 0
    for sb in (1, 100, 1000, 7777, 64 << 10, len(blob) * 2):
        rows, dead, n_splits = _scan_all(path, sb)
        assert sorted(rows) == sorted(whole), (codec, sb)
        assert dead == 0
    assert _scan_all(path, len(blob) * 2)[2] == 1  # degenerate: one split


@given(st.integers(min_value=1, max_value=200_000))
@settings(max_examples=25, deadline=None)
def test_split_boundary_fuzz(split_bytes):
    """Random split granularities never duplicate or drop a row."""
    import tempfile

    recs = _mk_recs(1200)
    blob = encode_ocf(recs, codec="deflate", block_records=37)
    d = tempfile.mkdtemp(prefix="ocf-fuzz-")
    path = os.path.join(d, "f.avro")
    with open(path, "wb") as f:
        f.write(blob)
    whole, _ = decode_ocf(blob)
    rows, dead, _ = _scan_all(path, split_bytes)
    assert sorted(rows) == sorted(whole)
    assert dead == 0


def test_split_scan_resyncs_past_lying_size_field(tmp_dir):
    """The whole-file reader must STOP at a lying size field (no resync);
    the split scanner recovers every later block via sync-marker rescan —
    strictly stronger damage containment."""
    recs = _mk_recs(5000)
    blob = bytearray(encode_ocf(recs, codec="null", block_records=50))
    sync = sync_marker(0)
    occ, i = [], 0
    while True:
        j = bytes(blob).find(sync, i)
        if j < 0:
            break
        occ.append(j)
        i = j + 1
    # corrupt block 41's SIZE varint (bytes right after its preceding sync)
    p = occ[40] + 16
    blob[p : p + 2] = b"\xff\xff"
    path = os.path.join(tmp_dir, "dmg.avro")
    with open(path, "wb") as f:
        f.write(bytes(blob))
    whole, dead_whole = decode_ocf(bytes(blob))
    assert len(whole) == 40 * 50  # whole-file reader loses everything after
    rows, dead, _ = _scan_all(path, 4096)
    assert len(rows) == 99 * 50  # split scanner loses ONLY the damaged block
    assert dead >= 1


def test_split_scan_body_corruption_costs_one_block(tmp_dir):
    recs = _mk_recs(5000)
    blob = bytearray(encode_ocf(recs, codec="null", block_records=50))
    sync = sync_marker(0)
    occ, i = [], 0
    while True:
        j = bytes(blob).find(sync, i)
        if j < 0:
            break
        occ.append(j)
        i = j + 1
    mid = occ[40] + 16 + 6  # inside block 41's body
    blob[mid : mid + 8] = b"\xff" * 8
    path = os.path.join(tmp_dir, "dmg2.avro")
    with open(path, "wb") as f:
        f.write(bytes(blob))
    rows, dead, _ = _scan_all(path, 4096)
    assert len(rows) == 99 * 50
    assert dead == 50


def test_plan_ocf_splits_dead_header_file(tmp_dir):
    path = os.path.join(tmp_dir, "bad.avro")
    with open(path, "wb") as f:
        f.write(b"NOTAVRO" + b"\x00" * 100)
    from nvimagecodec_spark.sources.avro_ocf import plan_ocf_splits

    splits = plan_ocf_splits(path, 1024)
    assert len(splits) == 1 and splits[0][1] == -1


def test_read_ocf_split_spark_end_to_end(spark, tmp_dir):
    """One big container file read with block-level parallelism: result
    and column contract identical to the per-file reader."""
    from nvimagecodec_spark.sources.avro_ocf import read_ocf_split

    recs = _mk_recs(4000)
    blob = encode_ocf(recs, codec="deflate", block_records=64)
    path = os.path.join(tmp_dir, "one-big.avro")
    with open(path, "wb") as f:
        f.write(blob)
    split_df = read_ocf_split(spark, tmp_dir, split_bytes=2048)
    whole_df = read_ocf(spark, tmp_dir)
    a = sorted(
        split_df.where(F.col("op").isNotNull())
        .select("op", "lsn", "ts_us", "conv_id", "turn_idx", "payload")
        .collect()
    )
    b = sorted(
        whole_df.where(F.col("op").isNotNull())
        .select("op", "lsn", "ts_us", "conv_id", "turn_idx", "payload")
        .collect()
    )
    assert a == b and len(a) == 4000
    # ensure the split path actually fanned out (many ranges over one file)
    from nvimagecodec_spark.sources.avro_ocf import plan_ocf_splits

    assert len(plan_ocf_splits(tmp_dir, 2048)) > 10


def test_read_ocf_split_file_uri_scheme(spark, tmp_dir):
    """pyarrow.fs routes scheme'd URIs (the cluster path: s3://, hdfs://);
    file:// exercises the from_uri branch end-to-end."""
    from nvimagecodec_spark.sources.avro_ocf import read_ocf_split

    recs = _mk_recs(500)
    blob = encode_ocf(recs, codec="null", block_records=25)
    path = os.path.join(tmp_dir, "uri.avro")
    with open(path, "wb") as f:
        f.write(blob)
    df = read_ocf_split(spark, "file://" + path, split_bytes=1024)
    assert df.where(F.col("op").isNotNull()).count() == 500


def test_read_ocf_split_dead_file_marker(spark, tmp_dir):
    from nvimagecodec_spark.sources.avro_ocf import read_ocf_split

    with open(os.path.join(tmp_dir, "bad.avro"), "wb") as f:
        f.write(b"Obj\x01garbage-metadata")
    good = encode_ocf(_mk_recs(100), codec="null", block_records=10)
    with open(os.path.join(tmp_dir, "good.avro"), "wb") as f:
        f.write(good)
    df = read_ocf_split(spark, tmp_dir, split_bytes=1024)
    dead = df.where(F.col("op").isNull()).collect()
    assert len(dead) == 1 and dead[0]["dead_records"] == -1
    assert df.where(F.col("op").isNotNull()).count() == 100


def test_plan_ocf_splits_header_with_large_metadata(tmp_dir):
    """A spec-conforming file may carry arbitrary app metadata; a header
    larger than the initial 64KB probe must NOT be declared dead when the
    probe boundary cuts a metadata value (review-caught: the grow loop
    keyed on 'truncated' error text, which a mid-value cut never says)."""
    from nvimagecodec_spark.sources.avro_ocf import (
        _enc_map,
        plan_ocf_splits,
        read_ocf_split,
        sync_marker,
    )

    recs = _mk_recs(200)
    body = encode_ocf(recs, codec="null", block_records=50)
    # rebuild with a ~100KB metadata map (probe is 64KB)
    meta = {
        "avro.schema": SCHEMA_JSON.encode(),
        "avro.codec": b"null",
        "app.blob": b"\xab" * (100 << 10),
    }
    sync = sync_marker(0)
    hdr_end = body.find(sync) + 16  # original header end
    rebuilt = OCF_MAGIC + _enc_map(meta) + sync + body[hdr_end:]
    path = os.path.join(tmp_dir, "bigmeta.avro")
    with open(path, "wb") as f:
        f.write(rebuilt)
    splits = plan_ocf_splits(path, 4096)
    assert splits and splits[0][1] != -1, "dead-filed a valid header"
    rows, dead, _ = _scan_all(path, 4096)
    assert len(rows) == 200 and dead == 0
