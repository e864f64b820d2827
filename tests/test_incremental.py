"""Snapshot-diff changelog reads (lakehouse/incremental.py): the table's
own change stream, bucket-pruned by manifest diff."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.incremental import changed_buckets, read_changes
from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _events(spark, rows):
    df = spark.createDataFrame(
        rows,
        "op string, conv_id string, turn_idx int, lsn long, commit_ts string, "
        "src_file string, src_offset long, after string",
    )
    return df.withColumn("commit_ts", F.to_timestamp("commit_ts"))


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 8)
    merge_into(
        t,
        lww_dedupe(
            _events(
                spark,
                [
                    ("I", "c1", 0, 1, "2025-01-01 00:00:00", "f", 0, '{"text":"a"}'),
                    ("I", "c1", 1, 2, "2025-01-01 00:00:01", "f", 1, '{"text":"b"}'),
                    ("I", "c2", 0, 3, "2025-01-01 00:00:02", "f", 2, '{"text":"c"}'),
                ],
            )
        ),
    )
    return t


def test_read_changes_classifies_iud(spark, table):
    snap1 = table.current_snapshot().snapshot_id
    merge_into(
        table,
        lww_dedupe(
            _events(
                spark,
                [
                    ("U", "c1", 0, 10, "2025-01-01 01:00:00", "g", 0, '{"text":"a2"}'),
                    ("D", "c1", 1, 11, "2025-01-01 01:00:01", "g", 1, None),
                    ("I", "c3", 0, 12, "2025-01-01 01:00:02", "g", 2, '{"text":"d"}'),
                ],
            )
        ),
    )
    snap2 = table.current_snapshot().snapshot_id
    changes = {
        (r["conv_id"], r["turn_idx"]): r
        for r in read_changes(table, snap1, snap2).collect()
    }
    assert changes[("c1", 0)]["op"] == "U" and changes[("c1", 0)]["text"] == "a2"
    assert changes[("c1", 1)]["op"] == "D"
    assert changes[("c3", 0)]["op"] == "I" and changes[("c3", 0)]["text"] == "d"
    assert ("c2", 0) not in changes  # untouched key never emitted
    assert changes[("c1", 0)]["lsn"] == 10


def test_changed_buckets_is_manifest_only(spark, table):
    snap1 = table.current_snapshot().snapshot_id
    merge_into(
        table,
        lww_dedupe(
            _events(
                spark,
                [("U", "c2", 0, 20, "2025-01-01 02:00:00", "h", 0, '{"text":"c2v2"}')],
            )
        ),
    )
    snap2 = table.current_snapshot().snapshot_id
    bs = changed_buckets(table, snap1, snap2)
    # exactly the buckets of the touched key's commit — a strict subset
    assert 0 < len(bs) < table.bucket_count
    ch = read_changes(table, snap1, snap2).collect()
    assert len(ch) == 1 and ch[0]["op"] == "U"


def test_same_snapshot_yields_no_changes(spark, table):
    s = table.current_snapshot().snapshot_id
    assert read_changes(table, s, s).count() == 0


def test_changelog_feeds_windowed_metrics(spark, table):
    """Wired pipeline (ROADMAP #7): table -> snapshot-diff changelog ->
    event-time windowed op metrics, batch formulation (a streaming
    consumer would add a watermark; see streaming/windows.py)."""
    snap1 = table.current_snapshot().snapshot_id
    merge_into(
        table,
        lww_dedupe(
            _events(
                spark,
                [
                    ("U", "c1", 0, 30, "2025-01-01 00:01:00", "g", 0, '{"text":"a2"}'),
                    ("D", "c1", 1, 31, "2025-01-01 00:02:00", "g", 1, None),
                    ("I", "c4", 0, 32, "2025-01-01 00:07:00", "g", 2, '{"text":"z"}'),
                ],
            )
        ),
    )
    snap2 = table.current_snapshot().snapshot_id
    ch = read_changes(table, snap1, snap2)
    rates = (
        ch.groupBy(F.window("commit_ts", "5 minutes").alias("w"), "op")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "op", "n_events")
    )
    got = {(str(r["window_start"]), r["op"]): r["n_events"] for r in rates.collect()}
    assert got[("2025-01-01 00:00:00", "U")] == 1
    assert got[("2025-01-01 00:00:00", "D")] == 1
    assert got[("2025-01-01 00:05:00", "I")] == 1


def test_read_changes_across_schema_evolution(spark, table):
    """A from..to range spanning add + rename schema events must read both
    sides under the TO schema: old-side rows null-fill the added column
    and surface the renamed one under its new name (Iceberg/Delta CDC
    semantics). Round-1 behavior was an AnalysisException."""
    snap1 = table.current_snapshot().snapshot_id
    table.add_column("rating", "int")
    table.rename_column("text", "body")
    merge_into(
        table,
        lww_dedupe(
            _events(
                spark,
                [
                    ("U", "c1", 0, 40, "2025-01-01 03:00:00", "k", 0,
                     '{"body":"a3","rating":5}'),
                    ("I", "c5", 0, 41, "2025-01-01 03:00:01", "k", 1,
                     '{"body":"new","rating":7}'),
                ],
            )
        ),
    )
    snap2 = table.current_snapshot().snapshot_id
    changes = {
        (r["conv_id"], r["turn_idx"]): r
        for r in read_changes(table, snap1, snap2).collect()
    }
    assert changes[("c1", 0)]["op"] == "U"
    assert changes[("c1", 0)]["body"] == "a3" and changes[("c1", 0)]["rating"] == 5
    assert changes[("c5", 0)]["op"] == "I" and changes[("c5", 0)]["rating"] == 7
    # pre-evolution keys untouched by the merge are never emitted
    assert ("c2", 0) not in changes


def test_expire_commits_metadata_before_deleting_files(spark, table, monkeypatch):
    """expire_snapshots must commit the pruned metadata BEFORE deleting
    data files: a crash (or exception) during deletion must never leave
    retained snapshots pointing at removed files."""
    import os as _os

    for i in range(4):
        merge_into(
            table,
            lww_dedupe(
                _events(
                    spark,
                    [("U", "c1", 0, 100 + i, "2025-01-02 00:00:00", "x", i,
                      f'{{"text":"v{i}"}}')],
                )
            ),
        )
    calls = {"n": 0}
    orig_remove = _os.remove

    def crashing_remove(p):
        calls["n"] += 1
        if calls["n"] == 1:
            orig_remove(p)
            raise RuntimeError("simulated crash mid-deletion")
        return orig_remove(p)

    monkeypatch.setattr(
        "nvimagecodec_spark.lakehouse.table.os.remove", crashing_remove
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        table.expire_snapshots(keep_last=2)
    # metadata already pruned and every RETAINED snapshot fully readable
    table.refresh()
    assert len(table.meta["snapshots"]) == 2
    for s in table.history():
        for f in s.files:
            assert _os.path.exists(f["path"]), "retained snapshot lost a file"
    assert table.read_logical().count() == 3


def test_emit_changes_round_trips_through_the_probe_chain(spark, tmp_dir):
    """emit_changes closes the wire loop: a snapshot-range changelog
    emitted in EVERY registered text wire format (jsonl, binary-v1,
    tsv, avro) parses back through the format registry with identical
    change semantics — one engine's output is a valid source for another
    without sharing a lakehouse."""
    import os

    from datetime import datetime

    from pyspark.sql import types as T

    from nvimagecodec_spark.lakehouse.incremental import emit_changes
    from nvimagecodec_spark.lakehouse.table import LakeTable
    from nvimagecodec_spark.operators.lww import lww_dedupe
    from nvimagecodec_spark.operators.merge import merge_into
    from nvimagecodec_spark.sources.changelog import ChangeStream

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
    t = LakeTable.create(spark, os.path.join(tmp_dir, "t"), schema, ["conv_id", "turn_idx"], 4)
    ts = datetime(2025, 1, 1)
    ev = (
        "op string, lsn long, commit_ts timestamp, conv_id string, "
        "turn_idx int, after string, src_file string, src_offset long"
    )
    merge_into(t, lww_dedupe(spark.createDataFrame(
        [("I", i, ts, f"c{i}", 0, '{"text":"v"}', "f", i) for i in range(10)], ev)))
    s0 = t.current_snapshot().snapshot_id
    merge_into(t, lww_dedupe(spark.createDataFrame(
        [("U", 100, ts, "c1", 0, '{"text":"v2"}', "f", 0),
         ("D", 101, ts, "c2", 0, None, "f", 1),
         ("I", 102, ts, "c99", 0, '{"text":"new"}', "f", 2)], ev)))
    s1 = t.current_snapshot().snapshot_id

    expected = {("c1", "U"), ("c2", "D"), ("c99", "I")}
    fmt_name = {"jsonl": "jsonlines", "binary-v1": "binary-v1",
                "tsv": "tsv", "avro": "avro-sobj"}
    for enc in ("jsonl", "binary-v1", "tsv", "avro"):
        out_dir = os.path.join(tmp_dir, f"emit-{enc}")
        n = emit_changes(t, s0, s1, out_dir, encoding=enc, files=2)
        assert n == 3
        parsed = ChangeStream(spark, out_dir).events().collect()
        assert {(r.conv_id, r.op) for r in parsed} == expected
        fmt = {r.src_format for r in parsed}
        assert fmt == {fmt_name[enc]}
        upd = next(r for r in parsed if r.conv_id == "c1")
        assert '"text":"v2"' in upd.after and upd.lsn == 100


def test_changed_buckets_never_parses_manifests_on_v2(spark, table, monkeypatch):
    """The fast path diffs content-addressed manifest NAMES across the two
    manifest-lists; per-bucket manifests must never be parsed (that would
    re-materialize both snapshots on the driver per view sync — the cost
    the lazy tier removes). Also pins name-diff == file-set-diff."""
    from nvimagecodec_spark.lakehouse.table import _LazyFiles

    snap1 = table.current_snapshot().snapshot_id
    merge_into(
        table,
        lww_dedupe(
            _events(
                spark,
                [("U", "c1", 0, 30, "2025-01-01 03:00:00", "i", 0, '{"text":"x"}')],
            )
        ),
    )
    snap2 = table.current_snapshot().snapshot_id
    assert isinstance(table.snapshot(snap1).files, _LazyFiles)

    # ground truth from the slow file-set diff
    def slow(a, b):
        oa: dict[int, set] = {}
        ob: dict[int, set] = {}
        for f in list(table.snapshot(a).files):
            oa.setdefault(f["bucket"], set()).add(f["path"])
        for f in list(table.snapshot(b).files):
            ob.setdefault(f["bucket"], set()).add(f["path"])
        return sorted(
            k for k in set(oa) | set(ob) if oa.get(k, set()) != ob.get(k, set())
        )

    expected = slow(snap1, snap2)

    def boom(self, entry):
        raise AssertionError("changed_buckets parsed a per-bucket manifest")

    monkeypatch.setattr(_LazyFiles, "_bucket_files", boom)
    got = changed_buckets(table, snap1, snap2)
    assert got == expected and got
