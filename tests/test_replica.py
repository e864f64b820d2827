"""Lake-to-lake replication: after any sequence of source epochs and
syncs — including schema evolution between them — the replica's logical
state equals the source's, and syncs are exactly-once (replay = no-op).
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.replica import TableReplica
from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch(spark, rows, lsn0):
    data = [
        (c, t, op, lsn0 + i, json.dumps(payload) if op != "D" else None)
        for i, (c, t, op, payload) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, op string, lsn long, after string"
    ).withColumns(
        {
            "commit_ts": F.lit("2026-01-01 00:00:00").cast("timestamp"),
            "src_file": F.lit("test"),
            "src_offset": F.col("lsn"),
        }
    )
    return lww_dedupe(df)


def _state(table):
    cols = sorted(c for c in table.read_logical().columns)
    rows = table.read_logical().select(*cols).collect()
    return cols, sorted(
        (tuple(str(r[c]) for c in cols) for r in rows),
    )


@pytest.fixture()
def src(spark, tmp_dir):
    return LakeTable.create(
        spark,
        os.path.join(tmp_dir, "src"),
        SCHEMA,
        ["conv_id", "turn_idx"],
        bucket_count=8,
    )


def test_replica_tracks_source_through_epochs(spark, src, tmp_dir):
    merge_into(
        src,
        _batch(
            spark,
            [
                ("a", 0, "I", {"role": "user", "text": "hello"}),
                ("a", 1, "I", {"role": "assistant", "text": "hi"}),
                ("b", 0, "I", {"role": "user", "text": "solo"}),
                (None, 0, "I", {"role": "user", "text": "nullkey"}),
            ],
            100,
        ),
    )
    rep = TableReplica.create(spark, os.path.join(tmp_dir, "rep"), src)
    rep.sync(src)
    assert _state(rep.table) == _state(src)

    merge_into(
        src,
        _batch(
            spark,
            [
                ("a", 1, "U", {"role": "assistant", "text": "hi EDITED"}),
                ("b", 0, "D", None),
                ("c", 0, "I", {"role": "user", "text": "new"}),
            ],
            200,
        ),
    )
    res = rep.sync(src)
    assert res.strategy != "noop"
    assert _state(rep.table) == _state(src)
    # replay is a tagged no-op
    assert rep.sync(src).strategy in ("noop", "skipped-duplicate")


def test_replica_smaller_bucket_count(spark, src, tmp_dir):
    merge_into(
        src,
        _batch(spark, [(f"k{i}", 0, "I", {"role": "u", "text": str(i)}) for i in range(50)], 10),
    )
    rep = TableReplica.create(spark, os.path.join(tmp_dir, "rep"), src, bucket_count=2)
    rep.sync(src)
    assert _state(rep.table) == _state(src)


def test_replica_propagates_schema_evolution(spark, src, tmp_dir):
    merge_into(
        src, _batch(spark, [("a", 0, "I", {"role": "user", "text": "v1"})], 100)
    )
    rep = TableReplica.create(spark, os.path.join(tmp_dir, "rep"), src)
    rep.sync(src)

    # add + widen + rename + drop on the SOURCE between syncs
    src.add_column("rating", "int")
    merge_into(
        src,
        _batch(spark, [("a", 1, "I", {"role": "user", "text": "v2", "rating": 5})], 200),
    )
    rep.sync(src)
    assert _state(rep.table) == _state(src)

    src.widen_column("rating", "bigint")
    src.rename_column("text", "body")
    merge_into(
        src,
        _batch(
            spark,
            [("a", 2, "I", {"role": "user", "body": "v3", "rating": 2**40})],
            300,
        ),
    )
    rep.sync(src)
    assert _state(rep.table) == _state(src)
    assert "body" in rep.table.read_logical().columns
    assert "text" not in rep.table.read_logical().columns

    src.drop_column("rating")
    merge_into(
        src, _batch(spark, [("a", 3, "I", {"role": "user", "body": "v4"})], 400)
    )
    rep.sync(src)
    assert _state(rep.table) == _state(src)
    assert "rating" not in rep.table.read_logical().columns


def test_replica_bootstrap_after_source_create_expired(spark, src, tmp_dir):
    merge_into(
        src, _batch(spark, [("a", 0, "I", {"role": "user", "text": "x"})], 100)
    )
    merge_into(
        src, _batch(spark, [("a", 0, "D", None), ("b", 0, "I", {"role": "u", "text": "y"})], 200)
    )
    src.expire_snapshots(keep_last=1)
    rep = TableReplica.create(spark, os.path.join(tmp_dir, "rep"), src)
    rep.sync(src)
    assert _state(rep.table) == _state(src)


def test_replica_registers_in_txn_catalog(spark, src, tmp_dir):
    from nvimagecodec_spark.lakehouse.txn import TxnCatalog

    merge_into(
        src, _batch(spark, [("a", 0, "I", {"role": "user", "text": "seed"})], 100)
    )
    cat = TxnCatalog.create(spark, os.path.join(tmp_dir, "cat"), {"t": src})
    rep = TableReplica.create(spark, os.path.join(tmp_dir, "rep"), src)
    cat.register_view("mirror", rep, "t")

    txn = cat.begin("tx", 1)
    txn.merge("t", _batch(spark, [("b", 0, "I", {"role": "u", "text": "in-txn"})], 200))
    txn.commit()
    # catalog read of the mirror is consistent with the base
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in cat.read("mirror").collect()}
    want = {(r["conv_id"], r["turn_idx"]): r["text"] for r in cat.read("t").collect()}
    assert got == want and ("b", 0) in got


def test_projected_replica_tracks_subset(spark, src, tmp_dir):
    """Column-subset replica (PII-strip pattern): only tracked columns
    exist downstream; untracked source adds are ignored, tracked renames
    still propagate."""
    merge_into(
        src,
        _batch(
            spark,
            [
                ("a", 0, "I", {"role": "user", "text": "SECRET"}),
                ("b", 0, "I", {"role": "assistant", "text": "ALSO SECRET"}),
            ],
            100,
        ),
    )
    rep = TableReplica.create(
        spark, os.path.join(tmp_dir, "rep"), src, columns=["role"]
    )
    rep.sync(src)
    cols = set(rep.table.read_logical().columns)
    assert cols == {"conv_id", "turn_idx", "role"}
    got = {(r["conv_id"], r["turn_idx"]): r["role"] for r in rep.table.read_logical().collect()}
    assert got == {("a", 0): "user", ("b", 0): "assistant"}

    # untracked source add is ignored; tracked rename propagates
    src.add_column("rating", "int")
    src.rename_column("role", "speaker")
    merge_into(
        src, _batch(spark, [("c", 0, "I", {"speaker": "tool", "text": "x", "rating": 1})], 200)
    )
    rep.sync(src)
    cols = set(rep.table.read_logical().columns)
    assert cols == {"conv_id", "turn_idx", "speaker"}
    assert {r["speaker"] for r in rep.table.read_logical().collect()} == {
        "user", "assistant", "tool"
    }


def test_predicated_replica_enter_leave_semantics(spark, src, tmp_dir):
    """Row-filter replica: enter → insert, leave → delete, never-matched →
    nothing (no tombstone shadow)."""
    merge_into(
        src,
        _batch(
            spark,
            [
                ("in", 0, "I", {"role": "user", "text": "keep"}),
                ("out", 0, "I", {"role": "system", "text": "drop"}),
                ("mover", 0, "I", {"role": "system", "text": "later"}),
            ],
            100,
        ),
    )
    rep = TableReplica.create(
        spark, os.path.join(tmp_dir, "rep"), src, row_filter="role <> 'system'"
    )
    rep.sync(src)
    keys = {(r["conv_id"], r["turn_idx"]) for r in rep.table.read_logical().collect()}
    assert keys == {("in", 0)}
    # never-matching rows left NO tombstones in the replica
    with_sys = rep.table.read(with_system=True).count()
    assert with_sys == 1

    merge_into(
        src,
        _batch(
            spark,
            [
                ("mover", 0, "U", {"role": "user", "text": "entered"}),  # enters
                ("in", 0, "U", {"role": "system", "text": "left"}),  # leaves
                ("out", 0, "U", {"role": "system", "text": "still out"}),  # never in
            ],
            200,
        ),
    )
    rep.sync(src)
    rows = {(r["conv_id"], r["turn_idx"]): r["text"] for r in rep.table.read_logical().collect()}
    assert rows == {("mover", 0): "entered"}
    # "in" left the slice via a real delete; "out" still has no footprint
    sys_rows = {
        (r["conv_id"], r["turn_idx"])
        for r in rep.table.read(with_system=True).collect()
    }
    assert ("out", 0) not in sys_rows and ("in", 0) in sys_rows

    # source-side hard delete of a matching row propagates
    merge_into(src, _batch(spark, [("mover", 0, "D", None)], 300))
    rep.sync(src)
    assert rep.table.read_logical().count() == 0


def test_predicated_replica_bootstrap_filters(spark, src, tmp_dir):
    merge_into(
        src,
        _batch(
            spark,
            [
                ("a", 0, "I", {"role": "user", "text": "x"}),
                ("b", 0, "I", {"role": "system", "text": "y"}),
            ],
            100,
        ),
    )
    merge_into(src, _batch(spark, [("c", 0, "I", {"role": "user", "text": "z"})], 200))
    src.expire_snapshots(keep_last=1)  # force full-state bootstrap
    rep = TableReplica.create(
        spark, os.path.join(tmp_dir, "rep"), src, row_filter="role = 'user'"
    )
    rep.sync(src)
    keys = {r["conv_id"] for r in rep.table.read_logical().collect()}
    assert keys == {"a", "c"}


def test_substitute_before_whole_word_only():
    """The before-image rewrite must not mangle prefixes, quoted strings
    of unrelated identifiers, or longer column names sharing a prefix."""
    sub = TableReplica._substitute_before
    assert sub("text <> 'x'", ["text"]) == "__b_text <> 'x'"
    # longer name wins first; prefix column untouched inside it
    assert (
        sub("text_long = text", ["text", "text_long"])
        == "__b_text_long = __b_text"
    )
    # key columns are not rewritten (not in payload)
    assert sub("conv_id = 'a' AND role = 'u'", ["role"]) == (
        "conv_id = 'a' AND __b_role = 'u'"
    )
    # function names that merely contain a column name stay intact
    assert sub("length(text) > 3", ["text"]) == "length(__b_text) > 3"


def test_substitute_before_masks_string_literals():
    """A literal that collides with a payload column name ('text' below)
    is an ordinary ANSI filter and must survive the before-image rewrite
    untouched — only references OUTSIDE single-quoted literals move."""
    sub = TableReplica._substitute_before
    assert (
        sub("category = 'text'", ["category", "text"])
        == "__b_category = 'text'"
    )
    # escaped quotes ('') stay inside one literal
    assert (
        sub("text = 'it''s text' AND role = 'role'", ["text", "role"])
        == "__b_text = 'it''s text' AND __b_role = 'role'"
    )
    # multiple literals interleaved with real references
    assert (
        sub("text IN ('text', 'role') OR role = text", ["text", "role"])
        == "__b_text IN ('text', 'role') OR __b_role = __b_text"
    )


def test_predicated_replica_literal_collides_with_column(spark, src, tmp_dir):
    """End-to-end: filter literal equals a payload column name; enter /
    leave verdicts must still be computed against the before-image."""
    merge_into(
        src,
        _batch(
            spark,
            [
                ("in", 0, "I", {"role": "text", "text": "match"}),
                ("out", 0, "I", {"role": "other", "text": "no"}),
            ],
            100,
        ),
    )
    rep = TableReplica.create(
        spark, os.path.join(tmp_dir, "rep"), src, row_filter="role = 'text'"
    )
    rep.sync(src)
    assert {r["conv_id"] for r in rep.table.read_logical().collect()} == {"in"}
    # "in" leaves the slice; "out" enters — both verdicts need the
    # literal preserved on the before side
    merge_into(
        src,
        _batch(
            spark,
            [
                ("in", 0, "U", {"role": "other", "text": "left"}),
                ("out", 0, "U", {"role": "text", "text": "entered"}),
            ],
            200,
        ),
    )
    rep.sync(src)
    rows = {(r["conv_id"]): r["text"] for r in rep.table.read_logical().collect()}
    assert rows == {"out": "entered"}
    sys_keys = {r["conv_id"] for r in rep.table.read(with_system=True).collect()}
    assert "in" in sys_keys  # left via a real delete


def test_replica_row_filter_validated_at_create(spark, src, tmp_dir):
    """A filter referencing an untracked / unknown column is rejected at
    create() instead of silently evaluating befores against afters."""
    with pytest.raises(ValueError, match="row_filter"):
        TableReplica.create(
            spark,
            os.path.join(tmp_dir, "rep_bad"),
            src,
            row_filter="no_such_col = 1",
        )
    # projected replica: filter over a real source column that is NOT
    # tracked is equally invalid
    with pytest.raises(ValueError, match="row_filter"):
        TableReplica.create(
            spark,
            os.path.join(tmp_dir, "rep_bad2"),
            src,
            columns=["role"],
            row_filter="text = 'x'",
        )
    # tracked column: fine
    TableReplica.create(
        spark,
        os.path.join(tmp_dir, "rep_ok"),
        src,
        columns=["role"],
        row_filter="role = 'user'",
    )


def test_replica_row_filter_survives_source_rename(spark, src, tmp_dir):
    """When the source renames a column the stored row_filter references,
    the filter is rewritten and persisted — future syncs keep working."""
    merge_into(
        src,
        _batch(
            spark,
            [
                ("a", 0, "I", {"role": "user", "text": "x"}),
                ("b", 0, "I", {"role": "system", "text": "y"}),
            ],
            100,
        ),
    )
    rep = TableReplica.create(
        spark, os.path.join(tmp_dir, "rep"), src, row_filter="role = 'user'"
    )
    rep.sync(src)
    assert {r["conv_id"] for r in rep.table.read_logical().collect()} == {"a"}

    src.rename_column("role", "speaker")
    merge_into(
        src,
        _batch(
            spark,
            [
                ("b", 0, "U", {"speaker": "user", "text": "entered"}),
                ("a", 0, "U", {"speaker": "system", "text": "left"}),
            ],
            200,
        ),
    )
    rep.sync(src)
    assert {r["conv_id"] for r in rep.table.read_logical().collect()} == {"b"}
    # the rewrite persisted: a FRESH handle sees the new filter and syncs
    rep2 = TableReplica(spark, rep.table.path)
    assert rep2.row_filter == "speaker = 'user'"
    merge_into(
        src, _batch(spark, [("c", 0, "I", {"speaker": "user", "text": "z"})], 300)
    )
    rep2.sync(src)
    assert {r["conv_id"] for r in rep2.table.read_logical().collect()} == {"b", "c"}
