"""Null-key, null-lsn, and order-tie-break correctness (round-3 review
findings): the merge strategies and the snapshot-diff changelog must
treat null key values, null LSNs, and tie-broken LWW winners exactly
like ordinary rows."""

from datetime import datetime

import pytest
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.incremental import read_changes
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
_EV = (
    "op string, lsn long, commit_ts timestamp, conv_id string, "
    "turn_idx int, after string, src_file string, src_offset long"
)
_TS = datetime(2025, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [(op, lsn, _TS, c, t, a, sf, so) for (op, lsn, c, t, a, sf, so) in rows],
        _EV,
    )


def test_null_key_rows_update_not_duplicate(spark, tmp_path):
    """A null key part is one key value like any other: the broadcast
    strategy's join-matched marker and semi/anti joins must be null-safe,
    or the second merge duplicates the row instead of updating it."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 2)
    merge_into(t, lww_dedupe(_events(spark, [
        ("I", 1, None, 0, '{"text":"v1"}', "f", 1),
        ("I", 2, "ck", None, '{"text":"k1"}', "f", 2),
        ("I", 3, "other", 5, '{"text":"o"}', "f", 3),
    ])))
    res = merge_into(t, lww_dedupe(_events(spark, [
        ("U", 10, None, 0, '{"text":"v2"}', "f", 4),
        ("U", 11, "ck", None, '{"text":"k2"}', "f", 5),
    ])))
    assert res.strategy == "broadcast"
    rows = t.read_logical().collect()
    assert len(rows) == 3, rows  # no duplicates
    by_key = {(r["conv_id"], r["turn_idx"]): r["text"] for r in rows}
    assert by_key[(None, 0)] == "v2"
    assert by_key[("ck", None)] == "k2"
    # delete of a null-key row suppresses it
    merge_into(t, lww_dedupe(_events(spark, [("D", 20, None, 0, None, "f", 6)])))
    assert t.read_logical().count() == 2


def test_read_changes_sees_null_lsn_rows(spark, tmp_path):
    """CHANGE_SCHEMA permits null lsn; presence in the changelog must come
    from row existence, not lsn non-nullness."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 2)
    base = t.current_snapshot().snapshot_id
    merge_into(t, lww_dedupe(_events(spark, [
        (("I"), None, "nolsn", 0, '{"text":"x"}', "f", 1),
        (("I"), 5, "haslsn", 0, '{"text":"y"}', "f", 2),
    ])))
    s1 = t.current_snapshot().snapshot_id
    ch = {r["conv_id"]: r for r in read_changes(t, base, s1).collect()}
    assert set(ch) == {"nolsn", "haslsn"}
    assert ch["nolsn"]["op"] == "I" and ch["nolsn"]["lsn"] is None
    # and its delete is visible too
    merge_into(t, lww_dedupe(_events(spark, [("D", 9, "nolsn", 0, None, "f", 3)])))
    s2 = t.current_snapshot().snapshot_id
    ch2 = {r["conv_id"]: r["op"] for r in read_changes(t, s1, s2).collect()}
    assert ch2 == {"nolsn": "D"}


def test_read_changes_null_key_rows(spark, tmp_path):
    """Null key parts must pair across the snapshot-diff join (advisor-
    caught: a name-list full_outer join is null-UNSAFE, so an unchanged
    null-key row in a touched bucket emitted a spurious D+I pair and an
    updated one emitted D+I instead of U)."""
    # bucket_count=1: every key shares the one bucket, so touching ANY row
    # puts the null-key rows inside the diffed bucket set
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 1)
    merge_into(t, lww_dedupe(_events(spark, [
        ("I", 1, None, 0, '{"text":"v1"}', "f", 1),
        ("I", 2, "ck", None, '{"text":"k1"}', "f", 2),
        ("I", 3, "a", 1, '{"text":"x"}', "f", 3),
    ])))
    s1 = t.current_snapshot().snapshot_id
    # epoch touches the bucket but NOT the null-key rows → they must be
    # absent from the changelog entirely (no spurious D+I pair)
    merge_into(t, lww_dedupe(_events(spark, [
        ("U", 10, "a", 1, '{"text":"x2"}', "f", 4),
    ])))
    s2 = t.current_snapshot().snapshot_id
    ch = read_changes(t, s1, s2).collect()
    assert [(r["conv_id"], r["turn_idx"], r["op"]) for r in ch] == [("a", 1, "U")]
    # an UPDATED null-key row emits exactly one U (not D+I)
    merge_into(t, lww_dedupe(_events(spark, [
        ("U", 20, None, 0, '{"text":"v2"}', "f", 5),
        ("U", 21, "ck", None, '{"text":"k2"}', "f", 6),
    ])))
    s3 = t.current_snapshot().snapshot_id
    ch3 = sorted(
        ((r["conv_id"], r["turn_idx"], r["op"], r["text"]) for r in read_changes(t, s2, s3).collect()),
        key=lambda x: (x[0] or "", x[1] if x[1] is not None else -1),
    )
    assert ch3 == [(None, 0, "U", "v2"), ("ck", None, "U", "k2")]
    # and its delete is a single D carrying the last image
    merge_into(t, lww_dedupe(_events(spark, [("D", 30, None, 0, None, "f", 7)])))
    s4 = t.current_snapshot().snapshot_id
    ch4 = read_changes(t, s3, s4).collect()
    assert [(r["conv_id"], r["turn_idx"], r["op"]) for r in ch4] == [(None, 0, "D")]


def test_read_changes_emits_tiebreak_update(spark, tmp_path):
    """Two writes with the SAME lsn resolved by the (cts, sf, so)
    tie-break: the changelog must emit a U — comparing lsn alone hid it."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 2)
    merge_into(t, lww_dedupe(_events(spark, [
        ("I", 7, "tie", 0, '{"text":"first"}', "a", 1),
    ])))
    s1 = t.current_snapshot().snapshot_id
    merge_into(t, lww_dedupe(_events(spark, [
        ("U", 7, "tie", 0, '{"text":"second"}', "b", 2),  # same lsn, later (sf, so)
    ])))
    s2 = t.current_snapshot().snapshot_id
    assert t.read_logical().collect()[0]["text"] == "second"  # tie-break won
    rows = read_changes(t, s1, s2).collect()
    assert len(rows) == 1 and rows[0]["op"] == "U" and rows[0]["text"] == "second"
