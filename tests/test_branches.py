"""Branch refs (Iceberg branch analog): an independently-advancing named
commit chain over one table — multi-commit write-audit-publish. Commits
through a branch handle advance only the branch pointer; main adopts the
chain atomically via fast_forward; expiry pins live branch ancestry.
"""

import os
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.incremental import read_changes
from nvimagecodec_spark.lakehouse.table import (
    ConcurrentModification,
    LakeTable,
)
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch(spark, n, lsn0=0, tag="t"):
    return lww_dedupe(
        spark.range(n).select(
            F.concat(F.lit("c"), (F.col("id") % 13).cast("string")).alias("conv_id"),
            (F.col("id") % 3).cast("int").alias("turn_idx"),
            F.lit("I").alias("op"),
            F.to_json(
                F.struct(
                    F.concat(F.lit(tag), F.col("id").cast("string")).alias("text")
                )
            ).alias("after"),
            (F.col("id") + lsn0).alias("lsn"),
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias("commit_ts"),
            F.lit("f").alias("src_file"),
            F.col("id").alias("src_offset"),
        )
    )


def _mk(spark, tmp_dir):
    t = LakeTable.create(
        spark,
        os.path.join(tmp_dir, f"br-{uuid.uuid4().hex[:6]}"),
        SCHEMA,
        ["conv_id", "turn_idx"],
        bucket_count=4,
    )
    merge_into(t, _batch(spark, 30, tag="base"))
    return t


def _state(t):
    return sorted(
        map(str, t.read_logical().select("conv_id", "turn_idx", "text").collect())
    )


def test_branch_commits_leave_main_untouched(spark, tmp_dir):
    t = _mk(spark, tmp_dir)
    main_before = _state(t)
    main_head = t.current_snapshot().snapshot_id
    t.create_branch("audit")
    b = t.branch("audit")
    merge_into(b, _batch(spark, 20, lsn0=1000, tag="br"))
    # branch advanced, main didn't
    t.refresh()
    assert t.current_snapshot().snapshot_id == main_head
    assert t.branches()["audit"] > main_head
    assert _state(t) == main_before
    # branch handle reads the branch state
    got = _state(b)
    assert got != main_before
    assert any("br" in r for r in got)


def test_fast_forward_adopts_branch_chain(spark, tmp_dir):
    t = _mk(spark, tmp_dir)
    t.create_branch("wap")
    b = t.branch("wap")
    merge_into(b, _batch(spark, 15, lsn0=1000, tag="e1"),
               tag={"source_id": "wap-src", "batch_id": 1})
    merge_into(b, _batch(spark, 15, lsn0=2000, tag="e2"),
               tag={"source_id": "wap-src", "batch_id": 2})
    branch_state = _state(b)
    head = t.fast_forward("wap")
    t.refresh()
    assert t.current_snapshot().snapshot_id == head
    assert _state(t) == branch_state
    # idempotent re-fast-forward
    assert t.fast_forward("wap") == head
    # exactly-once tags committed on the branch guard main replays now
    assert t.has_commit_tag("wap-src", 1) and t.has_commit_tag("wap-src", 2)


def test_fast_forward_refuses_diverged_main(spark, tmp_dir):
    t = _mk(spark, tmp_dir)
    t.create_branch("side")
    b = t.branch("side")
    merge_into(b, _batch(spark, 10, lsn0=1000, tag="side"))
    merge_into(t, _batch(spark, 10, lsn0=5000, tag="main-moved"))
    with pytest.raises(ConcurrentModification, match="not an ancestor"):
        t.fast_forward("side")


def test_expiry_pins_branch_ancestry(spark, tmp_dir):
    t = _mk(spark, tmp_dir)
    t.create_branch("keepme")
    b = t.branch("keepme")
    merge_into(b, _batch(spark, 10, lsn0=1000, tag="bk"))
    branch_state = _state(b)
    t.refresh()
    bhead = t.branches()["keepme"]
    for i in range(6):
        merge_into(t, _batch(spark, 5, lsn0=10_000 + i * 100, tag=f"m{i}"))
    t.expire_snapshots(keep_last=2)
    t.refresh()
    # the branch chain survived the sweep and still reads
    assert t.branches()["keepme"] == bhead
    assert _state(t.branch("keepme")) == branch_state
    # dropping the branch releases the pins; the next sweep reaps
    t.drop_branch("keepme")
    t.expire_snapshots(keep_last=2)
    t.refresh()
    ids = {s.snapshot_id for s in t.history()}
    assert bhead not in ids


def test_branch_changelog_and_nested_fork(spark, tmp_dir):
    t = _mk(spark, tmp_dir)
    fork = t.current_snapshot().snapshot_id
    t.create_branch("cl")
    b = t.branch("cl")
    merge_into(b, _batch(spark, 8, lsn0=1000, tag="clx"))
    t.refresh()
    head = t.branches()["cl"]
    ch = read_changes(t, fork, head)
    ops = {r["op"] for r in ch.collect()}
    assert ops <= {"I", "U"} and ch.count() > 0
    # a branch handle can fork again (fork point = branch head)
    b.create_branch("cl2")
    assert t.branch("cl2").current_snapshot().snapshot_id == head


def test_maintenance_refuses_on_branch_handle(spark, tmp_dir):
    t = _mk(spark, tmp_dir)
    t.create_branch("nb")
    b = t.branch("nb")
    for op in ("compact", "expire_snapshots", "remove_orphans", "rollback"):
        with pytest.raises(TypeError, match="branch handle"):
            getattr(b, op)()
    # attribute probing must NOT raise (generic duck-typing code)
    assert hasattr(b, "compact") and getattr(b, "optimize", None) is not None


def test_unknown_and_duplicate_branches(spark, tmp_dir):
    t = _mk(spark, tmp_dir)
    with pytest.raises(KeyError):
        t.branch("ghost")
    t.create_branch("dup")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("dup")
    with pytest.raises(KeyError):
        t.drop_branch("ghost")


def test_expiry_never_evicts_mains_chain_under_branch_tail(spark, tmp_dir):
    """Review-caught: branch commits occupying the snapshot-list tail
    must not push main's CURRENT snapshot (or its recent chain) out of
    retention — retention is lineage-scoped, not list-scoped."""
    t = _mk(spark, tmp_dir)
    main_state = _state(t)
    main_head = t.current_snapshot().snapshot_id
    t.create_branch("noise")
    b = t.branch("noise")
    for i in range(5):
        merge_into(b, _batch(spark, 4, lsn0=1000 + i * 100, tag=f"n{i}"))
    t.refresh()
    t.expire_snapshots(keep_last=2)
    t.refresh()
    # main's head survived and still reads
    assert t.current_snapshot().snapshot_id == main_head
    assert _state(t) == main_state


def test_fast_forwarded_branch_does_not_block_expiry(spark, tmp_dir):
    """Review-caught: after fast_forward the branch head sits ON main's
    chain — its pins must collapse so retention keeps working without a
    manual drop_branch."""
    t = _mk(spark, tmp_dir)
    t.create_branch("wap")
    b = t.branch("wap")
    merge_into(b, _batch(spark, 6, lsn0=1000, tag="w"))
    t.fast_forward("wap")
    for i in range(6):
        merge_into(t, _batch(spark, 4, lsn0=5000 + i * 100, tag=f"m{i}"))
    n = t.expire_snapshots(keep_last=2)
    assert n > 0  # expiry actually reclaimed snapshots


def test_main_as_of_read_excludes_branch_commits(spark, tmp_dir):
    """Review-caught: timestamp time travel on MAIN must never resolve to
    an unpublished branch snapshot."""
    import time as _time

    t = _mk(spark, tmp_dir)
    main_state = _state(t)
    t.create_branch("side")
    b = t.branch("side")
    _time.sleep(0.05)
    merge_into(b, _batch(spark, 6, lsn0=1000, tag="sideonly"))
    t.refresh()
    now_ms = int(_time.time() * 1000) + 1000
    snap = t.snapshot_as_of(now_ms)
    assert snap.snapshot_id == t.current_snapshot().snapshot_id
    got = _state(t)
    assert got == main_state and not any("sideonly" in r for r in got)


def test_iceberg_export_excludes_unpublished_branch(spark, tmp_dir):
    """Review-caught: export must walk MAIN's lineage — an unpublished
    audit branch must never become the exported current snapshot."""
    import json as _json

    from nvimagecodec_spark.lakehouse.iceberg_export import (
        export_iceberg_metadata,
    )

    t = _mk(spark, tmp_dir)
    main_head = t.current_snapshot().snapshot_id
    t.create_branch("audit")
    b = t.branch("audit")
    merge_into(b, _batch(spark, 6, lsn0=1000, tag="unpublished"))
    t.refresh()
    md = _json.load(open(export_iceberg_metadata(t)))
    assert md["current-snapshot-id"] == main_head
    exported_ids = {x["snapshot-id"] for x in md["snapshots"]}
    assert t.branches()["audit"] not in exported_ids
