"""Partial after-image (patch) apply — operators/patch.py.

Semantics pinned here:
- a patch updates exactly the fields its JSON names; others inherit
- explicit null in a patch NULLs the column (absence != null)
- patch to a missing or tombstoned key is dropped (no upsert)
- within a batch: full image supersedes older patches, later patches
  compose on top, a delete latches against later patches
- across epochs: a patch event older than the table row loses whole
  (row-level order check in the merge)
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into
from nvimagecodec_spark.operators.patch import expand_patches

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _events(spark, rows):
    """rows: (conv, turn, op, after_dict_or_None, lsn)."""
    data = [
        (c, t, op, None if after is None else json.dumps(after), lsn)
        for (c, t, op, after, lsn) in rows
    ]
    return spark.createDataFrame(
        data, "conv_id string, turn_idx int, op string, after string, lsn long"
    ).withColumns(
        {
            "commit_ts": F.lit("2026-01-01 00:00:00").cast("timestamp"),
            "src_file": F.lit("test"),
            "src_offset": F.col("lsn"),
        }
    )


def _state(table):
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.score)
        for r in table.read_logical().collect()
    }


@pytest.fixture()
def table(spark, tmp_dir):
    t = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    base = _events(
        spark,
        [
            ("a", 0, "I", {"role": "user", "text": "hello", "score": 1.0}, 0),
            ("a", 1, "I", {"role": "assistant", "text": "hi", "score": 2.0}, 1),
            ("b", 0, "I", {"role": "user", "text": "query", "score": 3.0}, 2),
            ("c", 0, "I", {"role": "system", "text": "gone", "score": 4.0}, 3),
            ("c", 0, "D", None, 4),  # tombstoned key
        ],
    )
    merge_into(t, lww_dedupe(base))
    return t


def test_patch_updates_named_fields_only(spark, table):
    batch = _events(spark, [("a", 0, "P", {"text": "edited"}, 100)])
    merge_into(table, expand_patches(table, batch))
    st = _state(table)
    assert st[("a", 0)] == ("user", "edited", 1.0)  # role/score inherited
    assert st[("a", 1)] == ("assistant", "hi", 2.0)  # untouched row intact


def test_explicit_null_differs_from_absence(spark, table):
    batch = _events(spark, [("a", 0, "P", {"text": None, "score": 9.5}, 100)])
    merge_into(table, expand_patches(table, batch))
    st = _state(table)
    assert st[("a", 0)] == ("user", None, 9.5)  # text nulled, role kept


def test_patch_to_missing_or_deleted_key_dropped(spark, table):
    batch = _events(
        spark,
        [
            ("zz", 9, "P", {"text": "ghost"}, 100),  # never existed
            ("c", 0, "P", {"text": "zombie"}, 101),  # tombstoned
        ],
    )
    r = merge_into(table, expand_patches(table, batch))
    st = _state(table)
    assert ("zz", 9) not in st and ("c", 0) not in st
    assert r.upserts == 0


def test_within_batch_full_and_patch_compose(spark, table):
    batch = _events(
        spark,
        [
            # patch BEFORE the full image is superseded by it
            ("a", 0, "P", {"text": "stale"}, 100),
            ("a", 0, "U", {"role": "tool", "text": "fresh", "score": 5.0}, 101),
            # patch AFTER the full image composes on top
            ("a", 0, "P", {"score": 6.0}, 102),
            # delete latches: later patch cannot resurrect
            ("a", 1, "D", None, 103),
            ("a", 1, "P", {"text": "necromancy"}, 104),
            # insert then two patches on a brand-new key, all in one batch
            ("d", 0, "I", {"role": "user", "text": "new", "score": 0.0}, 105),
            ("d", 0, "P", {"text": "newer"}, 106),
            ("d", 0, "P", {"score": 7.0}, 107),
        ],
    )
    merge_into(table, expand_patches(table, batch))
    st = _state(table)
    assert st[("a", 0)] == ("tool", "fresh", 6.0)
    assert ("a", 1) not in st
    assert st[("d", 0)] == ("user", "newer", 7.0)


def test_stale_patch_epoch_loses_row_level(spark, table):
    # the row at (b,0) carries lsn=2; a patch event with an OLDER lsn
    # must lose entirely at the merge's order check
    batch = _events(spark, [("b", 0, "P", {"text": "time traveler"}, 1)])
    merge_into(table, expand_patches(table, batch))
    assert _state(table)[("b", 0)] == ("user", "query", 3.0)


def test_two_patches_same_field_latest_wins(spark, table):
    batch = _events(
        spark,
        [
            ("b", 0, "P", {"text": "first"}, 100),
            ("b", 0, "P", {"text": "second", "role": "editor"}, 101),
        ],
    )
    merge_into(table, expand_patches(table, batch))
    assert _state(table)[("b", 0)] == ("editor", "second", 3.0)


def test_sequential_patch_epochs_accumulate(spark, table):
    for lsn, patch in [(100, {"text": "v1"}), (200, {"score": 8.0}), (300, {"role": "x"})]:
        merge_into(
            table, expand_patches(table, _events(spark, [("a", 0, "P", patch, lsn)]))
        )
    assert _state(table)[("a", 0)] == ("x", "v1", 8.0)


def test_patch_under_pre_rename_field_name(spark, table):
    table.rename_column("text", "body")
    batch = _events(spark, [("a", 0, "P", {"text": "old-name patch"}, 100)])
    merge_into(table, expand_patches(table, batch))
    rows = {
        (r.conv_id, r.turn_idx): r.body for r in table.read_logical().collect()
    }
    assert rows[("a", 0)] == "old-name patch"


def test_unknown_field_only_patch_is_noop(spark, table):
    before = _state(table)
    batch = _events(spark, [("a", 0, "P", {"bogus": 1}, 100)])
    r = merge_into(table, expand_patches(table, batch))
    assert _state(table) == before
    assert r.upserts == 0
