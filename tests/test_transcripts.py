"""Conversation assembly + JSONL shard export (operators/transcripts.py).

Pins: turn ordering is restored per conversation regardless of input
partitioning/order, null line columns render as empty, shard membership
is deterministic across re-runs and partitionings, each shard lands as
exactly one file, and the written JSONL round-trips to the assembled
frame byte-for-byte (including embedded newlines in full_text).
"""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from nvimagecodec_spark.operators.transcripts import (
    assemble_conversations,
    export_jsonl,
)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_assemble_orders_turns_and_counts(spark):
    # deliberately out of order across 5 partitions
    rows = [
        ("c1", 2, "assistant", "hi there"),
        ("c1", 0, "user", "hello"),
        ("c1", 1, "system", "be nice"),
        ("c2", 7, "user", "solo"),
    ]
    df = _turns(spark, rows).repartition(5)
    out = {
        r["conv_id"]: r
        for r in assemble_conversations(df, line_cols=["role", "text"]).collect()
    }
    c1 = out["c1"]
    assert c1["n_turns"] == 3
    assert (c1["first_turn"], c1["last_turn"]) == (0, 2)
    assert c1["full_text"] == "user: hello\nsystem: be nice\nassistant: hi there"
    assert c1["n_chars"] == len(c1["full_text"])
    c2 = out["c2"]
    assert c2["n_turns"] == 1 and c2["full_text"] == "user: solo"


def test_assemble_null_columns_render_empty(spark):
    df = _turns(spark, [("c", 0, None, "x"), ("c", 1, "user", None)])
    got = assemble_conversations(df, line_cols=["role", "text"]).collect()[0]
    assert got["full_text"] == ": x\nuser: "


def test_assemble_default_line_cols_and_empty_raises(spark):
    df = _turns(spark, [("c", 0, "user", "x")])
    # default = every non-key/order column, in schema order
    got = assemble_conversations(df).collect()[0]
    assert got["full_text"] == "user: x"
    with pytest.raises(ValueError):
        assemble_conversations(df.select("conv_id", "turn_idx"))


def test_export_shard_membership_deterministic(spark, tmp_dir):
    rows = [(f"c{i}", 0, "user", f"t{i}") for i in range(200)]
    asm = assemble_conversations(_turns(spark, rows), line_cols=["role", "text"])
    a = export_jsonl(asm, os.path.join(tmp_dir, "a"), shards=8)
    b = export_jsonl(asm.repartition(13), os.path.join(tmp_dir, "b"), shards=8)
    ma = {r["conv_id"]: r["shard"] for r in a.collect()}
    mb = {r["conv_id"]: r["shard"] for r in b.collect()}
    assert ma == mb and len(ma) == 200
    # every shard occupied at this cardinality, and stable on disk too
    files_a = sorted(glob.glob(os.path.join(tmp_dir, "a", "shard=*")))
    assert len(files_a) == 8


def test_export_one_file_per_shard(spark, tmp_dir):
    rows = [(f"c{i}", 0, "user", f"t{i}") for i in range(100)]
    asm = assemble_conversations(
        _turns(spark, rows).repartition(16), line_cols=["role", "text"]
    )
    export_jsonl(asm, tmp_dir, shards=4)
    for d in sorted(glob.glob(os.path.join(tmp_dir, "shard=*"))):
        parts = [f for f in os.listdir(d) if f.startswith("part-")]
        assert len(parts) == 1, f"{d} fragmented: {parts}"


def test_export_roundtrip_preserves_content(spark, tmp_dir):
    rows = [
        ("c1", 0, "user", "line one"),
        ("c1", 1, "assistant", 'quoted "text" \\ with\tescapes'),
        ("c2", 0, "user", None),
    ]
    asm = assemble_conversations(_turns(spark, rows), line_cols=["role", "text"])
    export_jsonl(asm, tmp_dir, shards=2)
    back = {}
    for path in glob.glob(os.path.join(tmp_dir, "shard=*", "part-*")):
        for line in open(path, encoding="utf-8"):
            rec = json.loads(line)
            back[rec["conv_id"]] = rec
    want = {r["conv_id"]: r.asDict() for r in asm.collect()}
    assert back == want  # embedded \n in full_text survives JSON framing


def test_export_rejects_bad_shards(spark, tmp_dir):
    asm = assemble_conversations(
        _turns(spark, [("c", 0, "u", "x")]), line_cols=["text"]
    )
    with pytest.raises(ValueError):
        export_jsonl(asm, tmp_dir, shards=0)
