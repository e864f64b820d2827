"""ShardedJsonlExport over a scheme'd path (file:/ URI): every directory
and state-file op must route through the Hadoop FileSystem API — the
same abstraction Spark's own writers use on hdfs:// / s3a:// — while
plain local paths keep the dependency-free os/shutil branch. The
LocalFileSystem behind file:/ makes the Hadoop branch fully testable in
the sandbox."""

import json
import os

import pytest
from pyspark.sql import functions as F

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.merge import merge_into
from nvimagecodec_spark.operators.transcripts import ShardedJsonlExport, _ExportFs
from tests.test_txn import SCHEMA, _batch


def _read_shards(local_dir):
    out = {}
    for d in sorted(os.listdir(local_dir)):
        if not d.startswith("shard="):
            continue
        lines = []
        for f in sorted(os.listdir(os.path.join(local_dir, d))):
            if f.startswith(("_", ".")):
                continue
            with open(os.path.join(local_dir, d, f)) as fh:
                lines.extend(ln for ln in fh.read().splitlines() if ln)
        out[d] = lines
    return out


def test_export_over_file_uri_full_lifecycle(spark, tmp_dir):
    table = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), SCHEMA, ["conv_id", "turn_idx"],
        bucket_count=4,
    )
    merge_into(
        table,
        _batch(spark, [("a", 0, "I", "alpha"), ("b", 0, "I", "beta"),
                       ("c", 0, "I", "gamma"), ("d", 0, "I", "delta")]),
    )
    local_dir = os.path.join(tmp_dir, "exp")
    uri = "file:" + local_dir
    exp = ShardedJsonlExport.create(spark, uri, table, columns=["conv_id", "text"])
    assert not exp._fs.local  # the Hadoop branch is what ran

    # state file + shard dirs landed on the underlying local FS
    with open(os.path.join(local_dir, ShardedJsonlExport.STATE_FILE)) as fh:
        st = json.load(fh)
    assert st["columns"] == ["conv_id", "text"]
    got = [json.loads(ln) for lns in _read_shards(local_dir).values() for ln in lns]
    assert {(r["conv_id"], r["text"]) for r in got} == {
        ("a", "alpha"), ("b", "beta"), ("c", "gamma"), ("d", "delta")
    }

    # incremental sync over the URI: only dirty shards rewrite
    before = _read_shards(local_dir)
    merge_into(table, _batch(spark, [("a", 0, "U", "ALPHA")], lsn0=100))
    r = exp.sync()
    assert r["dirty_shards"] and r["dirty_shards"] != ["*"]
    after = _read_shards(local_dir)
    changed = {k for k in after if after.get(k) != before.get(k)}
    assert changed == {f"shard={b}" for b in r["dirty_shards"]}
    got = [json.loads(ln) for lns in after.values() for ln in lns]
    assert ("a", "ALPHA") in {(r["conv_id"], r["text"]) for r in got}

    # reopen THROUGH the URI (state read via Hadoop FS) → noop sync
    exp2 = ShardedJsonlExport(spark, uri, table)
    assert exp2.sync()["dirty_shards"] == []

    # double-create through the FS-existence check still refuses
    with pytest.raises(FileExistsError):
        ShardedJsonlExport.create(spark, uri, table)


def test_local_path_keeps_local_branch(spark, tmp_dir):
    table = LakeTable.create(
        spark, os.path.join(tmp_dir, "t2"), SCHEMA, ["conv_id", "turn_idx"],
        bucket_count=2,
    )
    merge_into(table, _batch(spark, [("x", 0, "I", "xray")]))
    exp = ShardedJsonlExport.create(
        spark, os.path.join(tmp_dir, "exp2"), table
    )
    assert exp._fs.local
    assert exp.sync()["dirty_shards"] == []
