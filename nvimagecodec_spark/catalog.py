"""SQL catalog bridge: expose LakeTables to ``spark.sql``.

A user migrating from the reference stack queries tables by NAME, not by
constructing reader objects. ``register`` publishes a table's live
logical state (tombstones filtered, deltas reconciled, renames projected)
as a temp view; ``register_all`` mounts every table under a directory.

Snapshot semantics: the view pins the file set AT REGISTRATION TIME
(DataFrames resolve their scan when built — the same contract as
``table.read_logical()``). After new commits, call ``refresh`` (or
re-register) to see them; this mirrors Spark's own
``spark.catalog.refreshTable`` discipline, and means an in-flight SQL
query never sees a half-applied epoch.

Reference analog: instances registered under a name in the codec
registry and resolved by name at call time
(/root/reference/src/codec_registry.cpp).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from nvimagecodec_spark.lakehouse.table import LakeTable


def register(
    spark: SparkSession, name: str, table: LakeTable | str, snapshot_id: int | None = None
) -> LakeTable:
    """Publish ``table`` (a LakeTable or its path) as temp view ``name``.
    ``snapshot_id`` registers a time-travel view. Returns the table."""
    t = table if isinstance(table, LakeTable) else LakeTable(spark, table)
    t.read_logical(snapshot_id=snapshot_id).createOrReplaceTempView(name)
    return t


def refresh(spark: SparkSession, name: str, table: LakeTable) -> None:
    """Re-pin the view to the table's current snapshot."""
    table.refresh()
    table.read_logical().createOrReplaceTempView(name)


def register_all(spark: SparkSession, root: str) -> dict[str, LakeTable]:
    """Mount every LakeTable directly under ``root`` as a view named by
    its directory name. Returns {name: table}."""
    out: dict[str, LakeTable] = {}
    for entry in sorted(os.listdir(root)):
        p = os.path.join(root, entry)
        if os.path.isdir(p) and os.path.isdir(os.path.join(p, "metadata")):
            out[entry] = register(spark, entry, p)
    return out
