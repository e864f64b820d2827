"""Schema-evolution event applier (SURVEY §7.1 M4, §3.3).

Reference analog: the metadata/control-plane path —
``Decoder.get_metadata`` walking extractors per metadata kind
(/root/reference/extensions/nvtiff/metadata_extractor.cpp:317-466) and the
per-stream barrier before results publish: schema events must be applied
*before* the data merge of the same epoch, in LSN order.

An epoch's events are split at schema events: S-events are tiny (collected
to the driver — they are control messages, not data), sorted by lsn, and
applied to the table via metadata-only commits; the data events of the
epoch then merge under the new schema. Incompatible schema events (unknown
kind / illegal widen) are dead-lettered, mirroring UNSUPPORTED statuses.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nvimagecodec_spark.lakehouse.table import LakeTable


@dataclass
class SchemaApplyResult:
    applied: list[dict]
    rejected: list[dict]


def split_schema_events(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(data_events, schema_events) — one pass, no shuffle."""
    return events.where(F.col("op") != "S"), events.where(F.col("op") == "S")


def apply_schema_events(table: LakeTable, schema_events: DataFrame) -> SchemaApplyResult:
    """Apply S-events to the table in LSN order. Returns applied/rejected."""
    rows = (
        schema_events.select("lsn", "schema_change")
        .where(F.col("schema_change").isNotNull())
        .orderBy("lsn")
        .collect()
    )
    applied: list[dict] = []
    rejected: list[dict] = []
    for r in rows:
        sc = r["schema_change"].asDict()
        sc["lsn"] = r["lsn"]
        kind = (sc.get("kind") or "").lower()
        try:
            if kind == "add":
                if not table.table_schema.has_column(sc["column"]):
                    table.add_column(sc["column"], sc["new_type"] or "string")
                applied.append(sc)
            elif kind == "rename":
                if table.table_schema.has_column(sc["column"]):
                    table.rename_column(sc["column"], sc["new_name"])
                    applied.append(sc)
                elif table.table_schema.has_column(sc["new_name"]):
                    applied.append(sc)  # replay of an already-applied rename → no-op
                else:
                    raise KeyError(f"rename source column {sc['column']!r} missing")
            elif kind == "widen":
                table.widen_column(sc["column"], sc["new_type"])
                applied.append(sc)
            else:
                raise ValueError(f"unknown schema-change kind {kind!r}")
        except Exception as e:  # incompatible → dead letter, keep applying rest
            sc["error"] = str(e)
            rejected.append(sc)
    return SchemaApplyResult(applied, rejected)
