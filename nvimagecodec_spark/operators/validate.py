"""Apply-time constraint validation — CHECK constraints for the CDC gate.

Upstream producers ship bad payloads (schema-valid but semantically
wrong: negative quantities, enum values outside the contract, timestamps
from 1970). A lakehouse under continuous ingest needs the contract
enforced AT THE GATE, with rejected rows preserved for replay — exactly
the reference's rule that a failed sample latches a status and never
silently disappears (/root/reference/src/processing_results.cpp:30-48,
UNSUPPORTED latching).

Semantics (ANSI CHECK): a row violates a constraint iff the expression
evaluates to FALSE on its typed payload — NULL is unknown and PASSES
(use ``x IS NOT NULL`` to demand presence). Deletes carry no payload and
bypass payload checks. Validation runs on the POST-LWW winning row (one
check per key per epoch, not per event); a withheld winner leaves the
table's current value for that key untouched — it does NOT fall back to
the epoch's second-newest event (the batch was already deduped; partial
re-resolution would re-order the stream).

Scale shape: one narrow projection over the deduped batch (one
``from_json`` via the shared two-stage pattern), pure column
expressions, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.merge import (
    payload_extract_exprs,
    payload_struct_expr,
)

_ENVELOPE = {"op", "after", "lsn", "commit_ts", "src_file", "src_offset"}


def validate_batch(
    table: LakeTable, deduped: DataFrame, constraints: dict[str, str]
) -> tuple[DataFrame, DataFrame]:
    """Split a deduped change batch into (passing, violating).

    ``constraints``: name → SQL boolean expression over the table's
    LOGICAL columns (keys + payload). Returns the passing batch with the
    input's exact columns, and the violations with one extra
    ``violated`` column — the sorted names of every failed constraint
    (a row is reported once with ALL its failures, not once per rule).
    """
    if not constraints:
        return deduped, deduped.limit(0).withColumn(
            "violated", F.array().cast("array<string>")
        )
    clash = sorted(
        {c.name for c in table.table_schema.live_columns} & _ENVELOPE
    )
    if clash:
        raise ValueError(
            f"table payload columns {clash} collide with change-envelope "
            "names; constraint expressions would be ambiguous"
        )
    orig = deduped.columns
    # a batch may carry extra columns that share a payload column's name
    # (e.g. a synthesized stream keeping pre-serialization copies);
    # constraints must see the AUTHORITATIVE typed payload, so colliding
    # batch columns step aside during evaluation and are restored after
    payload_names = {
        c.name for c in table.table_schema.live_columns if c.name not in table.key_cols
    }
    collide = [c for c in orig if c in payload_names]
    hidden = {c: f"_vb_orig_{c}" for c in collide}
    staged = deduped.withColumnsRenamed(hidden).withColumn(
        "_px", payload_struct_expr(table, "after")
    )
    typed = staged.select("*", *payload_extract_exprs(table))
    is_data = F.col("op") != "D"
    flags = []
    for name in sorted(constraints):
        check = F.expr(constraints[name])
        # ANSI CHECK: only an explicit FALSE is a violation (NULL passes)
        violates = is_data & ~F.coalesce(check, F.lit(True))
        flags.append(F.when(violates, F.lit(name)))
    tagged = typed.withColumn(
        "violated",
        F.filter(F.array(*flags), lambda x: x.isNotNull()),
    )
    restore = [
        F.col(hidden[c]).alias(c) if c in hidden else F.col(c) for c in orig
    ]
    ok = tagged.where(F.size("violated") == 0).select(*restore)
    bad = tagged.where(F.size("violated") > 0).select(*restore, "violated")
    return ok, bad
