"""Conversation assembly & training-shard export — the last mile from a
CDC-maintained transcript table to model-ready data.

A transcripts lakehouse stores one row per (conv_id, turn_idx); training
consumes one SAMPLE per conversation: the turns in order, flattened to a
single text. ``assemble_conversations`` does that collapse as ONE
combinable aggregation (collect_list partially aggregates map-side, the
sort happens per group AFTER the shuffle, never a global window), and
``export_jsonl`` writes the assembled rows as deterministic JSONL shards
(hash-sharded by key: re-running the export — or running it on another
cluster — produces byte-identical shard membership).

Scale shape: one hash exchange on the conversation key for assembly; the
export adds one repartition on the shard id so each shard is exactly one
output file without funnelling through a single task. No Python in
either path.

Reference analog: container pagination — sub-streams of one container
re-assembled into the full sample in index order
(/root/reference/include/nvimgcodec.h:601-612 sub-code-stream views,
SURVEY S8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_conversations(
    df: DataFrame,
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    line_cols: list[str] | None = None,
    sep: str = "\n",
) -> DataFrame:
    """One row per conversation: ordered turns + flattened text.

    ``line_cols``: the columns rendered per turn, joined by ``": "``
    (e.g. ``["role", "text"]`` → ``user: hello``); null column values
    render as empty. Output columns: key, ``n_turns``, ``first_turn``,
    ``last_turn``, ``n_chars`` (of full_text), ``full_text``.

    The order key rides INSIDE the collected struct so ``sort_array``
    restores turn order per group — deterministic under any partitioning
    (ties are impossible against a keyed table; against raw frames the
    line text itself is the tie-break, keeping output stable).
    """
    if line_cols is None:
        line_cols = [c for c in df.columns if c not in (key_col, order_col)]
    if not line_cols:
        raise ValueError("assemble_conversations needs at least one line column")
    line = F.concat_ws(
        ": ", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in line_cols]
    )
    turn = F.struct(F.col(order_col).alias("o"), line.alias("l"))
    agg = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(order_col).alias("first_turn"),
        F.max(order_col).alias("last_turn"),
        F.sort_array(F.collect_list(turn)).alias("_turns"),
    )
    full_text = F.array_join(F.transform(F.col("_turns"), lambda t: t["l"]), sep)
    return agg.select(
        key_col,
        "n_turns",
        "first_turn",
        "last_turn",
        F.length(full_text).alias("n_chars"),
        full_text.alias("full_text"),
    )


def export_jsonl(
    conversations: DataFrame,
    out_dir: str,
    shards: int = 8,
    key_col: str = "conv_id",
) -> DataFrame:
    """Write assembled conversations as JSONL training shards.

    Sharding is ``xxhash64(key) mod shards`` — deterministic and
    partition-independent, so incremental re-exports and multi-cluster
    runs agree on shard membership. Each shard lands as one directory
    ``shard=K`` of text part-files; one ``repartition(shards, shard)``
    keeps shard files unfragmented without a single-task funnel.

    Returns the (shard, key, line) frame for callers that want to count
    or verify without re-reading the files.
    """
    if shards < 1:
        raise ValueError("shards must be >= 1")
    payload_cols = [c for c in conversations.columns]
    staged = conversations.select(
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(shards))
        .cast("int")
        .alias("shard"),
        F.col(key_col).alias("_k"),
        F.to_json(F.struct(*[F.col(c) for c in payload_cols])).alias("line"),
    )
    (
        staged.repartition(shards, "shard")
        .sortWithinPartitions("shard", "_k")  # stable line order per shard
        .select("shard", "line")
        .write.partitionBy("shard")
        .mode("overwrite")
        .text(out_dir)
    )
    return staged.select("shard", F.col("_k").alias(key_col), "line")
