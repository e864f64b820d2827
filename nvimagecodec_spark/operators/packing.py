"""Sequence packing: fill fixed token-budget bins with documents.

LLM pretraining concatenates documents into fixed-length context windows;
the packing decision (which docs share a window) must be deterministic so
a re-run reproduces the same training batches. This operator implements
the canonical greedy packer: within a shard, walk docs in id order,
append to the current bin while it fits, else open the next bin. A doc
larger than the budget gets a bin of its own (it would be chunked by a
downstream splitter; the packer never drops rows).

Scale shape: the scan is inherently SEQUENTIAL per shard (each decision
depends on the running fill), so the shard is the parallelism unit —
``applyInPandas`` gives each shard one Arrow batch stream and the greedy
loop runs over numpy arrays, no driver involvement, no shuffle beyond
the one groupBy(shard) exchange. Shard count is the operator's scale
knob: 10^4 shards of 10^6 docs pack a 10^10-doc corpus with every core
busy. This is the documented exception class where per-row logic is
legitimate (custom stateful scan — the same contract as
``applyInPandasWithState``); everything around it stays columnar.

Reference analog: batch assembly packing samples into fixed-capacity
processing batches, ``adjustBatchSizes``
(/root/reference/src/image_generic_codec.h:1064-1123), and multi-frame
container pagination (/root/reference/include/nvimgcodec.h:601-612).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    shard_col: str = "shard",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy deterministic packing. Output: one row per input doc with
    ``bin`` (0-based window index within the shard) and ``bin_fill``
    (running token count of that bin after this doc) — the fills make
    the oracle validate the whole recurrence, not just the labels."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    fields = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [
            fields[shard_col],
            fields[id_col],
            fields[tokens_col],
            T.StructField("bin", T.LongType()),
            T.StructField("bin_fill", T.LongType()),
        ]
    )

    def pack(pdf):
        import numpy as np

        pdf = pdf.sort_values(id_col, kind="mergesort")
        sizes = pdf[tokens_col].to_numpy()
        bins = np.empty(len(sizes), dtype="int64")
        fills = np.empty(len(sizes), dtype="int64")
        b, fill = 0, 0
        for i, s in enumerate(sizes):
            s = int(s)
            if i and fill + s > budget:
                b += 1
                fill = s
            else:
                fill += s
            bins[i] = b
            fills[i] = fill
        out = pdf[[shard_col, id_col, tokens_col]].copy()
        out["bin"] = bins
        out["bin_fill"] = fills
        return out

    return df.select(shard_col, id_col, tokens_col).groupBy(shard_col).applyInPandas(
        pack, schema=out_schema
    )
