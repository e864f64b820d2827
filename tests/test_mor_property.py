"""Property: ANY interleaving of CoW merges, delta merges, and delta
compactions over ANY epoch split of a change stream converges to the
same final state as the independent pandas applier.

This is the MoR layer's strongest correctness armor: the per-row order
keys are supposed to make reconciliation commutative across physical
representations — so the physical plan choices (rewrite vs layer vs
fold) must be invisible in the logical table, for every history the
strategy heuristics could ever produce.
"""

import os

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into, merge_into_delta
from nvimagecodec_spark.oracle.pandas_applier import apply_events_pandas
from nvimagecodec_spark.sources.generator import generate_change_events

TARGET_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_EV_SCHEMA = (
    "op string, lsn long, commit_ts timestamp, conv_id string, "
    "turn_idx int, after string, src_file string, src_offset long"
)


def _events_df(spark, pdf: pd.DataFrame):
    import json

    from nvimagecodec_spark.sources.generator import payload_dict

    rows = []
    for i, r in pdf.iterrows():
        after = None
        if r["op"] != "D":
            after = json.dumps(payload_dict(r))
        turn = None if pd.isna(r["turn_idx"]) else int(r["turn_idx"])
        rows.append(
            (r["op"], int(r["lsn"]), pd.Timestamp(r["commit_ts"]).to_pydatetime(),
             r["conv_id"], turn, after, "f", i)
        )
    return spark.createDataFrame(rows, _EV_SCHEMA)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    cuts=st.lists(st.floats(min_value=0.05, max_value=0.95), min_size=1, max_size=4),
    modes=st.lists(st.sampled_from(["cow", "delta", "delta+compact"]), min_size=5, max_size=5),
)
def test_any_interleaving_matches_oracle(spark, tmp_path_factory, seed, cuts, modes):
    events = generate_change_events(n_events=400, seed=seed, with_schema_events=False)
    bounds = sorted({int(len(events) * c) for c in cuts} | {0, len(events)})
    epochs = [events.iloc[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]

    path = str(tmp_path_factory.mktemp("prop") / f"t{seed}")
    t = LakeTable.create(spark, path, TARGET_SCHEMA, ["conv_id", "turn_idx"], 4)
    for i, ep in enumerate(epochs):
        batch = lww_dedupe(_events_df(spark, ep))
        mode = modes[i % len(modes)]
        if mode == "cow":
            merge_into(t, batch)
        else:
            merge_into_delta(t, batch)
            if mode == "delta+compact":
                t.compact_deltas(max_delta_files=0)

    got = (
        t.read_logical()
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = (
        apply_events_pandas(events)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp), (len(got), len(exp))
    for c in ["conv_id", "turn_idx", "role", "text", "tool"]:
        if c not in exp.columns:
            continue
        ga = got[c].astype("object").where(got[c].notna(), None)
        ea = exp[c].astype("object").where(exp[c].notna(), None)
        assert list(ga) == list(ea), c
