"""SCD Type-2 history derivation from a change stream.

Pinned semantics: versions open on tracked-attribute change or rebirth
after delete, unchanged-value events collapse into the open version,
deletes close intervals without emitting rows, duplicate deliveries
cannot split a run, and the whole derivation is a single shuffle.
"""

from pyspark.sql import functions as F

from nvimagecodec_spark.operators.scd2 import scd2_history
from nvimagecodec_spark.plans import plan_of


def _stream(spark, rows):
    """[(conv, turn, op, event_type, lsn)] with commit_ts derived from lsn."""
    df = spark.createDataFrame(
        [(c, t, op, et, lsn) for (c, t, op, et, lsn) in rows],
        "conv_id string, turn_idx int, op string, event_type string, lsn long",
    )
    return df.withColumns(
        {
            "commit_ts": F.timestamp_seconds(F.lit(1700000000) + F.col("lsn")),
            "src_file": F.lit("s"),
            "src_offset": F.col("lsn"),
        }
    )


def _hist(spark, rows):
    out = scd2_history(_stream(spark, rows), track_cols=["event_type"])
    got = {}
    for r in out.collect():
        got.setdefault((r["conv_id"], r["turn_idx"]), []).append(
            (
                r["valid_from_lsn"],
                r["valid_to_lsn"],
                r["event_type"],
                r["n_events"],
                r["is_current"],
            )
        )
    return {k: sorted(v) for k, v in got.items()}


def test_versions_open_close_collapse_and_rebirth(spark):
    rows = [
        ("a", 0, "I", "x", 1),
        ("a", 0, "U", "x", 2),  # tracked value unchanged → same version
        ("a", 0, "U", "y", 3),  # new version
        ("a", 0, "D", None, 4),  # closes y at lsn 4
        ("a", 0, "I", "y", 5),  # rebirth → NEW version even though same value
    ]
    assert _hist(spark, rows) == {
        ("a", 0): [
            (1, 3, "x", 2, False),
            (3, 4, "y", 1, False),
            (5, None, "y", 1, True),
        ]
    }


def test_current_version_without_delete_stays_open(spark):
    rows = [("b", 1, "I", "x", 10), ("b", 1, "U", "z", 11)]
    assert _hist(spark, rows) == {
        ("b", 1): [(10, 11, "x", 1, False), (11, None, "z", 1, True)]
    }


def test_deleted_key_emits_closed_versions_only(spark):
    rows = [("c", 0, "I", "x", 1), ("c", 0, "D", None, 2)]
    assert _hist(spark, rows) == {("c", 0): [(1, 2, "x", 1, False)]}


def test_null_tracked_values_are_nullsafe(spark):
    rows = [
        ("d", 0, "I", None, 1),
        ("d", 0, "U", None, 2),  # null == null → same version
        ("d", 0, "U", "x", 3),  # null → x boundary
        ("d", 0, "U", None, 4),  # x → null boundary
    ]
    assert _hist(spark, rows) == {
        ("d", 0): [
            (1, 3, None, 2, False),
            (3, 4, "x", 1, False),
            (4, None, None, 1, True),
        ]
    }


def test_duplicate_delivery_cannot_split_a_run(spark):
    rows = [
        ("e", 0, "I", "x", 1),
        ("e", 0, "I", "x", 1),  # exact redelivery (same key + order)
        ("e", 0, "U", "x", 2),
    ]
    assert _hist(spark, rows) == {("e", 0): [(1, None, "x", 2, True)]}


def test_keys_are_independent(spark):
    rows = [
        ("f", 0, "I", "x", 1),
        ("f", 1, "I", "y", 2),
        ("f", 0, "U", "y", 3),
    ]
    h = _hist(spark, rows)
    assert h[("f", 0)] == [(1, 3, "x", 1, False), (3, None, "y", 1, True)]
    assert h[("f", 1)] == [(2, None, "y", 1, True)]


def test_valid_ts_bounds_match_lsn_bounds(spark):
    rows = [("g", 0, "I", "x", 1), ("g", 0, "U", "y", 5)]
    out = scd2_history(_stream(spark, rows), track_cols=["event_type"]).collect()
    by_from = {r["valid_from_lsn"]: r for r in out}
    assert by_from[1]["valid_to"] == by_from[5]["valid_from"]
    assert by_from[5]["valid_to"] is None


def test_single_shuffle_plan(spark):
    rows = [("a", 0, "I", "x", 1), ("a", 0, "U", "y", 2), ("b", 0, "I", "x", 3)]
    out = scd2_history(_stream(spark, rows), track_cols=["event_type"])
    # simple mode keeps "Exchange hashpartitioning(...)" on one line
    # (formatted mode splits the node name from its arguments)
    plan = plan_of(out, mode="simple")
    # windows + per-version collapse reuse ONE hash exchange on the key —
    # a second Exchange means the groupBy re-shuffled the run collapse
    assert plan.count("Exchange hashpartitioning") == 1, plan
