"""Property: for ANY epoch split of a change stream, and ANY sync
cadence (after every epoch, or skipping some), the assembled view
converges to ``assemble_conversations`` over the final table — the
turn-array read-modify-write must be confluent across histories.

This is the assembled view's version of the MoR interleaving armor
(tests/test_mor_property.py): the stored array + net-change patching
must produce the same logical result no matter where the epoch
boundaries fall or how many epochs a single sync folds at once.
"""

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into
from nvimagecodec_spark.operators.transcripts import (
    AssembledTranscriptsView,
    assemble_conversations,
)
from nvimagecodec_spark.sources.generator import generate_change_events

from tests.test_mor_property import TARGET_SCHEMA, _events_df


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    cuts=st.lists(st.floats(min_value=0.05, max_value=0.95), min_size=1, max_size=4),
    sync_after=st.lists(st.booleans(), min_size=5, max_size=5),
)
def test_any_epoch_split_and_sync_cadence_converges(
    spark, tmp_path_factory, seed, cuts, sync_after
):
    events = generate_change_events(n_events=300, seed=seed, with_schema_events=False)
    bounds = sorted({int(len(events) * c) for c in cuts} | {0, len(events)})
    epochs = [events.iloc[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]

    root = tmp_path_factory.mktemp("asmprop")
    t = LakeTable.create(
        spark, str(root / f"t{seed}"), TARGET_SCHEMA, ["conv_id", "turn_idx"], 4
    )
    view = AssembledTranscriptsView.create(
        spark, str(root / f"v{seed}"), t, line_cols=["role", "text"]
    )
    for i, ep in enumerate(epochs):
        merge_into(t, lww_dedupe(_events_df(spark, ep)))
        if sync_after[i % len(sync_after)]:
            view.sync(t)  # mid-history sync: later syncs fold the rest
    view.sync(t)  # final catch-up (multi-epoch fold when cadence skipped)

    live = t.read_logical().select("conv_id", "turn_idx", "role", "text")
    want = {
        r["conv_id"]: (r["n_turns"], r["first_turn"], r["last_turn"], r["full_text"])
        for r in assemble_conversations(live, line_cols=["role", "text"]).collect()
    }
    got = {
        r["conv_id"]: (r["n_turns"], r["first_turn"], r["last_turn"], r["full_text"])
        for r in view.conversations().collect()
    }
    assert got == want
