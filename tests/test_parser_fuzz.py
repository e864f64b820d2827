"""Parser-registry robustness (P-tier hardening):

1. Round-trip property: any well-formed event encoded by ANY registered
   text encoder parses back to identical normalized fields.
2. Garbage property: arbitrary byte soup (minus newlines) never crashes
   the scan — every line is either claimed by exactly one format or
   dead-lettered, and claimed garbage yields nulls, not exceptions
   (ANSI-safe parsing everywhere).

Reference analog: the fuzzed parser corpora under
/root/reference/test/ (malformed-header decode tests).
"""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nvimagecodec_spark.sources.changelog import (
    dead_letters,
    encode_avro_line,
    encode_binary_line,
    encode_tsv_line,
    parse_changes,
)

# printable-ish conv ids without the encodings' structural chars
conv_ids = st.text(
    alphabet=st.characters(
        min_codepoint=33, max_codepoint=126, exclude_characters="|\t\\\"'"
    ),
    min_size=1,
    max_size=12,
)


@st.composite
def events(draw):
    return {
        "op": draw(st.sampled_from(["I", "U", "D"])),
        "lsn": draw(st.integers(min_value=0, max_value=2**60)),
        "ts_us": draw(st.integers(min_value=0, max_value=4_000_000_000_000_000)),
        "conv_id": draw(conv_ids),
        "turn_idx": draw(st.one_of(st.none(), st.integers(min_value=0, max_value=2**31 - 1))),
        "text": draw(
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
                max_size=40,
            )
        ),
    }


def _expected(e):
    has_after = e["op"] != "D"
    return (
        e["op"],
        e["lsn"],
        e["conv_id"],
        e["turn_idx"],
        json.loads(json.dumps({"text": e["text"]})) if has_after else None,
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(events(), min_size=1, max_size=12))
def test_binary_tsv_avro_round_trip(spark, evts):
    lines = []
    import pandas as pd

    for i, e in enumerate(evts):
        payload = json.dumps({"text": e["text"]}) if e["op"] != "D" else None
        ts_str = (
            pd.Timestamp(e["ts_us"], unit="us").isoformat(sep=" ")
        )
        if i % 3 == 0:
            lines.append(
                encode_binary_line(
                    e["op"], e["lsn"], e["ts_us"], e["conv_id"], e["turn_idx"], payload
                )
            )
        elif i % 3 == 1:
            lines.append(
                encode_tsv_line(
                    e["op"], e["lsn"], ts_str, e["conv_id"], e["turn_idx"], payload
                )
            )
        else:
            lines.append(
                encode_avro_line(
                    e["op"], e["lsn"], e["ts_us"], e["conv_id"], e["turn_idx"], payload
                )
            )
    df = spark.createDataFrame([(ln, "f", i) for i, ln in enumerate(lines)],
                               "value string, src_file string, src_offset long")
    parsed = parse_changes(df).orderBy("src_offset").collect()
    assert len(parsed) == len(evts)
    for row, e in zip(parsed, evts):
        after = json.loads(row["after"]) if row["after"] else None
        assert (row["op"], row["lsn"], row["conv_id"], row["turn_idx"], after) == _expected(e)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=1, max_codepoint=0xFFFF, exclude_characters="\n\r"),
            min_size=1,
            max_size=60,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_garbage_never_crashes_the_scan(spark, lines):
    df = spark.createDataFrame(
        [(ln, "f", i) for i, ln in enumerate(lines)],
        "value string, src_file string, src_offset long",
    )
    parsed = parse_changes(df)
    dead = dead_letters(df)
    # must EXECUTE without raising; accounting must add up
    n_parsed = parsed.count()
    n_dead = dead.count()
    n_blank = df.where(F.length(F.trim("value")) == 0).count()
    assert n_parsed + n_dead + n_blank == len(lines)
    # claimed garbage gives null fields, never an exception
    parsed.select("op", "lsn", "conv_id", "turn_idx", "after").collect()
