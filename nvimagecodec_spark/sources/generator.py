"""Deterministic synthetic change-stream generator (FIXTURES.md §3, seed=42).

The analog of the reference's checked-in resource corpus
(/root/reference/resources/{jpeg,...}) — a small deterministic input set
covering every feature branch: inserts, updates, deletes, duplicates,
out-of-order LSNs, Zipf hot keys, late timestamps, schema-change events,
and both serialized encodings (JSON lines + Debezium envelope).

LSN scheme: data events take even LSNs ``2, 4, 6, ...``; schema events take
odd LSNs between them — a single unambiguous total order shared by the
engine and the pandas oracle.

Pure numpy/pandas on the driver for fixture sizes (≤10^6); bench.py scales
generation through Spark itself so larger inputs never bottleneck on the
driver.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "python", "browser"]

SCHEMA_EVENT_PLAN = [
    (0.40, {"kind": "add", "column": "rating", "new_name": None, "new_type": "int"}),
    (0.60, {"kind": "rename", "column": "tool", "new_name": "tool_name", "new_type": None}),
    (0.80, {"kind": "widen", "column": "rating", "new_name": None, "new_type": "long"}),
]

# The full lifecycle plan: ...widen -> DROP -> re-ADD. Events between drop
# and re-add stop carrying the column (the upstream table no longer has
# it); the engine must stop extracting/exporting it, then resurrect
# re-extractable values on the re-add (from each row's winning raw image).
SCHEMA_EVENT_PLAN_FULL = SCHEMA_EVENT_PLAN + [
    (0.86, {"kind": "drop", "column": "rating", "new_name": None, "new_type": None}),
    (0.93, {"kind": "add", "column": "rating", "new_name": None, "new_type": "long"}),
]


def turn_text(conv: int, turn: int, version: int) -> str:
    return f"conv {conv} turn {turn} v{version} :: " + " ".join(
        f"w{(conv * 31 + turn * 7 + version * 3 + i) % 97}" for i in range(8)
    )


def generate_change_events(
    n_events: int = 10_000,
    n_convs: int | None = None,
    seed: int = 42,
    zipf_s: float = 1.2,
    p_update: float = 0.20,
    p_delete: float = 0.08,
    with_schema_events: bool = True,
    p_dup: float = 0.05,
    disorder_window: int = 1_000,
    p_disorder: float = 0.10,
    max_turns: int = 64,
    schema_plan: list | None = None,
    txn_max_size: int = 0,
) -> pd.DataFrame:
    """Deterministic event frame in *delivery* order.

    Columns: op lsn commit_ts conv_id turn_idx version rating renamed
    schema_change. ``rating``/``renamed`` encode what the payload carries
    given the schema in force at that event's LSN.

    ``txn_max_size > 0`` groups consecutive data events (in LSN order)
    into source transactions of random size 1..txn_max_size and stamps a
    ``txn_id`` column — the Debezium transaction-metadata analog. Ids are
    assigned BEFORE duplication/disorder, so replayed duplicates carry
    their original transaction and delivery order may interleave
    transactions (exactly what a real binlog tail sees). Schema events
    carry no txn_id.
    """
    rng = np.random.default_rng(seed)
    n_convs = n_convs or max(10, n_events // 20)

    ranks = np.arange(1, n_convs + 1)
    probs = 1.0 / ranks**zipf_s
    probs /= probs.sum()
    convs = rng.choice(n_convs, size=n_events, p=probs)

    turns = rng.integers(0, max_turns, size=n_events)
    r = rng.random(n_events)
    ops = np.where(r < p_delete, "D", np.where(r < p_delete + p_update, "U", "I"))
    versions = np.where(ops == "U", rng.integers(1, 5, size=n_events), 0)

    base_ts = pd.Timestamp("2025-01-01 00:00:00")
    commit_ts = pd.Series(
        base_ts
        + pd.to_timedelta(np.arange(n_events) * 100 + rng.integers(0, 50, n_events), unit="ms")
    )
    late = rng.random(n_events) < 0.01
    commit_ts[late] -= pd.Timedelta(hours=2)

    lsns = (np.arange(n_events, dtype=np.int64) + 1) * 2

    txn_ids = None
    if txn_max_size > 0:
        # sizes drawn until they cover n_events; txn k spans a consecutive
        # run of data-event LSNs
        sizes = rng.integers(1, txn_max_size + 1, size=n_events)
        txn_ids = np.repeat(np.arange(n_events, dtype=np.int64), sizes)[:n_events]

    add_lsn = rename_lsn = drop_lsn = readd_lsn = None
    schema_rows = []
    if with_schema_events:
        plan_lsns = []
        for frac, change in schema_plan or SCHEMA_EVENT_PLAN:
            pos = min(int(n_events * frac), n_events - 1)
            slsn = int(lsns[pos]) + 1  # odd — strictly after data event at pos
            plan_lsns.append((slsn, change))
            schema_rows.append(
                {
                    "op": "S",
                    "lsn": slsn,
                    "commit_ts": commit_ts.iloc[pos],
                    "conv_id": None,
                    "turn_idx": None,
                    "version": 0,
                    "schema_change": change,
                }
            )
        for slsn, change in plan_lsns:
            if change["kind"] == "add" and change["column"] == "rating":
                if add_lsn is None:
                    add_lsn = slsn
                else:
                    readd_lsn = slsn  # re-add after a drop
            elif change["kind"] == "rename":
                rename_lsn = slsn
            elif change["kind"] == "drop" and change["column"] == "rating":
                drop_lsn = slsn

    rng2 = np.random.default_rng(seed + 1)
    rating = rng2.integers(0, 6, size=n_events).astype("float64")
    if add_lsn is not None:
        rating[lsns < add_lsn] = np.nan
    else:
        rating[:] = np.nan
    if drop_lsn is not None:
        # the upstream column doesn't exist between drop and re-add —
        # payloads in that window stop carrying it
        in_window = (lsns > drop_lsn) & (
            (lsns < readd_lsn) if readd_lsn is not None else True
        )
        rating[in_window] = np.nan
    rating[ops == "D"] = np.nan
    renamed = lsns > rename_lsn if rename_lsn is not None else np.zeros(n_events, dtype=bool)

    df = pd.DataFrame(
        {
            "op": ops,
            "lsn": lsns,
            "commit_ts": commit_ts,
            "conv_id": [f"conv-{c:08d}" for c in convs],
            "turn_idx": turns.astype("float64"),
            "version": versions.astype(np.int64),
            "rating": rating,
            "renamed": renamed,
            "schema_change": [None] * n_events,
        }
    )
    if txn_ids is not None:
        df["txn_id"] = pd.array(txn_ids, dtype="Int64")
    if schema_rows:
        sdf = pd.DataFrame(schema_rows)
        sdf["rating"] = np.nan
        sdf["renamed"] = False
        df = pd.concat([df, sdf], ignore_index=True)
        df = df.sort_values("lsn", kind="stable").reset_index(drop=True)

    # exact duplicates delivered again (replays must be no-ops)
    dup_mask = (rng.random(len(df)) < p_dup) & (df["op"] != "S").to_numpy()
    df = pd.concat([df, df[dup_mask]], ignore_index=True)

    # bounded disorder in delivery order
    order = np.arange(len(df), dtype=np.float64)
    jitter = rng.integers(0, disorder_window, size=len(df))
    moved = rng.random(len(df)) < p_disorder
    order[moved] += jitter[moved]
    df = df.iloc[np.argsort(order, kind="stable")].reset_index(drop=True)
    return df


def payload_dict(row) -> dict | None:
    """The after-image a given I/U event carries (deterministic f(row))."""
    if row["op"] not in ("I", "U"):
        return None
    conv = int(row["conv_id"].split("-")[1])
    turn = int(row["turn_idx"])
    role = ROLES[(conv + turn) % len(ROLES)]
    tool = TOOLS[(conv + turn) % len(TOOLS)] if role == "tool" else None
    tool_key = "tool_name" if bool(row.get("renamed", False)) else "tool"
    p = {
        "role": role,
        "text": turn_text(conv, turn, int(row["version"])),
        tool_key: tool,
        "ts": (pd.Timestamp("2025-01-01") + pd.Timedelta(minutes=turn)).isoformat(sep=" "),
    }
    rating = row.get("rating")
    if rating is not None and not pd.isna(rating):
        p["rating"] = int(rating)
    return p


def events_to_files(df: pd.DataFrame, out_dir: str, files: int = 8, encoding_mix: bool = True) -> list[str]:
    """Serialize delivery-ordered events into `files` files, cycling
    JSON-lines / Debezium / binary-v1 / TSV / Avro-single-object encodings
    (parser-probe fixture — every consumer exercises all five registered
    formats)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    chunks = np.array_split(np.arange(len(df)), files)
    exts = ["jsonl", "dbz", "cdcb", "tsv", "avro"]
    for i, idx in enumerate(chunks):
        enc = exts[i % len(exts)] if encoding_mix else "jsonl"
        name = f"part-{i:05d}.{enc}"
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            for _, row in df.iloc[idx].iterrows():
                f.write(encode_row(row, enc) + "\n")
        paths.append(path)
    return paths


def encode_row(row, encoding) -> str:
    # bool kept for backward compat: True = debezium, False = jsonlines
    if isinstance(encoding, bool):
        encoding = "dbz" if encoding else "jsonl"
    after = payload_dict(row)
    ts = pd.Timestamp(row["commit_ts"])
    sc = row.get("schema_change")
    sc = sc if isinstance(sc, dict) else None
    turn = None if pd.isna(row["turn_idx"]) else int(row["turn_idx"])
    if encoding in ("cdcb", "tsv", "avro"):
        from nvimagecodec_spark.sources.changelog import (
            encode_avro_line,
            encode_binary_line,
            encode_tsv_line,
        )

        payload = json.dumps(sc) if row["op"] == "S" and sc else (
            json.dumps(after) if after else None
        )
        conv = row["conv_id"] if isinstance(row["conv_id"], str) else None
        if encoding == "tsv":
            return encode_tsv_line(
                row["op"], int(row["lsn"]), ts.isoformat(sep=" "), conv, turn, payload
            )
        if encoding == "avro":
            return encode_avro_line(
                row["op"], int(row["lsn"]), int(ts.value // 1000), conv, turn, payload
            )
        return encode_binary_line(
            row["op"], int(row["lsn"]), int(ts.value // 1000), conv, turn, payload
        )
    if encoding == "jsonl":
        rec = {
            "op": row["op"],
            "lsn": int(row["lsn"]),
            "commit_ts": ts.isoformat(sep=" "),
            "conv_id": row["conv_id"],
            "turn_idx": turn,
            "after": after,
            "schema_change": sc,
        }
        # Debezium-transaction-metadata analog: only the jsonl wire
        # carries the source transaction id (format-specific metadata,
        # like the real thing); other encodings parse txn_id as null
        txn = row.get("txn_id")
        if txn is not None and not pd.isna(txn):
            rec["txn_id"] = int(txn)
        return json.dumps(rec)
    opmap = {"I": "c", "U": "u", "D": "d", "S": "s"}
    key = {"conv_id": row["conv_id"], "turn_idx": turn}
    payload = {
        "op": opmap[row["op"]],
        "before": key if row["op"] == "D" else None,
        "after": ({**key, **after} if after else None),
        "source": {"lsn": int(row["lsn"]), "ts_ms": int(ts.value // 10**6)},
        "schema_change": sc,
    }
    return json.dumps({"payload": payload})
