"""Per-epoch lineage + metrics log (SURVEY §2.5 G8, §7.1 M5).

Reference analog: ``ProcessingResultsPromise`` — a per-sample status vector
set exactly once and waitable (/root/reference/src/processing_results.h:51-89).
Our unit of status is the epoch: each committed epoch appends one JSON
record (source offset range → snapshot id → row counts → durations) to an
append-only JSONL log that lives NEXT TO the table metadata and is written
*before* the checkpoint advances, so a resumed engine can always join
"what the source said" to "what the table has".

The log is tiny (one record per epoch) — driver-side JSON, not a Spark
write, by design: it must be readable without a SparkSession for ops
tooling (`engine.lineage()`).
"""

from __future__ import annotations

import json
import os
from typing import Any


class LineageLog:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def append(self, record: dict[str, Any]) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=str) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def records(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out

    def last(self) -> dict | None:
        recs = self.records()
        return recs[-1] if recs else None
