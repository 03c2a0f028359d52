"""Per-partition high-water-mark offset store (FETCH_ALL resume analog).

The reference resumes by reading the max ``_id`` from the backup collection
(``/root/reference/src/MongoBulkDataMigration.ts:326-341``).  Here the resume
authority is an explicit per-partition ``max_seq`` map — tiny driver-side
state, written atomically AFTER each successful merge commit (the same
ordering as the reference: the HWM can lag the data, never lead it; replay
of a lagging batch is made exactly-once by the table's ``applied`` marker).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F


class HwmStore:
    def __init__(self, warehouse: str, migration_id: str):
        self.dir = os.path.join(os.path.abspath(warehouse), "_state")
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, f"hwm_{migration_id}.json")

    def load(self) -> dict[str, Any]:
        if not os.path.exists(self.path):
            return {"parts": {}, "batch_id": -1, "global_max_seq": -1}
        with open(self.path) as f:
            return json.load(f)

    def save(self, parts: dict[int, int], batch_id: int, global_max_seq: int) -> None:
        state = {
            "parts": {str(k): int(v) for k, v in sorted(parts.items())},
            "batch_id": int(batch_id),
            "global_max_seq": int(global_max_seq),
        }
        tmp = f"{self.path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(state, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)

    def advance(self, new_parts: dict[int, int], batch_id: int) -> None:
        cur = self.load()
        parts = {int(k): int(v) for k, v in cur["parts"].items()}
        for p, s in new_parts.items():
            parts[int(p)] = max(parts.get(int(p), -1), int(s))
        gmax = max([cur["global_max_seq"], *parts.values()]) if parts else cur["global_max_seq"]
        self.save(parts, batch_id, gmax)

    def delete(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)

    # ------------------------------------------------------------------

    def filter_events(self, spark: SparkSession, events: DataFrame) -> DataFrame:
        """``where(seq > hwm[part])`` — the R1 range-predicate resume.

        The HWM map is tiny (one row per stream partition), so it compiles
        into the scan as a LITERAL ``map[part]`` lookup — a pure JVM
        expression, no join and no local-Python-RDD DataFrame (the previous
        broadcast-join build shipped a pickled-Python partition through
        executor Python workers; at cluster scale that is a needless
        Python round-trip on the window's critical path, and the global
        ``seq > min(hwm)`` conjunct below IS min/max-pushable to parquet
        row-group pruning, which the join form never was).
        """
        state = self.load()
        parts = state["parts"]
        if not parts:
            return events
        m = F.create_map(
            *[F.lit(x) for p, s in parts.items() for x in (int(p), int(s))]
        )
        # coarse pushable prefilter: no event at or below the SMALLEST
        # per-part HWM can survive the exact per-part predicate
        floor_seq = min(int(s) for s in parts.values())
        return events.where(
            (F.col("seq") > F.lit(floor_seq))
            | ~F.col("part").isin(*[int(p) for p in parts])
        ).where(
            F.col("seq") > F.coalesce(
                m[F.col("part")].cast("long"), F.lit(-1).cast("long")
            )
        )
