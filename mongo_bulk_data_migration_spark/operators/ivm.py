"""Incremental materialized-view maintenance over the Change Data Feed.

Keeps a grouped aggregate (count + sums) in sync with a LakeTable as CDC
batches merge into it, WITHOUT rescanning the table: each maintenance step
consumes only the change rows of the new commits (sources/changefeed.py)
and folds signed deltas into the running aggregate.

This is the classic self-maintainable-view algebra for SUM/COUNT: inserts
and update post-images contribute +1/+value, deletes and update pre-images
contribute -1/-value, so

    agg(v1) = agg(v0) (+) grouped_delta(changes(v0 -> v1))

holds exactly, batch after batch.  Cost per step is O(changed rows), never
O(table) — at 10^10 events the view stays current for the price of the
merge itself.  AVG/stddev derive from (count, sum, sum-of-squares); MIN/MAX
are NOT self-maintainable under deletes (they need a rescan of the group)
and are intentionally not offered here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sources.changefeed import CHANGE_COL


def grouped_delta(changes: DataFrame, group_col: str, sum_cols: list[str]) -> DataFrame:
    """Signed per-group deltas from a change feed: +1 for insert/update_post,
    -1 for delete/update_pre — one map-side-combinable hash aggregation."""
    sign = F.when(
        F.col(CHANGE_COL).isin("insert", "update_post"), F.lit(1)
    ).otherwise(F.lit(-1)).cast("long")
    return changes.groupBy(group_col).agg(
        F.sum(sign).alias("n_rows"),
        *[F.sum(sign * F.col(c).cast("long")).alias(f"sum_{c}") for c in sum_cols],
    )


def init_grouped_agg(df: DataFrame, group_col: str, sum_cols: list[str]) -> DataFrame:
    """One-time initialization scan (the only O(table) step, at view birth)."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(F.col(c).cast("long")).alias(f"sum_{c}") for c in sum_cols],
    )


def apply_delta(
    agg: DataFrame, delta: DataFrame, group_col: str, sum_cols: list[str]
) -> DataFrame:
    """Fold a signed delta into the running aggregate.

    Null-safe on the group key (a NULL group is a real group — e.g. rows
    inserted by CDC without a source yet); groups whose count reaches zero
    drop out, matching a from-scratch GROUP BY of the final state."""
    measures = ["n_rows"] + [f"sum_{c}" for c in sum_cols]
    a = agg.select(
        F.col(group_col).alias("__ga"), *[F.col(m).alias(f"__a_{m}") for m in measures]
    )
    d = delta.select(
        F.col(group_col).alias("__gd"), *[F.col(m).alias(f"__d_{m}") for m in measures]
    )
    j = a.join(d, F.col("__ga").eqNullSafe(F.col("__gd")), "full")
    merged = j.select(
        F.when(F.col("__ga").isNotNull() | F.col("__gd").isNotNull(),
               F.coalesce(F.col("__ga"), F.col("__gd"))).alias(group_col),
        *[
            (
                F.coalesce(F.col(f"__a_{m}"), F.lit(0))
                + F.coalesce(F.col(f"__d_{m}"), F.lit(0))
            ).alias(m)
            for m in measures
        ],
    )
    return merged.where(F.col("n_rows") > 0)


def maintain(
    agg: DataFrame, changes: DataFrame, group_col: str, sum_cols: list[str]
) -> DataFrame:
    """agg(v1) from agg(v0) + the change feed covering (v0, v1]."""
    return apply_delta(agg, grouped_delta(changes, group_col, sum_cols), group_col, sum_cols)


# ---------------------------------------------------------------------------
# Checkpointed follower: the sink -> source loop
# ---------------------------------------------------------------------------

class MaterializedGroupedView:
    """A persistent incremental materialized view over a LakeTable's Change
    Data Feed, with a checkpointed last-folded-version — the sink->source
    loop the module doc promises: a CDC sink (the LakeTable) becomes the
    next consumer's CDC source, and the consumer survives restarts.

    Layout (all under ``view_dir``)::

        state-v<version>/   parquet of the aggregate AS OF table version
        _CURRENT            atomic pointer file: {"version": <v>}

    Exactly-once across crashes without streaming-state machinery: a refresh
    (1) writes the new aggregate to a fresh ``state-v<hi>`` directory, then
    (2) atomically flips ``_CURRENT``.  A crash between (1) and (2) leaves a
    dangling state dir the next refresh simply overwrites — the pointer
    never references partial data, so fold-version semantics are exactly
    once *effectively* (same contract as the engine's applied markers,
    ``streaming/replay.py``).

    ``max_commits_per_refresh`` rate-limits a backlog: each chunk folds and
    checkpoints independently, so a follower that dies mid-backlog resumes
    from the last folded chunk instead of re-reading the whole range.
    """

    POINTER = "_CURRENT"

    def __init__(
        self,
        spark,
        tbl,
        view_dir: str,
        group_col: str,
        sum_cols: list[str],
        columns: list[str] | None = None,
        max_commits_per_refresh: int | None = None,
    ):
        import os

        self.spark = spark
        self.tbl = tbl
        self.view_dir = view_dir
        self.group_col = group_col
        self.sum_cols = list(sum_cols)
        # project the feed to exactly what the aggregate reads (column
        # pruning reaches the changefeed's parquet scans)
        self.columns = columns if columns is not None else [group_col, *sum_cols]
        self.max_commits = max_commits_per_refresh
        os.makedirs(view_dir, exist_ok=True)

    # -- checkpoint ----------------------------------------------------

    def _pointer_path(self) -> str:
        import os

        return os.path.join(self.view_dir, self.POINTER)

    def folded_version(self) -> int | None:
        """Last table version folded into the persisted view (the resume
        point), or None before :meth:`initialize`."""
        import json
        import os

        p = self._pointer_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(json.load(f)["version"])

    def _state_dir(self, version: int) -> str:
        import os

        return os.path.join(self.view_dir, f"state-v{version}")

    def _flip(self, version: int) -> None:
        """Atomic pointer move (same write-rename discipline as the
        LakeTable's snapshot commits, `sources/laketable.py:124-146`)."""
        import json
        import os
        import tempfile

        fd, tmp = tempfile.mkstemp(dir=self.view_dir, prefix=".ptr-")
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps({"version": int(version)}))
        os.replace(tmp, self._pointer_path())

    # -- lifecycle -----------------------------------------------------

    def initialize(self) -> int:
        """One-time O(table) init scan at the table's current version."""
        v = self.tbl.current_version()
        agg = init_grouped_agg(
            self.tbl.read(self.spark), self.group_col, self.sum_cols
        )
        agg.write.mode("overwrite").parquet(self._state_dir(v))
        self._flip(v)
        return v

    def read(self):
        """The view at its checkpointed version."""
        v = self.folded_version()
        if v is None:
            raise ValueError("view not initialized; call initialize() first")
        return self.spark.read.parquet(self._state_dir(v))

    def refresh(self) -> int:
        """Fold all commits past the checkpoint (rate-limited chunks).

        Returns the new folded version.  Each chunk is an independent
        fold+flip, so interruption mid-backlog loses at most one chunk of
        work, never the view."""
        from ..sources.changefeed import table_changes

        v = self.folded_version()
        if v is None:
            raise ValueError("view not initialized; call initialize() first")
        cur = self.tbl.current_version()
        while v < cur:
            hi = cur if self.max_commits is None else min(v + self.max_commits, cur)
            changes = table_changes(
                self.tbl, self.spark, v, hi, columns=self.columns
            )
            new_agg = maintain(self.read(), changes, self.group_col, self.sum_cols)
            new_agg.write.mode("overwrite").parquet(self._state_dir(hi))
            old = self._state_dir(v)
            self._flip(hi)
            self._gc(old)
            v = hi
        return v

    def follow(self, poll_interval_s: float = 1.0, max_polls: int | None = None):
        """Tail the commit log: refresh whenever new commits land.  Yields
        the folded version after each poll (bounded by ``max_polls`` for
        tests; ``None`` tails forever — the foreachBatch-style driver loop
        of `sources/changefeed.py:follow_changes`, plus checkpointing)."""
        import time as _time

        polls = 0
        while max_polls is None or polls < max_polls:
            yield self.refresh()
            polls += 1
            if max_polls is None or polls < max_polls:
                _time.sleep(poll_interval_s)

    def _gc(self, old_state_dir: str) -> None:
        import shutil

        if old_state_dir != self._state_dir(self.folded_version()):
            shutil.rmtree(old_state_dir, ignore_errors=True)
