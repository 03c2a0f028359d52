"""Binned range join: point-in-interval matching without a nested loop.

A naive ``e.ts BETWEEN w.lo AND w.hi`` join has no equi-key, so Catalyst
falls back to BroadcastNestedLoopJoin — O(|events| x |intervals|) compares
and a single-broadcast memory wall; at 100 TB that plan is fatal.  The
standard fix (used by every interval-join engine, and by Spark's own
Structured Streaming interval joins internally): quantize time into fixed
bins, explode each interval to the bins it covers, key events by their
single containing bin, hash-join on the bin id, then re-check exact
containment on the survivors.

Cost model: the shuffle carries |events| + |intervals| x avg_bins rows,
compares only within a bin, and AQE handles bin skew like any other hash
key.  ``bin_ms`` trades duplication (intervals spanning many bins) against
selectivity (too-coarse bins compare more non-matches); set it near the
median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bin_range_join(
    events: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    lo: str = "lo_ms",
    hi: str = "hi_ms",
    bin_ms: int = 3_600_000,
    how: str = "inner",
) -> DataFrame:
    """Match each event to every interval containing it (``lo <= ts < hi``).

    ``intervals`` carries epoch-ms bounds ``lo``/``hi``; the event ``ts``
    column is a timestamp.  Returns events columns + interval columns.
    """
    ev = events.withColumn(
        "__ts_ms", F.unix_millis(F.col(ts).cast("timestamp"))
    ).withColumn("__bin", (F.col("__ts_ms") / bin_ms).cast("long"))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.col(lo) / bin_ms).cast("long"),
                # hi is exclusive: a bin is covered only if [lo, hi) overlaps it
                ((F.col(hi) - 1) / bin_ms).cast("long"),
            )
        ),
    )
    joined = ev.join(iv, on="__bin", how=how).where(
        (F.col("__ts_ms") >= F.col(lo)) & (F.col("__ts_ms") < F.col(hi))
    )
    return joined.drop("__bin", "__ts_ms")
