"""Temporal / event-time operators: as-of join, sessionization, rollup.

CDC-adjacent query shapes the reference's consumers run downstream of a
migrated collection (the reference itself delegates arbitrary reads to
MongoDB pipelines — ``/root/reference/src/MongoBulkDataMigration.ts:225-230``
forwards `$lookup`/`$match` stages verbatim; time-ordered enrichment of an
event stream against a slowly-changing state stream is the canonical such
pipeline).  Spark lacks a built-in as-of join on DataFrames, so it is
expressed as a composition of existing operators rather than a UDF:

* ``asof_join`` — union both streams, ONE hash shuffle on the key, one
  within-partition sort, then a running ``last(ignorenulls)`` window carries
  the latest right-side attributes forward onto left rows.  O(n log n) per
  partition, no per-key cross product, no broadcast of either side — the
  same plan a 1000-executor cluster wants: both inputs co-partitioned by
  key, the window never crosses partition boundaries.
* ``sessionize`` — gap-based session ids per key: lag + cumulative sum over
  the same single-shuffle partitioned window.
* ``time_rollup`` — event-time bucket aggregation (``date_trunc``), a plain
  hash aggregate with map-side partial combine.

All ordering uses (ts, seq) so ties are deterministic — results are
reproducible row-for-row against the DuckDB oracle, not just set-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_LEFT, _RIGHT = 0, 1


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_seq: str | None = None,
    right_seq: str | None = None,
    right_values: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the most recent right row at-or-before it.

    Backward as-of (the ``merge_asof`` default): match = the right row with
    the greatest ``(right_ts, right_seq) <= (left_ts, left_seq)`` within the
    same ``key`` group; left rows with no prior right row keep NULLs.

    Implementation: tag and union the two inputs, then one window pass
    ``last(value, ignorenulls=True)`` ordered by (ts, seq, side) with
    right rows sorting BEFORE left rows at identical timestamps (a state
    change effective at t is visible to an event at t).  The only shuffle is
    the hash partitioning on ``key`` that the window requires; both inputs
    share it.
    """
    if right_values is None:
        right_values = [c for c in right.columns if c not in (key, right_ts)]
    lseq = F.col(left_seq) if left_seq else F.lit(0)
    rseq = F.col(right_seq) if right_seq else F.lit(0)

    lcols = left.columns
    out_vals = [f"{prefix}{c}" for c in right_values]

    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        lseq.cast("long").alias("__seq"),
        F.lit(_LEFT).alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(v)
          for c, v in zip(right_values, out_vals)],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        rseq.cast("long").alias("__seq"),
        F.lit(_RIGHT).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(v) for c, v in zip(right_values, out_vals)],
    )
    # right rows order before left rows on ties: __side desc (1 before 0)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__seq").asc(), F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "__side",
        "__lrow",
        *[F.last(v, ignorenulls=True).over(w).alias(v) for v in out_vals],
    )
    return carried.where(F.col("__side") == _LEFT).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in lcols], *out_vals
    )


def sessionize(
    events: DataFrame,
    key: str,
    ts: str = "ts",
    seq: str | None = None,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the previous event of the same ``key`` exceeds ``gap_minutes``.

    One shuffle (hash on ``key``), two chained window functions over the
    SAME window ordering — Catalyst plans a single sort, and the windows
    never cross partitions.  Adds ``session_idx`` (0-based per key).
    """
    order = [F.col(ts).asc()] + ([F.col(seq).asc()] if seq else [])
    w = Window.partitionBy(key).orderBy(*order)
    gap_us = int(gap_minutes * 60.0 * 1_000_000)
    ts_us = F.unix_micros(F.col(ts).cast("timestamp"))
    new_sess = ts_us - F.lag(ts_us).over(w) > gap_us
    return events.withColumn(
        "session_idx",
        F.sum(F.when(F.coalesce(new_sess, F.lit(False)), 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )


def scd2_intervals(
    events: DataFrame,
    key: str,
    ts: str = "ts",
    seq: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval build from a change feed.

    Each event row becomes a validity interval ``[ts, next ts)`` for its
    key; the latest row per key is open-ended (``valid_to`` NULL,
    ``is_current`` true).  The canonical CDC-downstream dimension shape:
    one hash shuffle on ``key``, a single within-partition sort shared by
    ``lead`` — no self-join, no per-key collect.
    """
    order = [F.col(ts).asc()] + ([F.col(seq).asc()] if seq else [])
    w = Window.partitionBy(key).orderBy(*order)
    nxt = F.lead(F.col(ts)).over(w)
    return (
        events.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )


def time_rollup(
    events: DataFrame,
    ts: str = "ts",
    unit: str = "hour",
    aggs: list | None = None,
) -> DataFrame:
    """Event-time bucket aggregation: ``date_trunc(unit, ts)`` + hash agg.

    Plain groupBy — map-side partial aggregation absorbs within-partition
    duplicates before the shuffle, so the shuffle carries one row per
    (task, bucket).  Bucket emitted as epoch millis (``bucket_ms``) for
    engine-neutral comparison.
    """
    if aggs is None:
        aggs = [F.count(F.lit(1)).alias("n_events")]
    out = events.groupBy(F.date_trunc(unit, F.col(ts)).alias("__bucket")).agg(*aggs)
    other = [c for c in out.columns if c != "__bucket"]
    return out.select(F.unix_millis("__bucket").alias("bucket_ms"), *other)
