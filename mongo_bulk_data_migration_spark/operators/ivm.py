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
