"""$lookup-equivalent enrichment join (J1).

The reference passes `$lookup` pipeline stages straight to MongoDB — a
left-outer equi-join whose matches embed as an array field
(``/root/reference/src/MongoBulkDataMigration.ts:225-230``, self-join test
``__tests__/MongoBulkDataMigration.update.test.ts:286-317``).  Spark-first:
left join + groupBy + collect_list(struct) reproduces the embedded-array
shape; the dimension side broadcasts when small.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F


def lookup_join(
    left: DataFrame,
    right: DataFrame,
    local_field: str,
    foreign_field: str,
    as_field: str = "matches",
    broadcast_right: bool = True,
    right_pipeline: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Pre-aggregate the RIGHT side per foreign key, then one left join.

    The naive shape (join then groupBy over every left column) shuffles full
    left rows as grouping keys and collapses duplicate left rows; here the
    only shuffle is the right side's hash aggregation on the foreign key
    (map-side partial combine), the left never shuffles when the aggregated
    right broadcasts, and duplicate left rows are preserved — the actual
    $lookup semantics.

    ``right_pipeline`` is the reference's `$lookup` sub-pipeline passthrough
    (arbitrary stages forwarded inside the lookup,
    ``/root/reference/src/MongoBulkDataMigration.ts:225-230``): an arbitrary
    DataFrame transform applied to the right side BEFORE grouping/embedding
    (filter, projection, computed fields).  It must keep ``foreign_field``
    in its output.  Declarative, so Catalyst pushes its filters/pruning into
    the right-side scan."""
    if right_pipeline is not None:
        right = right_pipeline(right)
        if foreign_field not in right.columns:
            raise ValueError(
                f"right_pipeline dropped the foreign field {foreign_field!r}"
            )
    rcols = [c for c in right.columns]
    grouped = right.groupBy(F.col(foreign_field).alias("__fk")).agg(
        F.collect_list(F.struct(*[F.col(c) for c in rcols])).alias(as_field),
        F.count(F.lit(1)).alias(f"n_{as_field}"),
    )
    if broadcast_right:
        grouped = F.broadcast(grouped)
    joined = left.join(grouped, left[local_field] == grouped["__fk"], "left")
    row_type = right.select(F.struct(*rcols).alias("x")).schema["x"].dataType.simpleString()
    empty = F.array().cast(f"array<{row_type}>")  # unmatched -> [] like $lookup
    return (
        joined.drop("__fk")
        .withColumn(as_field, F.coalesce(F.col(as_field), empty))
        .withColumn(f"n_{as_field}", F.coalesce(F.col(f"n_{as_field}"), F.lit(0)))
    )
