"""$lookup-equivalent enrichment join (J1).

The reference passes `$lookup` pipeline stages straight to MongoDB — a
left-outer equi-join whose matches embed as an array field
(``/root/reference/src/MongoBulkDataMigration.ts:225-230``, self-join test
``__tests__/MongoBulkDataMigration.update.test.ts:286-317``).  Spark-first:
left join + groupBy + collect_list(struct) reproduces the embedded-array
shape; the dimension side broadcasts when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def lookup_join(
    left: DataFrame,
    right: DataFrame,
    local_field: str,
    foreign_field: str,
    as_field: str = "matches",
    broadcast_right: bool = True,
) -> DataFrame:
    rcols = [c for c in right.columns]
    r = right.select(
        F.col(foreign_field).alias("__fk"), F.struct(*[F.col(c) for c in rcols]).alias("__row")
    )
    if broadcast_right:
        r = F.broadcast(r)
    joined = left.join(r, left[local_field] == r["__fk"], "left")
    return (
        joined.groupBy(*[left[c] for c in left.columns])
        .agg(
            F.collect_list("__row").alias(as_field),
            F.count("__fk").alias(f"n_{as_field}"),
        )
    )
