"""Per-key event collapse + training-data deduplication operators.

``last_wins`` is the CDC prerequisite the reference sidesteps by contract
("update a document **once** per migration", ``/root/reference/README.md:36``;
it merely *warns* otherwise, ``src/MongoBulkDataMigration.ts:175-184``): a
MERGE source must carry exactly one row per key, so multiple events per key
per batch collapse to the highest-``seq`` one.

Physical note (skew): implemented as ``groupBy(key).agg(max_by(struct, ord))``
— hash aggregation with map-side partial combine, so a Zipf-hot key is
pre-collapsed inside every map task before the shuffle; only one partial row
per (task, key) crosses the wire.  This is strictly better under skew than
``row_number() over (partition by key order by seq desc)``, which ships every
event of the hot key to a single reducer.  ``n_salt`` adds an explicit extra
two-phase split for adversarial skew (hot key × huge batch × wide rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def last_wins(
    events: DataFrame,
    key: str = "doc_id",
    order: str = "seq",
    n_salt: int | None = None,
    extra_group: tuple[str, ...] = (),
) -> DataFrame:
    """Collapse to the single highest-``order`` event per ``key``.

    ``extra_group`` prepends grouping columns (e.g. a batch id) so one pass
    collapses every group at once — the prestage path's all-batches collapse.
    """
    gcols = [*extra_group, key]
    cols = events.columns
    payload = F.struct(*[F.col(c) for c in cols])
    if n_salt and n_salt > 1:
        salted = events.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(order)), F.lit(n_salt)).cast("int")
        )
        partial = salted.groupBy(*gcols, "__salt").agg(
            F.max_by(payload, F.col(order)).alias("__row"), F.max(order).alias("__ord")
        )
        final = partial.groupBy(*gcols).agg(F.max_by(F.col("__row"), F.col("__ord")).alias("__row"))
    else:
        final = events.groupBy(*gcols).agg(F.max_by(payload, F.col(order)).alias("__row"))
    return final.select(*[F.col(f"__row.{c}").alias(c) for c in cols])
