"""Key-partitioned MERGE INTO over a :class:`LakeTable`.

The reference applies keyed bulk update/delete/insert ops — an implicit point
join on ``_id`` between the computed update set and the stored collection
(``/root/reference/src/lib/MigrationBulk.ts:36-50``, unordered bulk
``/root/reference/src/lib/AbstractBulkOperationResults.ts:50``).  Spark-first,
that is one MERGE per micro-batch; "unordered" is partition-parallelism,
legal because source keys are unique per batch (last-wins collapse upstream).

Source frame contract (one row per key — caller dedupes, see
:func:`..operators.dedup.last_wins`):

    (<key>, __op, <data columns of the target schema>)

ops:
  ``put``     upsert: matched -> replace row, unmatched -> insert
  ``update``  matched-only, replace only ``update_cols`` (projection-scoped
              restore; the reference's update-rollback must NOT resurrect a
              doc deleted in between — `rollback.test.ts:93-108`)
  ``insert``  unmatched-only insert (restore-deleted / first-write-wins —
              `RollbackBulk.ts:34-37`, `CHANGLOG.md:60-62`)
  ``delete``  matched -> remove, unmatched -> no-op

Physical strategy
-----------------
Bucket pruning: only buckets containing source keys are read & rewritten
(copy-on-write bounded by the touched fraction).  Two join strategies:

- ``broadcast`` (default; batches are bounded by max_events_per_batch):
  the target scan is NEVER shuffled — matched/updated rows come from a
  broadcast-hash left join, and the insert set from broadcast anti joins
  against the (small, <= batch-sized) matched-key set.  At 100 TB this is
  the difference between rewriting touched buckets at scan speed and
  shuffling them across the cluster.
- ``shuffle``: one full-outer sort-merge join for batches too big to
  broadcast; AQE skew-join splits oversized partitions.  Key uniqueness per
  side means the join itself cannot skew by multiplicity; skew lives
  upstream in the event->key collapse (see dedup salting).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation, SparkSession, functions as F

from ..sources.laketable import BUCKET_COL, LakeTable

OP_COL = "__op"
_SKEY = "__s_key"


@dataclass
class MergePlan:
    result: DataFrame            # post-merge rows for the touched buckets
    preimage: DataFrame          # (key, __op, __matched, __pre_<col>...) pre-merge
    touched: list[int]           # bucket ids to overwrite
    observations: dict[str, Observation] = field(default_factory=dict)
    source: DataFrame | None = None  # persisted prepared source (unpersist after commit)

    def metrics(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for o in self.observations.values():
            for k, v in o.get.items():
                out[k] = int(v or 0)
        return out

    def release(self) -> None:
        if self.source is not None:
            self.source.unpersist()


def _prep_source(table: LakeTable, src: DataFrame, carry_cols: list[str]) -> DataFrame:
    """Rename source cols to collision-free names + attach bucket id."""
    key = table.key_col
    cols = [F.col(key).alias(_SKEY), F.col(OP_COL)]
    for f in table.schema.fields:
        if f.name == key:
            continue
        c = F.col(f.name) if f.name in src.columns else F.lit(None)
        cols.append(c.cast(f.dataType).alias(f"__s_{f.name}"))
    for c in carry_cols:
        cols.append(F.col(c).alias(f"__c_{c}"))
    return src.select(*cols).withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(_SKEY)), F.lit(table.num_buckets)).cast("int")
    )


def _cnt(cond):
    return F.sum(F.when(cond, 1).otherwise(0))


def build_merge_plan(
    table: LakeTable,
    spark: SparkSession,
    src: DataFrame,
    update_cols: list[str] | None = None,
    strategy: str = "broadcast",
    with_observation: bool = True,
    carry_cols: list[str] | None = None,
    value_exprs: dict[str, Column] | None = None,
) -> MergePlan:
    """Build (lazily) the merged rows + pre-images for one batch.

    The caller materializes ``preimage`` into the changelog FIRST, then
    commits ``result`` via ``run_merge`` — the reference's backup-before-write
    WAL discipline (``/root/reference/src/MongoBulkDataMigration.ts:170-173``).
    """
    key = table.key_col
    data_cols = [f.name for f in table.schema.fields]
    update_set = set(update_cols if update_cols is not None else data_cols)
    carry_cols = [c for c in (carry_cols or []) if c in src.columns]

    # persisted: reused for touched-bucket discovery, pre-images, inserts
    s = _prep_source(table, src, carry_cols).persist()
    touched = sorted(r[0] for r in s.select(BUCKET_COL).distinct().collect())
    if not touched:
        # nothing to do (e.g. a fully caught-up FETCH_ALL resume): empty
        # frames with the right schemas, no observations to wait on
        empty_pre = s.limit(0).select(
            F.col(_SKEY).alias(key),
            F.col(OP_COL),
            F.lit(False).alias("__matched"),
            *[F.col(f"__s_{c}").alias(f"__pre_{c}") for c in data_cols if c != key],
            *[F.col(f"__c_{c}").alias(f"__{c}") for c in carry_cols],
        )
        return MergePlan(
            result=table.read(spark, buckets=[]),
            preimage=empty_pre,
            touched=[],
            observations={},
            source=s,
        )
    tgt = table.read(spark, buckets=touched)

    op = F.col(OP_COL)
    observations: dict[str, Observation] = {}

    def src_row(frame: DataFrame) -> DataFrame:
        return frame.select(
            *[
                F.col(_SKEY).alias(key) if c == key else F.col(f"__s_{c}").alias(c)
                for c in data_cols
            ]
        )

    def merged_value(c: str, matched):
        """Value of column c in the post-merge row.

        'update'-op values may be computed from BOTH sides via ``value_exprs``
        (e.g. a token transform applied to the matched target row) — this is
        what keeps CDC updates to a single target scan."""
        if c == key:
            return F.coalesce(F.col(key), F.col(_SKEY)).alias(c)
        src_c = F.col(f"__s_{c}")
        upd_c = value_exprs.get(c, src_c) if value_exprs else src_c
        return (
            F.when(matched & (op == "put"), src_c)
            .when(matched & (op == "update") & F.lit(c in update_set), upd_c)
            .when(op.isNotNull() & ~matched, src_c)  # shuffle-path inserts
            .otherwise(F.col(c))
            .alias(c)
        )

    if strategy == "broadcast":
        # 1) matched/updated/deleted rows: broadcast-hash left join, no shuffle
        j = tgt.join(F.broadcast(s), F.col(key) == F.col(_SKEY), "left_outer")
        matched = F.col(_SKEY).isNotNull()  # in a left join from tgt, src-hit => matched
        if with_observation:
            o = Observation("merge-matched")
            observations["matched"] = o
            j = j.observe(
                o,
                _cnt(matched).alias("n_matched"),
                _cnt(matched & op.isin("put", "update")).alias("n_modified"),
                _cnt(matched & (op == "delete")).alias("n_removed"),
                _cnt(matched & (op == "insert")).alias("n_insert_skipped"),
            )
        # keep: untouched rows, put/update rewrites, and targets of matched
        # 'insert' ops (insert-if-absent keeps the old row); drop deletes.
        survivors = j.where(op.isNull() | (op != "delete")).select(
            *[merged_value(c, matched) for c in data_cols]
        )

        # matched key set is bounded by the batch size -> broadcastable
        matched_keys = (
            tgt.join(F.broadcast(s.select(_SKEY)), F.col(key) == F.col(_SKEY), "left_semi")
            .select(F.col(key).alias(_SKEY))
        )
        unmatched_src = s.join(F.broadcast(matched_keys), _SKEY, "left_anti")
        inserts_src = unmatched_src.where(op.isin("put", "insert"))
        if with_observation:
            o2 = Observation("merge-inserted")
            observations["inserted"] = o2
            inserts_src = inserts_src.observe(o2, F.count(F.lit(1)).alias("n_inserted"))
        result = survivors.unionByName(src_row(inserts_src))

        pre_matched = j.where(op.isNotNull()).select(
            F.col(_SKEY).alias(key),
            F.col(OP_COL),
            F.lit(True).alias("__matched"),
            *[F.col(c).alias(f"__pre_{c}") for c in data_cols if c != key],
            *[F.col(f"__c_{c}").alias(f"__{c}") for c in carry_cols],
        )
        pre_unmatched = unmatched_src.select(
            F.col(_SKEY).alias(key),
            F.col(OP_COL),
            F.lit(False).alias("__matched"),
            *[
                F.lit(None).cast(f.dataType).alias(f"__pre_{f.name}")
                for f in table.schema.fields
                if f.name != key
            ],
            *[F.col(f"__c_{c}").alias(f"__{c}") for c in carry_cols],
        )
        preimage = pre_matched.unionByName(pre_unmatched)
    elif strategy == "shuffle":
        j = tgt.join(s, F.col(key) == F.col(_SKEY), "full_outer")
        matched = F.col(key).isNotNull() & F.col(_SKEY).isNotNull()
        if with_observation:
            o = Observation("merge")
            observations["matched"] = o
            j = j.observe(
                o,
                _cnt(matched & op.isNotNull()).alias("n_matched"),
                _cnt(matched & op.isin("put", "update")).alias("n_modified"),
                _cnt(matched & (op == "delete")).alias("n_removed"),
                _cnt(matched & (op == "insert")).alias("n_insert_skipped"),
                _cnt(F.col(key).isNull() & op.isin("put", "insert")).alias("n_inserted"),
            )
        keep = (
            op.isNull()
            | (matched & (op != "delete"))
            | (F.col(key).isNull() & op.isin("put", "insert"))
        )
        result = j.where(keep).select(*[merged_value(c, matched) for c in data_cols])
        preimage = j.where(op.isNotNull()).select(
            F.col(_SKEY).alias(key),
            F.col(OP_COL),
            matched.alias("__matched"),
            *[
                F.when(matched, F.col(c)).otherwise(F.lit(None)).alias(f"__pre_{c}")
                for c in data_cols
                if c != key
            ],
            *[F.col(f"__c_{c}").alias(f"__{c}") for c in carry_cols],
        )
    else:
        raise ValueError(f"unknown merge strategy: {strategy}")

    return MergePlan(
        result=result, preimage=preimage, touched=touched, observations=observations, source=s
    )


def run_merge(
    table: LakeTable,
    plan: MergePlan,
    operation: str = "merge",
    applied: dict | None = None,
    properties: dict | None = None,
) -> int:
    """Commit the merge atomically (single snapshot swap)."""
    if not plan.touched:
        return table.commit_marker(applied or {}, operation=operation, properties=properties)
    return table.overwrite_buckets(
        plan.result, plan.touched, operation=operation, applied=applied, properties=properties
    )
