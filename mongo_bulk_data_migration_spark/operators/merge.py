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

Physical strategy — single-pass, batch-bounded discipline
----------------------------------------------------------
The batch protocol needs the SAME join twice: pre-images for the changelog
(committed first — WAL ordering) and merged rows for the table.  Naively that
re-executes the target scan + join per consumer; instead:

1. the prepared source is STAGED to parquet scratch — its (possibly
   expensive) upstream lineage (last-wins aggregation, event decode) runs
   exactly once, and the staging write doubles as the touched-bucket
   discovery + source-count job via an attached Observation;
2. the join output is projected to one ``combined`` frame carrying BOTH the
   pre-image and the merged value per column — materialized to parquet
   scratch (NOT `.persist()`: the in-memory columnar cache is a slow path
   for array columns) and holding ONLY source-affected rows, so the
   per-batch working set is proportional to the batch, not the table;
3. every consumer (changelog pre-images, merged rows, matched-key set,
   metrics) reads a column-pruned slice of the scratch files.

- bucket pruning: only buckets containing source keys are read & rewritten
  (copy-on-write bounded by the touched fraction);
- ``broadcast`` strategy (default): the target side is joined broadcast-hash
  — never shuffled; untouched rows flow scan -> write directly (anti join
  against the broadcast key set); only the changed/inserted slice is
  repartitioned by bucket before the partitionBy write;
- ``shuffle`` strategy: one full-outer sort-merge join for batches too large
  to broadcast (no driver-side broadcast build at all); AQE skew-join splits
  oversized partitions.  Key uniqueness per side means the join cannot skew
  by multiplicity; skew lives upstream in the event->key collapse (see dedup
  salting).
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation, SparkSession, functions as F

from ..sources.laketable import BUCKET_COL, DELETED_COL, LakeTable, bucket_expr

OP_COL = "__op"
_SKEY = "__s_key"


@dataclass
class MergePlan:
    result: DataFrame            # post-merge rows for the touched buckets
    preimage: DataFrame          # (key, __op, __matched, __pre_<col>..., carries)
    touched: list[int]           # bucket ids to overwrite
    strategy: str = "broadcast"  # physical strategy actually chosen
    staged_bytes: int = 0        # on-disk size of the staged prepared source
    observations: dict[str, Observation] = field(default_factory=dict)
    delta: DataFrame | None = None     # merge-on-read layer: new rows + tombstones
    source: DataFrame | None = None    # staged prepared source (clean lineage)
    combined: DataFrame | None = None  # staged single-pass join output
    inserts_frame: DataFrame | None = None  # for n_inserted (cheap: staged parents)
    scratch_dir: str | None = None     # staging dir, removed on release()
    result_prepartitioned: bool = False  # result already bucket-organized
    static_metrics: dict[str, int] = field(default_factory=dict)  # prestage stats

    def metrics(self) -> dict[str, int]:
        from ..plans.obsutil import observed

        out: dict[str, int] = dict(self.static_metrics)
        for o in self.observations.values():
            # an observe node on a branch AQE eliminated reads as {} (its
            # branch produced no rows); real failures propagate
            for k, v in observed(o).items():
                if isinstance(v, (int, float)) or v is None:
                    out[k] = int(v or 0)
        if "n_inserted" not in out:
            if {"n_src_upserts", "n_put_matched", "n_insert_skipped"} <= out.keys():
                # derived, no extra job: upsert-class source rows that neither
                # replaced a matched row nor were skipped as insert-if-absent
                out["n_inserted"] = (
                    out["n_src_upserts"] - out["n_put_matched"] - out["n_insert_skipped"]
                )
            elif self.inserts_frame is not None:
                out["n_inserted"] = self.inserts_frame.count()
            else:
                out["n_inserted"] = 0
        return out

    def release(self) -> None:
        if self.scratch_dir is not None:
            shutil.rmtree(self.scratch_dir, ignore_errors=True)


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


# lossless numeric widenings only: narrowing (long->int) or precision-losing
# (int->float, long->double) casts corrupt values silently and are rejected
# unless bypass_validation is set — mirroring the reference's collection
# validator, which rejects invalid writes unless explicitly bypassed.
_WIDENINGS = {
    "byte": {"short", "integer", "long", "float", "double"},
    "short": {"integer", "long", "float", "double"},
    "integer": {"long", "double"},
    "long": set(),
    "float": {"double"},
    "double": set(),
}


def check_source_types(table: LakeTable, src: DataFrame) -> None:
    """Schema validation (the collection-validator analog,
    ``/root/reference/src/MongoBulkDataMigration.ts:425-449``): reject source
    columns whose type cannot losslessly write into the target column.  The
    reference's ``bypassUpdateValidation`` flag maps to skipping this check
    (values are then cast silently)."""
    from pyspark.sql import types as T

    for f in table.schema.fields:
        if f.name == table.key_col or f.name not in src.columns:
            continue
        st = src.schema[f.name].dataType
        # simpleString comparison: nullability differences are not a type error
        if st.simpleString() == f.dataType.simpleString() or isinstance(st, T.NullType):
            continue
        if f.dataType.typeName() in _WIDENINGS.get(st.typeName(), set()):
            continue
        raise TypeError(
            f"source column {f.name!r} has type {st.simpleString()} but the "
            f"target column is {f.dataType.simpleString()}; set "
            f"bypass_validation=True to cast anyway"
        )


# 'auto' stops broadcasting the full payload above this ESTIMATED in-memory
# relation size.  The staged on-disk bytes are parquet-encoded (dictionary +
# RLE even with codec=uncompressed): measured on the benchmark token arrays,
# a 9.1 MB staged batch (55k rows x ~256-int arrays) expands to ~60 MB of
# UnsafeRow hash relation — ~7-8x.  Round 5 broadcast a ~60 MB staged batch
# (~0.5 GB relation) and paid an up-to-30 s GC-cliff batch for it; the
# expansion factor below keeps 'auto' honest about what it is broadcasting.
BROADCAST_MAX_STAGED_BYTES = 64 << 20
BCAST_EXPANSION = int(os.environ.get("MBDM_BCAST_EXPANSION", "8"))

# 'auto' prefers the key-broadcast 'semi' strategy over the whole-table
# full-outer 'shuffle' while the batch's KEY SET is small enough to broadcast
# (a hash relation of N string keys costs ~40-60 B/key, so 8M keys ~ 400 MB —
# well under the 8 GB / 512M-row broadcast cap with headroom).  Past that the
# plain full-outer join remains the only shape with no driver-side build.
SEMI_MAX_KEYS = int(os.environ.get("MBDM_SEMI_MAX_KEYS", str(8_000_000)))


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def build_merge_plan(
    table: LakeTable,
    spark: SparkSession,
    src: DataFrame | None,
    update_cols: list[str] | None = None,
    strategy: str = "auto",
    with_observation: bool = True,
    carry_cols: list[str] | None = None,
    value_exprs: dict[str, Column] | None = None,
    bypass_validation: bool = False,
    broadcast_threshold_bytes: int = BROADCAST_MAX_STAGED_BYTES,
    prestaged: dict | None = None,
    materialize_combined: bool = True,
) -> MergePlan:
    """Build the merged rows + pre-images for one batch (single target scan).

    The caller materializes ``preimage`` into the changelog FIRST, then
    commits ``result`` via ``run_merge`` — the reference's backup-before-write
    WAL discipline (``/root/reference/src/MongoBulkDataMigration.ts:170-173``).
    """
    import time as _time

    _t0 = _time.monotonic()
    key = table.key_col
    data_cols = [f.name for f in table.schema.fields]
    update_set = set(update_cols if update_cols is not None else data_cols)
    scratch = os.path.join(table.root, "_tmp", f"batch-{uuid.uuid4().hex}")
    observations: dict[str, Observation] = {}
    static_metrics: dict[str, int] = {}
    if prestaged is not None:
        # the caller staged every batch's prepared source in ONE upfront
        # write (replay prestage path) — this batch is a directory-pruned
        # slice; touched buckets / sizes / counts were computed there, so
        # the per-batch staging job and its observation disappear entirely
        s = spark.read.schema(prestaged["schema"]).parquet(prestaged["path"])
        carry_cols = [
            c for c in (carry_cols or [])
            if f"__c_{c}" in prestaged["schema"].fieldNames()
        ]
        touched = sorted(prestaged["touched"])
        staged_bytes = int(prestaged["staged_bytes"])
        static_metrics = dict(prestaged.get("static_metrics") or {})
    else:
        carry_cols = [c for c in (carry_cols or []) if c in src.columns]
        if not bypass_validation:
            check_source_types(table, src)

        # Stage the prepared source to parquet scratch: the (possibly
        # expensive) upstream lineage — last-wins aggregation, event decoding
        # — is paid exactly once; every downstream consumer (touched-bucket
        # discovery, the broadcast build per action, insert anti join) reads
        # clean columnar files with pruning instead of re-executing the plan.
        staged = _prep_source(table, src, carry_cols)
        o_src = Observation("merge-src")
        observations["source"] = o_src
        # the staging write doubles as the touched-bucket discovery and the
        # source-count job: zero extra actions
        staged_obs = staged.observe(
            o_src,
            F.collect_set(F.col(BUCKET_COL)).alias("touched_buckets"),
            F.count(F.lit(1)).alias("n_source_keys"),
            _cnt(F.col(OP_COL).isin("put", "insert")).alias("n_src_upserts"),
        )
        staged_obs.write.mode("overwrite").option("compression", "uncompressed").parquet(
            os.path.join(scratch, "src")
        )
        s = spark.read.schema(staged.schema).parquet(os.path.join(scratch, "src"))

        src_stats = o_src.get
        touched = sorted(src_stats.get("touched_buckets") or [])

        # strategy auto-selection from MEASURED size, not a guess: the staged
        # uncompressed-parquet footprint of the prepared batch decides whether
        # the source side is safe to broadcast. At 100 TB / events_per_batch
        # in the millions, an unconditional broadcast of the batch is the one
        # true scale-killer in this path — large batches take the full-outer
        # sort-merge join instead (AQE handles skewed partitions there).
        staged_bytes = _dir_bytes(os.path.join(scratch, "src"))
        static_metrics["n_source_keys"] = int(src_stats.get("n_source_keys") or 0)
    if strategy == "auto":
        n_keys = int(static_metrics.get("n_source_keys") or 0)
        if staged_bytes * BCAST_EXPANSION <= broadcast_threshold_bytes:
            strategy = "broadcast"
        elif n_keys and n_keys <= SEMI_MAX_KEYS:
            strategy = "semi"
        else:
            strategy = "shuffle"

    if not touched:
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
            strategy=strategy,
            staged_bytes=staged_bytes,
            observations=observations,
            source=s,
            scratch_dir=scratch,
            static_metrics=static_metrics,
        )
    tgt = table.read(spark, buckets=touched)

    op = F.col(OP_COL)

    def merged_value(c: str, matched) -> Column:
        """Post-merge value of column c.  'update'-op values may be computed
        from BOTH sides via ``value_exprs`` (e.g. a token transform applied
        to the matched target row) — this keeps CDC updates in-join."""
        src_c = F.col(f"__s_{c}")
        upd_c = value_exprs.get(c, src_c) if value_exprs else src_c
        return (
            F.when(matched & (op == "put"), src_c)
            .when(matched & (op == "update") & F.lit(c in update_set), upd_c)
            .when(op.isNotNull() & ~matched, src_c)  # full-outer inserts
            .otherwise(F.col(c))
        )

    def src_row(frame: DataFrame) -> DataFrame:
        return frame.select(
            *[
                F.col(_SKEY).alias(key) if c == key else F.col(f"__s_{c}").alias(c)
                for c in data_cols
            ]
        )

    if strategy == "broadcast":
        # INNER join: combined materializes ONLY source-affected rows (batch-
        # bounded, not table-bounded).  Untouched rows never pass through a
        # join output — they flow scan -> write below, which is what keeps
        # the per-batch working set proportional to the batch at 100 TB.
        joined = tgt.join(F.broadcast(s), F.col(key) == F.col(_SKEY), "inner")
        matched = F.lit(True)
    elif strategy == "semi":
        # Key-broadcast pre-filter (guide §3.2/§8: decide with small rows,
        # move big rows once): the batch's KEY SET is broadcast (tiny even
        # when the payload is far past any broadcast threshold), the target
        # side is semi-filtered to the touched rows BEFORE any exchange, and
        # the full-outer payload join then shuffles O(batch) bytes from each
        # side instead of the whole touched-bucket scan.  Untouched rows
        # flow scan -> anti(bcast keys) -> write, never through a shuffle.
        skeys = s.select(_SKEY)
        touched_tgt = tgt.join(
            F.broadcast(skeys), F.col(key) == F.col(_SKEY), "left_semi"
        )
        joined = touched_tgt.join(s, F.col(key) == F.col(_SKEY), "full_outer")
        matched = F.col(key).isNotNull() & F.col(_SKEY).isNotNull()
    elif strategy == "shuffle":
        joined = tgt.join(s, F.col(key) == F.col(_SKEY), "full_outer")
        matched = F.col(key).isNotNull() & F.col(_SKEY).isNotNull()
    else:
        raise ValueError(f"unknown merge strategy: {strategy}")

    if with_observation and materialize_combined:
        # materialized mode: the combined WRITE is the first action and
        # always executes the full join — attach the metrics there
        o = Observation("merge-matched")
        observations["matched"] = o
        joined = joined.observe(
            o,
            _cnt(matched & op.isNotNull()).alias("n_matched"),
            _cnt(matched & op.isin("put", "update")).alias("n_modified"),
            _cnt(matched & (op == "delete")).alias("n_removed"),
            _cnt(matched & (op == "insert")).alias("n_insert_skipped"),
            _cnt(matched & (op == "put")).alias("n_put_matched"),
        )

    # The single-pass projection: key, op, pre-image AND merged value per
    # col.  Materialized to parquet scratch, not the in-memory cache: every
    # consumer (changelog: pre cols; merge: new cols; key set: key+op) then
    # reads a column-pruned slice instead of decoding cached nested rows —
    # array-heavy columns through InMemoryRelation are a known slow path.
    #
    # Write-volume discipline (matters most for the shuffle strategy, whose
    # full-outer join also carries every UNtouched row of the touched
    # buckets): pre-image columns are nulled for op-NULL carryover rows and
    # merged-value columns for delete rows — neither slice is ever read
    # downstream (pre consumers filter op IS NOT NULL; result/delta filter
    # deletes out), and parquet encodes the nulls as RLE definition levels,
    # so carryover rows cost ~1x row width instead of 2x.  At a 100 TB /
    # low-touch-fraction batch that halves the dominant scratch write.
    combined_plan = joined.select(
        F.coalesce(F.col(key), F.col(_SKEY)).alias(key),
        F.col(OP_COL),
        matched.alias("__matched"),
        *[
            F.when(op.isNotNull(), F.col(c)).alias(f"__pre_{c}")
            for c in data_cols
            if c != key
        ],
        *[
            F.when(~op.eqNullSafe("delete"), merged_value(c, matched)).alias(f"__new_{c}")
            for c in data_cols
            if c != key
        ],
        *[F.col(f"__c_{c}").alias(f"__{c}") for c in carry_cols],
    )
    static_metrics["plan_expr_ms"] = int((_time.monotonic() - _t0) * 1000)
    if materialize_combined:
        # Materialized mode: one serial join job, every consumer reads the
        # scratch files.  Right when consumers run SERIALLY (the pre-r5
        # engine path) or re-read the slice many times (metrics fallbacks).
        _t1 = _time.monotonic()
        combined_plan.write.mode("overwrite").option(
            "compression", "uncompressed"
        ).parquet(os.path.join(scratch, "combined"))
        static_metrics["combined_write_ms"] = int((_time.monotonic() - _t1) * 1000)
        combined = spark.read.schema(combined_plan.schema).parquet(
            os.path.join(scratch, "combined")
        )
    else:
        # Recompute mode (replay hot path, guide §1.2/§2.4): the changelog
        # and merge-stage consumers run CONCURRENTLY (pipelined commit), so
        # re-executing the join inside each consumer's job costs no extra
        # wall while the serial "write combined + read it back" job — the
        # bulk of the measured per-batch plan_s — disappears.  Each consumer
        # column-prunes through this projection (changelog: __pre_*;
        # merge: __new_*), so the token-transform expressions still run
        # exactly once, in the merge job.
        combined = combined_plan

    pre_cols = lambda frame: frame.select(  # noqa: E731
        F.col(key),
        F.col(OP_COL),
        F.col("__matched"),
        *[F.col(f"__pre_{c}") for c in data_cols if c != key],
        *[F.col(f"__{c}") for c in carry_cols],
    )

    def new_rows(frame: DataFrame) -> DataFrame:
        return frame.select(
            F.col(key), *[F.col(f"__new_{c}").alias(c) for c in data_cols if c != key]
        )

    if strategy == "broadcast":
        # untouched rows: second scan, anti-joined against the broadcast key
        # set — stays bucket-aligned (no shuffle of the carried-over data)
        untouched = tgt.join(
            F.broadcast(s.select(_SKEY)), F.col(key) == F.col(_SKEY), "left_anti"
        ).withColumn(BUCKET_COL, bucket_expr(key, table.num_buckets))
        changed_kept = new_rows(combined.where(op != "delete"))
        # matched keys are batch-bounded -> broadcast the anti join for inserts
        matched_keys = combined.select(F.col(key).alias(_SKEY))
        unmatched_src = s.join(F.broadcast(matched_keys), _SKEY, "left_anti")
        inserts_src = unmatched_src.where(op.isin("put", "insert"))
        # the changed/inserted slice is small: repartition it by bucket so
        # every write task holds few buckets (bounded file count)
        changed = (
            changed_kept.unionByName(src_row(inserts_src))
            .withColumn(BUCKET_COL, bucket_expr(key, table.num_buckets))
            .repartition(BUCKET_COL)
        )
        result = untouched.unionByName(changed)
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
        preimage = pre_cols(combined.where(op.isNotNull())).unionByName(pre_unmatched)
        inserts_frame = inserts_src
        delta_live = new_rows(combined.where(op.isin("put", "update"))).unionByName(
            src_row(inserts_src)
        )
        delta_dels = combined.where(op == "delete").select(key)
    elif strategy == "semi":
        # every combined row carries an op (the semi pre-filter removed the
        # carryover rows the plain full-outer would drag through): matched
        # rows, plus unmatched SOURCE rows (inserts).  One joined frame
        # serves preimage, result, delta and metrics — no second broadcast
        # build, no matched-key collect.
        untouched = tgt.join(
            F.broadcast(s.select(_SKEY)), F.col(key) == F.col(_SKEY), "left_anti"
        ).withColumn(BUCKET_COL, bucket_expr(key, table.num_buckets))
        keep = (F.col("__matched") & (op != "delete")) | (
            ~F.col("__matched") & op.isin("put", "insert")
        )
        changed = (
            new_rows(combined.where(keep))
            .withColumn(BUCKET_COL, bucket_expr(key, table.num_buckets))
            .repartition(BUCKET_COL)
        )
        result = untouched.unionByName(changed)
        inserts_frame = combined.where(~F.col("__matched") & op.isin("put", "insert"))
        # NB: matched 'insert' (insert-if-absent no-op) stays in `result`
        # (COW rewrites its bucket) but must NOT emit a delta row — a
        # same-value layer row would surface as a spurious change in the
        # changefeed diff (cdc_ivm / stream_changefeed contract).
        delta_live = new_rows(
            combined.where(
                (F.col("__matched") & op.isin("put", "update"))
                | (~F.col("__matched") & op.isin("put", "insert"))
            )
        )
        delta_dels = combined.where(F.col("__matched") & (op == "delete")).select(key)
        preimage = pre_cols(combined).select(
            key,
            OP_COL,
            "__matched",
            *[
                F.when(F.col("__matched"), F.col(f"__pre_{c}")).otherwise(F.lit(None)).alias(f"__pre_{c}")
                for c in data_cols
                if c != key
            ],
            *[F.col(f"__{c}") for c in carry_cols],
        )
    else:
        inserts_frame = combined.where(~F.col("__matched") & op.isin("put", "insert"))
        keep = (
            op.isNull()
            | (F.col("__matched") & (op != "delete"))
            | (~F.col("__matched") & op.isin("put", "insert"))
        )
        result = new_rows(combined.where(keep))
        delta_live = new_rows(
            combined.where(
                (F.col("__matched") & op.isin("put", "update"))
                | (~F.col("__matched") & op.isin("put", "insert"))
            )
        )
        delta_dels = combined.where(F.col("__matched") & (op == "delete")).select(key)
        preimage = pre_cols(combined.where(op.isNotNull())).select(
            key,
            OP_COL,
            "__matched",
            *[
                F.when(F.col("__matched"), F.col(f"__pre_{c}")).otherwise(F.lit(None)).alias(f"__pre_{c}")
                for c in data_cols
                if c != key
            ],
            *[F.col(f"__{c}") for c in carry_cols],
        )

    if with_observation and not materialize_combined:
        # recompute mode: an Observation is delivered by the FIRST query that
        # executes its node, and AQE's empty-relation propagation can
        # ELIMINATE the node from a consumer whose slice is adaptively empty
        # (e.g. the merge job of a pure-delete batch), poisoning the metrics
        # with an empty row.  The preimage covers every source-op row and the
        # changelog append always executes it in full, so attach there.
        o = Observation("merge-matched")
        observations["matched"] = o
        pm = F.col("__matched")
        pop = F.col(OP_COL)
        preimage = preimage.observe(
            o,
            _cnt(pm & pop.isNotNull()).alias("n_matched"),
            _cnt(pm & pop.isin("put", "update")).alias("n_modified"),
            _cnt(pm & (pop == "delete")).alias("n_removed"),
            _cnt(pm & (pop == "insert")).alias("n_insert_skipped"),
            _cnt(pm & (pop == "put")).alias("n_put_matched"),
        )

    # merge-on-read layer: changed/inserted rows live, matched deletes as
    # key-only tombstones (consumed only when run_merge dispatches to MoR)
    tomb = delta_dels.select(
        F.col(key),
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in table.schema.fields
            if f.name != key
        ],
    ).withColumn(DELETED_COL, F.lit(True))
    delta = delta_live.withColumn(DELETED_COL, F.lit(False)).unionByName(tomb)

    return MergePlan(
        result=result,
        preimage=preimage,
        touched=touched,
        strategy=strategy,
        staged_bytes=staged_bytes,
        delta=delta,
        observations=observations,
        source=s,
        combined=combined,
        inserts_frame=inserts_frame,
        scratch_dir=scratch,
        result_prepartitioned=(strategy in ("broadcast", "semi")),
        static_metrics=static_metrics,
    )


def run_merge(
    table: LakeTable,
    plan: MergePlan,
    operation: str = "merge",
    applied: dict | None = None,
    properties: dict | None = None,
    mode: str | None = None,
) -> int:
    """Commit the merge atomically (single snapshot swap).

    ``mode`` (or the table property ``merge_mode``) picks the commit shape:

    - ``cow`` (default): overwrite the touched buckets with ``plan.result``
      — read-optimal, write amplification O(touched bucket bytes);
    - ``mor``: append ``plan.delta`` (new rows + tombstones) as one delta
      layer — write amplification O(batch), read resolves layers last-wins
      until ``compact()`` folds them. The right trade when batches touch
      most buckets (uniformly keyed CDC at 10^10-event scale).
    """
    pending = stage_merge(table, plan, operation=operation, mode=mode)
    return commit_merge(
        table, plan, pending, applied=applied, properties=properties,
        operation=operation,
    )


def stage_merge(
    table: LakeTable,
    plan: MergePlan,
    operation: str = "merge",
    mode: str | None = None,
):
    """Run the merge's Spark file writes WITHOUT committing the manifest.

    Returns an opaque pending handle for :func:`commit_merge` (``None`` for
    an empty batch — nothing staged).  The staged files are invisible until
    commit, so a caller can overlap this — the expensive partition-parallel
    phase — with work that must be durable BEFORE the merge becomes visible
    (the replayer runs the changelog append concurrently and serializes only
    the two manifest commits, preserving the backup-before-write WAL order
    of ``reference/src/MongoBulkDataMigration.ts:170-173``)."""
    if not plan.touched:
        return None
    mode = mode or table.snapshot().properties.get("merge_mode", "cow")
    if mode == "mor":
        pending = table.stage_append_deltas(plan.delta, plan.touched, operation=operation)
    else:
        pending = table.stage_overwrite_buckets(
            plan.result,
            plan.touched,
            operation=operation,
            repartition=not plan.result_prepartitioned,
        )
    pending.merge_mode = mode
    return pending


def commit_merge(
    table: LakeTable,
    plan: MergePlan,
    pending,
    applied: dict | None = None,
    properties: dict | None = None,
    operation: str = "merge",
    async_compact_box: dict | None = None,
) -> int:
    """Atomically publish a staged merge (manifest flip + markers)."""
    if pending is None:
        return table.commit_marker(applied or {}, operation=operation, properties=properties)
    ver = pending.commit(applied=applied, properties=properties)
    # auto-compaction cadence (VERDICT r3 #8): a long MoR replay grows a
    # delta layer per batch and read amplification with it; fold the
    # layers whenever their count exceeds the table's cadence property
    # (`auto_compact_layers`, default 8; 0 disables).  The compact is its
    # own commit AFTER the batch's atomic marker commit, so crash
    # semantics are untouched — a lost compaction is re-triggered by the
    # next batch, and the changefeed diffs a pure compaction to zero.
    #
    # With ``async_compact_box`` (VERDICT r5 #5) the fold runs on a driver
    # thread OVERLAPPED with the caller's next batch instead of serially
    # inside the loop: the compaction commit commutes with the next batch's
    # delta append (preserve_concurrent_adds rebase), and a lost
    # non-commuting race just leaves the fold for the next trigger.
    if getattr(pending, "merge_mode", None) == "mor":
        k = int(table.snapshot().properties.get("auto_compact_layers", 8) or 0)
        if k and table.delta_layers() > k:
            if async_compact_box is None:
                table.compact(plan.delta.sparkSession)
            else:
                from pyspark import InheritableThread

                from ..sources.laketable import CommitConflictError

                spark = plan.delta.sparkSession

                def _compact() -> None:
                    try:
                        spark.sparkContext.setJobDescription("mor auto-compact (async)")
                        table.compact(spark)
                    except CommitConflictError as e:
                        # lost a non-commuting race: the layer count still
                        # exceeds the cadence, so the next commit re-triggers
                        import logging

                        logging.getLogger("mbdm-spark").info(
                            "async compaction yielded to a concurrent commit: %s", e
                        )
                    except BaseException as e:  # surfaced at the next join
                        async_compact_box["error"] = e

                prev = async_compact_box.get("thread")
                if prev is not None:
                    prev.join()  # never two folds in flight
                if "error" in async_compact_box:
                    raise async_compact_box.pop("error")
                th = InheritableThread(target=_compact, daemon=True)
                th.start()
                async_compact_box["thread"] = th
    return ver
