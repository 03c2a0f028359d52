"""Oplog-style change-stream replay: micro-batched, checkpointed, exactly-once.

The reference's batch cursor loop (``/root/reference/src/MongoBulkDataMigration.ts:160-201``:
accumulate <= maxBulkSize, backup bulk, migration bulk, progress, throttle) is
re-expressed as a deterministic micro-batch replay over a ``seq``-ordered
event log (the CDC generalization its resume contract already implies,
SURVEY.md §2.9-2.10):

per batch (seq range, stable across crashes):
  1. HWM filter        where(seq > hwm[part])            [R1]
  2. last-wins collapse one event per key                 [§2.5]
  3. changelog append  pre-images, first-write-wins       [S5, B2: BEFORE merge]
  4. MERGE commit      + atomic `applied` batch marker    [S4, J2]
  5. HWM advance       per-partition max seq              [R1]
  6. metrics emit      lineage + throughput row           [A4, B6]

Exactly-once: steps 3 and 4 are idempotent (markers committed atomically with
their data); step 5 lags them. A crash between any two steps replays the
batch; markers turn the replay into no-ops, so effective state is applied
once — the analog of the reference's `$setOnInsert` + safe-to-run-twice
contract (``BackupBulk.ts:17-26``, ``README.md:21``).

Transforms are evaluated INSIDE the merge join (one target scan, JVM-side
expressions): an `update` event's new token array is computed from the
matched target row + the event payload, never via a second pass.

Schema evolution: events carrying a non-null column the target lacks trigger
an online ``add_columns`` (nullable, no file rewrite) before the batch merge.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..functions.tokens import parse_transform, transform_expr
from ..operators.dedup import last_wins
from ..operators.merge import OP_COL, build_merge_plan, commit_merge, stage_merge
from ..plans.changelog import Changelog
from ..plans.engine import MongoBulkDataMigrationSpark
from ..plans.obsutil import observed
from ..plans.hwm import HwmStore
from ..plans.metrics import MetricsSink
from ..plans.migration import DataMigrationConfig, MigrationOptions
from ..sources.catalog import Catalog
from ..sources.laketable import LakeTable, is_widening

log = logging.getLogger("mbdm-spark")

# event columns that $set scalar target columns when non-null
SCALAR_SET_COLS = ("source", "extra")

# the named-transform DSL grammar (functions/tokens.py)
VALID_TRANSFORM_RE = r"^(append_eos|set_tokens|(drop_first_k|remap_mod|truncate):[0-9]+)$"


def _valid_event_expr():
    """B5 validity predicate: which change events are well-formed enough to
    apply (`AbstractBulkOperationResults.ts:60-73`).  NULL-safe comparisons
    throughout: a delete event carries NULL transform and NULL tokens, and
    ``~(col == lit)`` is NULL (not true) for NULL input — with plain equality
    such rows satisfied NEITHER where(valid) NOR where(~valid) and silently
    vanished from the batch (caught by the `dead_letter` driver oracle, r3).
    """
    return (
        F.col("op").isin("insert", "update", "delete")
        & (~F.col("op").eqNullSafe("insert") | F.col("tokens").isNotNull())
        & (
            F.col("transform").isNull()
            | F.col("transform").rlike(VALID_TRANSFORM_RE)
        )
        & (~F.col("transform").eqNullSafe("set_tokens") | F.col("tokens").isNotNull())
    )


class ChangeStreamReplayer:
    """Applies an insert/update/delete event stream to a LakeTable."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        table_name: str,
        migration_id: str,
        options: MigrationOptions | None = None,
        evolve_schema: bool = True,
    ):
        self.spark = spark
        self.catalog = Catalog(warehouse)
        self.config = DataMigrationConfig(
            warehouse=warehouse,
            collection_name=table_name,
            id=migration_id,
            options=options or MigrationOptions(),
        )
        self.evolve_schema = evolve_schema
        self.engine = MongoBulkDataMigrationSpark(spark, self.config)
        self.hwm = HwmStore(warehouse, migration_id)
        self.metrics = MetricsSink(warehouse, migration_id)

    # ------------------------------------------------------------------

    def apply_changes(
        self,
        events: DataFrame,
        events_per_batch: int = 5000,
        max_batches: int | None = None,
        crash_after: tuple[int, str] | None = None,  # fault injection for tests
    ) -> list[dict[str, Any]]:
        """Replay ``events`` (schema per FIXTURES.md T2) in seq-range batches.

        Batch boundaries are ``batch_id = seq // events_per_batch`` — a pure
        function of the data, so a resumed run re-derives identical batches
        (the crash-safety anchor; the reference's batch split is likewise
        deterministic, pinned as [30,30,30,10] in `update.test.ts:228-277`).
        """
        import shutil
        import uuid

        from pyspark.sql import Observation

        target = self.catalog.load_table(self.config.collection_name)
        pending_plan = self.hwm.filter_events(self.spark, events)
        root = os.path.join(
            self.config.warehouse, "_tmp", f"replay-{uuid.uuid4().hex}"
        )
        try:
            if self.config.options.stage_pending:
                # Stage the HWM-filtered stream to parquet scratch ONCE: for
                # an EXPENSIVE upstream lineage (multi-way joins, decode UDFs)
                # this pays it a single time, and every later pass is a
                # column-pruned scan with row-group min/max skipping.  NOT
                # `.persist()` — InMemoryRelation is a slow scan path for
                # array-heavy event payloads.  Bounds ride the staging write
                # via an Observation (no separate agg job).
                scratch = os.path.join(root, "pending")
                o_bounds = Observation("replay-bounds")
                pending_plan.observe(
                    o_bounds, F.min("seq").alias("lo"), F.max("seq").alias("hi")
                ).write.mode("overwrite").option(
                    "compression", "uncompressed"
                ).parquet(scratch)
                # eliminated observe node <=> statically empty input; real
                # failures propagate (obsutil narrows the catch)
                bounds = observed(o_bounds)
                if bounds.get("lo") is None:
                    return []
                pending = self.spark.read.schema(pending_plan.schema).parquet(scratch)
            else:
                # Direct mode (default): skip the full-width pending scratch
                # — at 10^7-event windows it writes AND re-reads the entire
                # token payload once each before any real work.  The extra
                # passes the scratch used to serve become column-pruned
                # re-scans of the upstream instead (lineage agg reads
                # (seq, part); the replay-of-applied path reads 2 columns),
                # which Catalyst prunes at the source — cheap for file-backed
                # or generated events.  Correctness is unchanged: every pass
                # is a deterministic function of (events, HWM), the same
                # property crash-resume already requires.  Batch bounds come
                # from the prestage lineage aggregation (no bounds job).
                pending = pending_plan
            # prestage path: collapse + prepare EVERY batch's merge source in
            # one partitioned write and fold all per-batch stats jobs
            # (lineage collect, staging observation, touched-bucket
            # discovery) into two whole-window aggregations — the per-batch
            # serial floor drops by ~1/3.  Dead-letter mode (B5) rides the
            # same path since round 4: the validity split happens inside the
            # prestage (one partitioned dead-letter write for the whole
            # window; per-batch dead counts fold into the lineage agg).
            if self.evolve_schema:
                # payload-drift evolution hoisted to the window start:
                # all drift is visible in `pending`, and add/widen are
                # metadata-only — same final schema as per-batch checks
                self._maybe_evolve(target, pending)
            pre_batches = self._prestage(
                target, pending, events_per_batch, os.path.join(root, "staged")
            )
            if not pre_batches:
                return []
            # invariant plan inputs hoisted out of the batch loop (the
            # schema is fixed for the window once evolution ran above):
            # Column expression trees are immutable and reusable, so the
            # py4j construction cost is paid once per window, not per batch
            plan_exprs = (self._update_cols(target), self._value_exprs(target))
            # one Changelog per window: its batch-invariant expression trees
            # (backup struct / record array) are memoized on the instance,
            # so only batch-id-dependent literals are rebuilt per batch
            cl = Changelog(
                self.catalog, self.config.rollback_table_name, target,
                self.config.id,
            )
            # MoR auto-compaction runs on a driver thread overlapped with
            # the NEXT batch (VERDICT r5 #5); joined before window exit
            compact_box: dict[str, Any] = {}
            # lineage agg == exact per-batch event presence, so the batch
            # range derived from it matches the old bounds observation
            first_b, last_b = min(pre_batches), max(pre_batches)
            out: list[dict[str, Any]] = []
            for i, b in enumerate(range(first_b, last_b + 1)):
                if max_batches is not None and i >= max_batches:
                    break
                lo, hi = b * events_per_batch, (b + 1) * events_per_batch - 1
                batch = pending.where((F.col("seq") >= lo) & (F.col("seq") <= hi))
                if b not in pre_batches:
                    continue  # empty seq range (gap below the HWM)
                m = self._apply_batch(
                    target, batch, b, crash_after, pre=pre_batches[b],
                    plan_exprs=plan_exprs, compact_box=compact_box, cl=cl,
                )
                if m is not None:
                    out.append(m)
                if self.config.options.throttle_ms:
                    time.sleep(self.config.options.throttle_ms / 1000.0)
            th = compact_box.get("thread")
            if th is not None:
                th.join()  # no dangling fold past the window
            if "error" in compact_box:
                raise compact_box["error"]
            return out
        finally:
            shutil.rmtree(root, ignore_errors=True)

    # ------------------------------------------------------------------

    def _prestage(
        self,
        target: LakeTable,
        pending: DataFrame,
        events_per_batch: int,
        out_dir: str,
        forced_batch: int | None = None,
    ) -> dict[int, dict[str, Any]]:
        """Collapse + prepare EVERY batch's merge source in one partitioned
        write (``__batch=<id>/`` directories), then fold all per-batch stats
        into two whole-window aggregations:

        1. staged stats (per batch): source-key / upsert counts + touched
           buckets — replaces the per-batch staging Observation;
        2. raw lineage (per batch, part): event count + max seq — replaces
           the per-batch lineage collect, and is EXACT (the collapsed max
           could only lag it when a key's events span parts).

        Dead-letter mode (B5, ``continue_on_bulk_write_error``): malformed
        events are split out BEFORE the collapse (a valid earlier event must
        not be shadowed by a malformed later one — same order as the old
        per-batch path), written once for the whole window as a
        ``__batch``-partitioned parquet under the dead-letter root (dynamic
        partition overwrite keeps earlier windows' batches intact on
        resume), and per-batch dead counts ride the lineage aggregation —
        zero extra per-batch jobs.  A batch whose events are ALL malformed
        gets ``path=None``: no merge source, but its lineage row still
        advances the HWM (livelock guard, ADVICE r2).

        Staging is pure scratch, so crash semantics are unchanged: a resumed
        run re-stages from its own HWM-filtered pending set.
        """
        from ..operators.merge import _dir_bytes, _prep_source, check_source_types
        from ..sources.laketable import BUCKET_COL

        sc = self.spark.sparkContext
        opts = self.config.options
        epb = max(int(events_per_batch), 1)
        # forced_batch: streaming epochs are batch-identified by the stream's
        # epoch id, not by a seq range — the whole frame IS one batch
        batch_expr = (
            F.lit(int(forced_batch)).cast("long")
            if forced_batch is not None else F.expr(f"seq DIV {epb}")
        )
        sc.setJobDescription("cdc prestage: collapse+stage all batches")
        with_b = pending.withColumn("__batch", batch_expr)
        valid = _valid_event_expr() if opts.continue_on_bulk_write_error else None
        live = with_b.where(valid) if valid is not None else with_b
        collapsed = last_wins(
            live,
            key=target.key_col,
            order="seq",
            n_salt=opts.dedup_salt,
            extra_group=("__batch",),
        )
        src = self._map_ops(collapsed)
        if not opts.bypass_validation:
            check_source_types(target, src)
        carry = [c for c in ("seq", "transform", "part") if c in src.columns]
        prepped = _prep_source(target, src, carry).withColumn(
            "__batch",
            F.lit(int(forced_batch)).cast("long")
            if forced_batch is not None else F.expr(f"__c_seq DIV {epb}"),
        )
        # The raw-lineage aggregation reads only (seq, part) of the PENDING
        # stream — independent of the staging write — so it runs on a driver
        # thread OVERLAPPED with the write (guide §2.6: overlap independent
        # jobs); the staged-stats aggregation needs the written files and
        # runs on the main thread right after.
        lineage_aggs = [F.count(F.lit(1)).alias("n"), F.max("seq").alias("max_seq")]
        if valid is not None:
            lineage_aggs.append(
                F.sum(F.when(valid, 0).otherwise(1)).alias("n_dead")
            )
        lrows_q = pending.groupBy(
            batch_expr.alias("__batch"), F.col("part")
        ).agg(*lineage_aggs)

        from pyspark import InheritableThread

        box: dict[str, Any] = {}

        def _collect_lineage() -> None:
            try:
                sc.setJobDescription("cdc prestage: per-batch lineage")
                box["lrows"] = lrows_q.collect()
            except BaseException as e:
                box["error"] = e

        th_lineage = InheritableThread(target=_collect_lineage, daemon=True)
        th_lineage.start()
        try:
            prepped.write.partitionBy("__batch").mode("overwrite").option(
                "compression", "uncompressed"
            ).parquet(out_dir)
            batch_schema = T.StructType(
                [f for f in prepped.schema.fields if f.name != "__batch"]
            )
            sc.setJobDescription("cdc prestage: per-batch stats")
            staged_all = self.spark.read.schema(prepped.schema).parquet(out_dir)
            srows = staged_all.groupBy("__batch").agg(
                F.count(F.lit(1)).alias("n_source_keys"),
                F.sum(
                    F.when(F.col(OP_COL).isin("put", "insert"), 1).otherwise(0)
                ).alias("n_src_upserts"),
                F.collect_set(F.col(BUCKET_COL)).alias("touched"),
            ).collect()
        finally:
            th_lineage.join()
        if "error" in box:
            raise box["error"]
        lrows = box["lrows"]
        if valid is not None and any(int(r["n_dead"]) for r in lrows):
            # one partitioned write for the whole window; dynamic partition
            # overwrite keeps dead-letter batches from earlier windows, and
            # per-batch re-runs after a crash overwrite only their own dir
            dl_root = os.path.join(
                self.config.warehouse, "_state", f"deadletter_{self.config.id}"
            )
            sc.setJobDescription("cdc prestage: dead-letter write")
            with_b.where(~valid).withColumn(
                "__reason", F.lit("malformed-event")
            ).write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy("__batch").parquet(dl_root)
            log.warning(
                "%s malformed events dead-lettered to %s",
                sum(int(r["n_dead"]) for r in lrows), dl_root,
            )
        sc.setJobDescription(None)
        stats: dict[int, dict[str, Any]] = {}
        for r in lrows:
            b = int(r["__batch"])
            st = stats.setdefault(b, {
                "path": None,  # set below iff the batch staged any rows
                "schema": batch_schema,
                "touched": [],
                "staged_bytes": 0,
                "static_metrics": {"n_source_keys": 0, "n_src_upserts": 0},
                "part_hwm": {},
                "n_events": 0,
                "n_dead": 0,
            })
            st["part_hwm"][int(r["part"])] = int(r["max_seq"])
            st["n_events"] += int(r["n"])
            if valid is not None:
                st["n_dead"] += int(r["n_dead"])
        for r in srows:
            st = stats.get(int(r["__batch"]))
            if st is None:
                continue  # unreachable: staged rows derive from pending
            bdir = os.path.join(out_dir, f"__batch={int(r['__batch'])}")
            st.update(
                path=bdir,
                touched=sorted(int(x) for x in (r["touched"] or [])),
                staged_bytes=_dir_bytes(bdir),
                static_metrics={
                    "n_source_keys": int(r["n_source_keys"]),
                    "n_src_upserts": int(r["n_src_upserts"]),
                },
            )
        return stats

    def apply_epoch(self, batch_df: DataFrame, epoch_id: int) -> dict[str, Any] | None:
        """One stream epoch == one engine batch (the ``foreachBatch`` bridge
        used by :class:`.structured.StreamingIngest`).  The epoch rides the
        SAME prestage as seq-range replay — identical job-count floor and
        dead-letter semantics — with the stream's epoch id as the batch id,
        so Structured Streaming's replay-after-crash hits the engine's
        applied-marker no-op exactly like a seq-range re-run."""
        import shutil
        import uuid

        target = self.catalog.load_table(self.config.collection_name)
        if self.evolve_schema:
            self._maybe_evolve(target, batch_df)
        root = os.path.join(
            self.config.warehouse, "_tmp", f"epoch-{uuid.uuid4().hex}"
        )
        try:
            stats = self._prestage(
                target, batch_df, 1, os.path.join(root, "staged"),
                forced_batch=int(epoch_id),
            )
            pre = stats.get(int(epoch_id))
            if pre is None:
                return None  # empty epoch
            return self._apply_batch(target, batch_df, int(epoch_id), pre=pre)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def _apply_batch(
        self,
        target: LakeTable,
        batch: DataFrame,
        batch_id: int,
        crash_after: tuple[int, str] | None = None,
        pre: dict[str, Any] | None = None,
        plan_exprs: tuple | None = None,
        compact_box: dict[str, Any] | None = None,
        cl: Changelog | None = None,
    ) -> dict[str, Any] | None:
        t0 = time.monotonic()
        cfg = self.config

        marker = target.applied_marker(cfg.id)
        already_applied = marker is not None and marker.get("batch_id", -1) >= batch_id

        if already_applied:
            # rare replay-of-applied path (crash after merge, before HWM):
            # lineage from the raw batch — one pruned 2-column scan
            part_rows = batch.groupBy("part").agg(
                F.max("seq").alias("max_seq"), F.count(F.lit(1)).alias("n")
            ).collect()
            if not part_rows:
                return None
            n_events = sum(r["n"] for r in part_rows)
            part_hwm = {int(r["part"]): int(r["max_seq"]) for r in part_rows}
            max_seq = max(part_hwm.values())
            if crash_after and crash_after == (batch_id, "merge"):
                raise SimulatedCrash(batch_id, "merge")
            self.hwm.advance(part_hwm, batch_id)
            wall = time.monotonic() - t0
            m = {
                "migration_id": cfg.id,
                "batch_id": batch_id,
                "n_events": int(n_events),
                "n_parts": len(part_hwm),
                "part_hwm": part_hwm,
                "max_seq": max_seq,
                "n_backups": 0,
                "n_dead_lettered": 0,
                "replayed": True,
                "wall_s": round(wall, 4),
                "events_per_sec": round(n_events / wall, 1) if wall > 0 else None,
            }
            self.metrics.emit(m)
            return m

        n_backups = 0
        merge_metrics: dict[str, Any] = {}
        t_plan = t_changelog = t_merge = t_append = 0.0
        sc = self.spark.sparkContext
        # prestaged path (the only path since round 4): evolution hoisted to
        # the window start, source already collapsed/prepared, stats (incl.
        # per-batch dead-letter counts) precomputed — zero per-batch staging
        # or lineage jobs
        if not pre["part_hwm"]:
            return None
        n_dead = int(pre.get("n_dead", 0))
        part_hwm = dict(pre["part_hwm"])
        n_events = int(pre["n_events"])
        if pre["path"] is None:
            # every event in this batch was dead-lettered (B5): nothing to
            # merge, but the HWM must still advance past them — otherwise
            # every later run re-filters and re-dead-letters the same
            # malformed events forever (livelock, ADVICE r2).  The
            # dead-letter write is idempotent (dynamic partition overwrite),
            # so a crash before this advance replays cleanly.
            if crash_after and crash_after == (batch_id, "merge"):
                raise SimulatedCrash(batch_id, "merge")
            self.hwm.advance(part_hwm, batch_id)
            wall = time.monotonic() - t0
            m = {
                "migration_id": cfg.id,
                "batch_id": batch_id,
                "n_events": int(n_events),
                "n_parts": len(part_hwm),
                "part_hwm": part_hwm,
                "max_seq": max(part_hwm.values()),
                "n_backups": 0,
                "n_dead_lettered": int(n_dead),
                "replayed": False,
                "wall_s": round(wall, 4),
                "events_per_sec": round(n_events / wall, 1) if wall > 0 else None,
            }
            self.metrics.emit(m)
            return m
        src = None
        t1 = time.monotonic()
        sc.setJobDescription(f"cdc b{batch_id}: plan+stage")
        if plan_exprs is None:
            plan_exprs = (self._update_cols(target), self._value_exprs(target))
        plan = build_merge_plan(
            target,
            self.spark,
            src,
            update_cols=plan_exprs[0],
            strategy=cfg.options.merge_strategy,
            broadcast_threshold_bytes=cfg.options.broadcast_threshold_bytes,
            carry_cols=["seq", "transform", "part"],
            value_exprs=plan_exprs[1],
            bypass_validation=cfg.options.bypass_validation,
            prestaged=pre,
            # pipelined commit runs the changelog + merge consumers
            # concurrently: recompute beats the serial materialize job
            materialize_combined=False,
        )
        t_plan = time.monotonic() - t1
        max_seq = max(part_hwm.values())
        t_lineage = time.monotonic() - t0 - t_plan
        try:
            if cl is None:  # epoch path / direct callers
                cl = Changelog(
                    self.catalog, cfg.rollback_table_name, target, cfg.id
                )
            start_ver = target.current_version()
            # record the pre-migration version FIRST (idempotent, once per
            # migration, driver-side metadata commit): the staged merge
            # below claims the next version at stage time, so no other
            # target commit may land between stage and commit_merge
            self.engine._record_migration_start(target, start_ver)
            t2 = time.monotonic()
            # Pipelined commit (round 5): the changelog append and the
            # merge's FILE WRITES run concurrently — the WAL discipline
            # (B2, `MongoBulkDataMigration.ts:170-173`) constrains commit
            # VISIBILITY, not file IO: staged merge files are unreferenced
            # by any manifest until commit_merge flips the pointer, which
            # happens strictly after the changelog commit below.  A crash
            # anywhere in between leaves orphan data files and an intact
            # table — replay re-stages them (same version => same dir).
            # This hides ~min(t_changelog, t_merge_write) of the per-batch
            # serial floor, the Amdahl `S` that caps N->4N scaling.
            op_name = f"cdc-{cfg.id}-batch-{batch_id}"
            pend_box: dict[str, Any] = {}

            def _stage_files() -> None:
                _ts = time.monotonic()
                try:
                    sc.setJobDescription(f"cdc b{batch_id}: merge-write")
                    pend_box["pending"] = stage_merge(target, plan, operation=op_name)
                except BaseException as e:  # surfaced after join
                    pend_box["error"] = e
                finally:
                    pend_box["stage_s"] = round(time.monotonic() - _ts, 4)

            th = None
            if cfg.options.pipeline_commit:
                from pyspark import InheritableThread

                th = InheritableThread(target=_stage_files, daemon=True)
                th.start()
            try:
                sc.setJobDescription(f"cdc b{batch_id}: changelog")
                _ta = time.monotonic()
                n_backups = cl.append_batch(
                    self.spark,
                    plan.preimage,
                    batch_id,
                    update_query=f'{{"cdc_batch": {batch_id}}}',
                    # full pre-image by default; a deployment may scope the
                    # backup to a column subset (P1/P2 through the replayer)
                    backup_cols=cfg.options.cdc_backup_cols,
                    bucket_hint=plan.touched,
                )
                t_append = time.monotonic() - _ta
            except BaseException as append_exc:
                if th is not None:
                    th.join()
                # surface BOTH failures (ADVICE r5): the append error wins,
                # the concurrent stage error rides as __cause__
                if pend_box.get("error") is not None:
                    raise append_exc from pend_box["error"]
                raise
            finally:
                if th is not None:
                    th.join()
            # overlapped window: changelog append ∥ merge file write
            t_changelog = time.monotonic() - t2
            if "error" in pend_box:
                raise pend_box["error"]
            if crash_after and crash_after == (batch_id, "changelog"):
                raise SimulatedCrash(batch_id, "changelog")
            t3 = time.monotonic()
            sc.setJobDescription(f"cdc b{batch_id}: merge-commit")
            if th is None:
                pend_box["pending"] = stage_merge(target, plan, operation=op_name)
            commit_merge(
                target,
                plan,
                pend_box["pending"],
                applied={cfg.id: {"batch_id": batch_id, "max_seq": max_seq}},
                properties={"writer": cfg.id},
                operation=op_name,
                async_compact_box=compact_box,
            )
            t_merge = time.monotonic() - t3
            merge_metrics = plan.metrics()
            merge_metrics["strategy"] = plan.strategy
            merge_metrics["staged_bytes"] = plan.staged_bytes
        finally:
            plan.release()

        sc.setJobDescription(None)
        if crash_after and crash_after == (batch_id, "merge"):
            raise SimulatedCrash(batch_id, "merge")
        self.hwm.advance(part_hwm, batch_id)

        wall = time.monotonic() - t0
        m = {
            "migration_id": cfg.id,
            "batch_id": batch_id,
            "n_events": int(n_events),
            "n_parts": len(part_hwm),
            "part_hwm": part_hwm,
            "max_seq": max_seq,
            "n_backups": int(max(n_backups, 0)),
            "n_dead_lettered": int(n_dead),
            "replayed": bool(already_applied),
            "wall_s": round(wall, 4),
            "lineage_s": round(t_lineage, 4),
            "plan_s": round(t_plan, 4),
            "changelog_s": round(t_changelog, 4),
            "append_s": round(t_append, 4),
            "append_detail": getattr(cl, "last_timings", None),
            "stage_s": pend_box.get("stage_s"),
            "merge_s": round(t_merge, 4),
            "events_per_sec": round(n_events / wall, 1) if wall > 0 else None,
            **merge_metrics,
        }
        self.metrics.emit(m)
        return m

    # ------------------------------------------------------------------

    def _maybe_evolve(self, target: LakeTable, batch: DataFrame) -> None:
        """Online schema evolution driven by event payload drift: ADD COLUMN
        for new scalar payload fields, WIDEN COLUMN (int->long etc.) when the
        incoming batch carries a strictly wider type than the table. Both are
        metadata-only manifest commits — no file rewrite."""
        known = {f.name for f in target.schema.fields}
        candidates = [c for c in SCALAR_SET_COLS if c in batch.columns and c not in known]
        for c in candidates:
            if batch.where(F.col(c).isNotNull()).take(1):
                log.info("schema evolution: adding column %s to %s", c, target.root)
                target.add_columns([T.StructField(c, batch.schema[c].dataType, True)])
        for f in target.schema.fields:
            if f.name in batch.columns and is_widening(
                f.dataType, batch.schema[f.name].dataType
            ):
                log.info(
                    "schema evolution: widening %s %s -> %s", f.name,
                    f.dataType.simpleString(), batch.schema[f.name].dataType.simpleString(),
                )
                target.widen_column(f.name, batch.schema[f.name].dataType)

    def _map_ops(self, collapsed: DataFrame) -> DataFrame:
        """Map CDC ops on a collapsed event frame to merge ops."""
        op = (
            F.when(F.col("op") == "insert", F.lit("put"))
            .when(F.col("op") == "delete", F.lit("delete"))
            .otherwise(F.lit("update"))
        )
        src = collapsed.withColumn(OP_COL, op)
        # insert rows: n_tok invariant from the payload
        src = src.withColumn(
            "n_tok",
            F.when(F.col(OP_COL) == "put", F.size("tokens")).cast("int"),
        )
        return src

    def _update_cols(self, target: LakeTable) -> list[str]:
        key = target.key_col
        return [f.name for f in target.schema.fields if f.name != key]

    def _value_exprs(self, target: LakeTable):
        """Column expressions for 'update'-op rows, evaluated inside the
        merge join: target columns by name, source (event) columns as
        __s_<col> / carried columns as __c_<col>."""
        name, arg = parse_transform(F.col("__c_transform"))
        new_tokens = F.when(
            F.col("__c_transform").isNotNull(),
            transform_expr(F.col("tokens"), name, arg, F.col("__s_tokens")),
        ).otherwise(F.col("tokens"))
        exprs = {
            "tokens": new_tokens.cast(target.schema["tokens"].dataType),
            "n_tok": F.size(new_tokens).cast("int"),
        }
        for c in SCALAR_SET_COLS:
            if c in {f.name for f in target.schema.fields}:
                exprs[c] = F.coalesce(F.col(f"__s_{c}"), F.col(c))
        return exprs

    # ------------------------------------------------------------------

    def rollback(self) -> dict[str, Any]:
        return self.engine.rollback()

    def clean(self) -> dict[str, Any]:
        return self.engine.clean()


class SimulatedCrash(RuntimeError):
    """Fault-injection marker (tests kill the run between protocol steps —
    the analog of `update.test.ts:95-139` crash-resume)."""

    def __init__(self, batch_id: int, where: str):
        super().__init__(f"simulated crash after {where} of batch {batch_id}")
        self.batch_id = batch_id
        self.where = where
