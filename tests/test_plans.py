"""Physical-plan contracts: the scale properties the engine is designed
around, pinned so a refactor cannot silently regress them.

Each test asserts on `explain(formatted)` output — the same audit the
100 TB design review does by hand: filters reach the parquet scan, column
pruning holds, small sides broadcast, and no operator funnels through a
single-task global sort.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"

needs_testdata = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF, "lineitem.parquet")),
    reason="driver testdata not present",
)


def formatted(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


@needs_testdata
def test_filter_project_pushdown_and_pruning(spark):
    """S1: predicate pushdown + column pruning reach the parquet scan."""
    import __spark_entry__ as E

    plan = formatted(E.q_filter_project(spark, SF))
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan
    # pruned read: the scan schema must not include unprojected wide columns
    scan_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_schemas and all("l_comment" not in s for s in scan_schemas)


@needs_testdata
def test_lookup_subpipeline_pushdown_and_broadcast(spark):
    """J1 + sub-pipeline: the right_pipeline filter is pushed into the right
    scan, the aggregated right side broadcasts, and the left side is NEVER
    shuffled (no exchange between the left scan and the join)."""
    import __spark_entry__ as E

    plan = formatted(E.q_lookup_pipeline(spark, SF))
    assert "EqualTo(o_orderstatus,O)" in plan
    assert "BroadcastHashJoin" in plan
    # left side feeds the join directly: exactly one (right-side) hash
    # exchange plus the broadcast exchange, nothing repartitioning customer
    tree = plan.split("\n\n")[0]  # the operator tree, before the details
    n_shuffles = tree.count("- Exchange")
    assert n_shuffles == 1, f"expected 1 shuffle (right pre-agg), saw {n_shuffles}\n{tree}"


def test_split_batches_window_is_partitioned(spark, tmp_path):
    """VERDICT r2 #6 contract: batch-boundary ranking must never plan a
    global (SinglePartition) sort — the window is partitioned by the staged
    range-partition id."""
    from pyspark.sql import Window

    scratch = str(tmp_path / "staged")
    (
        spark.range(0, 5000)
        .select(F.format_string("doc%08d", "id").alias("doc_id"))
        .repartitionByRange(4, F.col("doc_id"))
        .sortWithinPartitions("doc_id")
        .withColumn("__pid", F.spark_partition_id())
        .write.parquet(scratch)
    )
    staged = spark.read.parquet(scratch)
    rn = F.row_number().over(Window.partitionBy("__pid").orderBy("doc_id"))
    plan = formatted(staged.withColumn("__rn", rn).where(F.col("__rn") == 1).select("doc_id"))
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_merge_broadcast_path_no_target_shuffle(spark, tmp_path):
    """S4/J2: in broadcast strategy the TARGET side of the merge join must
    not be exchanged — the batch-bounded source broadcasts instead."""
    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.operators.merge import build_merge_plan
    from mongo_bulk_data_migration_spark.sources.fixtures import (
        SEQUENCES_SCHEMA,
        make_sequences,
        sequences_spark,
    )

    wh = str(tmp_path / "wh")
    cat = Catalog(wh)
    t = cat.create_table("seq", SEQUENCES_SCHEMA, num_buckets=4)
    t.append(sequences_spark(spark, 50))
    src = (
        sequences_spark(spark, 10)
        .withColumn("__op", F.lit("put"))
    )
    plan = build_merge_plan(t, spark, src, strategy="broadcast")
    try:
        text = formatted(plan.result)
        assert "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" not in text
        # the carried-over (untouched) rows flow scan -> union -> write with
        # no hashpartitioning exchange on the target scan branch
        assert "SortMergeJoin" not in text
    finally:
        plan.release()


def test_mor_read_broadcasts_small_delta(spark, tmp_path):
    """MoR read contract (VERDICT r2 wart #4): with delta layers measuring
    under MOR_BROADCAST_BYTES, the shadowed-base anti join must broadcast
    the delta key set — never sort-merge-shuffle the (TB-scale at the design
    point) base buckets."""
    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.operators.merge import build_merge_plan, run_merge
    from mongo_bulk_data_migration_spark.sources.fixtures import (
        SEQUENCES_SCHEMA,
        sequences_spark,
    )
    from test_merge import src_df

    wh = str(tmp_path / "wh")
    cat = Catalog(wh)
    t = cat.create_table(
        "seq", SEQUENCES_SCHEMA, num_buckets=4, properties={"merge_mode": "mor"}
    )
    t.append(sequences_spark(spark, 40))
    plan = build_merge_plan(
        t,
        spark,
        src_df(spark, [("doc00000001", "update", [4], 1, None)]),
        update_cols=["tokens", "n_tok"],
    )
    run_merge(t, plan)
    plan.release()
    assert t.delta_layers() == 1

    text = formatted(t.read(spark))
    assert "BroadcastHashJoin" in text and "LeftAnti" in text
    assert "SortMergeJoin" not in text


import pytest


@pytest.mark.parametrize("dead_letter_mode", [False, True])
def test_replay_per_batch_job_count_bounded(spark, tmp_path, dead_letter_mode):
    """Serial-floor contract (round 3): the prestage path must keep the
    per-batch Spark job count bounded — each job carries fixed scheduling/
    planning cost that becomes the Amdahl serial term capping N->4N scaling.
    Budget: ~6 prestage jobs once per window + ~11-13 jobs per batch (plan+
    stage 2, changelog ~5, merge-commit ~4, plus AQE variance).  Round 4:
    dead-letter mode (B5) rides the same prestage path and must meet the
    SAME budget (its validity split is folded into the window-level collapse
    and lineage jobs, not paid per batch)."""
    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.plans.migration import MigrationOptions
    from mongo_bulk_data_migration_spark.sources.fixtures import (
        SEQUENCES_SCHEMA,
        changes_df,
        sequences_df,
    )
    from mongo_bulk_data_migration_spark.streaming.replay import ChangeStreamReplayer

    wh = str(tmp_path / "wh")
    cat = Catalog(wh)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets=8)
    t.append(sequences_df(spark, 500, parallelism=4))
    events = changes_df(spark, 500, 2000, n_parts=4, parallelism=4)
    rep = ChangeStreamReplayer(
        spark, wh, "sequences", "jobcount", evolve_schema=False,
        options=MigrationOptions(
            merge_strategy="broadcast",
            continue_on_bulk_write_error=dead_letter_mode,
        ),
    )
    sc = spark.sparkContext
    group = f"floor-audit-{dead_letter_mode}"  # unique per param: the
    # status tracker accumulates job ids per group across the session
    sc.setJobGroup(group, "per-batch job count contract")
    try:
        ms = rep.apply_changes(events, events_per_batch=500)
    finally:
        sc.setJobGroup(None, None)
    assert len(ms) == 4
    n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    # 4 batches: 6 (prestage) + 4 * 13 = 58; headroom for AQE stage variance
    assert n_jobs <= 70, f"per-batch job count regressed: {n_jobs} jobs for 4 batches"


def test_report_writer_preserves_manual_evidence(tmp_path):
    """BENCH report regeneration must keep everything below MANUAL_MARKER
    (a regeneration once dropped the official-run records)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    from scaling_bench import MANUAL_MARKER, write_report_md

    p = str(tmp_path / "r.md")
    write_report_md("# gen v1\n", p)
    assert open(p).read() == "# gen v1\n"
    with open(p, "a") as f:
        f.write("\n" + MANUAL_MARKER + "\ncurated evidence\n")
    write_report_md("# gen v2\n", p)
    out = open(p).read()
    assert out.startswith("# gen v2\n")
    assert MANUAL_MARKER in out and "curated evidence" in out
    # idempotent: regenerating again keeps exactly one manual section
    write_report_md("# gen v3\n", p)
    assert open(p).read().count(MANUAL_MARKER) == 1
