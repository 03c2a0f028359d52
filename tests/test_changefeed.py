"""Change Data Feed (sources/changefeed.py) + incremental view maintenance
(operators/ivm.py): the maintained aggregate must equal a from-scratch
GROUP BY of the final table across every commit shape — append, MoR delta,
copy-on-write overwrite, compaction, metadata-only."""

from pyspark.sql import functions as F

from mongo_bulk_data_migration_spark import Catalog
from mongo_bulk_data_migration_spark.operators.ivm import (
    grouped_delta,
    init_grouped_agg,
    maintain,
)
from mongo_bulk_data_migration_spark.plans.migration import MigrationOptions
from mongo_bulk_data_migration_spark.sources.changefeed import (
    CHANGE_COL,
    table_changes,
)
from mongo_bulk_data_migration_spark.sources.fixtures import (
    SEQUENCES_SCHEMA,
    changes_df,
    sequences_df,
)
from mongo_bulk_data_migration_spark.streaming.replay import ChangeStreamReplayer


def _agg_rows(df):
    return sorted(
        (
            (r["source"], r["n_rows"], r["sum_n_tok"])
            for r in df.collect()
        ),
        key=lambda x: (x[0] is None, x[0]),
    )


def _replay_and_check(spark, warehouse, mode):
    cat = Catalog(warehouse)
    props = {"merge_mode": "mor"} if mode == "mor" else {}
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets=8, properties=props)
    t.append(sequences_df(spark, 400, parallelism=4))
    v0 = t.current_version()
    agg = init_grouped_agg(t.read(spark), "source", ["n_tok"])

    events = changes_df(spark, 400, 1600, n_parts=4, parallelism=4)
    rep = ChangeStreamReplayer(
        spark, warehouse, "sequences", f"cf-{mode}", evolve_schema=False,
        options=MigrationOptions(merge_strategy="auto"),
    )
    rep.apply_changes(events, events_per_batch=400)  # 4 commits
    if mode == "mor":
        assert t.delta_layers() > 0

    view = maintain(agg, table_changes(t, spark, v0), "source", ["n_tok"])
    expected = init_grouped_agg(t.read(spark), "source", ["n_tok"])
    assert _agg_rows(view) == _agg_rows(expected)
    return t, v0


def test_ivm_matches_recompute_cow(spark, warehouse):
    _replay_and_check(spark, warehouse, "cow")


def test_ivm_matches_recompute_mor(spark, warehouse):
    t, v0 = _replay_and_check(spark, warehouse, "mor")
    # the feed actually used the MoR fast path: updates carry both images
    types = {
        r[0]
        for r in table_changes(t, spark, v0).select(CHANGE_COL).distinct().collect()
    }
    assert "update_pre" in types and "update_post" in types


def test_append_commit_is_pure_inserts(spark, warehouse):
    cat = Catalog(warehouse)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets=4)
    t.append(sequences_df(spark, 50, parallelism=2))
    v0 = t.current_version()
    t.append(sequences_df(spark, 30, parallelism=2))
    ch = table_changes(t, spark, v0)
    assert ch.count() == 30
    assert {r[0] for r in ch.select(CHANGE_COL).distinct().collect()} == {"insert"}


def test_compaction_diffs_to_zero_changes(spark, warehouse):
    cat = Catalog(warehouse)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets=2)
    for _ in range(6):  # many small files per bucket
        t.append(sequences_df(spark, 20, parallelism=2))
    v0 = t.current_version()
    assert t.compact(spark, max_files_per_bucket=2) > 0
    assert t.current_version() > v0
    # logical content unchanged -> the overwrite commit diffs to nothing
    assert table_changes(t, spark, v0).count() == 0


def test_grouped_delta_signs(spark):
    rows = [
        ("a", 5, "insert"),
        ("a", 7, "delete"),
        ("a", 3, "update_pre"),
        ("a", 4, "update_post"),
    ]
    df = spark.createDataFrame(rows, ["source", "n_tok", CHANGE_COL])
    out = grouped_delta(df, "source", ["n_tok"]).collect()[0]
    assert out["n_rows"] == 0 and out["sum_n_tok"] == 5 - 7 - 3 + 4


def test_follow_changes_tails_incrementally(spark, warehouse):
    from mongo_bulk_data_migration_spark.sources.changefeed import follow_changes

    cat = Catalog(warehouse)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets=4)
    t.append(sequences_df(spark, 100, parallelism=2))
    v0 = t.current_version()
    agg = init_grouped_agg(t.read(spark), "source", ["n_tok"])

    events = changes_df(spark, 100, 400, n_parts=2, parallelism=2)
    rep = ChangeStreamReplayer(
        spark, warehouse, "sequences", "cf-tail", evolve_schema=False,
        options=MigrationOptions(merge_strategy="auto"),
    )
    rep.apply_changes(events, events_per_batch=200)  # 2 commits land

    from mongo_bulk_data_migration_spark.operators.ivm import maintain as _maintain

    seen = []
    for v, ch in follow_changes(t, spark, v0, poll_interval_s=0.05, max_polls=2):
        seen.append(v)
        agg = _maintain(agg, ch, "source", ["n_tok"])
    assert seen == list(range(v0 + 1, t.current_version() + 1))
    expected = init_grouped_agg(t.read(spark), "source", ["n_tok"])
    assert _agg_rows(agg) == _agg_rows(expected)


def test_column_projected_feed(spark, warehouse):
    """columns= prunes row images to key+named cols and hides updates that
    only touch unprojected columns; the IVM result over the pruned feed
    still equals recompute (the view reads only the projected columns)."""
    from mongo_bulk_data_migration_spark.sources.changefeed import VERSION_COL

    cat = Catalog(warehouse)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets=4)
    t.append(sequences_df(spark, 60, parallelism=2))
    v0 = t.current_version()
    agg = init_grouped_agg(t.read(spark), "source", ["n_tok"])

    events = changes_df(spark, 60, 240, n_parts=2, parallelism=2)
    rep = ChangeStreamReplayer(
        spark, warehouse, "sequences", "cf-proj", evolve_schema=False,
        options=MigrationOptions(merge_strategy="auto"),
    )
    rep.apply_changes(events, events_per_batch=120)

    ch = table_changes(t, spark, v0, columns=["source", "n_tok"])
    assert set(ch.columns) == {"doc_id", "source", "n_tok", CHANGE_COL, VERSION_COL}
    view = maintain(agg, ch, "source", ["n_tok"])
    expected = init_grouped_agg(t.read(spark), "source", ["n_tok"])
    assert _agg_rows(view) == _agg_rows(expected)
