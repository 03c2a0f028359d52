"""MERGE operator semantics: put/update/insert/delete × matched/unmatched,
both physical strategies, pre-image correctness.

The op matrix mirrors the reference's bulk surface: keyed update
(`MigrationBulk.ts:36`), delete (`MigrationBulk.ts:47-50`), insert-if-absent
(`BackupBulk.ts:17-26` / `RollbackBulk.ts:34-37`).
"""

import pytest
from pyspark.sql import functions as F

from mongo_bulk_data_migration_spark import Catalog
from mongo_bulk_data_migration_spark.operators.merge import build_merge_plan, run_merge
from mongo_bulk_data_migration_spark.sources.fixtures import (
    CHANGES_SCHEMA,
    SEQUENCES_SCHEMA,
    sequences_spark,
)

from conftest import rows_of


def make_table(spark, warehouse, n=40, buckets=4):
    cat = Catalog(warehouse)
    t = cat.create_table("seq", SEQUENCES_SCHEMA, num_buckets=buckets)
    t.append(sequences_spark(spark, n))
    return t


def src_df(spark, rows):
    schema = "doc_id string, __op string, tokens array<int>, n_tok int, source string"
    return spark.createDataFrame(rows, schema)


@pytest.mark.parametrize("strategy", ["broadcast", "semi", "shuffle"])
def test_merge_op_matrix(spark, warehouse, strategy):
    t = make_table(spark, warehouse + strategy)
    before = {r["doc_id"]: r for r in rows_of(t.read(spark))}

    rows = [
        ("doc00000001", "put", [9, 9], 2, "put-matched"),       # replace row
        ("doc99999001", "put", [1], 1, "put-new"),              # insert
        ("doc00000002", "update", [7], 1, None),                # partial update
        ("doc99999002", "update", [7], 1, None),                # no-op (unmatched)
        ("doc00000003", "insert", [5], 1, "ins-matched"),       # keep old row
        ("doc99999003", "insert", [5], 1, "ins-new"),           # insert
        ("doc00000004", "delete", None, None, None),            # remove
        ("doc99999004", "delete", None, None, None),            # no-op
    ]
    plan = build_merge_plan(
        t, spark, src_df(spark, rows), update_cols=["tokens", "n_tok"], strategy=strategy
    )
    pre = rows_of(plan.preimage)
    run_merge(t, plan)
    m = plan.metrics()
    plan.release()

    after = {r["doc_id"]: r for r in rows_of(t.read(spark))}

    assert after["doc00000001"] == {
        "doc_id": "doc00000001", "tokens": [9, 9], "n_tok": 2, "source": "put-matched"
    }
    assert after["doc99999001"]["tokens"] == [1]
    # partial update: only update_cols replaced, source preserved
    assert after["doc00000002"]["tokens"] == [7]
    assert after["doc00000002"]["n_tok"] == 1
    assert after["doc00000002"]["source"] == before["doc00000002"]["source"]
    assert "doc99999002" not in after            # unmatched update: no-op
    assert after["doc00000003"] == before["doc00000003"]  # insert-if-absent keeps old
    assert after["doc99999003"]["source"] == "ins-new"
    assert "doc00000004" not in after            # deleted
    assert "doc99999004" not in after            # unmatched delete: no-op
    # every other row untouched
    untouched = set(before) - {r[0] for r in rows}
    for k in untouched:
        assert after[k] == before[k]

    # metrics
    assert m["n_matched"] == 4
    assert m["n_modified"] == 2
    assert m["n_removed"] == 1
    assert m["n_inserted"] == 2
    assert m["n_insert_skipped"] == 1

    # pre-images: one per source key, matched flag + old values
    pre_by_key = {p["doc_id"]: p for p in pre}
    assert len(pre_by_key) == 8
    assert pre_by_key["doc00000001"]["__matched"] is True
    assert pre_by_key["doc00000001"]["__pre_tokens"] == before["doc00000001"]["tokens"]
    assert pre_by_key["doc99999001"]["__matched"] is False
    assert pre_by_key["doc99999001"]["__pre_tokens"] is None


@pytest.mark.parametrize("strategy", ["broadcast", "semi", "shuffle"])
def test_merge_value_exprs_compute_from_target(spark, warehouse, strategy):
    """Transforms evaluated inside the join: new value = f(target row, event)."""
    t = make_table(spark, warehouse + strategy, n=20)
    before = {r["doc_id"]: r for r in rows_of(t.read(spark))}
    rows = [("doc00000005", "update", None, None, None)]
    plan = build_merge_plan(
        t,
        spark,
        src_df(spark, rows),
        update_cols=["tokens", "n_tok"],
        strategy=strategy,
        value_exprs={
            "tokens": F.concat(F.col("tokens"), F.array(F.lit(50256).cast("int"))),
            "n_tok": (F.size("tokens") + 1).cast("int"),
        },
    )
    run_merge(t, plan)
    plan.release()
    after = {r["doc_id"]: r for r in rows_of(t.read(spark))}
    assert after["doc00000005"]["tokens"] == before["doc00000005"]["tokens"] + [50256]
    assert after["doc00000005"]["n_tok"] == before["doc00000005"]["n_tok"] + 1


def test_merge_untouched_buckets_not_rewritten(spark, warehouse):
    """Copy-on-write: only touched buckets get new files (scale invariant)."""
    t = make_table(spark, warehouse, n=200, buckets=8)
    files_before = {f["path"] for f in t.snapshot().files}
    plan = build_merge_plan(
        t, spark, src_df(spark, [("doc00000001", "delete", None, None, None)])
    )
    run_merge(t, plan)
    plan.release()
    files_after = {f["path"] for f in t.snapshot().files}
    assert len(plan.touched) == 1
    carried = files_before & files_after
    # all buckets except the single touched one carried over by reference
    assert len(carried) >= len(files_before) - 2


def test_merge_auto_strategy_by_staged_size(spark, warehouse):
    """'auto' broadcasts small batches and falls back to shuffle when the
    staged source exceeds the threshold (the 100-TB guard: never broadcast a
    multi-GB batch). Results must be identical either way."""
    t = make_table(spark, warehouse, n=30)
    rows = [("doc00000001", "put", [9, 9], 2, "x"), ("doc99999001", "put", [1], 1, "y")]

    plan = build_merge_plan(t, spark, src_df(spark, rows), strategy="auto")
    assert plan.strategy == "broadcast" and plan.staged_bytes > 0
    plan.release()

    plan2 = build_merge_plan(
        t, spark, src_df(spark, rows), strategy="auto", broadcast_threshold_bytes=1
    )
    # past the payload-broadcast bound, the key set (2 keys) is still tiny:
    # auto picks the key-broadcast semi strategy
    assert plan2.strategy == "semi"
    run_merge(t, plan2)
    plan2.release()
    after = {r["doc_id"]: r for r in rows_of(t.read(spark))}
    assert after["doc00000001"]["tokens"] == [9, 9]
    assert after["doc99999001"]["tokens"] == [1]


def test_merge_auto_shuffle_fallback_past_key_cap(spark, warehouse, monkeypatch):
    """When even the key set is too large to broadcast, 'auto' falls back to
    the plain full-outer shuffle join (no driver-side build at all)."""
    import mongo_bulk_data_migration_spark.operators.merge as M

    t = make_table(spark, warehouse, n=30)
    rows = [("doc00000001", "put", [9, 9], 2, "x"), ("doc99999001", "put", [1], 1, "y")]
    monkeypatch.setattr(M, "SEMI_MAX_KEYS", 1)
    plan = build_merge_plan(
        t, spark, src_df(spark, rows), strategy="auto", broadcast_threshold_bytes=1
    )
    assert plan.strategy == "shuffle"
    run_merge(t, plan)
    plan.release()
    after = {r["doc_id"]: r for r in rows_of(t.read(spark))}
    assert after["doc00000001"]["tokens"] == [9, 9]
    assert after["doc99999001"]["tokens"] == [1]


def test_merge_on_read_op_matrix(spark, warehouse):
    """MoR mode: same op-matrix semantics as copy-on-write, but the commit
    appends one delta layer (no base rewrite); reads resolve last-wins;
    compact() folds layers back into base files."""
    cat = Catalog(warehouse)
    t = cat.create_table(
        "seq", SEQUENCES_SCHEMA, num_buckets=4, properties={"merge_mode": "mor"}
    )
    t.append(sequences_spark(spark, 40))
    base_files = [f for f in t.snapshot().files if f.get("kind", "base") == "base"]

    rows = [
        ("doc00000001", "put", [9, 9], 2, "put-matched"),
        ("doc99999001", "put", [1], 1, "put-new"),
        ("doc00000002", "update", [7], 1, None),
        ("doc99999002", "update", [7], 1, None),          # unmatched no-op
        ("doc00000003", "insert", [5], 1, "ins-matched"),  # keep old row
        ("doc99999003", "insert", [5], 1, "ins-new"),
        ("doc00000004", "delete", None, None, None),
        ("doc99999004", "delete", None, None, None),       # unmatched no-op
    ]
    plan = build_merge_plan(t, spark, src_df(spark, rows), update_cols=["tokens", "n_tok"])
    run_merge(t, plan)
    plan.release()

    snap = t.snapshot()
    assert [f for f in snap.files if f.get("kind", "base") == "base"] == base_files
    assert t.delta_layers() == 1

    after = {r["doc_id"]: r for r in rows_of(t.read(spark))}
    assert after["doc00000001"]["tokens"] == [9, 9]
    assert after["doc99999001"]["tokens"] == [1]
    assert after["doc00000002"]["tokens"] == [7] and after["doc00000002"]["n_tok"] == 1
    assert "doc99999002" not in after
    assert after["doc00000003"]["tokens"] != [5]  # insert-if-absent kept old
    assert after["doc99999003"]["tokens"] == [5]
    assert "doc00000004" not in after
    assert "doc99999004" not in after

    # second layer over the first: later layer wins per key
    rows2 = [
        ("doc00000001", "update", [4], 1, None),
        ("doc99999003", "delete", None, None, None),
    ]
    plan2 = build_merge_plan(t, spark, src_df(spark, rows2), update_cols=["tokens", "n_tok"])
    run_merge(t, plan2)
    plan2.release()
    assert t.delta_layers() == 2
    after2 = {r["doc_id"]: r for r in rows_of(t.read(spark))}
    assert after2["doc00000001"]["tokens"] == [4]
    assert "doc99999003" not in after2

    # time travel still sees the layer-1 state
    v1 = t.snapshot().parent
    at_v1 = {r["doc_id"]: r for r in rows_of(t.read(spark, version=v1))}
    assert at_v1["doc00000001"]["tokens"] == [9, 9] and "doc99999003" in at_v1

    # compaction folds deltas into base; contents identical
    before = sorted((r["doc_id"], tuple(r["tokens"] or [])) for r in rows_of(t.read(spark)))
    assert t.compact(spark) > 0
    assert t.delta_layers() == 0
    after_c = sorted((r["doc_id"], tuple(r["tokens"] or [])) for r in rows_of(t.read(spark)))
    assert after_c == before


def test_combined_scratch_nulls_unread_slices(spark, warehouse):
    """Write-volume contract of the single-pass combined staging: pre-image
    columns are NULL for op-NULL carryover rows (shuffle full-outer join) and
    merged-value columns are NULL for delete rows — those slices are never
    read downstream, and nulling keeps the dominant scratch write at ~1x row
    width for untouched rows instead of 2x (the 100 TB discipline)."""
    t = make_table(spark, warehouse, n=20, buckets=1)  # 1 bucket: all carried rows join in
    rows = [
        ("doc00000001", "update", [7], 1, None),
        ("doc00000002", "delete", None, None, None),
    ]
    plan = build_merge_plan(
        t, spark, src_df(spark, rows), update_cols=["tokens", "n_tok"], strategy="shuffle"
    )
    combined = {r["doc_id"]: r for r in rows_of(plan.combined)}
    # carryover row (no event): merged value kept, pre-image nulled
    carry = combined["doc00000003"]
    assert carry["__op"] is None
    assert carry["__pre_tokens"] is None and carry["__pre_n_tok"] is None
    assert carry["__new_tokens"] is not None
    # delete row: pre-image kept (changelog reads it), merged value nulled
    dele = combined["doc00000002"]
    assert dele["__pre_tokens"] is not None
    assert dele["__new_tokens"] is None and dele["__new_n_tok"] is None
    # updated row keeps both
    upd = combined["doc00000001"]
    assert upd["__pre_tokens"] is not None and upd["__new_tokens"] == [7]
    run_merge(t, plan)
    plan.release()
    after = {r["doc_id"]: r for r in rows_of(t.read(spark))}
    assert after["doc00000003"]["tokens"] is not None  # carryover survived
    assert "doc00000002" not in after
    assert after["doc00000001"]["tokens"] == [7]
