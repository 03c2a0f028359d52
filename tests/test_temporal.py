"""Temporal operators: as-of join, sessionization, event-time rollup.

Semantics pinned by hand-built micro-cases (tie-at-same-timestamp
visibility, empty right side, gap boundaries), plus a plan contract: the
as-of join must co-partition both inputs with ONE exchange — no join, no
cross product.
"""

import datetime as dt
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongo_bulk_data_migration_spark.operators.temporal import (
    asof_join,
    scd2_intervals,
    sessionize,
    time_rollup,
)


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_backward_match(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(20), 101), (2, _ts(5), 102)],
        "k int, ts timestamp, ev int",
    )
    right = spark.createDataFrame(
        [(1, _ts(9), 7), (1, _ts(15), 8), (2, _ts(6), 9)],
        "k int, ts timestamp, st int",
    )
    out = asof_join(left, right, key="k", right_values=["st"])
    got = {r["ev"]: r["asof_st"] for r in out.collect()}
    # ev 100 sees st@:09; ev 101 sees st@:15; ev 102 precedes all state -> NULL
    assert got == {100: 7, 101: 8, 102: None}


def test_asof_tie_state_visible_at_same_ts(spark):
    left = spark.createDataFrame([(1, _ts(10), 1)], "k int, ts timestamp, ev int")
    right = spark.createDataFrame([(1, _ts(10), 42)], "k int, ts timestamp, st int")
    out = asof_join(left, right, key="k", right_values=["st"])
    assert out.collect()[0]["asof_st"] == 42


def test_asof_empty_right(spark):
    left = spark.createDataFrame([(1, _ts(1), 5)], "k int, ts timestamp, ev int")
    right = spark.createDataFrame([], "k int, ts timestamp, st int")
    rows = asof_join(left, right, key="k", right_values=["st"]).collect()
    assert len(rows) == 1 and rows[0]["asof_st"] is None


def test_asof_single_exchange_no_join(spark):
    left = spark.createDataFrame([(1, _ts(1), 5)], "k int, ts timestamp, ev int")
    right = spark.createDataFrame([(1, _ts(0), 9)], "k int, ts timestamp, st int")
    plan = asof_join(left, right, key="k", right_values=["st"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_sessionize_single_exchange_single_sort(spark):
    ev = spark.createDataFrame(
        [(1, 1, _ts(0)), (1, 2, _ts(40))], "user_id int, event_id int, ts timestamp"
    )
    s = sessionize(ev, key="user_id", ts="ts", seq="event_id")
    plan = s._jdf.queryExecution().executedPlan().toString()
    # lag + running sum share one partitioning and one within-partition sort
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort ") <= 1


def test_time_rollup_partial_agg(spark):
    ev = spark.createDataFrame([(dt.datetime(2024, 1, 1, 3),)], "ts timestamp")
    plan = time_rollup(ev)._jdf.queryExecution().executedPlan().toString()
    # map-side partial combine before the shuffle
    assert "partial_count" in plan


def test_sessionize_gap_boundary(spark):
    rows = [
        (1, 1, _ts(0)),
        (1, 2, _ts(29)),        # 29 min gap -> same session
        (1, 3, _ts(59, 1)),     # 30m01s gap -> NEW session
        (2, 4, _ts(0)),
    ]
    ev = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    s = sessionize(ev, key="user_id", ts="ts", seq="event_id", gap_minutes=30.0)
    got = {r["event_id"]: r["session_idx"] for r in s.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 0}


def test_sessionize_exact_gap_is_same_session(spark):
    ev = spark.createDataFrame(
        [(1, 1, _ts(0)), (1, 2, _ts(30))], "user_id int, event_id int, ts timestamp"
    )
    s = sessionize(ev, key="user_id", ts="ts", seq="event_id", gap_minutes=30.0)
    assert {r["session_idx"] for r in s.collect()} == {0}


def test_scd2_intervals_chain(spark):
    ev = spark.createDataFrame(
        [(1, 1, _ts(0), "a"), (1, 2, _ts(5), "b"), (2, 3, _ts(1), "x")],
        "user_id int, event_id int, ts timestamp, state string",
    )
    out = {r["event_id"]: r for r in
           scd2_intervals(ev, key="user_id", seq="event_id").collect()}
    # intervals chain: row 1 closes at row 2's ts; latest row per key is open
    assert out[1]["valid_to"] == _ts(5) and not out[1]["is_current"]
    assert out[2]["valid_to"] is None and out[2]["is_current"]
    assert out[3]["valid_to"] is None and out[3]["is_current"]


def test_time_rollup_buckets(spark):
    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 3, 59),), (dt.datetime(2024, 1, 1, 4, 0),),
         (dt.datetime(2024, 1, 1, 4, 30),)],
        "ts timestamp",
    )
    out = {r["bucket_ms"]: r["n_events"] for r in time_rollup(ev).collect()}
    h3 = int(dt.datetime(2024, 1, 1, 3, tzinfo=dt.timezone.utc).timestamp() * 1000)
    h4 = int(dt.datetime(2024, 1, 1, 4, tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert out == {h3: 1, h4: 2}
