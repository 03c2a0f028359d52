"""Binned range join: containment semantics + the no-nested-loop contract."""

import datetime as dt
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongo_bulk_data_migration_spark.operators.rangejoin import bin_range_join

T0 = 1704067200000  # 2024-01-01T00:00Z


def _ev(spark, *ms):
    rows = [(i, dt.datetime.utcfromtimestamp((T0 + m) / 1000)) for i, m in enumerate(ms)]
    return spark.createDataFrame(rows, "event_id int, ts timestamp")


def _iv(spark, *bounds):
    rows = [(i, T0 + lo, T0 + hi) for i, (lo, hi) in enumerate(bounds)]
    return spark.createDataFrame(rows, "win_id int, lo_ms long, hi_ms long")


def test_half_open_bounds(spark):
    ev = _ev(spark, 0, 1000, 2000)          # at lo, inside, at hi
    iv = _iv(spark, (0, 2000))
    got = sorted(r["event_id"] for r in bin_range_join(ev, iv, bin_ms=500).collect())
    assert got == [0, 1]  # lo inclusive, hi exclusive


def test_overlapping_intervals_multi_match(spark):
    ev = _ev(spark, 1500)
    iv = _iv(spark, (0, 2000), (1000, 3000), (2000, 4000))
    got = sorted(r["win_id"] for r in bin_range_join(ev, iv, bin_ms=1000).collect())
    assert got == [0, 1]


def test_interval_smaller_and_larger_than_bin(spark):
    ev = _ev(spark, 100, 5500)
    iv = _iv(spark, (50, 150), (5000, 9000))  # sub-bin and multi-bin
    got = {(r["event_id"], r["win_id"])
           for r in bin_range_join(ev, iv, bin_ms=1000).collect()}
    assert got == {(0, 0), (1, 1)}


def test_no_nested_loop_plan(spark):
    ev = _ev(spark, 100)
    iv = _iv(spark, (0, 1000))
    plan = bin_range_join(ev, iv)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
