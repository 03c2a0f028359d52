"""IVM scale evidence: maintenance cost is O(batch + touched buckets),
recompute is O(table).

Protocol: two table sizes (10x apart), the SAME bucket-localized update
batch applied to each (every event keys into 2 of the 32 buckets — the
locality a time/tenant-partitioned 100 TB ingest actually has).  For each
size, time (a) the incremental maintenance step — change feed of the one
MoR commit folded into the running aggregate — and (b) a from-scratch
GROUP BY of the table.  Both legs of a size run back-to-back in one JVM,
so the a/b RATIO is robust to host-window shear even when absolute numbers
are not; the cross-size comparison of ratios is the headline.

Run:  python jobs/ivm_bench.py [--small 100000] [--big 1000000]
      [--events 20000] [--cores 8]
Appends one JSON line per size to BENCH/ivm_runs.jsonl and prints a table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_size(spark, n_docs: int, n_events: int, cores: int) -> dict:
    from pyspark.sql import functions as F

    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.operators.ivm import init_grouped_agg, maintain
    from mongo_bulk_data_migration_spark.sources.changefeed import table_changes
    from mongo_bulk_data_migration_spark.sources.fixtures import (
        SEQUENCES_SCHEMA,
        sequences_df,
    )
    from mongo_bulk_data_migration_spark.sources.laketable import bucket_expr
    from mongo_bulk_data_migration_spark.streaming.replay import ChangeStreamReplayer

    wh = tempfile.mkdtemp(prefix=f"ivmbench{n_docs}_")
    try:
        cat = Catalog(wh)
        t = cat.create_table(
            "sequences", SEQUENCES_SCHEMA, num_buckets=32,
            properties={"merge_mode": "mor"},
        )
        t.append(sequences_df(spark, n_docs, parallelism=cores))
        v0 = t.current_version()

        # the view's measure derives from the WIDE payload column (sum of
        # the token values) — the realistic case where a from-scratch GROUP
        # BY must deserialize the multi-KB arrays of EVERY row, while the
        # maintenance step deserializes only the changed rows' arrays
        def _with_measure(df):
            return df.withColumn(
                "tok_sum",
                F.aggregate("tokens", F.lit(0).cast("bigint"), lambda a, x: a + x),
            )

        agg = init_grouped_agg(_with_measure(t.read(spark)), "source", ["tok_sum"])
        agg_rows = agg.collect()  # materialize the running view (tiny)
        agg = spark.createDataFrame(agg_rows, agg.schema)

        # bucket-localized batch: update events over keys living in 2/32
        # buckets only (the locality a partitioned ingest has at scale)
        keys = (
            t.read(spark)
            .where(bucket_expr("doc_id", 32) < 2)
            .select("doc_id")
            .limit(n_events)
        )
        events = keys.select(
            (F.monotonically_increasing_id() + 1).alias("seq"),
            F.lit(0).cast("int").alias("part"),
            F.lit("update").alias("op"),
            "doc_id",
            F.lit(None).cast("array<int>").alias("tokens"),
            F.lit("append_eos").alias("transform"),
            F.lit(None).cast("string").alias("source"),
            F.lit(None).cast("string").alias("extra"),
        )
        n_ev = events.count()
        rep = ChangeStreamReplayer(
            spark, wh, "sequences", f"ivm{n_docs}", evolve_schema=False
        )
        rep.apply_changes(events, events_per_batch=max(n_ev, 1))

        # JVM/codegen warmup so leg 1 does not pay one-time costs
        t.read(spark).select("doc_id").limit(10).collect()

        def _ivm_once():
            t0 = time.monotonic()
            ch = _with_measure(
                table_changes(t, spark, v0, columns=["source", "tokens"])
            )
            view = maintain(agg, ch, "source", ["tok_sum"])
            rows = sorted(
                (str(r["source"]), r["n_rows"], r["sum_tok_sum"]) for r in view.collect()
            )
            return time.monotonic() - t0, rows

        def _re_once():
            t0 = time.monotonic()
            rows = sorted(
                (str(r["source"]), r["n_rows"], r["sum_tok_sum"])
                for r in init_grouped_agg(
                    _with_measure(t.read(spark)), "source", ["tok_sum"]
                ).collect()
            )
            return time.monotonic() - t0, rows

        # interleave two measurements per leg (host shear robustness);
        # best-of-2 per leg, compared within the same minutes
        i1, view_rows = _ivm_once()
        r1, re_rows = _re_once()
        i2, _ = _ivm_once()
        r2, _ = _re_once()
        assert view_rows == re_rows, "IVM view diverged from recompute"
        t_ivm, t_recompute = min(i1, i2), min(r1, r2)

        return {
            "n_docs": n_docs,
            "n_events": n_ev,
            "touched_buckets": 2,
            "ivm_sec": round(t_ivm, 2),
            "recompute_sec": round(t_recompute, 2),
            "ivm_secs": [round(i1, 2), round(i2, 2)],
            "recompute_secs": [round(r1, 2), round(r2, 2)],
            "recompute_over_ivm": round(t_recompute / t_ivm, 2),
        }
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=100_000)
    ap.add_argument("--big", type=int, default=1_000_000)
    ap.add_argument("--events", type=int, default=20_000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from mongo_bulk_data_migration_spark.session import get_spark

    sys.path.insert(0, os.path.join(REPO, "jobs"))
    from scaling_bench import host_probe

    spark = get_spark(
        app_name="ivm-bench", master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    probe0 = host_probe(8, 2_000_000)
    rows = []
    for n in (args.small, args.big):
        rows.append(run_size(spark, n, args.events, args.cores))
    probe1 = host_probe(8, 2_000_000)

    out_path = os.path.join(REPO, "BENCH", "ivm_runs.jsonl")
    with open(out_path, "a") as f:
        for r in rows:
            r["host_probe_mops"] = [probe0, probe1]
            f.write(json.dumps(r) + "\n")
    print(f"{'n_docs':>10} {'ivm_s':>8} {'recompute_s':>12} {'ratio':>7}")
    for r in rows:
        print(
            f"{r['n_docs']:>10} {r['ivm_sec']:>8} {r['recompute_sec']:>12} "
            f"{r['recompute_over_ivm']:>7}"
        )
    print(f"host probes: {probe0} -> {probe1} Mops")


if __name__ == "__main__":
    main()
