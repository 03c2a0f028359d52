"""Per-batch phase profiler: where does the serial (non-scaling) time go?

The Amdahl fit in BENCH/BASELINE.md measures S ~ 30-70 s of serial time per
8M-event run but cannot say WHICH phase it lives in.  This job runs the same
CDC replay at two pinned core counts in fresh JVMs and prints the per-batch
phase breakdown (lineage / plan+stage / changelog / merge) side by side —
a phase whose wall time does not shrink with cores is the serial cost.

Run:  python jobs/profile_batch.py [--docs 100000] [--events-per-doc 8]
      [--cores 1,4] [--batches 2] [--strategy auto]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from mongo_bulk_data_migration_spark.session import get_spark
from mongo_bulk_data_migration_spark import Catalog
from mongo_bulk_data_migration_spark.sources.fixtures import (
    SEQUENCES_SCHEMA, changes_df, sequences_df)
from mongo_bulk_data_migration_spark.streaming.replay import ChangeStreamReplayer
from mongo_bulk_data_migration_spark.plans.migration import MigrationOptions

cores = {cores}
spark = get_spark(app_name=f"prof-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
wh = tempfile.mkdtemp(prefix=f"prof{{cores}}_")
try:
    cat = Catalog(wh)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets={buckets})
    t.append(sequences_df(spark, {n_docs}, parallelism=cores))
    events = changes_df(spark, {n_docs}, {n_events}, n_parts=cores, parallelism=cores)
    rep = ChangeStreamReplayer(spark, wh, "sequences", "prof", evolve_schema=False,
                               options=MigrationOptions(merge_strategy={strategy!r}))
    t0 = time.monotonic()
    ms = rep.apply_changes(events, events_per_batch=max({n_events} // {batches}, 1))
    wall = time.monotonic() - t0
    print("RESULT " + json.dumps({{
        "cores": cores, "wall_s": round(wall, 2),
        "events_per_sec": round({n_events} / wall, 1),
        "phases": [
            {{k: m.get(k) for k in ("batch_id", "wall_s", "lineage_s", "plan_s",
                                    "changelog_s", "merge_s", "strategy",
                                    "staged_bytes")}}
            for m in ms
        ],
    }}))
finally:
    shutil.rmtree(wh, ignore_errors=True)
    spark.stop()
"""


def run(cores: int, n_docs: int, n_events: int, batches: int, buckets: int,
        strategy: str) -> dict:
    code = WORKER.format(repo=REPO, cores=cores, n_docs=n_docs,
                         n_events=n_events, batches=batches, buckets=buckets,
                         strategy=strategy)
    cmd = [sys.executable, "-c", code]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--events-per-doc", type=int, default=8)
    ap.add_argument("--cores", default="1,4")
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--strategy", default="auto")
    a = ap.parse_args()
    n_events = a.docs * a.events_per_doc
    results = []
    for c in [int(x) for x in a.cores.split(",")]:
        r = run(c, a.docs, n_events, a.batches, a.buckets, a.strategy)
        results.append(r)
        print(json.dumps(r), flush=True)
    if len(results) == 2:
        lo, hi = results
        print("\nphase scaling (lo->hi cores, per batch):")
        for pl, ph in zip(lo["phases"], hi["phases"]):
            row = {"batch": pl["batch_id"]}
            for k in ("wall_s", "lineage_s", "plan_s", "changelog_s", "merge_s"):
                if pl.get(k) is not None and ph.get(k):
                    row[k] = f"{pl[k]:.1f}->{ph[k]:.1f} ({pl[k]/max(ph[k],1e-9):.2f}x)"
            print(json.dumps(row))
        ratio = hi["events_per_sec"] / lo["events_per_sec"]
        cr = hi["cores"] / lo["cores"]
        print(f"\nspeedup {ratio:.2f}x over {cr:.0f}x cores -> eff {ratio/cr:.3f}")


if __name__ == "__main__":
    main()
