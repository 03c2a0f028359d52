"""Simulate the round driver's correctness gate: run queries() and
oracle_sql() side-by-side and canonicalize the way the DRIVER does
(pandas sort_values over all columns + value hash) — the path that
crashed in round 1 on unhashable list columns.  Usage:
    python jobs/driver_sim.py [sf_dir] [query ...]
"""
import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NAMES = sys.argv[2:] or sorted(entrymod.queries())
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]

def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)  # driver's crash point
    return df

def _hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        for v in df[col]:
            if isinstance(v, float):
                v = round(v, 6)
            h.update(repr(v).encode())
    return h.hexdigest()[:16]

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.ui.enabled","false").getOrCreate())
spark.conf.set("spark.sql.session.timeZone","UTC")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

import time

qs, os_ = entrymod.queries(), entrymod.oracle_sql()
fail = 0
t_all = time.monotonic()
for name in NAMES:
    t0 = time.monotonic()
    try:
        sdf = qs[name](spark, SF).toPandas()
        s = _canon(sdf)
        if name not in os_:
            print(f"{name}: rows_only spark_rows={len(s)} canon=OK hash={_hash(s)}")
            continue
        d = _canon(con.execute(os_[name]).df())
        ok_rows = len(s) == len(d)
        ok_cols = list(s.columns) == list(d.columns)
        ok_hash = _hash(s) == _hash(d)
        status = "PASS" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            fail += 1
        print(f"{name}: {status} rows={len(s)}/{len(d)} cols_match={ok_cols} hash_match={ok_hash} t={time.monotonic() - t0:.1f}s")
    except Exception as e:
        fail += 1
        print(f"{name}: ERR {type(e).__name__}: {str(e)[:200]}")
print(f"TOTAL {len(NAMES)} queries in {time.monotonic() - t_all:.1f}s, {fail} failures")
spark.stop()
sys.exit(1 if fail else 0)
