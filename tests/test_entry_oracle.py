"""Self-check of the __spark_entry__ driver contract: every query with an
oracle must match DuckDB on row count, column names, and sorted values —
the same gate the driver applies at sf=0.01.
"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("MBDM_ORACLE_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_conn():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return norm(v.item())
        if isinstance(v, np.ndarray):
            return tuple(norm(x) for x in v.tolist())
    except ImportError:
        pass
    return v


def sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in idx) for r in rows)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    sdf = q(spark, SF_DIR)
    s_cols = sorted(sdf.columns)
    s_rows = sorted_rows(sdf.columns, [tuple(r) for r in sdf.collect()])

    con = duck_conn()
    res = con.execute(ORACLES[name])
    d_cols = sorted(d[0] for d in res.description)
    d_rows = sorted_rows([d[0] for d in res.description], res.fetchall())
    con.close()

    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: {len(s_rows)} rows != {len(d_rows)}"
    mism = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b][:3]
    assert not mism, f"{name}: first mismatches at {mism}: " + "; ".join(
        f"spark={s_rows[i]} duck={d_rows[i]}" for i in mism
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
