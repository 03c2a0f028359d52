"""Deterministic dataset splitting / sampling by key hash.

Train/valid/test assignment for a training corpus must be a PURE FUNCTION
of the document key: stable across runs, cluster sizes, and re-partitioning
(Spark's ``sample``/``sampleBy`` depend on partition layout and seed plumb-
ing, and cannot be reproduced by an external system auditing the split).

The hash is md5-based rather than xxhash64 so the exact same assignment is
reproducible in ANSI SQL (DuckDB: ``('0x'||substr(md5(k),1,8))::UBIGINT %
n``), making the split oracle-checkable end-to-end.  md5 here is a
uniformity device, not a security boundary.

All expressions are JVM-side (whole-stage codegen); the split adds zero
shuffles — it composes with any downstream groupBy/write.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def hash_bucket(key: Column, n: int = 100) -> Column:
    """Uniform deterministic bucket in [0, n) from the key's md5 prefix."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long") % n
    ).cast("int")


def holdout_split(key: Column, train_pct: int = 90, valid_pct: int = 5) -> Column:
    """'train' / 'valid' / 'test' label, stable per key forever.

    Percent-granular on a 100-bucket hash ring: bucket < train_pct -> train,
    < train_pct+valid_pct -> valid, else test.
    """
    b = hash_bucket(key, 100)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
