"""Deterministic fixtures per FIXTURES.md (seed=42, no wall-clock).

Two tiers:

- :func:`make_sequences` / :func:`make_changes` — pure-Python/numpy exact
  spec, shared by pytest and the oracle simulator (the analog of the
  reference's seeded ``insertMany`` collections,
  ``/root/reference/__tests__/MongoBulkDataMigration.update.test.ts:51``).
- :func:`sequences_df` / :func:`changes_df` — Spark-native JVM-side
  generators (``F.sequence`` + hash mixing, no Python in the loop) for
  benchmark-scale inputs.

Batch semantics: a change stream is replayed in micro-batches; within one
batch multiple events per key collapse **last-wins** (highest ``seq``)
applied against the pre-batch state (FIXTURES.md invariant 6).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

SEED = 42
VOCAB = 50257
SOURCES = ("web", "books", "code", "wiki")

SEQUENCES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

CHANGES_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("part", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("transform", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("extra", T.StringType(), True),
    ]
)


def stable_hash(s: str) -> int:
    """Platform/run-stable string hash (Python's hash() is salted)."""
    return zlib.crc32(s.encode("utf-8"))


def doc_id_of(i: int) -> str:
    return f"doc{i:08d}"


def tokens_of(i: int) -> list[int]:
    length = 1 + (stable_hash(doc_id_of(i)) % 512)
    return [(i * 2654435761 + j) % VOCAB for j in range(length)]


def make_sequences(n_docs: int) -> list[dict[str, Any]]:
    rows = []
    for i in range(n_docs):
        toks = tokens_of(i)
        rows.append(
            {
                "doc_id": doc_id_of(i),
                "tokens": toks,
                "n_tok": len(toks),
                "source": SOURCES[i % 4],
            }
        )
    return rows


def make_changes(
    n_docs: int,
    n_events: int,
    n_parts: int = 8,
    n_batches: int = 4,
    schema_evolution_from_batch: int | None = None,
    seed: int = SEED,
) -> list[dict[str, Any]]:
    """Oplog-style event list per FIXTURES.md T2 (Zipf-skewed keys)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    id_space = max(int(n_docs * 1.25), n_docs + 1)
    events: list[dict[str, Any]] = []
    zipf_raw = rng.zipf(1.2, size=n_events)
    op_draw = rng.random(n_events)
    t_draw = rng.integers(0, 5, size=n_events)
    arg_draw = rng.integers(1, 9, size=n_events)
    src_draw = rng.random(n_events)
    for e in range(n_events):
        idx = int(zipf_raw[e] - 1) % id_space
        doc_id = doc_id_of(idx)
        batch_id = e * n_batches // n_events
        if idx >= n_docs:
            op = "insert"
        else:
            op = "update" if op_draw[e] < 0.89 else "delete"
        tokens = transform = source = extra = None
        if op == "insert":
            tokens = tokens_of(idx)
        elif op == "update":
            tname = ("append_eos", "drop_first_k", "remap_mod", "set_tokens", "truncate")[
                int(t_draw[e])
            ]
            if tname == "set_tokens":
                tokens = tokens_of(idx)[: 1 + int(arg_draw[e])]
                transform = "set_tokens"
            elif tname in ("drop_first_k", "truncate"):
                transform = f"{tname}:{int(arg_draw[e])}"
            elif tname == "remap_mod":
                transform = f"remap_mod:{int(arg_draw[e]) * 100 + 1}"
            else:
                transform = "append_eos"
            if src_draw[e] < 0.1:
                source = SOURCES[int(arg_draw[e]) % 4]
        if schema_evolution_from_batch is not None and batch_id >= schema_evolution_from_batch:
            extra = f'{{"batch":{batch_id},"e":{e}}}'
        events.append(
            {
                "seq": e,
                "part": stable_hash(doc_id) % n_parts,
                "op": op,
                "doc_id": doc_id,
                "tokens": tokens,
                "transform": transform,
                "source": source,
                "extra": extra,
            }
        )
    return events


def sequences_spark(spark: SparkSession, n_docs: int) -> DataFrame:
    return spark.createDataFrame(make_sequences(n_docs), SEQUENCES_SCHEMA)


def changes_spark(spark: SparkSession, events: list[dict[str, Any]]) -> DataFrame:
    return spark.createDataFrame(events, CHANGES_SCHEMA)


# ---------------------------------------------------------------------------
# Benchmark-scale, JVM-side generators (no Python row loop).
# ---------------------------------------------------------------------------


def sequences_df(spark: SparkSession, n_docs: int, parallelism: int = 32) -> DataFrame:
    """Generate the T1 table entirely in the JVM (codegen'd expressions)."""
    ids = spark.range(0, n_docs, 1, parallelism)
    length = (F.pmod(F.xxhash64(F.format_string("doc%08d", "id")), F.lit(512)) + 1).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda j: F.pmod(F.col("id") * F.lit(2654435761) + j.cast("long"), F.lit(VOCAB)).cast("int"),
    )
    return ids.select(
        F.format_string("doc%08d", "id").alias("doc_id"),
        tokens.alias("tokens"),
        length.alias("n_tok"),
        F.element_at(F.array(*[F.lit(s) for s in SOURCES]), (F.col("id") % 4 + 1).cast("int")).alias(
            "source"
        ),
    )


def changes_df(
    spark: SparkSession,
    n_docs: int,
    n_events: int,
    n_parts: int = 32,
    skew: float = 2.5,
    parallelism: int = 32,
) -> DataFrame:
    """Benchmark-scale change stream, generated JVM-side.

    Skew: key index = floor(id_space * u^skew) with u uniform from a hash —
    a power-law stand-in for the Zipf fixture (hot key 0 gets ~u^skew mass).
    """
    ev = spark.range(0, n_events, 1, parallelism)
    id_space = max(int(n_docs * 1.25), n_docs + 1)
    u = (F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(1 << 30)) / F.lit(float(1 << 30)))
    idx = F.floor(F.lit(float(id_space)) * F.pow(u, F.lit(skew))).cast("long")
    doc_id = F.format_string("doc%08d", idx)
    r_op = F.pmod(F.xxhash64(F.col("id") * 2 + 7), F.lit(100))
    op = (
        F.when(idx >= n_docs, F.lit("insert"))
        .when(r_op < 89, F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    r_t = F.pmod(F.xxhash64(F.col("id") * 2 + 13), F.lit(4))
    arg = (F.pmod(F.xxhash64(F.col("id") * 2 + 17), F.lit(8)) + 1).cast("int")
    transform = F.when(
        op == "update",
        F.when(r_t == 0, F.lit("append_eos"))
        .when(r_t == 1, F.concat(F.lit("drop_first_k:"), arg.cast("string")))
        .when(r_t == 2, F.concat(F.lit("remap_mod:"), (arg * 100 + 1).cast("string")))
        .otherwise(F.concat(F.lit("truncate:"), arg.cast("string"))),
    )
    ins_len = (F.pmod(F.xxhash64(doc_id), F.lit(512)) + 1).cast("int")
    ins_tokens = F.when(
        op == "insert",
        F.transform(
            F.sequence(F.lit(0), ins_len - 1),
            lambda j: F.pmod(idx * F.lit(2654435761) + j.cast("long"), F.lit(VOCAB)).cast("int"),
        ),
    )
    return ev.select(
        F.col("id").alias("seq"),
        F.pmod(F.xxhash64(doc_id), F.lit(n_parts)).cast("int").alias("part"),
        op.alias("op"),
        doc_id.alias("doc_id"),
        ins_tokens.alias("tokens"),
        transform.alias("transform"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("string").alias("extra"),
    )
