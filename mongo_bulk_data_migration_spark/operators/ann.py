"""Approximate nearest-neighbor search over an embedding column.

- :func:`brute_force_topk`: exact cosine top-k — the correctness baseline.
  One scan, all-JVM expressions (zip_with dot product), a single
  ``orderBy(desc) limit k`` (Spark executes TakeOrderedAndProject: per
  partition top-k then a k-sized driver merge — no full sort shuffle).
- :func:`lsh_topk`: the scale path — hyperplane-sign bucket index; the query
  probes its own bucket plus Hamming-1 neighbor buckets. At 100 TB the
  bucketed table is the stored index (partition by bucket -> partition
  pruning turns a probe into a few-file scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup_text import cosine, hyperplane_bucket


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 8,
    probe_hamming: int = 1,
) -> DataFrame:
    """Bucketed ANN: scan only the query's bucket + Hamming-<=1 neighbors."""
    bucketed = df.withColumn("__bkt", hyperplane_bucket(F.col(vec_col), dim, n_planes))
    # query bucket computed the same deterministic way, driver-side
    from .dedup_text import _hyperplanes

    planes = _hyperplanes(dim, n_planes)
    qb = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(query_vec, p)) >= 0:
            qb |= 1 << i
    probes = [qb] + ([qb ^ (1 << i) for i in range(n_planes)] if probe_hamming >= 1 else [])
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.where(F.col("__bkt").isin(probes))
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
