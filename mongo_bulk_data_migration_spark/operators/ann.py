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


def _sqdist(a, b) -> "F.Column":
    from .dedup_text import dot

    return dot(a, a) + dot(b, b) - 2 * dot(a, b)


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-Flat ANN: coarse-quantize every vector to its nearest reference
    centroid (the inverted lists), then scan only the query's ``nprobe``
    nearest lists for the exact cosine top-k.

    Centroids are the vectors of the first ``n_centroids`` ids —
    deterministic and oracle-checkable; a k-means refinement would only
    change the centroid values, not this assignment/probe plan. At scale the
    table is stored partitioned by list id, so a probe is a partition-pruned
    scan of nprobe/n_centroids of the data.
    """
    cents = {
        int(r[id_col]): [float(x) for x in r[vec_col]]
        for r in df.where(F.col(id_col) < n_centroids).collect()
    }
    if not cents:
        raise ValueError(
            f"ivf_topk: no centroid rows found (no {id_col} < {n_centroids})"
        )
    # __list below is the 1-based ARRAY POSITION in this ordered layout, not
    # the raw centroid id — ids may be sparse (filtered table); map ids to
    # positions everywhere or probes scan the wrong inverted lists (ADVICE r2)
    ordered = sorted(cents)
    pos_of = {cid: p + 1 for p, cid in enumerate(ordered)}
    cent_lits = [F.array(*[F.lit(x) for x in cents[i]]) for i in ordered]
    dists = F.array(*[_sqdist(F.col(vec_col), c) for c in cent_lits])
    assigned = df.withColumn(
        "__list", F.array_position(dists, F.array_min(dists)).cast("int")
    )
    # query's nprobe nearest lists (tiny, driver-side, same arithmetic)
    def pydot(a, b):
        return sum(x * y for x, y in zip(a, b))

    qd = {
        i: pydot(query_vec, query_vec) + pydot(v, v) - 2 * pydot(query_vec, v)
        for i, v in cents.items()
    }
    probes = [pos_of[i] for i, _ in sorted(qd.items(), key=lambda kv: kv[1])[:nprobe]]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.where(F.col("__list").isin(probes))
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("score"))
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
