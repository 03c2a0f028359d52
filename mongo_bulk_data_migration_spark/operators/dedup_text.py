"""Corpus deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale notes (the whole point of each design):

- exact: one hash-groupBy — map-side partial agg, no driver involvement.
- MinHash/LSH: signatures are built per-row from built-in higher-order
  functions (shingle -> k seeded xxhash64 mins), then candidates come from a
  *band-bucket equi-join* — the classic trick that turns an O(n^2) similarity
  scan into a shuffle on band keys.  Only candidate pairs get verified.
- SimHash: pure JVM expressions (md5-derived 64-bit word hash, single-pass
  bit-vote fold via higher-order functions) — one 64-bit sketch per doc;
  near-dups share the sketch bucket.  No Python in the path at all.
- embedding near-dup: seeded random-hyperplane signs bucket the vectors;
  cosine verified only within buckets.

All randomness is seeded/deterministic (no Math.random analog — replays are
stable, as the exactly-once contract requires).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per normalized-content fingerprint."""
    from ..functions.text import fingerprint

    return (
        df.withColumn("__fp", fingerprint(F.col(text_col)))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
        .drop("__fp")
    )


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------


def shingles(text: Column, k: int = 5) -> Column:
    """Character k-gram set (distinct) of the normalized text."""
    norm = F.lower(F.regexp_replace(F.trim(text), "\\s+", " "))
    n = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(norm, i, k))
    return F.array_distinct(grams)


def minhash_signature(sh: Column, num_hashes: int = 16) -> Column:
    """k seeded min-hashes of the shingle set — array<long> signature."""
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_signature_md5(sh: Column, num_hashes: int = 16) -> Column:
    """md5-seeded min-hash signature (array<string>) — slower than xxhash64
    but reproducible in ANSI SQL, so the LSH pipeline is oracle-checkable."""
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.md5(F.concat(s, F.lit(str(i))))))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing >=1 LSH band bucket.

    ``hash_fn='xxhash64'`` is the scale path; ``'md5'`` computes the same
    banding from md5 minima (ANSI-SQL-reproducible, used by the driver
    oracle)."""
    rows_per_band = num_hashes // bands
    sh = shingles(F.col(text_col), shingle_k)
    if hash_fn == "md5":
        sig_col = minhash_signature_md5(sh, num_hashes)
        bucket_of = lambda b: F.md5(  # noqa: E731
            F.concat_ws(
                "|", *[F.col("__sig").getItem(b * rows_per_band + r) for r in range(rows_per_band)]
            )
        )
    else:
        sig_col = minhash_signature(sh, num_hashes)
        bucket_of = lambda b: F.xxhash64(  # noqa: E731
            *[F.col("__sig").getItem(b * rows_per_band + r) for r in range(rows_per_band)]
        ).cast("string")
    sig = df.select(F.col(id_col), sig_col.alias("__sig"))
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), bucket_of(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (all pairs if None —
    only for small verification sets; at scale always pass LSH candidates)."""
    sh = df.select(F.col(id_col), shingles(F.col(text_col), shingle_k).alias("__sh"))
    if candidates is None:
        a, b = sh.alias("a"), sh.alias("b")
        pairs = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}")).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.__sh").alias("sh_a"),
            F.col("b.__sh").alias("sh_b"),
        )
    else:
        pairs = (
            candidates.join(sh.withColumnRenamed(id_col, "id_a"), "id_a")
            .withColumnRenamed("__sh", "sh_a")
            .join(
                sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b")), "id_b"
            )
        )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        pairs.withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1)), 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash (pure JVM expressions — whole-stage codegen, zero Python)
# ---------------------------------------------------------------------------
#
# word hash = first 8 bytes of md5(word), big-endian, as a signed 64-bit int.
# Chosen over xxhash64 because it is reproducible in ANSI SQL
# (DuckDB: ('0x' || substr(md5(w), 1, 16))::UBIGINT), so the sketch is
# oracle-checkable, while staying entirely JVM-side in Spark.


def _simhash_words(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+"),
        lambda x: x != "",
    )


def simhash_votes(text: Column) -> Column:
    """array<int>[64] of per-bit votes (sum over words of +-1 per bit).

    Single pass over the word array: ``aggregate`` with an array accumulator,
    ``zip_with`` folding each word's 64 bit signs in. All codegen'd."""
    hs = F.transform(
        _simhash_words(text),
        lambda w: F.conv(F.substring(F.md5(w), 1, 16), 16, -10).cast("long"),
    )

    def bits(h: Column) -> Column:
        return F.array(
            *[
                (F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) * 2 - 1).cast("int")
                for b in range(64)
            ]
        )

    return F.aggregate(
        hs,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(acc, bits(h), lambda a, b: a + b),
    )


def simhash_from_votes(votes: Column) -> Column:
    """Fold the 64-vote array into the signed 64-bit sketch (bitwise OR of
    2^b for every positive vote — no additive overflow, ANSI-safe)."""
    from functools import reduce

    terms = [
        F.when(
            F.element_at(votes, b + 1) > 0,
            F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(64)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def with_simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    """Attach the 64-bit SimHash sketch. Two projections so the vote array is
    evaluated once (not re-expanded into each of the 64 sketch terms)."""
    return (
        df.withColumn("__votes", simhash_votes(F.col(text_col)))
        .withColumn(out_col, simhash_from_votes(F.col("__votes")))
        .drop("__votes")
    )


def simhash_sql(text_expr: str = "text") -> tuple[str, str]:
    """(hash-list expr, sketch expr over alias ``__hs``) in ANSI/DuckDB SQL
    computing the identical sketch — the oracle generator."""
    ws = f"list_filter(string_split_regex(trim(lower(coalesce({text_expr},''))), '\\s+'), x -> x <> '')"
    hs = f"list_transform({ws}, x -> ('0x'||substr(md5(x),1,16))::UBIGINT)"
    terms = []
    for b in range(64):
        v = f"list_sum(list_transform(__hs, h -> CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END))"
        terms.append(f"CASE WHEN coalesce({v},0) > 0 THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END")
    sk = " + ".join(terms)
    signed = (
        f"(CASE WHEN ({sk}) >= 9223372036854775808::HUGEINT "
        f"THEN ({sk}) - 18446744073709551616::HUGEINT ELSE ({sk}) END)::BIGINT"
    )
    return hs, signed


def simhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group docs by identical SimHash sketch (near-dup bucket)."""
    return (
        with_simhash(df, text_col, "simhash")
        .groupBy("simhash")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (hyperplane LSH buckets)
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG, no numpy needed
    JVM-side: they are baked in as literals)."""
    planes = []
    state = seed * 6364136223846793005 + 1442695040888963407
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            v.append((state / float(1 << 63)) * 2.0 - 1.0)
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def hyperplane_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Sign-bit bucket id from seeded hyperplanes (int in [0, 2^n_planes))."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        lit_p = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(dot(vec, lit_p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket.cast("int")


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 8,
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate vector pairs: bucket by hyperplane signs, verify cosine
    within buckets only (candidate set ~ n^2 / 2^planes per bucket)."""
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bucket(F.col(vec_col), dim, n_planes).alias("__bkt"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__bkt") == F.col("b.__bkt")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6).alias("cos"),
    )
    return pairs.where(F.col("cos") >= threshold)


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Training documents sharing >= 1 character k-gram with a benchmark set
    (decontamination before pretraining).

    Plan shape for 100 TB: the BENCHMARK side is always small (eval suites
    are), so its distinct gram set broadcasts; the corpus side explodes its
    grams and left-semi joins against the broadcast — the big side never
    shuffles and short-circuits per partition. For very long documents the
    production variant hashes grams to int64 (``xxhash64``) to shrink the
    exploded width; this oracle-checked form keeps raw grams so the exact
    same join reproduces in ANSI SQL.
    """
    b = (
        benchmark.select(F.explode(shingles(F.col(text_col), k)).alias("__g"))
        .distinct()
    )
    d = docs.select(id_col, F.explode(shingles(F.col(text_col), k)).alias("__g"))
    return d.join(F.broadcast(b), "__g", "left_semi").select(id_col).distinct()
