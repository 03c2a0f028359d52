"""Token-array curation operators (operators/tokstats.py, fim_split,
quantile_buckets): semantics on hand-built corpora + plan contracts."""

import math

import pytest
from pyspark.sql import Row, functions as F

from mongo_bulk_data_migration_spark.functions.sampling import quantile_buckets
from mongo_bulk_data_migration_spark.functions.tokens import fim_split
from mongo_bulk_data_migration_spark.operators.tokstats import (
    frequency_remap,
    hash_tokenize,
    ngram_repeats,
    unigram_entropy,
)

from test_plans import formatted


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        Row(doc_id="a", tokens=[5, 5, 5, 9]),
        Row(doc_id="b", tokens=[9, 5, 7]),
        Row(doc_id="c", tokens=[7, 7]),
    ]
    return spark.createDataFrame(rows)


def test_frequency_remap_rank_and_positions(spark, corpus):
    # counts: 5 -> 4x, 7 -> 3x, 9 -> 2x  =>  new ids 0, 1, 2
    out = {r["doc_id"]: r["tokens"] for r in frequency_remap(corpus).collect()}
    assert out == {"a": [0, 0, 0, 2], "b": [2, 0, 1], "c": [1, 1]}


def test_frequency_remap_tie_breaks_by_old_id(spark):
    df = spark.createDataFrame([Row(doc_id="x", tokens=[3, 1, 3, 1])])
    out = frequency_remap(df).collect()[0]["tokens"]
    # equal counts: old id 1 ranks before 3
    assert out == [1, 0, 1, 0]


def test_fim_split_partitions_exactly(spark):
    df = spark.createDataFrame(
        [Row(doc_id=str(i), tokens=list(range(i % 7))) for i in range(50)]
    )
    parts = fim_split(F.col("tokens"), F.col("doc_id"))
    chk = df.select(
        "tokens",
        F.concat(parts["prefix"], parts["middle"], parts["suffix"]).alias("glued"),
        F.size(parts["prefix"]).alias("lp"),
        F.size(parts["middle"]).alias("lm"),
        F.size(parts["suffix"]).alias("ls"),
    ).collect()
    for r in chk:
        assert r["glued"] == r["tokens"]          # lossless 3-way partition
        assert r["lp"] >= 0 and r["lm"] >= 0 and r["ls"] >= 0
        assert r["lp"] + r["lm"] + r["ls"] == len(r["tokens"])


def test_fim_split_deterministic_across_runs(spark):
    df = spark.createDataFrame([Row(doc_id="d42", tokens=list(range(20)))])
    parts = fim_split(F.col("tokens"), F.col("doc_id"))
    a = df.select(parts["middle"].alias("m")).collect()[0]["m"]
    b = df.repartition(4).select(parts["middle"].alias("m")).collect()[0]["m"]
    assert a == b  # pure function of the key, not of partitioning


def test_unigram_entropy_known_values(spark, corpus):
    out = {r["doc_id"]: r for r in unigram_entropy(corpus).collect()}
    # doc a: counts (3,1) over n=4 -> H = ln4 - (3 ln3)/4
    assert out["a"]["n_tok"] == 4 and out["a"]["n_distinct"] == 2
    assert out["a"]["entropy"] == pytest.approx(
        math.log(4) - 3 * math.log(3) / 4, abs=1e-4
    )
    # doc c: single symbol -> zero entropy
    assert out["c"]["entropy"] == 0.0


def test_ngram_repeats_finds_planted_gram(spark):
    shared = list(range(100, 108))
    rows = [
        Row(doc_id="p", tokens=shared + [1, 2]),
        Row(doc_id="q", tokens=[3] + shared),
        Row(doc_id="r", tokens=list(range(50, 80))),  # no overlap
        Row(doc_id="s", tokens=[1, 2, 3]),            # shorter than n
    ]
    out = ngram_repeats(spark.createDataFrame(rows), n=8).collect()
    assert len(out) == 1 and out[0]["n_docs"] == 2 and out[0]["n_occurrences"] == 2


def test_quantile_buckets_monotone_and_balanced(spark):
    df = spark.range(1000).select(F.col("id").alias("v"))
    out = quantile_buckets(df, "v", k=4).collect()
    by_v = sorted((r["v"], r["bucket"]) for r in out)
    assert [b for _, b in by_v] == sorted(b for _, b in by_v)  # monotone in v
    from collections import Counter

    c = Counter(b for _, b in by_v)
    assert set(c) == {1, 2, 3, 4}
    assert max(c.values()) - min(c.values()) <= 2  # near-equal buckets


def test_quantile_buckets_approx_tier_bounded_rank_error(spark):
    """VERDICT r3 #6: the approx_percentile (Greenwald-Khanna) tier must
    agree with the exact tier up to the sketch's rank-error bound.  With
    accuracy A on N rows, each boundary's rank error is <= N/A, so at most
    (k-1) * ceil(N/A) rows can land in a different bucket; assert with 2x
    slack.  Also pins the scale contract: the approx plan stays one
    aggregation + broadcast (no Window/global Sort)."""
    import math

    n, k, acc = 50_000, 10, 10_000
    # skewed, duplicate-heavy values — the hard case for rank sketches
    df = spark.range(n).select(
        (F.pow(F.col("id") % 1000, F.lit(1.7)).cast("long")).alias("v")
    )
    # join-free comparison: bucket is a pure function of v, so compare per v
    ex = {r["v"]: r["bucket"] for r in quantile_buckets(df, "v", k=k).dropDuplicates(["v"]).collect()}
    ap = {r["v"]: r["bucket"] for r in
          quantile_buckets(df, "v", k=k, approx=True, accuracy=acc).dropDuplicates(["v"]).collect()}
    assert set(ex) == set(ap)
    counts = {r["v"]: r["n"] for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()}
    mismatched_rows = sum(counts[v] for v in ex if ex[v] != ap[v])
    bound = 2 * (k - 1) * math.ceil(n / acc)
    assert mismatched_rows <= bound, (mismatched_rows, bound)
    # buckets stay monotone in v under the sketch tier
    mono = sorted(ap.items())
    assert [b for _, b in mono] == sorted(b for _, b in mono)
    # plan contract: same shape as the exact tier
    tree = formatted(quantile_buckets(df, "v", k=k, approx=True, accuracy=acc))
    assert "Window" not in tree
    assert "BroadcastExchange" in tree or "BroadcastNestedLoop" in tree


def test_quantile_buckets_plan_has_no_window_or_global_sort(spark):
    df = spark.range(1000).select(F.col("id").alias("v"))
    tree = formatted(quantile_buckets(df, "v", k=10))
    assert "Window" not in tree
    assert "Sort" not in tree.split("== Physical Plan ==")[1].split("===== Subqueries")[0] \
        or "SortAggregate" in tree  # percentile may sort-agg; never a global Sort+Window
    assert "BroadcastExchange" in tree or "BroadcastNestedLoop" in tree


def test_hash_tokenize_is_shuffle_free(spark):
    df = spark.createDataFrame([Row(doc_id="a", text="the quick brown fox")])
    tree = formatted(df.select(hash_tokenize(F.col("text")).alias("t")))
    assert "Exchange" not in tree


def test_frequency_remap_corpus_never_enters_the_rank_window(spark, corpus):
    """VERDICT r3 #7 plan contract: the two-level distributed rank removed
    the last single-task window — NO SinglePartition exchange anywhere in
    the remap plan (the old plan funneled the whole vocab dim through one
    task; a 5M-token vocabulary now ranks in parallel range partitions)."""
    tree = formatted(frequency_remap(corpus))
    assert "SinglePartition" not in tree
    # rank map still broadcast back onto the corpus; in-partition rank
    # window partitioned by the range-partition id
    assert "BroadcastExchange" in tree
    assert tree.count("Window") >= 1
    assert "rangepartitioning" in tree.lower() or "RangePartitioning" in tree


def test_distributed_rank_matches_naive_window_on_skew(spark):
    """Exact-rank equivalence on a Zipf-skewed vocab (the shape that makes
    count-range bucketing collapse into one hapax bucket)."""
    from mongo_bulk_data_migration_spark.operators.tokstats import _distributed_rank

    vocab = spark.range(5000).select(
        F.col("id").alias("tok"),
        (F.lit(1) + F.floor(5000 / (F.col("id") + 1))).cast("long").alias("n"),
    )
    got = {r["tok"]: r["new_id"]
           for r in _distributed_rank(vocab, [F.desc("n"), F.asc("tok")]).collect()}
    exp = {r["tok"]: i for i, r in enumerate(
        sorted(vocab.collect(), key=lambda r: (-r["n"], r["tok"])))}
    assert got == exp
