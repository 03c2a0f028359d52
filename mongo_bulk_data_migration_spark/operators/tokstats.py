"""Token-array corpus statistics / curation operators.

Beyond-reference training-data-pipeline operators over the engine's native
payload shape (``doc_id``, ``tokens:array<int>`` — BASELINE input_hint): the
operations a pretraining data pipeline runs between ingest (the CDC engine,
plans/) and packing (operators/packing.py).

Scale notes (each design's 100 TB story):

- ``hash_tokenize``: pure per-row higher-order expression (split -> md5
  bucket per word) — whole-stage codegen, zero shuffle.  md5 rather than
  xxhash64 so the token ids are reproducible in ANSI SQL (same trade as
  functions/sampling.py — md5 is a determinism device, not a speed choice;
  swap xxhash64 at production scale and the oracle becomes a pytest golden).
- ``frequency_remap``: re-id the vocabulary by corpus frequency rank (the
  standard "sort vocab by count" re-index before training).  The corpus is
  exploded ONCE into (doc, pos, tok); the vocab dim that comes out of the
  hash-agg is BOUNDED (|V| ~ 32k-5M rows even at 100 TB), so ranking it with
  a single-task window is the same bounded-driver-work class as collecting
  k-means centroids — the corpus itself never passes through that window.
  The rank map broadcast-joins back onto the exploded corpus (map-side, no
  corpus shuffle) and docs reassemble with one groupBy(doc) — the only
  corpus-wide shuffle, same cost class as tokenization itself.
- ``unigram_entropy``: two-level hash aggregation ((doc,tok) then doc) —
  both map-side-combinable; Zipf token skew is absorbed by the first level
  because (doc,tok) keys are near-unique.
- ``ngram_repeats``: cross-document repeated token n-grams (memorisation /
  boilerplate risk).  Grams are built per-row with slice-over-sequence
  higher-order functions and keyed by md5 digest, so the shuffle key is a
  fixed-width string, not an array; the groupBy(gram) hash-agg counts
  distinct docs with map-side partials.  Output is top-k — TakeOrdered, no
  global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _md5_long(col: Column) -> Column:
    """First 8 md5 hex chars as a non-negative long (ANSI-reproducible:
    DuckDB ``('0x'||substr(md5(x),1,8))::UBIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hash_tokenize(text: Column, vocab_n: int = 32768) -> Column:
    """Deterministic word-hash tokenizer: ``array<int>`` of per-word md5
    buckets in [0, vocab_n).  The synthetic stand-in for a real BPE encoder
    (no tokenizer libs in this container) with the same distributional shape
    (Zipf words -> Zipf ids) and exact SQL reproducibility."""
    return F.transform(
        F.split(F.trim(text), " "),
        lambda w: (_md5_long(w) % vocab_n).cast("int"),
    )


def hash_tokenize_sql(text_expr: str = "text", vocab_n: int = 32768) -> str:
    """The DuckDB twin of :func:`hash_tokenize` (oracle parity)."""
    return (
        f"list_transform(string_split(trim({text_expr}), ' '), "
        f"w -> (('0x' || substr(md5(w), 1, 8))::UBIGINT % {vocab_n})::INT)"
    )


# ---------------------------------------------------------------------------
# vocabulary frequency re-index
# ---------------------------------------------------------------------------


def _distributed_rank(dim: DataFrame, order: list[Column]) -> DataFrame:
    """Exact dense 0-based global rank of ``dim`` rows under a strict total
    ``order``, with NO single-partition window (VERDICT r3 #7).

    Two-level: (1) ``repartitionByRange`` over the sort key assigns
    order-contiguous ranges to ascending partition ids (sampled boundaries —
    balanced even under Zipf count skew, where a count-range bucketing would
    put half the vocabulary in the hapax bucket); (2) ``row_number`` within
    each partition (window partitioned by the captured partition id — every
    partition ranks in parallel); (3) per-partition row counts (a <=P-row
    dim) prefix-summed with a broadcast self-join, no window at all; rank =
    partition offset + in-partition row_number - 1.  This is the classic
    distributed zipWithIndex, expressed declaratively.

    Returns ``dim``'s columns plus ``new_id`` (int).  ``order`` must be a
    strict total order (no ties) for the result to be deterministic.
    """
    sess = dim.sparkSession
    n_parts = int(sess.conf.get("spark.sql.shuffle.partitions", "200"))
    parts = dim.repartitionByRange(n_parts, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("__pid").orderBy(*order)
    in_rank = parts.withColumn("__r", F.row_number().over(w_in))
    totals = parts.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
    offs = (
        totals.alias("a")
        .join(
            F.broadcast(totals.alias("b")),
            F.col("b.__pid") < F.col("a.__pid"),
            "left",
        )
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(F.coalesce(F.sum("b.__c"), F.lit(0)).alias("__off"))
    )
    return (
        in_rank.join(F.broadcast(offs), "__pid")
        .withColumn("new_id", (F.col("__off") + F.col("__r") - 1).cast("int"))
        .drop("__pid", "__r", "__off")
    )


def frequency_remap(
    df: DataFrame, key_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """Re-id every token by corpus frequency rank (most frequent -> 0,
    ties broken by old id asc).  Returns (key_col, tokens_col) with the
    remapped array — positions preserved.

    Plan: explode once -> vocab hash-agg (bounded dim) -> rank the DIM with
    a two-level distributed rank (range-partition by the sort key, row_number
    within each partition, offset by the partition-count prefix sums — the
    classic distributed zipWithIndex; NO single-task window even over the
    dim, so a 5M-token vocabulary ranks in parallel) -> broadcast the rank
    map back -> reassemble via groupBy(doc) + array_sort over (pos, id)
    structs.  One corpus shuffle total.
    """
    toks = df.select(key_col, F.posexplode(tokens_col).alias("pos", "tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    rank_map = _distributed_rank(
        vocab, order=[F.desc("n"), F.asc("tok")]
    ).select("tok", "new_id")
    return (
        toks.join(F.broadcast(rank_map), "tok")
        .groupBy(key_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "new_id"))).alias("__ps"))
        .select(
            key_col,
            F.transform("__ps", lambda s: s["new_id"]).alias(tokens_col),
        )
    )


# ---------------------------------------------------------------------------
# per-document unigram entropy
# ---------------------------------------------------------------------------


def unigram_entropy(
    df: DataFrame, key_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """Shannon entropy (nats) of each document's token distribution plus
    distinct-token count — the classic diversity / degenerate-repetition
    signal.  H = ln(N) - sum(c*ln(c))/N over per-doc token counts c."""
    e = df.select(key_col, F.explode(tokens_col).alias("tok"))
    c = e.groupBy(key_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    return c.groupBy(key_col).agg(
        F.sum("c").cast("int").alias("n_tok"),
        F.count(F.lit(1)).cast("int").alias("n_distinct"),
        F.round(
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
            / F.sum("c").cast("double"),
            4,
        ).alias("entropy"),
    )


# ---------------------------------------------------------------------------
# cross-document repeated token n-grams
# ---------------------------------------------------------------------------


def ngram_repeats(
    df: DataFrame,
    key_col: str = "doc_id",
    tokens_col: str = "tokens",
    n: int = 8,
    top_k: int = 20,
) -> DataFrame:
    """Top-k token n-grams shared by >= 2 distinct documents: (gram_md5,
    n_docs, n_occurrences), ordered (n_docs desc, n_occurrences desc,
    gram_md5 asc) for a deterministic top-k cut.

    The gram key is the md5 of the comma-joined ids — fixed-width shuffle
    key instead of an array<int> (smaller exchange, sane hash partitioning).
    """
    size = F.size(tokens_col)
    grams = df.select(
        key_col,
        F.explode(
            F.when(
                size >= n,
                F.transform(
                    F.sequence(F.lit(0), size - F.lit(n)),
                    lambda i: F.md5(
                        F.concat_ws(
                            ",", F.slice(tokens_col, i + F.lit(1), F.lit(n)).cast("array<string>")
                        )
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram_md5"),
    )
    agg = grams.groupBy("gram_md5").agg(
        F.count_distinct(key_col).cast("int").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
    )
    return (
        agg.filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), F.asc("gram_md5"))
        .limit(top_k)
    )
