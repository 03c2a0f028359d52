"""Sequence packing: concatenate documents into fixed-length training
contexts (GPT-style pretraining packing) — assign each document a
(pack_id, pack_offset) in a contiguous token stream per group, cut every
``ctx`` tokens.

The naive plan — ``Window.partitionBy(group).orderBy(key)`` over the whole
table — funnels every row of a group through ONE task: a scale-killer when a
group ("source") holds billions of documents.  This implementation is a
distributed prefix sum instead:

1. rows are sharded by contiguous key ranges (``shard = floor(key/span)``,
   order-preserving);
2. a local cumulative sum runs per (group, shard) — each shard is an
   independent task;
3. per-shard totals (a tiny frame: one row per shard) get an exclusive
   prefix via a window over shards only, and broadcast-join back;
4. global offset = shard prefix + local cumsum.

Only step 3 is serial, and it is proportional to the number of SHARDS, not
rows.  The same two-phase scan is how massively-parallel engines compute
any ordered prefix aggregate.

Requires an orderable numeric key with a known span (dense ids here); for
arbitrary string keys, derive shard boundaries the way Spark's
RangePartitioner does (sample -> range bounds) and keep everything below
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    n_tok_col: str,
    ctx: int = 2048,
    key_col: str = "doc_id",
    group_col: str = "source",
    shard_span: int = 4096,
) -> DataFrame:
    """Adds ``pack_id`` / ``pack_offset``: the document's position in the
    group's concatenated token stream, cut into ``ctx``-token contexts.

    A document may straddle a cut (standard for pretraining packing: the
    stream is cut every ctx tokens regardless of document boundaries);
    ``pack_id`` is the context its FIRST token lands in.
    """
    shard = F.floor(F.col(key_col) / F.lit(shard_span))
    local_w = (
        Window.partitionBy(group_col, "__shard")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_local = df.withColumn("__shard", shard).withColumn(
        "__local_cum", F.sum(n_tok_col).over(local_w)
    )

    totals = with_local.groupBy(group_col, "__shard").agg(
        F.sum(n_tok_col).alias("__shard_tot")
    )
    prefix_w = (
        Window.partitionBy(group_col)
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = totals.withColumn(
        "__shard_prefix", F.coalesce(F.sum("__shard_tot").over(prefix_w), F.lit(0))
    ).select(group_col, "__shard", "__shard_prefix")

    out = with_local.join(F.broadcast(prefixes), [group_col, "__shard"])
    start = F.col("__shard_prefix") + F.col("__local_cum") - F.col(n_tok_col)
    return out.withColumn("pack_id", F.floor(start / F.lit(ctx))).withColumn(
        "pack_offset", (start % F.lit(ctx)).cast("int")
    ).drop("__shard", "__local_cum", "__shard_prefix")


def chunk_windows(
    df: DataFrame,
    n_tok_col: str,
    window: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Split each document's token span into overlapping context windows
    (window ``window`` tokens, step ``stride``) — the standard long-document
    chunking pass before embedding / fine-tune tokenization.

    One output row per (doc, chunk): ``chunk_id``, ``chunk_start`` (token
    offset), ``chunk_len`` (= window except for the final tail chunk, which
    is shorter but always covers the document end).  Purely row-local
    arithmetic + explode: no shuffle, no Python — scales linearly and keeps
    the document's partition placement (embarrassingly parallel at 100 TB).
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    n = F.col(n_tok_col)
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.floor((n - window + stride - 1) / stride).cast("int") + 1
    )
    out = df.withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
    start = F.col("chunk_id") * stride
    return out.withColumn("chunk_start", start.cast("int")).withColumn(
        "chunk_len", F.least(F.lit(window), n - start).cast("int")
    )
