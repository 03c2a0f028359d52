"""Structured Streaming tailing mode + compaction maintenance."""

import os

from pyspark.sql import functions as F

from mongo_bulk_data_migration_spark import Catalog
from mongo_bulk_data_migration_spark.simulator import OracleSimulator
from mongo_bulk_data_migration_spark.sources.fixtures import (
    CHANGES_SCHEMA,
    SEQUENCES_SCHEMA,
    make_changes,
    make_sequences,
)
from mongo_bulk_data_migration_spark.streaming.structured import StreamingIngest

from conftest import rows_of


def test_streaming_ingest_file_stream(spark, warehouse, tmp_path):
    """Files landing in a directory -> foreachBatch -> engine protocol; end
    state matches the oracle simulator."""
    n_docs, n_events = 60, 150
    cat = Catalog(warehouse)
    t = cat.create_table("seq", SEQUENCES_SCHEMA, num_buckets=4)
    rows = make_sequences(n_docs)
    t.append(spark.createDataFrame(rows, SEQUENCES_SCHEMA))
    events = make_changes(n_docs, n_events, n_parts=4, n_batches=3)
    sim = OracleSimulator(rows)

    # land each micro-batch as one parquet file in the stream dir
    stream_dir = str(tmp_path / "oplog")
    os.makedirs(stream_dir)
    for b in range(3):
        part = [e for e in events if e["seq"] * 3 // n_events == b]
        spark.createDataFrame(part, CHANGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(stream_dir)
        sim.apply_batch(part)

    stream = (
        spark.readStream.schema(CHANGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    ingest = StreamingIngest(
        spark, warehouse, "seq", "stream1", checkpoint_dir=str(tmp_path / "ckpt"),
        evolve_schema=False,
    )
    q = ingest.start(stream)
    q.awaitTermination(300)

    got = rows_of(cat.load_table("seq").read(spark))
    want = sim.rows()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["doc_id"] == w["doc_id"] and g["tokens"] == w["tokens"]


def test_compaction_bounds_file_count(spark, warehouse):
    cat = Catalog(warehouse)
    t = cat.create_table("seq", SEQUENCES_SCHEMA, num_buckets=2)
    for i in range(6):  # six appends -> >=6 files per bucket
        t.append(spark.createDataFrame(make_sequences(10), SEQUENCES_SCHEMA))
    before = rows_of(t.read(spark))
    n_files_before = len(t.snapshot().files)
    compacted = t.compact(spark, max_files_per_bucket=3)
    assert compacted == 2
    assert len(t.snapshot().files) < n_files_before
    assert rows_of(t.read(spark)) == before


def test_stateful_dedup_by_seq_across_epochs(spark, tmp_path):
    """applyInPandasWithState keyed HWM dedup: duplicates replayed in a LATER
    micro-batch (which per-epoch last-wins cannot see) are dropped; state
    persists across epochs via the checkpoint."""
    from mongo_bulk_data_migration_spark.streaming.stateful import dedup_by_seq

    stream_dir = str(tmp_path / "ev")
    os.makedirs(stream_dir)
    batch1 = [(0, 0, "update", "a"), (1, 0, "update", "b"), (2, 1, "update", "a")]
    # batch 2 replays seqs 0-2 (late duplicates) and adds fresh 3-4
    batch2 = batch1 + [(3, 1, "update", "b"), (4, 0, "update", "a")]
    schema = "seq long, part int, op string, doc_id string"
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(stream_dir)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(stream_dir)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_dir)
    )
    q = (
        dedup_by_seq(stream, key="doc_id", seq="seq")
        .writeStream.format("memory")
        .queryName("deduped")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted((r["doc_id"], r["seq"]) for r in spark.sql("SELECT * FROM deduped").collect())
    # each (key, seq) exactly once despite the full replay in batch 2
    assert got == [("a", 0), ("a", 2), ("a", 4), ("b", 1), ("b", 3)]


def test_stateful_dedup_chunk_order_independent(spark, tmp_path):
    """ADVICE r2 regression: with tiny Arrow batches a group arrives as many
    chunks, and chunk order is not seq-ordered — a fresh event in a later
    chunk whose seq is below an earlier chunk's max must NOT be dropped."""
    from mongo_bulk_data_migration_spark.streaming.stateful import dedup_by_seq

    stream_dir = str(tmp_path / "ev")
    os.makedirs(stream_dir)
    # one key, one micro-batch, seqs deliberately out of order: 4 first
    rows = [(4, 0, "update", "a"), (2, 0, "update", "a"), (3, 0, "update", "a")]
    schema = "seq long, part int, op string, doc_id string"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(stream_dir)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        stream = spark.readStream.schema(schema).parquet(stream_dir)
        q = (
            dedup_by_seq(stream, key="doc_id", seq="seq")
            .writeStream.format("memory")
            .queryName("deduped_chunks")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = sorted(r["seq"] for r in spark.sql("SELECT * FROM deduped_chunks").collect())
    assert got == [2, 3, 4]
