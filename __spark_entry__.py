"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)`  — flagship CDC merge-apply on sf0.001 (engine end-to-end).
`queries()`     — one entry per implemented operator family (SURVEY.md §2 +
                  training-data-pipeline ops); each (spark, sf_dir) -> DataFrame.
`oracle_sql()`  — DuckDB-equivalent ANSI SQL per query (omitted only for
                  genuinely non-SQL ops: pandas-UDF sketches, multimodal stubs).

Column names and types are aligned 1:1 between each query and its oracle.
Float outputs are either passthrough (hash-stable) or computed with the same
fold order in both engines and rounded.
"""

from __future__ import annotations

import os
import sys
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DEFAULT = "/root/testdata/sf0.001"


# metadata-only cache: parquet FOOTER schemas per (dir, table).  Each bare
# spark.read.parquet() pays a driver-side footer read + schema inference per
# call; the schema is immutable for a given fixture dir, so later reads pass
# it explicitly.  (No data or results are cached — scans still hit parquet.)
_SCHEMA_CACHE: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    sch = _SCHEMA_CACHE.get(path)
    if sch is None:
        sch = spark.read.parquet(path).schema
        _SCHEMA_CACHE[path] = sch
    return spark.read.schema(sch).parquet(path)


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# ---------------------------------------------------------------------------
# flagship: deterministic single-batch CDC merge over a derived sequences
# table — the engine end-to-end (LakeTable + last-wins + in-join transforms +
# changelog + MERGE), oracle-checked against pure ANSI SQL.
# ---------------------------------------------------------------------------

_MIX = 2654435761
_VOCAB = 50257


def _cdc_frames(spark: SparkSession, sf_dir: str, hot_keys: bool = False):
    """Derive (sequences, events) deterministically from documents count.

    ``hot_keys=True`` routes 30% of all events to doc 0 (a single Zipf-head
    hot key) — the north rule's skewed-doc_id stress shape."""
    n_docs = _t(spark, sf_dir, "documents").count()
    n_events = 2 * n_docs
    id_space = n_docs + n_docs // 4

    ids = spark.range(0, n_docs, 1, 8)
    length = (F.lit(1) + F.pmod(F.col("id"), F.lit(512))).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda j: F.pmod(F.col("id") * _MIX + j.cast("long"), F.lit(_VOCAB)).cast("int"),
    )
    seqs = ids.select(
        F.format_string("doc%08d", "id").alias("doc_id"),
        tokens.alias("tokens"),
        length.alias("n_tok"),
        F.element_at(
            F.array(F.lit("web"), F.lit("books"), F.lit("code"), F.lit("wiki")),
            (F.pmod(F.col("id"), F.lit(4)) + 1).cast("int"),
        ).alias("source"),
    )

    ev = spark.range(0, n_events, 1, 8)
    idx = F.pmod(F.col("id") * _MIX + 12345, F.lit(id_space))
    if hot_keys:
        idx = F.when(F.pmod(F.col("id"), F.lit(10)) < 3, F.lit(0)).otherwise(idx)
    op = (
        F.when(idx >= n_docs, F.lit("insert"))
        .when(F.pmod(F.col("id"), F.lit(10)) < 8, F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    karg = (F.lit(1) + F.pmod(F.col("id"), F.lit(7))).cast("int")
    marg = (F.lit(101) + F.pmod(F.col("id"), F.lit(7)) * 100).cast("int")
    tsel = F.pmod(F.col("id"), F.lit(5))
    transform = F.when(
        op == "update",
        F.when(tsel == 0, F.lit("append_eos"))
        .when(tsel == 1, F.concat(F.lit("drop_first_k:"), karg.cast("string")))
        .when(tsel == 2, F.concat(F.lit("remap_mod:"), marg.cast("string")))
        .when(tsel == 3, F.lit("set_tokens"))
        .otherwise(F.concat(F.lit("truncate:"), karg.cast("string"))),
    )
    pay_len = (F.lit(1) + F.pmod(F.col("id"), F.lit(9))).cast("int")
    payload = F.when(
        (op == "insert") | (transform == "set_tokens"),
        F.transform(
            F.sequence(F.lit(0), pay_len - 1),
            lambda j: F.pmod(idx * _MIX + j.cast("long"), F.lit(_VOCAB)).cast("int"),
        ),
    )
    events = ev.select(
        F.col("id").alias("seq"),
        F.pmod(idx, F.lit(8)).cast("int").alias("part"),
        op.alias("op"),
        F.format_string("doc%08d", idx).alias("doc_id"),
        payload.alias("tokens"),
        transform.alias("transform"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("string").alias("extra"),
    )
    return seqs, events, n_events


def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end engine run: replay the derived event batch into a LakeTable
    via ChangeStreamReplayer, return the post-merge table."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.sources.fixtures import SEQUENCES_SCHEMA
    from mongo_bulk_data_migration_spark.streaming.replay import ChangeStreamReplayer

    seqs, events, n_events = _cdc_frames(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix="mbdm_entry_")
    cat = Catalog(wh)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets=16)
    t.append(seqs)
    rep = ChangeStreamReplayer(spark, wh, "sequences", "entry", evolve_schema=False)
    rep.apply_changes(events, events_per_batch=max(n_events, 1))
    return t.read(spark).select("doc_id", _tokens_digest("tokens"), "n_tok", "source")


def _tokens_digest(col: str):
    """Sort-stable scalar digest of an array<int> column (the driver's
    canonicalizer sorts on every column and cannot hash raw lists)."""
    return F.md5(F.concat_ws(",", F.col(col).cast("array<string>"))).alias("tokens_md5")


def q_cdc_merge_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read mode, driver-verified: same replay as cdc_merge but the
    table commits delta layers (changed rows + tombstones) instead of
    rewriting buckets; the scan resolves layers last-wins at read time.
    Asserts deltas actually exist (read-time resolution is exercised, not
    compacted away) and must hash-match the same ANSI-SQL oracle."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.sources.fixtures import SEQUENCES_SCHEMA
    from mongo_bulk_data_migration_spark.streaming.replay import ChangeStreamReplayer

    seqs, events, n_events = _cdc_frames(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix="mbdm_mor_")
    cat = Catalog(wh)
    t = cat.create_table(
        "sequences", SEQUENCES_SCHEMA, num_buckets=16,
        properties={"merge_mode": "mor"},
    )
    t.append(seqs)
    rep = ChangeStreamReplayer(spark, wh, "sequences", "mor", evolve_schema=False)
    rep.apply_changes(events, events_per_batch=max(n_events, 1))
    assert t.delta_layers() > 0, "merge-on-read produced no delta layers"
    return t.read(spark).select("doc_id", _tokens_digest("tokens"), "n_tok", "source")


def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online schema evolution mid-replay, driver-verified: the event batch
    drifts from the table's creation schema in two ways — it carries a new
    scalar payload column ``extra`` (-> online ADD COLUMN, old rows read
    NULL) and its ``tokens`` arrive as array<long> instead of array<int>
    (-> online WIDEN COLUMN, metadata-only, old files upcast on read).
    The post-merge table, including the evolved column, must match the pure
    ANSI-SQL oracle. Mirrors the north rule's "schema evolution (added
    columns, widened types) applied online" requirement end-to-end."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.sources.fixtures import SEQUENCES_SCHEMA
    from mongo_bulk_data_migration_spark.streaming.replay import ChangeStreamReplayer

    seqs, events, n_events = _cdc_frames(spark, sf_dir)
    events = events.withColumn("tokens", F.col("tokens").cast("array<long>")).withColumn(
        "extra",
        F.when(
            (F.pmod(F.col("seq"), F.lit(3)) == 0) & (F.col("op") != "delete"),
            F.format_string("x%d", F.pmod(F.col("seq"), F.lit(23)).cast("int")),
        ),
    )
    wh = tempfile.mkdtemp(prefix="mbdm_evo_")
    cat = Catalog(wh)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets=16)
    t.append(seqs)
    rep = ChangeStreamReplayer(spark, wh, "sequences", "evo", evolve_schema=True)
    rep.apply_changes(events, events_per_batch=max(n_events, 1))
    import pyspark.sql.types as T

    fld = {f.name: f.dataType for f in cat.load_table("sequences").schema.fields}
    assert fld["tokens"] == T.ArrayType(T.LongType()), "tokens not widened"
    assert fld.get("extra") == T.StringType(), "extra not added"
    return t.read(spark).select(
        "doc_id", _tokens_digest("tokens"), "n_tok", "source", "extra"
    )


_CDC_ORACLE = """
WITH p AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
seqs AS (
  SELECT printf('doc%08d', i) AS doc_id,
         list_transform(generate_series(0, (1 + i % 512) - 1),
                        j -> ((i * 2654435761 + j) % 50257)::INT) AS tokens,
         (1 + i % 512)::INT AS n_tok,
         (['web','books','code','wiki'])[(i % 4) + 1] AS source
  FROM (SELECT unnest(generate_series(0, (SELECT n_docs FROM p) - 1)) AS i)
),
ev AS (
  SELECT e AS seq,
         (e * 2654435761 + 12345) % (SELECT n_docs + n_docs // 4 FROM p) AS idx
  FROM (SELECT unnest(generate_series(0, (SELECT 2 * n_docs FROM p) - 1)) AS e)
),
events AS (
  SELECT seq, idx, printf('doc%08d', idx) AS doc_id,
    CASE WHEN idx >= (SELECT n_docs FROM p) THEN 'insert'
         WHEN seq % 10 < 8 THEN 'update' ELSE 'delete' END AS op,
    CASE WHEN seq % 5 = 0 THEN 'append_eos'
         WHEN seq % 5 = 1 THEN 'drop_first_k'
         WHEN seq % 5 = 2 THEN 'remap_mod'
         WHEN seq % 5 = 3 THEN 'set_tokens'
         ELSE 'truncate' END AS tname,
    (1 + seq % 7)::INT AS karg,
    (101 + (seq % 7) * 100)::INT AS marg,
    list_transform(generate_series(0, (1 + seq % 9) - 1),
                   j -> ((idx * 2654435761 + j) % 50257)::INT) AS payload
  FROM ev
),
collapsed AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
    FROM events) WHERE rn = 1
),
merged AS (
  SELECT
    coalesce(s.doc_id, c.doc_id) AS doc_id,
    CASE
      WHEN c.doc_id IS NULL THEN s.tokens
      WHEN c.op = 'insert' THEN c.payload
      WHEN c.op = 'update' AND s.doc_id IS NOT NULL THEN
        CASE c.tname
          WHEN 'append_eos' THEN list_append(s.tokens, 50256::INT)
          WHEN 'drop_first_k' THEN s.tokens[c.karg + 1:]
          WHEN 'remap_mod' THEN list_transform(s.tokens, t -> (t % c.marg)::INT)
          WHEN 'set_tokens' THEN c.payload
          ELSE s.tokens[:c.karg]
        END
    END AS new_tokens,
    s.source AS s_source,
    c.op AS op, s.doc_id AS s_doc
  FROM seqs s FULL OUTER JOIN collapsed c ON s.doc_id = c.doc_id
)
SELECT doc_id,
       md5(coalesce(array_to_string(new_tokens::INT[], ','), '')) AS tokens_md5,
       len(new_tokens)::INT AS n_tok,
       CASE WHEN op = 'insert' AND s_doc IS NULL THEN NULL ELSE s_source END AS source
FROM merged
WHERE NOT coalesce(op = 'delete' AND s_doc IS NOT NULL, false)          -- matched deletes drop
  AND NOT coalesce(op IN ('update','delete') AND s_doc IS NULL, false)  -- unmatched upd/del no-op
"""

def q_cdc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tailing mode (SURVEY.md §2.10) driver-verified:
    the same derived event log lands as 4 key-partitioned parquet files in a
    stream-source dir; StreamingIngest tails it (maxFilesPerTrigger=1 -> 4
    micro-batch epochs) through foreachBatch into the full engine protocol
    (collapse -> changelog -> MERGE -> HWM). Epochs partition the KEY space,
    so the final table equals the single-collapse oracle (_CDC_ORACLE). A
    second availableNow run over the same checkpoint must be a no-op —
    exactly-once across stream restarts, asserted on the snapshot version."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.sources.fixtures import SEQUENCES_SCHEMA
    from mongo_bulk_data_migration_spark.streaming.structured import StreamingIngest

    seqs, events, n_events = _cdc_frames(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix="mbdm_stream_")
    src_dir = os.path.join(wh, "_incoming")
    events.repartition(4, "doc_id").write.parquet(src_dir)
    cat = Catalog(wh)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets=16)
    t.append(seqs)

    def _tail():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        ing = StreamingIngest(
            spark, wh, "sequences", "stream",
            checkpoint_dir=os.path.join(wh, "_ckpt"), evolve_schema=False,
        )
        q = ing.start(stream)
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("cdc_stream ingest did not finish in 600s")

    _tail()
    v1 = cat.load_table("sequences").current_version()
    _tail()  # restart from checkpoint: no new files -> zero new commits
    assert cat.load_table("sequences").current_version() == v1, "restart not exactly-once"
    return t.read(spark).select("doc_id", _tokens_digest("tokens"), "n_tok", "source")


def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel through the driver gate: after the full CDC
    replay rewrote the table, reading the pre-replay snapshot version must
    return the exact initial table (atomic-manifest versioning; the
    rename-swap rollback analog the reference's DELETE_COLLECTION relies
    on). Oracle = the initial sequences alone."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.sources.fixtures import SEQUENCES_SCHEMA
    from mongo_bulk_data_migration_spark.streaming.replay import ChangeStreamReplayer

    seqs, events, n_events = _cdc_frames(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix="mbdm_tt_")
    cat = Catalog(wh)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets=16)
    t.append(seqs)
    v_initial = t.current_version()
    rep = ChangeStreamReplayer(spark, wh, "sequences", "tt", evolve_schema=False)
    rep.apply_changes(events, events_per_batch=max(n_events, 1))
    assert t.current_version() > v_initial, "replay committed no snapshots"
    return t.read(spark, version=v_initial).select(
        "doc_id", _tokens_digest("tokens"), "n_tok", "source"
    )


_TIME_TRAVEL_ORACLE = (
    _CDC_ORACLE.split("\nev AS (")[0].rstrip().rstrip(",")
    + """
SELECT doc_id, md5(array_to_string(tokens::INT[], ',')) AS tokens_md5, n_tok, source
FROM seqs
"""
)


# schema-evolution oracle: same merge algebra as _CDC_ORACLE plus the drifted
# `extra` payload column (NULL for rows the batch did not touch — exactly the
# online ADD COLUMN read semantics; tokens widening does not change the digest)
_EVO_ORACLE = _CDC_ORACLE.replace(
    "  FROM ev\n),",
    """       ,CASE WHEN seq % 3 = 0 AND NOT (CASE WHEN idx >= (SELECT n_docs FROM p) THEN 'insert'
                                                  WHEN seq % 10 < 8 THEN 'update' ELSE 'delete' END) = 'delete'
             THEN printf('x%d', seq % 23) END AS extra
  FROM ev
),""",
).replace(
    "    c.op AS op, s.doc_id AS s_doc",
    """    CASE WHEN c.op = 'insert' THEN c.extra
         WHEN c.op = 'update' AND s.doc_id IS NOT NULL THEN c.extra
    END AS extra,
    c.op AS op, s.doc_id AS s_doc""",
).replace(
    "       CASE WHEN op = 'insert' AND s_doc IS NULL THEN NULL ELSE s_source END AS source",
    """       CASE WHEN op = 'insert' AND s_doc IS NULL THEN NULL ELSE s_source END AS source,
       extra""",
)


# ---------------------------------------------------------------------------
# relational operator surface (SURVEY.md §2) over the driver tables
# ---------------------------------------------------------------------------


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A4-style aggregation fold (TPC-H Q1 shape, decimal-exact sums)."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    return (
        li.where(F.col("l_quantity") < 50)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,6)") - dec("l_discount"))), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_TPCH_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity::DECIMAL(18,6)), 2)::DOUBLE AS sum_qty,
       round(sum(l_extendedprice::DECIMAL(18,6)), 2)::DOUBLE AS sum_base_price,
       round(sum(l_extendedprice::DECIMAL(18,6) * (1::DECIMAL(18,6) - l_discount::DECIMAL(18,6))), 2)::DOUBLE AS sum_disc_price,
       count(*) AS count_order
FROM lineitem WHERE l_quantity < 50
GROUP BY l_returnflag, l_linestatus
"""


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P3: predicate + projection, pushed to the parquet scan."""
    return (
        _t(spark, sf_dir, "documents")
        .where((F.col("n_chars") > 200) & (F.col("lang") != "en"))
        .select("doc_id", "lang", "n_chars")
    )


_FILTER_PROJECT_ORACLE = """
SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 200 AND lang <> 'en'
"""


def q_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 $lookup shape: per-customer embedded order set (count + sum)."""
    from mongo_bulk_data_migration_spark.operators.lookup import lookup_join

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = lookup_join(cust, orders, "c_custkey", "o_custkey", as_field="orders",
                         broadcast_right=False)
    return joined.select(
        "c_custkey",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round(
            F.aggregate(
                F.col("orders"),
                F.lit(0).cast("decimal(28,6)"),
                # keep the accumulator type stable across the fold
                lambda acc, o: (acc + o["o_totalprice"].cast("decimal(18,6)")).cast("decimal(28,6)"),
            ),
            2,
        ).cast("double").alias("total_spend"),
    )


_LOOKUP_JOIN_ORACLE = """
SELECT c.c_custkey,
       count(o.o_orderkey) AS n_orders,
       round(coalesce(sum(o.o_totalprice::DECIMAL(18,6)), 0), 2)::DOUBLE AS total_spend
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
"""


def q_lookup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + $lookup SUB-PIPELINE passthrough (VERDICT r2 #9): the embedded
    side is filtered and reshaped by an arbitrary pipeline BEFORE embedding
    (the reference forwards `$lookup.pipeline` stages verbatim,
    `MBDM.ts:225-230`) — here: open orders only, projected to their order
    year; the query digests the embedded arrays to count + first year."""
    _utc(spark)
    from mongo_bulk_data_migration_spark.operators.lookup import lookup_join

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = lookup_join(
        cust, orders, "c_custkey", "o_custkey", as_field="open_orders",
        broadcast_right=False,
        right_pipeline=lambda df: df.where(F.col("o_orderstatus") == "O").select(
            "o_custkey", F.year("o_orderdate").cast("int").alias("o_year")
        ),
    )
    return joined.select(
        "c_custkey",
        F.col("n_open_orders").cast("long").alias("n_open"),
        F.array_min(
            F.transform(F.col("open_orders"), lambda o: o["o_year"])
        ).alias("first_year"),
    )


_LOOKUP_PIPELINE_ORACLE = """
SELECT c.c_custkey,
       count(o.o_custkey)::BIGINT AS n_open,
       min(o.o_year)::INT AS first_year
FROM customer c LEFT JOIN (
  SELECT o_custkey, year(o_orderdate)::INT AS o_year
  FROM orders WHERE o_orderstatus = 'O'
) o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
"""


def q_count_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 countDocuments(query) pre-pass."""
    n = (
        _t(spark, sf_dir, "lineitem")
        .where((F.col("l_discount") >= 0.05) & (F.col("l_quantity") < 25))
        .count()
    )
    return spark.createDataFrame([(n,)], "total_entries long")


_COUNT_MATCHING_ORACLE = """
SELECT count(*)::BIGINT AS total_entries FROM lineitem
WHERE l_discount >= 0.05 AND l_quantity < 25
"""


def q_hwm_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/R1: per-partition high-water mark (max key per partition)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("part", F.pmod(F.col("user_id"), F.lit(8)).cast("int"))
        .groupBy("part")
        .agg(F.max("event_id").alias("max_seq"), F.count(F.lit(1)).alias("n_events"))
    )


_HWM_ORACLE = """
SELECT (user_id % 8)::INT AS part, max(event_id) AS max_seq, count(*) AS n_events
FROM events GROUP BY 1
"""


def q_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 last-write-wins collapse (skew-resistant max_by aggregation)."""
    from mongo_bulk_data_migration_spark.operators.dedup import last_wins

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "value")
    lw = last_wins(ev, key="user_id", order="event_id")
    return lw.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


_LAST_WINS_ORACLE = """
SELECT user_id, event_id AS last_event_id, event_type AS last_type, value AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events) WHERE rn = 1
"""


def q_resume_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 resume: events strictly above a high-water mark."""
    ev = _t(spark, sf_dir, "events")
    hwm = ev.agg((F.max("event_id") - 1000).alias("h")).collect()[0]["h"]
    return ev.where(F.col("event_id") > hwm).select("event_id", "user_id", "event_type")


_RESUME_FILTER_ORACLE = """
SELECT event_id, user_id, event_type FROM events
WHERE event_id > (SELECT max(event_id) - 1000 FROM events)
"""


def q_metrics_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 metrics fold: per-class counters."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2).cast("double").alias("sum_value"),
        )
    )


_METRICS_FOLD_ORACLE = """
SELECT event_type, count(*) AS n,
       round(sum(value::DECIMAL(18,6)), 2)::DOUBLE AS sum_value
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# training-data pipeline: dedup / text / similarity
# ---------------------------------------------------------------------------


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 exact resume variant: keys NOT present in the applied set
    (left_anti — the reference's left_anti alternative to `_id > HWM`)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name")


_ANTI_JOIN_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi (EXISTS): customers with at least one high-value order."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return cust.join(
        big.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
    ).select("c_custkey", "c_mktsegment")


_SEMI_JOIN_ORACLE = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window: last 3 events per user (rank over the resume ordering key)."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "event_type", F.col("rn").cast("int").alias("rn"))
    )


_TOPK_ORACLE = """
SELECT user_id, event_id, event_type, rn::INT AS rn FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events) WHERE rn <= 3
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongo_bulk_data_migration_spark.operators.dedup_text import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.col("n_dups").cast("long").alias("n_dups")
    )


_DEDUP_EXACT_ORACLE = """
SELECT min(doc_id) AS doc_id, count(*) AS n_dups FROM documents
GROUP BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongo_bulk_data_migration_spark.functions.text import token_count

    return _t(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )


_TOKEN_COUNT_ORACLE = """
SELECT doc_id,
       CASE WHEN len(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END::INT AS n_tokens
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongo_bulk_data_migration_spark.functions.text import (
        avg_word_len,
        punct_ratio,
        quality_score,
        stopword_ratio,
    )

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        punct_ratio(F.col("text")).alias("punct_ratio"),
        stopword_ratio(F.col("text")).alias("stopword_ratio"),
        avg_word_len(F.col("text")).alias("avg_word_len"),
        quality_score(F.col("text")).alias("quality"),
    )


_TEXT_QUALITY_ORACLE = """
WITH w AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '\\s+') AS ws,
         string_split_regex(trim(lower(text)), '\\s+') AS lws
  FROM documents
)
SELECT doc_id,
  round((len(text) - len(regexp_replace(text, '[\\.,;:!\\?''"()\\[\\]{}-]', '', 'g')))
        / greatest(len(text), 1), 6) AS punct_ratio,
  round(len(list_filter(lws, x -> x IN ('the','and','of','to','a','in','is','that')))
        / greatest(len(ws), 1), 6) AS stopword_ratio,
  round(list_sum(list_transform(ws, x -> len(x)::DOUBLE)) / greatest(len(ws), 1), 6)
        AS avg_word_len,
  round(((CASE WHEN len(text) BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END)
       + (CASE WHEN list_sum(list_transform(ws, x -> len(x)::DOUBLE)) / greatest(len(ws),1)
               BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
       + (CASE WHEN (len(text) - len(regexp_replace(text, '[\\.,;:!\\?''"()\\[\\]{}-]', '', 'g')))
               / greatest(len(text),1) <= 0.2 THEN 1.0 ELSE 0.0 END)) / 3.0, 6) AS quality
FROM w
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongo_bulk_data_migration_spark.functions.text import lang_id

    return _t(spark, sf_dir, "documents").select(
        "doc_id", lang_id(F.col("text")).alias("lang_pred")
    )


def _lang_id_oracle() -> str:
    from mongo_bulk_data_migration_spark.functions.text import LANG_STOPWORDS

    hit = {
        lang: "len(list_filter(lws, x -> x IN ({})))".format(
            ", ".join(f"'{w}'" for w in sws)
        )
        for lang, sws in LANG_STOPWORDS.items()
    }
    # same stable argmax as functions.text.lang_id: iterate sorted langs,
    # strictly-greater wins, 'und' when all zero
    expr = "'und'"
    score = "0"
    for lang in sorted(hit):
        s = hit[lang]
        expr = f"CASE WHEN {s} > ({score}) THEN '{lang}' ELSE {expr} END"
        score = f"CASE WHEN {s} > ({score}) THEN {s} ELSE {score} END"
    return f"""
WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS lws FROM documents)
SELECT doc_id, {expr} AS lang_pred FROM w
"""


def q_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition filters: duplicate-word and
    duplicate-2gram fractions + keep decision.  All JVM higher-order
    functions (split / array_distinct / transform over sequence) — no
    explode, no shuffle, embarrassingly parallel at 100 TB."""
    from mongo_bulk_data_migration_spark.functions.text import (
        dup_2gram_frac,
        dup_word_frac,
        repetition_keep,
    )

    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        dup_word_frac(F.col("text")).alias("dup_word_frac"),
        dup_2gram_frac(F.col("text")).alias("dup_2gram_frac"),
        repetition_keep(F.col("text")).alias("keep"),
    )


_GOPHER_FILTERS_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
),
g AS (
  SELECT doc_id,
    round(1.0 - len(list_distinct(ws)) / greatest(len(ws), 1), 6) AS dwf,
    CASE WHEN len(ws) < 2 THEN 0.0 ELSE
      round(1.0 - len(list_distinct(list_transform(generate_series(1, len(ws) - 1),
                    i -> ws[i] || ' ' || ws[i + 1]))) / (len(ws) - 1), 6)
    END AS d2f
  FROM w
)
SELECT doc_id, dwf AS dup_word_frac, d2f AS dup_2gram_frac,
       (dwf <= 0.98 AND d2f <= 0.6) AS keep
FROM g
"""


def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking (window 32 tokens, stride 24)
    for long-document embedding / fine-tune pipelines.  Row-local arithmetic
    + explode — no shuffle, preserves partition placement."""
    from mongo_bulk_data_migration_spark.operators.packing import chunk_windows

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok")
    )
    return chunk_windows(d, "n_tok", window=32, stride=24).select(
        "doc_id", "n_tok", "chunk_id", "chunk_start", "chunk_len"
    )


_CHUNK_WINDOWS_ORACLE = """
WITH d AS (
  SELECT doc_id, len(string_split(trim(text), ' ')) AS n_tok FROM documents
),
c AS (
  SELECT *, CASE WHEN n_tok <= 32 THEN 1
                 ELSE ((n_tok - 32 + 23) // 24) + 1 END AS n_chunks
  FROM d
)
SELECT doc_id, n_tok::INT AS n_tok,
       unnest(generate_series(0, n_chunks - 1))::INT AS chunk_id
FROM c
"""


def _chunk_windows_oracle() -> str:
    # derive start/len from chunk_id in an outer select (unnest cannot be
    # referenced twice in one projection)
    return f"""
WITH base AS ({_CHUNK_WINDOWS_ORACLE})
SELECT doc_id, n_tok, chunk_id,
       (chunk_id * 24)::INT AS chunk_start,
       least(32, n_tok - chunk_id * 24)::INT AS chunk_len
FROM base
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongo_bulk_data_migration_spark.functions.text import fingerprint

    return _t(spark, sf_dir, "documents").select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )


_FINGERPRINT_ORACLE = """
SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp FROM documents
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-gram Jaccard for consecutive-id pairs (verify stage of the
    dedup pipeline; candidate generation benchmarked separately)."""
    from mongo_bulk_data_migration_spark.operators.dedup_text import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    cand = d.select(F.col("doc_id").alias("id_a")).withColumn("id_b", F.col("id_a") + 1).join(
        d.select(F.col("doc_id").alias("id_b")), "id_b", "inner"
    )
    return ngram_jaccard_pairs(d, candidates=cand, threshold=0.0)


_NGRAM_JACCARD_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         list_distinct([substr(t, i, 5)
                        for i in generate_series(1, greatest(len(t) - 4, 1))]) AS s
  FROM (SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.s, b.s))
             / greatest(len(list_distinct(a.s || b.s)), 1), 6) AS jaccard
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
"""


def q_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature summary per doc (md5-based so the oracle matches;
    the engine's scale path uses xxhash64 — see operators.dedup_text)."""
    from mongo_bulk_data_migration_spark.operators.dedup_text import shingles

    d = _t(spark, sf_dir, "documents")
    sh = shingles(F.col("text"), 5)

    def seed_min(i: int):
        # NB: single-arg lambda only — a two-arg lambda would make transform
        # pass the array index as the second argument
        return F.array_min(F.transform(sh, lambda s: F.md5(F.concat(s, F.lit(str(i))))))

    sig = F.array(*[seed_min(i) for i in range(8)])
    return d.select("doc_id", F.md5(F.concat_ws("|", sig)).alias("band_bucket"))


_MINHASH_BANDS_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         list_distinct([substr(t, i, 5)
                        for i in generate_series(1, greatest(len(t) - 4, 1))]) AS s
  FROM (SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents)
)
SELECT doc_id,
       md5(concat_ws('|',
         list_min(list_transform(s, x -> md5(x || '0'))),
         list_min(list_transform(s, x -> md5(x || '1'))),
         list_min(list_transform(s, x -> md5(x || '2'))),
         list_min(list_transform(s, x -> md5(x || '3'))),
         list_min(list_transform(s, x -> md5(x || '4'))),
         list_min(list_transform(s, x -> md5(x || '5'))),
         list_min(list_transform(s, x -> md5(x || '6'))),
         list_min(list_transform(s, x -> md5(x || '7'))))) AS band_bucket
FROM sh
"""


def q_lsh_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup pipeline: MinHash-LSH band-bucket candidate join
    (NOT all-pairs) -> exact n-gram Jaccard verify on candidates only.
    md5-hash variant so the whole pipeline is oracle-checked; the scale path
    swaps hash_fn='xxhash64'."""
    from mongo_bulk_data_migration_spark.operators.dedup_text import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(d, num_hashes=16, bands=4, hash_fn="md5")
    return ngram_jaccard_pairs(d, candidates=cand, threshold=0.5)


def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining sequence packing via distributed prefix sum (see
    operators/packing.py): per-source concatenated token stream cut every
    2048 tokens — NO whole-group window, shard-local cumsums + a tiny
    shard-prefix broadcast."""
    from mongo_bulk_data_migration_spark.operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok"),
    )
    return pack_sequences(d, "n_tok", ctx=2048).select(
        "doc_id", "source", "n_tok", "pack_id", "pack_offset"
    )


_SEQ_PACKING_ORACLE = """
WITH d AS (
  SELECT doc_id, source, len(string_split(trim(text), ' ')) AS n_tok FROM documents
),
c AS (
  SELECT *, sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS start
  FROM d
)
SELECT doc_id, source, n_tok::INT AS n_tok,
       (start // 2048)::BIGINT AS pack_id, (start % 2048)::INT AS pack_offset
FROM c
"""


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-50 by frequency: explode -> hash-agg (map-side
    partial combine absorbs the Zipf word skew) -> TakeOrdered top-k, with a
    deterministic (n desc, word asc) tiebreak."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("word"))
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(50)
    )


_VOCAB_TOPK_ORACLE = """
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(trim(text), ' ')) AS word FROM documents)
GROUP BY word ORDER BY n DESC, word LIMIT 50
"""


def q_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment by key hash (see
    functions/sampling.py): a pure function of doc_id — stable across runs,
    partitionings, and cluster sizes, and reproducible in ANSI SQL (unlike
    Spark's seed+partition-dependent sample())."""
    from mongo_bulk_data_migration_spark.functions.sampling import (
        hash_bucket,
        holdout_split,
    )

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "source",
        hash_bucket(F.col("doc_id"), 100).alias("bucket"),
        holdout_split(F.col("doc_id")).alias("split"),
    )


_HOLDOUT_ORACLE = """
SELECT doc_id, source,
       (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100)::INT AS bucket,
       CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100 < 90 THEN 'train'
            WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100 < 95 THEN 'valid'
            ELSE 'test' END AS split
FROM documents
"""


def q_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (mT5/XLM-R rule): rebalance the
    corpus toward shares ∝ n_s^0.5 by deterministic hash subsampling (see
    functions/sampling.py:temperature_mix) — membership is a pure function
    of doc_id; the corpus is never shuffled (stats agg + broadcast dim +
    codegen'd hash filter). Returns per-source totals/kept/quota."""
    from mongo_bulk_data_migration_spark.functions.sampling import temperature_mix

    d = _t(spark, sf_dir, "documents")
    kept = temperature_mix(d, source_col="source", key_col="doc_id", alpha=0.5)
    return (
        d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
        .join(
            kept.groupBy("source").agg(
                F.count(F.lit(1)).alias("n_kept"),
                F.max("__keep_ppm").alias("keep_ppm"),
            ),
            "source",
        )
        .select("source", "n_total", "n_kept", "keep_ppm")
        .orderBy("source")
    )


_SOURCE_MIXING_ORACLE = """
WITH stats AS (
  SELECT source, count(*)::DOUBLE AS n, pow(count(*)::DOUBLE, 0.5) AS w
  FROM documents GROUP BY source
), g AS (
  SELECT min(n / w) AS mr FROM stats
), dim AS (
  SELECT source, floor(1000000.0 * g.mr * w / n)::BIGINT AS keep_ppm
  FROM stats, g
)
SELECT d.source AS source,
       count(*) AS n_total,
       sum(CASE WHEN ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::UBIGINT
                     % 1000000 < dim.keep_ppm THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       max(dim.keep_ppm) AS keep_ppm
FROM documents d JOIN dim ON d.source = dim.source
GROUP BY d.source ORDER BY source
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing >=1 char 20-gram
    with the benchmark set (docs 0-19 as the stand-in eval suite). Broadcast
    left-semi join on exploded grams — the corpus side never shuffles."""
    from mongo_bulk_data_migration_spark.operators.dedup_text import contaminated_docs

    d = _t(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") < 20)
    corpus = d.where(F.col("doc_id") >= 20)
    return contaminated_docs(corpus, bench, k=20)


_DECONTAMINATE_ORACLE = """
WITH nt AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents
),
b AS (
  SELECT DISTINCT unnest([substr(t, i, 20)
                          for i in generate_series(1, greatest(len(t) - 19, 1))]) AS g
  FROM nt WHERE doc_id < 20
),
d AS (
  SELECT doc_id, unnest([substr(t, i, 20)
                         for i in generate_series(1, greatest(len(t) - 19, 1))]) AS g
  FROM nt WHERE doc_id >= 20
)
SELECT DISTINCT d.doc_id FROM d JOIN b USING (g)
"""


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup pipeline to CLUSTER ids: LSH band-bucket candidates ->
    exact Jaccard verify -> connected components (distributed min-label
    propagation; see operators/cluster.py). cluster_id = min doc_id of the
    component — the canonical-copy key a dedup job joins back on."""
    from mongo_bulk_data_migration_spark.operators.cluster import connected_components
    from mongo_bulk_data_migration_spark.operators.dedup_text import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(d, num_hashes=16, bands=4, hash_fn="md5")
    pairs = ngram_jaccard_pairs(d, candidates=cand, threshold=0.5)
    return connected_components(pairs)


def _neardup_clusters_oracle() -> str:
    """Reachability closure via WITH RECURSIVE over the same verified pairs."""
    body = _lsh_jaccard_oracle()
    head, final = body.split("SELECT id_a, id_b,", 1)
    return (
        "WITH RECURSIVE "
        + head.strip().removeprefix("WITH ")
        + ",\npairs AS (\nSELECT id_a, id_b,"
        + final
        + """
),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(u, label) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u
)
SELECT u AS doc_id, min(label) AS cluster_id FROM reach GROUP BY u
"""
    )


def _lsh_jaccard_oracle() -> str:
    sig = ",\n         ".join(
        f"list_min(list_transform(s, x -> md5(x || '{i}')))" for i in range(16)
    )
    buckets = ", ".join(
        "md5(g[{}] || '|' || g[{}] || '|' || g[{}] || '|' || g[{}])".format(
            b * 4 + 1, b * 4 + 2, b * 4 + 3, b * 4 + 4
        )
        for b in range(4)
    )
    return f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct([substr(t, i, 5)
                        for i in generate_series(1, greatest(len(t) - 4, 1))]) AS s
  FROM (SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents)
),
sig AS (SELECT doc_id, [{sig}] AS g, s FROM sh),
banded AS (
  SELECT doc_id, u.band, [{buckets}][u.band + 1] AS bucket
  FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) u
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       round(len(list_intersect(sa.s, sb.s))
             / greatest(len(list_distinct(sa.s || sb.s)), 1), 6) AS jaccard
FROM cand JOIN sh sa ON sa.doc_id = cand.id_a JOIN sh sb ON sb.doc_id = cand.id_b
WHERE round(len(list_intersect(sa.s, sb.s))
            / greatest(len(list_distinct(sa.s || sb.s)), 1), 6) >= 0.5
"""


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding cosine near-dup via hyperplane-LSH buckets: candidates come
    from seeded sign-bit buckets (n^2 / 2^planes per bucket), cosine verified
    only within buckets."""
    from mongo_bulk_data_migration_spark.operators.dedup_text import embedding_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    return embedding_neardup_pairs(emb, dim=64, n_planes=6, threshold=0.3)


def _embedding_neardup_oracle() -> str:
    from mongo_bulk_data_migration_spark.operators.dedup_text import _hyperplanes

    planes = _hyperplanes(64, 6, seed=42)
    bkt = " + ".join(
        "CASE WHEN list_dot_product(v, [{}]) >= 0 THEN {} ELSE 0 END".format(
            ", ".join(repr(x) for x in p), 1 << i
        )
        for i, p in enumerate(planes)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, ({bkt}) AS bkt FROM e),
p AS (
  SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
         round(list_dot_product(a.v, b2.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b2.v, b2.v))), 6) AS cos
  FROM b a JOIN b b2 ON a.bkt = b2.bkt AND a.vec_id < b2.vec_id
)
SELECT id_a, id_b, cos FROM p WHERE cos >= 0.3
"""


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 to the vec_id=0 query vector."""
    from mongo_bulk_data_migration_spark.operators.ann import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    qvec = [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]
    return brute_force_topk(emb, qvec, k=10)


_ANN_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v FROM e WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(v, (SELECT v FROM q))
             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product((SELECT v FROM q), (SELECT v FROM q)))), 6) AS score
FROM e ORDER BY score DESC, vec_id LIMIT 10
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: hyperplane-bucket probe (query bucket + Hamming-1
    neighbors) then in-probe cosine top-10 — scans a few buckets, never the
    full table. Oracle recomputes the identical buckets in SQL."""
    from mongo_bulk_data_migration_spark.operators.ann import lsh_topk

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    qvec = [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]
    return lsh_topk(emb, qvec, k=10, dim=64, n_planes=6)


def _ann_lsh_oracle() -> str:
    from mongo_bulk_data_migration_spark.operators.dedup_text import _hyperplanes

    planes = _hyperplanes(64, 6)  # lsh_topk's default seed
    bkt = lambda v: " + ".join(  # noqa: E731
        "CASE WHEN list_dot_product({}, [{}]) >= 0 THEN {} ELSE 0 END".format(
            v, ", ".join(repr(x) for x in p), 1 << i
        )
        for i, p in enumerate(planes)
    )
    hamming_ok = ", ".join(str(x) for x in [0] + [1 << i for i in range(6)])
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv, ({bkt('v')}) AS qb FROM e WHERE vec_id = 0),
b AS (SELECT vec_id, v, ({bkt('v')}) AS bkt FROM e)
SELECT vec_id,
       round(list_dot_product(v, (SELECT qv FROM q))
             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product((SELECT qv FROM q), (SELECT qv FROM q)))), 6) AS score
FROM b WHERE xor(bkt, (SELECT qb FROM q)) IN ({hamming_ok})
ORDER BY score DESC, vec_id LIMIT 10
"""


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN: nearest-centroid inverted lists (centroids = first 8
    vectors, deterministic), probe the query's 2 nearest lists, exact cosine
    top-10 inside the probed lists only."""
    from mongo_bulk_data_migration_spark.operators.ann import ivf_topk

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    qvec = [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]
    return ivf_topk(emb, qvec, k=10, n_centroids=8, nprobe=2)


_ANN_IVF_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT list(v ORDER BY vec_id) AS cs FROM e WHERE vec_id < 8),
a AS (SELECT vec_id, v,
             list_transform((SELECT cs FROM c),
                            x -> list_dot_product(v, v) + list_dot_product(x, x)
                                 - 2 * list_dot_product(v, x)) AS d
      FROM e),
l AS (SELECT vec_id, v, list_position(d, list_min(d)) AS lst FROM a),
q AS (SELECT v AS qv, d AS dq FROM a WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(v, (SELECT qv FROM q))
             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product((SELECT qv FROM q), (SELECT qv FROM q)))), 6) AS score
FROM l
WHERE lst IN ((SELECT list_position(dq, list_sort(dq)[1]) FROM q),
              (SELECT list_position(dq, list_sort(dq)[2]) FROM q))
ORDER BY score DESC, vec_id LIMIT 10
"""


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2-style pre-tokenizer match count (closer LLM-token proxy than
    whitespace words; pure JVM regexp_extract_all)."""
    from mongo_bulk_data_migration_spark.functions.text import token_count_bpe

    return _t(spark, sf_dir, "documents").select(
        "doc_id", token_count_bpe(F.col("text")).alias("n_bpe_tokens")
    )


def _token_count_bpe_oracle() -> str:
    from mongo_bulk_data_migration_spark.functions.text import BPE_TOKEN_PATTERN

    pat = BPE_TOKEN_PATTERN.replace("'", "''")
    return f"""
SELECT doc_id, len(regexp_extract_all(text, '{pat}'))::INT AS n_bpe_tokens
FROM documents
"""


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector norms (zip_with/aggregate kernel sanity)."""
    from mongo_bulk_data_migration_spark.operators.dedup_text import l2_norm

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "v", F.transform("embedding", lambda x: x.cast("double"))
    )
    return (
        emb.select("label", F.round(l2_norm(F.col("v")), 6).alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
    )


_EMBEDDING_STATS_ORACLE = """
WITH e AS (SELECT label, round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS norm
           FROM embeddings)
SELECT label, count(*) AS n, round(min(norm), 6) AS min_norm, round(max(norm), 6) AS max_norm
FROM e GROUP BY label
"""


# -- non-SQL-expressible (pandas-UDF sketches / engine-stateful): rows-only --


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup buckets — pure JVM sketch (md5-derived word hash),
    reproduced bit-exactly by the generated DuckDB oracle."""
    from mongo_bulk_data_migration_spark.operators.dedup_text import simhash_dedup

    return simhash_dedup(_t(spark, sf_dir, "documents"))


def _simhash_oracle() -> str:
    from mongo_bulk_data_migration_spark.operators.dedup_text import simhash_sql

    hs, sketch = simhash_sql("text")
    return f"""
WITH h AS (SELECT doc_id, {hs} AS __hs FROM documents),
s AS (SELECT doc_id, {sketch} AS simhash FROM h)
SELECT simhash, min(doc_id) AS doc_id, count(*) AS n_dups FROM s GROUP BY simhash
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: text bytes as stand-in payloads -> Arrow
    mapInPandas feature extraction (decode step stubbed, see module doc)."""
    from mongo_bulk_data_migration_spark.functions.multimodal import decode_features

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    feats = decode_features(d)
    # scalar columns only — each is oracle-checkable (VERDICT r2 #4); the
    # feature VECTOR is pinned by a golden-md5 pytest instead
    # (tests/test_functions.py::test_multimodal_decode_features), because the
    # stubbed decoder's rolling-hash arithmetic is not SQL-expressible
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.size("features").alias("n_feat"),
    )


_MULTIMODAL_ORACLE = """
SELECT doc_id::VARCHAR AS media_id,
       'image' AS kind,
       coalesce(octet_length(encode(text)), 0)::INT AS n_bytes,
       8::INT AS n_feat
FROM documents
"""


def q_rollback_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-stateful: CDC apply + rollback must restore the exact initial
    sequences table (returns it; deterministic)."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.sources.fixtures import SEQUENCES_SCHEMA
    from mongo_bulk_data_migration_spark.streaming.replay import ChangeStreamReplayer

    seqs, events, n_events = _cdc_frames(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix="mbdm_rb_")
    cat = Catalog(wh)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets=16)
    t.append(seqs)
    rep = ChangeStreamReplayer(spark, wh, "sequences", "rb", evolve_schema=False)
    rep.apply_changes(events, events_per_batch=max(n_events // 2, 1))
    rep.rollback()
    return t.read(spark).select("doc_id", _tokens_digest("tokens"), "n_tok", "source")


_ROLLBACK_ORACLE = """
SELECT printf('doc%08d', i) AS doc_id,
       md5(array_to_string(list_transform(generate_series(0, (1 + i % 512) - 1),
                                          j -> ((i * 2654435761 + j) % 50257)::INT), ',')) AS tokens_md5,
       (1 + i % 512)::INT AS n_tok,
       (['web','books','code','wiki'])[(i % 4) + 1] AS source
FROM (SELECT unnest(generate_series(0, (SELECT count(*) FROM documents) - 1)) AS i)
"""


# ---------------------------------------------------------------------------
# engine-stateful protocol queries (VERDICT r2 #2): each runs a full
# migration-engine lifecycle in a temp warehouse and returns a deterministic
# post-state the ANSI-SQL oracle reproduces from first principles — the same
# shape as rollback_roundtrip, covering the SURVEY §2 operators that
# previously had only pytest evidence.
# ---------------------------------------------------------------------------

# the initial derived sequences table as a DuckDB CTE (shared oracle prefix)
_SEQS_CTE = _CDC_ORACLE.split("\nev AS (")[0].rstrip().rstrip(",")


def _seed_sequences(spark: SparkSession, sf_dir: str, prefix: str):
    """Temp-warehouse sequences table seeded with the derived fixture."""
    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.sources.fixtures import SEQUENCES_SCHEMA

    seqs, events, n_events = _cdc_frames(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix=prefix)
    cat = Catalog(wh)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets=16)
    t.append(seqs)
    return wh, cat, t, events, n_events


def q_delete_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/S8 engine-stateful: DELETE_COLLECTION is an atomic table-rename
    swap — update() parks the collection under the rollback name, rollback()
    swaps it back (`MongoBulkDataMigration.ts:129-135,351-357`, behavior
    pinned by `__tests__/MongoBulkDataMigration.test.ts:109-175`); clean()
    afterwards tolerates the already-gone backup. Returns the restored table,
    which must equal the untouched initial state."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import (
        DELETE_COLLECTION,
        DataMigrationConfig,
        MongoBulkDataMigrationSpark,
    )

    wh, cat, t, _, _ = _seed_sequences(spark, sf_dir, "mbdm_delcol_")
    cfg = DataMigrationConfig(
        warehouse=wh, collection_name="sequences", id="delcol",
        update=DELETE_COLLECTION,
    )
    eng = MongoBulkDataMigrationSpark(spark, cfg)
    assert eng.update()["ok"] == 1
    assert not cat.exists("sequences"), "collection not renamed away"
    assert cat.exists(cfg.rollback_table_name), "parked copy missing"
    assert eng.rollback()["ok"] == 1
    assert cat.exists("sequences"), "collection not renamed back"
    assert not cat.exists(cfg.rollback_table_name), "parked copy not consumed"
    assert eng.clean()["ok"] == 1  # S8: absent backup tolerated
    return (
        cat.load_table("sequences")
        .read(spark)
        .select("doc_id", _tokens_digest("tokens"), "n_tok", "source")
    )


def q_unset_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2+M6+P3 engine-stateful: `{"$unset": ["source"]}` over the predicate
    n_tok % 3 = 0 writes typed NULLs (`rollback.test.ts:378-475`), then a
    CUSTOM rollback callback (M6, `rollback.test.ts:932-972`) restricts the
    restore to even-numbered doc ids — so the final state mixes restored,
    still-unset, and untouched rows, all reproduced by the oracle. The
    callback forces the changelog-replay path (time travel would ignore
    it)."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import (
        DataMigrationConfig,
        MongoBulkDataMigrationSpark,
    )

    wh, cat, t, _, _ = _seed_sequences(spark, sf_dir, "mbdm_unset_")
    cfg = DataMigrationConfig(
        warehouse=wh, collection_name="sequences", id="unset",
        query="n_tok % 3 = 0",
        update={"$unset": ["source"]},
        rollback=lambda df: df.where(
            F.expr("cast(substring(doc_id, 4, 8) as int) % 2 = 0")
        ),
    )
    eng = MongoBulkDataMigrationSpark(spark, cfg)
    r = eng.update()
    assert r["nModified"] == r["nBackups"] > 0
    assert eng.rollback()["ok"] == 1
    return t.read(spark).select("doc_id", _tokens_digest("tokens"), "n_tok", "source")


_UNSET_ROLLBACK_ORACLE = (
    _SEQS_CTE
    + """
SELECT doc_id,
       md5(array_to_string(tokens::INT[], ',')) AS tokens_md5,
       n_tok,
       CASE WHEN n_tok % 3 = 0 AND substr(doc_id, 4)::INT % 2 = 1
            THEN NULL ELSE source END AS source
FROM seqs
"""
)


def q_pipeline_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+A2 engine-stateful: an aggregation-pipeline source (filter + virtual
    field, the reference forwards sub-pipelines verbatim — `MBDM.ts:225-230`,
    `update.test.ts:279-353`) feeds a vectorized update callback that consumes
    the VIRTUAL column; a second migration whose pipeline matches nothing
    asserts the empty-$count contract (`update.test.ts:337-352`: total=0,
    zero writes, zero backups)."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import (
        DataMigrationConfig,
        MongoBulkDataMigrationSpark,
    )

    wh, cat, t, _, _ = _seed_sequences(spark, sf_dir, "mbdm_pipe_")
    cfg = DataMigrationConfig(
        warehouse=wh, collection_name="sequences", id="pipe",
        pipeline=lambda df: df.where("n_tok % 7 = 0").withColumn(
            "half", (F.col("n_tok") / 2).cast("int")
        ),
        update=lambda df: df.withColumn(
            "source", F.concat(F.lit("p"), F.pmod(F.col("half"), F.lit(10)).cast("string"))
        ),
    )
    eng = MongoBulkDataMigrationSpark(spark, cfg)
    r = eng.update()
    # A2: the pipeline pre-count IS the matched/modified set
    assert r["batches"][0]["total_entries"] == r["nModified"] > 0

    cfg0 = DataMigrationConfig(
        warehouse=wh, collection_name="sequences", id="pipe0",
        pipeline=lambda df: df.where("n_tok < 0"),
        update=lambda df: df.withColumn("source", F.lit("never")),
    )
    r0 = MongoBulkDataMigrationSpark(spark, cfg0).update()
    assert r0["batches"][0]["total_entries"] == 0
    assert r0["nModified"] == 0 and r0["nBackups"] == 0
    return t.read(spark).select("doc_id", _tokens_digest("tokens"), "n_tok", "source")


_PIPELINE_UPDATE_ORACLE = (
    _SEQS_CTE
    + """
SELECT doc_id,
       md5(array_to_string(tokens::INT[], ',')) AS tokens_md5,
       n_tok,
       CASE WHEN n_tok % 7 = 0 THEN 'p' || ((n_tok // 2) % 10)::VARCHAR
            ELSE source END AS source
FROM seqs
"""
)


def q_no_update_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 engine-stateful: skip_unchanged (the NO_UPDATE per-row analog,
    `MBDM.ts:284-286`, `update.test.ts:463-526`) must neither write NOR back
    up rows whose value already matches. The skip itself is oracle-verified
    row-wise: the returned `backed_up` column joins the changelog's backup
    keys, and the oracle predicts it as (matched AND actually-changed)."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import (
        NO_UPDATE,
        DataMigrationConfig,
        MigrationOptions,
        MongoBulkDataMigrationSpark,
    )

    wh, cat, t, _, _ = _seed_sequences(spark, sf_dir, "mbdm_noup_")
    cfg = DataMigrationConfig(
        warehouse=wh, collection_name="sequences", id="noup",
        query="n_tok % 2 = 1",
        # NO_UPDATE as a dict value drops the column from the spec entirely
        update={"source": "web", "n_tok": NO_UPDATE},
        options=MigrationOptions(skip_unchanged=True),
    )
    eng = MongoBulkDataMigrationSpark(spark, cfg)
    r = eng.update()
    # only rows that actually change are written, and exactly those are
    # backed up — unchanged matches are invisible to the protocol
    assert r["nModified"] == r["nBackups"] > 0
    backed = (
        cat.load_table(cfg.rollback_table_name)
        .read(spark)
        .where("kind = 'backup'")
        .select("doc_id", F.lit(True).alias("backed_up"))
    )
    return (
        t.read(spark)
        .join(backed, "doc_id", "left")
        .select(
            "doc_id",
            _tokens_digest("tokens"),
            "n_tok",
            "source",
            F.coalesce(F.col("backed_up"), F.lit(False)).alias("backed_up"),
        )
    )


_NO_UPDATE_SKIP_ORACLE = (
    _SEQS_CTE
    + """
SELECT doc_id,
       md5(array_to_string(tokens::INT[], ',')) AS tokens_md5,
       n_tok,
       CASE WHEN n_tok % 2 = 1 THEN 'web' ELSE source END AS source,
       coalesce(n_tok % 2 = 1 AND source <> 'web', false) AS backed_up
FROM seqs
"""
)


def q_projection_scope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2 engine-stateful: what is fetched-and-projected is what is
    backed up and therefore restorable ("Whatever is fetched and projected
    is what is saved as backup", reference README.md:18;
    `rollback.test.ts:110-160`).  The migration projects all three data
    columns but backs up only (tokens, n_tok) via projection_backup_filter;
    an out-of-band writer then changes `source` everywhere; rollback
    restores tokens/n_tok to the pre-image while `source` keeps the
    in-between value.  Mid-state and final state are both oracle-predicted."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import (
        DataMigrationConfig,
        MigrationOptions,
        MongoBulkDataMigrationSpark,
    )

    wh, cat, t, _, _ = _seed_sequences(spark, sf_dir, "mbdm_proj_")
    cfg = DataMigrationConfig(
        warehouse=wh, collection_name="sequences", id="proj",
        query="n_tok % 4 = 1",
        projection=["tokens", "n_tok", "source"],
        update={
            "tokens": F.slice(F.col("tokens"), 1, 3),
            "n_tok": F.least(F.col("n_tok"), F.lit(3)).cast("int"),
            "source": F.lit("MIG"),
        },
        options=MigrationOptions(projection_backup_filter=["tokens", "n_tok"]),
    )
    eng = MongoBulkDataMigrationSpark(spark, cfg)
    assert eng.update()["nModified"] > 0
    mid_digest = F.md5(
        F.concat_ws("|", F.concat_ws(",", F.col("tokens").cast("array<string>")),
                    F.col("n_tok").cast("string"), F.coalesce(F.col("source"), F.lit("~")))
    )
    mid_path = os.path.join(wh, "_mid")
    t.read(spark).select("doc_id", mid_digest.alias("mid_digest")).write.parquet(mid_path)

    # out-of-band write between update and rollback (its own migration id)
    oob = MongoBulkDataMigrationSpark(
        spark,
        DataMigrationConfig(
            warehouse=wh, collection_name="sequences", id="oob",
            update={"source": F.lit("OOB")},
        ),
    )
    assert oob.update()["nModified"] > 0

    eng.rollback()  # restores tokens/n_tok only; source keeps OOB
    return (
        t.read(spark)
        .join(spark.read.parquet(mid_path), "doc_id")
        .select("doc_id", "mid_digest", _tokens_digest("tokens"), "n_tok", "source")
    )


_PROJECTION_SCOPE_ORACLE = (
    _SEQS_CTE
    + """
SELECT doc_id,
       md5(concat_ws('|',
           array_to_string(CASE WHEN n_tok % 4 = 1 THEN tokens[:3] ELSE tokens END::INT[], ','),
           (CASE WHEN n_tok % 4 = 1 THEN least(n_tok, 3) ELSE n_tok END)::VARCHAR,
           CASE WHEN n_tok % 4 = 1 THEN 'MIG' ELSE source END)) AS mid_digest,
       md5(array_to_string(tokens::INT[], ',')) AS tokens_md5,
       n_tok,
       'OOB' AS source
FROM seqs
"""
)


def q_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 engine-stateful: continue_on_bulk_write_error routes malformed
    events (here: every seq % 11 = 5 carries an unknown op) to the
    dead-letter table and applies the REST of the batch
    (`AbstractBulkOperationResults.ts:60-73`, `update.test.ts:415-444`).
    The final table must equal the merge algebra over the VALID subset
    only; the dead-letter count is asserted engine-side."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import Catalog, MigrationOptions
    from mongo_bulk_data_migration_spark.sources.fixtures import SEQUENCES_SCHEMA
    from mongo_bulk_data_migration_spark.streaming.replay import ChangeStreamReplayer

    seqs, events, n_events = _cdc_frames(spark, sf_dir)
    events = events.withColumn(
        "op",
        F.when(F.pmod(F.col("seq"), F.lit(11)) == 5, F.lit("frobnicate")).otherwise(
            F.col("op")
        ),
    )
    wh = tempfile.mkdtemp(prefix="mbdm_dl_")
    cat = Catalog(wh)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets=16)
    t.append(seqs)
    rep = ChangeStreamReplayer(
        spark, wh, "sequences", "dl", evolve_schema=False,
        options=MigrationOptions(continue_on_bulk_write_error=True),
    )
    ms = rep.apply_changes(events, events_per_batch=max(n_events, 1))
    n_dead = sum(m["n_dead_lettered"] for m in ms)
    assert n_dead == events.where("seq % 11 = 5").count() > 0
    return t.read(spark).select("doc_id", _tokens_digest("tokens"), "n_tok", "source")


_DEAD_LETTER_ORACLE = _CDC_ORACLE.replace(
    "    FROM events) WHERE rn = 1",
    "    FROM events WHERE seq % 11 <> 5) WHERE rn = 1",
)
assert _DEAD_LETTER_ORACLE != _CDC_ORACLE


def q_delete_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3+S6 engine-stateful: DELETE_OPERATION removes the matching rows
    (full projected pre-image backed up, `update.test.ts:675-695`), then a
    changelog-path rollback re-INSERTS exactly the deleted docs (the
    restore-insert sink, `RollbackBulk.ts:34-37`, `rollback.test.ts:238-266`;
    forced off the time-travel fast path by a foreign commit).  Returns the
    restored table plus a per-doc `survived_delete` flag captured from the
    mid-state — both oracle-predicted."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import (
        DELETE_OPERATION,
        DataMigrationConfig,
        MongoBulkDataMigrationSpark,
    )

    wh, cat, t, _, _ = _seed_sequences(spark, sf_dir, "mbdm_delop_")
    cfg = DataMigrationConfig(
        warehouse=wh, collection_name="sequences", id="delop",
        query="n_tok % 5 = 2", update=DELETE_OPERATION,
    )
    eng = MongoBulkDataMigrationSpark(spark, cfg)
    r = eng.update()
    assert r["nRemoved"] == r["nBackups"] > 0
    mid_path = os.path.join(wh, "_mid_keys")
    t.read(spark).select("doc_id", F.lit(True).alias("survived_delete")).write.parquet(mid_path)
    t.commit_marker({}, operation="foreign-touch")  # force changelog replay
    eng.rollback()
    return (
        t.read(spark)
        .join(spark.read.parquet(mid_path), "doc_id", "left")
        .select(
            "doc_id", _tokens_digest("tokens"), "n_tok", "source",
            F.coalesce(F.col("survived_delete"), F.lit(False)).alias("survived_delete"),
        )
    )


_DELETE_RESTORE_ORACLE = (
    _SEQS_CTE
    + """
SELECT doc_id,
       md5(array_to_string(tokens::INT[], ',')) AS tokens_md5,
       n_tok,
       source,
       (n_tok % 5 <> 2) AS survived_delete
FROM seqs
"""
)


def q_cdc_merge_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key CDC replay with SALTED last-wins collapse: 30% of all events
    hit one doc_id (Zipf head), and the replayer runs with dedup_salt=8 —
    the two-phase salted collapse (partial max_by per (key, salt), then the
    tiny per-key final) that keeps a 10^10-event hot key from funneling one
    reducer.  Must produce the byte-identical table the unsalted algebra
    defines (same oracle shape, skewed idx)."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import Catalog, MigrationOptions
    from mongo_bulk_data_migration_spark.sources.fixtures import SEQUENCES_SCHEMA
    from mongo_bulk_data_migration_spark.streaming.replay import ChangeStreamReplayer

    seqs, events, n_events = _cdc_frames(spark, sf_dir, hot_keys=True)
    wh = tempfile.mkdtemp(prefix="mbdm_skew_")
    cat = Catalog(wh)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets=16)
    t.append(seqs)
    rep = ChangeStreamReplayer(
        spark, wh, "sequences", "skew", evolve_schema=False,
        options=MigrationOptions(dedup_salt=8),
    )
    rep.apply_changes(events, events_per_batch=max(n_events, 1))
    return t.read(spark).select("doc_id", _tokens_digest("tokens"), "n_tok", "source")


_CDC_SKEW_ORACLE = _CDC_ORACLE.replace(
    "SELECT e AS seq,\n"
    "         (e * 2654435761 + 12345) % (SELECT n_docs + n_docs // 4 FROM p) AS idx",
    "SELECT e AS seq,\n"
    "         CASE WHEN e % 10 < 3 THEN 0\n"
    "              ELSE (e * 2654435761 + 12345) % (SELECT n_docs + n_docs // 4 FROM p)\n"
    "         END AS idx",
)
assert _CDC_SKEW_ORACLE != _CDC_ORACLE  # replace() must have matched


def q_pandas_callback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4's ARBITRARY-callback tier through the engine: the update spec is a
    whole-batch callable whose token transform runs as an Arrow-vectorized
    pandas UDF (`functions/tokens.py:pandas_transform_udf` — the reference's
    per-row async `update(doc)` callback re-expressed columnar, no per-row
    Python).  Here: keep only even tokens for docs matching the predicate;
    the oracle reproduces it with list_filter."""
    _utc(spark)
    import numpy as np

    from mongo_bulk_data_migration_spark import (
        DataMigrationConfig,
        MongoBulkDataMigrationSpark,
    )
    from mongo_bulk_data_migration_spark.functions.tokens import pandas_transform_udf

    wh, cat, t, _, _ = _seed_sequences(spark, sf_dir, "mbdm_pudf_")

    keep_even = pandas_transform_udf(
        lambda s: s.map(lambda a: (lambda v: v[v % 2 == 0])(np.asarray(a, dtype=np.int32)))
    )
    cfg = DataMigrationConfig(
        warehouse=wh, collection_name="sequences", id="pudf",
        query="n_tok % 3 = 1",
        update=lambda df: df.withColumn("tokens", keep_even(F.col("tokens"))).withColumn(
            "n_tok", F.size("tokens").cast("int")
        ),
    )
    r = MongoBulkDataMigrationSpark(spark, cfg).update()
    assert r["nModified"] > 0
    return t.read(spark).select("doc_id", _tokens_digest("tokens"), "n_tok", "source")


_PANDAS_CALLBACK_ORACLE = (
    _SEQS_CTE
    + """
SELECT doc_id,
       md5(array_to_string(CASE WHEN n_tok % 3 = 1
                                THEN list_filter(tokens, t -> t % 2 = 0)
                                ELSE tokens END::INT[], ',')) AS tokens_md5,
       CASE WHEN n_tok % 3 = 1
            THEN len(list_filter(tokens, t -> t % 2 = 0))::INT
            ELSE n_tok END AS n_tok,
       source
FROM seqs
"""
)


def q_nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M2/M5 engine-stateful over NESTED columns (VERDICT r2 #3): a table
    with struct + array<struct> columns is migrated with a nested $set
    (meta.ver + 1), a typed struct-leaf $unset (meta.owner -> NULL), and a
    two-level filtered positional set ($[e].subKey2.$[e2].elt2, mirroring
    `rollback.test.ts:997-1106`); the full nested pre-image rides the
    changelog and rollback restores it exactly (changelog path forced by a
    foreign writer commit).  Returns per-doc digests of BOTH states — the
    oracle recomputes the nested transform and the restoration in SQL."""
    _utc(spark)
    from pyspark.sql import types as T

    from mongo_bulk_data_migration_spark import (
        Catalog,
        DataMigrationConfig,
        MongoBulkDataMigrationSpark,
    )
    from mongo_bulk_data_migration_spark.functions.nested import set_path, set_where

    n_docs = _t(spark, sf_dir, "documents").count()
    i = F.col("id")
    keys = F.transform(
        F.sequence(F.lit(0), F.pmod(i, F.lit(3)).cast("int")),
        lambda j: F.struct(
            F.when(j % 3 == 0, F.lit("match_me"))
            .otherwise(F.concat(F.lit("k"), j.cast("string")))
            .alias("subKey1"),
            F.transform(
                F.sequence(F.lit(0), F.pmod(i + j, F.lit(2)).cast("int")),
                lambda k: F.struct(
                    (F.lit(55) + F.lit(45) * j + F.lit(50) * k).cast("int").alias("elt1"),
                    F.concat(F.lit("e"), k.cast("string")).alias("elt2"),
                ),
            ).alias("subKey2"),
        ),
    )
    rows = spark.range(0, n_docs, 1, 8).select(
        F.format_string("doc%08d", "id").alias("doc_id"),
        F.struct(
            F.concat(F.lit("u"), F.pmod(i, F.lit(7)).cast("string")).alias("owner"),
            F.pmod(i, F.lit(5)).cast("int").alias("ver"),
        ).alias("meta"),
        keys.alias("keys"),
    )
    schema_ddl = (
        "doc_id string, meta struct<owner: string, ver: int>, "
        "keys array<struct<subKey1: string, subKey2: array<struct<elt1: int, elt2: string>>>>"
    )
    wh = tempfile.mkdtemp(prefix="mbdm_nested_")
    cat = Catalog(wh)
    t = cat.create_table("nested", T.StructType.fromDDL(schema_ddl), num_buckets=16)
    t.append(rows)

    new_meta = set_path(
        set_path(F.col("meta"), "ver", (F.col("meta.ver") + 1).cast("int")),
        "owner", F.lit(None).cast("string"),
    )
    new_keys = set_where(
        F.col("keys"),
        lambda e: e["subKey1"] == "match_me",
        lambda e: e.withField(
            "subKey2",
            set_where(
                e["subKey2"],
                lambda e2: e2["elt1"] >= 100,
                lambda e2: e2.withField("elt2", F.lit("SET")),
            ),
        ),
    )
    eng = MongoBulkDataMigrationSpark(
        spark,
        DataMigrationConfig(
            warehouse=wh, collection_name="nested", id="nst",
            query="meta.ver < 4", update={"meta": new_meta, "keys": new_keys},
        ),
    )
    r = eng.update()
    assert r["nModified"] == r["nBackups"] > 0

    def canon():
        inner = lambda e2: F.concat_ws(  # noqa: E731
            "-", e2["elt1"].cast("string"), F.coalesce(e2["elt2"], F.lit("~"))
        )
        elem = lambda e: F.concat_ws(  # noqa: E731
            ":", e["subKey1"], F.concat_ws(",", F.transform(e["subKey2"], inner))
        )
        return F.md5(
            F.concat_ws(
                "|",
                F.coalesce(F.col("meta.owner"), F.lit("~")),
                F.col("meta.ver").cast("string"),
                F.concat_ws(";", F.transform(F.col("keys"), elem)),
            )
        )

    post_path = os.path.join(wh, "_post_digest")
    t.read(spark).select("doc_id", canon().alias("post_digest")).write.parquet(post_path)
    t.commit_marker({}, operation="foreign-touch")  # disable time-travel fast path
    eng.rollback()
    restored = t.read(spark).select("doc_id", canon().alias("restored_digest"))
    return restored.join(spark.read.parquet(post_path), "doc_id")


_NESTED_CANON_POST = """md5(concat_ws('|',
  coalesce(meta.owner, '~'), meta.ver::VARCHAR,
  array_to_string(list_transform(keys, e -> concat_ws(':', e.subKey1,
    array_to_string(list_transform(e.subKey2, e2 ->
      concat_ws('-', e2.elt1::VARCHAR, coalesce(e2.elt2, '~'))), ','))), ';')))"""

_NESTED_ROUNDTRIP_ORACLE = (
    """
WITH p AS (SELECT count(*)::BIGINT AS n FROM documents),
base AS (
  SELECT printf('doc%08d', i) AS doc_id,
         struct_pack(owner := 'u' || (i % 7)::VARCHAR, ver := (i % 5)::INT) AS meta,
         list_transform(generate_series(0, i % 3), j -> struct_pack(
           subKey1 := CASE WHEN j % 3 = 0 THEN 'match_me' ELSE 'k' || j::VARCHAR END,
           subKey2 := list_transform(generate_series(0, (i + j) % 2), k -> struct_pack(
             elt1 := (55 + 45 * j + 50 * k)::INT,
             elt2 := 'e' || k::VARCHAR)))) AS keys
  FROM (SELECT unnest(generate_series(0, (SELECT n FROM p) - 1)) AS i)
),
post AS (
  SELECT doc_id,
    CASE WHEN meta.ver < 4
         THEN struct_pack(owner := NULL::VARCHAR, ver := (meta.ver + 1)::INT)
         ELSE meta END AS meta,
    CASE WHEN meta.ver < 4
         THEN list_transform(keys, e ->
           CASE WHEN e.subKey1 = 'match_me'
                THEN struct_pack(subKey1 := e.subKey1,
                                 subKey2 := list_transform(e.subKey2, e2 ->
                                   CASE WHEN e2.elt1 >= 100
                                        THEN struct_pack(elt1 := e2.elt1, elt2 := 'SET')
                                        ELSE e2 END))
                ELSE e END)
         ELSE keys END AS keys
  FROM base
),
post_d AS (SELECT doc_id, """
    + _NESTED_CANON_POST
    + """ AS post_digest FROM post),
base_d AS (SELECT doc_id, """
    + _NESTED_CANON_POST
    + """ AS restored_digest FROM base)
SELECT b.doc_id, b.restored_digest, p2.post_digest
FROM base_d b JOIN post_d p2 USING (doc_id)
"""
)


def q_cdc_merge_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MoR compaction through the driver gate (VERDICT r2 #7): after a
    merge-on-read replay leaves delta layers, compact() folds them into the
    base — and the compacted table must hash-match the SAME oracle the
    layered read matched (read-path / fold-path equivalence)."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.sources.fixtures import SEQUENCES_SCHEMA
    from mongo_bulk_data_migration_spark.streaming.replay import ChangeStreamReplayer

    seqs, events, n_events = _cdc_frames(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix="mbdm_cmp_")
    cat = Catalog(wh)
    t = cat.create_table(
        "sequences", SEQUENCES_SCHEMA, num_buckets=16,
        properties={"merge_mode": "mor"},
    )
    t.append(seqs)
    rep = ChangeStreamReplayer(spark, wh, "sequences", "cmp", evolve_schema=False)
    rep.apply_changes(events, events_per_batch=max(n_events, 1))
    assert t.delta_layers() > 0, "merge-on-read produced no delta layers"
    t.compact(spark)
    assert t.delta_layers() == 0, "compaction left delta layers"
    return t.read(spark).select("doc_id", _tokens_digest("tokens"), "n_tok", "source")


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase event picks up the most recent
    click at-or-before it by the same user (single co-partitioning shuffle +
    running last(ignorenulls) window — no per-key cross product)."""
    from mongo_bulk_data_migration_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = asof_join(
        purchases, clicks, key="user_id",
        left_seq="purchase_id", right_seq="click_id",
        right_values=["click_id"],
    )
    return out.select(
        "user_id", "purchase_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("purchase_ms"),
        F.coalesce(F.col("asof_click_id"), F.lit(-1)).alias("last_click_id"),
    )


_ASOF_JOIN_ORACLE = """
SELECT user_id, purchase_id, purchase_ms, coalesce(last_click_id, -1) AS last_click_id FROM (
  SELECT user_id, side, event_id AS purchase_id, epoch_ms(ts) AS purchase_ms,
         last_value(click_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id, side DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id
  FROM (
    SELECT user_id, ts, event_id, NULL::BIGINT AS click_id, 0 AS side
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT user_id, ts, event_id, event_id AS click_id, 1 AS side
    FROM events WHERE event_type = 'click')
) WHERE side = 0
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) -> per-session summary.

    One hash shuffle on user_id; lag + running sum share a single
    within-partition sort; the summary re-uses the same partitioning."""
    from mongo_bulk_data_migration_spark.operators.temporal import sessionize

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    s = sessionize(ev, key="user_id", ts="ts", seq="event_id", gap_minutes=30.0)
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_millis(F.min("ts").cast("timestamp")).alias("start_ms"),
        F.unix_millis(F.max("ts").cast("timestamp")).alias("end_ms"),
    )


_SESSIONIZE_ORACLE = """
SELECT user_id, session_idx, count(*) AS n_events,
       epoch_ms(min(ts)) AS start_ms, epoch_ms(max(ts)) AS end_ms
FROM (
  SELECT user_id, ts,
         sum(CASE WHEN prev_ts IS NULL
                    OR epoch(ts) - epoch(prev_ts) <= 1800 THEN 0 ELSE 1 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_idx
  FROM (SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events))
GROUP BY user_id, session_idx
"""


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time hourly rollup: date_trunc bucket + hash agg with map-side
    partial combine (the Structured Streaming windowed-agg shape, batch)."""
    from mongo_bulk_data_migration_spark.operators.temporal import time_rollup

    ev = _t(spark, sf_dir, "events")
    return time_rollup(
        ev, ts="ts", unit="hour",
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double").alias("sum_value"),
        ],
    )


_TIME_ROLLUP_ORACLE = """
SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms, count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value::DECIMAL(18,6)), 2)::DOUBLE AS sum_value
FROM events GROUP BY 1
"""


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from the change feed: each event becomes
    a validity interval [ts, next ts) per user; open-ended current row.
    One shuffle + one partitioned sort (lead), no self-join."""
    from mongo_bulk_data_migration_spark.operators.temporal import scd2_intervals

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    s = scd2_intervals(ev, key="user_id", ts="ts", seq="event_id")
    return s.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.unix_millis(F.col("valid_from").cast("timestamp")).alias("from_ms"),
        F.coalesce(
            F.unix_millis(F.col("valid_to").cast("timestamp")), F.lit(-1)
        ).alias("to_ms"),
        F.col("is_current").cast("int").alias("is_current"),
    )


_SCD2_ORACLE = """
SELECT user_id, event_id, event_type AS state,
       epoch_ms(ts) AS from_ms,
       coalesce(epoch_ms(lead(ts) OVER w), -1) AS to_ms,
       (lead(ts) OVER w IS NULL)::INT AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed percentiles of document lengths per hash-ring
    split (sort-based exact percentile; the 100 TB path swaps in
    approx_percentile — t-digest sketch, one pass, mergeable — documented
    here because exact percentile IS verifiable against the oracle while
    the sketch is not bit-stable)."""
    from mongo_bulk_data_migration_spark.functions.sampling import hash_bucket

    d = _t(spark, sf_dir, "documents")
    g = d.withColumn("bucket", hash_bucket(F.col("doc_id"), 4))
    return g.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.percentile("n_chars", 0.5).alias("p50"),
        F.percentile("n_chars", 0.9).alias("p90"),
        F.percentile("n_chars", 0.99).alias("p99"),
    )


_QUANTILES_ORACLE = """
SELECT (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 4)::INT AS bucket,
       count(*) AS n_docs,
       quantile_cont(n_chars, 0.5) AS p50,
       quantile_cont(n_chars, 0.9) AS p90,
       quantile_cont(n_chars, 0.99) AS p99
FROM documents GROUP BY 1
"""


def q_stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming event-time tumbling-window counts under a
    watermark, append mode: only windows the watermark has CLOSED emit —
    the late-data contract (§2.10's aggregation face).  File-source replay:
    all real events arrive in micro-batch 1 (single part file, so the
    initial watermark drops nothing), then a far-future sentinel row in
    batch 2 pushes the watermark past every real window and flushes them.
    The sentinel's own (still-open) window is excluded from the result —
    append mode's guarantee is exactly that an open window never emits.
    Oracle: plain hourly counts in SQL."""
    _utc(spark)
    wh = tempfile.mkdtemp(prefix="mbdm_wm_")
    src = os.path.join(wh, "src")
    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    ev.coalesce(1).write.parquet(src)
    sentinel_ts = ev.agg(
        F.date_trunc("hour", F.max("ts")) + F.expr("INTERVAL 48 HOURS")
    ).collect()[0][0]
    spark.createDataFrame([(-1, sentinel_ts)], "event_id long, ts timestamp") \
        .coalesce(1).write.mode("append").parquet(src)

    name = f"wm_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        agg.writeStream.outputMode("append").format("memory").queryName(name)
        .option("checkpointLocation", os.path.join(wh, "ckpt"))
        .trigger(availableNow=True).start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("stream_windowed query did not finish in 600s")
    out = spark.table(name).where(F.col("w.start") < F.lit(sentinel_ts))
    return out.select(
        F.unix_millis(F.col("w.start")).alias("bucket_ms"), "n_events"
    )


_STREAM_WINDOWED_ORACLE = """
SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms, count(*) AS n_events
FROM events GROUP BY 1
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join via time-bin equi-join (no
    BroadcastNestedLoop): 60 overlapping 16h windows stepped 14h across
    the event month; count events per window."""
    from mongo_bulk_data_migration_spark.operators.rangejoin import bin_range_join

    t0 = 1704067200000  # 2024-01-01T00:00Z epoch ms
    step, width = 14 * 3_600_000, 16 * 3_600_000
    wins = spark.range(0, 60).select(
        F.col("id").alias("win_id"),
        (F.lit(t0) + F.col("id") * step).alias("lo_ms"),
        (F.lit(t0) + F.col("id") * step + width).alias("hi_ms"),
    )
    ev = _t(spark, sf_dir, "events").select("event_id", "ts")
    j = bin_range_join(ev, wins, ts="ts", bin_ms=4 * 3_600_000)
    return (
        j.groupBy("win_id", "lo_ms", "hi_ms")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


_RANGE_JOIN_ORACLE = """
WITH wins AS (
  SELECT i AS win_id,
         1704067200000 + i * 50400000 AS lo_ms,
         1704067200000 + i * 50400000 + 57600000 AS hi_ms
  FROM generate_series(0, 59) t(i))
SELECT win_id, lo_ms, hi_ms, count(*) AS n_events
FROM events e JOIN wins w
  ON epoch_ms(e.ts) >= w.lo_ms AND epoch_ms(e.ts) < w.hi_ms
GROUP BY 1, 2, 3
"""


def q_cdc_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance over the Change Data Feed:
    a per-source (count, sum n_tok) aggregate is initialized once, then kept
    in sync through a 4-batch MoR replay purely from the commits' change
    rows (sources/changefeed.py + operators/ivm.py) — the final table is
    NEVER rescanned.  The maintained view must hash-match a from-scratch
    GROUP BY of the oracle's final state."""
    _utc(spark)
    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.operators.ivm import init_grouped_agg, maintain
    from mongo_bulk_data_migration_spark.sources.changefeed import table_changes
    from mongo_bulk_data_migration_spark.sources.fixtures import SEQUENCES_SCHEMA
    from mongo_bulk_data_migration_spark.streaming.replay import ChangeStreamReplayer

    seqs, events, n_events = _cdc_frames(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix="mbdm_ivm_")
    cat = Catalog(wh)
    t = cat.create_table(
        "sequences", SEQUENCES_SCHEMA, num_buckets=16, properties={"merge_mode": "mor"}
    )
    t.append(seqs)
    v0 = t.current_version()
    agg = init_grouped_agg(t.read(spark), "source", ["n_tok"])
    rep = ChangeStreamReplayer(spark, wh, "sequences", "ivm", evolve_schema=False)
    rep.apply_changes(events, events_per_batch=max(n_events // _IVM_BATCHES, 1))
    assert t.current_version() > v0
    view = maintain(agg, table_changes(t, spark, v0), "source", ["n_tok"])
    return view.select(
        "source",
        F.col("n_rows").alias("n_docs"),
        F.col("sum_n_tok").alias("sum_tok"),
    )


def q_ivm_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed sink->source loop (VERDICT r3 #5): the same IVM workload
    as `cdc_ivm`, but maintained through the persistent
    MaterializedGroupedView follower with a mid-stream restart — fold part
    of the backlog, drop the follower, build a FRESH one from the on-disk
    checkpoint (atomic _CURRENT pointer), and continue.  The restarted
    view's content must hash-match the same sequential-replay oracle."""
    _utc(spark)
    import shutil

    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.operators.ivm import MaterializedGroupedView
    from mongo_bulk_data_migration_spark.sources.fixtures import SEQUENCES_SCHEMA
    from mongo_bulk_data_migration_spark.streaming.replay import ChangeStreamReplayer

    seqs, events, n_events = _cdc_frames(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix="mbdm_ivmr_")
    cat = Catalog(wh)
    t = cat.create_table(
        "sequences", SEQUENCES_SCHEMA, num_buckets=16, properties={"merge_mode": "mor"}
    )
    t.append(seqs)
    view_dir = os.path.join(wh, "_views", "by_source")
    mv = MaterializedGroupedView(spark, t, view_dir, "source", ["n_tok"])
    mv.initialize()
    epb = max(n_events // _IVM_BATCHES, 1)
    rep = ChangeStreamReplayer(spark, wh, "sequences", "ivmr", evolve_schema=False)
    rep.apply_changes(events, events_per_batch=epb, max_batches=2)
    mv.refresh()
    ckpt = mv.folded_version()
    del mv  # "crash": only the on-disk checkpoint survives
    rep.apply_changes(events, events_per_batch=epb)  # remaining batches
    mv2 = MaterializedGroupedView(spark, t, view_dir, "source", ["n_tok"])
    assert mv2.folded_version() == ckpt  # resumed, not reinitialized
    final = list(mv2.follow(poll_interval_s=0.01, max_polls=1))[-1]
    assert final == t.current_version()
    out = mv2.read().select(
        "source",
        F.col("n_rows").alias("n_docs"),
        F.col("sum_n_tok").alias("sum_tok"),
    )
    rows = out.collect()  # materialize before the scratch dirs vanish
    shutil.rmtree(wh, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


_IVM_BATCHES = 4


def q_stream_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The commit log consumed as a REAL Structured Streaming source
    (sources/stream_source.py, Spark 4 Python Data Source API): replay the
    derived events in _IVM_BATCHES MoR batches, then run
    ``spark.readStream.format("mbdm_changefeed")`` from the pre-replay
    version and fold the streamed change rows with the IVM signed-delta
    rule (+row for insert/update_post, -row for delete/update_pre).  The
    fold telescopes to final-state minus initial-state per source — which
    the oracle computes from the same sequential-merge layers — so one
    wrong value, change_type, version or dropped/duplicated row anywhere
    in the stream breaks the hash."""
    _utc(spark)
    import shutil
    import uuid

    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.sources.fixtures import SEQUENCES_SCHEMA
    from mongo_bulk_data_migration_spark.sources.stream_source import (
        ChangeFeedDataSource,
    )
    from mongo_bulk_data_migration_spark.streaming.replay import ChangeStreamReplayer

    seqs, events, n_events = _cdc_frames(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix="mbdm_feedstream_")
    cat = Catalog(wh)
    t = cat.create_table(
        "sequences", SEQUENCES_SCHEMA, num_buckets=16, properties={"merge_mode": "mor"}
    )
    t.append(seqs)
    v0 = t.current_version()
    rep = ChangeStreamReplayer(spark, wh, "sequences", "feedstream", evolve_schema=False)
    rep.apply_changes(events, events_per_batch=max(n_events // _IVM_BATCHES, 1))

    spark.dataSource.register(ChangeFeedDataSource)
    sink = f"feedstream_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("mbdm_changefeed")
        .option("warehouse", wh)
        .option("table", "sequences")
        .option("fromVersion", v0)
        .load()
        .writeStream.format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    # a timeout must fail LOUDLY: aggregating a partial memory-sink table
    # would surface as an oracle hash mismatch, indistinguishable from a
    # real engine bug
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("stream_changefeed query did not finish in 300s")
    q.stop()
    sign = F.when(
        F.col("_change_type").isin("insert", "update_post"), F.lit(1)
    ).otherwise(F.lit(-1))
    tok_sum = F.coalesce(
        F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x.cast("long")),
        F.lit(0).cast("long"),
    )
    out = (
        spark.table(sink)
        .groupBy("source")
        .agg(
            F.sum(sign).cast("long").alias("n_delta"),
            F.sum(sign * F.coalesce(F.col("n_tok"), F.lit(0))).cast("long").alias("tok_delta"),
            F.sum(sign * tok_sum).cast("long").alias("cksum_delta"),
        )
        # symmetric with the oracle: a source whose streamed deltas cancel
        # exactly carries no information either way
        .where(
            (F.col("n_delta") != 0)
            | (F.col("tok_delta") != 0)
            | (F.col("cksum_delta") != 0)
        )
    )
    rows = out.collect()  # materialize before the scratch warehouse vanishes
    shutil.rmtree(wh, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


def _stream_changefeed_oracle() -> str:
    """Signed-delta telescope: the streamed fold equals per-source
    (final-state aggregate) minus (initial-state aggregate).  Reuses the
    sequential-merge layers of ``_cdc_ivm_oracle`` and diffs state0 vs
    state{N}; n_tok in the engine's rows is len(tokens) by construction."""
    base = _cdc_ivm_oracle()
    head = base[: base.rindex("\nSELECT source,")]
    return head + f"""
, agg0 AS (
  SELECT source, count(*)::BIGINT AS n, sum(len(tokens))::BIGINT AS tok,
         sum(coalesce(list_aggregate(tokens, 'sum'), 0))::BIGINT AS cksum
  FROM state0 GROUP BY source
), aggN AS (
  SELECT source, count(*)::BIGINT AS n, sum(len(tokens))::BIGINT AS tok,
         sum(coalesce(list_aggregate(tokens, 'sum'), 0))::BIGINT AS cksum
  FROM state{_IVM_BATCHES} GROUP BY source
)
SELECT coalesce(a.source, b.source) AS source,
       (coalesce(b.n, 0) - coalesce(a.n, 0))::BIGINT AS n_delta,
       (coalesce(b.tok, 0) - coalesce(a.tok, 0))::BIGINT AS tok_delta,
       (coalesce(b.cksum, 0) - coalesce(a.cksum, 0))::BIGINT AS cksum_delta
FROM agg0 a FULL OUTER JOIN aggN b
  ON a.source IS NOT DISTINCT FROM b.source
WHERE coalesce(b.n, 0) - coalesce(a.n, 0) != 0
   OR coalesce(b.tok, 0) - coalesce(a.tok, 0) != 0
   OR coalesce(b.cksum, 0) - coalesce(a.cksum, 0) != 0
"""


def _cdc_ivm_oracle() -> str:
    """Sequential multi-batch oracle: unlike ``_CDC_ORACLE`` (one global
    last-wins collapse == single-batch replay), the IVM query replays in
    ``_IVM_BATCHES`` sequential batches, so INTERMEDIATE events apply too
    (batch 1's transform feeds batch 2's).  The oracle chains one
    last-wins-collapse + full-outer-merge layer per batch — the same
    fold the engine performs, in pure ANSI SQL."""
    head = """
WITH p AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
seqs AS (
  SELECT printf('doc%08d', i) AS doc_id,
         list_transform(generate_series(0, (1 + i % 512) - 1),
                        j -> ((i * 2654435761 + j) % 50257)::INT) AS tokens,
         (['web','books','code','wiki'])[(i % 4) + 1] AS source
  FROM (SELECT unnest(generate_series(0, (SELECT n_docs FROM p) - 1)) AS i)
),
ev AS (
  SELECT e AS seq,
         (e * 2654435761 + 12345) % (SELECT n_docs + n_docs // 4 FROM p) AS idx
  FROM (SELECT unnest(generate_series(0, (SELECT 2 * n_docs FROM p) - 1)) AS e)
),
events AS (
  SELECT seq, idx, printf('doc%08d', idx) AS doc_id,
    seq // (SELECT greatest((2 * n_docs) // {nb}, 1) FROM p) AS batch,
    CASE WHEN idx >= (SELECT n_docs FROM p) THEN 'insert'
         WHEN seq % 10 < 8 THEN 'update' ELSE 'delete' END AS op,
    CASE WHEN seq % 5 = 0 THEN 'append_eos'
         WHEN seq % 5 = 1 THEN 'drop_first_k'
         WHEN seq % 5 = 2 THEN 'remap_mod'
         WHEN seq % 5 = 3 THEN 'set_tokens'
         ELSE 'truncate' END AS tname,
    (1 + seq % 7)::INT AS karg,
    (101 + (seq % 7) * 100)::INT AS marg,
    list_transform(generate_series(0, (1 + seq % 9) - 1),
                   j -> ((idx * 2654435761 + j) % 50257)::INT) AS payload
  FROM ev
),
state0 AS (SELECT doc_id, tokens, source FROM seqs)""".format(nb=_IVM_BATCHES)
    layers = []
    for b in range(_IVM_BATCHES):
        layers.append(f""",
c{b} AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
    FROM events WHERE batch = {b}) WHERE rn = 1
),
state{b + 1} AS (
  SELECT coalesce(s.doc_id, c.doc_id) AS doc_id,
    CASE
      WHEN c.doc_id IS NULL THEN s.tokens
      WHEN c.op = 'insert' THEN c.payload
      ELSE CASE c.tname
          WHEN 'append_eos' THEN list_append(s.tokens, 50256::INT)
          WHEN 'drop_first_k' THEN s.tokens[c.karg + 1:]
          WHEN 'remap_mod' THEN list_transform(s.tokens, t -> (t % c.marg)::INT)
          WHEN 'set_tokens' THEN c.payload
          ELSE s.tokens[:c.karg]
        END
    END AS tokens,
    CASE WHEN c.doc_id IS NOT NULL AND c.op = 'insert' AND s.doc_id IS NULL
         THEN NULL ELSE s.source END AS source
  FROM state{b} s FULL OUTER JOIN c{b} c ON s.doc_id = c.doc_id
  WHERE NOT coalesce(c.op = 'delete' AND s.doc_id IS NOT NULL, false)
    AND NOT coalesce(c.op IN ('update', 'delete') AND s.doc_id IS NULL, false)
)""")
    tail = f"""
SELECT source, count(*)::BIGINT AS n_docs,
       sum(len(tokens))::BIGINT AS sum_tok
FROM state{_IVM_BATCHES} GROUP BY source
"""
    return head + "".join(layers) + tail


# ---------------------------------------------------------------------------
# token-array curation operators (operators/tokstats.py) — the corpus ops a
# pretraining pipeline runs over the engine's native (doc_id, tokens) payload
# ---------------------------------------------------------------------------


def _tok_cte(vocab_n: int = 32768) -> str:
    from mongo_bulk_data_migration_spark.operators.tokstats import hash_tokenize_sql

    return (
        f"SELECT doc_id, {hash_tokenize_sql('text', vocab_n)} AS tokens"
        " FROM documents"
    )


def _docs_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongo_bulk_data_migration_spark.operators.tokstats import hash_tokenize

    return _t(spark, sf_dir, "documents").select(
        "doc_id", hash_tokenize(F.col("text")).alias("tokens")
    )


def q_vocab_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary frequency re-index: re-id every token by corpus frequency
    rank (rank the bounded vocab dim, broadcast the map, reassemble by
    position — one corpus shuffle; see operators/tokstats.py scale notes).
    Digested to per-doc scalars (sum/first/last) because the driver's
    canonicalizer cannot sort raw list columns."""
    from mongo_bulk_data_migration_spark.operators.tokstats import frequency_remap

    r = frequency_remap(_docs_tokens(spark, sf_dir))
    return r.select(
        "doc_id",
        F.size("tokens").cast("int").alias("n_tok"),
        F.aggregate("tokens", F.lit(0).cast("bigint"), lambda a, t: a + t).alias(
            "remap_sum"
        ),
        F.element_at("tokens", 1).alias("first_id"),
        F.element_at("tokens", -1).alias("last_id"),
    )


def _vocab_remap_oracle() -> str:
    return f"""
WITH d AS ({_tok_cte()}),
e AS (SELECT doc_id, unnest(tokens) AS tok, generate_subscripts(tokens, 1) AS pos FROM d),
v AS (SELECT tok, count(*) AS n FROM e GROUP BY tok),
m AS (SELECT tok, (row_number() OVER (ORDER BY n DESC, tok ASC) - 1)::INT AS new_id FROM v)
SELECT e.doc_id, count(*)::INT AS n_tok, sum(m.new_id)::BIGINT AS remap_sum,
       arg_min(m.new_id, e.pos)::INT AS first_id,
       arg_max(m.new_id, e.pos)::INT AS last_id
FROM e JOIN m USING (tok) GROUP BY e.doc_id
"""


def q_fim_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-middle split with md5-derived (pure-function-of-key) cut
    points — zero shuffle, codegen'd slices; segment lengths + sums as the
    driver-hashable digest."""
    from mongo_bulk_data_migration_spark.functions.tokens import fim_split

    d = _docs_tokens(spark, sf_dir)
    parts = fim_split(F.col("tokens"), F.col("doc_id").cast("string"))
    lsum = lambda c: F.aggregate(c, F.lit(0).cast("bigint"), lambda a, t: a + t)
    return d.select(
        "doc_id",
        F.size("tokens").cast("int").alias("n_tok"),
        F.size(parts["prefix"]).cast("int").alias("len_prefix"),
        F.size(parts["middle"]).cast("int").alias("len_middle"),
        F.size(parts["suffix"]).cast("int").alias("len_suffix"),
        lsum(parts["prefix"]).alias("sum_prefix"),
        lsum(parts["middle"]).alias("sum_middle"),
        lsum(parts["suffix"]).alias("sum_suffix"),
    )


def _fim_split_oracle() -> str:
    return f"""
WITH d AS ({_tok_cte()}),
c AS (SELECT doc_id, tokens, len(tokens) AS n,
        (('0x' || substr(md5(doc_id::VARCHAR || ':f1'), 1, 8))::UBIGINT
         % (len(tokens) + 1))::BIGINT AS c1
      FROM d),
c2t AS (SELECT *, c1 + (('0x' || substr(md5(doc_id::VARCHAR || ':f2'), 1, 8))::UBIGINT
                        % (n - c1 + 1))::BIGINT AS c2
        FROM c)
SELECT doc_id, n::INT AS n_tok,
       c1::INT AS len_prefix, (c2 - c1)::INT AS len_middle, (n - c2)::INT AS len_suffix,
       coalesce(list_sum(list_slice(tokens, 1, c1)), 0)::BIGINT AS sum_prefix,
       coalesce(list_sum(list_slice(tokens, c1 + 1, c2)), 0)::BIGINT AS sum_middle,
       coalesce(list_sum(list_slice(tokens, c2 + 1, n)), 0)::BIGINT AS sum_suffix
FROM c2t
"""


def q_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy (diversity signal):
    two map-side-combinable hash aggregations, no window, no sort."""
    from mongo_bulk_data_migration_spark.operators.tokstats import unigram_entropy

    return unigram_entropy(_docs_tokens(spark, sf_dir))


def _unigram_entropy_oracle() -> str:
    return f"""
WITH d AS ({_tok_cte()}),
e AS (SELECT doc_id, unnest(tokens) AS tok FROM d),
c AS (SELECT doc_id, tok, count(*) AS c FROM e GROUP BY 1, 2)
SELECT doc_id, sum(c)::INT AS n_tok, count(*)::INT AS n_distinct,
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy
FROM c GROUP BY doc_id
"""


def q_ngram_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated token 8-grams (memorisation / boilerplate
    risk): grams built per-row with slice-over-sequence HOFs, shuffled on a
    fixed-width md5 key, deterministic top-20 cut."""
    from mongo_bulk_data_migration_spark.operators.tokstats import ngram_repeats

    return ngram_repeats(_docs_tokens(spark, sf_dir))


def _ngram_repeats_oracle() -> str:
    return f"""
WITH d AS ({_tok_cte()}),
s AS (SELECT doc_id, tokens,
             unnest(range(0, greatest(len(tokens) - 7, 0))) AS i
      FROM d),
g AS (SELECT doc_id,
             md5(array_to_string(list_slice(tokens, i + 1, i + 8), ',')) AS gram_md5
      FROM s),
a AS (SELECT gram_md5, count(DISTINCT doc_id)::INT AS n_docs,
             count(*)::BIGINT AS n_occurrences
      FROM g GROUP BY 1)
SELECT gram_md5, n_docs, n_occurrences FROM a WHERE n_docs >= 2
ORDER BY n_docs DESC, n_occurrences DESC, gram_md5 ASC LIMIT 20
"""


def q_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum decile assignment without a global sort: exact decile
    boundaries from ONE aggregation broadcast back over the corpus (the
    ntile-window alternative funnels 100 TB through one task).  Per-decile
    count + mean length as the digest."""
    from mongo_bulk_data_migration_spark.functions.sampling import quantile_buckets

    d = _t(spark, sf_dir, "documents")
    b = quantile_buckets(d, "n_chars", k=10)
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


_CURRICULUM_ORACLE = """
WITH b AS (
  SELECT [{qs}] AS bs FROM documents
)
SELECT (1 + len(list_filter(b.bs, x -> d.n_chars > x)))::INT AS bucket,
       count(*) AS n_docs, round(avg(d.n_chars), 4) AS avg_chars
FROM documents d, b GROUP BY 1
""".format(
    qs=", ".join(f"quantile_cont(n_chars, {i / 10})" for i in range(1, 10))
)


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: single-batch CDC merge-apply through the full engine."""
    return q_cdc_merge(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering contract: the round driver records official CORRECTNESS rows
    # for the FIRST 50 entries only.  Round-5 rotation: the 18 queries whose
    # official rows date to r03 (rotated out in r4) come first — notably
    # vocab_remap, whose implementation was rewritten in r4 AFTER its only
    # official row — followed by every CDC/engine query whose code round 5
    # touches (ivm, stream source, merge modes).  The 18 rotated out to
    # positions 51-68 are stable analytics operators holding green r4 rows
    # over code unchanged since.
    return {
        "vocab_topk": q_vocab_topk,
        "cdc_ivm": q_cdc_ivm,
        "vocab_remap": q_vocab_remap,
        "fim_split": q_fim_split,
        "unigram_entropy": q_unigram_entropy,
        "ngram_repeats": q_ngram_repeats,
        "curriculum_buckets": q_curriculum_buckets,
        "embedding_neardup": q_embedding_neardup,
        "ann_bruteforce": q_ann_bruteforce,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "token_count_bpe": q_token_count_bpe,
        "embedding_stats": q_embedding_stats,
        "simhash": q_simhash,
        "multimodal_features": q_multimodal_features,
        "delete_collection": q_delete_collection,
        "unset_rollback": q_unset_rollback,
        "pipeline_update": q_pipeline_update,
        "stream_changefeed": q_stream_changefeed,
        "ivm_restart": q_ivm_restart,
        "no_update_skip": q_no_update_skip,
        "cdc_merge_compacted": q_cdc_merge_compacted,
        "lookup_pipeline": q_lookup_pipeline,
        "nested_roundtrip": q_nested_roundtrip,
        "cdc_merge_skew": q_cdc_merge_skew,
        "pandas_callback": q_pandas_callback,
        "delete_restore": q_delete_restore,
        "projection_scope": q_projection_scope,
        "dead_letter": q_dead_letter,
        "asof_join": q_asof_join,
        "sessionize": q_sessionize,
        "time_rollup": q_time_rollup,
        "scd2_intervals": q_scd2_intervals,
        "quantiles": q_quantiles,
        "range_join": q_range_join,
        "stream_windowed": q_stream_windowed,
        "cdc_merge": q_cdc_merge,
        "cdc_merge_mor": q_cdc_merge_mor,
        "time_travel": q_time_travel,
        "schema_evolution": q_schema_evolution,
        "cdc_stream": q_cdc_stream,
        "rollback_roundtrip": q_rollback_roundtrip,
        "tpch_q1": q_tpch_q1,
        "filter_project": q_filter_project,
        "lookup_join": q_lookup_join,
        "count_matching": q_count_matching,
        "hwm_per_part": q_hwm_per_part,
        "last_wins": q_last_wins,
        "resume_filter": q_resume_filter,
        "metrics_fold": q_metrics_fold,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "topk_per_group": q_topk_per_group,
        "dedup_exact": q_dedup_exact,
        "token_count": q_token_count,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "gopher_filters": q_gopher_filters,
        "chunk_windows": q_chunk_windows,
        "fingerprint": q_fingerprint,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_bands": q_minhash_bands,
        "lsh_jaccard": q_lsh_jaccard,
        "neardup_clusters": q_neardup_clusters,
        "seq_packing": q_seq_packing,
        "holdout_split": q_holdout_split,
        "source_mixing": q_source_mixing,
        "decontaminate": q_decontaminate,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "stream_changefeed": _stream_changefeed_oracle(),
        "no_update_skip": _NO_UPDATE_SKIP_ORACLE,
        "cdc_merge_compacted": _CDC_ORACLE,
        "lookup_pipeline": _LOOKUP_PIPELINE_ORACLE,
        "nested_roundtrip": _NESTED_ROUNDTRIP_ORACLE,
        "cdc_merge_skew": _CDC_SKEW_ORACLE,
        "pandas_callback": _PANDAS_CALLBACK_ORACLE,
        "delete_restore": _DELETE_RESTORE_ORACLE,
        "projection_scope": _PROJECTION_SCOPE_ORACLE,
        "dead_letter": _DEAD_LETTER_ORACLE,
        "asof_join": _ASOF_JOIN_ORACLE,
        "sessionize": _SESSIONIZE_ORACLE,
        "time_rollup": _TIME_ROLLUP_ORACLE,
        "scd2_intervals": _SCD2_ORACLE,
        "quantiles": _QUANTILES_ORACLE,
        "range_join": _RANGE_JOIN_ORACLE,
        "stream_windowed": _STREAM_WINDOWED_ORACLE,
        "cdc_merge": _CDC_ORACLE,
        "cdc_merge_mor": _CDC_ORACLE,
        "time_travel": _TIME_TRAVEL_ORACLE,
        "schema_evolution": _EVO_ORACLE,
        "cdc_stream": _CDC_ORACLE,
        "rollback_roundtrip": _ROLLBACK_ORACLE,
        "tpch_q1": _TPCH_Q1_ORACLE,
        "filter_project": _FILTER_PROJECT_ORACLE,
        "lookup_join": _LOOKUP_JOIN_ORACLE,
        "count_matching": _COUNT_MATCHING_ORACLE,
        "hwm_per_part": _HWM_ORACLE,
        "last_wins": _LAST_WINS_ORACLE,
        "resume_filter": _RESUME_FILTER_ORACLE,
        "metrics_fold": _METRICS_FOLD_ORACLE,
        "anti_join": _ANTI_JOIN_ORACLE,
        "semi_join": _SEMI_JOIN_ORACLE,
        "topk_per_group": _TOPK_ORACLE,
        "dedup_exact": _DEDUP_EXACT_ORACLE,
        "token_count": _TOKEN_COUNT_ORACLE,
        "text_quality": _TEXT_QUALITY_ORACLE,
        "lang_id": _lang_id_oracle(),
        "gopher_filters": _GOPHER_FILTERS_ORACLE,
        "chunk_windows": _chunk_windows_oracle(),
        "fingerprint": _FINGERPRINT_ORACLE,
        "ngram_jaccard": _NGRAM_JACCARD_ORACLE,
        "minhash_bands": _MINHASH_BANDS_ORACLE,
        "lsh_jaccard": _lsh_jaccard_oracle(),
        "neardup_clusters": _neardup_clusters_oracle(),
        "seq_packing": _SEQ_PACKING_ORACLE,
        "holdout_split": _HOLDOUT_ORACLE,
        "source_mixing": _SOURCE_MIXING_ORACLE,
        "decontaminate": _DECONTAMINATE_ORACLE,
        "vocab_topk": _VOCAB_TOPK_ORACLE,
        "ivm_restart": _cdc_ivm_oracle(),
        "cdc_ivm": _cdc_ivm_oracle(),
        "vocab_remap": _vocab_remap_oracle(),
        "fim_split": _fim_split_oracle(),
        "unigram_entropy": _unigram_entropy_oracle(),
        "ngram_repeats": _ngram_repeats_oracle(),
        "curriculum_buckets": _CURRICULUM_ORACLE,
        "embedding_neardup": _embedding_neardup_oracle(),
        "ann_bruteforce": _ANN_ORACLE,
        "ann_lsh": _ann_lsh_oracle(),
        "ann_ivf": _ANN_IVF_ORACLE,
        "token_count_bpe": _token_count_bpe_oracle(),
        "embedding_stats": _EMBEDDING_STATS_ORACLE,
        "simhash": _simhash_oracle(),
        # multimodal: scalar columns oracle-checked; the stubbed decoder's
        # feature vector is pinned by a pytest golden md5 instead
        "multimodal_features": _MULTIMODAL_ORACLE,
        "delete_collection": _ROLLBACK_ORACLE,
        "unset_rollback": _UNSET_ROLLBACK_ORACLE,
        "pipeline_update": _PIPELINE_UPDATE_ORACLE,
    }
