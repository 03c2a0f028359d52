"""Token-transform DSL, nested/positional updates (M1/M2/M5), text functions,
multimodal plumbing, dedup/ANN operators."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mongo_bulk_data_migration_spark.functions import nested
from mongo_bulk_data_migration_spark.functions.tokens import (
    EOS_TOKEN,
    apply_token_transform,
    parse_transform,
    reference_transforms_pandas,
    transform_expr,
)
from mongo_bulk_data_migration_spark.simulator import apply_transform


TOKENS = [10, 20, 30, 40, 50]


@pytest.mark.parametrize(
    "dsl",
    ["append_eos", "drop_first_k:2", "remap_mod:7", "truncate:3", "set_tokens"],
)
def test_transform_expr_matches_python_reference(spark, dsl):
    """JVM expression == pure-Python semantics (and the pandas twins)."""
    payload = [1, 2, 3]
    df = spark.createDataFrame(
        [(TOKENS, dsl, payload)], "tokens array<int>, transform string, payload array<int>"
    )
    name, arg = parse_transform(F.col("transform"))
    out = df.select(
        transform_expr(F.col("tokens"), name, arg, F.col("payload")).alias("t")
    ).collect()[0]["t"]
    assert list(out) == apply_transform(TOKENS, dsl, payload)


def test_pandas_twins_match():
    fns = reference_transforms_pandas()
    s = pd.Series([TOKENS])
    assert list(fns["append_eos"](s)[0]) == TOKENS + [EOS_TOKEN]
    assert list(fns["drop_first_k"](2)(s)[0]) == TOKENS[2:]
    assert list(fns["remap_mod"](7)(s)[0]) == [t % 7 for t in TOKENS]
    assert list(fns["truncate"](3)(s)[0]) == TOKENS[:3]


def test_apply_token_transform_maintains_n_tok(spark):
    df = spark.createDataFrame(
        [(TOKENS, "truncate:2", None)],
        "tokens array<int>, transform string, __event_tokens array<int>",
    )
    out = apply_token_transform(df).collect()[0]
    assert list(out["tokens"]) == TOKENS[:2]
    assert out["n_tok"] == 2


# ---------------------------------------------------------------------------
# nested / positional updates (M1/M2/M5)
# ---------------------------------------------------------------------------


def nested_df(spark):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField(
                "keys",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("subKey1", T.StringType()),
                            T.StructField(
                                "subKey2",
                                T.ArrayType(
                                    T.StructType(
                                        [
                                            T.StructField("elt1", T.IntegerType()),
                                            T.StructField("elt2", T.StringType()),
                                        ]
                                    )
                                ),
                            ),
                        ]
                    )
                ),
            ),
        ]
    )
    rows = [
        (
            "d1",
            [
                {"subKey1": "match_me", "subKey2": [{"elt1": 150, "elt2": "old"}, {"elt1": 50, "elt2": "keep"}]},
                {"subKey1": "other", "subKey2": [{"elt1": 999, "elt2": "keep2"}]},
            ],
        )
    ]
    return spark.createDataFrame(rows, schema)


def test_array_filters_two_level_positional_set(spark):
    """$set {'keys.$[e].subKey2.$[e2].elt2': 'NEW'} with
    arrayFilters [{e.subKey1: match_me}, {e2.elt1: {$gte: 100}}]
    (update.test.ts:529-594)."""
    df = nested_df(spark)
    updated = nested.set_where(
        F.col("keys"),
        lambda e: e["subKey1"] == "match_me",
        lambda e: e.withField(
            "subKey2",
            nested.set_where(
                e["subKey2"],
                lambda e2: e2["elt1"] >= 100,
                lambda e2: e2.withField("elt2", F.lit("NEW")),
            ),
        ),
    )
    row = df.select(updated.alias("keys")).collect()[0].asDict(recursive=True)
    k = row["keys"]
    assert k[0]["subKey2"][0]["elt2"] == "NEW"     # matched both filters
    assert k[0]["subKey2"][1]["elt2"] == "keep"    # elt1 < 100
    assert k[1]["subKey2"][0]["elt2"] == "keep2"   # subKey1 != match_me


def test_unset_where_positional(spark):
    """Rollback shape: $unset {'keys.$[e].subKey1'} with synthesized filter
    (computeRollbackQuery.ts:42-72)."""
    df = nested_df(spark)
    updated = nested.unset_where(
        F.col("keys"), lambda e: e["subKey1"] == "match_me", "subKey1"
    )
    k = df.select(updated.alias("keys")).collect()[0].asDict(recursive=True)["keys"]
    assert k[0]["subKey1"] is None
    assert k[1]["subKey1"] == "other"


def test_set_unset_array_index(spark):
    df = spark.createDataFrame([([1, 2, 3],)], "arr array<int>")
    assert df.select(nested.set_array_index(F.col("arr"), 1, F.lit(9)).alias("a")).collect()[0][
        "a"
    ] == [1, 9, 3]
    assert df.select(nested.unset_array_index(F.col("arr"), 1).alias("a")).collect()[0]["a"] == [
        1,
        3,
    ]


def test_set_unset_struct_path(spark):
    df = spark.createDataFrame([(("x", 1),)], "s struct<a:string,b:int>")
    out = df.select(nested.set_path(F.col("s"), "a", F.lit("y")).alias("s")).collect()[0]["s"]
    assert out["a"] == "y" and out["b"] == 1
    out = df.select(nested.unset_path(F.col("s"), "b").alias("s")).collect()[0]["s"].asDict()
    assert out == {"a": "x"}


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_multimodal_decode_features(spark):
    from mongo_bulk_data_migration_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        decode_features,
        _fake_features,
    )

    rows = [
        ("m1", "image", bytearray(b"abcdef"), {"width": 2, "height": 3, "sample_rate": None, "n_frames": None}),
        ("m2", "audio", bytearray(b""), {"width": None, "height": None, "sample_rate": 44100, "n_frames": None}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_features(df).collect()}
    assert got["m1"]["n_bytes"] == 6
    assert [round(x, 6) for x in got["m1"]["features"]] == [
        round(x, 6) for x in _fake_features(b"abcdef")
    ]
    assert got["m2"]["features"] == [0.0] * 8


def test_multimodal_features_vector_golden(spark):
    """The driver row checks only the scalar columns (oracle-backed); the
    stubbed decoder's FEATURE VECTOR output over sf0.001 documents is pinned
    here as a literal golden digest so a decoder regression still fails."""
    import os

    from mongo_bulk_data_migration_spark.functions.multimodal import decode_features

    sf = "/root/testdata/sf0.001/documents.parquet"
    if not os.path.exists(sf):
        pytest.skip("driver testdata not present")
    d = spark.read.parquet(sf).select(
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
    row_d = F.md5(
        F.concat_ws(
            "|",
            "media_id",
            F.concat_ws(",", F.transform("features", lambda x: F.format_number(x, 6))),
        )
    )
    got = (
        feats.select(row_d.alias("d"))
        .agg(F.md5(F.concat_ws(",", F.sort_array(F.collect_list("d")))).alias("g"))
        .collect()[0]["g"]
    )
    assert got == "4345482848d7e9986d8adee695928c31"


def test_multimodal_stubs_raise():
    from mongo_bulk_data_migration_spark.functions import multimodal

    with pytest.raises(NotImplementedError):
        multimodal.resize_images(None, 10, 10)
    with pytest.raises(NotImplementedError):
        multimodal.sample_frames(None, 5)


# ---------------------------------------------------------------------------
# dedup / ANN invariants
# ---------------------------------------------------------------------------


def test_minhash_lsh_finds_near_duplicates(spark):
    from mongo_bulk_data_migration_spark.operators.dedup_text import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    rows = [
        (1, base),
        (2, base + " tonight"),            # near-dup of 1
        (3, "completely different text about spark query engines and columnar io"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cands = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(df).collect()}
    assert (1, 2) in cands
    assert (1, 3) not in cands and (2, 3) not in cands
    verified = ngram_jaccard_pairs(df, threshold=0.5, candidates=minhash_lsh_candidates(df))
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert got.get((1, 2), 0) > 0.5


def test_embedding_neardup_and_ann(spark):
    from mongo_bulk_data_migration_spark.operators.ann import brute_force_topk, lsh_topk
    from mongo_bulk_data_migration_spark.operators.dedup_text import embedding_neardup_pairs

    import math

    def vec(seed, dim=16):
        vals = [math.sin(seed * (i + 1)) for i in range(dim)]
        return vals

    rows = [(1, vec(1)), (2, [v * 1.001 for v in vec(1)]), (3, vec(7)), (4, vec(13))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(df, dim=16, threshold=0.999).collect()}
    assert (1, 2) in pairs

    q = vec(1)
    top = brute_force_topk(df, q, k=2)
    ids = [r["vec_id"] for r in top.collect()]
    assert set(ids) == {1, 2}
    lsh = lsh_topk(df, q, k=2, dim=16)
    assert {r["vec_id"] for r in lsh.collect()} >= {1}


def test_ivf_topk_sparse_centroid_ids(spark):
    """ADVICE r2 regression: ivf_topk must map centroid IDs to array
    POSITIONS — with gaps in the id space (filtered table) the probe list
    previously pointed at the wrong inverted lists."""
    import math

    import pytest

    from mongo_bulk_data_migration_spark.operators.ann import brute_force_topk, ivf_topk

    def vec(seed, dim=16):
        return [math.sin(seed * (i + 1)) for i in range(dim)]

    # ids 0..9 minus {1, 3}: centroid candidates (< 8) are {0,2,4,5,6,7} —
    # sparse, non-contiguous
    rows = [(i, vec(i + 1)) for i in range(10) if i not in (1, 3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [v * 1.001 for v in vec(8)]  # near vec_id=7
    got = [r["vec_id"] for r in ivf_topk(df, q, k=1, n_centroids=8, nprobe=6).collect()]
    want = [r["vec_id"] for r in brute_force_topk(df, q, k=1).collect()]
    assert got == want == [7]

    with pytest.raises(ValueError, match="no centroid rows"):
        ivf_topk(df.where("vec_id >= 8"), q, k=1, n_centroids=8)


def test_connected_components_label_propagation(spark):
    """Chain (multi-round convergence), pair, and triangle components all
    resolve to min-id cluster labels; unpaired nodes never appear."""
    from mongo_bulk_data_migration_spark.operators.cluster import connected_components

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
         ("x", "y"),
         ("m", "n"), ("n", "o"), ("m", "o")],
        ["id_a", "id_b"],
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {
        "a": "a", "b": "a", "c": "a", "d": "a", "e": "a",
        "x": "x", "y": "x",
        "m": "m", "n": "m", "o": "m",
    }


def test_holdout_split_deterministic(spark):
    """Split is a pure function of the key (python-md5-checkable) and the
    bucket ring is percent-granular."""
    import hashlib

    from mongo_bulk_data_migration_spark.functions.sampling import (
        hash_bucket,
        holdout_split,
    )

    df = spark.range(0, 200).select(
        F.col("id"),
        hash_bucket(F.col("id"), 100).alias("bucket"),
        holdout_split(F.col("id")).alias("split"),
    )
    for r in df.collect():
        b = int(hashlib.md5(str(r["id"]).encode()).hexdigest()[:8], 16) % 100
        assert r["bucket"] == b
        want = "train" if b < 90 else ("valid" if b < 95 else "test")
        assert r["split"] == want


def test_temperature_mix_rebalances(spark):
    """alpha<1 mixing: the scarcest source survives intact, dominant sources
    subsample toward n^alpha shares, and membership is key-deterministic."""
    from mongo_bulk_data_migration_spark.functions.sampling import temperature_mix

    rows = [(i, "big") for i in range(900)] + [(i, "rare") for i in range(900, 1000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept = temperature_mix(df, alpha=0.5).select("doc_id", "source")
    by_src = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # scarcest source keeps every row (subsample-only realization)
    assert by_src["rare"] == 100
    # big's quota is n_rare * sqrt(n_big/n_rare) = 100*3 = 300 (hash jitter)
    assert 250 <= by_src["big"] <= 350
    # pure function of the key: second evaluation is identical
    again = temperature_mix(df, alpha=0.5).select("doc_id", "source")
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_contaminated_docs_broadcast_semi_join(spark):
    from mongo_bulk_data_migration_spark.operators.dedup_text import contaminated_docs

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "xx the quick brown fox jumps somewhere else"),  # shares 20-gram
            (2, "completely different words entirely here now"),
            (3, "lazy dog walks home"),  # shares words but no 20-char run
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"] for r in contaminated_docs(corpus, bench, k=20).collect()}
    assert got == {1}


def test_repetition_metrics(spark):
    """dup_word_frac / dup_2gram_frac against hand-computed references,
    including the 1-word and empty-ish edge cases (sequence(0,-1) guard)."""
    from mongo_bulk_data_migration_spark.functions.text import (
        dup_2gram_frac,
        dup_word_frac,
        repetition_keep,
    )

    rows = [
        (0, "a b a b a b"),          # words: 6, distinct 2 -> dwf 4/6
        (1, "all words here differ"),  # dwf 0, d2f 0
        (2, "solo"),                  # 1 word: d2f must be 0.0, not crash
        (3, "x x x x"),               # dwf 3/4, 2grams all "x x" -> d2f 2/3
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            dup_word_frac(F.col("text")).alias("dwf"),
            dup_2gram_frac(F.col("text")).alias("d2f"),
            repetition_keep(F.col("text")).alias("keep"),
        ).collect()
    }
    assert got[0]["dwf"] == round(1 - 2 / 6, 6)
    # 2grams of doc 0: "a b","b a","a b","b a","a b" -> 5 grams, 2 distinct
    assert got[0]["d2f"] == round(1 - 2 / 5, 6)
    assert got[1]["dwf"] == 0.0 and got[1]["d2f"] == 0.0 and got[1]["keep"]
    assert got[2]["d2f"] == 0.0
    assert got[3]["dwf"] == 0.75 and got[3]["d2f"] == round(1 - 1 / 3, 6)
    assert not got[3]["keep"]  # d2f 0.667 > 0.6


def test_chunk_windows_shapes(spark):
    """Overlapping chunking: full coverage, tail chunk shorter, no shuffle."""
    from mongo_bulk_data_migration_spark.operators.packing import chunk_windows

    df = spark.createDataFrame(
        [(0, 128), (1, 129), (2, 1), (3, 320), (4, 0)], ["doc_id", "n_tok"]
    )
    out = chunk_windows(df, "n_tok", window=128, stride=96)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[0]) == 1 and by_doc[0][0]["chunk_len"] == 128
    assert len(by_doc[1]) == 2  # 129 tokens -> second window covers the tail
    assert [r["chunk_start"] for r in sorted(by_doc[1], key=lambda r: r["chunk_id"])] == [0, 96]
    assert by_doc[1][1]["chunk_len"] == 129 - 96
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_len"] == 1
    # 320 tokens: ceil((320-128)/96)+1 = 3 chunks; last covers to the end
    c3 = sorted(by_doc[3], key=lambda r: r["chunk_id"])
    assert [r["chunk_start"] for r in c3] == [0, 96, 192]
    assert c3[-1]["chunk_start"] + c3[-1]["chunk_len"] == 320
    assert len(by_doc[4]) == 1 and by_doc[4][0]["chunk_len"] == 0
    # plan: no exchange — chunking must stay embarrassingly parallel
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
