"""Pure-pyarrow unit tests for the change-feed kernel layer (no Spark).

The streaming source's correctness rides on these kernels; the Spark-level
parity suite (test_stream_source.py) covers the integrated path, these pin
the edge cases a random parity run might not hit: empty lists, nulls on
one/both sides, length-equal-values-different, last-writer ties, and
tombstone resolution.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mongo_bulk_data_migration_spark.sources.arrowfeed import (
    DELETED_COL,
    DSEQ_COL,
    last_writer_per_key,
    rows_equal,
    values_equal,
)


def _la(vals):
    return pa.array(vals, pa.list_(pa.int32()))


def test_list_equality_edges():
    a = _la([[1, 2], [], None, [1, 2, 3], [5], None, []])
    b = _la([[1, 2], [], None, [1, 2, 4], [5, 6], [1], [2]])
    out = values_equal(a, b)
    #       eq   eq(empty) null==null  len-eq-val-neq  len-neq  null-vs-val  empty-vs-val
    assert out.tolist() == [True, True, True, False, False, False, False]


def test_scalar_and_string_equality_null_safe():
    a = pa.array(["x", None, "y", None])
    b = pa.array(["x", None, "z", "w"])
    assert values_equal(a, b).tolist() == [True, True, False, False]
    ai = pa.array([1, None, 3], pa.int64())
    bi = pa.array([1, None, 4], pa.int64())
    assert values_equal(ai, bi).tolist() == [True, True, False]


def test_rows_equal_multi_column():
    t1 = pa.table({"k": ["a", "b"], "toks": _la([[1], [2, 3]]), "n": [1, 2]})
    t2 = pa.table({"k": ["a", "b"], "toks": _la([[1], [2, 3]]), "n": [1, 9]})
    assert rows_equal(t1, t2, ["toks", "n"]).tolist() == [True, False]


def test_last_writer_per_key_picks_max_dseq():
    t = pa.table({
        "doc_id": ["a", "b", "a", "c", "b"],
        "v": [1, 2, 3, 4, 5],
        DELETED_COL: [False, False, True, False, False],
        DSEQ_COL: [1, 1, 2, 1, 3],
    })
    w = last_writer_per_key(t, "doc_id")
    got = {r["doc_id"]: (r["v"], r[DELETED_COL]) for r in w.to_pylist()}
    assert got == {"a": (3, True), "b": (5, False), "c": (4, False)}


def test_large_list_roundtrip_random():
    rng = np.random.default_rng(7)
    rows_a, rows_b, want = [], [], []
    for i in range(5000):
        n = int(rng.integers(0, 12))
        va = rng.integers(0, 100, n).astype(np.int32).tolist()
        if rng.random() < 0.5:
            rows_a.append(va); rows_b.append(list(va)); want.append(True)
        else:
            vb = list(va)
            mode = rng.random()
            if mode < 0.4 and n > 0:
                vb[int(rng.integers(0, n))] += 1
            elif mode < 0.7:
                vb.append(1)
            else:
                vb = None
            rows_a.append(va); rows_b.append(vb)
            want.append(va == vb)
    out = values_equal(_la(rows_a), _la(rows_b))
    assert out.tolist() == want
