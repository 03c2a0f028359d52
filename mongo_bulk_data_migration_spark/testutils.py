"""Shipped test utility — the reference ships one too.

`doRollbackAndAssertForInitialState`
(`/root/reference/src/testUtils/doRollbackAndAssertForInitialState.ts:11-55`):
run rollback -> fetch all -> key-sorted deep-equal vs initial docs -> roll
back a SECOND time and require a zero-write no-op (idempotence).
"""

from __future__ import annotations

from typing import Any


def rows_sorted(df, key: str = "doc_id") -> list[dict[str, Any]]:
    out = []
    for r in df.collect():
        d = r.asDict(recursive=True)
        for k, v in list(d.items()):
            if isinstance(v, (list, tuple)):
                d[k] = list(v)
        out.append(d)
    return sorted(out, key=lambda d: d[key])


def do_rollback_and_assert_initial_state(engine, spark, initial_rows, key: str = "doc_id"):
    """Rollback, assert exact initial state, assert second rollback no-op."""
    engine.rollback()
    table = engine.get_collection()
    got = rows_sorted(table.read(spark), key)
    want = sorted((dict(r) for r in initial_rows), key=lambda d: d[key])
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    for g, w in zip(got, want):
        for c in w:
            assert g.get(c) == w[c], f"{g[key]}.{c}: {g.get(c)!r} != {w[c]!r}"
    res2 = engine.rollback()
    assert res2["nModified"] == 0 and res2["nRemoved"] == 0 and res2["nUpserted"] == 0
    return res2
