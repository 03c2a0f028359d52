"""Nested-path and positional (arrayFilters) update expressions — M1/M2/M5.

The reference's update DSL addresses sub-documents by dotted path and array
elements by filtered positional operators:

    $set {'keys.$[e].subKey2.$[e2].elt2': v},
    arrayFilters: [{'e.subKey1': 'match_me'}, {'e2.elt1': {$gte: 100}}]

(`/root/reference/src/types.ts:14-15`, applied `src/lib/MigrationBulk.ts:35-42`,
paths parsed `src/tools/arrayFilters.ts:9-19`, semantics pinned by
`__tests__/MongoBulkDataMigration.update.test.ts:529-594` and
`rollback.test.ts:997-1106`).

Spark-first these become higher-order-function expression builders over
typed columns: `withField`/`dropFields` for nested structs, `transform` with
an element predicate for positional updates — all JVM-side, codegen'd,
arbitrarily nestable.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, functions as F


def set_path(col: Column, path: str, value: Column) -> Column:
    """M1 `$set {'a.b.c': v}` on a struct column — creates/overwrites the
    leaf; intermediate structs must exist (typed schemas, unlike BSON)."""
    return col.withField(path, value)


def unset_path(col: Column, path: str) -> Column:
    """M2 `$unset {'a.b.c': 1}` on a struct column."""
    return col.dropFields(path)


def set_array_index(arr: Column, index: int, value: Column) -> Column:
    """M1 `$set {'array.<i>': v}` — replace one element by position."""
    return F.transform(arr, lambda x, i: F.when(i == index, value).otherwise(x))


def unset_array_index(arr: Column, index: int) -> Column:
    """M2 on an array index — element removed (Mongo leaves null; a typed
    array drops it, the closer relational semantic)."""
    return F.filter(arr, lambda _, i: i != index)


def set_where(
    arr: Column, pred: Callable[[Column], Column], set_fn: Callable[[Column], Column]
) -> Column:
    """M5 filtered positional update: apply ``set_fn`` to every element
    matching ``pred`` — one `$[elem]` level of arrayFilters.

    Nest for multi-level paths::

        # $set {'keys.$[e].subKey2.$[e2].elt2': v}
        # arrayFilters: [{'e.subKey1': 'match_me'}, {'e2.elt1': {$gte: 100}}]
        set_where(
            F.col("keys"),
            lambda e: e["subKey1"] == "match_me",
            lambda e: e.withField(
                "subKey2",
                set_where(
                    e["subKey2"],
                    lambda e2: e2["elt1"] >= 100,
                    lambda e2: e2.withField("elt2", F.lit(v)),
                ),
            ),
        )
    """
    return F.transform(arr, lambda x: F.when(pred(x), set_fn(x)).otherwise(x))


def unset_where(arr: Column, pred: Callable[[Column], Column], field: str) -> Column:
    """M5 inverse shape: `$unset {'keys.$[e].<field>': 1}` with a synthesized
    filter — the reference's rollback of a positional set
    (`src/lib/computeRollbackQuery.ts:42-72`).

    Typed columns cannot drop a field for SOME elements only (the element
    type must stay uniform), so the schemaless `$unset` maps to setting the
    field NULL — `F.when(lit(False), x[field])` is a typed NULL of the
    field's own type without needing the schema."""
    return F.transform(
        arr,
        lambda x: F.when(
            pred(x), x.withField(field, F.when(F.lit(False), x[field]))
        ).otherwise(x),
    )
