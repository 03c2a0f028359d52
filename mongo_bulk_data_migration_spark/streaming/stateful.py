"""Custom stateful streaming operators (``applyInPandasWithState``).

The engine's within-batch duplicate handling is the last-wins collapse
(:mod:`..operators.dedup`); ACROSS stream epochs, an oplog tail can replay or
deliver late duplicates that a per-epoch collapse cannot see.  This module
keeps per-key state between micro-batches — the Structured Streaming analog
of the reference's "a document is updated once per migration" precondition
(``/root/reference/README.md:36``) generalized to an infinite stream:

- :func:`dedup_by_seq` — keyed high-water-mark dedup: an event passes only if
  its ``seq`` is strictly above the key's last emitted ``seq``; state is one
  long per key (bounded, no growth with event count).

State lives in the Spark state store (checkpointed, recovered with the
query); processing is Arrow-batched pandas per key group — no per-row Python
in the hot loop beyond the per-group max bookkeeping.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_by_seq(
    events: DataFrame,
    key: str = "doc_id",
    seq: str = "seq",
) -> DataFrame:
    """Cross-epoch exactly-once filter: drop events at-or-below the key's
    stored high-water mark; emit the rest and advance the mark.

    Works on a STREAMING DataFrame (grouped-state processing). Output schema
    equals the input schema; state schema is one long per key.
    """
    out_schema = events.schema
    state_schema = "last_seq long"

    def fn(
        key_tuple: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else -1
        emitted = []
        for pdf in pdfs:
            pdf = pdf.sort_values(seq)
            fresh = pdf[pdf[seq] > last]
            if len(fresh):
                last = int(fresh[seq].max())
                emitted.append(fresh)
        state.update((last,))
        for e in emitted:
            yield e

    return (
        events.groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
