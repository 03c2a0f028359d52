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
        # Filter every chunk against the HWM captured at GROUP ENTRY, not a
        # running max: Arrow chunk order within a group is not seq-ordered,
        # so advancing the mark mid-iteration drops fresh events whose seq
        # is below a higher seq seen in an earlier chunk of the same
        # micro-batch (ADVICE r2).  State advances once, after all chunks.
        hwm = state.get[0] if state.exists else -1
        fresh_chunks = []
        for pdf in pdfs:
            fresh = pdf[pdf[seq] > hwm]
            if len(fresh):
                fresh_chunks.append(fresh)
        if fresh_chunks:
            out = pd.concat(fresh_chunks, ignore_index=True).sort_values(seq)
            # same-seq replays delivered twice within one micro-batch are
            # identical events — emit once (exactly-once within the batch)
            out = out.drop_duplicates(subset=[seq], keep="last")
            state.update((int(out[seq].max()),))
            yield out
        else:
            state.update((hwm,))

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
