"""Structured Streaming tailing mode: live change streams -> exactly-once sink.

The batch replayer (:mod:`.replay`) is the recovery/backfill path; this module
tails a LIVE oplog-style stream (files landing in a directory, or any
``readStream`` source with the FIXTURES.md T2 schema) and applies each
micro-batch through the SAME engine protocol via ``foreachBatch``:

    stream -> foreachBatch(epoch) -> last-wins collapse -> changelog append
           -> MERGE commit (marker = stream epoch id) -> HWM advance

Exactly-once composes from both layers: Structured Streaming's checkpoint
replays an epoch after a crash, and the engine's ``applied`` markers make the
replayed epoch a no-op — the same idempotence contract the seq-range batch
replay is tested under.

No watermarks/session windows are needed (SURVEY.md §2.10): the log is
seq-ordered; late/duplicate events are handled by last-wins + HWM filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.migration import MigrationOptions
from .replay import ChangeStreamReplayer


class StreamingIngest:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        table_name: str,
        migration_id: str,
        checkpoint_dir: str,
        options: MigrationOptions | None = None,
        evolve_schema: bool = True,
    ):
        self.spark = spark
        self.checkpoint_dir = checkpoint_dir
        self.replayer = ChangeStreamReplayer(
            spark, warehouse, table_name, migration_id, options, evolve_schema
        )

    def _apply_epoch(self, batch_df: DataFrame, epoch_id: int) -> None:
        # one stream epoch == one engine batch; the engine's applied-marker
        # check turns Structured Streaming's replay-after-crash into a no-op
        self.replayer.apply_epoch(batch_df, int(epoch_id))

    def start(self, stream_df: DataFrame, trigger_seconds: int | None = None):
        """``stream_df`` must be a streaming DataFrame with the T2 schema."""
        writer = (
            stream_df.writeStream.foreachBatch(self._apply_epoch)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("update")
        )
        if trigger_seconds:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        else:
            writer = writer.trigger(availableNow=True)
        return writer.start()
