"""Structured Streaming front-end: tail a binlog directory and apply each
micro-batch through the CDC engine.

The engine itself is batch-incremental (SURVEY.md §1.2 — exactly-once via
idempotent epoch-keyed lake commits, not sink-side streaming state); this
module adapts it to ``readStream`` + ``foreachBatch``, using Structured
Streaming's ``batch_id`` as the commit epoch. Spark guarantees foreachBatch
replays a failed batch with the SAME batch_id, so the lake's epoch guard
turns at-least-once delivery into exactly-once application — the same
recovery contract as the batch replay path, now driven by the streaming
scheduler. Event-time disorder needs no watermark here because the LWW
merge is order-insensitive by construction.

In production the source would be ``kafka`` / a CDC connector; the file
source (``maxFilesPerTrigger``) is the in-sandbox stand-in and also the
shape used for backfills.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from data_migration_validation_spark.plans.apply import CDCApplyEngine
from data_migration_validation_spark.plans.rollup import ContinuousRollup


def stream_apply(
    spark: SparkSession,
    log_dir: str,
    engine: CDCApplyEngine,
    schema: StructType,
    checkpoint_location: str,
    max_files_per_trigger: int = 1,
    rollup: ContinuousRollup | None = None,
    audit=None,
) -> StreamingQuery:
    """Start a streaming query that applies binlog parquet files to the
    engine's lake table, one foreachBatch epoch per micro-batch.

    With ``rollup``, the same batch_id-as-epoch also commits the batch's
    partial aggregates to a ContinuousRollup — both sinks share the
    idempotency key, so a replayed batch is a no-op in BOTH the lake and
    the metrics table (exactly-once ingest monitoring for free; no
    separate watermarked aggregation query to operate).

    ``audit`` enables write-audit-publish per micro-batch (see
    ``operators/audit``). A rejected batch FAILS the streaming query
    (raises) rather than returning: foreachBatch completing normally
    would mark the batch committed in the streaming checkpoint and skip
    it forever — silent data loss. Failing keeps the batch un-committed
    on both sides (the stage was discarded, the table untouched), so a
    restart replays the same batch_id after the operator fixes the feed
    or relaxes the gate."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(log_dir)
    )

    def apply_batch(batch_df, batch_id: int) -> None:
        st = engine.apply_epoch(batch_df, int(batch_id), audit=audit)
        if st.rejected:
            raise RuntimeError(
                f"micro-batch {batch_id} failed its write-audit-publish "
                f"gate: {st.audit_violations} — table untouched, batch "
                "will replay on restart"
            )
        if rollup is not None:
            rollup.apply_epoch(batch_df, int(batch_id))

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_location)
        .trigger(availableNow=True)
        .start()
    )
