"""In-flight redelivery dedup for the change stream.

The batch/foreachBatch apply path is already dup-safe (LWW merge is
idempotent per key), but collapsing at-least-once redeliveries BEFORE
the lake write avoids shuffling and committing the duplicate payload
bytes at all. ``dropDuplicatesWithinWatermark`` is the scale-correct
primitive: plain ``dropDuplicates`` on a stream keeps every key seen
FOREVER in the state store (unbounded growth — the classic streaming
leak), while the watermark variant evicts a key's dedup state once
event time has passed it, bounding state to the redelivery horizon.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_redelivery(
    stream: DataFrame,
    *,
    keys: Sequence[str] = ("url", "seq"),
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop repeated deliveries of the same (url, seq) change event,
    keeping the first arrival; dedup state for an event is dropped once
    the watermark passes its timestamp (redeliveries are near-in-time,
    so a horizon-sized state is sufficient — and bounded)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
