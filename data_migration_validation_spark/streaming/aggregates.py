"""Event-time windowed aggregation over the change stream, with a
watermark bounding state.

The batch engine needs no watermark (the LWW merge is order-insensitive
and epochs are replayable), but continuous ingest MONITORING does:
an unbounded `groupBy(window)` over an endless stream accumulates one
state row per window forever — the classic streaming scale-killer. The
watermark closes windows once event time has moved `delay` past their
end, after which their state is dropped and later (too-late) events are
discarded rather than re-opening finalized results.

Append output mode means each (window, op) row is emitted exactly once,
when it finalizes — the right contract for a downstream metrics table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_ingest_stats(
    stream: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Per-(event-time window, op) ingest statistics.

    Late events beyond the watermark are dropped from finalized windows
    (asserted in tests/test_streaming.py); `approx_count_distinct` keeps
    the per-window state a constant-size sketch instead of a URL set —
    at web scale an exact distinct per window is itself a state bomb.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("op"))
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("url").alias("approx_urls"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n_events",
            "approx_urls",
        )
    )


def session_event_stats(
    df: DataFrame,
    *,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key session rollup: events for a key merge into one session
    while consecutive gaps stay UNDER ``gap``; the session closes at
    ``last_event + gap`` (Spark ``session_window`` semantics, which the
    gaps-and-islands SQL oracle reproduces exactly — strict ``<`` on the
    gap, since a window's end bound is exclusive).

    Works identically on a stream (with ``withWatermark`` upstream +
    update/append sink) — sessionization is Spark's built-in merging
    window state, not a custom operator. Batch plan: one shuffle on the
    key, per-partition sort, sessions merged in a single pass.
    """
    return (
        df.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def windowed_event_stats(
    df: DataFrame,
    *,
    window: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "event_type",
    id_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Batch twin of the streaming rollup: tumbling event-time windows on
    a static table, with EXACT distinct so a SQL oracle can replicate it
    bit-for-bit. `F.window` buckets are epoch-aligned, matching DuckDB's
    `time_bucket`. One hash-aggregate shuffle on (window, group) — the
    rollup that backfills the same metrics table the streaming op feeds."""
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(group_col))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct(id_col).alias("n_users"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n_events",
            "n_users",
            "sum_value",
        )
    )
