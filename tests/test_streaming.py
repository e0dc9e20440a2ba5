"""Structured Streaming front-end: binlog files streamed through
foreachBatch into the lake, final state equal to the closed-form oracle."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_migration_validation_spark.functions.text import extract_text
from data_migration_validation_spark.operators.reconcile import (
    cogroup_reconcile,
    reconciliation_report,
)
from data_migration_validation_spark.plans.apply import CDCApplyEngine
from data_migration_validation_spark.sources.binlog import (
    BinlogConfig,
    expected_final_state,
    synth_binlog,
)
from data_migration_validation_spark.streaming.microbatch import stream_apply

CFG = BinlogConfig(n_keys=150, max_versions=3, events_per_epoch=100, seed=3)


def test_stream_apply_matches_oracle(spark, tmp_path):
    import os

    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    # one flat parquet file per epoch → maxFilesPerTrigger=1 gives one
    # micro-batch per epoch file
    log = synth_binlog(spark, CFG).drop("is_dup")
    for e in range(CFG.n_epochs):
        # write with Spark (correct nested types), then flatten the single
        # part file into the watched directory
        staging = str(tmp_path / f"staging-{e}")
        log.where(F.col("batch_epoch") == e).coalesce(1).write.parquet(staging)
        part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        os.rename(os.path.join(staging, part), f"{log_dir}/epoch-{e}.parquet")

    engine = CDCApplyEngine(
        spark, table_path=str(tmp_path / "table"), checkpoint_path=str(tmp_path / "ckpt"), num_buckets=8
    )
    schema = log.schema
    q = stream_apply(
        spark,
        log_dir,
        engine,
        schema=schema,
        checkpoint_location=str(tmp_path / "stream_ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    applied = engine.lake.epochs_applied()
    assert len(applied) >= 2, "expected multiple micro-batches"

    final = engine.read_final().select("url", "warc_ts", "seq", "html", "lang", "fetch_status", "text")
    expected = expected_final_state(spark, CFG).withColumn("text", extract_text(F.col("html")))
    report = reconciliation_report(cogroup_reconcile(expected, final, key="url"))
    assert report == {}, f"stream apply diverged: {report}"


def test_stream_apply_with_novelty_drops_cross_batch_dups(spark, tmp_path):
    """The streaming front-end composes with the ingest novelty filter:
    batch_id-as-epoch drives the same admission gate as the batch
    replay, so content already ingested by an earlier micro-batch is
    dropped by a later one (deletes and novel content pass through)."""
    import os

    from tests.test_novelty import SCHEMA as NSCHEMA, _ev

    log_dir = str(tmp_path / "nvlog")
    os.makedirs(log_dir)
    epochs = [
        [_ev("I", "u/a", 1, "alpha text")],
        [_ev("I", "u/b", 10, "alpha text", 1),  # cross-batch content dup
         _ev("I", "u/c", 11, "beta text", 1)],
    ]
    for e, rows in enumerate(epochs):
        staging = str(tmp_path / f"nvstage-{e}")
        spark.createDataFrame(rows, NSCHEMA).coalesce(1).write.parquet(staging)
        part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        os.rename(os.path.join(staging, part), f"{log_dir}/epoch-{e}.parquet")

    engine = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "nvtable"),
        checkpoint_path=str(tmp_path / "nvckpt"),
        num_buckets=4,
        compact_every=None,
        novelty_filter=True,
        novelty_buckets=2,
        novelty_bloom_bits=1 << 12,
    )
    q = stream_apply(
        spark,
        log_dir,
        engine,
        schema=spark.createDataFrame([], NSCHEMA).schema,
        checkpoint_location=str(tmp_path / "nvstream-ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    assert engine.lake.epochs_applied() == {0, 1}
    urls = {r["url"] for r in engine.read_final().select("url").collect()}
    assert urls == {"u/a", "u/c"}, "cross-batch duplicate content must drop"


def test_stream_apply_maintains_rollup_exactly_once(spark, tmp_path):
    """stream_apply with a ContinuousRollup: the metrics table commits
    under the SAME batch_id-as-epoch key as the lake, so after the stream
    drains (and after a full restart-replay of the same source) the
    merged rollup equals the one-shot batch aggregate over the log."""
    import os
    import shutil

    from data_migration_validation_spark.plans.rollup import (
        ContinuousRollup,
        RollupSpec,
    )

    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    log = synth_binlog(spark, CFG).drop("is_dup")
    for e in range(CFG.n_epochs):
        staging = str(tmp_path / f"staging-{e}")
        log.where(F.col("batch_epoch") == e).coalesce(1).write.parquet(staging)
        part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        os.rename(os.path.join(staging, part), f"{log_dir}/epoch-{e}.parquet")

    spec = RollupSpec(ts_col="warc_ts", window="1 hour", dims=("op",), sums={})
    rollup = ContinuousRollup(spark, str(tmp_path / "rollup"), spec)
    engine = CDCApplyEngine(
        spark, table_path=str(tmp_path / "table"), checkpoint_path=str(tmp_path / "ckpt"), num_buckets=8
    )
    q = stream_apply(
        spark, log_dir, engine, schema=log.schema,
        checkpoint_location=str(tmp_path / "stream_ckpt"),
        rollup=rollup,
    )
    q.awaitTermination(120)
    assert len(rollup.epochs_applied()) >= 2, "expected multiple micro-batches"

    def merged():
        return {
            (r["window_start"], r["op"]): r["n_events"]
            for r in rollup.read().collect()
        }

    expected = {
        (r["window_start"], r["op"]): r["n_events"]
        for r in log.groupBy(F.window("warc_ts", "1 hour").alias("w"), "op")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "op", "n_events")
        .collect()
    }
    assert merged() == expected

    # restart from a WIPED streaming checkpoint: every batch redelivers;
    # the rollup's epoch guard must make the replay a no-op (no
    # double-counted windows)
    shutil.rmtree(str(tmp_path / "stream_ckpt"))
    q2 = stream_apply(
        spark, log_dir, engine, schema=log.schema,
        checkpoint_location=str(tmp_path / "stream_ckpt2"),
        rollup=rollup,
    )
    q2.awaitTermination(120)
    assert merged() == expected


def _write_stream_file(spark, rows, schema, staging, dest, mtime):
    """One flat parquet file with a controlled modification time (the file
    source orders same-listing files by mtime, so batch order is pinned)."""
    import os

    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.rename(os.path.join(staging, part), dest)
    os.utime(dest, (mtime, mtime))


_EVT_SCHEMA = "op string, url string, warc_ts timestamp, seq long"


def test_windowed_stats_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed aggregation with a watermark: a window
    finalizes once event time passes its end by the watermark delay, and
    a TOO-LATE event arriving after that eviction is dropped, not
    re-emitted — bounded state and write-once metrics rows.

    Spark's guarantee is one-directional: data within the watermark is
    definitely aggregated, data beyond it is definitely dropped only once
    the window's state has been EVICTED (end of the batch whose watermark
    passed the window end). So the late event goes in its own third
    batch, strictly after the eviction batch — the deterministic shape.
    """
    from datetime import datetime

    from data_migration_validation_spark.streaming.aggregates import (
        windowed_ingest_stats,
    )

    def ts(h, m):
        return datetime(2024, 1, 1, h, m)

    log_dir = tmp_path / "wlog"
    log_dir.mkdir()
    # batch 1 (on time): 2 events in [00:00,01:00) plus 02:30 — after this
    # batch the watermark is 01:30, past the hour-0 window's end
    _write_stream_file(
        spark,
        [("U", "u1", ts(0, 30), 1), ("U", "u2", ts(0, 40), 2),
         ("U", "u4", ts(2, 30), 4)],
        _EVT_SCHEMA, str(tmp_path / "s0"), str(log_dir / "b0.parquet"), 1_000,
    )
    # batch 2 (benign): its close runs eviction under watermark 01:30 —
    # the hour-0 window EMITS (count 2) and its state is dropped
    _write_stream_file(
        spark,
        [("U", "u7", ts(2, 45), 7)],
        _EVT_SCHEMA, str(tmp_path / "s1"), str(log_dir / "b1.parquet"), 2_000,
    )
    # batch 3: a TOO-LATE event for the evicted [00:00,01:00) window
    # (dropped by the watermark filter — it must NOT re-open the window
    # and duplicate the emitted row) plus 05:30 pushing time forward
    _write_stream_file(
        spark,
        [("U", "u5", ts(0, 45), 5), ("U", "u6", ts(5, 30), 6)],
        _EVT_SCHEMA, str(tmp_path / "s2"), str(log_dir / "b2.parquet"), 3_000,
    )

    stream = (
        spark.readStream.schema(_EVT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(log_dir))
    )
    q = (
        windowed_ingest_stats(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("wstats")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    all_rows = spark.sql("SELECT * FROM wstats").collect()
    rows = {
        (r["window_start"].hour, r["op"]): r["n_events"] for r in all_rows
    }
    # every (window, op) emitted exactly once — the too-late u5 did not
    # re-open the evicted hour-0 window as a fresh (duplicate) state row
    assert len(all_rows) == len(rows), all_rows
    # the hour-0 window finalized with only its 2 on-time events
    assert rows.get((0, "U")) == 2, rows
    # the 05:30 window never finalizes (watermark never passes it)
    assert (5, "U") not in rows, rows


def test_stateful_key_progress_carries_state_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-key running totals and the LWW winner
    persist in the state store between micro-batches."""
    from datetime import datetime

    from data_migration_validation_spark.streaming.stateful import (
        stateful_key_progress,
    )

    def ts(h):
        return datetime(2024, 1, 1, h, 0)

    log_dir = tmp_path / "slog"
    log_dir.mkdir()
    _write_stream_file(
        spark,
        [("I", "u1", ts(1), 1), ("U", "u1", ts(2), 2)],
        _EVT_SCHEMA, str(tmp_path / "t0"), str(log_dir / "b0.parquet"), 1_000,
    )
    _write_stream_file(
        spark,
        [("D", "u1", ts(3), 3), ("I", "u2", ts(1), 4)],
        _EVT_SCHEMA, str(tmp_path / "t1"), str(log_dir / "b1.parquet"), 2_000,
    )

    stream = (
        spark.readStream.schema(_EVT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(log_dir))
    )
    q = (
        stateful_key_progress(stream)
        .writeStream.format("memory")
        .queryName("sprog")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = [tuple(r) for r in spark.sql("SELECT * FROM sprog").collect()]
    hour_ms = 3_600_000
    base = 1_704_067_200_000  # 2024-01-01T00:00Z in epoch ms
    # batch 1 emission: u1 saw 2 events, winner (02:00, seq 2), live
    assert ("u1", 2, base + 2 * hour_ms, 2, False) in rows, rows
    # batch 2 emission: u1's TOTAL kept growing (state carried) and the
    # LWW winner advanced to the tombstone
    assert ("u1", 3, base + 3 * hour_ms, 3, True) in rows, rows
    assert ("u2", 1, base + 1 * hour_ms, 4, False) in rows, rows


def test_stream_dedup_drops_redeliveries_with_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a redelivered (url, seq) inside the
    watermark horizon is dropped; dedup state is evicted once the
    watermark passes, so the stream's state is horizon-bounded."""
    from datetime import datetime

    from data_migration_validation_spark.streaming.stream_dedup import (
        dedup_redelivery,
    )

    def ts(h, m=0):
        return datetime(2024, 1, 1, h, m)

    log_dir = tmp_path / "dlog"
    log_dir.mkdir()
    # batch 1: two events + an immediate redelivery of (u1, 1)
    _write_stream_file(
        spark,
        [("I", "u1", ts(1), 1), ("I", "u1", ts(1), 1), ("I", "u2", ts(1, 5), 2)],
        _EVT_SCHEMA, str(tmp_path / "d0"), str(log_dir / "b0.parquet"), 1_000,
    )
    # batch 2: a cross-batch redelivery of (u2, 2) still inside the
    # 1-hour horizon, plus a fresh event advancing the watermark
    _write_stream_file(
        spark,
        [("I", "u2", ts(1, 5), 2), ("U", "u1", ts(2), 3)],
        _EVT_SCHEMA, str(tmp_path / "d1"), str(log_dir / "b1.parquet"), 2_000,
    )

    stream = (
        spark.readStream.schema(_EVT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(log_dir))
    )
    q = (
        dedup_redelivery(stream, keys=("url", "seq"), ts_col="warc_ts")
        .writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = sorted(
        (r["url"], r["seq"]) for r in spark.sql("SELECT * FROM sdedup").collect()
    )
    # each logical event exactly once: in-batch AND cross-batch
    # redeliveries both collapsed
    assert rows == [("u1", 1), ("u1", 3), ("u2", 2)], rows


def test_streaming_session_window_merges_and_finalizes(spark, tmp_path):
    """session_event_stats on a STREAM: events within the gap merge into
    one session (even across micro-batches); the session emits once the
    watermark passes its close."""
    from datetime import datetime

    from data_migration_validation_spark.streaming.aggregates import (
        session_event_stats,
    )

    def ts(h, m):
        return datetime(2024, 1, 1, h, m)

    schema = "user_id long, ts timestamp, value double"
    log_dir = tmp_path / "slog2"
    log_dir.mkdir()
    # batch 1: u1 events at 00:00 and 00:10 (one session)
    _write_stream_file(
        spark,
        [(1, ts(0, 0), 1.0), (1, ts(0, 10), 2.0)],
        schema, str(tmp_path / "x0"), str(log_dir / "b0.parquet"), 1_000,
    )
    # batch 2: u1 at 00:20 extends the SAME session across the batch
    # boundary; u1 at 03:00 opens a new one and pushes the watermark far
    # past the first session's close (00:50), finalizing it
    _write_stream_file(
        spark,
        [(1, ts(0, 20), 4.0), (1, ts(3, 0), 8.0)],
        schema, str(tmp_path / "x1"), str(log_dir / "b1.parquet"), 2_000,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(log_dir))
    )
    q = (
        session_event_stats(stream.withWatermark("ts", "1 hour"))
        .writeStream.format("memory")
        .queryName("ssess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sessckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {
        (r["session_start"].hour, r["session_start"].minute): (
            r["n_events"],
            r["sum_value"],
            r["session_end"].minute,
        )
        for r in spark.sql("SELECT * FROM ssess").collect()
    }
    # the three-event session merged across batches: 00:00-00:50, sum 7.0
    assert rows.get((0, 0)) == (3, 7.0, 50), rows
    # the 03:00 session never finalizes (watermark never passes 03:30)
    assert (3, 0) not in rows, rows
