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
