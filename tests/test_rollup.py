"""Continuous-rollup tests: incremental == batch regardless of epoch
split, idempotent re-apply, compaction folds without changing the merged
result, and crash-orphan partials are invisible until committed."""

from __future__ import annotations

import os
import sys
from datetime import datetime, timedelta

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_migration_validation_spark.plans.rollup import (  # noqa: E402
    ContinuousRollup,
    RollupSpec,
)

SPEC = RollupSpec(ts_col="ts", window="1 hour", dims=("kind",), sums={"sum_v": "v"})


def _events(spark):
    base = datetime(2024, 1, 1)
    rows = [
        (base + timedelta(minutes=7 * i), ["a", "b"][i % 2], float(i), i % 3)
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "ts timestamp, kind string, v double, epoch int")


def _expected(df):
    return {
        (r["window_start"], r["kind"]): (r["n_events"], round(r["sum_v"], 6))
        for r in df.groupBy(
            F.window("ts", "1 hour").alias("w"), "kind"
        )
        .agg(F.count("*").alias("n_events"), F.sum("v").alias("sum_v"))
        .select(F.col("w.start").alias("window_start"), "kind", "n_events", "sum_v")
        .collect()
    }


def _merged(rollup):
    return {
        (r["window_start"], r["kind"]): (r["n_events"], round(r["sum_v"], 6))
        for r in rollup.read().collect()
    }


def test_incremental_matches_batch_and_is_idempotent(spark, tmp_path):
    ev = _events(spark)
    r = ContinuousRollup(spark, str(tmp_path / "ru"), SPEC)
    for e in range(3):
        assert r.apply_epoch(ev.where(F.col("epoch") == e), e) is True
    assert _merged(r) == _expected(ev)

    # re-applying a committed epoch is a no-op — at-least-once safe
    assert r.apply_epoch(ev.where(F.col("epoch") == 1), 1) is False
    assert r.epochs_applied() == {0, 1, 2}
    assert _merged(r) == _expected(ev)


def test_compaction_folds_groups_result_unchanged(spark, tmp_path):
    ev = _events(spark)
    r = ContinuousRollup(spark, str(tmp_path / "ru"), SPEC)
    for e in range(3):
        r.apply_epoch(ev.where(F.col("epoch") == e), e)
    before = _merged(r)
    assert r.n_groups() == 3
    assert r.compact() == 3
    assert r.n_groups() == 1
    assert _merged(r) == before
    # epochs survive compaction (idempotency is permanent)
    assert r.epochs_applied() == {0, 1, 2}
    assert r.apply_epoch(ev.where(F.col("epoch") == 0), 0) is False
    # a compacted base is a valid partial: later epochs stack on it
    more = _events(spark).withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY"))
    r.apply_epoch(more.where(F.col("epoch") == 0), 3)
    assert len(_merged(r)) == len(before) + len(
        {k for k in _expected(more.where(F.col("epoch") == 0))}
    )


def test_orphan_partial_is_invisible_until_committed(spark, tmp_path):
    """A crash between the parquet write and the manifest swap leaves an
    orphan directory the reader never sees; retrying the epoch overwrites
    it and commits normally."""
    ev = _events(spark)
    path = str(tmp_path / "ru")
    r = ContinuousRollup(spark, path, SPEC)
    r.apply_epoch(ev.where(F.col("epoch") == 0), 0)

    # simulate the crash: partial written, manifest NOT updated
    r._partial(ev.where(F.col("epoch") == 1)).write.mode("overwrite").parquet(
        os.path.join(path, "partials/epoch=1")
    )
    assert r.epochs_applied() == {0}
    assert _merged(r) == _expected(ev.where(F.col("epoch") == 0))

    # retry commits it
    assert r.apply_epoch(ev.where(F.col("epoch") == 1), 1) is True
    assert _merged(r) == _expected(ev.where(F.col("epoch") < 2))
