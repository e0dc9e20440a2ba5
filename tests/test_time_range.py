"""Event-time range reads: per-file order-timestamp bounds recorded in
the manifest (from the same footer read as the row count) let a narrow
window skip files at PLANNING time — merge-on-read delta files cluster
tightly by arrival time, so this is the late-event investigation scan
that reads a few files out of a huge table."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_migration_validation_spark.plans.apply import CDCApplyEngine

SCHEMA = (
    "op string, url string, warc_ts timestamp, seq long, "
    "payload struct<html:binary,lang:string>, batch_epoch int"
)


def _epoch_events(spark, epoch: int, day: int, n: int = 30):
    rows = [
        (
            "I",
            f"https://a.example.com/{epoch}/{i}",
            datetime(2024, 1, day, i % 24),
            epoch * 1000 + i,
            (b"<html><p>x</p></html>", "en"),
            epoch,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_range_read_prunes_files_and_matches_full_scan(spark, tmp_path):
    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "t"),
        checkpoint_path=str(tmp_path / "c"),
        num_buckets=4,
        compact_every=None,  # keep per-epoch delta files distinct
    )
    # three epochs on three distinct days → disjoint per-file ts windows
    for epoch, day in [(0, 1), (1, 11), (2, 21)]:
        eng.apply_epoch(_epoch_events(spark, epoch, day), epoch)
    lake = eng.lake

    # timestamp bounds were recorded for every written file
    snap = lake.current_snapshot()
    n_files = sum(len(fs) for g in snap.delta_groups.values() for fs in g.values())
    assert n_files >= 3
    assert len(snap.ts_stats) == n_files + sum(
        len(fs) for g in snap.file_groups.values() for fs in g.values()
    )

    # a one-day window must plan a strict subset of the files
    t0, t1 = "2024-01-10 00:00:00", "2024-01-12 23:59:59"
    _, _, cand, total = lake.files_in_time_range(t0, t1)
    assert cand < total, f"no pruning: {cand}/{total}"

    got = lake.read_events_in_range(spark, t0, t1)
    full = lake.read(spark, merge=False).where(
        F.col("warc_ts").between(F.to_timestamp(F.lit(t0)), F.to_timestamp(F.lit(t1)))
    )
    assert sorted(r["url"] for r in got.select("url").collect()) == sorted(
        r["url"] for r in full.select("url").collect()
    )
    assert got.count() == 30  # exactly epoch 1's events


def test_range_read_survives_compaction(spark, tmp_path):
    """After compaction folds deltas into key-sorted base files, the ts
    windows widen (files are keyed, not time-ordered) — pruning may stop
    biting, but results must stay identical (absent/wide stats only ever
    ADD candidate files)."""
    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "t2"),
        checkpoint_path=str(tmp_path / "c2"),
        num_buckets=4,
        compact_every=None,
    )
    for epoch, day in [(0, 1), (1, 11)]:
        eng.apply_epoch(_epoch_events(spark, epoch, day), epoch)
    lake = eng.lake
    t0, t1 = "2024-01-01 00:00:00", "2024-01-02 00:00:00"
    before = sorted(
        r["url"] for r in lake.read_events_in_range(spark, t0, t1).select("url").collect()
    )
    assert lake.compact(spark) > 0
    after = sorted(
        r["url"] for r in lake.read_events_in_range(spark, t0, t1).select("url").collect()
    )
    assert after == before
