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

def test_range_read_inclusive_boundary_equality(spark, tmp_path):
    """Window edges that EQUAL a file's recorded min/max must keep the
    file. Regression: bounds were recorded tz-aware ('...+00:00' — what
    pyarrow returns for Spark's UTC-adjusted TIMESTAMP_MICROS), which
    sorts AFTER the naive query string, so `stats[f][0] > t1` wrongly
    pruned a file whose min equals the inclusive upper bound — silent
    row loss (verified: 0 rows where the exact filter returns >0)."""
    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "t3"),
        checkpoint_path=str(tmp_path / "c3"),
        num_buckets=4,
        compact_every=None,
    )
    eng.apply_epoch(_epoch_events(spark, 0, 11), 0)
    lake = eng.lake

    # t1 == the file's min timestamp (hour 0 of day 11)
    edge = "2024-01-11 00:00:00"
    got = lake.read_events_in_range(spark, "2024-01-01 00:00:00", edge)
    full = lake.read(spark, merge=False).where(
        F.col("warc_ts")
        <= F.to_timestamp(F.lit(edge))
    )
    assert got.count() == full.count() > 0

    # t0 == the file's max timestamp (hour 23)
    edge_hi = "2024-01-11 23:00:00"
    got_hi = lake.read_events_in_range(spark, edge_hi, "2024-02-01 00:00:00")
    full_hi = lake.read(spark, merge=False).where(
        F.col("warc_ts") >= F.to_timestamp(F.lit(edge_hi))
    )
    assert got_hi.count() == full_hi.count() > 0

    # recorded bounds are canonical naive-UTC (no tz suffix), so the
    # lexicographic==chronological contract holds as stored
    for lo, hi in lake.current_snapshot().ts_stats.values():
        assert "+" not in lo and "+" not in hi


def test_legacy_tz_aware_manifest_bounds_still_prune_correctly(spark, tmp_path):
    """Manifests written before the fix carry '...+00:00' bounds; the
    planner normalizes BOTH sides at compare time, so legacy tables keep
    correct (and still useful) pruning without a manifest rewrite."""
    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "t4"),
        checkpoint_path=str(tmp_path / "c4"),
        num_buckets=4,
        compact_every=None,
    )
    for epoch, day in [(0, 1), (1, 11)]:
        eng.apply_epoch(_epoch_events(spark, epoch, day), epoch)
    lake = eng.lake
    # fabricate a pre-sharding LEGACY manifest on disk: monolithic inline
    # file_groups/ts_stats (no bucket_manifests), with every bound
    # suffixed the way pyarrow's tz-aware isoformat once recorded them —
    # covering both the monolithic-fallback loader and tz normalization
    import json

    v = lake.current_version()
    m = lake._manifest_raw(v)
    snap = lake.current_snapshot()
    m.pop("bucket_manifests", None)
    m.pop("added_manifests", None)
    m["file_groups"] = snap.file_groups
    m["delta_groups"] = snap.delta_groups
    m["file_stats"] = snap.file_stats
    m["ts_stats"] = {
        f: [lo + "+00:00", hi + "+00:00"] for f, (lo, hi) in snap.ts_stats.items()
    }
    lake.store.write(f"v{v}.json", json.dumps(m))
    t0, t1 = "2024-01-11 00:00:00", "2024-01-11 23:00:00"
    _, _, cand, total = lake.files_in_time_range(t0, t1)
    assert 0 < cand < total  # prunes day-1 files, keeps day-11 (edge == min)
