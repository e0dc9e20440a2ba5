"""Lake maintenance operations: manifest-recorded table properties,
state-triggered compaction self-healing, tombstone GC with a retention
horizon, and bucket-count evolution (rebucket)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_migration_validation_spark.operators.reconcile import cogroup_reconcile
from data_migration_validation_spark.plans.apply import CDCApplyEngine
from data_migration_validation_spark.plans.lake import LakeTable
from data_migration_validation_spark.sources.binlog import (
    BinlogConfig,
    epoch_slice,
    synth_binlog,
)

EV_SCHEMA = (
    "op string, url string, warc_ts timestamp, seq long, "
    "payload struct<html:binary,lang:string>, batch_epoch long"
)


def _events(spark, rows, epoch):
    """rows: (op, url, iso_ts, seq)."""
    data = [
        (
            op,
            url,
            datetime.fromisoformat(ts),
            seq,
            None if op == "D" else (f"<html><body><p>{url} s{seq}</p></body></html>".encode(), "en"),
            epoch,
        )
        for op, url, ts, seq in rows
    ]
    return spark.createDataFrame(data, EV_SCHEMA)


# -- table properties are manifest-recorded --------------------------------


def test_table_props_persisted_and_validated(spark, tmp_path):
    path = str(tmp_path / "t")
    engine = CDCApplyEngine(
        spark, table_path=path, checkpoint_path=str(tmp_path / "c"), num_buckets=8
    )
    engine.apply_epoch(
        _events(spark, [("I", "https://a/1", "2024-01-01 00:00:00", 0)], 0), 0
    )
    # reopen with no properties: adopts the recorded ones
    reopened = LakeTable(path)
    assert reopened.num_buckets == 8
    assert reopened.key_col == "url"
    assert reopened.order_cols == ("warc_ts", "seq")
    # a conflicting bucket count is the silent-corruption case — must raise
    with pytest.raises(ValueError, match="num_buckets"):
        LakeTable(path, num_buckets=64)
    with pytest.raises(ValueError, match="key_col"):
        CDCApplyEngine(
            spark, table_path=path, checkpoint_path=str(tmp_path / "c2"), key_col="id"
        )
    # matching values are fine
    assert LakeTable(path, num_buckets=8, key_col="url").num_buckets == 8


# -- compaction trigger is state-based (self-healing) -----------------------


def test_compaction_self_heals_missed_boundary(spark, tmp_path):
    path = str(tmp_path / "t")

    def mk(ckpt, compact_every):
        return CDCApplyEngine(
            spark,
            table_path=path,
            checkpoint_path=str(tmp_path / ckpt),
            num_buckets=4,
            compact_every=compact_every,
        )

    # deltas pile up with compaction off — simulates a crash that skipped
    # the boundary (the epoch-modulo trigger would never rerun it)
    eng = mk("c1", None)
    url = "https://a/1"  # one key → one bucket → delta depth == epochs
    for e in range(3):
        eng.apply_epoch(_events(spark, [("U", url, f"2024-01-01 0{e}:00:00", e)], e), e)
    assert eng.lake.current_snapshot().delta_depth() == 3

    # next applied epoch under compact_every=3 triggers immediately, even
    # though (epoch+1) % 3 != 0 — the trigger reads accumulated state
    eng2 = mk("c2", 3)
    eng2.apply_epoch(_events(spark, [("U", url, "2024-01-01 03:00:00", 3)], 3), 3)
    snap = eng2.lake.current_snapshot()
    assert snap.delta_depth() == 0, "accumulated deltas were not folded"
    assert snap.summary.get("compacted_buckets", 0) >= 1


# -- tombstone GC -----------------------------------------------------------


def test_tombstone_gc_and_retention_gate(spark, tmp_path):
    engine = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "t"),
        checkpoint_path=str(tmp_path / "c"),
        num_buckets=4,
        compact_every=None,
    )
    dead, live = "https://a/dead", "https://a/live"
    engine.apply_epoch(
        _events(
            spark,
            [("I", dead, "2024-01-01 00:00:00", 0), ("I", live, "2024-01-01 00:00:00", 1)],
            0,
        ),
        0,
    )
    engine.apply_epoch(_events(spark, [("D", dead, "2024-01-02 00:00:00", 2)], 1), 1)

    # pre-GC: tombstone row present in raw state, key absent from final
    raw = engine.lake.read(spark, merge=False)
    assert raw.where(F.col("url") == dead).count() > 0
    assert engine.read_final().where(F.col("url") == dead).count() == 0

    horizon = "2024-01-03 00:00:00"
    engine.lake.compact(spark, gc_horizon_ts=horizon)

    # post-GC: the deleted key's rows are PHYSICALLY absent (raw read sees
    # every surviving row of every file), live key untouched
    raw = engine.lake.read(spark, merge=False)
    assert raw.where(F.col("url") == dead).count() == 0
    assert raw.where(F.col("url") == live).count() == 1
    assert engine.lake.gc_horizon() == horizon

    # a late event at/below the horizon cannot resurrect the key — the
    # apply-time retention gate drops it (this is what makes removing the
    # tombstone safe)
    st = engine.apply_epoch(
        _events(spark, [("U", dead, "2024-01-01 12:00:00", 3)], 2), 2
    )
    assert st.events_seen == 0
    assert engine.read_final().where(F.col("url") == dead).count() == 0

    # an in-retention event applies normally
    engine.apply_epoch(
        _events(spark, [("U", live, "2024-01-04 00:00:00", 4)], 3), 3
    )
    assert engine.read_final().where(F.col("url") == live).count() == 1

    # the horizon survives reopen (manifest-recorded)
    assert LakeTable(str(tmp_path / "t")).gc_horizon() == horizon


# -- bucket-count evolution --------------------------------------------------


def test_rebucket_preserves_state_and_accepts_new_epochs(spark, tmp_path):
    cfg = BinlogConfig(n_keys=150, max_versions=3, events_per_epoch=150, seed=3)
    log_path = str(tmp_path / "log")
    synth_binlog(spark, cfg).write.parquet(log_path)
    log = spark.read.parquet(log_path)

    path = str(tmp_path / "t")
    engine = CDCApplyEngine(
        spark, table_path=path, checkpoint_path=str(tmp_path / "c"), num_buckets=4
    )
    half = cfg.n_epochs // 2
    for e in range(half):
        engine.apply_epoch(epoch_slice(log, cfg, e), e)
    before = engine.read_final()

    engine.lake.rebucket(spark, 16)
    assert engine.lake.num_buckets == 16
    # reopening adopts the new count; the old count now fails fast
    assert LakeTable(path).num_buckets == 16
    with pytest.raises(ValueError, match="num_buckets"):
        LakeTable(path, num_buckets=4)

    # state is byte-identical through the rewrite
    after = engine.read_final()
    assert cogroup_reconcile(before, after, key="url").count() == 0

    # subsequent epochs commit against the new bucket count (a fresh
    # engine with no explicit count adopts 16 from the manifest)
    engine2 = CDCApplyEngine(
        spark, table_path=path, checkpoint_path=str(tmp_path / "c")
    )
    assert engine2.lake.num_buckets == 16
    for e in range(half, cfg.n_epochs):
        st = engine2.apply_epoch(epoch_slice(log, cfg, e), e)
        assert not st.skipped

    # full-replay oracle: identical to a from-scratch replay at 16 buckets
    fresh = CDCApplyEngine(
        spark, table_path=str(tmp_path / "t2"), checkpoint_path=str(tmp_path / "c3"),
        num_buckets=16,
    )
    for e in range(cfg.n_epochs):
        fresh.apply_epoch(epoch_slice(log, cfg, e), e)
    assert cogroup_reconcile(
        fresh.read_final(), engine2.read_final(), key="url"
    ).count() == 0


def test_vacuum_removes_only_old_orphans(spark, tmp_path):
    """vacuum: an unreferenced data file older than the age guard is
    removed, a young one is kept (in-flight commit), referenced files
    are untouched, and the table reads identically afterwards."""
    import os
    import time

    from data_migration_validation_spark.plans.apply import CDCApplyEngine
    from data_migration_validation_spark.sources.binlog import (
        BinlogConfig,
        epoch_slice,
        synth_binlog,
    )

    cfg = BinlogConfig(n_keys=80, max_versions=2, events_per_epoch=100, seed=3)
    log = synth_binlog(spark, cfg)
    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "vt"),
        checkpoint_path=str(tmp_path / "vc"),
        num_buckets=4,
    )
    for e in range(cfg.n_epochs):
        eng.apply_epoch(epoch_slice(log, cfg, e), e)
    lake = eng.lake
    before = sorted(r["url"] for r in eng.read_final().select("url").collect())

    # crash leftovers: a commit dir with data but no manifest
    orphan_dir = os.path.join(lake.data_dir, "commit-99-deadbeef", "_bucket=0")
    os.makedirs(orphan_dir)
    old = os.path.join(orphan_dir, "part-old.parquet")
    young = os.path.join(orphan_dir, "part-young.parquet")
    for p in (old, young):
        with open(p, "wb") as f:
            f.write(b"not really parquet")
    past = time.time() - 7200
    os.utime(old, (past, past))

    out = lake.vacuum(min_age_seconds=3600)
    assert out["removed_files"] == 1
    assert not os.path.exists(old)
    assert os.path.exists(young)  # in-flight guard

    # second pass with no guard sweeps the young orphan and prunes the dir
    out = lake.vacuum(min_age_seconds=0)
    assert out["removed_files"] == 1
    assert not os.path.exists(os.path.dirname(young))

    after = sorted(r["url"] for r in eng.read_final().select("url").collect())
    assert after == before


def test_vacuum_sweeps_stale_quarantine_staging(spark, tmp_path):
    import os
    import time

    from data_migration_validation_spark.plans.lake import LakeTable

    table = str(tmp_path / "qs")
    lake = LakeTable(table, num_buckets=2)
    qdir = os.path.join(table, "_quarantine")
    stale = os.path.join(qdir, ".tmp-epoch-3-dead")
    live = os.path.join(qdir, "epoch=3")
    os.makedirs(stale)
    os.makedirs(live)
    past = time.time() - 7200
    os.utime(stale, (past, past))
    out = lake.vacuum(min_age_seconds=3600)
    assert out["removed_staging_dirs"] == 1
    assert not os.path.isdir(stale)
    assert os.path.isdir(live)  # real quarantine data untouched
