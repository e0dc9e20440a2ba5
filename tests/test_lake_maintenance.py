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


def test_gc_horizon_canonicalized_never_regresses(spark, tmp_path):
    """Horizon strings canonicalize before the only-advances max(): a
    'T'-separated input would otherwise beat any same-day canonical
    string lexicographically ('T' > ' ') and REGRESS the horizon,
    re-admitting events whose tombstones were already GC'd."""
    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "hz-t"),
        checkpoint_path=str(tmp_path / "hz-c"),
        num_buckets=4,
        compact_every=None,
    )
    eng.apply_epoch(
        _events(spark, [("I", "https://a/x", "2024-01-01 00:00:00", 0)], 0), 0
    )
    eng.lake.compact(spark, gc_horizon_ts="2024-06-01 12:00:00")
    assert eng.lake.gc_horizon() == "2024-06-01 12:00:00"
    # an EARLIER same-day horizon in 'T' form must lose, not win
    eng.lake.compact(spark, gc_horizon_ts="2024-06-01T00:00:00")
    assert eng.lake.gc_horizon() == "2024-06-01 12:00:00"
    # a genuinely later 'T'-form horizon advances, stored canonicalized
    eng.lake.compact(spark, gc_horizon_ts="2024-06-02T00:00:00")
    assert eng.lake.gc_horizon() == "2024-06-02 00:00:00"


def test_conflict_retry_refuses_stale_horizon_plan(spark, tmp_path):
    """A commit conflict caused by a GC compaction that ADVANCED the
    horizon must not retry the epoch's merge plan: its admission filter
    baked the old horizon in as a literal, so retrying could apply
    events whose tombstones the concurrent GC just dropped. The engine
    fails loudly; a fresh apply re-plans and succeeds."""
    from data_migration_validation_spark.plans.lake import CommitConflictError

    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "rc-t"),
        checkpoint_path=str(tmp_path / "rc-c"),
        num_buckets=4,
        compact_every=None,
    )
    eng.apply_epoch(
        _events(spark, [("I", "https://a/x", "2024-01-01 00:00:00", 0)], 0), 0
    )
    lake = eng.lake
    real_commit = lake.commit
    state = {"fired": False}

    def racing_commit(*a, **kw):
        if not state["fired"]:
            state["fired"] = True
            # a GC compaction lands inside the epoch's commit window
            # (its own internal commit call re-enters this wrapper with
            # fired already set, so it delegates to the real commit)
            lake.compact(spark, gc_horizon_ts="2024-01-02 00:00:00")
            raise CommitConflictError("simulated flip race")
        return real_commit(*a, **kw)

    lake.commit = racing_commit
    try:
        with pytest.raises(RuntimeError, match="horizon advanced"):
            eng.apply_epoch(
                _events(spark, [("U", "https://a/x", "2024-01-03 00:00:00", 1)], 1),
                1,
            )
    finally:
        lake.commit = real_commit
    assert lake.epochs_applied() == {0}  # the stale plan never landed
    # a fresh apply re-plans against the new horizon and succeeds
    st = eng.apply_epoch(
        _events(spark, [("U", "https://a/x", "2024-01-03 00:00:00", 1)], 1), 1
    )
    assert st.events_seen == 1 and lake.epochs_applied() == {0, 1}


def test_expire_keeps_staged_carried_files(spark, tmp_path):
    """A staged (unpublished) commit carries its parent's files by
    reference; expiring that parent must not delete them — the staged
    version has to stay readable until it is rejected or published."""
    from data_migration_validation_spark.operators.audit import page_envelope_audit

    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "ex-t"),
        checkpoint_path=str(tmp_path / "ex-c"),
        num_buckets=4,
        compact_every=None,
    )
    eng.apply_epoch(
        _events(spark, [("I", "https://a/x", "2024-01-01 00:00:00", 0)], 0), 0
    )
    eng.apply_epoch(
        _events(spark, [("I", "https://a/y", "2024-01-01 00:00:01", 1)], 1), 1
    )
    with pytest.raises(RuntimeError, match="stage and publish"):
        eng.apply_epoch(
            _events(spark, [("I", "https://a/z", "2024-01-01 00:00:02", 2)], 2),
            2,
            audit=page_envelope_audit(),
            crash_after_stage=True,
        )
    (staged_v,) = eng.lake.staged_versions()
    staged_rows = eng.lake.read(spark, version=staged_v).count()
    assert staged_rows == 3  # carried epochs 0-1 + its own winner
    # advance the head past the stage's parent, then fold the deltas so
    # the head no longer references the parent's files itself
    eng.apply_epoch(
        _events(spark, [("I", "https://a/z", "2024-01-01 00:00:02", 2)], 2), 2
    )
    eng.lake.compact(spark)
    eng.lake.expire_snapshots(keep_last=1)
    # the staged version still resolves in full
    assert eng.lake.read(spark, version=staged_v).count() == staged_rows
    assert eng.lake.cleanup_staged() == 1


def test_vacuum_keeps_success_marker_at_live_commit_root(spark, tmp_path):
    """_SUCCESS sits at the commit-dir ROOT (the parent of the bucket
    dirs manifests reference); vacuum must keep it for live commits and
    still sweep it with dead ones."""
    import os
    import time

    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "sm-t"),
        checkpoint_path=str(tmp_path / "sm-c"),
        num_buckets=4,
        compact_every=None,
    )
    eng.apply_epoch(
        _events(spark, [("I", "https://a/x", "2024-01-01 00:00:00", 0)], 0), 0
    )
    lake = eng.lake
    live_commit = lake._manifest_raw(lake.current_version())["commit_dir"]
    live_marker = os.path.join(live_commit, "_SUCCESS")
    if not os.path.exists(live_marker):  # Spark config may disable it
        open(live_marker, "w").close()
    # a dead (orphan) commit dir with its own marker
    dead_dir = os.path.join(lake.data_dir, "commit-99-feedface")
    os.makedirs(os.path.join(dead_dir, "_bucket=0"))
    dead_marker = os.path.join(dead_dir, "_SUCCESS")
    open(dead_marker, "w").close()
    past = time.time() - 7200
    for root, _dirs, files in os.walk(lake.data_dir):
        for fn in files:
            os.utime(os.path.join(root, fn), (past, past))
    lake.vacuum(min_age_seconds=3600)
    assert os.path.exists(live_marker)  # live bookkeeping survives
    assert not os.path.exists(dead_marker)  # dead dir swept with its files
    assert eng.read_final().count() == 1


def test_maintenance_ops_work_through_pyarrow_data_fs(spark, tmp_path):
    """expire/vacuum/read_added route data-file IO through the DataFS
    seam: reopening the table with a pyarrow filesystem (LocalFileSystem
    here, S3/GCS in a real object-store deployment) must reclaim the
    same files the default os-backed handle would."""
    import os

    from pyarrow import fs as pafs
    from data_migration_validation_spark.fsio import DataFS

    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "fs-t"),
        checkpoint_path=str(tmp_path / "fs-c"),
        num_buckets=4,
        compact_every=None,
    )
    for e in range(3):
        eng.apply_epoch(
            _events(
                spark,
                [("I", f"https://a/{e}", f"2024-01-01 00:00:0{e}", e)],
                e,
            ),
            e,
        )
    eng.lake.compact(spark)  # strands the pre-compaction delta files
    before = eng.read_final().count()

    lake2 = LakeTable(
        str(tmp_path / "fs-t"), data_fs=DataFS(pafs.LocalFileSystem())
    )
    out = lake2.expire_snapshots(keep_last=1)
    assert out["expired_versions"] >= 1
    assert out["removed_files"] >= 1  # pre-compaction files actually deleted
    # orphan for vacuum, old enough to sweep
    orphan = os.path.join(lake2.data_dir, "commit-77-cafe", "_bucket=0")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-x.parquet"), "wb") as f:
        f.write(b"junk")
    import time

    past = time.time() - 7200
    os.utime(os.path.join(orphan, "part-x.parquet"), (past, past))
    assert lake2.vacuum(min_age_seconds=3600)["removed_files"] == 1
    # the file is gone; the empty dir stays (empty-dir pruning is a
    # documented no-op under a pyarrow filesystem — object stores have
    # no directories to prune)
    assert not os.path.exists(os.path.join(orphan, "part-x.parquet"))
    assert eng.read_final().count() == before


def test_audited_publish_conflict_refuses_stale_horizon_plan(spark, tmp_path):
    """Same staleness rule on the write-audit-publish path: STAGED
    commits never conflict (only the publish flip does), so a GC
    compaction advancing the horizon between stage and publish lands in
    the publish-retry loop — which must fail the epoch loudly instead of
    silently re-staging the merge plan whose admission filter baked the
    OLD horizon in as a literal (re-staging would apply events at/below
    the new horizon, resurrecting keys whose tombstones that GC just
    dropped)."""
    from data_migration_validation_spark.operators.audit import page_envelope_audit
    from data_migration_validation_spark.plans.lake import CommitConflictError

    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "wap-t"),
        checkpoint_path=str(tmp_path / "wap-c"),
        num_buckets=4,
        compact_every=None,
    )
    url = "https://a.example.com/x"
    eng.apply_epoch(
        _events(spark, [("I", url, "2024-01-01 00:00:00", 0)], 0),
        0,
        audit=page_envelope_audit(),
    )
    lake = eng.lake
    real_publish = lake.publish
    state = {"fired": False}

    def racing_publish(staged_v):
        if not state["fired"]:
            state["fired"] = True
            # a GC compaction lands between this epoch's stage and publish
            lake.compact(spark, gc_horizon_ts="2024-01-02 00:00:00")
            raise CommitConflictError("simulated publish flip race")
        return real_publish(staged_v)

    lake.publish = racing_publish
    try:
        with pytest.raises(RuntimeError, match="horizon advanced"):
            eng.apply_epoch(
                _events(spark, [("U", url, "2024-01-03 00:00:00", 1)], 1),
                1,
                audit=page_envelope_audit(),
            )
    finally:
        lake.publish = real_publish
    assert lake.epochs_applied() == {0}  # the stale plan never landed
    assert lake.staged_versions() == []  # the losing stage was rejected
    # a fresh apply re-plans against the new horizon and succeeds
    st = eng.apply_epoch(
        _events(spark, [("U", url, "2024-01-03 00:00:00", 1)], 1),
        1,
        audit=page_envelope_audit(),
    )
    assert not st.rejected
    assert lake.epochs_applied() == {0, 1}
