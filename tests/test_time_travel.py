"""Snapshot time travel: reads served from the retained manifest history
must reproduce the state as of any past epoch — byte-identical to a fresh
replay of that prefix — and must survive later compaction, tombstone
writes, and a rebucket (whose new bucket function must NOT be applied to
the old snapshot's files)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_migration_validation_spark.operators.reconcile import cogroup_reconcile
from data_migration_validation_spark.plans.apply import CDCApplyEngine

EV_SCHEMA = (
    "op string, url string, warc_ts timestamp, seq long, "
    "payload struct<html:binary,lang:string>, batch_epoch long"
)


def _events(spark, rows, epoch):
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


_EPOCHS = {
    0: [
        ("I", "https://a/1", "2024-01-01 00:00:00", 0),
        ("I", "https://a/2", "2024-01-01 00:00:01", 1),
        ("I", "https://b/3", "2024-01-01 00:00:02", 2),
    ],
    1: [
        ("U", "https://a/1", "2024-01-01 01:00:00", 3),
        ("D", "https://a/2", "2024-01-01 01:00:01", 4),
        ("I", "https://b/4", "2024-01-01 01:00:02", 5),
    ],
    2: [
        ("U", "https://b/3", "2024-01-01 02:00:00", 6),
        ("I", "https://a/2", "2024-01-01 02:00:01", 7),  # re-insert deleted key
        ("D", "https://b/4", "2024-01-01 02:00:02", 8),
    ],
    3: [
        ("U", "https://a/1", "2024-01-01 03:00:00", 9),
        ("I", "https://c/5", "2024-01-01 03:00:01", 10),
    ],
}


def _replay(spark, tmp_path, name, epochs, compact_every=2, num_buckets=8):
    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / f"{name}-t"),
        checkpoint_path=str(tmp_path / f"{name}-c"),
        num_buckets=num_buckets,
        compact_every=compact_every,
    )
    for e in sorted(epochs):
        eng.apply_epoch(_events(spark, _EPOCHS[e], e), e)
    return eng


def _rows(df):
    return sorted(
        (r["url"], str(r["warc_ts"]), r["seq"], r["text"]) for r in df.collect()
    )


def test_read_asof_matches_prefix_replay(spark, tmp_path):
    full = _replay(spark, tmp_path, "full", [0, 1, 2, 3])
    for e in range(4):
        prefix = _replay(spark, tmp_path, f"p{e}", list(range(e + 1)))
        got = _rows(full.read_asof(e))
        want = _rows(prefix.read_final())
        assert got == want, f"as-of epoch {e} diverges from prefix replay"
    # HEAD as-of == read_final
    assert _rows(full.read_asof(3)) == _rows(full.read_final())


def test_read_asof_sees_tombstone_state(spark, tmp_path):
    full = _replay(spark, tmp_path, "tomb", [0, 1, 2, 3])
    urls_at = lambda e: {u for (u, *_rest) in _rows(full.read_asof(e))}  # noqa: E731
    assert "https://a/2" in urls_at(0)
    assert "https://a/2" not in urls_at(1)  # deleted in epoch 1
    assert "https://a/2" in urls_at(2)  # re-inserted in epoch 2


def test_read_asof_survives_rebucket(spark, tmp_path):
    full = _replay(spark, tmp_path, "rb", [0, 1, 2])
    before = _rows(full.read_asof(1))
    full.lake.rebucket(spark, 32)
    full.apply_epoch(_events(spark, _EPOCHS[3], 3), 3)
    # the historical snapshot predates the rebucket: its merge must use the
    # OLD bucket function recorded in its manifest, not the live table's
    after = _rows(full.read_asof(1))
    assert after == before
    # and HEAD reflects everything, byte-identical to a straight-line replay
    straight = _replay(spark, tmp_path, "straight", [0, 1, 2, 3])
    diff = cogroup_reconcile(
        full.read_final().select("url", "warc_ts", "seq", "lang", "text"),
        straight.read_final().select("url", "warc_ts", "seq", "lang", "text"),
        key="url",
    )
    assert diff.count() == 0


def test_version_asof_epoch_picks_post_maintenance_snapshot(spark, tmp_path):
    eng = _replay(spark, tmp_path, "vm", [0, 1], compact_every=None)
    lake = eng.lake
    v_before = lake.version_asof_epoch(1)
    # maintenance commit after epoch 1, before epoch 2: carries epochs
    # forward unchanged, so it IS the state as of epoch 1 (post-fold)
    lake.compact(spark)
    v_after = lake.version_asof_epoch(1)
    assert v_after is not None and v_before is not None and v_after > v_before
    eng.apply_epoch(_events(spark, _EPOCHS[2], 2), 2)
    assert lake.version_asof_epoch(1) == v_after  # epoch 2 doesn't qualify
    assert lake.version_asof_epoch(0) < v_after
    # an epoch no snapshot is bounded by → None (epoch -1: nothing applied)
    assert lake.version_asof_epoch(-1) is None


# -- snapshot expiration -----------------------------------------------------


def test_expire_snapshots_bounds_history(spark, tmp_path):
    import glob
    import os

    eng = _replay(spark, tmp_path, "exp", [0, 1, 2, 3], compact_every=2)
    lake = eng.lake
    all_versions = lake.versions()
    assert len(all_versions) >= 4
    head_before = _rows(eng.read_final())
    n_files_before = len(
        glob.glob(str(tmp_path / "exp-t" / "data" / "**" / "*.parquet"), recursive=True)
    )

    out = lake.expire_snapshots(keep_last=1)
    assert out["expired_versions"] == len(all_versions) - 1
    assert out["removed_files"] > 0
    # current state untouched
    assert _rows(eng.read_final()) == head_before
    # expired manifests physically gone; only the head remains
    assert lake.versions() == [lake.current_version()]
    # orphaned data files physically gone
    n_files_after = len(
        glob.glob(str(tmp_path / "exp-t" / "data" / "**" / "*.parquet"), recursive=True)
    )
    assert n_files_after < n_files_before
    # the time-travel horizon shrank: epoch-1 state is no longer addressable
    assert lake.version_asof_epoch(1) is None
    assert eng.read_asof(1) is None
    # idempotent: a second expire is a no-op
    assert lake.expire_snapshots(keep_last=1) == {
        "expired_versions": 0,
        "removed_files": 0,
        "removed_shards": 0,
    }
    # the engine keeps committing normally against the trimmed history
    eng2 = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "exp-t"),
        checkpoint_path=str(tmp_path / "exp-c2"),
    )
    extra = _events(
        spark, [("U", "https://c/5", "2024-01-01 04:00:00", 11)], 4
    )
    eng2.apply_epoch(extra, 4)
    assert any(u == "https://c/5" for (u, *_r) in _rows(eng2.read_final()))
    assert os.path.exists(str(tmp_path / "exp-t" / "_meta" / "CURRENT"))


def test_expire_keeps_files_shared_with_retained_snapshots(spark, tmp_path):
    # keep_last=2: the previous snapshot shares carried-forward base files
    # with HEAD; expiration must not delete files a retained snapshot needs
    eng = _replay(spark, tmp_path, "share", [0, 1, 2, 3], compact_every=None)
    lake = eng.lake
    vs = lake.versions()
    prev = vs[-2]
    prev_rows_before = _rows(
        lake.read(spark, version=prev).where(~F.col("deleted")).drop("deleted")
    )
    lake.expire_snapshots(keep_last=2)
    # the retained historical snapshot is still fully readable
    prev_rows_after = _rows(
        lake.read(spark, version=prev).where(~F.col("deleted")).drop("deleted")
    )
    assert prev_rows_after == prev_rows_before
