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
    orphan directory the reader never sees; retrying the epoch commits a
    fresh directory and the orphan stays unreferenced (vacuum's job)."""
    ev = _events(spark)
    path = str(tmp_path / "ru")
    r = ContinuousRollup(spark, path, SPEC)
    r.apply_epoch(ev.where(F.col("epoch") == 0), 0)

    # simulate the crash: partial written, manifest NOT updated
    r._partial(ev.where(F.col("epoch") == 1)).write.mode("overwrite").parquet(
        os.path.join(path, "partials/epoch=1-deadbeef")
    )
    assert r.epochs_applied() == {0}
    assert _merged(r) == _expected(ev.where(F.col("epoch") == 0))

    # retry commits it
    assert r.apply_epoch(ev.where(F.col("epoch") == 1), 1) is True
    assert _merged(r) == _expected(ev.where(F.col("epoch") < 2))

    # the crash orphan is invisible but on disk; vacuum reclaims it once
    # it is old enough — and never touches referenced directories
    assert r.vacuum(min_age_seconds=3600) == 0
    assert r.vacuum(min_age_seconds=0) == 1
    assert _merged(r) == _expected(ev.where(F.col("epoch") < 2))


def test_vacuum_reclaims_crash_orphan_base(spark, tmp_path):
    """A crash between compact()'s base write and its manifest CAS
    leaves an unreferenced ``base-*`` directory. Vacuum reclaims it
    (age-guarded), and never touches the LIVE base a later successful
    compact installed."""
    ev = _events(spark)
    path = str(tmp_path / "ru")
    r = ContinuousRollup(spark, path, SPEC)
    for e in range(3):
        r.apply_epoch(ev.where(F.col("epoch") == e), e)

    # simulate the crash: folded base written, manifest never swapped
    r.read().write.mode("overwrite").parquet(os.path.join(path, "base-v9-dead"))
    assert _merged(r) == _expected(ev)  # reader never sees it

    # a real compact then installs a live base
    assert r.compact() == 3
    live = {g["path"] for g in r._manifest()["groups"]}
    assert len(live) == 1 and next(iter(live)).startswith("base-")

    assert r.vacuum(min_age_seconds=3600) == 0  # too young to touch
    assert r.vacuum(min_age_seconds=0) == 1     # the crash orphan only
    assert not os.path.isdir(os.path.join(path, "base-v9-dead"))
    assert _merged(r) == _expected(ev)


def test_concurrent_apply_and_compact_lose_nothing(spark, tmp_path):
    """The lost-update race: writer A reads the manifest, writer B
    commits, then A swaps. With a plain read-modify-write A's swap would
    erase B's group; the CAS makes A lose, re-read, and retry — both
    groups survive. Deterministic interleaving via a store-CAS hook."""
    ev = _events(spark)
    r = ContinuousRollup(spark, str(tmp_path / "ru"), SPEC)
    r.apply_epoch(ev.where(F.col("epoch") == 0), 0)

    sibling = ContinuousRollup(spark, str(tmp_path / "ru"), SPEC)
    real_cas = r.store.cas
    fired = {"n": 0}

    def racing_cas(name, expected, new):
        if fired["n"] == 0:
            fired["n"] += 1
            # another writer lands epoch 2 AFTER our manifest read,
            # BEFORE our swap — the classic lost-update window
            assert sibling.apply_epoch(ev.where(F.col("epoch") == 2), 2)
        return real_cas(name, expected, new)

    r.store.cas = racing_cas
    try:
        assert r.apply_epoch(ev.where(F.col("epoch") == 1), 1) is True
    finally:
        r.store.cas = real_cas
    assert r.epochs_applied() == {0, 1, 2}
    assert _merged(r) == _expected(ev)

    # same window against compact(): an epoch landing mid-fold must not
    # be erased by the folded base; compact retries over the new head
    more = _events(spark).withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY"))
    fired["n"] = 0

    def racing_cas2(name, expected, new):
        if fired["n"] == 0:
            fired["n"] += 1
            assert sibling.apply_epoch(more.where(F.col("epoch") == 0), 3)
        return real_cas(name, expected, new)

    r.store.cas = racing_cas2
    try:
        assert r.compact() >= 3
    finally:
        r.store.cas = real_cas
    assert r.epochs_applied() == {0, 1, 2, 3}
    assert _merged(r) == {**_expected(ev), **_expected(more.where(F.col("epoch") == 0))}
    # CAS losers cleaned up after themselves: nothing for vacuum
    assert r.vacuum(min_age_seconds=0) == 0


def test_same_epoch_race_single_commit(spark, tmp_path):
    """Two repliers racing on the SAME epoch: exactly one wins, the loser
    reports the no-op and removes its own unreferenced directory — no
    double count, no orphan, and the winner's files are never touched."""
    ev = _events(spark)
    r = ContinuousRollup(spark, str(tmp_path / "ru"), SPEC)
    sibling = ContinuousRollup(spark, str(tmp_path / "ru"), SPEC)

    real_cas = r.store.cas
    fired = {"n": 0}

    def racing_cas(name, expected, new):
        if fired["n"] == 0:
            fired["n"] += 1
            assert sibling.apply_epoch(ev.where(F.col("epoch") == 0), 0)
        return real_cas(name, expected, new)

    r.store.cas = racing_cas
    try:
        assert r.apply_epoch(ev.where(F.col("epoch") == 0), 0) is False
    finally:
        r.store.cas = real_cas
    assert r.epochs_applied() == {0}
    assert r.n_groups() == 1
    assert _merged(r) == _expected(ev.where(F.col("epoch") == 0))
    assert r.vacuum(min_age_seconds=0) == 0


def test_legacy_manifest_adopted(spark, tmp_path):
    """A pre-CAS-era table (root manifest.json) reopens cleanly: its
    groups are visible, and the first commit migrates the manifest into
    the store without losing them."""
    import json

    ev = _events(spark)
    path = str(tmp_path / "ru")
    r = ContinuousRollup(spark, path, SPEC)
    r._partial(ev.where(F.col("epoch") == 0)).write.parquet(
        os.path.join(path, "partials/epoch=0")
    )
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(
            {"version": 1, "groups": [{"path": "partials/epoch=0", "epochs": [0]}]}, f
        )

    r2 = ContinuousRollup(spark, path, SPEC)
    assert r2.epochs_applied() == {0}
    assert r2.apply_epoch(ev.where(F.col("epoch") == 1), 1) is True
    assert r2.epochs_applied() == {0, 1}
    assert _merged(r2) == _expected(ev.where(F.col("epoch") < 2))
