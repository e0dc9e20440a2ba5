"""Optimistic concurrency for lake commits: on a real cluster,
maintenance (compaction) runs alongside the ingest job, and two replayers
of one log can race. The pointer flip is a lockfile-guarded
compare-and-swap on the recorded parent; manifest version numbers are
claimed exclusively (os.link); losers clean up their files and retry —
no commit is ever silently lost and replayers converge idempotently."""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import functions as F

from data_migration_validation_spark.plans.apply import CDCApplyEngine
from data_migration_validation_spark.plans.lake import CommitConflictError, LakeTable
from data_migration_validation_spark.sources.binlog import (
    BinlogConfig,
    epoch_slice,
    expected_final_state,
    synth_binlog,
)

CFG = BinlogConfig(n_keys=250, max_versions=3, events_per_epoch=200, seed=5)


def _chain_is_consistent(lake: LakeTable) -> bool:
    """Every published version's parent is the previous published
    version — no commit was dropped from the history."""
    vs = lake.versions()
    for prev, cur in zip(vs, vs[1:]):
        if lake._manifest_raw(cur).get("parent") != prev:
            return False
    return True


def test_flip_cas_rejects_moved_head(spark, tmp_path):
    table = str(tmp_path / "cas")
    eng = CDCApplyEngine(spark, table_path=table, checkpoint_path=str(tmp_path / "c"), num_buckets=4)
    log = synth_binlog(spark, CFG)
    eng.apply_epoch(epoch_slice(log, CFG, 0), 0)
    lake = eng.lake
    head = lake.current_version()
    with pytest.raises(CommitConflictError, match="head"):
        lake._flip(head + 99, expected_parent=head - 1 if head else None)
    assert lake.current_version() == head  # CAS refused, pointer untouched


def test_compaction_races_ingest_without_losing_commits(spark, tmp_path):
    """Thread A replays all epochs; thread B compacts in a tight loop on
    a SEPARATE LakeTable handle. Every epoch must survive, the final
    state must equal the closed-form oracle, and the manifest parent
    chain must be gapless."""
    table = str(tmp_path / "race-t")
    log_path = str(tmp_path / "race-log")
    synth_binlog(spark, CFG).write.partitionBy("batch_epoch").parquet(log_path)
    log = spark.read.parquet(log_path)

    eng = CDCApplyEngine(
        spark,
        table_path=table,
        checkpoint_path=str(tmp_path / "race-c"),
        num_buckets=4,
        compact_every=None,  # compaction happens ONLY in the racing thread
    )
    eng.apply_epoch(epoch_slice(log, CFG, 0), 0)  # table exists before racing

    done = threading.Event()
    errors: list[BaseException] = []
    compactions = {"n": 0}

    def compact_loop():
        lake = LakeTable(table)  # separate writer handle
        while not done.is_set():
            try:
                if lake.compact(spark):
                    compactions["n"] += 1
            except BaseException as e:  # noqa: BLE001 — surfaced to the test
                errors.append(e)
                return
            time.sleep(0.01)

    t = threading.Thread(target=compact_loop, daemon=True)
    t.start()
    try:
        for epoch in range(1, CFG.n_epochs):
            eng.apply_epoch(epoch_slice(log, CFG, epoch), epoch)
    finally:
        done.set()
        t.join(timeout=120)
    assert not errors, f"compaction thread failed: {errors[:1]}"

    assert eng.lake.epochs_applied() == set(range(CFG.n_epochs))
    assert _chain_is_consistent(eng.lake)
    assert eng.lake.staged_versions() == []  # losers cleaned up after themselves

    final = eng.read_final().select("url", "warc_ts", "seq")
    expected = expected_final_state(spark, CFG, log=log).select("url", "warc_ts", "seq")
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0


def test_two_replayers_of_one_log_converge(spark, tmp_path):
    """Two engines replaying the SAME binlog into the SAME table (the
    accidental-double-deployment scenario): every epoch is applied
    exactly once — whoever loses a race treats the epoch as skipped."""
    table = str(tmp_path / "dup-t")
    log_path = str(tmp_path / "dup-log")
    synth_binlog(spark, CFG).write.partitionBy("batch_epoch").parquet(log_path)
    log = spark.read.parquet(log_path)

    def replay(tag: str, errs: list):
        try:
            eng = CDCApplyEngine(
                spark,
                table_path=table,
                checkpoint_path=str(tmp_path / f"ck-{tag}"),
                num_buckets=4,
            )
            for epoch in range(CFG.n_epochs):
                eng.apply_epoch(epoch_slice(log, CFG, epoch), epoch)
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    errs: list[BaseException] = []
    threads = [threading.Thread(target=replay, args=(t, errs)) for t in ("a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=240)
    assert not errs, f"replayer failed: {errs[:1]}"

    lake = LakeTable(table)
    snap = lake.current_snapshot()
    assert sorted(snap.epochs) == list(range(CFG.n_epochs))
    assert _chain_is_consistent(lake)

    eng = CDCApplyEngine(spark, table_path=table, checkpoint_path=str(tmp_path / "ck-check"))
    final = eng.read_final().select("url", "warc_ts", "seq")
    expected = expected_final_state(spark, CFG, log=log).select("url", "warc_ts", "seq")
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0
