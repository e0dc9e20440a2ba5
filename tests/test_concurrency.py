"""Optimistic concurrency for lake commits: on a real cluster,
maintenance (compaction) runs alongside the ingest job, and two replayers
of one log can race. The pointer flip is a compare-and-swap on the
recorded parent; manifest version numbers are claimed exclusively;
losers clean up their files and retry — no commit is ever silently lost
and replayers converge idempotently.

Every race test runs against BOTH commit stores: the POSIX one
(flock/rename/link) and the object-store conditional-PUT protocol
(LocalBlobApi emulates S3/GCS preconditioned writes — no rename, link,
or lock anywhere in that code path), proving the guarantees are
properties of the protocol, not of POSIX atomicity."""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import functions as F

from data_migration_validation_spark.plans.apply import CDCApplyEngine
from data_migration_validation_spark.plans.commit_store import (
    ConditionalPutCommitStore,
    LocalBlobApi,
)
from data_migration_validation_spark.plans.lake import CommitConflictError, LakeTable
from data_migration_validation_spark.sources.binlog import (
    BinlogConfig,
    epoch_slice,
    expected_final_state,
    synth_binlog,
)

CFG = BinlogConfig(n_keys=250, max_versions=3, events_per_epoch=200, seed=5)


def _store(kind: str, table_path: str):
    """None = PosixCommitStore default; 'condput' = the object-store
    protocol over the local conditional-write emulation. Handles on the
    same table path share the emulation's per-root mutex, so separate
    LakeTable instances race exactly as separate clients of one bucket
    would."""
    if kind == "posix":
        return None
    return ConditionalPutCommitStore(LocalBlobApi(table_path + "/_meta_blob"))


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


@pytest.mark.parametrize("store_kind", ["posix", "condput"])
def test_compaction_races_ingest_without_losing_commits(spark, tmp_path, store_kind):
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
        store=_store(store_kind, table),
    )
    eng.apply_epoch(epoch_slice(log, CFG, 0), 0)  # table exists before racing

    done = threading.Event()
    errors: list[BaseException] = []
    compactions = {"n": 0}

    def compact_loop():
        lake = LakeTable(table, store=_store(store_kind, table))  # separate writer handle
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
    assert not t.is_alive(), "compaction thread still running after join timeout"
    assert not errors, f"compaction thread failed: {errors[:1]}"

    assert eng.lake.epochs_applied() == set(range(CFG.n_epochs))
    assert _chain_is_consistent(eng.lake)
    assert eng.lake.staged_versions() == []  # losers cleaned up after themselves

    final = eng.read_final().select("url", "warc_ts", "seq")
    expected = expected_final_state(spark, CFG, log=log).select("url", "warc_ts", "seq")
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0


@pytest.mark.parametrize("store_kind", ["posix", "condput"])
def test_two_replayers_of_one_log_converge(spark, tmp_path, store_kind):
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
                store=_store(store_kind, table),
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
    assert not any(t.is_alive() for t in threads), "replayer still running after join timeout"
    assert not errs, f"replayer failed: {errs[:1]}"

    lake = LakeTable(table, store=_store(store_kind, table))
    snap = lake.current_snapshot()
    assert sorted(snap.epochs) == list(range(CFG.n_epochs))
    assert _chain_is_consistent(lake)

    eng = CDCApplyEngine(
        spark,
        table_path=table,
        checkpoint_path=str(tmp_path / "ck-check"),
        store=_store(store_kind, table),
    )
    final = eng.read_final().select("url", "warc_ts", "seq")
    expected = expected_final_state(spark, CFG, log=log).select("url", "warc_ts", "seq")
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0


@pytest.mark.parametrize("store_kind", ["posix", "condput"])
def test_redrive_races_ingest_without_losing_events(spark, tmp_path, store_kind):
    """A redrive loop races the ingest replay of an op-mangled log (the
    operational shape: an operator drains the DLQ while the backfill is
    still running). Safety relied on: quarantine partitions appear only
    via atomic rename (never partial), redrive intents name exactly the
    partitions read, and redrive commits go through the same CAS gate as
    ingest. After a final drain, the table must equal the never-corrupted
    oracle and nothing may stay pending."""
    table = str(tmp_path / "rdrace-t")
    log_path = str(tmp_path / "rdrace-log")
    synth_binlog(spark, CFG).write.partitionBy("batch_epoch").parquet(log_path)
    log = spark.read.parquet(log_path)
    corrupted = log.withColumn(
        "op",
        F.when(F.col("seq") % 13 == 4, F.concat(F.col("op"), F.lit("X"))).otherwise(
            F.col("op")
        ),
    )
    from tests.test_redrive import _fix as demangle  # the shared de-mangler

    done = threading.Event()

    def ingest(errs: list):
        try:
            eng = CDCApplyEngine(
                spark,
                table_path=table,
                checkpoint_path=str(tmp_path / "ck-ingest"),
                num_buckets=4,
                store=_store(store_kind, table),
            )
            for epoch in range(CFG.n_epochs):
                eng.apply_epoch(epoch_slice(corrupted, CFG, epoch), epoch)
        except BaseException as e:  # noqa: BLE001
            errs.append(e)
        finally:
            done.set()

    def redrive_loop(errs: list):
        try:
            eng = CDCApplyEngine(
                spark,
                table_path=table,
                checkpoint_path=str(tmp_path / "ck-redrive"),
                num_buckets=4,
                store=_store(store_kind, table),
            )
            i = 0
            while not done.is_set():
                eng.redrive_quarantine(1000 + i, fix=demangle)
                i += 1
                time.sleep(0.05)
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    errs: list[BaseException] = []
    ta = threading.Thread(target=ingest, args=(errs,))
    tb = threading.Thread(target=redrive_loop, args=(errs,))
    ta.start(), tb.start()
    ta.join(timeout=240), tb.join(timeout=240)
    assert not ta.is_alive() and not tb.is_alive(), "racer still running after join timeout"
    assert not errs, f"racer failed: {errs[:1]}"

    # final drain: anything quarantined after the loop's last intent
    checker = CDCApplyEngine(
        spark,
        table_path=table,
        checkpoint_path=str(tmp_path / "ck-drain"),
        num_buckets=4,
        store=_store(store_kind, table),
    )
    st = checker.redrive_quarantine(2000, fix=demangle)
    assert st.quarantined == 0  # the fix cures every mangle
    assert checker.read_quarantine(pending_only=True) is None

    lake = LakeTable(table, store=_store(store_kind, table))
    assert _chain_is_consistent(lake)

    final = checker.read_final().select("url", "warc_ts", "seq")
    expected = expected_final_state(spark, CFG, log=log).select("url", "warc_ts", "seq")
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0
