"""Dead-letter quarantine: malformed events (null key / null warc_ts /
null seq / unknown op) must not crash the epoch or corrupt bucket
assignment — they are routed to an epoch-keyed quarantine table with a
reason, counted in metrics, and the applied state matches a clean-input
replay exactly. Detection rides the lineage pre-scan (sentinel bucket
groups in the same aggregation); the quarantine write only happens for
epochs with violations, and crash-replay of such an epoch is idempotent."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_migration_validation_spark.plans.apply import CDCApplyEngine
from tests.test_time_travel import _EPOCHS, _events, _replay

EV_SCHEMA = (
    "op string, url string, warc_ts timestamp, seq long, "
    "payload struct<html:binary,lang:string>, batch_epoch long"
)


def _bad_rows(spark, epoch):
    ts = datetime.fromisoformat("2024-01-01 00:30:00")
    pay = (b"<html><body><p>junk</p></body></html>", "en")
    rows = [
        ("I", None, ts, 100, pay, epoch),          # null key
        ("U", "https://q/1", None, 101, pay, epoch),  # null warc_ts
        ("U", "https://q/2", ts, None, pay, epoch),   # null seq
        ("X", "https://q/3", ts, 102, pay, epoch),    # unknown op
        # NULL op: isin() alone yields NULL (not False) under three-valued
        # logic — regression for the row that once vanished from BOTH the
        # quarantine and the apply path while still counted as seen
        # (reachable via the Debezium parser's unmapped-op → NULL)
        (None, "https://q/4", ts, 103, pay, epoch),
    ]
    return spark.createDataFrame(rows, EV_SCHEMA)


def _final_rows(eng):
    return sorted((r["url"], r["seq"]) for r in eng.read_final().collect())


def test_malformed_events_are_quarantined_not_applied(spark, tmp_path):
    clean = _replay(spark, tmp_path, "qclean", [0, 1])

    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "q-t"),
        checkpoint_path=str(tmp_path / "q-c"),
        num_buckets=8,
    )
    st0 = eng.apply_epoch(_events(spark, _EPOCHS[0], 0).unionByName(_bad_rows(spark, 0)), 0)
    st1 = eng.apply_epoch(_events(spark, _EPOCHS[1], 1), 1)
    assert st0.quarantined == 5 and st1.quarantined == 0
    assert st0.events_seen == len(_EPOCHS[0])  # bad rows not counted applied
    assert _final_rows(eng) == _final_rows(clean)

    dlq = eng.read_quarantine()
    got = {(r["_reason"], r["op"]) for r in dlq.collect()}
    assert got == {
        ("null_key", "I"),
        ("null_warc_ts", "U"),
        ("null_seq", "U"),
        ("bad_op", "X"),
        ("bad_op", None),
    }
    assert set(r["epoch"] for r in dlq.collect()) == {0}
    # metric recorded once, on the violating epoch only
    m = eng.ckpt.metrics()
    m = m[m.metric == "quarantined_events"]
    assert list(zip(m.epoch, m.value)) == [(0, 5.0)]


def test_quarantine_replay_is_idempotent(spark, tmp_path):
    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "qi-t"),
        checkpoint_path=str(tmp_path / "qi-c"),
        num_buckets=8,
    )
    ev = _events(spark, _EPOCHS[0], 0).unionByName(_bad_rows(spark, 0))
    with pytest.raises(RuntimeError):
        eng.apply_epoch(ev, 0, crash_after_commit=True)
    st = eng.apply_epoch(ev, 0)  # replay after crash: lake guard skips
    assert st.skipped
    assert eng.read_quarantine().count() == 5  # not doubled


def test_clean_epoch_writes_no_quarantine_dir(spark, tmp_path):
    eng = _replay(spark, tmp_path, "qn", [0, 1, 2, 3])
    assert eng.read_quarantine() is None


def test_quarantine_off_fails_loudly(spark, tmp_path):
    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "qo-t"),
        checkpoint_path=str(tmp_path / "qo-c"),
        num_buckets=8,
        quarantine=False,
    )
    ev = _events(spark, _EPOCHS[0], 0).unionByName(_bad_rows(spark, 0))
    with pytest.raises(Exception):
        eng.apply_epoch(ev, 0)


def test_quarantine_off_null_key_fails_before_write(spark, tmp_path):
    """A PURE null-key row (every other envelope field valid) must fail a
    quarantine=False epoch up front: Spark's xxhash64 returns its seed
    for NULL input, so without the explicit pre-scan check the row would
    bucket normally and be applied silently — the stray-bucket invariant
    never fires."""
    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "nk-t"),
        checkpoint_path=str(tmp_path / "nk-c"),
        num_buckets=8,
        quarantine=False,
    )
    ts = datetime.fromisoformat("2024-01-01 00:30:00")
    pay = (b"<html><body><p>ok</p></body></html>", "en")
    ev = spark.createDataFrame(
        [
            ("I", "https://q/good", ts, 1, pay, 0),
            ("I", None, ts, 2, pay, 0),  # null key, everything else valid
        ],
        EV_SCHEMA,
    )
    with pytest.raises(ValueError, match="malformed"):
        eng.apply_epoch(ev, 0)
    assert eng.lake.epochs_applied() == set()  # nothing was written


def test_externally_emptied_partition_fails_loud(spark, tmp_path):
    """Quarantine partitions are only ever created WITH rows, so an epoch
    dir holding no parquet means external deletion — reading it must
    fail with the actual story, not Spark's opaque 'unable to infer
    schema' AnalysisException."""
    import glob
    import os

    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "ext-t"),
        checkpoint_path=str(tmp_path / "ext-c"),
        num_buckets=8,
    )
    eng.apply_epoch(_bad_rows(spark, 0), 0)
    part = os.path.join(eng.quarantine_dir, "epoch=0")
    for f in glob.glob(os.path.join(part, "*.parquet")):
        os.unlink(f)
    with pytest.raises(FileNotFoundError, match="deleted externally"):
        eng.read_quarantine()
