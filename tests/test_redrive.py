"""Quarantine redrive (DLQ reprocess): dead-lettered events are fixed and
re-admitted through the normal exactly-once epoch gate as a NEW epoch.
The protocol (intent file → apply_epoch → _REDRIVEN markers) must be
crash-resumable, must never mark a source partition whose rows were not
part of the committed redrive epoch, must requeue rows the fix did not
cure, and — because everything funnels through the ordinary LWW merge —
a redriven event older than the key's current state must not win."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_migration_validation_spark.plans.apply import CDCApplyEngine
from tests.test_quarantine import _bad_rows
from tests.test_time_travel import _EPOCHS, _events, _replay

# events whose op gets mangled by the "bad producer" (op -> op||'X'):
# seq 0 = I a/1 in epoch 0 (key later updated twice — redriving the stale
# insert must not beat seq 9), seq 4 = D a/2 in epoch 1 (redriving an old
# delete after the key's newer re-insert must not delete it), seq 7 =
# I a/2 re-insert in epoch 2.
_MANGLED = (0, 4, 7)


def _corrupt(ev):
    return ev.withColumn(
        "op",
        F.when(
            F.col("seq").isin(*_MANGLED), F.concat(F.col("op"), F.lit("X"))
        ).otherwise(F.col("op")),
    )


def _fix(df):
    # pure column-level repair (determinism contract): strip the mangle
    return df.withColumn("op", F.regexp_replace("op", "X$", ""))


def _engine(spark, tmp_path, name):
    return CDCApplyEngine(
        spark,
        table_path=str(tmp_path / f"{name}-t"),
        checkpoint_path=str(tmp_path / f"{name}-c"),
        num_buckets=8,
    )


def _replay_corrupted(spark, tmp_path, name):
    eng = _engine(spark, tmp_path, name)
    for e in range(4):
        st = eng.apply_epoch(_corrupt(_events(spark, _EPOCHS[e], e)), e)
        assert not st.rejected
    return eng


def _final_rows(eng):
    return sorted(
        (r["url"], str(r["warc_ts"]), r["seq"], r["text"])
        for r in eng.read_final().collect()
    )


def test_redrive_restores_clean_state(spark, tmp_path):
    clean = _replay(spark, tmp_path, "rdclean", [0, 1, 2, 3])
    eng = _replay_corrupted(spark, tmp_path, "rd")

    pend = eng.read_quarantine(pending_only=True)
    assert pend.count() == 3
    assert set(r["epoch"] for r in pend.collect()) == {0, 1, 2}

    st = eng.redrive_quarantine(4, fix=_fix)
    assert not st.skipped and not st.rejected
    assert st.events_seen == 3 and st.quarantined == 0

    # the fixed events merged under normal LWW: state == never-corrupted
    # replay, including the two out-of-order redrives (stale I on a/1,
    # stale D on a/2 — neither may beat the key's newer state)
    assert _final_rows(eng) == _final_rows(clean)
    a1 = [r for r in eng.read_final().collect() if r["url"] == "https://a/1"]
    assert a1[0]["seq"] == 9

    # dead-letter lineage: partitions marked, never deleted
    assert eng.read_quarantine(pending_only=True) is None
    assert eng.read_quarantine().count() == 3
    for e in (0, 1, 2):
        marker = os.path.join(eng.quarantine_dir, f"epoch={e}", "_REDRIVEN")
        assert os.path.exists(marker)
        assert open(marker).read() == "4"

    m = eng.ckpt.metrics()
    m = m[m.stage == "redrive"].sort_values("metric")
    assert list(zip(m.metric, m.value)) == [
        ("redrive_source_epochs", 3.0),
        ("redriven_events", 3.0),
    ]


def test_redrive_with_nothing_pending_is_a_noop(spark, tmp_path):
    eng = _replay(spark, tmp_path, "rdnp", [0, 1])
    st = eng.redrive_quarantine(9)
    assert st.skipped
    assert not os.path.exists(eng._redrive_intent_path(9))


def test_redrive_epoch_collision_raises(spark, tmp_path):
    eng = _replay_corrupted(spark, tmp_path, "rdcol")
    with pytest.raises(ValueError, match="already committed"):
        eng.redrive_quarantine(2, fix=_fix)  # epoch 2 was a normal ingest
    # nothing was marked by the refused call
    assert eng.read_quarantine(pending_only=True).count() == 3


def test_redrive_rerun_is_idempotent(spark, tmp_path):
    eng = _replay_corrupted(spark, tmp_path, "rdi")
    st1 = eng.redrive_quarantine(4, fix=_fix)
    assert not st1.skipped
    before = _final_rows(eng)
    st2 = eng.redrive_quarantine(4, fix=_fix)
    assert st2.skipped  # intent adopted, epoch already committed
    assert _final_rows(eng) == before
    # redrive metrics recorded exactly once
    m = eng.ckpt.metrics()
    assert len(m[m.metric == "redriven_events"]) == 1


def test_redrive_crash_before_markers_resumes_from_intent(spark, tmp_path):
    """Crash window: intent published, epoch committed, markers not yet
    written. The resume must adopt the INTENT's source list — including
    ignoring a quarantine partition that appeared after the intent — and
    must not re-apply the committed epoch."""
    eng = _replay_corrupted(spark, tmp_path, "rdcr")

    # step 1: intent (as redrive_quarantine would write it)
    with open(eng._redrive_intent_path(4), "w") as f:
        json.dump({"redrive_epoch": 4, "source_epochs": [0, 1, 2]}, f)
    # step 2: the committed apply (origin-tagged, as redrive_quarantine
    # commits it — the resume distinguishes OUR commit from a normal
    # ingest that raced onto the epoch number by this tag)
    dirs = [os.path.join(eng.quarantine_dir, f"epoch={e}") for e in (0, 1, 2)]
    fixed = _fix(
        spark.read.option("mergeSchema", "true").parquet(*dirs).drop("_reason")
    )
    assert not eng.apply_epoch(
        fixed, 4, commit_summary={"origin": "redrive"}
    ).skipped
    # crash here: no markers. A NEW bad epoch arrives before the resume.
    st5 = eng.apply_epoch(_bad_rows(spark, 5), 5)
    assert st5.quarantined == 5

    epochs_before = set(eng.lake.epochs_applied())
    st = eng.redrive_quarantine(4, fix=_fix)
    assert st.skipped  # commit already landed; resume only finishes markers
    assert set(eng.lake.epochs_applied()) == epochs_before
    # the resume's stats report what the committed epoch APPLIED (from
    # its summary), not the resume run's own zero — a CLI/API consumer
    # auditing the resume must not read "0 events redriven"
    assert st.events_seen == 3

    # intent's sources marked; the post-intent arrival stays pending
    for e in (0, 1, 2):
        assert os.path.exists(
            os.path.join(eng.quarantine_dir, f"epoch={e}", "_REDRIVEN")
        )
    pend = eng.read_quarantine(pending_only=True)
    assert set(r["epoch"] for r in pend.collect()) == {5}

    # lineage metrics survive the commit→marker crash: the resume reads
    # the applied-event count back from the commit summary (its own run
    # saw zero events) and records the redrive exactly once
    m = eng.ckpt.metrics()
    m = m[m.stage == "redrive"].sort_values("metric")
    assert list(zip(m.metric, m.value)) == [
        ("redrive_source_epochs", 3.0),
        ("redriven_events", 3.0),
    ]


def test_partial_fix_requeues_uncured_rows(spark, tmp_path):
    """A fix that cures only some rows: cured ones apply, the rest
    re-quarantine under the redrive epoch — never silently dropped."""
    eng = _engine(spark, tmp_path, "rdpf")
    ev = _events(spark, _EPOCHS[0], 0).unionByName(_bad_rows(spark, 0))
    ev = _corrupt(ev)
    st0 = eng.apply_epoch(ev, 0)
    assert st0.quarantined == 6  # 5 incurable + 1 mangled op (seq 0)

    st = eng.redrive_quarantine(1, fix=_fix)
    assert st.events_seen == 1  # the cured mangled-op row
    assert st.quarantined == 5  # the incurable ones requeued
    pend = eng.read_quarantine(pending_only=True)
    assert pend.count() == 5
    assert set(r["epoch"] for r in pend.collect()) == {1}
    # and the full dead-letter lineage keeps both generations
    assert eng.read_quarantine().count() == 11


def test_racing_redrivers_with_different_epochs_converge(spark, tmp_path):
    """Two operators racing to redrive the SAME pending sources under
    DIFFERENT redrive epochs (neither sees the other's intent yet): both
    intents name the same sources and both epochs admit the same fixed
    events. This must converge — the double admission is idempotent
    under LWW (identical (warc_ts, seq) per key), the final state equals
    the never-corrupted replay, and no quarantine partition stays
    pending."""
    clean = _replay(spark, tmp_path, "rrclean", [0, 1, 2, 3])
    eng = _replay_corrupted(spark, tmp_path, "rr")

    # interleave: both publish intents over the same pending set before
    # either applies (the realistic race — intent write is the first step)
    dirs = eng._quarantine_epoch_dirs()
    epochs = [int(p.rsplit("=", 1)[1]) for p in dirs]
    for redrive_epoch in (4, 5):
        with open(eng._redrive_intent_path(redrive_epoch), "w") as f:
            json.dump(
                {"redrive_epoch": redrive_epoch, "source_epochs": epochs}, f
            )

    st_a = eng.redrive_quarantine(4, fix=_fix)  # adopts intent 4
    st_b = eng.redrive_quarantine(5, fix=_fix)  # adopts intent 5
    assert not st_a.skipped and not st_b.skipped
    assert st_a.events_seen == st_b.events_seen == 3
    assert st_a.quarantined == st_b.quarantined == 0

    assert _final_rows(eng) == _final_rows(clean)
    assert eng.read_quarantine(pending_only=True) is None


def test_redrive_across_schema_evolution(spark, tmp_path):
    """Dead-lettered events from BOTH sides of a mid-stream envelope
    evolution (payload gains fetch_status at evo2, widens at evo3) are
    redriven as ONE epoch: the quarantine read merges the per-epoch
    payload schemas (pre-evolution rows surface a null fetch_status),
    the registry's additive merge admits the superset, and the final
    table equals the never-corrupted oracle — with fetch_status null
    exactly for winners delivered before the column existed."""
    from pyspark.sql.window import Window

    from data_migration_validation_spark.operators.reconcile import (
        cogroup_reconcile,
        reconciliation_report,
    )
    from data_migration_validation_spark.sources.binlog import (
        BinlogConfig,
        epoch_slice,
        synth_binlog,
    )

    cfg = BinlogConfig(
        n_keys=120, max_versions=3, events_per_epoch=90, seed=11,
        evo2_epoch=2, evo3_epoch=3, dup_pct=0,
    )
    log_path = str(tmp_path / "evolog")
    synth_binlog(spark, cfg).write.parquet(log_path)
    log = spark.read.parquet(log_path)

    def mangle(df):
        return df.withColumn(
            "op",
            F.when(F.col("seq") % 7 == 3, F.concat(F.col("op"), F.lit("X"))).otherwise(
                F.col("op")
            ),
        )

    engine = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "evot"),
        checkpoint_path=str(tmp_path / "evoc"),
        num_buckets=8,
    )
    for epoch in range(cfg.n_epochs):
        engine.apply_epoch(mangle(epoch_slice(log, cfg, epoch)), epoch)

    # corruption landed on both sides of the evolution boundary
    pend = engine.read_quarantine(pending_only=True)
    qepochs = {r["epoch"] for r in pend.select("epoch").distinct().collect()}
    assert any(e < cfg.evo2_epoch for e in qepochs)
    assert any(e >= cfg.evo2_epoch for e in qepochs)

    st = engine.redrive_quarantine(cfg.n_epochs, fix=_fix)
    assert not st.skipped and not st.rejected and st.quarantined == 0
    assert engine.read_quarantine(pending_only=True) is None

    final = engine.read_final()
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc(), F.col("seq").desc())
    expected = (
        log.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "url",
            "warc_ts",
            "seq",
            F.col("payload.html").alias("html"),
            F.col("payload.lang").alias("lang"),
            F.when(
                F.col("batch_epoch") >= cfg.evo2_epoch, F.col("payload.fetch_status")
            ).alias("fetch_status"),
        )
    )
    diff = cogroup_reconcile(
        expected, final, key="url",
        columns=["warc_ts", "seq", "html", "lang", "fetch_status"],
    )
    report = reconciliation_report(diff)
    assert report == {}, f"redrive-across-evolution mismatch: {report}"


def test_redrive_losing_epoch_race_to_normal_ingest_raises(spark, tmp_path):
    """A NORMAL ingest commits the redrive's epoch number while the
    redrive is in flight (intent published, apply not yet committed).
    The idempotent skip must NOT be mistaken for success: no _REDRIVEN
    marker is written (the redriven rows were never applied — marking
    would lose them permanently), the burned intent is retired, and a
    retry with a fresh epoch completes the redrive."""
    clean = _replay(spark, tmp_path, "rfclean", [0, 1, 2, 3])
    eng = _replay_corrupted(spark, tmp_path, "rf")

    # in-flight redrive: intent for epoch 4 published...
    with open(eng._redrive_intent_path(4), "w") as f:
        json.dump({"redrive_epoch": 4, "source_epochs": [0, 1, 2]}, f)
    # ...and a concurrent normal ingest wins epoch 4 first (re-delivered
    # epoch-3 events: content is irrelevant, the epoch NUMBER is burned)
    assert not eng.apply_epoch(_events(spark, _EPOCHS[3], 3), 4).skipped

    with pytest.raises(RuntimeError, match="normal ingest"):
        eng.redrive_quarantine(4, fix=_fix)

    # nothing marked, nothing lost, intent retired
    pend = eng.read_quarantine(pending_only=True)
    assert pend.count() == 3
    assert not os.path.exists(eng._redrive_intent_path(4))
    assert eng.ckpt.metrics().query("stage == 'redrive'").empty

    # the retry with an unused epoch completes and restores clean state
    st = eng.redrive_quarantine(6, fix=_fix)
    assert not st.skipped and st.events_seen == 3
    assert _final_rows(eng) == _final_rows(clean)
    assert eng.read_quarantine(pending_only=True) is None


def test_bad_source_epochs_do_not_wedge_the_redrive_epoch(spark, tmp_path):
    """A typo'd --source-epochs must fail BEFORE the intent is durably
    published — otherwise every retry (including the corrected one)
    adopts the bad list verbatim and the redrive epoch is wedged until
    someone hand-deletes the intent file."""
    eng = _replay_corrupted(spark, tmp_path, "rdbad")
    with pytest.raises(FileNotFoundError, match="no intent was published"):
        eng.redrive_quarantine(4, fix=_fix, source_epochs=[7])
    assert not os.path.exists(eng._redrive_intent_path(4))

    # the corrected retry reuses the SAME epoch — nothing was wedged
    st = eng.redrive_quarantine(4, fix=_fix, source_epochs=[0, 1, 2])
    assert not st.skipped and st.events_seen == 3


def test_explicit_source_epochs_refuse_already_redriven(spark, tmp_path):
    """An explicit source list naming partitions that already carry a
    _REDRIVEN marker is refused: re-admitting them under a second epoch
    double-applies the events (and with a different fix, divergently),
    and the marker's lineage would point at the wrong redrive."""
    eng = _replay_corrupted(spark, tmp_path, "rdar")
    assert not eng.redrive_quarantine(4, fix=_fix).skipped

    with pytest.raises(ValueError, match="already redriven"):
        eng.redrive_quarantine(6, fix=_fix, source_epochs=[0, 1])
    assert not os.path.exists(eng._redrive_intent_path(6))


def test_normal_ingest_refuses_epoch_stolen_by_redrive(spark, tmp_path):
    """The mirror race: a redrive commits an epoch number that the
    normal ingest replay later reaches. The ingest's idempotent skip
    would silently drop that entire source slice (the redrive's content
    is not the slice); the origin tag recorded in the manifest turns it
    into a loud EpochOriginConflict instead."""
    from data_migration_validation_spark.plans.apply import EpochOriginConflict

    eng = _replay_corrupted(spark, tmp_path, "rdsteal")  # epochs 0-3
    assert not eng.redrive_quarantine(4, fix=_fix).skipped  # burns epoch 4

    with pytest.raises(EpochOriginConflict, match="NOT applied"):
        eng.apply_epoch(_events(spark, _EPOCHS[3], 3), 4)
    # the genuine resume of an ingest-committed epoch still skips quietly
    assert eng.apply_epoch(_events(spark, _EPOCHS[3], 3), 3).skipped


def test_redrive_publish_race_takes_conflict_path(spark, tmp_path, monkeypatch):
    """The in-flight window the entry check cannot see: a normal ingest
    commits the redrive's epoch number AFTER redrive_quarantine passed
    its entry checks but BEFORE its own commit publishes. The commit
    conflict resolves to 'epoch already applied' — and the origin check
    on that conflict-resolved skip must turn it into the same loud
    retire-and-retry outcome as the entry race, never a silent
    _REDRIVEN stamp."""
    clean = _replay(spark, tmp_path, "rpclean", [0, 1, 2, 3])
    eng = _replay_corrupted(spark, tmp_path, "rp")
    foreign = CDCApplyEngine(
        spark,
        table_path=eng.lake.path,
        checkpoint_path=str(tmp_path / "rp-foreign-ck"),
        num_buckets=8,
    )

    real_commit = eng.lake.commit
    fired = []

    def sabotage(**kw):
        if kw.get("epoch") == 4 and not fired:
            fired.append(True)
            # the racing normal ingest wins epoch 4 mid-flight
            assert not foreign.apply_epoch(_events(spark, _EPOCHS[3], 3), 4).skipped
        return real_commit(**kw)

    monkeypatch.setattr(eng.lake, "commit", sabotage)
    with pytest.raises(RuntimeError, match="normal ingest"):
        eng.redrive_quarantine(4, fix=_fix)
    monkeypatch.setattr(eng.lake, "commit", real_commit)

    # loss prevented: sources pending, no markers, intent retired
    assert eng.read_quarantine(pending_only=True).count() == 3
    for e in (0, 1, 2):
        assert not os.path.exists(
            os.path.join(eng.quarantine_dir, f"epoch={e}", "_REDRIVEN")
        )
    assert not os.path.exists(eng._redrive_intent_path(4))

    # the retry on a fresh epoch completes; epoch 4's foreign content was
    # a re-delivered slice, so the final state still equals the oracle
    st = eng.redrive_quarantine(6, fix=_fix)
    assert not st.skipped and st.events_seen == 3
    assert _final_rows(eng) == _final_rows(clean)
    assert eng.read_quarantine(pending_only=True) is None
