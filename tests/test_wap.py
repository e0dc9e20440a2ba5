"""Write-audit-publish: staged epoch commits gated by the validation
checks (the reference's null/format/duplicate checks — src/validate.py:
85-110, docs/script.js:36-46 — promoted to an ingestion gate).

Contract under test: a failing audit leaves the table EXACTLY as it was
(no new version, no new files, epoch un-checkpointed, retryable); a
passing audit publishes atomically; a crash between stage and publish
leaves only an invisible, reclaimable orphan."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_migration_validation_spark.operators.audit import (
    page_envelope_audit,
    standard_audit,
)
from data_migration_validation_spark.plans.apply import CDCApplyEngine
from data_migration_validation_spark.sources.binlog import (
    BinlogConfig,
    epoch_slice,
    expected_final_state,
    synth_binlog,
)

EV_SCHEMA = (
    "op string, url string, warc_ts timestamp, seq long, "
    "payload struct<html:binary,lang:string>, batch_epoch int"
)


def _events(spark, rows, epoch=0):
    data = [
        (op, url, datetime.fromisoformat(ts), seq, (html, lang), epoch)
        for op, url, ts, seq, html, lang in rows
    ]
    return spark.createDataFrame(data, EV_SCHEMA)


def _engine(spark, tmp_path, name="t", **kw):
    return CDCApplyEngine(
        spark,
        table_path=str(tmp_path / name),
        checkpoint_path=str(tmp_path / f"{name}-ckpt"),
        num_buckets=4,
        **kw,
    )


GOOD = [
    ("I", "https://a.example.com/1", "2024-01-01 00:00:00", 0, b"<html><p>hello</p></html>", "en"),
    ("I", "https://a.example.com/2", "2024-01-01 00:01:00", 1, b"<html><p>welt</p></html>", "de"),
]
BAD_URL = [
    ("I", "not a url", "2024-01-02 00:00:00", 10, b"<html><p>x</p></html>", "en"),
    ("U", "https://a.example.com/1", "2024-01-02 00:01:00", 11, b"<html><p>hi</p></html>", "en"),
]


def test_good_epoch_stages_then_publishes(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    st = eng.apply_epoch(_events(spark, GOOD), 0, audit=page_envelope_audit())
    assert not st.skipped and not st.rejected
    assert eng.lake.epochs_applied() == {0}
    assert eng.ckpt.last_epoch() == 0
    assert eng.lake.staged_versions() == []  # published, nothing in flight
    assert eng.read_final().count() == 2
    # audit metrics recorded, including the zero-violation outcome
    m = eng.ckpt.metrics()
    audited = m[m["stage"] == "audit"]
    assert "audit_bad_url_format" in set(audited["metric"])
    assert audited[audited["metric"] == "audit_rejected"]["value"].tolist() == [0.0]


def test_bad_epoch_rejected_table_untouched(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    eng.apply_epoch(_events(spark, GOOD), 0, audit=page_envelope_audit())
    v_before = eng.lake.current_version()

    st = eng.apply_epoch(_events(spark, BAD_URL, epoch=1), 1, audit=page_envelope_audit())
    assert st.rejected
    assert st.audit_violations == {"bad_url_format": 1}
    # the table did not move: same version, same state, epoch not applied,
    # not checkpointed, and the stage was physically discarded
    assert eng.lake.current_version() == v_before
    assert eng.lake.epochs_applied() == {0}
    assert eng.ckpt.last_epoch() == 0
    assert eng.lake.staged_versions() == []
    assert eng.read_final().count() == 2

    # retry with corrected events publishes normally
    fixed = [r for r in BAD_URL if r[1].startswith("https://")]
    st2 = eng.apply_epoch(_events(spark, fixed, epoch=1), 1, audit=page_envelope_audit())
    assert not st2.rejected
    assert eng.lake.epochs_applied() == {0, 1}
    got = {
        r["url"]: r["lang"]
        for r in eng.read_final().select("url", "lang").collect()
    }
    assert len(got) == 2 and "not a url" not in got


def test_crash_between_stage_and_publish_is_recoverable(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    eng.apply_epoch(_events(spark, GOOD), 0, audit=page_envelope_audit())
    with pytest.raises(RuntimeError, match="stage and publish"):
        eng.apply_epoch(
            _events(spark, GOOD[:1], epoch=1), 1,
            audit=page_envelope_audit(), crash_after_stage=True,
        )
    orphans = eng.lake.staged_versions()
    assert len(orphans) == 1  # invisible: not published, not in history
    assert eng.lake.epochs_applied() == {0}
    assert eng.lake.versions() == [eng.lake.current_version()] or all(
        v <= eng.lake.current_version() for v in eng.lake.versions()
    )

    # retry re-stages under a fresh version and publishes
    st = eng.apply_epoch(_events(spark, GOOD[:1], epoch=1), 1, audit=page_envelope_audit())
    assert not st.rejected and eng.lake.epochs_applied() == {0, 1}
    # the orphan never becomes publishable (stale parent) and is reclaimable
    with pytest.raises(RuntimeError, match="parent"):
        eng.lake.publish(orphans[0])
    import os

    orphan_dir = eng.lake._manifest_raw(orphans[0])["commit_dir"]
    assert os.path.isdir(orphan_dir)
    assert eng.lake.cleanup_staged() == 1
    assert not os.path.isdir(orphan_dir)
    assert eng.lake.staged_versions() == []


def test_wap_replay_matches_unaudited_final_state(spark, tmp_path):
    """Full binlog replay (disorder, dups, tombstones) with the WAP gate
    on every epoch: the audit must pass on real traffic and the final
    state must equal the closed-form LWW oracle."""
    cfg = BinlogConfig(n_keys=120, max_versions=3, events_per_epoch=120, seed=11)
    log = synth_binlog(spark, cfg)
    # compact_every=2: compaction maintenance commits interleave with the
    # audited epoch publishes mid-replay — the two must compose (a
    # compaction parents off the published head, never off a stage)
    eng = _engine(spark, tmp_path, "replay", compact_every=2)
    stats = eng.replay(
        {e: epoch_slice(log, cfg, e) for e in range(cfg.n_epochs)},
        audit=page_envelope_audit(),
    )
    assert all(not s.rejected for s in stats)
    final = eng.read_final().select("url", "warc_ts", "seq")
    expected = expected_final_state(spark, cfg, log=log).select("url", "warc_ts", "seq")
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0


def test_replay_stops_at_rejected_epoch(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    slices = {
        0: _events(spark, GOOD),
        1: _events(spark, BAD_URL, epoch=1),
        2: _events(spark, GOOD[:1], epoch=2),
    }
    stats = eng.replay(slices, audit=page_envelope_audit())
    assert [s.epoch for s in stats] == [0, 1]
    assert stats[1].rejected
    assert eng.lake.epochs_applied() == {0}


def test_standard_audit_counts(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("https://ok/1", "x", False),
            ("https://ok/1", "y", False),  # duplicate key
            (None, "z", False),            # null key
            ("bad url", None, False),      # format violation + null col
            ("https://ok/2", None, True),  # tombstone: exempt from rules
        ],
        "url string, text string, deleted boolean",
    )
    audit = standard_audit(
        key_col="url",
        not_null=("text",),
        rules=[
            ("bad_url_format", F.col("url").rlike(r"^https?://\S+$")),
            ("skipped_rule", F.col("nope") > 0, ("nope",)),  # column absent → skipped
        ],
    )
    got = audit(df)
    assert got == {
        "null_key": 1,
        "duplicate_keys": 1,  # 4 non-null urls, 3 distinct
        "null_text": 1,
        "bad_url_format": 2,  # 'bad url' and the null-key row's null url
    }


def test_stream_apply_audit_gate(spark, tmp_path):
    """Streaming WAP: a micro-batch that fails the audit FAILS the query
    (the batch must not be marked committed — silent skip is data loss),
    leaves the table at the prior state, and a restart over a fixed feed
    replays the same batch_id and publishes."""
    import os

    from data_migration_validation_spark.streaming.microbatch import stream_apply

    log_dir = str(tmp_path / "slog")
    os.makedirs(log_dir)

    def _write(rows, name):
        staging = str(tmp_path / f"stage-{name}-{len(rows)}-{abs(hash(str(rows))) % 10**6}")
        _events(spark, rows).drop("batch_epoch").coalesce(1).write.parquet(staging)
        part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        os.rename(os.path.join(staging, part), f"{log_dir}/{name}.parquet")

    _write(GOOD, "batch-0")
    _write(BAD_URL, "batch-1")
    eng = _engine(spark, tmp_path, "stream")
    schema = _events(spark, GOOD).drop("batch_epoch").schema
    q = stream_apply(
        spark, log_dir, eng, schema=schema,
        checkpoint_location=str(tmp_path / "sckpt"),
        max_files_per_trigger=1, audit=page_envelope_audit(),
    )
    with pytest.raises(Exception, match="write-audit-publish"):
        q.awaitTermination(120)
        raise q.exception() or AssertionError("query should have failed")
    # batch 0 published; the bad batch left no trace
    assert eng.lake.epochs_applied() == {0}
    assert eng.read_final().count() == 2
    assert eng.lake.staged_versions() == []

    # fix the feed in place (replace the bad file's content) and restart:
    # the same batch_id replays and passes
    os.unlink(f"{log_dir}/batch-1.parquet")
    fixed = [r for r in BAD_URL if r[1].startswith("https://")]
    _write(fixed, "batch-1")
    q2 = stream_apply(
        spark, log_dir, eng, schema=schema,
        checkpoint_location=str(tmp_path / "sckpt"),
        max_files_per_trigger=1, audit=page_envelope_audit(),
    )
    q2.awaitTermination(120)
    assert eng.lake.epochs_applied() == {0, 1}
    assert eng.read_final().count() == 2


def test_audit_costs_one_action(spark, tmp_path, monkeypatch):
    """standard_audit must evaluate every check in ONE aggregation job —
    the audit sits inside the per-epoch commit path, so per-check scans
    would multiply ingest cost by the number of checks."""
    df = _events(spark, GOOD).select("url", "warc_ts", "seq")
    df_cls = type(df)
    calls = {"n": 0}
    real_collect = df_cls.collect

    def counting_collect(self):
        calls["n"] += 1
        return real_collect(self)

    monkeypatch.setattr(df_cls, "collect", counting_collect)
    got = page_envelope_audit()(df)
    assert calls["n"] == 1, f"audit ran {calls['n']} actions"
    assert got["null_key"] == 0 and got["bad_url_format"] == 0


def test_delete_storm_guard(spark, tmp_path):
    """An epoch that is mostly tombstones — the upstream-truncation
    signature — is rejected when the guard is armed; the same epoch
    passes with the guard off (deletes are otherwise legitimate)."""
    eng = _engine(spark, tmp_path)
    base = [
        ("I", f"https://a.example.com/{i}", "2024-01-01 00:00:00", i, b"<html><p>x</p></html>", "en")
        for i in range(120)
    ]
    eng.apply_epoch(_events(spark, base), 0, audit=page_envelope_audit(0.5))

    storm = [
        ("D", f"https://a.example.com/{i}", "2024-01-02 00:00:00", 1000 + i, None, None)
        for i in range(110)
    ]
    st = eng.apply_epoch(_events(spark, storm, epoch=1), 1, audit=page_envelope_audit(0.5))
    assert st.rejected and st.audit_violations == {"delete_storm": 1}
    assert eng.read_final().count() == 120  # storm blocked

    # small delete epochs stay legitimate (min_rows floor)
    few = storm[:5]
    st2 = eng.apply_epoch(_events(spark, few, epoch=1), 1, audit=page_envelope_audit(0.5))
    assert not st2.rejected
    assert eng.read_final().count() == 115

    # guard off: a genuine full purge is appliable deliberately
    st3 = eng.apply_epoch(_events(spark, storm[5:], epoch=2), 2, audit=page_envelope_audit())
    assert not st3.rejected
    assert eng.read_final().count() == 10


def test_wap_through_schema_evolution(spark, tmp_path):
    """The audit gate must compose with mid-stream schema evolution: the
    early epochs' staged commits lack later columns (the audit's
    column-guards skip those checks rather than failing analysis), every
    epoch publishes, and the final state matches the oracle."""
    cfg = BinlogConfig(
        n_keys=100, max_versions=3, events_per_epoch=90, seed=11,
        evo2_epoch=1, evo3_epoch=2, dup_pct=0,
    )
    log = synth_binlog(spark, cfg)
    eng = _engine(spark, tmp_path, "evo")
    stats = eng.replay(
        {e: epoch_slice(log, cfg, e) for e in range(cfg.n_epochs)},
        audit=page_envelope_audit(),
    )
    assert all(not s.rejected for s in stats)
    assert eng.lake.epochs_applied() == set(range(cfg.n_epochs))
    final = eng.read_final().select("url", "warc_ts", "seq", "fetch_status")
    # winner per key over the full log; fetch_status is null when the
    # winner was delivered BEFORE the column existed (evolution contract)
    from pyspark.sql.window import Window

    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc(), F.col("seq").desc())
    expected = (
        log.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "url", "warc_ts", "seq",
            F.when(
                F.col("batch_epoch") >= cfg.evo2_epoch, F.col("payload.fetch_status")
            ).alias("fetch_status"),
        )
    )
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0


def test_inline_audit_observes_during_write(spark, tmp_path, monkeypatch):
    """inline=True: the checks are collected by the staging write itself
    (DataFrame.observe) — the staged files are NEVER re-read, and a bad
    epoch is still rejected with the table untouched."""
    from data_migration_validation_spark.plans.lake import LakeTable

    def _boom(*a, **kw):
        raise AssertionError("inline audit re-read the staged files")

    monkeypatch.setattr(LakeTable, "read_added", _boom)
    eng = _engine(spark, tmp_path)
    st = eng.apply_epoch(_events(spark, GOOD), 0, audit=page_envelope_audit(inline=True))
    assert not st.rejected
    assert eng.read_final().count() == 2

    st = eng.apply_epoch(
        _events(spark, BAD_URL, epoch=1), 1, audit=page_envelope_audit(inline=True)
    )
    assert st.rejected
    assert st.audit_violations == {"bad_url_format": 1}
    assert eng.lake.epochs_applied() == {0}
    assert eng.lake.staged_versions() == []
    assert eng.read_final().count() == 2


def test_publish_conflict_restages_and_succeeds(spark, tmp_path):
    """A maintenance commit (compaction) racing an audited epoch moves the
    head between stage and publish. The publish must not raise out of
    apply_epoch stranding an orphan: the losing stage is rejected and the
    epoch re-stages against the new head under the same bounded-retry
    policy as unaudited commits. The classic audit callable runs between
    stage and publish, so it doubles as the race-injection point."""
    eng = _engine(spark, tmp_path, name="race")
    eng.apply_epoch(_events(spark, GOOD), 0)  # unaudited seed (delta files)

    base = page_envelope_audit()
    calls = {"n": 0}

    class RacingAudit:
        inline = False

        def __call__(self, df):
            calls["n"] += 1
            if calls["n"] == 1:
                # move the head while epoch 1's stage is pending
                assert eng.lake.compact(spark) > 0
            return base(df)

    more = [
        ("U", "https://a.example.com/1", "2024-01-02 00:00:00", 10,
         b"<html><p>neu</p></html>", "de"),
        ("I", "https://a.example.com/3", "2024-01-02 00:01:00", 11,
         b"<html><p>drei</p></html>", "en"),
    ]
    st = eng.apply_epoch(_events(spark, more, epoch=1), 1, audit=RacingAudit())
    assert not st.rejected and not st.skipped
    assert calls["n"] == 2  # attempt 1 lost the race, attempt 2 re-audited
    assert eng.lake.epochs_applied() == {0, 1}
    assert eng.lake.staged_versions() == []  # loser stage was reclaimed
    got = {r["url"]: r["lang"] for r in eng.read_final().select("url", "lang").collect()}
    assert got == {
        "https://a.example.com/1": "de",
        "https://a.example.com/2": "de",
        "https://a.example.com/3": "en",
    }
    # audit metrics recorded exactly ONCE for the epoch despite two
    # attempts — per-attempt appends would double every audit_* row
    m = eng.ckpt.metrics()
    e1 = m[(m["stage"] == "audit") & (m["epoch"] == 1)]
    assert e1[e1["metric"] == "audit_rejected"]["value"].tolist() == [0.0]
    assert e1["metric"].value_counts().max() == 1


def test_inline_audit_keeps_approx_duplicate_signal(spark, tmp_path):
    """Inline (observe-collected) audits cannot run the exact distinct
    duplicate count, but count − approx_count_distinct IS observable:
    a seeded duplicate-key merge-invariant break must reject the epoch
    even in the always-on inline mode; clean LWW output must not
    false-positive on estimator noise."""
    from pyspark.sql import Observation

    from data_migration_validation_spark.operators.audit import standard_audit

    spec = standard_audit(key_col="url", inline=True)

    # clean: unique keys → no flag (HLL noise is clamped)
    clean = spark.range(500).select(
        F.concat(F.lit("https://u/"), F.col("id")).alias("url")
    )
    obs = Observation()
    clean.observe(obs, *spec.agg_exprs(clean.columns)).write.mode("overwrite").parquet(
        str(tmp_path / "clean")
    )
    v = spec.postprocess(obs.get)
    assert v["duplicate_keys_approx"] == 0, v

    # broken merge: every key duplicated wholesale → flagged
    dup = clean.unionAll(clean)
    obs2 = Observation()
    dup.observe(obs2, *spec.agg_exprs(dup.columns)).write.mode("overwrite").parquet(
        str(tmp_path / "dup")
    )
    v2 = spec.postprocess(obs2.get)
    assert v2["duplicate_keys_approx"] > 0, v2


def test_inline_audit_rejects_engine_level_duplicate_break(spark, tmp_path, monkeypatch):
    """Engine-level: sabotage the LWW merge into a passthrough (the
    merge-invariant break the check exists for) — the inline audit must
    reject the staged epoch before it becomes visible."""
    import data_migration_validation_spark.plans.apply as apply_mod
    from data_migration_validation_spark.operators.audit import standard_audit

    eng = _engine(spark, tmp_path, name="dupbreak")
    audit = standard_audit(key_col="url", inline=True)
    eng.apply_epoch(_events(spark, GOOD), 0, audit=audit)  # healthy epoch publishes

    monkeypatch.setattr(
        apply_mod, "lww_window_bucketed", lambda df, key, order, bucket_col, **kw: df
    )
    dup_rows = [
        ("I", "https://a.example.com/9", "2024-01-03 00:00:00", 20 + i,
         b"<html><p>v</p></html>", "en")
        for i in range(40)  # 40 versions of ONE key, un-merged
    ]
    st = eng.apply_epoch(_events(spark, dup_rows, epoch=1), 1, audit=audit)
    assert st.rejected
    assert st.audit_violations.get("duplicate_keys_approx", 0) > 0
    assert eng.lake.epochs_applied() == {0}
    assert eng.read_final().count() == 2  # table untouched
