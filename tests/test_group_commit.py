"""Group-commit replay (commit coalescing): k pending epochs applied in
ONE shuffle and ONE atomic snapshot.

The contract under test, against the sequential replay as the model:

* final-state equality — LWW over the union of k epochs picks exactly
  the winner k sequential applies would leave (incl. out-of-order
  events, duplicate redeliveries, tombstones);
* atomicity + idempotency — one snapshot per group (none-or-all), re-runs
  skip wholly-applied groups, partial overlaps re-plan;
* per-epoch attribution survives grouping — lineage files, metrics rows,
  and quarantine partitions stay keyed by epoch;
* granularity trades are enforced, not silent — novelty / cow refuse the
  group path, replay(group_size, audit=...) degrades to sequential.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from data_migration_validation_spark.operators.reconcile import (
    cogroup_reconcile,
    reconciliation_report,
)
from data_migration_validation_spark.plans.apply import CDCApplyEngine
from data_migration_validation_spark.sources.binlog import (
    BinlogConfig,
    epoch_slice,
    synth_binlog,
)

# disorder + duplicate redeliveries + tombstones, 6 epochs — no evolution
# (a dup redelivered across an evolution boundary ties on (warc_ts, seq)
# with different payload columns, ill-defined; same stance as
# test_schema_evolution.EVO_CFG)
CFG = BinlogConfig(n_keys=240, max_versions=4, events_per_epoch=160, seed=19)

# evolution mid-GROUP: html+lang → +fetch_status:int at epoch 2 → long at
# epoch 4, so a group of 3 spans both boundaries
EVO_CFG = BinlogConfig(
    n_keys=150,
    max_versions=4,
    events_per_epoch=100,
    seed=23,
    evo2_epoch=2,
    evo3_epoch=4,
    dup_pct=0,
)


@pytest.fixture(scope="module")
def binlog(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gc-binlog") / "log")
    synth_binlog(spark, CFG).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _engine(spark, root, **kw):
    kw.setdefault("num_buckets", 8)
    return CDCApplyEngine(
        spark,
        table_path=os.path.join(root, "table"),
        checkpoint_path=os.path.join(root, "ckpt"),
        **kw,
    )


def _slices(binlog, cfg):
    return {e: epoch_slice(binlog, cfg, e) for e in range(cfg.n_epochs)}


def _assert_tables_equal(seq_engine, grp_engine, label):
    a = seq_engine.read_final()
    b = grp_engine.read_final()
    diff = cogroup_reconcile(a, b, key="url")
    report = reconciliation_report(diff)
    assert report == {}, f"{label}: {report} {diff.limit(10).collect()}"


def test_group_equals_sequential_and_coalesces_snapshots(spark, binlog, tmp_path):
    seq = _engine(spark, str(tmp_path / "seq"))
    grp = _engine(spark, str(tmp_path / "grp"))
    seq.replay(_slices(binlog, CFG))
    stats = grp.replay(_slices(binlog, CFG), group_size=3)

    _assert_tables_equal(seq, grp, "grouped vs sequential final state")
    assert grp.lake.epochs_applied() == seq.lake.epochs_applied()
    # one snapshot per group of 3 (6 epochs → 2 ingest commits; compaction
    # may add maintenance commits on top — count epoch commits only)
    epoch_commits = [
        v
        for v in grp.lake.versions()
        if (grp.lake._manifest_raw(v).get("summary") or {}).get("epoch") is not None
    ]
    assert len(epoch_commits) == 2
    seq_epoch_commits = [
        v
        for v in seq.lake.versions()
        if (seq.lake._manifest_raw(v).get("summary") or {}).get("epoch") is not None
    ]
    assert len(seq_epoch_commits) == CFG.n_epochs
    # per-epoch stats came back, with per-epoch event attribution summing
    # to the sequential replay's
    assert [s.epoch for s in stats] == list(range(CFG.n_epochs))
    assert all(not s.skipped for s in stats)
    seq_events = {r["epoch"]: r for r in _lineage_totals(seq)}
    grp_events = {r["epoch"]: r for r in _lineage_totals(grp)}
    assert grp_events == seq_events


def _lineage_totals(engine):
    import pandas as pd

    frames = []
    ldir = engine.ckpt.lineage_dir
    for fn in sorted(os.listdir(ldir)):
        frames.append(pd.read_parquet(os.path.join(ldir, fn)))
    df = pd.concat(frames)
    out = (
        df.groupby("epoch")["applied_events"].sum().reset_index()
    )
    return [
        {"epoch": int(r.epoch), "applied_events": int(r.applied_events)}
        for r in out.itertuples()
    ]


def test_group_idempotent_rerun_and_partial_overlap(spark, binlog, tmp_path):
    grp = _engine(spark, str(tmp_path / "t"))
    slices = _slices(binlog, CFG)
    # epoch 0 applied sequentially first — the group must skip it and
    # commit only the remainder
    grp.apply_epoch(slices[0], 0)
    stats = grp.apply_epoch_group({0: slices[0], 1: slices[1], 2: slices[2]})
    assert stats[0].skipped and not stats[1].skipped and not stats[2].skipped
    assert grp.lake.epochs_applied() == {0, 1, 2}

    # full re-run of the same group: wholly applied → all skipped, no new
    # snapshot
    before = grp.lake.versions()
    stats2 = grp.apply_epoch_group({e: slices[e] for e in (0, 1, 2)})
    assert all(s.skipped for s in stats2)
    assert grp.lake.versions() == before

    # rest of the log via grouped replay, then equality vs sequential
    grp.replay(slices, group_size=4)
    seq = _engine(spark, str(tmp_path / "seq"))
    seq.replay(slices)
    _assert_tables_equal(seq, grp, "after overlap + rerun + grouped tail")


def test_group_crash_between_commit_and_checkpoint(spark, binlog, tmp_path):
    """The group commit is atomic and the LAKE is truth: a crash after
    the snapshot lands but before the checkpoint advances must leave a
    re-run that skips the whole group (all k epochs), never double-
    applies it — the same exactly-once contract apply_epoch carries."""
    grp = _engine(spark, str(tmp_path / "t"))
    slices = _slices(binlog, CFG)
    chunk = {e: slices[e] for e in (0, 1, 2)}
    with pytest.raises(RuntimeError, match="injected crash"):
        grp.apply_epoch_group(chunk, crash_after_commit=True)
    # the commit landed atomically (all three epochs), checkpoint did not
    assert grp.lake.epochs_applied() == {0, 1, 2}
    assert grp.ckpt.last_epoch() is None
    before = grp.lake.versions()
    stats = grp.apply_epoch_group(chunk)
    assert all(s.skipped for s in stats)
    assert grp.lake.versions() == before
    # the fast idempotency-guard path does NOT advance the checkpoint —
    # same as apply_epoch's: the LAKE is truth, the checkpoint is a
    # resume hint (re-offered epochs no-op against the lake guard)
    assert grp.ckpt.last_epoch() is None
    # and the state is exactly the sequential replay's
    seq = _engine(spark, str(tmp_path / "seq"))
    for e in (0, 1, 2):
        seq.apply_epoch(slices[e], e)
    _assert_tables_equal(seq, grp, "crash-replayed group")


def test_lake_commit_partial_overlap_raises(spark, binlog, tmp_path):
    grp = _engine(spark, str(tmp_path / "t"))
    slices = _slices(binlog, CFG)
    grp.apply_epoch_group({0: slices[0], 1: slices[1]})
    # a direct lake-level group commit overlapping an applied epoch must
    # refuse (the engine filters first; this guards foreign callers)
    snap = grp.lake.current_snapshot()
    df = grp.lake.read(spark).limit(0)
    with pytest.raises(ValueError, match="already applied"):
        grp.lake.commit(
            new_bucket_data=df,
            touched_buckets=set(),
            epoch=[1, 2],
            schema=snap.schema,
            mode="delta",
        )


def test_group_schema_evolution_mid_group(spark, tmp_path):
    log = synth_binlog(spark, EVO_CFG)
    path = str(tmp_path / "log")
    log.write.mode("overwrite").parquet(path)
    log = spark.read.parquet(path)
    slices = {e: epoch_slice(log, EVO_CFG, e) for e in range(EVO_CFG.n_epochs)}
    seq = _engine(spark, str(tmp_path / "seq"))
    grp = _engine(spark, str(tmp_path / "grp"))
    seq.replay(slices)
    # group of 3 spans evo2 (new column) and evo3 (int→long widening)
    grp.replay(slices, group_size=3)
    _assert_tables_equal(seq, grp, "evolution mid-group")
    assert grp.lake.current_snapshot().schema == seq.lake.current_snapshot().schema


def test_group_quarantine_per_epoch_attribution(spark, binlog, tmp_path):
    slices = _slices(binlog, CFG)
    # mangle ops deterministically in epochs 1 and 2 only
    def mangle(df, mod):
        return df.withColumn(
            "op",
            F.when(F.col("seq") % mod == 0, F.concat(F.col("op"), F.lit("X"))).otherwise(
                F.col("op")
            ),
        )

    slices = dict(slices)
    slices[1] = mangle(slices[1], 7)
    slices[2] = mangle(slices[2], 5)
    grp = _engine(spark, str(tmp_path / "t"))
    stats = grp.apply_epoch_group({e: slices[e] for e in (0, 1, 2)})
    assert stats[0].quarantined == 0
    assert stats[1].quarantined > 0 and stats[2].quarantined > 0
    qdir = grp.quarantine_dir
    assert not os.path.isdir(os.path.join(qdir, "epoch=0"))
    for e, st in ((1, stats[1]), (2, stats[2])):
        got = spark.read.parquet(os.path.join(qdir, f"epoch={e}")).count()
        assert got == st.quarantined
    # quarantine rows are excluded from the applied state, same as the
    # sequential path — equality against sequential on the same slices
    seq = _engine(spark, str(tmp_path / "seq"))
    for e in (0, 1, 2):
        seq.apply_epoch(slices[e], e)
    _assert_tables_equal(seq, grp, "quarantined group")


def test_group_quarantine_off_fails_loud(spark, binlog, tmp_path):
    slices = _slices(binlog, CFG)
    bad = slices[1].withColumn(
        "op", F.when(F.col("seq") % 11 == 0, F.lit(None)).otherwise(F.col("op"))
    )
    grp = _engine(spark, str(tmp_path / "t"), quarantine=False)
    with pytest.raises(ValueError, match="malformed"):
        grp.apply_epoch_group({0: slices[0], 1: bad})
    # nothing committed — atomicity of the refusal
    assert grp.lake.epochs_applied() == set()


def test_group_guards_and_fallbacks(spark, binlog, tmp_path):
    slices = _slices(binlog, CFG)
    cow = _engine(spark, str(tmp_path / "cow"), merge_mode="cow")
    with pytest.raises(ValueError, match="mor"):
        cow.apply_epoch_group({0: slices[0], 1: slices[1]})

    nov = _engine(spark, str(tmp_path / "nov"), novelty_filter="exact")
    with pytest.raises(ValueError, match="novelty"):
        nov.apply_epoch_group({0: slices[0], 1: slices[1]})

    # replay(group_size, audit=...) must stay sequential: the WAP gate
    # judges epochs in isolation — count per-epoch ingest commits
    from data_migration_validation_spark.operators.audit import page_envelope_audit

    aud = _engine(spark, str(tmp_path / "aud"))
    aud.replay(
        {e: slices[e] for e in (0, 1)}, group_size=2, audit=page_envelope_audit()
    )
    epoch_commits = [
        v
        for v in aud.lake.versions()
        if (aud.lake._manifest_raw(v).get("summary") or {}).get("epoch") is not None
    ]
    assert len(epoch_commits) == 2


@pytest.mark.parametrize("store_kind", ["posix", "condput"])
def test_grouped_replayer_races_sequential_replayer(spark, binlog, tmp_path, store_kind):
    """A grouped replayer (group_size=3) and a sequential replayer race
    over the SAME log into the SAME table: every epoch lands exactly once
    and the final state matches the sequential model. The grouped writer
    may lose a mid-group race (a subset of its group gets committed under
    it) — the documented recovery is to re-call and re-plan without the
    overlapped epochs, which this test exercises for real."""
    import threading

    from data_migration_validation_spark.plans.commit_store import (
        ConditionalPutCommitStore,
        LocalBlobApi,
    )
    from data_migration_validation_spark.plans.lake import LakeTable

    table = str(tmp_path / "t")

    def _store():
        if store_kind == "posix":
            return None
        return ConditionalPutCommitStore(LocalBlobApi(table + "/_meta_blob"))

    slices = _slices(binlog, CFG)

    def sequential(errs):
        try:
            eng = CDCApplyEngine(
                spark,
                table_path=table,
                checkpoint_path=str(tmp_path / "ck-seq"),
                num_buckets=8,
                store=_store(),
            )
            for e in sorted(slices):
                eng.apply_epoch(slices[e], e)
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    def grouped(errs):
        try:
            eng = CDCApplyEngine(
                spark,
                table_path=table,
                checkpoint_path=str(tmp_path / "ck-grp"),
                num_buckets=8,
                store=_store(),
            )
            for _ in range(30):
                try:
                    eng.replay(slices, group_size=3)
                    return
                except RuntimeError as ex:
                    if "re-plan" not in str(ex):
                        raise
                except ValueError as ex:
                    if "already applied" not in str(ex):
                        raise
            raise RuntimeError("grouped replayer did not converge in 30 attempts")
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    errs: list[BaseException] = []
    ts = [
        threading.Thread(target=sequential, args=(errs,)),
        threading.Thread(target=grouped, args=(errs,)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not any(t.is_alive() for t in ts), "replayer still running"
    assert not errs, f"replayer failed: {errs[:1]}"

    lake = LakeTable(table, store=_store())
    assert sorted(lake.current_snapshot().epochs) == list(range(CFG.n_epochs))
    # no commit dropped from the history
    vs = lake.versions()
    for prev, cur in zip(vs, vs[1:]):
        assert lake._manifest_raw(cur).get("parent") == prev

    seq = _engine(spark, str(tmp_path / "model"))
    seq.replay(slices)
    check = CDCApplyEngine(
        spark,
        table_path=table,
        checkpoint_path=str(tmp_path / "ck-check"),
        store=_store(),
    )
    a = seq.read_final()
    b = check.read_final()
    diff = cogroup_reconcile(a, b, key="url")
    assert reconciliation_report(diff) == {}


def test_group_asof_and_summary_granularity(spark, binlog, tmp_path):
    slices = _slices(binlog, CFG)
    grp = _engine(spark, str(tmp_path / "t"), compact_every=0)
    grp.replay(slices, group_size=3)
    # mid-group epochs resolve to the PREVIOUS group boundary (epoch 1 is
    # inside group [0,1,2] → no snapshot covers only epochs <= 1)
    assert grp.lake.version_asof_epoch(1) is None
    v2 = grp.lake.version_asof_epoch(2)
    assert v2 is not None
    assert grp.lake.version_asof_epoch(4) == v2  # epoch 4 inside [3,4,5]
    assert grp.lake.version_asof_epoch(5) is not None

    # epoch_summary resolves group members to the group's summary
    s = grp.lake.epoch_summary(1)
    assert s is not None and s["epoch"] == [0, 1, 2]
    assert set(s["applied_events_by_epoch"]) == {"0", "1", "2"}
    # read_asof at a group boundary equals the sequential table at that
    # boundary
    seq = _engine(spark, str(tmp_path / "seq"), compact_every=0)
    for e in (0, 1, 2):
        seq.apply_epoch(slices[e], e)
    a = seq.read_final()
    b = grp.read_asof(2)
    diff = cogroup_reconcile(a, b, key="url")
    assert reconciliation_report(diff) == {}

    # CDF across the coarsened epoch line: a from-point INSIDE a group
    # falls back to the previous resolvable boundary — the feed is a
    # superset of the request (here: everything since the [0,1,2]
    # boundary, even though epoch 4 sits mid-[3,4,5])
    feed_boundary = grp.read_changes(from_epoch=2)
    feed_mid = grp.read_changes(from_epoch=4)
    assert feed_mid.count() == feed_boundary.count()
