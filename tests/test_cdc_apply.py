"""End-to-end CDC replay: binlog → epoch apply → final state equality.

These are the executable version of the reference's golden-artifact tests
(SURVEY.md §5): a deterministic change stream with seeded out-of-order
events, duplicates, and tombstones, replayed through the engine, with the
final table asserted row- and byte-identical (including extracted text)
against the independent closed-form LWW oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_migration_validation_spark.functions.text import extract_text
from data_migration_validation_spark.operators.reconcile import (
    cogroup_reconcile,
    reconciliation_report,
)
from data_migration_validation_spark.plans.apply import CDCApplyEngine
from data_migration_validation_spark.sources.binlog import (
    BinlogConfig,
    epoch_slice,
    expected_final_state,
    synth_binlog,
)

CFG = BinlogConfig(n_keys=300, max_versions=4, events_per_epoch=250, seed=7)


@pytest.fixture(scope="module")
def binlog(spark, tmp_path_factory):
    """Binlog materialized to parquet once — the realistic shape (a WAL is
    storage-backed) and avoids re-evaluating the generator DAG per epoch."""
    path = str(tmp_path_factory.mktemp("binlog") / "log")
    synth_binlog(spark, CFG).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@pytest.fixture(scope="module")
def replayed(spark, binlog, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("replayed")
    engine = CDCApplyEngine(
        spark, table_path=str(tmp / "table"), checkpoint_path=str(tmp / "ckpt"), num_buckets=8
    )
    for epoch in range(CFG.n_epochs):
        engine.apply_epoch(epoch_slice(binlog, CFG, epoch), epoch)
    return engine


def _assert_final_matches(spark, engine, binlog):
    final = engine.read_final().select(
        "url", "warc_ts", "seq", "html", "lang", "fetch_status", "text"
    )
    expected = expected_final_state(spark, CFG, log=binlog).withColumn(
        "text", extract_text(F.col("html"))
    )
    diff = cogroup_reconcile(expected, final, key="url")
    report = reconciliation_report(diff)
    assert report == {}, f"reconciliation found differences: {report} {diff.limit(10).collect()}"


def test_binlog_has_disorder_dups_tombstones(spark, binlog):
    log = binlog
    # out-of-order within the log: later warc_ts at lower seq for same key
    disorder = (
        log.alias("a")
        .join(log.alias("b"), "url")
        .where((F.col("a.seq") < F.col("b.seq")) & (F.col("a.warc_ts") > F.col("b.warc_ts")))
        .count()
    )
    assert disorder > 0
    assert log.where("is_dup").count() > 0
    assert log.where("op = 'D'").count() > 0
    # disorder across epoch boundaries too
    cross = (
        log.alias("a")
        .join(log.alias("b"), "url")
        .where(
            (F.col("a.batch_epoch") < F.col("b.batch_epoch"))
            & (F.col("a.warc_ts") > F.col("b.warc_ts"))
        )
        .count()
    )
    assert cross > 0
    # delete-then-reinsert exists: a D with a later (in event time) upsert
    reinsert = (
        log.where("op = 'D'")
        .alias("d")
        .join(log.where("op != 'D'").alias("u"), "url")
        .where(F.col("u.warc_ts") > F.col("d.warc_ts"))
        .count()
    )
    assert reinsert > 0


def test_full_replay_matches_oracle(spark, replayed, binlog):
    _assert_final_matches(spark, replayed, binlog)
    # text invariant: byte-identical extracted text for every live row
    final = replayed.read_final()
    bad = final.where(
        ~F.col("text").eqNullSafe(extract_text(F.col("html")))
    ).count()
    assert bad == 0


def test_epoch_partitioned_log_prunes_and_matches(spark, binlog, tmp_path):
    """The production log layout (generate CLI / bench / flagship) writes
    the binlog partitioned by batch_epoch: the per-epoch replay filter
    must become a PARTITION prune (directory skip), not a row-group scan,
    and the replay over that layout must reach the same final state."""
    path = str(tmp_path / "plog")
    binlog.write.mode("overwrite").partitionBy("batch_epoch").parquet(path)
    plog = spark.read.parquet(path)

    sliced = plog.where(F.col("batch_epoch") == 1).drop("is_dup")
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    # the epoch predicate sits in the partition filters, so the data
    # filters are empty — nothing left to evaluate against row groups
    part_line = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "batch_epoch" in part_line, plan

    engine = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "table"),
        checkpoint_path=str(tmp_path / "ckpt"),
        num_buckets=8,
    )
    for epoch in range(CFG.n_epochs):
        engine.apply_epoch(plog.where(F.col("batch_epoch") == epoch), epoch)
    _assert_final_matches(spark, engine, binlog)


def test_replay_is_idempotent(spark, replayed, binlog):
    v_before = replayed.lake.current_version()
    for epoch in range(CFG.n_epochs):
        stats = replayed.apply_epoch(epoch_slice(binlog, CFG, epoch), epoch)
        assert stats.skipped
    assert replayed.lake.current_version() == v_before
    _assert_final_matches(spark, replayed, binlog)


def test_crash_between_commit_and_checkpoint(spark, binlog, tmp_path):
    engine = CDCApplyEngine(
        spark, table_path=str(tmp_path / "table"), checkpoint_path=str(tmp_path / "ckpt"), num_buckets=8
    )
    crash_epoch = 1
    engine.apply_epoch(epoch_slice(binlog, CFG, 0), 0)
    with pytest.raises(RuntimeError, match="injected crash"):
        engine.apply_epoch(epoch_slice(binlog, CFG, crash_epoch), crash_epoch, crash_after_commit=True)
    # checkpoint is stale (epoch 0), lake already has epoch 1 committed
    assert engine.ckpt.last_epoch() == crash_epoch - 1
    assert crash_epoch in engine.lake.epochs_applied()

    # recovery with a fresh engine: the committed-but-uncheckpointed epoch
    # is skipped (lake is truth), the rest apply exactly once
    engine2 = CDCApplyEngine(
        spark, table_path=str(tmp_path / "table"), checkpoint_path=str(tmp_path / "ckpt"), num_buckets=8
    )
    stats = [engine2.apply_epoch(epoch_slice(binlog, CFG, e), e) for e in range(CFG.n_epochs)]
    assert [s.skipped for s in stats[: crash_epoch + 1]] == [True] * (crash_epoch + 1)
    _assert_final_matches(spark, engine2, binlog)


def test_lww_pandas_path_matches_window_path(spark, binlog, replayed, tmp_path):
    engine_p = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "table"),
        checkpoint_path=str(tmp_path / "ckpt"),
        num_buckets=8,
        use_pandas_lww=True,
        n_salts=4,
    )
    for epoch in range(CFG.n_epochs):
        engine_p.apply_epoch(epoch_slice(binlog, CFG, epoch), epoch)
    diff = cogroup_reconcile(replayed.read_final(), engine_p.read_final(), key="url")
    assert diff.count() == 0


def test_prededup_path_matches_default(spark, binlog, replayed, tmp_path):
    """The optional in-batch pre-dedup shuffle (backfill path) must land on
    the same final state as the default single-shuffle merge."""
    engine_d = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "table"),
        checkpoint_path=str(tmp_path / "ckpt"),
        num_buckets=8,
        in_batch_prededup=True,
    )
    for epoch in range(CFG.n_epochs):
        engine_d.apply_epoch(epoch_slice(binlog, CFG, epoch), epoch)
    diff = cogroup_reconcile(replayed.read_final(), engine_d.read_final(), key="url")
    assert diff.count() == 0


def test_lineage_accounting(replayed):
    lin = replayed.ckpt.lineage()
    assert set(lin["epoch"].unique()) == set(range(CFG.n_epochs))
    # offsets lie within each epoch's contiguous log range (+1 epoch of
    # slack for redelivered duplicates)
    for _, row in lin.iterrows():
        lo = (row["epoch"] - 1) * CFG.events_per_epoch
        hi = (row["epoch"] + 1) * CFG.events_per_epoch
        assert lo <= row["source_offset_start"] <= row["source_offset_end"] < hi
    m = replayed.ckpt.metrics()
    assert (m[m.metric == "applied_events"].value > 0).all()
    # mode-tagged write metric (mor: delta winners per epoch)
    assert (m[m.metric == "rows_written_mor"].value > 0).all()
    assert len(m[m.metric == "rows_written_mor"]) == CFG.n_epochs


def test_expr_extraction_byte_identical_and_jvm_only(spark, binlog, tmp_path):
    """extract_text_expr must produce byte-identical text to the Arrow
    UDF on the whole synthetic corpus, and a text_extract="expr" engine
    must reach the same final state with NO Python evaluation anywhere
    in its merge plan."""
    from data_migration_validation_spark.functions.text import extract_text_expr

    pages = binlog.where(F.col("payload.html").isNotNull()).select(
        F.col("payload.html").alias("html")
    )
    both = pages.select(
        extract_text(F.col("html")).alias("udf"),
        extract_text_expr(F.col("html")).alias("expr"),
    )
    assert both.where(~F.col("udf").eqNullSafe(F.col("expr"))).count() == 0

    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "t-expr"),
        checkpoint_path=str(tmp_path / "c-expr"),
        num_buckets=8,
        text_extract="expr",
    )
    for epoch in range(CFG.n_epochs):
        eng.apply_epoch(epoch_slice(binlog, CFG, epoch), epoch)
    _assert_final_matches(spark, eng, binlog)
