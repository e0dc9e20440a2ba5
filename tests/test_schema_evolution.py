"""Schema evolution: additive columns + type widening mid-stream
(FIXTURES.md F4), plus unit tests of the registry merge lattice."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_migration_validation_spark.operators.reconcile import (
    cogroup_reconcile,
    reconciliation_report,
)
from data_migration_validation_spark.plans.apply import CDCApplyEngine
from data_migration_validation_spark.schema import (
    SchemaEvolutionError,
    merge_schemas,
    widen,
)
from data_migration_validation_spark.sources.binlog import (
    BinlogConfig,
    epoch_slice,
    synth_binlog,
)
from pyspark.sql.window import Window

# dup_pct=0: a redelivered duplicate straddling the evolution epoch would
# tie on (warc_ts, seq) with different payload columns — ill-defined.
EVO_CFG = BinlogConfig(
    n_keys=120,
    max_versions=3,
    events_per_epoch=90,
    seed=11,
    evo2_epoch=2,
    evo3_epoch=3,
    dup_pct=0,
)


def test_widen_lattice():
    assert isinstance(widen(IntegerType(), LongType()), LongType)
    assert isinstance(widen(LongType(), IntegerType()), LongType)
    assert isinstance(widen(IntegerType(), DoubleType()), DoubleType)
    assert isinstance(widen(StringType(), StringType()), StringType)
    with pytest.raises(SchemaEvolutionError):
        widen(StringType(), LongType())


def test_widen_refuses_lossy_long_float():
    """long↔float/double unification silently corrupts 64-bit ids (> 2^24
    as float, > 2^53 as double) — the registry must refuse, like Iceberg.
    int-or-narrower↔float widens to double, which holds every int32."""
    from pyspark.sql.types import FloatType, ShortType

    for pair in [
        (LongType(), FloatType()),
        (FloatType(), LongType()),
        (LongType(), DoubleType()),
        (DoubleType(), LongType()),
    ]:
        with pytest.raises(SchemaEvolutionError):
            widen(*pair)
    assert isinstance(widen(IntegerType(), FloatType()), DoubleType)
    assert isinstance(widen(FloatType(), ShortType()), DoubleType)
    assert isinstance(widen(FloatType(), DoubleType()), DoubleType)


def test_merge_schemas_additive_and_partial():
    cur = StructType([StructField("a", IntegerType()), StructField("b", StringType())])
    inc = StructType([StructField("a", LongType()), StructField("c", DoubleType())])
    merged = merge_schemas(cur, inc)
    assert [f.name for f in merged.fields] == ["a", "b", "c"]
    assert isinstance(merged["a"].dataType, LongType)  # widened
    assert isinstance(merged["b"].dataType, StringType)  # partial batch ≠ drop


def test_mid_stream_evolution_replay(spark, tmp_path):
    cfg = EVO_CFG
    log_path = str(tmp_path / "log")
    synth_binlog(spark, cfg).write.parquet(log_path)
    log = spark.read.parquet(log_path)

    # 64 buckets ≫ winners-per-epoch: later epochs leave some early-epoch
    # buckets untouched, so the no-rewrite property is observable below.
    engine = CDCApplyEngine(
        spark, table_path=str(tmp_path / "table"), checkpoint_path=str(tmp_path / "ckpt"), num_buckets=64
    )
    schemas_seen = []
    for epoch in range(cfg.n_epochs):
        sl = epoch_slice(log, cfg, epoch)
        engine.apply_epoch(sl, epoch)
        schemas_seen.append(engine.registry.current)

    # v1 epochs: no fetch_status; after evo2: int; after evo3: long
    assert "fetch_status" not in schemas_seen[0].fieldNames()
    assert isinstance(schemas_seen[cfg.evo2_epoch]["fetch_status"].dataType, IntegerType)
    assert isinstance(schemas_seen[cfg.evo3_epoch]["fetch_status"].dataType, LongType)

    final = engine.read_final()
    assert isinstance(final.schema["fetch_status"].dataType, LongType)

    # Oracle: winner per key over the full log, with fetch_status masked
    # null when the winner was delivered before the column existed.
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
            F.when(F.col("batch_epoch") >= cfg.evo2_epoch, F.col("payload.fetch_status")).alias(
                "fetch_status"
            ),
        )
    )
    diff = cogroup_reconcile(
        expected, final, key="url", columns=["warc_ts", "seq", "html", "lang", "fetch_status"]
    )
    report = reconciliation_report(diff)
    assert report == {}, f"evolution replay mismatch: {report} {diff.limit(10).collect()}"

    # old files were NOT rewritten: early-epoch commits' parquet files are
    # still referenced by the final snapshot under their original schema
    snap = engine.lake.current_snapshot()
    # at least the v1 and v3 schema file groups are still referenced (with
    # merge-on-read commits they live in the delta groups until compaction)
    live_groups = {sj for sj, bb in snap.file_groups.items() if bb} | {
        sj for sj, bb in snap.delta_groups.items() if bb
    }
    assert len(live_groups) >= 2
