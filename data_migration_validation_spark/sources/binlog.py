"""Deterministic simulated binlog/WAL of CDC events over synthetic pages.

Event envelope (FIXTURES.md F3):
    op:string (I/U/D), url:string, warc_ts:timestamp, seq:long,
    payload:struct<html:binary, lang:string[, fetch_status:int|long]>,
    batch_epoch:long

Design (scales to 1e10 events — generation is ``spark.range`` + expressions,
one row per (key, version), no driver loops):

* each key gets 1..max_versions versions; version v's event-time is
  monotone in v, but for a deterministic ~25% of keys the versions are
  written to the log in REVERSE order, so event-time regresses within the
  log → out-of-order events within and across epochs (the LWW merge must
  not let a late-arriving older version overwrite newer state).
* ``seq`` is the log position (unique, total order); the LWW winner per key
  is max(warc_ts, seq).
* ``batch_epoch = seq div events_per_epoch`` → contiguous, non-overlapping
  source offset ranges per epoch (lineage-friendly), while event-time
  disorder still crosses epoch boundaries.
* a deterministic fraction of events is REDELIVERED into the next epoch
  (same seq/payload — duplicate delivery); exactly-once accounting must
  count them once.
* tombstones: deterministic deletes mid-timeline and end-of-timeline,
  including delete-then-reinsert (an I/U after a D in event-time).
* schema evolution (FIXTURES.md F4): payload is html+lang before
  ``evo2_epoch``; gains fetch_status:int at evo2; widens to long at
  ``evo3_epoch``. ``epoch_slice`` returns each epoch with the schema
  current at that epoch.

The expected final state has an independent closed form (window LWW over
the whole log) — ``expected_final_state`` — used by the reconciliation
tests against the engine's epoch-by-epoch merge replay.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_migration_validation_spark.sources.pages import (
    BASE_TS,
    _mixed,
    html_expr,
    text_expr,
    url_expr,
)


@dataclass(frozen=True)
class BinlogConfig:
    n_keys: int = 1000
    max_versions: int = 4
    events_per_epoch: int = 1000
    seed: int = 42
    hot_fraction_pct: int = 50
    # epoch at which payload gains fetch_status:int / widens to long;
    # None disables evolution (full final schema everywhere).
    evo2_epoch: int | None = None
    evo3_epoch: int | None = None
    # fraction (percent) of events redelivered into the following epoch
    dup_pct: int = 5
    num_partitions: int | None = None
    # payload size: words per page (~6.5 bytes/word). Defaults give tiny
    # pages for fast tests; benchmarks use hundreds of words so the
    # pipeline moves Common-Crawl-realistic byte volumes.
    min_words: int = 5
    max_words: int = 40

    @property
    def n_events(self) -> int:
        # upper bound on seq space: one slot per (key, version)
        return self.n_keys * self.max_versions

    @property
    def n_epochs(self) -> int:
        return (self.n_events + self.events_per_epoch - 1) // self.events_per_epoch


def _raw_events(spark: SparkSession, cfg: BinlogConfig) -> DataFrame:
    """One row per (key, version) with full (v3) payload schema.

    Columns: op, url, warc_ts, seq, payload, batch_epoch, is_dup(false).
    """
    keys = spark.range(0, cfg.n_keys, numPartitions=cfg.num_partitions)
    k = F.col("id")
    n_versions = (_mixed(k + F.lit(cfg.seed), 41) % cfg.max_versions) + 1
    kv = keys.select(
        k.alias("key"),
        F.explode(F.sequence(F.lit(0), n_versions - 1)).alias("log_pos"),
    )

    key = F.col("key")
    log_pos = F.col("log_pos")  # position of this key's events within the log
    nv = (_mixed(key + F.lit(cfg.seed), 41) % cfg.max_versions) + 1
    # ~25% of keys write their versions to the log in reverse time order
    reversed_key = _mixed(key + F.lit(cfg.seed), 37) % 4 == 0
    v_eff = F.when(reversed_key, nv - 1 - log_pos).otherwise(log_pos)  # time order

    eid = key * cfg.max_versions + log_pos  # log position → seq
    ts_seconds = v_eff * 3600 + (_mixed(key, 5) % 60)
    content_id = key * cfg.max_versions + v_eff + F.lit(cfg.seed * 7919)
    text = text_expr(content_id, min_words=cfg.min_words, max_words=cfg.max_words)

    is_delete = (v_eff > 0) & (_mixed(key * cfg.max_versions + v_eff, 23) % 6 == 0)
    op = (
        F.when(is_delete, F.lit("D"))
        .when(v_eff == 0, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    fetch_status = F.when(_mixed(content_id, 43) % 20 == 0, F.lit(404)).otherwise(F.lit(200)).cast("long")
    payload = F.when(
        is_delete, F.lit(None).cast("struct<html:binary,lang:string,fetch_status:long>")
    ).otherwise(
        F.struct(
            html_expr(text, F.concat(F.lit("T"), key.cast("string"), F.lit("v"), v_eff.cast("string"))).alias("html"),
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("hi"), F.lit("te")),
                (_mixed(key + F.lit(cfg.seed), 17) % 4 + 1).cast("int"),
            ).alias("lang"),
            fetch_status.alias("fetch_status"),
        )
    )

    return kv.select(
        op.alias("op"),
        url_expr(key, cfg.hot_fraction_pct).alias("url"),
        (F.to_timestamp(F.lit(BASE_TS)) + F.make_interval(secs=ts_seconds.cast("double"))).alias("warc_ts"),
        eid.alias("seq"),
        payload.alias("payload"),
        (eid / cfg.events_per_epoch).cast("long").alias("batch_epoch"),
        F.lit(False).alias("is_dup"),
    )


def synth_binlog(spark: SparkSession, cfg: BinlogConfig) -> DataFrame:
    """Full simulated binlog including duplicate redeliveries.

    Duplicates carry the same (op, url, warc_ts, seq, payload) but are
    assigned to the NEXT epoch (clamped), with is_dup=true for test
    introspection. Schema is the final (v3) schema; use ``epoch_slice``
    for evolution-aware per-epoch reads.
    """
    base = _raw_events(spark, cfg)
    dups = (
        base.where(_mixed(F.col("seq"), 53) % 100 < cfg.dup_pct)
        .withColumn(
            "batch_epoch",
            F.least(F.col("batch_epoch") + 1, F.lit(cfg.n_epochs - 1)),
        )
        .withColumn("is_dup", F.lit(True))
    )
    return base.unionByName(dups)


def epoch_slice(binlog: DataFrame, cfg: BinlogConfig, epoch: int) -> DataFrame:
    """One epoch's events, with the payload schema current at that epoch
    (drives the schema-registry merge in the apply engine)."""
    sl = binlog.where(F.col("batch_epoch") == epoch).drop("is_dup")
    if cfg.evo2_epoch is not None and epoch < cfg.evo2_epoch:
        sl = sl.withColumn(
            "payload",
            F.when(
                F.col("payload").isNull(), F.lit(None).cast("struct<html:binary,lang:string>")
            ).otherwise(F.struct(F.col("payload.html").alias("html"), F.col("payload.lang").alias("lang"))),
        )
    elif cfg.evo3_epoch is not None and epoch < cfg.evo3_epoch:
        sl = sl.withColumn(
            "payload",
            F.when(
                F.col("payload").isNull(),
                F.lit(None).cast("struct<html:binary,lang:string,fetch_status:int>"),
            ).otherwise(
                F.struct(
                    F.col("payload.html").alias("html"),
                    F.col("payload.lang").alias("lang"),
                    F.col("payload.fetch_status").cast("int").alias("fetch_status"),
                )
            ),
        )
    return sl


def expected_final_state(
    spark: SparkSession, cfg: BinlogConfig, log: DataFrame | None = None
) -> DataFrame:
    """Independent closed-form oracle: LWW winner per url over the whole
    log (order (warc_ts, seq) desc), deletes removed. Columns:
    url, warc_ts, seq, html, lang, fetch_status.

    Pass a materialized ``log`` (e.g. read back from parquet) to avoid
    re-evaluating the generator DAG."""
    if log is None:
        log = synth_binlog(spark, cfg)
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc(), F.col("seq").desc())
    return (
        log.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "url",
            "warc_ts",
            "seq",
            F.col("payload.html").alias("html"),
            F.col("payload.lang").alias("lang"),
            F.col("payload.fetch_status").alias("fetch_status"),
        )
    )
