"""Driver-contract queries over /root/testdata/sf*/ parquet, each paired
with an ANSI-SQL oracle (DuckDB) in ``oracles.py`` — the correctness gate.

The flagship (``cdc_final_state``) derives a deterministic CDC change
stream from the ``documents`` table, replays it through the real apply
engine (epoch commits, LWW merge, Arrow text extraction) into a temp lake
table, and returns the final state — which the SQL oracle reproduces in
closed form (window LWW). This checks the *entire* pipeline, including
byte-identical text extraction, against an independent engine.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _parquet_rows(path: str, fs=None) -> int:
    """Row count from parquet footers — driver-side metadata only, no
    Spark job (a count() over the scan would schedule a full-table pass
    just to size epochs). ``fs`` is a :class:`fsio.DataFS`; the default
    local one is swapped for a pyarrow FileSystem on an object store."""
    from data_migration_validation_spark.fsio import LOCAL

    fs = fs or LOCAL
    if fs.is_dir(path):
        return sum(
            fs.parquet_metadata(f).num_rows
            for f in fs.list_files(path)
            if f.endswith(".parquet")
        )
    return fs.parquet_metadata(path).num_rows


# ---------------------------------------------------------------------------
# CDC change stream derived from `documents` (mirrored 1:1 in SQL oracle)
# ---------------------------------------------------------------------------

N_EPOCHS = 4  # epoch boundaries don't affect semantics (oracle is one LWW
# window over the whole log); fixed epoch COUNT keeps per-epoch driver
# overhead scale-invariant.


def doc_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic I/U/D stream over document urls: each doc gets
    (doc_id % 3 + 1) versions; docs with doc_id % 7 == 0 are written to the
    log in reverse time order (out-of-order); (doc_id+v) % 5 == 0 → delete."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    nv = d % 3 + 1
    n_docs = _parquet_rows(f"{sf_dir}/documents.parquet")
    events_per_epoch = max(1, (3 * n_docs) // N_EPOCHS + 1)
    exploded = docs.select(
        "doc_id", "text", "lang", "source", F.explode(F.sequence(F.lit(0), nv - 1)).alias("v")
    )
    d = F.col("doc_id")
    v = F.col("v")
    nv = d % 3 + 1
    log_pos = F.when(d % 7 == 0, nv - 1 - v).otherwise(v)
    op = (
        F.when((v > 0) & ((d + v) % 5 == 0), F.lit("D"))
        .when(v == 0, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    seq = d * 3 + log_pos
    body = F.concat(F.col("text"), F.lit(" v"), v.cast("string"))
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>D"),
            d.cast("string"),
            F.lit("</title></head><body><p>"),
            body,
            F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )
    payload = F.when(op == "D", F.lit(None).cast("struct<html:binary,lang:string>")).otherwise(
        F.struct(html.alias("html"), F.col("lang").alias("lang"))
    )
    return exploded.select(
        op.alias("op"),
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"), d.cast("string")).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(v * 3600 + d % 60).cast("double"))
        ).alias("warc_ts"),
        seq.alias("seq"),
        payload.alias("payload"),
        (seq / events_per_epoch).cast("long").alias("batch_epoch"),
    )


def _cdc_replay_final(
    spark: SparkSession,
    sf_dir: str,
    audit=None,
    prefix: str = "dmv-cdc-",
    changes: DataFrame | None = None,
    engine_kwargs: dict | None = None,
    post=None,
    group_size: int = 1,
) -> DataFrame:
    from data_migration_validation_spark.plans.apply import CDCApplyEngine

    if changes is None:
        changes = doc_changes(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    # epoch-partitioned log: the per-epoch replay filter prunes to one
    # directory instead of re-scanning the whole log's row groups each
    # epoch (batch_epoch is envelope-only — the engine drops it before
    # the merge, so the partition column's int read-back type never
    # reaches the schema registry)
    changes.write.mode("overwrite").partitionBy("batch_epoch").parquet(f"{tmp}/log")
    log = spark.read.parquet(f"{tmp}/log")
    n_epochs = log.agg(F.max("batch_epoch")).collect()[0][0] + 1
    engine = CDCApplyEngine(
        spark,
        table_path=f"{tmp}/table",
        checkpoint_path=f"{tmp}/ckpt",
        num_buckets=16,
        # compact mid-replay so the oracle validates the delta-commit AND
        # compaction paths, and the final read merges base + newer deltas
        compact_every=2,
        **(engine_kwargs or {}),
    )
    if group_size > 1:
        stats = engine.replay(
            {
                e: log.where(F.col("batch_epoch") == e)
                for e in range(int(n_epochs))
            },
            group_size=group_size,
            audit=audit,
        )
        assert not any(st.rejected for st in stats)
    else:
        for epoch in range(int(n_epochs)):
            st = engine.apply_epoch(
                log.where(F.col("batch_epoch") == epoch), epoch, audit=audit
            )
            assert not st.rejected, f"epoch {epoch} rejected: {st.audit_violations}"
    if post is not None:
        # post-replay engine hook (e.g. a quarantine redrive) — runs
        # before the final read so its commits are part of the answer
        post(engine, int(n_epochs))
    final = engine.read_final().select("url", "warc_ts", "seq", "lang", "text")
    final.write.mode("overwrite").parquet(f"{tmp}/final")
    out = spark.read.parquet(f"{tmp}/final")
    # the binlog and the working lake table are no longer needed; only the
    # final snapshot backs the returned DataFrame until exit
    shutil.rmtree(f"{tmp}/log", ignore_errors=True)
    shutil.rmtree(f"{tmp}/table", ignore_errors=True)
    shutil.rmtree(f"{tmp}/ckpt", ignore_errors=True)
    return out


def cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay doc_changes through the apply engine into a temp lake table;
    return the final live rows (url, warc_ts, seq, lang, text).

    The returned DataFrame reads from a session-scoped parquet snapshot
    (cleaned at interpreter exit) — the result never flows through the
    driver (a ``toPandas()`` here would collect the whole table, which at
    scale is a driver OOM, not a query result)."""
    return _cdc_replay_final(spark, sf_dir)


def cdc_final_state_audited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME replay with the write-audit-publish gate on every epoch:
    each commit is staged, audited (url format, order columns, html⇒text
    — operators/audit.page_envelope_audit), and published only on zero
    violations. Shares cdc_final_state's oracle — the gate must change
    NOTHING on clean traffic (and the replay asserts no epoch was
    rejected), which is exactly the property that makes it deployable as
    an always-on ingestion guard."""
    from data_migration_validation_spark.operators.audit import page_envelope_audit

    return _cdc_replay_final(
        spark, sf_dir, audit=page_envelope_audit(), prefix="dmv-cdcaud-"
    )


def cdc_final_state_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME replay through the group-commit path: ALL epochs in one
    shuffle + one atomic snapshot (CDCApplyEngine.apply_epoch_group, the
    backlog catch-up shape). Shares cdc_final_state's oracle — LWW over
    the union of the epochs must leave exactly the state the sequential
    per-epoch replay leaves."""
    return _cdc_replay_final(
        spark, sf_dir, prefix="dmv-cdcgrp-", group_size=1_000_000
    )


def cdc_final_state_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry for the plain, the write-audit-publish, AND the
    group-commit replay in one slot: the audited replay must change
    NOTHING on clean traffic and the grouped replay must converge to the
    same final table, cross-checked row-for-row in-plan, then the plain
    result goes to the shared LWW oracle. Collapsed from separate entries
    (round-4 verdict's sanctioned twin-merge) to keep the registry inside
    the driver's 50-query window."""
    from data_migration_validation_spark.queries_corpus import _assert_twin

    a = cdc_final_state(spark, sf_dir)
    b = cdc_final_state_audited(spark, sf_dir)
    _assert_twin(a, b, "cdc_final_state: plain vs write-audit-publish")
    c = cdc_final_state_grouped(spark, sf_dir)
    _assert_twin(a, c, "cdc_final_state: sequential vs group-commit replay")
    return a


def doc_changes_opmangled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_changes with a deterministic "bad producer" defect: every event
    with seq % 13 == 4 has its op code mangled (I→IX, U→UX, D→DX) — the
    classic unmapped-enum feed bug that dead-letters rows in production."""
    base = doc_changes(spark, sf_dir)
    return base.withColumn(
        "op",
        F.when(
            F.col("seq") % 13 == 4, F.concat(F.col("op"), F.lit("X"))
        ).otherwise(F.col("op")),
    )


def cdc_redrive_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine-redrive (DLQ reprocess) end-to-end, oracle-checked:
    replay the op-mangled feed (the bad rows dead-letter instead of
    applying), then redrive the quarantine with a fix that maps the op
    codes back, as one NEW epoch through the same exactly-once gate.
    The final table must equal the never-corrupted replay's — which is
    exactly ``cdc_final_state_oracle()`` — proving (a) nothing is lost
    to the DLQ round-trip and (b) redriven events merge under normal
    LWW order (a stale redriven event does not beat newer state)."""

    def post(engine, n_epochs):
        st = engine.redrive_quarantine(
            n_epochs,
            fix=lambda df: df.withColumn("op", F.regexp_replace("op", "X$", "")),
        )
        assert not st.rejected and not st.skipped
        assert st.events_seen > 0, "corruption never fired — test feed broken"
        assert st.quarantined == 0, "fix left rows uncured"
        assert engine.read_quarantine(pending_only=True) is None

    return _cdc_replay_final(
        spark,
        sf_dir,
        prefix="dmv-cdcrd-",
        changes=doc_changes_opmangled(spark, sf_dir),
        post=post,
    )


# -- content-novelty replay (plans/novelty.py) --------------------------------
#
# doc_changes has no cross-url content duplicates, so novelty is seeded:
# every doc_id % 9 ∈ {0, 3} document gets a late "mirror" INSERT under a
# new url — % 9 == 0 re-posts the original v0 content byte-for-byte (a
# crawler re-discovering the same page: MUST be dropped at ingest),
# % 9 == 3 posts novel content (MUST be admitted). 9 | doc_id ⇒ 3 | doc_id
# ⇒ the original is single-version, so its v0 really was admitted — the
# dup-mirror's fingerprint is genuinely in the index.


def doc_changes_with_mirrors(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = doc_changes(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    n_docs = _parquet_rows(f"{sf_dir}/documents.parquet")
    events_per_epoch = max(1, (3 * n_docs) // N_EPOCHS + 1)
    d = F.col("doc_id")
    sel = docs.where((d % 9 == 0) | (d % 9 == 3))
    body = F.when(d % 9 == 0, F.concat(F.col("text"), F.lit(" v0"))).otherwise(
        F.concat(F.col("text"), F.lit(" m0"))
    )
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>M"),
            d.cast("string"),
            F.lit("</title></head><body><p>"),
            body,
            F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )
    seq = F.lit(3 * n_docs) + d * 3  # strictly after every original event
    mirrors = sel.select(
        F.lit("I").alias("op"),
        F.concat(F.lit("https://mirror.example.com/doc/"), d.cast("string")).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(F.lit(36_000) + d % 60).cast("double"))
        ).alias("warc_ts"),
        seq.alias("seq"),
        F.struct(html.alias("html"), F.col("lang").alias("lang")).alias("payload"),
        (seq / events_per_epoch).cast("long").alias("batch_epoch"),
    )
    return base.unionByName(mirrors)


def cdc_novel_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship replay with the ingest-time content-novelty filter
    (bloom pre-pass + fingerprint-index exact check): mirror events that
    re-post already-ingested text never reach the table; novel mirrors
    land. The oracle recomputes admission as a global first-occurrence
    window over per-epoch LWW winners — the two must agree row-for-row,
    which pins the filter's exact semantics (not just its counts)."""
    return _cdc_replay_final(
        spark,
        sf_dir,
        prefix="dmv-cdcnov-",
        changes=doc_changes_with_mirrors(spark, sf_dir),
        engine_kwargs={"novelty_filter": True},
    )


def cdc_novel_state_oracle() -> str:
    # admission partitions on the TEXT itself — the engine's xxhash64
    # fingerprint is an equality proxy for it, so any divergence (hash
    # collision, wrong fingerprint column) shows up as a value mismatch
    return f"""
WITH exploded AS (
  SELECT doc_id, text, lang, source, v
  FROM documents, (SELECT unnest(generate_series(0, 2)) AS v) versions
  WHERE v <= doc_id % 3
),
changes AS (
  SELECT
    CASE WHEN v > 0 AND (doc_id + v) % 5 = 0 THEN 'D'
         WHEN v = 0 THEN 'I' ELSE 'U' END AS op,
    'https://' || source || '.example.com/doc/' || doc_id AS url,
    TIMESTAMP '2024-01-01 00:00:00' + (v*3600 + doc_id % 60) * INTERVAL 1 SECOND AS warc_ts,
    doc_id * 3 + (CASE WHEN doc_id % 7 = 0 THEN (doc_id % 3) - v ELSE v END) AS seq,
    lang AS p_lang,
    text || ' v' || v AS p_text
  FROM exploded
),
mirrors AS (
  SELECT 'I' AS op,
         'https://mirror.example.com/doc/' || doc_id AS url,
         TIMESTAMP '2024-01-01 00:00:00' + (36000 + doc_id % 60) * INTERVAL 1 SECOND AS warc_ts,
         (SELECT 3*count(*) FROM documents) + doc_id*3 AS seq,
         lang AS p_lang,
         text || CASE WHEN doc_id % 9 = 0 THEN ' v0' ELSE ' m0' END AS p_text
  FROM documents WHERE doc_id % 9 IN (0, 3)
),
stream AS (SELECT * FROM changes UNION ALL SELECT * FROM mirrors),
epochs AS (
  SELECT *, seq // (SELECT 3 * count(*) // {N_EPOCHS} + 1 FROM documents) AS epoch
  FROM stream
),
winners AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY url, epoch ORDER BY warc_ts DESC, seq DESC) AS rn
    FROM epochs) WHERE rn = 1
),
ups AS (SELECT * FROM winners WHERE op <> 'D'),
admitted AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY p_text ORDER BY epoch ASC, warc_ts ASC, seq ASC, url ASC) AS rf
    FROM ups) WHERE rf = 1
),
survivors AS (
  SELECT op, url, warc_ts, seq, p_lang, p_text FROM admitted
  UNION ALL
  SELECT op, url, warc_ts, seq, p_lang, p_text FROM winners WHERE op = 'D'
),
final AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, seq DESC) AS rn2
  FROM survivors
)
SELECT url, warc_ts, seq, p_lang AS lang, p_text AS text
FROM final WHERE rn2 = 1 AND op <> 'D'
"""


# -- near-duplicate novelty replay --------------------------------------------
#
# Mirrors for the MinHash-banded mode: % 9 == 0 re-posts a NEAR-duplicate
# (original v0 text + one appended token — exact hashing would miss it),
# % 9 == 3 posts the words REVERSED (shingle sets ~disjoint → genuinely
# novel). Same late-epoch placement as the exact-mode mirrors.


def doc_changes_with_near_mirrors(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = doc_changes(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    n_docs = _parquet_rows(f"{sf_dir}/documents.parquet")
    events_per_epoch = max(1, (3 * n_docs) // N_EPOCHS + 1)
    d = F.col("doc_id")
    sel = docs.where((d % 9 == 0) | (d % 9 == 3))
    reversed_words = F.array_join(F.reverse(F.split(F.trim(F.col("text")), " ")), " ")
    body = F.when(
        d % 9 == 0, F.concat(F.col("text"), F.lit(" v0 extra"))
    ).otherwise(F.concat(reversed_words, F.lit(" m0")))
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>M"),
            d.cast("string"),
            F.lit("</title></head><body><p>"),
            body,
            F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )
    seq = F.lit(3 * n_docs) + d * 3
    mirrors = sel.select(
        F.lit("I").alias("op"),
        F.concat(F.lit("https://mirror.example.com/doc/"), d.cast("string")).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(F.lit(36_000) + d % 60).cast("double"))
        ).alias("warc_ts"),
        seq.alias("seq"),
        F.struct(html.alias("html"), F.col("lang").alias("lang")).alias("payload"),
        (seq / events_per_epoch).cast("long").alias("batch_epoch"),
    )
    return base.unionByName(mirrors)


def cdc_novel_neardup_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The replay with NEAR-duplicate admission (novelty_filter="minhash"):
    a boilerplate variant of already-ingested text (one appended token)
    must be dropped; reversed-word content must land. The oracle
    recomputes admission as band-matching earlier-row pairs over the
    SAME MinHash pipeline (shared constant twins in functions/hashing),
    so signature math, banding, the integer similarity threshold, and
    the order rule are all value-checked."""
    return _cdc_replay_final(
        spark,
        sf_dir,
        prefix="dmv-cdcnd-",
        changes=doc_changes_with_near_mirrors(spark, sf_dir),
        engine_kwargs={"novelty_filter": "minhash"},
    )


def cdc_novel_neardup_state_oracle() -> str:
    from data_migration_validation_spark.functions import hashing as H

    num_perm, bands, shingle_k, sim_min = 8, 4, 3, 4  # engine defaults
    r = num_perm // bands
    toks = H.tokens_sql("p_text")
    shingles = H.shingles_from_tokens_sql(toks, k=shingle_k)
    hashes = H.hashes_from_shingles_sql(shingles)
    sig = H.minhash_signature_sql("hashes", num_perm)
    return f"""
WITH exploded AS (
  SELECT doc_id, text, lang, source, v
  FROM documents, (SELECT unnest(generate_series(0, 2)) AS v) versions
  WHERE v <= doc_id % 3
),
changes AS (
  SELECT
    CASE WHEN v > 0 AND (doc_id + v) % 5 = 0 THEN 'D'
         WHEN v = 0 THEN 'I' ELSE 'U' END AS op,
    'https://' || source || '.example.com/doc/' || doc_id AS url,
    TIMESTAMP '2024-01-01 00:00:00' + (v*3600 + doc_id % 60) * INTERVAL 1 SECOND AS warc_ts,
    doc_id * 3 + (CASE WHEN doc_id % 7 = 0 THEN (doc_id % 3) - v ELSE v END) AS seq,
    lang AS p_lang,
    text || ' v' || v AS p_text
  FROM exploded
),
mirrors AS (
  SELECT 'I' AS op,
         'https://mirror.example.com/doc/' || doc_id AS url,
         TIMESTAMP '2024-01-01 00:00:00' + (36000 + doc_id % 60) * INTERVAL 1 SECOND AS warc_ts,
         (SELECT 3*count(*) FROM documents) + doc_id*3 AS seq,
         lang AS p_lang,
         CASE WHEN doc_id % 9 = 0 THEN text || ' v0 extra'
              ELSE array_to_string(list_reverse(string_split(trim(text), ' ')), ' ') || ' m0'
         END AS p_text
  FROM documents WHERE doc_id % 9 IN (0, 3)
),
stream AS (SELECT * FROM changes UNION ALL SELECT * FROM mirrors),
epochs AS (
  SELECT *, seq // (SELECT 3 * count(*) // {N_EPOCHS} + 1 FROM documents) AS epoch
  FROM stream
),
winners AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY url, epoch ORDER BY warc_ts DESC, seq DESC) AS rn
    FROM epochs) WHERE rn = 1
),
ups AS (SELECT * FROM winners WHERE op <> 'D'),
exact_first AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY epoch, p_text ORDER BY warc_ts ASC, seq ASC, url ASC) AS er
    FROM ups) WHERE er = 1
),
hs AS (
  SELECT url, epoch, warc_ts, seq, {hashes} AS hashes FROM exact_first
),
sigs AS (SELECT url, epoch, warc_ts, seq, {sig} AS sig FROM hs),
bandrows AS (
  SELECT url, epoch, warc_ts, seq, sig, band_id,
         array_to_string(list_slice(sig, band_id*{r}+1, band_id*{r}+{r}), '-') AS band_key
  FROM sigs, (SELECT unnest(range({bands})) AS band_id)
),
dropped AS (
  SELECT DISTINCT l.url, l.epoch
  FROM bandrows e JOIN bandrows l
    ON e.band_id = l.band_id AND e.band_key = l.band_key
   AND (e.epoch, e.warc_ts, e.seq, e.url) < (l.epoch, l.warc_ts, l.seq, l.url)
  WHERE len([i for i in range(1, {num_perm}+1) if e.sig[i] = l.sig[i]]) >= {sim_min}
),
survivors AS (
  SELECT f.op, f.url, f.warc_ts, f.seq, f.p_lang, f.p_text
  FROM exact_first f ANTI JOIN dropped d ON f.url = d.url AND f.epoch = d.epoch
  UNION ALL
  SELECT op, url, warc_ts, seq, p_lang, p_text FROM winners WHERE op = 'D'
),
final AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, seq DESC) AS rn2
  FROM survivors
)
SELECT url, warc_ts, seq, p_lang AS lang, p_text AS text
FROM final WHERE rn2 = 1 AND op <> 'D'
"""


ASOF_EPOCH = 1  # mid-replay epoch the time-travel query reads back to


def cdc_state_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: replay ALL epochs (with mid-replay compaction), then
    read the table as it stood after epoch 1 — served from the retained
    snapshot history (`LakeTable.snapshot` + `version_asof_epoch`), not by
    re-replaying a prefix. Later epochs and the compaction that ran after
    them must not disturb the historical state; the oracle recomputes the
    same prefix LWW independently, so a manifest-history bug (wrong
    version choice, carried-forward file leakage, compaction clobbering
    old versions) shows up as a value mismatch."""
    from data_migration_validation_spark.plans.apply import CDCApplyEngine

    changes = doc_changes(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="dmv-asof-")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    changes.write.mode("overwrite").partitionBy("batch_epoch").parquet(f"{tmp}/log")
    log = spark.read.parquet(f"{tmp}/log")
    n_epochs = log.agg(F.max("batch_epoch")).collect()[0][0] + 1
    engine = CDCApplyEngine(
        spark,
        table_path=f"{tmp}/table",
        checkpoint_path=f"{tmp}/ckpt",
        num_buckets=16,
        compact_every=2,  # compaction fires between the as-of point and HEAD
    )
    for epoch in range(int(n_epochs)):
        engine.apply_epoch(log.where(F.col("batch_epoch") == epoch), epoch)
    asof = engine.read_asof(ASOF_EPOCH).select("url", "warc_ts", "seq", "lang", "text")
    asof.write.mode("overwrite").parquet(f"{tmp}/asof")
    out = spark.read.parquet(f"{tmp}/asof")
    shutil.rmtree(f"{tmp}/log", ignore_errors=True)
    shutil.rmtree(f"{tmp}/table", ignore_errors=True)
    shutil.rmtree(f"{tmp}/ckpt", ignore_errors=True)
    return out


def cdc_state_asof_oracle() -> str:
    # identical change derivation to cdc_final_state_oracle, LWW'd over the
    # epoch-<=1 PREFIX of the log only (batch_epoch = seq // events_per_epoch,
    # events_per_epoch = 3*n_docs // 4 + 1 — doc_changes:60)
    return f"""
WITH exploded AS (
  SELECT doc_id, text, lang, source, v
  FROM documents, (SELECT unnest(generate_series(0, 2)) AS v) versions
  WHERE v <= doc_id % 3
),
changes AS (
  SELECT
    CASE WHEN v > 0 AND (doc_id + v) % 5 = 0 THEN 'D'
         WHEN v = 0 THEN 'I' ELSE 'U' END AS op,
    'https://' || source || '.example.com/doc/' || doc_id AS url,
    TIMESTAMP '2024-01-01 00:00:00' + (v*3600 + doc_id % 60) * INTERVAL 1 SECOND AS warc_ts,
    doc_id * 3 + (CASE WHEN doc_id % 7 = 0 THEN (doc_id % 3) - v ELSE v END) AS seq,
    lang AS p_lang,
    text || ' v' || v AS p_text
  FROM exploded
),
prefix AS (
  SELECT * FROM changes
  WHERE seq // (SELECT 3 * count(*) // {N_EPOCHS} + 1 FROM documents) <= {ASOF_EPOCH}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, seq DESC) AS rn
  FROM prefix
)
SELECT url, warc_ts, seq,
       CASE WHEN op = 'D' THEN NULL ELSE p_lang END AS lang,
       CASE WHEN op = 'D' THEN NULL ELSE p_text END AS text
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


def cdc_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed: replay ALL epochs (with mid-replay compaction),
    then read the row-level changes from the table as of epoch 1 to HEAD
    (``CDCApplyEngine.read_changes`` — Delta-CDF-style insert / delete /
    update_preimage / update_postimage rows). Both endpoint states are
    served from manifest history and pruned to the buckets the later
    epochs actually touched; the oracle recomputes the same diff from two
    independent LWW prefixes of the log, so a wrong version choice, a
    missed touched bucket, or a misclassified change shows up as a
    mismatch."""
    from data_migration_validation_spark.plans.apply import CDCApplyEngine

    changes = doc_changes(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="dmv-cdf-")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    changes.write.mode("overwrite").partitionBy("batch_epoch").parquet(f"{tmp}/log")
    log = spark.read.parquet(f"{tmp}/log")
    n_epochs = log.agg(F.max("batch_epoch")).collect()[0][0] + 1
    engine = CDCApplyEngine(
        spark,
        table_path=f"{tmp}/table",
        checkpoint_path=f"{tmp}/ckpt",
        num_buckets=16,
        compact_every=2,  # compaction commits sit inside the CDF range
    )
    for epoch in range(int(n_epochs)):
        engine.apply_epoch(log.where(F.col("batch_epoch") == epoch), epoch)
    feed = engine.read_changes(from_epoch=ASOF_EPOCH).select(
        "url", "warc_ts", "seq", "lang", "text", "_change_type"
    )
    feed.write.mode("overwrite").parquet(f"{tmp}/feed")
    out = spark.read.parquet(f"{tmp}/feed")
    shutil.rmtree(f"{tmp}/log", ignore_errors=True)
    shutil.rmtree(f"{tmp}/table", ignore_errors=True)
    shutil.rmtree(f"{tmp}/ckpt", ignore_errors=True)
    return out


def cdc_changes_oracle() -> str:
    # same change derivation as cdc_final_state_oracle; the feed is the
    # live-state diff between the epoch-<=ASOF_EPOCH prefix LWW and the
    # full-log LWW. Any change bumps seq, so comparing the projected
    # columns is equivalent to comparing whole rows.
    return f"""
WITH exploded AS (
  SELECT doc_id, text, lang, source, v
  FROM documents, (SELECT unnest(generate_series(0, 2)) AS v) versions
  WHERE v <= doc_id % 3
),
changes AS (
  SELECT
    CASE WHEN v > 0 AND (doc_id + v) % 5 = 0 THEN 'D'
         WHEN v = 0 THEN 'I' ELSE 'U' END AS op,
    'https://' || source || '.example.com/doc/' || doc_id AS url,
    TIMESTAMP '2024-01-01 00:00:00' + (v*3600 + doc_id % 60) * INTERVAL 1 SECOND AS warc_ts,
    doc_id * 3 + (CASE WHEN doc_id % 7 = 0 THEN (doc_id % 3) - v ELSE v END) AS seq,
    lang AS p_lang,
    text || ' v' || v AS p_text
  FROM exploded
),
state_old AS (
  SELECT url, warc_ts, seq,
         CASE WHEN op = 'D' THEN NULL ELSE p_lang END AS lang,
         CASE WHEN op = 'D' THEN NULL ELSE p_text END AS text, op
  FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, seq DESC) AS rn
    FROM changes
    WHERE seq // (SELECT 3 * count(*) // {N_EPOCHS} + 1 FROM documents) <= {ASOF_EPOCH}
  ) WHERE rn = 1 AND op <> 'D'
),
state_new AS (
  SELECT url, warc_ts, seq,
         CASE WHEN op = 'D' THEN NULL ELSE p_lang END AS lang,
         CASE WHEN op = 'D' THEN NULL ELSE p_text END AS text, op
  FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, seq DESC) AS rn
    FROM changes
  ) WHERE rn = 1 AND op <> 'D'
)
SELECT n.url, n.warc_ts, n.seq, n.lang, n.text, 'insert' AS _change_type
FROM state_new n LEFT JOIN state_old o USING (url) WHERE o.url IS NULL
UNION ALL
SELECT o.url, o.warc_ts, o.seq, o.lang, o.text, 'delete'
FROM state_old o LEFT JOIN state_new n USING (url) WHERE n.url IS NULL
UNION ALL
SELECT o.url, o.warc_ts, o.seq, o.lang, o.text, 'update_preimage'
FROM state_old o JOIN state_new n USING (url) WHERE o.seq <> n.seq
UNION ALL
SELECT n.url, n.warc_ts, n.seq, n.lang, n.text, 'update_postimage'
FROM state_old o JOIN state_new n USING (url) WHERE o.seq <> n.seq
"""


def cdc_envelope_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium envelope round-trip: build deterministic Debezium-style
    JSON change envelopes from the documents table (each engine serializes
    with its own JSON builder), parse them with the connector
    (``sources/debezium.parse_debezium`` — one ``from_json``, expression
    only), and return the normalized event stream. The oracle builds the
    same envelopes with DuckDB ``json_object`` and extracts with
    ``json_extract``, so op mapping (c/r→I, u→U, d→D), before/after key
    fallback, ts_ms→timestamp, and lsn→seq all cross-check."""
    from data_migration_validation_spark.sources.debezium import parse_debezium

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    op_raw = F.element_at(F.array(F.lit("d"), F.lit("c"), F.lit("u"), F.lit("r")), (d % 4 + 1).cast("int"))
    url = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"), d.cast("string"))
    row = F.struct(url.alias("url"), F.col("lang").alias("lang"), F.col("text").alias("text"))
    ts_ms = (F.lit(1704067200000) + d * 1000).cast("long")
    env = F.to_json(
        F.struct(
            F.struct(
                F.when(op_raw == "d", row).alias("before"),
                F.when(op_raw != "d", row).alias("after"),
                F.struct(ts_ms.alias("ts_ms"), (d * 10).cast("long").alias("lsn"), F.lit("documents").alias("table")).alias("source"),
                op_raw.alias("op"),
                ts_ms.alias("ts_ms"),
            ).alias("payload")
        )
    )
    parsed = parse_debezium(docs.select(env.alias("value")))
    return parsed.select(
        "op", "url", "warc_ts", "seq",
        F.col("payload.lang").alias("lang"),
        F.col("payload.text").alias("text"),
    )


def cdc_patch_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patch-merge fold (sparse CDC events): derive a deterministic
    sparse-event stream from the documents table — inserts carry the full
    image, updates patch ONLY lang (odd versions) or ONLY text (even
    versions), deletes are barriers — and fold it with
    ``operators/patch.patch_fold`` (per-column LWW bounded by the last
    full-image barrier, one shuffle, expression-only). The oracle
    recomputes the same semantics with filtered ``arg_max`` in DuckDB, so
    barrier logic (no leak through deletes, insert resets, upsert-by-
    patch after a delete) cross-checks value-for-value."""
    from data_migration_validation_spark.operators.patch import patch_fold

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    nv = d % 3 + 1
    exploded = docs.select(
        "doc_id", "text", "lang", "source",
        F.explode(F.sequence(F.lit(0), nv - 1)).alias("v"),
    )
    d, v = F.col("doc_id"), F.col("v")
    is_del = (v > 0) & ((d + v) % 5 == 0)
    op = F.when(is_del, F.lit("D")).when(v == 0, F.lit("I")).otherwise(F.lit("U"))
    lang_p = (
        F.when(is_del, F.lit(None).cast("string"))
        .when(v == 0, F.col("lang"))
        .when(v % 2 == 1, F.concat(F.col("lang"), F.lit("_v"), v.cast("string")))
    )
    text_p = (
        F.when(is_del, F.lit(None).cast("string"))
        .when(v == 0, F.concat(F.col("text"), F.lit(" v0")))
        .when(v % 2 == 0, F.concat(F.col("text"), F.lit(" v"), v.cast("string")))
    )
    events = exploded.select(
        op.alias("op"),
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"), d.cast("string")).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(v * 3600 + d % 60).cast("double"))
        ).alias("warc_ts"),
        (d * 3 + v).alias("seq"),
        lang_p.alias("lang"),
        text_p.alias("text"),
    )
    return patch_fold(events).select("url", "warc_ts", "seq", "lang", "text")


def cdc_patch_state_oracle() -> str:
    return """
WITH exploded AS (
  SELECT doc_id, text, lang, source, v
  FROM documents, (SELECT unnest(generate_series(0, 2)) AS v) versions
  WHERE v <= doc_id % 3
),
ev AS (
  SELECT
    CASE WHEN v > 0 AND (doc_id + v) % 5 = 0 THEN 'D'
         WHEN v = 0 THEN 'I' ELSE 'U' END AS op,
    'https://' || source || '.example.com/doc/' || doc_id AS url,
    TIMESTAMP '2024-01-01 00:00:00' + (v*3600 + doc_id % 60) * INTERVAL 1 SECOND AS warc_ts,
    doc_id * 3 + v AS seq,
    CASE WHEN v > 0 AND (doc_id + v) % 5 = 0 THEN NULL
         WHEN v = 0 THEN lang
         WHEN v % 2 = 1 THEN lang || '_v' || v END AS lang,
    CASE WHEN v > 0 AND (doc_id + v) % 5 = 0 THEN NULL
         WHEN v = 0 THEN text || ' v0'
         WHEN v % 2 = 0 THEN text || ' v' || v END AS text
  FROM exploded
),
bar AS (
  SELECT url,
         max(warc_ts) FILTER (WHERE op IN ('I','D')) AS b_ts,
         arg_max(op, warc_ts) FILTER (WHERE op IN ('I','D')) AS b_op,
         arg_max(op, warc_ts) AS last_op,
         max(warc_ts) AS last_ts,
         arg_max(seq, warc_ts) AS last_seq
  FROM ev GROUP BY url
),
st AS (
  SELECT e.url,
         arg_max(e.lang, e.warc_ts) FILTER (WHERE e.lang IS NOT NULL AND
           (b.b_ts IS NULL OR e.warc_ts > b.b_ts OR (e.warc_ts = b.b_ts AND b.b_op <> 'D'))) AS lang,
         arg_max(e.text, e.warc_ts) FILTER (WHERE e.text IS NOT NULL AND
           (b.b_ts IS NULL OR e.warc_ts > b.b_ts OR (e.warc_ts = b.b_ts AND b.b_op <> 'D'))) AS text
  FROM ev e LEFT JOIN bar b USING (url) GROUP BY e.url
)
SELECT b.url, b.last_ts AS warc_ts, b.last_seq AS seq, st.lang, st.text
FROM st JOIN bar b USING (url) WHERE b.last_op <> 'D'
"""


def cdc_envelope_parse_oracle() -> str:
    return """
WITH src AS (
  SELECT doc_id,
         'https://' || source || '.example.com/doc/' || doc_id AS url,
         lang, text,
         ['d','c','u','r'][doc_id % 4 + 1] AS opr,
         1704067200000 + doc_id * 1000 AS ts_ms,
         doc_id * 10 AS lsn
  FROM documents
),
env AS (
  SELECT json_object(
    'payload', json_object(
      'before', CASE WHEN opr = 'd' THEN json_object('url', url, 'lang', lang, 'text', text) END,
      'after',  CASE WHEN opr <> 'd' THEN json_object('url', url, 'lang', lang, 'text', text) END,
      'source', json_object('ts_ms', ts_ms, 'lsn', lsn, 'table', 'documents'),
      'op', opr, 'ts_ms', ts_ms)
  ) AS v FROM src
)
SELECT
  CASE json_extract_string(v, '$.payload.op')
    WHEN 'c' THEN 'I' WHEN 'r' THEN 'I' WHEN 'u' THEN 'U' ELSE 'D' END AS op,
  coalesce(json_extract_string(v, '$.payload.after.url'),
           json_extract_string(v, '$.payload.before.url')) AS url,
  make_timestamp(CAST(json_extract(v, '$.payload.source.ts_ms') AS BIGINT) * 1000) AS warc_ts,
  CAST(json_extract(v, '$.payload.source.lsn') AS BIGINT) AS seq,
  CASE WHEN json_extract_string(v, '$.payload.op') = 'd' THEN NULL
       ELSE json_extract_string(v, '$.payload.after.lang') END AS lang,
  CASE WHEN json_extract_string(v, '$.payload.op') = 'd' THEN NULL
       ELSE json_extract_string(v, '$.payload.after.text') END AS text
FROM env
"""


def cdc_final_state_oracle() -> str:
    return f"""
WITH exploded AS (
  SELECT doc_id, text, lang, source, v
  FROM documents, (SELECT unnest(generate_series(0, 2)) AS v) versions
  WHERE v <= doc_id % 3
),
changes AS (
  SELECT
    CASE WHEN v > 0 AND (doc_id + v) % 5 = 0 THEN 'D'
         WHEN v = 0 THEN 'I' ELSE 'U' END AS op,
    'https://' || source || '.example.com/doc/' || doc_id AS url,
    TIMESTAMP '2024-01-01 00:00:00' + (v*3600 + doc_id % 60) * INTERVAL 1 SECOND AS warc_ts,
    doc_id * 3 + (CASE WHEN doc_id % 7 = 0 THEN (doc_id % 3) - v ELSE v END) AS seq,
    lang AS p_lang,
    text || ' v' || v AS p_text
  FROM exploded
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, seq DESC) AS rn
  FROM changes
)
SELECT url, warc_ts, seq,
       CASE WHEN op = 'D' THEN NULL ELSE p_lang END AS lang,
       CASE WHEN op = 'D' THEN NULL ELSE p_text END AS text
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


# ---------------------------------------------------------------------------
# LWW snapshot over the driver `events` table (pure window dedup)
# ---------------------------------------------------------------------------

def lww_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user: the engine's core LWW primitive expressed on
    the driver's events table (order ts desc, event_id desc)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


def lww_events_oracle() -> str:
    return """
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def windowed_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup over the events table — the batch twin of
    the streaming `windowed_ingest_stats` (streaming/aggregates.py), so
    the window semantics the watermark test exercises are also
    oracle-checked against SQL `time_bucket`."""
    from data_migration_validation_spark.streaming.aggregates import (
        windowed_event_stats as _wes,
    )

    return _wes(_t(spark, sf_dir, "events"))


def windowed_event_stats_oracle() -> str:
    return """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def session_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session rollup (30-minute inactivity gap) via Spark's
    merging ``session_window``; the oracle is the classic gaps-and-islands
    SQL, proving the built-in's merge semantics bit-for-bit."""
    from data_migration_validation_spark.streaming.aggregates import (
        session_event_stats as _ses,
    )

    return _ses(_t(spark, sf_dir, "events"))


def session_event_stats_oracle() -> str:
    return """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   < INTERVAL 30 MINUTE
              THEN 0 ELSE 1 END AS new_sess
  FROM events
), sess AS (
  SELECT *, sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
         ) AS sid
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM sess GROUP BY user_id, sid
"""


def evt_asof_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event picks up the user's most recent
    PRIOR non-purchase event (their "state" at purchase time). Spark has
    no native as-of join — operators/asof.py implements the union-merge
    window shape (one shuffle, no range-join blowup); DuckDB's native
    ASOF JOIN is the oracle."""
    from data_migration_validation_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    facts = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    dim = ev.where(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    # as-of precondition: at most one version per (key, ts) — LWW on event_id
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    dim = dim.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
    return asof_join(facts, dim, key="user_id", ts="ts", how="inner")


def evt_asof_user_state_oracle() -> str:
    return """
WITH facts AS (
  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
),
dim AS (
  SELECT user_id, ts, event_id, event_type, value
  FROM (
    SELECT *, row_number() OVER (
             PARTITION BY user_id, ts ORDER BY event_id DESC
           ) AS rn
    FROM events WHERE event_type <> 'purchase'
  ) WHERE rn = 1
)
SELECT f.user_id, f.ts, f.event_id, f.value,
       d.ts AS ts_dim, d.event_id AS event_id_dim,
       d.event_type AS event_type, d.value AS value_dim
FROM facts f ASOF JOIN dim d
  ON f.user_id = d.user_id AND f.ts >= d.ts
"""


def evt_range_after_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: purchases that happened within 30 minutes
    AFTER an error by the same user. operators/range_join.py implements
    the bucketed-overlap shape (equi-join on (key, time-bucket), exact
    predicate on survivors) — no per-key cartesian; DuckDB's plain
    BETWEEN range join is the oracle."""
    from data_migration_validation_spark.operators.range_join import range_join

    ev = _t(spark, sf_dir, "events")
    facts = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    intervals = ev.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("err_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("err_end"),
        F.col("event_id").alias("err_id"),
    )
    return range_join(
        facts,
        intervals,
        key="user_id",
        ts="ts",
        start="err_start",
        end="err_end",
        granularity="30 minutes",
    )


def evt_range_after_error_oracle() -> str:
    return """
SELECT p.user_id, p.ts, p.event_id, p.value,
       e.ts AS err_start, e.ts + INTERVAL 30 MINUTE AS err_end,
       e.event_id AS err_id
FROM events p JOIN events e
  ON p.user_id = e.user_id
 AND p.event_type = 'purchase' AND e.event_type = 'error'
 AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 30 MINUTE
"""


def rollup_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous rollup (hypertable continuous-aggregate shape): split
    the events table into 4 hash epochs, maintain a daily
    (window, event_type) rollup INCREMENTALLY — each epoch commits only
    its own partial aggregates, a mid-stream compact() folds them — and
    read the merged result. The oracle aggregates all events in one SQL
    GROUP BY: the match proves the epoch-partial monoid merge equals the
    batch aggregate regardless of split, replay, or compaction
    (plans/rollup.py)."""
    from data_migration_validation_spark.plans.rollup import (
        ContinuousRollup,
        RollupSpec,
    )

    ev = _t(spark, sf_dir, "events").withColumn(
        "_epoch", F.pmod(F.xxhash64("event_id"), F.lit(4)).cast("int")
    )
    tmp = tempfile.mkdtemp(prefix="dmv-rollup-")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    rollup = ContinuousRollup(
        spark,
        f"{tmp}/rollup",
        RollupSpec(ts_col="ts", window="1 day", dims=("event_type",), sums={"sum_value": "value"}),
    )
    for epoch in range(4):
        rollup.apply_epoch(ev.where(F.col("_epoch") == epoch).drop("_epoch"), epoch)
        if epoch == 2:  # merged read must be invariant through compaction
            rollup.compact()
    merged = rollup.read().withColumn("sum_value", F.round("sum_value", 4))
    merged.write.mode("overwrite").parquet(f"{tmp}/merged")
    return spark.read.parquet(f"{tmp}/merged")


def rollup_event_stats_oracle() -> str:
    return """
SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start,
       time_bucket(INTERVAL 1 DAY, ts) + INTERVAL 1 DAY AS window_end,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Validation operator queries (SURVEY.md §2 O4–O11) over the derived
# customer OLD/NEW snapshot pair (snapshots.py — same derivation in SQL)
# ---------------------------------------------------------------------------

from data_migration_validation_spark.snapshots import (  # noqa: E402
    ALLOWED_ADDITIONS_SQL,
    ALLOWED_DELETIONS_SQL,
    SNAPSHOT_CTES,
    allowed_additions,
    allowed_deletions,
    new_customers,
    old_customers,
)


def _val_cfg(spark: SparkSession, sf_dir: str):
    from data_migration_validation_spark.operators.validation import ValidationConfig

    return ValidationConfig(
        primary_key="c_custkey",
        required_fields=["c_mktsegment", "c_name"],
        compare_columns=["c_name", "c_acctbal", "c_mktsegment"],
        allowed_deletions=allowed_deletions(spark, sf_dir),
        allowed_additions=allowed_additions(spark, sf_dir),
    )


def val_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_migration_validation_spark.operators.validation import row_counts

    return row_counts(
        old_customers(spark, sf_dir), new_customers(spark, sf_dir), _val_cfg(spark, sf_dir)
    )


def _canon_bal(df: DataFrame) -> DataFrame:
    """Canonicalize the decimal column for the driver's value-hash compare:
    Spark surfaces decimal(12,2) as Decimal('-144.80') while DuckDB's
    result API yields float -144.8, so raw-row queries render it as a
    string (identical '-144.80' on both engines)."""
    return df.withColumn("c_acctbal", F.col("c_acctbal").cast("string"))


def val_only_in_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_migration_validation_spark.operators.validation import only_in_old

    return _canon_bal(
        only_in_old(
            old_customers(spark, sf_dir), new_customers(spark, sf_dir), _val_cfg(spark, sf_dir)
        )
    )


def val_only_in_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_migration_validation_spark.operators.validation import only_in_new

    return _canon_bal(
        only_in_new(
            old_customers(spark, sf_dir), new_customers(spark, sf_dir), _val_cfg(spark, sf_dir)
        )
    )


def val_cell_mismatches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_migration_validation_spark.operators.validation import cell_mismatches

    return cell_mismatches(
        old_customers(spark, sf_dir), new_customers(spark, sf_dir), _val_cfg(spark, sf_dir)
    )


def val_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_migration_validation_spark.operators.validation import duplicate_rows

    return _canon_bal(duplicate_rows(new_customers(spark, sf_dir), "c_custkey"))


def val_rekeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_migration_validation_spark.operators.validation import possible_rekeys

    return possible_rekeys(
        old_customers(spark, sf_dir),
        new_customers(spark, sf_dir),
        _val_cfg(spark, sf_dir),
        attr="c_name",
    )


def val_null_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_migration_validation_spark.operators.validation import null_summary

    return null_summary(
        old_customers(spark, sf_dir), new_customers(spark, sf_dir), _val_cfg(spark, sf_dir)
    )


def val_format_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_migration_validation_spark.operators.validation import format_violations

    old = old_customers(spark, sf_dir).withColumn(
        "email",
        F.concat(
            F.lit("user"),
            F.col("c_custkey").cast("string"),
            F.when(F.col("c_custkey") % 29 == 6, F.lit("_at_example.com")).otherwise(
                F.lit("@example.com")
            ),
        ),
    )
    return format_violations(old, "c_custkey", {"email": "email_format"})


def val_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler over the NEW snapshot — counts, nulls,
    distincts, min/max, mean/median per column in ONE aggregation job
    (operators/validation.py:column_profile)."""
    from data_migration_validation_spark.operators.validation import column_profile

    return column_profile(new_customers(spark, sf_dir))


def _profile_col_sql(c: str, numeric: bool) -> str:
    mean = f"round(avg(CAST({c} AS DOUBLE)), 4)" if numeric else "CAST(NULL AS DOUBLE)"
    med = (
        f"round(quantile_cont(CAST({c} AS DOUBLE), 0.5), 4)"
        if numeric
        else "CAST(NULL AS DOUBLE)"
    )
    return f"""
SELECT '{c}' AS "column", count(*) AS n_rows,
       count(*) - count({c}) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_value,
       CAST(max({c}) AS VARCHAR) AS max_value,
       {mean} AS mean, {med} AS median
FROM new_snap"""


def val_column_profile_oracle() -> str:
    parts = [
        _profile_col_sql(c, num)
        for c, num in [
            ("c_custkey", True),
            ("c_name", False),
            ("c_nationkey", True),
            ("c_acctbal", True),
            ("c_mktsegment", False),
        ]
    ]
    return SNAPSHOT_CTES + " UNION ALL ".join(parts)


DRIFT_COLS = ["c_acctbal", "c_nationkey"]
DRIFT_BINS = 10


def val_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift OLD→NEW per (column, bin): histogram counts +
    PSI terms over the balance (seeded +100 edits shift it) and nationkey
    (unchanged — control) columns. The defect class row validators miss:
    every row individually plausible, the population shifted."""
    from data_migration_validation_spark.operators.validation import distribution_drift

    return distribution_drift(
        old_customers(spark, sf_dir),
        new_customers(spark, sf_dir),
        DRIFT_COLS,
        n_bins=DRIFT_BINS,
    )


def val_drift_psi_oracle() -> str:
    melt_old = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS DOUBLE) AS v FROM old_snap" for c in DRIFT_COLS
    )
    melt_new = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS DOUBLE) AS v FROM new_snap" for c in DRIFT_COLS
    )
    smooth = 0.5 * (DRIFT_BINS + 1)  # +0.5 per bin incl. the null bin
    bin_case = f"""CASE WHEN v IS NULL THEN -1
           WHEN hi = lo THEN 0
           ELSE least({DRIFT_BINS - 1}, greatest(0,
                CAST(floor((v - lo) / ((hi - lo) / {DRIFT_BINS})) AS BIGINT))) END"""
    po = f"(old_count + 0.5) / (sum(old_count) OVER (PARTITION BY col) + {smooth})"
    pn = f"(new_count + 0.5) / (sum(new_count) OVER (PARTITION BY col) + {smooth})"
    return f"""{SNAPSHOT_CTES},
old_m AS ({melt_old}),
new_m AS ({melt_new}),
bounds AS (SELECT col, min(v) AS lo, max(v) AS hi FROM old_m GROUP BY col),
ob AS (SELECT m.col, {bin_case} AS bin FROM old_m m JOIN bounds USING (col)),
nb AS (SELECT m.col, {bin_case} AS bin FROM new_m m JOIN bounds USING (col)),
oc AS (SELECT col, bin, count(*) AS old_count FROM ob GROUP BY col, bin),
nc AS (SELECT col, bin, count(*) AS new_count FROM nb GROUP BY col, bin),
counts AS (
  SELECT coalesce(oc.col, nc.col) AS col, coalesce(oc.bin, nc.bin) AS bin,
         coalesce(old_count, 0) AS old_count, coalesce(new_count, 0) AS new_count
  FROM oc FULL OUTER JOIN nc ON oc.col = nc.col AND oc.bin = nc.bin
)
SELECT col AS "column", CAST(bin AS INT) AS bin, old_count, new_count,
       round((({pn}) - ({po})) * ln(({pn}) / ({po})), 6) AS psi_term
FROM counts
"""


def _drifted_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW snapshot with schema drift for O7: gains `email`, loses
    `c_nationkey` — the additive-column + dropped-column shape the
    schema-registry merge handles at ingest."""
    return (
        new_customers(spark, sf_dir)
        .withColumn("email", F.concat(F.lit("user"), F.col("c_custkey").cast("string")))
        .drop("c_nationkey")
    )


def val_schema_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_migration_validation_spark.operators.validation import schema_comparison

    return schema_comparison(old_customers(spark, sf_dir), _drifted_new(spark, sf_dir))


def val_signoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O12: cell mismatches annotated with the broadcast sign-off overlay.
    Verified pairs derived from data (even keys with the seeded name edit),
    so the oracle reproduces them in closed form."""
    from data_migration_validation_spark.operators.validation import (
        apply_signoff,
        cell_mismatches,
    )

    old = old_customers(spark, sf_dir)
    findings = cell_mismatches(old, new_customers(spark, sf_dir), _val_cfg(spark, sf_dir))
    pairs = old.where("c_custkey % 13 = 1 AND c_custkey % 2 = 0").select(
        "c_custkey", F.lit("c_name").alias("_ver_col")
    )
    return apply_signoff(findings, pairs, "c_custkey")


def val_proof_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13: sorted+capped proof slice of the mismatch findings. The
    composite (pk, column) order is total, so the top-100 set is
    deterministic and oracle-comparable."""
    from data_migration_validation_spark.operators.validation import (
        cell_mismatches,
        proof,
    )

    m = cell_mismatches(
        old_customers(spark, sf_dir), new_customers(spark, sf_dir), _val_cfg(spark, sf_dir)
    )
    return proof(m, ["c_custkey", "column"], limit=100)


def val_check_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_migration_validation_spark.operators.validation import check_summary

    return check_summary(
        old_customers(spark, sf_dir), new_customers(spark, sf_dir), _val_cfg(spark, sf_dir)
    )


def reconcile_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star reconciliation operator: cogroup-based keyed diff of the
    OLD/NEW snapshots (membership + dup keys + byte-exact cell compare in
    Arrow batches)."""
    from data_migration_validation_spark.operators.reconcile import cogroup_reconcile

    # key cast to string up front: the diff schema renders keys as strings
    return cogroup_reconcile(
        old_customers(spark, sf_dir).withColumn("c_custkey", F.col("c_custkey").cast("string")),
        new_customers(spark, sf_dir).withColumn("c_custkey", F.col("c_custkey").cast("string")),
        key="c_custkey",
    )


_VAL_ORACLES = {
    "val_row_counts": f"""{SNAPSHOT_CTES}
SELECT * FROM (
  SELECT 'OLD' AS dataset, count(*) AS raw_count,
         CAST(coalesce(sum(CASE WHEN {ALLOWED_DELETIONS_SQL} THEN 1 ELSE 0 END), 0) AS BIGINT) AS allowlisted_ids,
         count(*) - CAST(coalesce(sum(CASE WHEN {ALLOWED_DELETIONS_SQL} THEN 1 ELSE 0 END), 0) AS BIGINT) AS adjusted_count
  FROM old_snap
  UNION ALL
  SELECT 'NEW', count(*),
         CAST(coalesce(sum(CASE WHEN {ALLOWED_ADDITIONS_SQL} THEN 1 ELSE 0 END), 0) AS BIGINT),
         count(*) - CAST(coalesce(sum(CASE WHEN {ALLOWED_ADDITIONS_SQL} THEN 1 ELSE 0 END), 0) AS BIGINT)
  FROM new_snap
)
""",
    "val_only_in_old": f"""{SNAPSHOT_CTES}
SELECT c_custkey, c_name, c_nationkey, CAST(c_acctbal AS VARCHAR) AS c_acctbal, c_mktsegment
FROM old_snap
WHERE c_custkey NOT IN (SELECT c_custkey FROM new_snap)
  AND NOT {ALLOWED_DELETIONS_SQL}
""",
    "val_only_in_new": f"""{SNAPSHOT_CTES}
SELECT c_custkey, c_name, c_nationkey, CAST(c_acctbal AS VARCHAR) AS c_acctbal, c_mktsegment
FROM new_snap
WHERE c_custkey NOT IN (SELECT c_custkey FROM old_snap)
  AND NOT {ALLOWED_ADDITIONS_SQL}
""",
    "val_cell_mismatches": f"""{SNAPSHOT_CTES},
joined AS (
  SELECT o.c_custkey,
         o.c_name AS o_name, n.c_name AS n_name,
         o.c_acctbal AS o_bal, n.c_acctbal AS n_bal,
         o.c_mktsegment AS o_seg, n.c_mktsegment AS n_seg
  FROM old_snap o JOIN new_snap n USING (c_custkey)
)
SELECT c_custkey, 'c_name' AS column, CAST(o_name AS VARCHAR) AS old_value, CAST(n_name AS VARCHAR) AS new_value
FROM joined WHERE o_name IS DISTINCT FROM n_name
UNION ALL
SELECT c_custkey, 'c_acctbal', CAST(o_bal AS VARCHAR), CAST(n_bal AS VARCHAR)
FROM joined WHERE o_bal IS DISTINCT FROM n_bal
UNION ALL
SELECT c_custkey, 'c_mktsegment', CAST(o_seg AS VARCHAR), CAST(n_seg AS VARCHAR)
FROM joined WHERE o_seg IS DISTINCT FROM n_seg
""",
    "val_duplicates": f"""{SNAPSHOT_CTES}
SELECT c_custkey, c_name, c_nationkey, CAST(c_acctbal AS VARCHAR) AS c_acctbal, c_mktsegment
FROM new_snap
QUALIFY count(*) OVER (PARTITION BY c_custkey) > 1
""",
    "val_rekeys": f"""{SNAPSHOT_CTES}
SELECT o.c_name, o.c_custkey AS old_pk, n.c_custkey AS new_pk
FROM old_snap o JOIN new_snap n ON o.c_name = n.c_name
WHERE o.c_custkey <> n.c_custkey AND o.c_name IS NOT NULL
""",
    "val_null_summary": f"""{SNAPSHOT_CTES}
SELECT 'c_mktsegment' AS field,
       CAST((SELECT count(*) FROM old_snap WHERE c_mktsegment IS NULL) AS VARCHAR) AS old_nulls,
       CAST((SELECT count(*) FROM new_snap WHERE c_mktsegment IS NULL) AS VARCHAR) AS new_nulls
UNION ALL
SELECT 'c_name',
       CAST((SELECT count(*) FROM old_snap WHERE c_name IS NULL) AS VARCHAR),
       CAST((SELECT count(*) FROM new_snap WHERE c_name IS NULL) AS VARCHAR)
""",
    "val_format_violations": f"""{SNAPSHOT_CTES},
with_email AS (
  SELECT c_custkey,
         'user' || c_custkey || (CASE WHEN c_custkey % 29 = 6 THEN '_at_example.com' ELSE '@example.com' END) AS email
  FROM old_snap
)
SELECT c_custkey, 'email' AS column, email AS value, 'email_format' AS rule
FROM with_email
WHERE NOT regexp_matches(email, '\\S+@\\S+\\.\\S+')
""",
    # O7 is a metadata operator: output depends only on the (scale-invariant)
    # table schemas, so the oracle is the expected literal relation.
    "val_schema_comparison": """
SELECT * FROM (VALUES
  ('c_acctbal',    true,  true,  'decimal(12,2)', 'decimal(12,2)'),
  ('c_custkey',    true,  true,  'bigint',        'bigint'),
  ('c_mktsegment', true,  true,  'string',        'string'),
  ('c_name',       true,  true,  'string',        'string'),
  ('c_nationkey',  true,  false, 'int',           ''),
  ('email',        false, true,  '',              'string')
) AS t("column", present_in_old, present_in_new, dtype_old, dtype_new)
""",
    "val_signoff": f"""{SNAPSHOT_CTES},
joined AS (
  SELECT o.c_custkey,
         o.c_name AS o_name, n.c_name AS n_name,
         o.c_acctbal AS o_bal, n.c_acctbal AS n_bal,
         o.c_mktsegment AS o_seg, n.c_mktsegment AS n_seg
  FROM old_snap o JOIN new_snap n USING (c_custkey)
),
m AS (
  SELECT c_custkey, 'c_name' AS column, CAST(o_name AS VARCHAR) AS old_value, CAST(n_name AS VARCHAR) AS new_value
  FROM joined WHERE o_name IS DISTINCT FROM n_name
  UNION ALL
  SELECT c_custkey, 'c_acctbal', CAST(o_bal AS VARCHAR), CAST(n_bal AS VARCHAR)
  FROM joined WHERE o_bal IS DISTINCT FROM n_bal
  UNION ALL
  SELECT c_custkey, 'c_mktsegment', CAST(o_seg AS VARCHAR), CAST(n_seg AS VARCHAR)
  FROM joined WHERE o_seg IS DISTINCT FROM n_seg
)
SELECT c_custkey, "column", old_value, new_value,
       ("column" = 'c_name' AND c_custkey % 13 = 1 AND c_custkey % 2 = 0) AS verified
FROM m
""",
    "val_proof_topk": f"""{SNAPSHOT_CTES},
joined AS (
  SELECT o.c_custkey,
         o.c_name AS o_name, n.c_name AS n_name,
         o.c_acctbal AS o_bal, n.c_acctbal AS n_bal,
         o.c_mktsegment AS o_seg, n.c_mktsegment AS n_seg
  FROM old_snap o JOIN new_snap n USING (c_custkey)
),
m AS (
  SELECT c_custkey, 'c_name' AS column, CAST(o_name AS VARCHAR) AS old_value, CAST(n_name AS VARCHAR) AS new_value
  FROM joined WHERE o_name IS DISTINCT FROM n_name
  UNION ALL
  SELECT c_custkey, 'c_acctbal', CAST(o_bal AS VARCHAR), CAST(n_bal AS VARCHAR)
  FROM joined WHERE o_bal IS DISTINCT FROM n_bal
  UNION ALL
  SELECT c_custkey, 'c_mktsegment', CAST(o_seg AS VARCHAR), CAST(n_seg AS VARCHAR)
  FROM joined WHERE o_seg IS DISTINCT FROM n_seg
)
SELECT * FROM m ORDER BY c_custkey, "column" LIMIT 100
""",
    "val_check_summary": f"""{SNAPSHOT_CTES},
mj AS (
  SELECT o.c_custkey,
         o.c_name AS o_name, n.c_name AS n_name,
         o.c_acctbal AS o_bal, n.c_acctbal AS n_bal,
         o.c_mktsegment AS o_seg, n.c_mktsegment AS n_seg
  FROM old_snap o JOIN new_snap n USING (c_custkey)
),
agg AS (
  SELECT
    (SELECT (SELECT count(*) FROM mj WHERE o_name IS DISTINCT FROM n_name)
           + (SELECT count(*) FROM mj WHERE o_bal IS DISTINCT FROM n_bal)
           + (SELECT count(*) FROM mj WHERE o_seg IS DISTINCT FROM n_seg)) AS mm,
    (SELECT count(*) FROM old_snap) AS old_raw,
    (SELECT count(*) FROM old_snap WHERE {ALLOWED_DELETIONS_SQL}) AS old_allow,
    (SELECT count(*) FROM new_snap) AS new_raw,
    (SELECT count(*) FROM new_snap WHERE {ALLOWED_ADDITIONS_SQL}) AS new_allow,
    (SELECT coalesce(sum(cnt - 1), 0) FROM (SELECT count(*) AS cnt FROM old_snap GROUP BY c_custkey) WHERE cnt > 1) AS old_dups,
    (SELECT coalesce(sum(cnt - 1), 0) FROM (SELECT count(*) AS cnt FROM new_snap GROUP BY c_custkey) WHERE cnt > 1) AS new_dups,
    (SELECT count(*) FROM old_snap WHERE c_mktsegment IS NULL) AS old_null_seg,
    (SELECT count(*) FROM new_snap WHERE c_mktsegment IS NULL) AS new_null_seg,
    (SELECT count(*) FROM old_snap WHERE c_name IS NULL) AS old_null_name,
    (SELECT count(*) FROM new_snap WHERE c_name IS NULL) AS new_null_name,
    (SELECT count(*) FROM old_snap
     WHERE c_custkey NOT IN (SELECT c_custkey FROM new_snap) AND NOT {ALLOWED_DELETIONS_SQL}) AS miss,
    (SELECT count(*) FROM new_snap
     WHERE c_custkey NOT IN (SELECT c_custkey FROM old_snap) AND NOT {ALLOWED_ADDITIONS_SQL}) AS extra
)
SELECT 'Row count match' AS check,
       CASE WHEN old_raw - old_allow = new_raw - new_allow THEN 'PASS' ELSE 'FAIL' END AS status,
       'Old=' || old_raw || ' (adj ' || (old_raw - old_allow) || '), New=' || new_raw
        || ' (adj ' || (new_raw - new_allow) || ')' AS notes
FROM agg
UNION ALL
SELECT 'Primary key duplicates',
       CASE WHEN old_dups = 0 AND new_dups = 0 THEN 'PASS' ELSE 'FAIL' END,
       'Old dupes=' || old_dups || ', New dupes=' || new_dups
FROM agg
UNION ALL
SELECT 'Nulls in required fields',
       CASE WHEN old_null_seg = 0 AND new_null_seg = 0 AND old_null_name = 0 AND new_null_name = 0
            THEN 'PASS' ELSE 'WARN' END,
       'c_mktsegment: Old=' || old_null_seg || ', New=' || new_null_seg
        || '; c_name: Old=' || old_null_name || ', New=' || new_null_name
FROM agg
UNION ALL
SELECT 'Missing/extra keys',
       CASE WHEN miss = 0 AND extra = 0 THEN 'PASS' ELSE 'FAIL' END,
       'Only in old=' || miss || ', only in new=' || extra
FROM agg
UNION ALL
SELECT 'Value mismatches',
       CASE WHEN mm = 0 THEN 'PASS' ELSE 'WARN' END,
       'count=' || mm
FROM agg
""",
    "reconcile_cogroup": f"""{SNAPSHOT_CTES},
o_cnt AS (SELECT c_custkey AS k, count(*) AS co FROM old_snap GROUP BY 1),
n_cnt AS (SELECT c_custkey AS k, count(*) AS cn FROM new_snap GROUP BY 1),
keys AS (
  SELECT coalesce(o.k, n.k) AS k, coalesce(co, 0) AS co, coalesce(cn, 0) AS cn
  FROM o_cnt o FULL OUTER JOIN n_cnt n ON o.k = n.k
),
j AS (
  SELECT o.c_custkey AS k, o.c_name AS o_name, n.c_name AS n_name,
         o.c_nationkey AS o_nat, n.c_nationkey AS n_nat,
         o.c_acctbal AS o_bal, n.c_acctbal AS n_bal,
         o.c_mktsegment AS o_seg, n.c_mktsegment AS n_seg
  FROM old_snap o JOIN new_snap n USING (c_custkey)
  WHERE o.c_custkey IN (SELECT k FROM keys WHERE co = 1 AND cn = 1)
)
SELECT CAST(k AS VARCHAR) AS key, '' AS column, CAST(co AS VARCHAR) AS old_value,
       CAST(cn AS VARCHAR) AS new_value, 'dup_key' AS kind
FROM keys WHERE co > 1 OR cn > 1
UNION ALL
SELECT CAST(k AS VARCHAR), '', NULL, NULL, 'only_in_old' FROM keys WHERE cn = 0 AND co = 1
UNION ALL
SELECT CAST(k AS VARCHAR), '', NULL, NULL, 'only_in_new' FROM keys WHERE co = 0 AND cn = 1
UNION ALL
SELECT CAST(k AS VARCHAR), 'c_name', CAST(o_name AS VARCHAR), CAST(n_name AS VARCHAR), 'mismatch'
FROM j WHERE o_name IS DISTINCT FROM n_name
UNION ALL
SELECT CAST(k AS VARCHAR), 'c_nationkey', CAST(o_nat AS VARCHAR), CAST(n_nat AS VARCHAR), 'mismatch'
FROM j WHERE o_nat IS DISTINCT FROM n_nat
UNION ALL
SELECT CAST(k AS VARCHAR), 'c_acctbal', CAST(o_bal AS VARCHAR), CAST(n_bal AS VARCHAR), 'mismatch'
FROM j WHERE o_bal IS DISTINCT FROM n_bal
UNION ALL
SELECT CAST(k AS VARCHAR), 'c_mktsegment', CAST(o_seg AS VARCHAR), CAST(n_seg AS VARCHAR), 'mismatch'
FROM j WHERE o_seg IS DISTINCT FROM n_seg
""",
}


# -- chunked checksum + aggregate fingerprints (operators/checksum.py) --------

CHECKSUM_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
CHECKSUM_CHUNKS = 64
AGG_COLS = ["c_acctbal", "c_nationkey"]  # numeric: min/max/sum defined


def val_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pt-table-checksum-shaped first pass: order-independent per-chunk
    digests on each side (one column-pruned scan + map-side-combinable
    aggregate each), joined over n_chunks summary rows — the cheap way to
    locate WHERE a 100-TB migration diverged before running the exact
    cell-level differ on just those chunks."""
    from data_migration_validation_spark.operators.checksum import checksum_diff

    return checksum_diff(
        old_customers(spark, sf_dir),
        new_customers(spark, sf_dir),
        "c_custkey",
        CHECKSUM_COLS,
        n_chunks=CHECKSUM_CHUNKS,
    )


def val_agg_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column aggregate fingerprints (rows/nulls/min/max/sum) old vs
    new, melted to one comparable row per (column, metric) — the sanity
    sweep a migration sign-off reads before anything row-level."""
    from data_migration_validation_spark.operators.checksum import aggregate_compare

    return aggregate_compare(
        old_customers(spark, sf_dir), new_customers(spark, sf_dir), AGG_COLS
    )


def _checksum_sql() -> str:
    from data_migration_validation_spark.operators.checksum import NULL_SENTINEL

    # md5-per-column before joining — same boundary-unambiguous rendering
    # as operators/checksum.py:_row_digest (a raw '|' join would collide
    # ('a|b','c') with ('a','b|c'))
    rendered = " || '|' || ".join(
        f"coalesce(md5(CAST({c} AS VARCHAR)), '{NULL_SENTINEL}')"
        for c in CHECKSUM_COLS
    )
    digest = f"CAST(('0x' || substr(md5({rendered}), 1, 8)) AS BIGINT)"
    # CAST the sum back to BIGINT: DuckDB's sum(BIGINT) is HUGEINT
    # (int128), which pandas-facing fetch paths promote to float64 —
    # lossy past 2^53 and a spurious value-hash mismatch against
    # Spark's exact long. int64 is safe here by construction (the
    # 32-bit-prefix sum overflows only past ~2^31 rows per chunk).
    side = (
        f"SELECT c_custkey % {CHECKSUM_CHUNKS} AS chunk, count(*) AS n_rows, "
        f"CAST(sum({digest}) AS BIGINT) AS checksum FROM {{snap}} GROUP BY 1"
    )
    return f"""{SNAPSHOT_CTES}
, o AS ({side.format(snap='old_snap')}),
n AS ({side.format(snap='new_snap')})
SELECT COALESCE(o.chunk, n.chunk) AS chunk,
       o.n_rows AS old_rows, o.checksum AS old_checksum,
       n.n_rows AS new_rows, n.checksum AS new_checksum
FROM o FULL OUTER JOIN n ON o.chunk = n.chunk
WHERE NOT (o.n_rows IS NOT DISTINCT FROM n.n_rows
           AND o.checksum IS NOT DISTINCT FROM n.checksum)
"""


def _agg_compare_sql() -> str:
    rows = [
        "SELECT '*' AS col_name, 'rows' AS metric, "
        "(SELECT CAST(count(*) AS VARCHAR) FROM old_snap) AS old_value, "
        "(SELECT CAST(count(*) AS VARCHAR) FROM new_snap) AS new_value"
    ]
    for c in AGG_COLS:
        for metric, expr in [
            ("nulls", f"count(*) - count({c})"),
            ("min", f"min({c})"),
            ("max", f"max({c})"),
            ("sum", f"sum({c})"),
        ]:
            rows.append(
                f"SELECT '{c}', '{metric}', "
                f"(SELECT CAST({expr} AS VARCHAR) FROM old_snap), "
                f"(SELECT CAST({expr} AS VARCHAR) FROM new_snap)"
            )
    union = "\nUNION ALL\n".join(rows)
    return f"""{SNAPSHOT_CTES}
SELECT col_name, metric, old_value, new_value,
       (old_value IS NOT DISTINCT FROM new_value) AS equal
FROM ({union})
"""


from data_migration_validation_spark.queries_corpus import CORPUS_REGISTRY  # noqa: E402

# The external driver verifies the FIRST 50 entries (dict order) against
# their DuckDB oracles. Round 4's registry grew to 56 and the last 6 —
# including never-verified new operators — silently fell out of the
# window. Two defenses now: (1) oracle-sharing twins are collapsed into
# cross-checked single entries (see queries_corpus._assert_twin) so the
# total is exactly 50, asserted below; (2) entries are ordered by
# verification priority — newest / flagship first, long-stable corpus
# projections last — so any future overflow sheds the safest rows.
DRIVER_WINDOW = 50

REGISTRY: dict[str, tuple] = {
    # -- newest + flagship validation surfaces (round-4 verdict: these
    #    must hold a window slot) ---------------------------------------
    "val_table_checksum": (val_table_checksum, _checksum_sql()),
    "val_agg_compare": (val_agg_compare, _agg_compare_sql()),
    "reconcile_cogroup": (reconcile_cogroup, _VAL_ORACLES["reconcile_cogroup"]),
    "val_signoff": (val_signoff, _VAL_ORACLES["val_signoff"]),
    "val_proof_topk": (val_proof_topk, _VAL_ORACLES["val_proof_topk"]),
    "val_check_summary": (val_check_summary, _VAL_ORACLES["val_check_summary"]),
    # -- CDC engine ------------------------------------------------------
    "cdc_final_state": (cdc_final_state_both, cdc_final_state_oracle()),
    "cdc_redrive_state": (cdc_redrive_state, cdc_final_state_oracle()),
    "cdc_novel_state": (cdc_novel_state, cdc_novel_state_oracle()),
    "cdc_novel_neardup_state": (cdc_novel_neardup_state, cdc_novel_neardup_state_oracle()),
    "cdc_state_asof": (cdc_state_asof, cdc_state_asof_oracle()),
    "cdc_changes": (cdc_changes, cdc_changes_oracle()),
    "cdc_envelope_parse": (cdc_envelope_parse, cdc_envelope_parse_oracle()),
    "cdc_patch_state": (cdc_patch_state, cdc_patch_state_oracle()),
    "lww_events": (lww_events, lww_events_oracle()),
    # -- event analytics --------------------------------------------------
    "windowed_event_stats": (windowed_event_stats, windowed_event_stats_oracle()),
    "session_event_stats": (session_event_stats, session_event_stats_oracle()),
    "evt_asof_user_state": (evt_asof_user_state, evt_asof_user_state_oracle()),
    "evt_range_after_error": (evt_range_after_error, evt_range_after_error_oracle()),
    "rollup_event_stats": (rollup_event_stats, rollup_event_stats_oracle()),
    # -- migration validation (reference O1-O14) --------------------------
    "val_column_profile": (val_column_profile, val_column_profile_oracle()),
    "val_drift_psi": (val_drift_psi, val_drift_psi_oracle()),
    "val_row_counts": (val_row_counts, _VAL_ORACLES["val_row_counts"]),
    "val_only_in_old": (val_only_in_old, _VAL_ORACLES["val_only_in_old"]),
    "val_only_in_new": (val_only_in_new, _VAL_ORACLES["val_only_in_new"]),
    "val_cell_mismatches": (val_cell_mismatches, _VAL_ORACLES["val_cell_mismatches"]),
    "val_duplicates": (val_duplicates, _VAL_ORACLES["val_duplicates"]),
    "val_rekeys": (val_rekeys, _VAL_ORACLES["val_rekeys"]),
    "val_null_summary": (val_null_summary, _VAL_ORACLES["val_null_summary"]),
    "val_format_violations": (val_format_violations, _VAL_ORACLES["val_format_violations"]),
    "val_schema_comparison": (val_schema_comparison, _VAL_ORACLES["val_schema_comparison"]),
    # -- corpus / training-data pipeline (long-stable, safest to shed) ----
    **CORPUS_REGISTRY,
}

# a raise, not an assert: `python -O` strips asserts, and silently
# letting an entry fall outside the driver's verification window is
# exactly the round-4 regression this guard exists to prevent
if len(REGISTRY) > DRIVER_WINDOW:
    raise RuntimeError(
        f"REGISTRY has {len(REGISTRY)} entries but the driver only verifies "
        f"the first {DRIVER_WINDOW} — collapse oracle-sharing twins "
        f"(queries_corpus._assert_twin) instead of overflowing the window"
    )
