#!/usr/bin/env python
"""spark-submit entrypoint for the CDC/incremental-ingest engine.

Cluster usage (north rule — BASELINE.json:14):

    zip -r engine.zip data_migration_validation_spark
    spark-submit --py-files engine.zip main.py <command> [args]

Locally the same commands run with a ``local[N]`` master (session.py
detects whether spark-submit already provided one).

Commands
--------
generate   synthesize a deterministic binlog/WAL to parquet
apply      replay a binlog into a lake table (epoch commits, resume-safe;
           --audit for write-audit-publish, --novelty for ingest dedup)
compact    fold delta files into base files (+ tombstone GC horizon)
rebucket   change the table's bucket count (atomic full rewrite)
expire     drop retained manifest history older than a version
vacuum     driver-side orphan-file sweep (crash leftovers)
rebuild-blooms  recompute novelty blooms from the committed index
           (bloom-store loss recovery / geometry resize)
lookup     point read of one key (manifest file skipping, no table scan)
changes    change-data-feed between epoch-line points
events     event-time range scan (manifest ts-bounds file skipping)
status     driver-side table/checkpoint health JSON (no Spark job)
quarantine dead-letter summary: totals, pending, reasons (+ CSV)
redrive    re-admit pending dead-lettered events as a NEW epoch through
           the exactly-once gate, after declarative --set column fixes
reconcile  cogroup-diff the lake's final state against an expected snapshot
validate   reference-semantics migration validation of an OLD/NEW table
           pair, writing the reference's proof artifacts as CSVs
           (/root/reference/src/validate.py:133-177 surface, distributed)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark(app: str):
    from data_migration_validation_spark.session import get_spark

    return get_spark(app_name=app)


def cmd_generate(args: argparse.Namespace) -> int:
    from data_migration_validation_spark.sources.binlog import BinlogConfig, synth_binlog

    spark = _spark("dmv-generate")
    cfg = BinlogConfig(
        n_keys=args.keys,
        max_versions=args.max_versions,
        events_per_epoch=args.events_per_epoch or max(1000, args.keys),
        seed=args.seed,
        hot_fraction_pct=args.hot_pct,
        evo2_epoch=args.evo2_epoch,
        evo3_epoch=args.evo3_epoch,
    )
    # epoch-partitioned log: apply's per-epoch reads prune to one directory
    synth_binlog(spark, cfg).write.mode("overwrite").partitionBy("batch_epoch").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"command": "generate", "out": args.out, "events": n, "epochs": cfg.n_epochs}))
    return 0


def cmd_apply(args: argparse.Namespace) -> int:
    from pyspark.sql import functions as F

    from data_migration_validation_spark.plans.apply import CDCApplyEngine

    spark = _spark("dmv-apply")
    log = spark.read.parquet(args.log)
    # an existing table's recorded properties win (None = adopt them);
    # a brand-new table keeps the CLI's historical default of 64 buckets
    is_new = not os.path.exists(os.path.join(args.table, "_meta", "CURRENT"))
    buckets = args.buckets if args.buckets is not None else (64 if is_new else None)
    engine = CDCApplyEngine(
        spark,
        table_path=args.table,
        checkpoint_path=args.checkpoint,
        key_col=args.key,
        num_buckets=buckets,
        use_pandas_lww=args.pandas_lww,
        in_batch_prededup=args.prededup,
        merge_mode=args.merge_mode,
        compact_every=args.compact_every or None,
        enrich_text=args.enrich,
        novelty_filter=args.novelty,
    )
    lo, hi = log.agg(F.min("batch_epoch"), F.max("batch_epoch")).collect()[0]
    if lo is None:
        # empty binlog: nothing to apply, report and succeed
        final = engine.read_final()
        print(json.dumps({"command": "apply", "final_rows": final.count() if final is not None else 0}))
        return 0
    last = engine.ckpt.last_epoch()
    # resume hint: skip strictly below the checkpointed epoch; the
    # checkpointed epoch itself is re-offered and the lake's idempotency
    # guard no-ops it (crash-between-commit-and-checkpoint safety).
    start = int(lo) if (args.no_resume or last is None) else max(int(lo), last)
    audit = None
    if args.audit:
        from data_migration_validation_spark.operators.audit import page_envelope_audit

        audit = page_envelope_audit(
            max_delete_fraction=(
                args.max_delete_fraction if args.max_delete_fraction >= 0 else None
            ),
            inline=args.audit_inline,
        )
    epochs = [e for e in range(int(lo), int(hi) + 1) if e >= start]
    slices = {e: log.where(F.col("batch_epoch") == e) for e in epochs}
    # replay() degrades group_size to sequential when a per-epoch gate is
    # configured (audit / novelty / cow) — safe to pass through as-is
    all_stats = engine.replay(
        slices, audit=audit, group_size=max(1, args.group_size)
    )
    for st in all_stats:
        out = {
            "epoch": st.epoch,
            "skipped": st.skipped,
            "applied_events": st.events_seen,
            "rows_written": st.rows_written,
            "buckets_touched": st.buckets_touched,
            "seconds": round(st.seconds, 3),
        }
        if args.novelty and args.novelty != "off":
            out["novelty_dropped"] = st.novelty_dropped
        if st.rejected:
            out["rejected"] = True
            out["audit_violations"] = st.audit_violations
        print(json.dumps(out))
        if st.rejected:
            # write-audit-publish gate: the staged commit failed its audit
            # and was discarded; later epochs must not commit on top of a
            # hole in the epoch line, so the replay stops here non-zero
            final = engine.read_final()
            print(
                json.dumps(
                    {
                        "command": "apply",
                        "rejected_epoch": st.epoch,
                        "final_rows": final.count() if final is not None else 0,
                    }
                )
            )
            return 2
    final = engine.read_final()
    print(json.dumps({"command": "apply", "final_rows": final.count() if final is not None else 0}))
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    from data_migration_validation_spark.plans.lake import LakeTable

    spark = _spark("dmv-compact")
    # key_col/num_buckets come from the table's own manifest — supplying
    # them here was a corruption hazard (compacting under a wrong bucket
    # count rewrites rows into wrong buckets, silently when the recomputed
    # ids happen to stay inside the touched set)
    lake = LakeTable(args.table)
    n = lake.compact(spark, gc_horizon_ts=args.gc_horizon or None)
    print(
        json.dumps(
            {
                "command": "compact",
                "compacted_buckets": n,
                "gc_horizon": lake.gc_horizon(),
            }
        )
    )
    return 0


def cmd_rebucket(args: argparse.Namespace) -> int:
    from data_migration_validation_spark.plans.lake import LakeTable

    spark = _spark("dmv-rebucket")
    lake = LakeTable(args.table)
    old = lake.num_buckets
    lake.rebucket(spark, args.buckets)
    print(json.dumps({"command": "rebucket", "from": old, "to": args.buckets}))
    return 0


def cmd_expire(args: argparse.Namespace) -> int:
    from data_migration_validation_spark.plans.lake import LakeTable

    lake = LakeTable(args.table)
    out = lake.expire_snapshots(keep_last=args.keep_last)
    print(json.dumps({"command": "expire", **out}))
    return 0


def cmd_events(args: argparse.Namespace) -> int:
    """Event-time range scan (raw stored versions, manifest-pruned by
    per-file timestamp bounds) — the late-event investigation read."""
    from data_migration_validation_spark.plans.lake import LakeTable

    spark = _spark("dmv-events")
    lake = LakeTable(args.table)
    _, _, cand, total = lake.files_in_time_range(args.from_ts, args.to_ts)
    df = lake.read_events_in_range(spark, args.from_ts, args.to_ts)
    if df is None:
        print(json.dumps({"command": "events", "error": "empty table"}))
        return 1
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        df = spark.read.parquet(args.out)
    print(
        json.dumps(
            {
                "command": "events",
                "from": args.from_ts,
                "to": args.to_ts,
                "files_scanned": cand,
                "files_total": total,
                "rows": df.count(),
            }
        )
    )
    return 0


def cmd_vacuum(args: argparse.Namespace) -> int:
    from data_migration_validation_spark.plans.lake import LakeTable

    lake = LakeTable(args.table)
    out = lake.vacuum(min_age_seconds=args.min_age_seconds)
    # tables ingested with --novelty: sweep index partitions orphaned by
    # crashed/rejected attempts (invisible to reads, but they hold bytes)
    novelty_root = os.path.join(args.table, "_novelty")
    if os.path.isdir(novelty_root):
        from data_migration_validation_spark.plans.novelty import NoveltyFilter

        orphans = NoveltyFilter(novelty_root).vacuum_orphans(
            set(lake.epochs_applied())
        )
        out["novelty_orphan_epochs_removed"] = orphans
    print(json.dumps({"command": "vacuum", **out}))
    return 0


def cmd_rebuild_blooms(args: argparse.Namespace) -> int:
    """Recompute the novelty blooms from the committed index — the
    recovery path after bloom-store loss, and the only way to re-trust
    blooms after a geometry resize (normal folds tag a replaced bitmap
    head=-1, untrusted until rebuilt). Adopts the table's pinned mode
    and bucket count; ``--bloom-bits`` sets the (re)built geometry and
    must match what appliers use (the CLI applier always uses the
    engine default)."""
    from data_migration_validation_spark.plans.lake import LakeTable
    from data_migration_validation_spark.plans.novelty import NoveltyFilter

    pin_path = os.path.join(args.table, "_novelty", "blooms", "_mode")
    if not os.path.exists(pin_path):
        raise SystemExit(
            f"{args.table} has no novelty index (no pinned mode) — "
            f"nothing to rebuild"
        )
    with open(pin_path) as f:
        pin = json.load(f)
    spark = _spark("dmv-rebuild-blooms")
    lake = LakeTable(args.table)
    nf = NoveltyFilter(
        os.path.join(args.table, "_novelty"),
        n_buckets=int(pin["n_buckets"]),
        bloom_bits=args.bloom_bits,
    )
    committed = set(lake.epochs_applied())
    n = nf.rebuild_blooms(spark, committed)
    print(
        json.dumps(
            {
                "command": "rebuild-blooms",
                "mode": pin["mode"],
                "buckets_rebuilt": n,
                "bloom_bits": args.bloom_bits,
                "head": max(committed) if committed else None,
            }
        )
    )
    return 0


def cmd_lookup(args: argparse.Namespace) -> int:
    """Point lookup: one key's live row via manifest file skipping —
    bucket + per-file key bounds, a handful of files read, no scan."""
    from pyspark.sql import functions as F

    from data_migration_validation_spark.plans.lake import LakeTable

    spark = _spark("dmv-lookup")
    lake = LakeTable(args.table)
    base_g, delta_g, bucket = lake.lookup_files(args.key_value)
    df = lake.lookup(spark, args.key_value)
    if df is not None and "deleted" in df.columns:
        df = df.where(~F.col("deleted")).drop("deleted")
    rows = [] if df is None else [r.asDict(recursive=True) for r in df.collect()]
    for r in rows:  # binary columns aren't JSON-serializable
        for k, v in list(r.items()):
            if isinstance(v, (bytes, bytearray)):
                r[k] = f"<{len(v)} bytes>"
            elif not isinstance(v, (str, int, float, bool, type(None))):
                r[k] = str(v)
    print(
        json.dumps(
            {
                "command": "lookup",
                "key": args.key_value,
                "bucket": bucket,
                "files_read": sum(len(fs) for g in (base_g, delta_g) for fs in g.values()),
                "found": len(rows),
                "rows": rows,
            }
        )
    )
    return 0


def cmd_changes(args: argparse.Namespace) -> int:
    """Change-data-feed: row-level changes since an epoch, written to
    parquet; prints per-change-type counts."""
    import tempfile

    from pyspark.sql import functions as F

    from data_migration_validation_spark.plans.apply import CDCApplyEngine

    spark = _spark("dmv-changes")
    engine = CDCApplyEngine(
        spark,
        table_path=args.table,
        checkpoint_path=args.checkpoint or tempfile.mkdtemp(prefix="dmv-cdf-ckpt-"),
    )
    feed = engine.read_changes(
        from_epoch=args.since_epoch,
        to_epoch=args.to_epoch if args.to_epoch >= 0 else None,
    )
    if feed is None:
        print(json.dumps({"command": "changes", "error": "empty table"}))
        return 1
    if args.out:
        feed.write.mode("overwrite").parquet(args.out)
        feed = spark.read.parquet(args.out)  # count from the written feed
    counts = {
        r["_change_type"]: r["count"]
        for r in feed.groupBy("_change_type").count().collect()
    }
    print(json.dumps({"command": "changes", "since_epoch": args.since_epoch, "counts": counts}))
    return 0


def cmd_quarantine(args: argparse.Namespace) -> int:
    """Dead-letter table: counts per rejection reason (and optional CSV)."""
    import os

    from data_migration_validation_spark.plans.apply import (
        quarantine_epoch_dirs,
        read_quarantine_dirs,
    )

    spark = _spark("dmv-quarantine")
    qdir = os.path.join(args.table, "_quarantine")
    dirs = quarantine_epoch_dirs(qdir, pending_only=False)
    if not dirs:
        print(
            json.dumps(
                {"command": "quarantine", "quarantined": 0, "pending": 0, "reasons": {}}
            )
        )
        return 0
    # schema-widening-safe union (mergeSchema breaks across an envelope
    # type evolution, e.g. fetch_status int->long)
    df = read_quarantine_dirs(spark, qdir, dirs)
    if args.out:
        (
            df.drop("payload")
            .orderBy("epoch", "seq")
            .write.mode("overwrite")
            .option("header", True)
            .csv(args.out)
        )
    from pyspark.sql import functions as F

    # pending = events in epochs not yet re-admitted by a redrive (no
    # _REDRIVEN marker); the delta vs total is already-redriven lineage.
    # Marker listing is driver-side (the engine's own pending-partition
    # rule, not a reimplementation); the counts fold into the one scan.
    pending_epochs = [
        int(d.rsplit("=", 1)[1])
        for d in quarantine_epoch_dirs(qdir, pending_only=True)
    ]
    is_pending = (
        F.col("epoch").isin(pending_epochs) if pending_epochs else F.lit(False)
    )
    rows = (
        df.groupBy("_reason")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.sum(is_pending.cast("long")).alias("pending"),
        )
        .collect()
    )
    reasons = {r["_reason"]: r["count"] for r in rows}
    print(
        json.dumps(
            {
                "command": "quarantine",
                "quarantined": sum(reasons.values()),
                "pending": int(sum(r["pending"] for r in rows)),
                "reasons": reasons,
            }
        )
    )
    return 0


def cmd_redrive(args: argparse.Namespace) -> int:
    """Re-admit dead-lettered events through the exactly-once epoch gate
    (DLQ reprocess). The fix is declarative: repeatable ``--set
    COL=SQL_EXPR`` column rewrites (pure transforms, per the redrive
    determinism contract), e.g.::

        main.py redrive --table /tmp/lake --checkpoint /tmp/ckpt \\
            --epoch 99 --set "op=regexp_replace(op, 'X$', '')"

    Rows the fix does not cure re-quarantine under the new epoch;
    nothing is ever lost. Exit 0 = committed (or nothing pending),
    2 = the redrive epoch was audit-rejected."""
    import tempfile

    from pyspark.sql import functions as F

    from data_migration_validation_spark.plans.apply import CDCApplyEngine

    spark = _spark("dmv-redrive")
    # adopt the table's pinned novelty mode: a redrive engine without
    # the filter would commit re-admitted content that bypasses
    # admission (never fingerprinted into the index/blooms), silently
    # breaking the table's dedup contract — apply_epoch refuses that,
    # so read the pin and configure to match
    novelty_kw = {}
    pin_path = os.path.join(args.table, "_novelty", "blooms", "_mode")
    if os.path.exists(pin_path):
        with open(pin_path) as f:
            pin = json.load(f)
        novelty_kw = {
            "novelty_filter": pin["mode"],
            "novelty_buckets": int(pin["n_buckets"]),
        }
    engine = CDCApplyEngine(
        spark,
        table_path=args.table,
        checkpoint_path=args.checkpoint or tempfile.mkdtemp(prefix="dmv-redrive-ckpt-"),
        **novelty_kw,
    )

    rewrites = []
    for item in args.set or []:
        col, eq, expr = item.partition("=")
        if not eq or not col.strip() or not expr.strip():
            raise SystemExit(f"--set expects COL=SQL_EXPR, got: {item!r}")
        rewrites.append((col.strip(), expr))

    fix = None
    if rewrites:
        def fix(df, _rw=tuple(rewrites)):
            for col, expr in _rw:
                df = df.withColumn(col, F.expr(expr))
            return df

    source = None
    if args.source_epochs:
        try:
            source = [int(e) for e in args.source_epochs.split(",")]
        except ValueError:
            raise SystemExit(
                f"--source-epochs expects a comma-separated list of epoch "
                f"numbers (e.g. 3,4,7), got: {args.source_epochs!r}"
            ) from None
    audit = None
    if args.audit:
        from data_migration_validation_spark.operators.audit import page_envelope_audit

        audit = page_envelope_audit(inline=args.audit_inline)
    st = engine.redrive_quarantine(
        args.epoch, fix=fix, source_epochs=source, audit=audit
    )
    # which quarantine partitions this redrive was actually bound to —
    # a pre-existing intent (crash resume / racing redriver) overrides
    # --source-epochs, and the operator must see that, not assume it
    adopted = engine.redrive_intent(args.epoch)
    out = {
        "command": "redrive",
        "epoch": st.epoch,
        "skipped": st.skipped,
        "source_epochs": adopted,
        "redriven_events": st.events_seen,
        "still_quarantined": st.quarantined,
        "rows_written": st.rows_written,
    }
    if source is not None and adopted is not None and sorted(source) != adopted:
        out["source_epochs_overridden_by_intent"] = True
    if st.rejected:
        out["rejected"] = True
        out["audit_violations"] = st.audit_violations
    print(json.dumps(out))
    return 2 if st.rejected else 0


def cmd_status(args: argparse.Namespace) -> int:
    """Table + checkpoint health in one JSON — DRIVER-SIDE ONLY (manifest,
    checkpoint parquet, file sizes): no SparkSession, no cluster job, so
    it answers in milliseconds against a 100-TB table. The ops questions
    it covers: where is the table (version/epochs/schema), how much
    read-side merge debt has accumulated (delta depth), is retention
    working (gc horizon, staged orphans), what got rejected (quarantine),
    and what did ingest do (lineage/metrics totals)."""
    from data_migration_validation_spark.plans.lake import LakeTable

    lake = LakeTable(args.table)
    snap = lake.current_snapshot()
    out: dict = {"command": "status", "table": args.table}
    if snap is None:
        out["empty"] = True
        print(json.dumps(out))
        return 0

    def _files(groups):
        return [f for by_b in groups.values() for fs in by_b.values() for f in fs]

    base_files = _files(snap.file_groups)
    delta_files = _files(snap.delta_groups)
    out["snapshot"] = {
        "version": snap.version,
        "published_versions": len(lake.versions()),
        "epochs_applied": len(snap.epochs),
        "max_epoch": max(snap.epochs) if snap.epochs else None,
        "buckets_live": len(snap.all_buckets()),
        "delta_depth": snap.delta_depth(),
        "base_files": len(base_files),
        "delta_files": len(delta_files),
        "bytes": sum(os.path.getsize(f) for f in base_files + delta_files if os.path.exists(f)),
        "gc_horizon": snap.gc_horizon,
        "staged_versions": lake.staged_versions(),
        # file-skipping coverage: how many live files carry key / event-
        # time bounds (files without bounds are always scan candidates)
        "files_with_key_bounds": len(snap.file_stats or {}),
        "files_with_ts_bounds": len(snap.ts_stats or {}),
        # origin-tagged commits (condensed ranges, e.g. redrive epochs):
        # which epoch numbers are NOT plain ingest — the numbers a
        # replayer must never reuse for a source slice
        "origin_epochs": snap.origin_epochs or {},
        "table": snap.table_props,
    }

    # novelty-index health (tables ingested with --novelty): the pinned
    # admission mode, per-bucket bloom coverage heads, the compacted-
    # generation pointer, and how many per-epoch index partitions await
    # the next fold — all driver-side file reads, still no Spark job
    nroot = os.path.join(args.table, "_novelty")
    if os.path.isdir(nroot):
        import re as _re

        nov: dict = {}
        bdir = os.path.join(nroot, "blooms")
        pin_p = os.path.join(bdir, "_mode")
        if os.path.exists(pin_p):
            with open(pin_p) as f:
                nov["mode"] = json.load(f)
        heads: list[int] = []
        if os.path.isdir(bdir):
            for fn in os.listdir(bdir):
                if _re.fullmatch(r"fpb\d+", fn):
                    with open(os.path.join(bdir, fn)) as f:
                        head_s = f.read().split(":", 1)[0]
                    try:
                        heads.append(int(head_s))
                    except ValueError:
                        heads.append(-1)  # legacy bare-b64: coverage unknown
        nov["bloom_buckets"] = len(heads)
        if heads:
            # min < max(epochs) means some bucket lags → its members pay
            # the exact check; -1 means an untrusted (rebuild-pending) bloom
            nov["bloom_head_min"] = min(heads)
            nov["bloom_head_max"] = max(heads)
        cp_p = os.path.join(bdir, "_compact")
        if os.path.exists(cp_p):
            with open(cp_p) as f:
                c = json.load(f)
            nov["compacted"] = {
                "head": c.get("head"),
                "folded_epochs": len(c.get("epochs") or []),
                "generation": c.get("gen"),
                "reclaim_pending": len(c.get("reclaim") or []),
            }
        idx = os.path.join(nroot, "index")
        if os.path.isdir(idx):
            nov["index_epoch_partitions"] = sum(
                1 for d in os.listdir(idx) if d.startswith("epoch=")
            )
        out["novelty"] = nov

    qdir = os.path.join(args.table, "_quarantine")
    quarantined = 0
    if os.path.isdir(qdir):
        try:
            import pyarrow.parquet as pq

            for root, _dirs, files in os.walk(qdir):
                for fn in files:
                    if fn.endswith(".parquet"):
                        quarantined += pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
        except Exception:
            quarantined = -1  # unreadable footers: unknown, not zero
    out["quarantined_events"] = quarantined

    if args.checkpoint:
        from data_migration_validation_spark.plans.checkpoint import CheckpointStore

        ck = CheckpointStore(args.checkpoint)
        lin = ck.lineage()
        m = ck.metrics()
        out["checkpoint"] = {
            "last_epoch": ck.last_epoch(),
            "lineage_epochs": int(lin["epoch"].nunique()) if len(lin) else 0,
            "events_applied": int(lin["applied_events"].sum()) if len(lin) else 0,
            "partitions_tracked": int(lin["partition"].nunique()) if len(lin) else 0,
        }
        if len(m):
            out["metrics_totals"] = {
                name: round(float(v), 3)
                for name, v in m.groupby("metric")["value"].sum().items()
            }
    print(json.dumps(out))
    return 0


def cmd_reconcile(args: argparse.Namespace) -> int:
    from data_migration_validation_spark.operators.reconcile import (
        cogroup_reconcile,
        incremental_reconcile,
        reconciliation_report,
    )
    from data_migration_validation_spark.plans.apply import CDCApplyEngine

    spark = _spark("dmv-reconcile")
    engine = CDCApplyEngine(
        spark, table_path=args.table, checkpoint_path=args.checkpoint, key_col=args.key
    )
    expected = spark.read.parquet(args.expected)
    if args.since_epoch >= 0:
        # incremental: only buckets touched since the last passing
        # reconcile are re-verified (delta-check contract)
        diff = incremental_reconcile(engine, expected, since_epoch=args.since_epoch)
    else:
        final = engine.read_final()
        diff = cogroup_reconcile(expected, final, key=engine.key_col)
    if args.out:
        diff.orderBy("key", "column").write.mode("overwrite").option("header", True).csv(args.out)
    report = reconciliation_report(diff)
    identical = not report
    print(json.dumps({"command": "reconcile", "identical": identical, "findings": report}))
    return 0 if identical else 1


def cmd_validate(args: argparse.Namespace) -> int:
    """The reference's batch validation run (src/validate.py E1 lifecycle),
    distributed: load OLD/NEW, run the O3–O14 suite, write proof CSVs."""
    from pyspark.sql import functions as F

    from data_migration_validation_spark.operators import validation as V

    spark = _spark("dmv-validate")

    def load(path: str):
        if path.endswith(".csv"):
            # reference semantics: everything as string (validate.py:52-53)
            df = spark.read.option("header", True).csv(path)
        else:
            df = spark.read.parquet(path)
        return V.normalize_key(df, args.pk)

    old, new = load(args.old), load(args.new)
    cfg = V.ValidationConfig(
        primary_key=args.pk,
        required_fields=args.required or [],
        compare_columns=args.compare or None,
        allowed_deletions=frozenset(args.allow_deleted or []),
        allowed_additions=frozenset(args.allow_added or []),
        empty_string_is_null=args.empty_is_null,
    )

    os.makedirs(args.out, exist_ok=True)

    def sink(df, name: str, order=None, single_file: bool = False):
        """Write a proof artifact as CSV. Tiny summaries coalesce to one
        file for readability; row-level artifacts (only_in_*, mismatches)
        can be arbitrarily large at scale, so they keep their natural
        parallelism (a directory of part files, like any Spark output)."""
        out = df if order is None else V.proof(df, order)
        if single_file:
            out = out.coalesce(1)
        (
            out.write.mode("overwrite")
            .option("header", True)
            .csv(os.path.join(args.out, name))
        )

    # optional manual sign-off overlay (reference verification.json,
    # src/validate.py:21-32): mismatch-level pairs + check-level sign-offs
    ver_pairs, ver_checks = (None, {})
    if args.verification:
        ver_pairs, ver_checks = V.load_verification(spark, args.verification, args.pk)

    # optional format/type rules: col=rule pairs (rule from VALIDATOR_RULES)
    format_rules: dict[str, str] = {}
    for spec in args.format_rules or []:
        col, _, rule = spec.partition("=")
        if not rule or rule not in V.VALIDATOR_RULES:
            raise SystemExit(
                f"--format-rules entry {spec!r} must be col=rule with rule in "
                f"{sorted(V.VALIDATOR_RULES)}"
            )
        format_rules[col] = rule

    sink(V.row_counts(old, new, cfg), "row_counts", single_file=True)
    sink(V.duplicate_rows(old, args.pk), "duplicates_old", order=args.pk)
    sink(V.duplicate_rows(new, args.pk), "duplicates_new", order=args.pk)
    sink(V.null_summary(old, new, cfg), "nulls_summary", single_file=True)
    sink(V.schema_comparison(old, new), "schema_comparison", single_file=True)
    oio = V.only_in_old(old, new, cfg)
    oin = V.only_in_new(old, new, cfg)
    sink(oio, "only_in_old", order=args.pk)
    sink(oin, "only_in_new", order=args.pk)
    # legacy artifact names for compatibility (src/validate.py:138-139)
    sink(oio, "missing_in_new", order=args.pk)
    sink(oin, "extra_in_new", order=args.pk)
    mism = V.cell_mismatches(old, new, cfg)
    if ver_pairs is not None:
        mism = V.apply_signoff(mism, ver_pairs, args.pk)
    sink(mism, "mismatches", order=[args.pk, "column"])
    if format_rules:
        sink(
            V.format_violations(new, args.pk, format_rules),
            "format_violations",
            order=[args.pk, "column"],
        )
    if args.rekey_attr:
        sink(
            V.possible_rekeys(old, new, cfg, attr=args.rekey_attr),
            "possible_rekeys",
            order=args.rekey_attr,
        )
    if args.profile:
        # pre-validation profiling: one aggregation job per side
        sink(V.column_profile(old), "profile_old", single_file=True)
        sink(V.column_profile(new), "profile_new", single_file=True)
    summary, summary_counts = V.check_summary_with_counts(
        old, new, cfg, format_rules=format_rules or None
    )
    if args.verification:
        summary = V.annotate_check_signoff(summary, ver_checks)
    sink(summary, "checks", single_file=True)
    rows = summary.collect()
    if args.html:
        from data_migration_validation_spark.report import render_report

        slice_df = V.proof(mism, [args.pk, "column"], limit=V.INLINE_MAX_ROWS)
        mism_rows = [tuple(r) for r in slice_df.collect()]
        compare_cols = list(cfg.compare_columns or [])
        if not compare_cols:
            compare_cols = [c for c in old.columns if c != args.pk and c in new.columns]
        page = render_report(
            pk=args.pk,
            columns=compare_cols,
            check_rows=[r.asDict() for r in rows],
            mismatch_cols=list(slice_df.columns),
            mismatch_rows=mism_rows,
            subtitle=f"OLD: {args.old} — NEW: {args.new}",
            counts=summary_counts,
        )
        with open(os.path.join(args.out, "report.html"), "w") as fh:
            fh.write(page)
    print(
        json.dumps(
            {
                "command": "validate",
                "checks": {r["check"]: r["status"] for r in rows},
                "out": args.out,
            }
        )
    )
    # FAIL rows break the run; WARN rows (mismatches/format findings that
    # a human reviews or signs off) do not — matching the reference's
    # report, where the golden sample shows 48 mismatches yet passes.
    return 0 if all(r["status"] != "FAIL" for r in rows) else 1


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="main.py", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    g = sub.add_parser("generate", help="synthesize a binlog to parquet")
    g.add_argument("--out", required=True)
    g.add_argument("--keys", type=int, default=100_000)
    g.add_argument("--max-versions", type=int, default=4)
    g.add_argument("--events-per-epoch", type=int, default=0)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--hot-pct", type=int, default=50)
    g.add_argument("--evo2-epoch", type=int, default=None)
    g.add_argument("--evo3-epoch", type=int, default=None)
    g.set_defaults(fn=cmd_generate)

    a = sub.add_parser("apply", help="replay a binlog into a lake table")
    a.add_argument("--log", required=True)
    a.add_argument("--table", required=True)
    a.add_argument("--checkpoint", required=True)
    a.add_argument(
        "--key",
        default=None,
        help="key column for a NEW table (an existing table's recorded "
        "key wins; a conflicting value errors)",
    )
    a.add_argument(
        "--buckets",
        type=int,
        default=None,
        help="bucket count for a NEW table (default 64; an existing "
        "table's recorded count wins — change it with the rebucket command)",
    )
    a.add_argument(
        "--audit",
        action="store_true",
        help="write-audit-publish: stage each epoch's commit, run the "
        "page-envelope audit (url format, order columns, html⇒text) over "
        "the staged files, publish only on zero violations; a rejected "
        "epoch leaves the table untouched and stops the replay (exit 2)",
    )
    a.add_argument(
        "--audit-inline",
        action="store_true",
        dest="audit_inline",
        help="with --audit: collect the checks during the staging write "
        "(DataFrame.observe — zero extra jobs; skips the exact "
        "duplicate-key count, which the LWW merge guarantees anyway)",
    )
    a.add_argument(
        "--max-delete-fraction",
        type=float,
        default=-1.0,
        dest="max_delete_fraction",
        help="with --audit: reject an epoch that is more than this "
        "fraction tombstones (delete-storm guard; -1 = off)",
    )
    a.add_argument(
        "--group-size",
        type=int,
        default=1,
        dest="group_size",
        help="commit coalescing for backlog catch-up: apply up to N "
        "pending epochs per shuffle, committed atomically in ONE "
        "snapshot (per-epoch lineage/quarantine attribution preserved; "
        "time travel inside a group resolves to group boundaries). "
        "Ignored — replay stays sequential — when --audit, --novelty, "
        "or --merge-mode cow is set, since those gates are per-epoch",
    )
    a.add_argument("--pandas-lww", action="store_true")
    a.add_argument(
        "--prededup",
        action="store_true",
        help="LWW-reduce each batch before text extraction and the merge "
        "(worth it for backfill/replay batches with many versions per key)",
    )
    a.add_argument("--no-resume", action="store_true")
    a.add_argument(
        "--merge-mode",
        choices=["mor", "cow"],
        default="mor",
        help="mor: epoch deltas + read-time merge + periodic compaction "
        "(write cost ∝ epoch); cow: rewrite touched buckets each epoch",
    )
    a.add_argument(
        "--compact-every",
        type=int,
        default=8,
        help="fold delta files into base every N epochs (0 = never)",
    )
    a.add_argument(
        "--enrich",
        action="store_true",
        help="ingest-time text analysis: store lang_guess/quality/"
        "fingerprint per page alongside the extracted text",
    )
    a.add_argument(
        "--novelty",
        nargs="?",
        const="exact",
        default=False,
        choices=["exact", "minhash", "off"],
        help="content-novelty filter: drop upserts whose extracted text "
        "was already ingested in an earlier epoch (bloom pre-pass + "
        "fingerprint-index exact check; deletes pass through). Bare "
        "--novelty = exact; 'minhash' = near-duplicate admission; "
        "'off' = explicit opt-out on a table whose novelty mode is "
        "pinned (a plain apply on such a table refuses, because it "
        "would commit content that bypasses admission)",
    )
    a.set_defaults(fn=cmd_apply)

    c = sub.add_parser("compact", help="fold a table's delta files into its base files")
    c.add_argument("--table", required=True)
    c.add_argument(
        "--gc-horizon",
        default="",
        help="ISO timestamp: also drop tombstones at/before this time and "
        "record the horizon so later events at/before it are refused "
        "(run only when every source is caught up past it)",
    )
    c.set_defaults(fn=cmd_compact)

    ex = sub.add_parser(
        "expire", help="expire old snapshots and delete their orphaned data files"
    )
    ex.add_argument("--table", required=True)
    ex.add_argument("--keep-last", type=int, default=10, dest="keep_last")
    ex.set_defaults(fn=cmd_expire)

    rb = sub.add_parser("rebucket", help="change a table's bucket count (full rewrite)")
    rb.add_argument("--table", required=True)
    rb.add_argument("--buckets", type=int, required=True)
    rb.set_defaults(fn=cmd_rebucket)

    r = sub.add_parser("reconcile", help="diff lake final state vs expected parquet")
    r.add_argument("--table", required=True)
    r.add_argument("--checkpoint", required=True)
    r.add_argument("--expected", required=True)
    r.add_argument("--key", default=None, help="defaults to the table's recorded key column")
    r.add_argument("--out", default="")
    r.add_argument(
        "--since-epoch",
        type=int,
        default=-1,
        dest="since_epoch",
        help="incremental: re-verify only buckets touched since this epoch "
        "(assumes the reconcile at that epoch passed); -1 = full reconcile",
    )
    r.set_defaults(fn=cmd_reconcile)

    lk = sub.add_parser("lookup", help="point lookup of one key (manifest file skipping)")
    lk.add_argument("--table", required=True)
    lk.add_argument("--key-value", required=True, dest="key_value")
    lk.set_defaults(fn=cmd_lookup)

    ch = sub.add_parser("changes", help="change-data-feed between epoch-line points")
    ch.add_argument("--table", required=True)
    ch.add_argument("--checkpoint", default="")
    ch.add_argument("--since-epoch", type=int, required=True, dest="since_epoch")
    ch.add_argument(
        "--to-epoch", type=int, default=-1, dest="to_epoch", help="-1 = current HEAD"
    )
    ch.add_argument("--out", default="", help="write the feed to this parquet path")
    ch.set_defaults(fn=cmd_changes)

    ev = sub.add_parser(
        "events", help="event-time range scan (raw versions, file-skipped)"
    )
    ev.add_argument("--table", required=True)
    ev.add_argument("--from-ts", required=True, dest="from_ts")
    ev.add_argument("--to-ts", required=True, dest="to_ts")
    ev.add_argument("--out", default="")
    ev.set_defaults(fn=cmd_events)

    vac = sub.add_parser(
        "vacuum", help="delete orphan data files no manifest references (driver-side)"
    )
    vac.add_argument("--table", required=True)
    vac.add_argument(
        "--min-age-seconds",
        type=float,
        default=3600.0,
        dest="min_age_seconds",
        help="keep unreferenced files younger than this (in-flight commit guard)",
    )
    vac.set_defaults(fn=cmd_vacuum)

    rbl = sub.add_parser(
        "rebuild-blooms",
        help="recompute novelty blooms from the committed index "
        "(bloom-store loss recovery / geometry resize)",
    )
    rbl.add_argument("--table", required=True)
    rbl.add_argument(
        "--bloom-bits",
        type=int,
        default=1 << 20,
        dest="bloom_bits",
        help="bits per bucket for the rebuilt blooms (must match what "
        "appliers use; the CLI applier always uses this default)",
    )
    rbl.set_defaults(fn=cmd_rebuild_blooms)

    st = sub.add_parser(
        "status", help="table + checkpoint health (driver-side only, no Spark job)"
    )
    st.add_argument("--table", required=True)
    st.add_argument("--checkpoint", default="")
    st.set_defaults(fn=cmd_status)

    q = sub.add_parser("quarantine", help="dead-letter table summary (and optional CSV)")
    q.add_argument("--table", required=True)
    q.add_argument("--out", default="")
    q.set_defaults(fn=cmd_quarantine)

    rd = sub.add_parser(
        "redrive",
        help="re-admit dead-lettered events as a new epoch (DLQ reprocess)",
    )
    rd.add_argument("--table", required=True)
    rd.add_argument("--checkpoint", default="")
    rd.add_argument("--epoch", type=int, required=True,
                    help="NEW (unused) epoch number for the redriven events")
    rd.add_argument("--set", action="append", metavar="COL=SQL_EXPR",
                    help="declarative fix: rewrite COL with a SQL expression "
                         "(repeatable, applied in order)")
    rd.add_argument("--source-epochs", default="",
                    help="comma-separated quarantine epochs to redrive "
                         "(default: every pending one)")
    rd.add_argument("--audit", action="store_true",
                    help="write-audit-publish gate on the redrive epoch: "
                         "reject (exit 2, sources stay pending) if the "
                         "fixed events violate the envelope checks")
    rd.add_argument("--audit-inline", action="store_true",
                    help="collect the audit during the staging write "
                         "(zero extra jobs)")
    rd.set_defaults(fn=cmd_redrive)

    v = sub.add_parser("validate", help="migration validation of OLD/NEW tables")
    v.add_argument("--old", required=True)
    v.add_argument("--new", required=True)
    v.add_argument("--pk", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--required", nargs="*", default=[])
    v.add_argument("--compare", nargs="*", default=[])
    v.add_argument("--allow-deleted", nargs="*", default=[])
    v.add_argument("--allow-added", nargs="*", default=[])
    v.add_argument("--rekey-attr", default="")
    v.add_argument("--empty-is-null", action="store_true")
    v.add_argument(
        "--verification",
        default="",
        help="verification.json sign-off overlay: annotates mismatches and "
        "checks with verified/by/at (reference src/validate.py:21-32)",
    )
    v.add_argument(
        "--profile",
        action="store_true",
        help="also write <out>/profile_{old,new} — per-column count/null/"
        "distinct/min/max/mean/median, one aggregation job per side",
    )
    v.add_argument(
        "--html",
        action="store_true",
        help="also write <out>/report.html — the reference's static report "
        "page (sample-report.html structure) over the computed checks and "
        "the proof-capped mismatch slice",
    )
    v.add_argument(
        "--format-rules",
        nargs="*",
        default=[],
        help="format/type checks as col=rule (email_format, date_format, "
        "numeric, non_negative_number), run on the NEW dataset",
    )
    v.set_defaults(fn=cmd_validate)
    return p


if __name__ == "__main__":
    args = build_parser().parse_args()
    raise SystemExit(args.fn(args))
