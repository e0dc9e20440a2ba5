#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "cdc_events_applied_per_sec": ...}

The headline number for the north rule is cdc_events_applied_per_sec:
synthetic binlog events (out-of-order, duplicates, tombstones, 50% hot-
domain skew) replayed through the apply engine into a snapshot lake table,
measured end-to-end including commits. Scaling-efficiency evidence
(local[N] vs local[4N]) lives in bench_scaling.py / BENCH.md.

Noise protocol: this host's wall clock swings up to 2-3x run-to-run
(steal bursts — see BENCH.md "host noise"). Every timed unit therefore
runs REPEATS times (default 3) in interleaved rounds (q1..qN, q1..qN, …)
and reports the MIN per unit — a noise burst in one window cannot inflate
a query's recorded number, and the first round doubles as the JVM/JIT
warmup for the later ones. Per-sample values are emitted under "samples"
so the recorded artifact shows its own spread. (Default was 2 through
round 4; observed same-day 2x swings with an idle repo made a third
sample worth its ~30-60 s.)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))

# CDC bench scale: ~4 versions/key → ~n_keys*2.5 events (variable version
# count) + redeliveries. 60k keys ≈ 150k events at sf0.1.
CDC_KEYS = {"sf0.001": 2_000, "sf0.01": 12_000, "sf0.1": 60_000}.get(
    os.path.basename(SF_DIR.rstrip("/")), 60_000
)


def _stream_bench(spark, log, tmp: str, total_events: int, n_slices: int = 12) -> dict:
    """Drive stream_apply over the bench binlog and report per-micro-batch
    latency p50/p95 and throughput from the streaming query's own
    progress records."""
    from data_migration_validation_spark.plans.apply import CDCApplyEngine
    from data_migration_validation_spark.streaming.microbatch import stream_apply

    stream_log = f"{tmp}/stream-log"
    # flat part files (one per future micro-batch); batch_epoch rides
    # along as a plain column — the stream uses batch_id as the epoch
    log.repartition(n_slices).write.mode("overwrite").parquet(stream_log)
    engine = CDCApplyEngine(
        spark,
        table_path=f"{tmp}/stream-table",
        checkpoint_path=f"{tmp}/stream-ckpt",
        num_buckets=CPUS * 2,
    )
    q = stream_apply(
        spark,
        stream_log,
        engine,
        schema=log.schema,
        checkpoint_location=f"{tmp}/stream-qckpt",
        max_files_per_trigger=1,
    )
    q.awaitTermination(1200)
    progress = [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
    if not progress:
        return {}
    lats = sorted(p["durationMs"]["triggerExecution"] / 1000.0 for p in progress)
    # event count from the source log, NOT summed numInputRows: the
    # foreachBatch epoch runs two jobs over the batch (lineage pre-scan +
    # merge), and the file source's row metric counts the re-scan too
    # (observed exactly 2x)
    events = total_events
    busy = sum(lats)

    def pct(q_: float) -> float:
        return round(lats[min(len(lats) - 1, int(q_ * (len(lats) - 1) + 0.5))], 3)

    return {
        "micro_batches": len(lats),
        "events": int(events),
        "events_per_sec": round(events / max(busy, 1e-9), 1),
        "latency_p50_s": pct(0.50),
        "latency_p95_s": pct(0.95),
        "latency_max_s": round(lats[-1], 3),
    }


def main() -> None:
    from pyspark.sql import functions as F

    from data_migration_validation_spark.queries import REGISTRY
    from data_migration_validation_spark.session import get_spark

    spark = get_spark(
        app_name="dmv-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )

    samples: dict[str, list[float]] = {}
    # group-commit replay samples — kept OUT of `samples`/`queries` so the
    # headline suite total stays comparable across rounds (the grouped
    # replay is an alternative path over the same work, not a new unit)
    grouped_samples: list[float] = []

    def run(name: str, fn) -> None:
        t0 = time.monotonic()
        fn()
        samples.setdefault(name, []).append(round(time.monotonic() - t0, 3))

    def consume(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # -- synthetic binlog for the north-rule metric (generated once,
    # outside any timed window) --------------------------------------------
    from data_migration_validation_spark.plans.apply import CDCApplyEngine
    from data_migration_validation_spark.sources.binlog import (
        BinlogConfig,
        synth_binlog,
    )

    cfg = BinlogConfig(
        n_keys=CDC_KEYS,
        max_versions=4,
        events_per_epoch=max(10_000, CDC_KEYS),
        seed=42,
        hot_fraction_pct=50,
    )
    tmp = tempfile.mkdtemp(prefix="dmv-bench-")
    try:
        log_path = f"{tmp}/log"
        # epoch-partitioned: each timed epoch read prunes to one directory
        synth_binlog(spark, cfg).write.mode("overwrite").partitionBy(
            "batch_epoch"
        ).parquet(log_path)
        log = spark.read.parquet(log_path)
        events_applied = log.count()

        def cdc_apply_once(run_id: int) -> None:
            # fresh table/checkpoint dirs per sample: each sample measures a
            # full from-empty replay, never a warm resume no-op
            work = f"{tmp}/run{run_id}"
            engine = CDCApplyEngine(
                spark,
                table_path=f"{work}/table",
                checkpoint_path=f"{work}/ckpt",
                num_buckets=CPUS * 2,
            )
            for epoch in range(cfg.n_epochs):
                engine.apply_epoch(log.where(F.col("batch_epoch") == epoch), epoch)
            shutil.rmtree(work, ignore_errors=True)

        def cdc_apply_grouped_once(run_id: int) -> None:
            # the SAME replay through the group-commit path (one shuffle +
            # one atomic snapshot for all pending epochs — the backlog
            # catch-up shape). Reported SEPARATELY from cdc_apply: the
            # headline metric keeps per-epoch snapshot granularity; this
            # one measures what a behind-the-log replayer actually pays.
            work = f"{tmp}/grun{run_id}"
            engine = CDCApplyEngine(
                spark,
                table_path=f"{work}/table",
                checkpoint_path=f"{work}/ckpt",
                num_buckets=CPUS * 2,
            )
            engine.replay(
                {
                    e: log.where(F.col("batch_epoch") == e)
                    for e in range(cfg.n_epochs)
                },
                group_size=cfg.n_epochs,
            )
            shutil.rmtree(work, ignore_errors=True)

        # -- interleaved rounds: every unit once per round, min over rounds --
        declarative = [
            "lww_events",
            "val_cell_mismatches",
            "val_only_in_old",
            "val_row_counts",
            "val_duplicates",
        ]
        for rnd in range(REPEATS):
            for qname in declarative:
                fn, _ = REGISTRY[qname]
                run(qname, lambda fn=fn: consume(fn(spark, SF_DIR)))
            # the PLAIN flagship replay — the registry slot is the
            # twin-checked variant (plain + audited, cross-asserted) and
            # timing it would double the benchmark's defined unit
            from data_migration_validation_spark.queries import cdc_final_state

            run("cdc_final_state", lambda: cdc_final_state(spark, SF_DIR).count())
            run("cdc_apply", lambda rnd=rnd: cdc_apply_once(rnd))
            t0 = time.monotonic()
            cdc_apply_grouped_once(rnd)
            grouped_samples.append(round(time.monotonic() - t0, 3))

        # -- streaming front-end: per-micro-batch latency ------------------
        # The same binlog driven through stream_apply (readStream →
        # foreachBatch → epoch commit), sliced into ~12 files so
        # maxFilesPerTrigger=1 yields a latency DISTRIBUTION, not 3
        # samples. Latency = Spark's own per-trigger durationMs (includes
        # planning + the epoch's commit); untimed by wall clock, so host
        # noise shows up inside the percentiles like it would in prod.
        streaming = _stream_bench(spark, log, tmp, events_applied)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    timings = {name: min(vals) for name, vals in samples.items()}
    cdc_secs = timings["cdc_apply"]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (CDC apply + validation ops)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "samples": samples,
                "repeats": REPEATS,
                "sf": SF_DIR,
                "cdc_events_applied": events_applied,
                "cdc_events_applied_per_sec": round(events_applied / max(cdc_secs, 1e-9), 1),
                "cdc_apply_grouped": {
                    "seconds": min(grouped_samples),
                    "samples": grouped_samples,
                    "group_size": cfg.n_epochs,
                    "events_per_sec": round(
                        events_applied / max(min(grouped_samples), 1e-9), 1
                    ),
                },
                "streaming": streaming,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
