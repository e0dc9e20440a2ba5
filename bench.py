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

# CDC bench scale: ~4 versions/key → ~n_keys*2.5 events (variable version
# count) + redeliveries. 60k keys ≈ 150k events at sf0.1.
CDC_KEYS = {"sf0.001": 2_000, "sf0.01": 12_000, "sf0.1": 60_000}.get(
    os.path.basename(SF_DIR.rstrip("/")), 60_000
)


def main() -> None:
    from pyspark.sql import functions as F

    from data_migration_validation_spark.queries import REGISTRY
    from data_migration_validation_spark.session import get_spark

    spark = get_spark(
        app_name="dmv-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )

    timings: dict[str, float] = {}

    def run(name: str, fn) -> None:
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)

    def consume(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # -- declarative headline queries -------------------------------------
    for qname in [
        "lww_events",
        "val_cell_mismatches",
        "val_only_in_old",
        "val_row_counts",
        "val_duplicates",
    ]:
        fn, _ = REGISTRY[qname]
        run(qname, lambda fn=fn: consume(fn(spark, SF_DIR)))

    # -- flagship: testdata-derived CDC replay ------------------------------
    fn, _ = REGISTRY["cdc_final_state"]
    run("cdc_final_state", lambda: fn(spark, SF_DIR).count())

    # -- north-rule metric: synthetic binlog apply throughput ----------------
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
    events_applied = 0
    try:
        log_path = f"{tmp}/log"
        synth_binlog(spark, cfg).write.mode("overwrite").parquet(log_path)
        log = spark.read.parquet(log_path)
        events_applied = log.count()
        engine = CDCApplyEngine(
            spark,
            table_path=f"{tmp}/table",
            checkpoint_path=f"{tmp}/ckpt",
            num_buckets=CPUS * 2,
            in_batch_prededup=True,  # replay workload: many versions/key/epoch
        )
        t0 = time.monotonic()
        for epoch in range(cfg.n_epochs):
            engine.apply_epoch(log.where(F.col("batch_epoch") == epoch), epoch)
        cdc_secs = time.monotonic() - t0
        timings["cdc_apply"] = round(cdc_secs, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (CDC apply + validation ops)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "cdc_events_applied": events_applied,
                "cdc_events_applied_per_sec": round(events_applied / max(cdc_secs, 1e-9), 1),
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
