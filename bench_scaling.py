#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule (BASELINE.json:2,14).

A real multi-executor cluster is unavailable in this sandbox, so the
N-vs-4N-executors criterion is evidenced by running the SAME CDC-apply
job on the SAME pre-generated binlog at two local parallelism levels
(default ``local[8]`` vs ``local[32]``), each in a FRESH JVM (subprocess)
so core counts, shuffle partitioning, and memory pools are per-run.

Measured section = the epoch apply loop only (binlog already on disk;
SparkSession startup excluded on both sides — identical fixed cost).
Output: one JSON line with throughput at both levels and

    efficiency = (events_per_sec_4N / events_per_sec_N) / (4N / N)

Results are also appended by hand to BENCH.md (see repo root).

Usage:
    python bench_scaling.py                 # full driver: gen + 8 + 32
    python bench_scaling.py --keys 300000   # bigger input
    SPARK_GRAFT_SCALE_LEVELS="4,16" python bench_scaling.py
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_KEYS = int(os.environ.get("SPARK_GRAFT_SCALE_KEYS", "240000"))
LEVELS = [int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "8,32").split(",")]
EVENTS_PER_EPOCH_EPOCHS = 3  # few, fat epochs: commit overhead amortized


def _mk_cfg(n_keys: int):
    from data_migration_validation_spark.sources.binlog import BinlogConfig

    # ~2.5 versions/key average + 5% redelivery dups
    events_per_epoch = (n_keys * 4) // EVENTS_PER_EPOCH_EPOCHS + 1
    return BinlogConfig(
        n_keys=n_keys,
        max_versions=4,
        events_per_epoch=events_per_epoch,
        seed=42,
        hot_fraction_pct=50,
    )


def generate(log_path: str, n_keys: int) -> int:
    """Write the shared binlog once; return event count."""
    from data_migration_validation_spark.session import get_spark
    from data_migration_validation_spark.sources.binlog import synth_binlog

    spark = get_spark(app_name="dmv-scale-gen", master="local[32]", shuffle_partitions=64)
    try:
        cfg = _mk_cfg(n_keys)
        df = synth_binlog(spark, cfg)
        df.write.mode("overwrite").parquet(log_path)
        return spark.read.parquet(log_path).count()
    finally:
        spark.stop()


def worker(log_path: str, cpus: int, n_keys: int) -> None:
    """Fresh-JVM apply run: read the shared log, replay every epoch into a
    temp lake table, print one JSON line {cpus, events, seconds, eps}."""
    from pyspark.sql import functions as F

    from data_migration_validation_spark.plans.apply import CDCApplyEngine
    from data_migration_validation_spark.session import get_spark

    cfg = _mk_cfg(n_keys)
    spark = get_spark(
        app_name=f"dmv-scale-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    tmp = tempfile.mkdtemp(prefix=f"dmv-scale-{cpus}-")
    try:
        log = spark.read.parquet(log_path)
        events = log.count()  # warm the FS cache / commit file listing
        engine = CDCApplyEngine(
            spark,
            table_path=f"{tmp}/table",
            checkpoint_path=f"{tmp}/ckpt",
            num_buckets=cpus * 2,
        )
        t0 = time.monotonic()
        for epoch in range(cfg.n_epochs):
            engine.apply_epoch(log.where(F.col("batch_epoch") == epoch), epoch)
        secs = time.monotonic() - t0
        final_rows = engine.read_final().count()
        print(
            json.dumps(
                {
                    "cpus": cpus,
                    "events": events,
                    "seconds": round(secs, 3),
                    "events_per_sec": round(events / secs, 1),
                    "final_rows": final_rows,
                }
            )
        )
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--log-path", default="")
    ap.add_argument("--keys", type=int, default=DEFAULT_KEYS)
    args = ap.parse_args()

    if args.worker:
        worker(args.log_path, args.cpus, args.keys)
        return

    tmp = tempfile.mkdtemp(prefix="dmv-scaling-")
    log_path = f"{tmp}/log"
    try:
        n_events = generate(log_path, args.keys)
        results = {}
        for cpus in LEVELS:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--worker",
                    "--cpus",
                    str(cpus),
                    "--log-path",
                    log_path,
                    "--keys",
                    str(args.keys),
                ],
                capture_output=True,
                text=True,
                timeout=3600,
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-4000:])
                raise SystemExit(f"worker local[{cpus}] failed")
            results[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])

        lo, hi = min(LEVELS), max(LEVELS)
        speedup = results[hi]["events_per_sec"] / results[lo]["events_per_sec"]
        efficiency = speedup / (hi / lo)
        out = {
            "metric": "CDC apply throughput scaling efficiency, "
            f"local[{lo}] vs local[{hi}] (sandbox proxy for N vs 4N executors)",
            "events": n_events,
            "levels": {
                str(c): {
                    "events_per_sec": results[c]["events_per_sec"],
                    "seconds": results[c]["seconds"],
                }
                for c in LEVELS
            },
            "final_rows_match": len({results[c]["final_rows"] for c in LEVELS}) == 1,
            "speedup": round(speedup, 3),
            "scaling_efficiency": round(efficiency, 3),
            "target": 0.8,
            "pass": efficiency >= 0.8,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
