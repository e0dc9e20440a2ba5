#!/usr/bin/env python
"""Apply-cost scaling evidence: is an epoch's apply cost proportional to
the EPOCH size or to the TABLE size?

Builds the same base table (~n_keys keys of web-page state) under both
merge modes, then applies incremental epochs of increasing size to each
and measures wall seconds and bytes written per commit. Merge-on-read
(the default) must write O(epoch) bytes; copy-on-write rewrites every
touched bucket — with uniformly hashed keys, effectively the table.

Prints ONE JSON line:
  {"metric": ..., "n_keys": ..., "modes": {"mor": {"<events>": {"seconds":
   s, "bytes_written": b}, ...}, "cow": {...}}, "table_bytes": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_KEYS = int(os.environ.get("SPARK_GRAFT_EPOCHCOST_KEYS", "40000"))
EPOCH_FRACTIONS = (0.02, 0.08, 0.32)  # of n_keys → incremental epoch sizes


def _tree_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from data_migration_validation_spark.plans.apply import CDCApplyEngine
    from data_migration_validation_spark.session import get_spark
    from data_migration_validation_spark.sources.binlog import BinlogConfig, synth_binlog

    spark = get_spark(
        app_name="dmv-epoch-cost", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )

    cfg = BinlogConfig(
        n_keys=N_KEYS, max_versions=3, events_per_epoch=N_KEYS, seed=13, hot_fraction_pct=50
    )
    tmp = tempfile.mkdtemp(prefix="dmv-epochcost-")
    out: dict = {"metric": "incremental-epoch apply cost by merge mode",
                 "n_keys": N_KEYS, "cpus": CPUS, "modes": {}}
    try:
        log_path = f"{tmp}/log"
        synth_binlog(spark, cfg).write.mode("overwrite").parquet(log_path)
        log = spark.read.parquet(log_path)

        for mode in ("mor", "cow"):
            table = f"{tmp}/table-{mode}"
            engine = CDCApplyEngine(
                spark,
                table_path=table,
                checkpoint_path=f"{tmp}/ckpt-{mode}",
                num_buckets=CPUS * 2,
                merge_mode=mode,
                compact_every=None,
            )
            for epoch in range(cfg.n_epochs):
                engine.apply_epoch(log.where(F.col("batch_epoch") == epoch), epoch)
            if mode == "mor":
                engine.lake.compact(spark)  # start incremental phase compacted
            snap = engine.lake.current_snapshot()
            live = [
                fp
                for groups in (snap.file_groups, snap.delta_groups)
                for bb in groups.values()
                for fs in bb.values()
                for fp in fs
            ]
            out.setdefault("table_bytes", sum(os.path.getsize(fp) for fp in live))

            results = {}
            next_epoch = cfg.n_epochs
            for frac in EPOCH_FRACTIONS:
                modulus = max(1, int(1 / frac))
                inc = (
                    log.where((F.xxhash64("url") % modulus == 0) & (F.col("batch_epoch") == 0))
                    .withColumn("seq", F.col("seq") + F.lit(1_000_000) * next_epoch)
                    .withColumn("batch_epoch", F.lit(next_epoch))
                )
                n_inc = inc.count()
                before = _tree_bytes(f"{table}/data")
                t0 = time.monotonic()
                engine.apply_epoch(inc, next_epoch)
                dt = time.monotonic() - t0
                written = _tree_bytes(f"{table}/data") - before
                results[str(n_inc)] = {
                    "seconds": round(dt, 3),
                    "bytes_written": written,
                }
                next_epoch += 1
            out["modes"][mode] = results
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
