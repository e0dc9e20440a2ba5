#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule (BASELINE.json:2,14).

A real multi-executor cluster is unavailable in this sandbox, so the
N-vs-4N-executors criterion is evidenced by running the SAME CDC-apply
job on the SAME pre-generated binlog at two local parallelism levels
(default ``local[8]`` vs ``local[32]``), each in a FRESH JVM (subprocess)
so core counts and memory pools are per-run. The JOB is identical at both
levels — fixed bucket count (a lake table's layout doesn't change with
cluster size), fixed shuffle partitioning (AQE coalesces at the lower
level); only the core count varies.

Methodology for a noisy shared host (this sandbox is a VM with visible
steal time — single-shot wall clocks vary ±3x):

* each worker first replays epoch 0 into a throwaway table (JIT + Python
  worker-pool warmup, untimed), then replays ALL epochs into the real
  table, timed;
* each level is run ``--repeats`` times, interleaved (N, 4N, N, 4N, ...)
  so host noise decorrelates from the level;
* throughput per level = best (min-time) run — the standard noise-robust
  estimator; all samples are reported.

Payloads are Common-Crawl-realistic (~600-1200 words ≈ 4-8 KiB html per
page) so the measured section is dominated by per-event work (LWW
shuffle, Arrow text extraction, parquet encode) rather than fixed driver
overhead.

    efficiency = (events_per_sec_4N / events_per_sec_N) / (4N / N)

Usage:
    python bench_scaling.py                    # gen + interleaved runs
    SPARK_GRAFT_SCALE_LEVELS="8,32" python bench_scaling.py --repeats 3
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

DEFAULT_KEYS = int(os.environ.get("SPARK_GRAFT_SCALE_KEYS", "480000"))
# Default levels are 1 vs 4 cores — the widest N-vs-4N pair where this
# sandbox's hardware itself scales cleanly, so job scaling isn't
# confounded by host contention. Probes (see BENCH.md):
#   pure CPU      : 2->8 procs 1.02 eff, 8->32 only 0.71 (host delivers
#                   ~22 effective cores)
#   memory copy   : 1->4 procs 1.00 eff, 2->8 only 0.70 (shared memory
#                   controllers saturate)
# On a real N->4N-executor cluster each executor brings its own cores AND
# memory bandwidth; 1->4 on one box is the only pair that models that.
LEVELS = [int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "1,4").split(",")]
N_EPOCHS = 3
NUM_BUCKETS = 64
MIN_WORDS, MAX_WORDS = 1500, 3000  # ~10-20 KiB html per page (CC-realistic)


def _mk_cfg(n_keys: int):
    from data_migration_validation_spark.sources.binlog import BinlogConfig

    # ~2.5 versions/key average + 5% redelivery dups
    events_per_epoch = (n_keys * 4) // N_EPOCHS + 1
    return BinlogConfig(
        n_keys=n_keys,
        max_versions=4,
        events_per_epoch=events_per_epoch,
        seed=42,
        hot_fraction_pct=50,
        min_words=MIN_WORDS,
        max_words=MAX_WORDS,
    )


def generate(log_path: str, n_keys: int) -> int:
    """Write the shared binlog once; return event count."""
    from data_migration_validation_spark.session import get_spark
    from data_migration_validation_spark.sources.binlog import synth_binlog

    spark = get_spark(app_name="dmv-scale-gen", master="local[32]", shuffle_partitions=64)
    try:
        cfg = _mk_cfg(n_keys)
        df = synth_binlog(spark, cfg)
        # partition by epoch: an epoch replay reads ONLY its offset slice
        # (binlog-tail shape; partition pruning at the scan)
        df.write.mode("overwrite").partitionBy("batch_epoch").parquet(log_path)
        return spark.read.parquet(log_path).count()
    finally:
        spark.stop()


def worker(log_path: str, cpus: int, n_keys: int) -> None:
    """Fresh-JVM apply run: warmup replay of epoch 0 (untimed), then a
    timed replay of every epoch into a fresh lake table. Prints one JSON
    line {cpus, events, seconds, events_per_sec, final_rows}."""
    from pyspark.sql import functions as F

    from data_migration_validation_spark.plans.apply import CDCApplyEngine
    from data_migration_validation_spark.session import get_spark

    cfg = _mk_cfg(n_keys)
    spark = get_spark(
        app_name=f"dmv-scale-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=64,
    )
    tmp = tempfile.mkdtemp(prefix=f"dmv-scale-{cpus}-")
    try:
        log = spark.read.parquet(log_path)
        events = log.count()

        # -- warmup: JIT, Python worker pool, FS cache (untimed) -------------
        # Workload knobs (BENCH.md discusses all of these):
        #   SPARK_GRAFT_SCALE_MODE=mor|cow   engine merge mode (default mor)
        #   SPARK_GRAFT_SCALE_ENRICH=1       add ingest-time text analysis
        #   SPARK_GRAFT_SCALE_GROUP=k        replay via the group-commit
        #                                    path, k epochs per atomic
        #                                    snapshot (default 1 =
        #                                    sequential, the recorded
        #                                    north-rule shape)
        # The default (mor, no enrich, sequential) matches bench.py and
        # the production default; cow reproduces the round-1 job shape.
        kw = dict(
            num_buckets=NUM_BUCKETS,
            in_batch_prededup=True,
            merge_mode=os.environ.get("SPARK_GRAFT_SCALE_MODE", "mor"),
            enrich_text=os.environ.get("SPARK_GRAFT_SCALE_ENRICH", "0") == "1",
        )
        warm = CDCApplyEngine(
            spark, table_path=f"{tmp}/warm-t", checkpoint_path=f"{tmp}/warm-c", **kw
        )
        warm.apply_epoch(log.where(F.col("batch_epoch") == 0), 0)
        shutil.rmtree(f"{tmp}/warm-t", ignore_errors=True)
        shutil.rmtree(f"{tmp}/warm-c", ignore_errors=True)

        # -- timed full replay ------------------------------------------------
        engine = CDCApplyEngine(
            spark, table_path=f"{tmp}/table", checkpoint_path=f"{tmp}/ckpt", **kw
        )
        group = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_GROUP", "1")))
        t0 = time.monotonic()
        if group > 1:
            engine.replay(
                {
                    e: log.where(F.col("batch_epoch") == e)
                    for e in range(cfg.n_epochs)
                },
                group_size=group,
            )
        else:
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


def _run_worker(cmd: list[str], timeout: int) -> tuple[int | None, str, str]:
    """Run one worker in its OWN process group so a timeout can kill the
    whole tree (python + JVM + pyspark daemons) — a plain subprocess kill
    leaks the grandchild JVM. Returns (returncode, stdout, stderr);
    returncode None means timed out."""
    import signal

    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        start_new_session=True,
    )
    try:
        out, err = proc.communicate(timeout=timeout)
        return proc.returncode, out, err
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()
        return None, "", ""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--log-path", default="")
    ap.add_argument("--keys", type=int, default=DEFAULT_KEYS)
    ap.add_argument("--repeats", type=int, default=3)
    # observed failure mode on this host: a rare lost-wakeup deadlock on
    # the JVM<->Python worker socket (JVM in epoll read, Python blocked
    # mid-write of an Arrow batch) wedges one worker forever. The ladder
    # must survive that: time the worker out, kill its process group,
    # skip the sample, keep the run.
    ap.add_argument("--worker-timeout", type=int, default=1800)
    args = ap.parse_args()

    if args.worker:
        worker(args.log_path, args.cpus, args.keys)
        return

    tmp = tempfile.mkdtemp(prefix="dmv-scaling-")
    log_path = f"{tmp}/log"
    try:
        n_events = generate(log_path, args.keys)
        samples: dict[int, list[dict]] = {c: [] for c in LEVELS}
        # interleave levels so host noise decorrelates from the level
        for rep in range(args.repeats):
            for cpus in LEVELS:
                rc, out, err = _run_worker(
                    [
                        sys.executable, os.path.abspath(__file__),
                        "--worker", "--cpus", str(cpus),
                        "--log-path", log_path, "--keys", str(args.keys),
                    ],
                    timeout=args.worker_timeout,
                )
                if rc is None:
                    sys.stderr.write(
                        f"[scaling] local[{cpus}] rep {rep}: TIMED OUT after "
                        f"{args.worker_timeout}s (wedged worker killed); sample skipped\n"
                    )
                    continue
                if rc != 0:
                    sys.stderr.write(err[-4000:])
                    sys.stderr.write(
                        f"[scaling] local[{cpus}] rep {rep}: worker failed "
                        f"(rc={rc}); sample skipped\n"
                    )
                    continue
                sample = json.loads(out.strip().splitlines()[-1])
                samples[cpus].append(sample)
                # incremental log: a later crash must not lose earlier samples
                sys.stderr.write(
                    f"[scaling] local[{cpus}] rep {rep}: {sample['seconds']}s, "
                    f"{sample['events_per_sec']} events/s\n"
                )
                sys.stderr.flush()
        missing = [c for c in LEVELS if not samples[c]]
        if missing:
            raise SystemExit(f"no surviving samples for levels {missing}")

        best = {c: min(samples[c], key=lambda s: s["seconds"]) for c in LEVELS}
        lo, hi = min(LEVELS), max(LEVELS)
        speedup = best[hi]["events_per_sec"] / best[lo]["events_per_sec"]
        efficiency = speedup / (hi / lo)
        out = {
            "metric": "CDC apply throughput scaling efficiency, "
            f"local[{lo}] vs local[{hi}] (sandbox proxy for N vs 4N executors)",
            "events": n_events,
            "repeats": args.repeats,
            "estimator": "min-time per level, levels interleaved",
            "levels": {
                str(c): {
                    "events_per_sec": best[c]["events_per_sec"],
                    "seconds": best[c]["seconds"],
                    "all_seconds": [s["seconds"] for s in samples[c]],
                }
                for c in LEVELS
            },
            "final_rows_match": len({s["final_rows"] for ss in samples.values() for s in ss}) == 1,
            "speedup": round(speedup, 3),
            "scaling_efficiency": round(efficiency, 3),
            "target": 0.8,
        }
        # a cross-parallelism state divergence is a correctness failure,
        # not a perf number — it must fail the benchmark
        out["pass"] = bool(efficiency >= 0.8 and out["final_rows_match"])
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
