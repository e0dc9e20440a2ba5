"""SparkSession factory with scale-aware defaults.

Defaults are tuned so the same code runs on ``local[N]`` in tests and on a
multi-executor cluster unchanged: AQE on (runtime coalesce + skew-join),
Arrow on (every Python crossing is vectorized), UTC session timezone (so
results compare bit-for-bit against external oracles such as DuckDB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "data_migration_validation_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; under
    ``spark-submit`` (which supplies ``spark.master`` itself) an explicit
    master is never forced, so the same entrypoint runs unchanged on a
    multi-executor cluster.
    """
    from pyspark import SparkConf

    # Python workers deserialize UDFs by importing this package; they
    # inherit the driver's environment but NOT its sys.path, so a CLI run
    # from outside the repo directory fails with ModuleNotFoundError in
    # the executors. Exporting the package's parent dir on PYTHONPATH
    # before the JVM starts covers local masters; spark-submit --py-files
    # covers real clusters.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py_path = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in py_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_parent}{os.pathsep}{py_path}" if py_path else pkg_parent
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        # spark-submit / cluster managers inject spark.master; only force
        # a local master when none is configured.
        master = None if SparkConf().contains("spark.master") else f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces on COMPRESSED shuffle bytes; web text compresses
        # 10-20x, so the default 1 MiB floor collapses CPU-heavy stages
        # (per-key LWW + Arrow text extraction) onto a handful of tasks.
        # A 64 KiB floor keeps those stages wide without uncoalescing
        # genuinely tiny exchanges. (Found via event-log stage analysis:
        # the dedup+extract stage ran as 13 tasks / 174 s CPU on 32 cores.)
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # TIMESTAMP_MICROS, not the legacy INT96 default: INT96 writes NO
        # parquet column statistics, which blinds both the manifest's
        # event-time file bounds (time-range pruned reads) and any
        # engine's row-group skipping on timestamp predicates.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing for fat rows: the default 10k rows/batch is
        # ~200 MB when rows carry 10-20 KiB web pages, which stalls the
        # JVM->Python pipeline (serialize whole batch before the worker
        # starts) and bloats worker memory. 1k rows keeps batches ~10-20 MB;
        # measured 1.7x faster and 3.4x-vs-2.0x better core scaling on the
        # extraction stage.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
