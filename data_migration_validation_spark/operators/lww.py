"""Per-key last-writer-wins deduplication/ordering.

The CDC engine's core reduction: given events keyed by ``url`` with total
order ``(warc_ts, seq)``, keep the winning event per key. Out-of-order and
duplicate deliveries collapse here.

Two interchangeable implementations, tested for equality:

* ``lww_window`` — the cheap JVM path: ``row_number()`` over
  ``partitionBy(key).orderBy(ts desc, seq desc)``. Whole-stage-codegen,
  no Python. Default.
* ``lww_apply_in_pandas`` — the north-star path
  (``groupBy(...).applyInPandas``) with **salt-based skew splitting**:
  phase 1 reduces per (key, salt) so a hot key (hot.example.com) spreads
  across tasks; phase 2 reduces the ≤n_salts partial winners per key.
  LWW-max is associative+commutative, so two-phase is exact.

Exact (ts, seq) ties only arise from duplicate redeliveries, which carry
byte-identical payloads, so either copy is the same winner.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_migration_validation_spark.operators.skew import SALT_COL, with_salt


def lww_window(
    df: DataFrame,
    key: str = "url",
    order: Iterable[str] = ("warc_ts", "seq"),
) -> DataFrame:
    ordering = [F.col(c).desc() for c in order]
    w = Window.partitionBy(key).orderBy(*ordering)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def lww_window_bucketed(
    df: DataFrame,
    key: str,
    order: Iterable[str],
    bucket_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """LWW winner per key with the shuffle keyed on ``bucket_col`` instead
    of the key. Because bucket = f(key), all rows of a key land in one
    partition; within it, rows sort by (key, order desc) and the first row
    of each key run wins (lag-based run detection).

    Why: the apply engine writes output partitioned by bucket — doing the
    LWW shuffle on the bucket means the dedup shuffle IS the write
    partitioning, one shuffle instead of two (dedup-by-key + repartition-
    by-bucket). At 1e10 events that's half the shuffle volume of the merge.

    ``num_partitions`` (pass the table's bucket count) PINS the exchange
    via an explicit repartition, which AQE will not coalesce. Without it,
    AQE's parallelism-first coalescing fuses this CPU-fat stage into
    ~#cores giant tasks (web text compresses 10-20×, so the compressed-
    byte targets it reasons over are tiny): measured 5 tasks × ~250 MB
    uncompressed at local[4], i.e. wave quantization + a straggler tail
    that capped 1→4 core scaling at ~0.6. Pinned at the bucket count, the
    job shape is a table property, independent of cluster width — the
    window's required distribution is satisfied by the repartition, so
    it is still exactly ONE shuffle.
    """
    if num_partitions is not None:
        df = df.repartition(num_partitions, F.col(bucket_col))
    ordering = [F.col(key).asc()] + [F.col(c).desc() for c in order]
    w = Window.partitionBy(bucket_col).orderBy(*ordering)
    return (
        df.withColumn("_prev", F.lag(key).over(w))
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col(key)))
        .drop("_prev")
    )


def _winner_fn(order: list[str]):
    def winner(pdf: pd.DataFrame) -> pd.DataFrame:
        # idxmax over a lexicographic sort: sort desc by order cols, take head.
        out = pdf.sort_values(order, ascending=False, kind="mergesort").head(1)
        return out

    return winner


def lww_apply_in_pandas(
    df: DataFrame,
    key: str = "url",
    order: Iterable[str] = ("warc_ts", "seq"),
    n_salts: int = 16,
) -> DataFrame:
    order = list(order)
    schema = df.schema
    fn = _winner_fn(order)
    # Phase 1: per (key, salt) partial winners — a hot key's events split
    # across n_salts groups, so no single task sees the whole hot key.
    salted = with_salt(df, spread_col=order[-1], n_salts=n_salts)
    partial = (
        salted.groupBy(key, SALT_COL)
        .applyInPandas(lambda pdf: fn(pdf), salted.schema)
        .drop(SALT_COL)
    )
    # Phase 2: ≤ n_salts rows per key — final winner.
    return partial.groupBy(key).applyInPandas(lambda pdf: fn(pdf), schema)
