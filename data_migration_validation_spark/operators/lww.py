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
