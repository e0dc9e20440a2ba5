"""Skew handling: salt-split hot keys before per-key grouped work.

AQE's skew-join splitting does not cover ``groupBy().applyInPandas``
groupings, so for hot keys (one domain owning ≥50% of a crawl's events is
normal) we salt by hand: an associative per-key reduction runs first per
(key, salt) — spreading one hot key over ``n_salts`` tasks — then once more
per key over the ≤n_salts partial winners. Correct for any associative,
commutative reduction (LWW max is one)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, spread_col: str | Column = "seq", n_salts: int = 16) -> DataFrame:
    """Deterministic salt derived from a high-cardinality column (the log
    sequence number by default) — deterministic so replays partition
    identically."""
    c = F.col(spread_col) if isinstance(spread_col, str) else spread_col
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int"))
