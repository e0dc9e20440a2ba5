"""Chunked table checksums and aggregate fingerprints — the low-shuffle
way to compare a 100-TB OLD table to its NEW migration.

The cell-level differ (operators/validation.py O9) is exact but joins
both full tables on the key — the right tool once you KNOW something
differs. These two operators are the cheap first pass, the shape of
pt-table-checksum / data-diff:

* ``chunk_checksums``: hash every row into an order-independent
  per-chunk digest (row count + sum of an md5 prefix), then compare
  O(n_chunks) summary rows instead of O(rows). Each side is ONE
  column-pruned scan + a map-side-combinable aggregate; the join is over
  n_chunks rows — broadcastable at any table size. Chunks that match are
  PROVEN identical (up to md5 collisions); only differing chunks need
  the expensive cell-level pass, turning a full-table diff into a
  drill-down.
* ``aggregate_compare``: per-column count/null/min/max/sum fingerprints,
  melted to (column, metric, old, new, equal) — the sanity sweep a
  migration sign-off reads first.

The md5 prefix is summed as a 64-bit integer: 2^32 max per row, so the
sum overflows only past ~2^31 rows per chunk — size ``n_chunks`` so
chunks stay below that (the default 64 chunks handles 10^11 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

# sentinel for NULL cells — concat_ws would silently drop them, making
# NULL and empty-string rows collide into one digest. Safe against data
# collisions because it joins md5 RENDERINGS: every non-null cell becomes
# exactly 32 hex chars, and "N" is not 32 hex chars, so no cell value can
# impersonate it.
NULL_SENTINEL = "N"

N_CHUNKS = 64


def _row_digest(cols: list[str]) -> F.Column:
    # md5 each column BEFORE joining: fixed-width renderings make the '|'
    # separator unambiguous. Joining raw strings would let values carry
    # the separator across column boundaries — ('a|b','c') and ('a','b|c')
    # would hash identically, breaking the "matching chunk is PROVEN
    # identical" claim.
    rendered = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit(NULL_SENTINEL))
        for c in cols
    ]
    return F.md5(F.concat_ws("|", *rendered))


def chunk_checksums(
    df: DataFrame, key_col: str, cols: list[str], n_chunks: int = N_CHUNKS
) -> DataFrame:
    """(chunk, n_rows, checksum): order-independent per-chunk digest.

    chunk = key mod n_chunks (pmod: negative keys land in [0, n)); the
    checksum is the sum of each row digest's first 8 hex chars as a
    64-bit int — commutative, so no sort and no ordering assumptions.

    ``key_col`` must be numeric (chunk ranges stay humanly mappable back
    to key ranges). A string key would silently cast to NULL under pmod,
    collapsing EVERY row into one null chunk and vacuously "proving" the
    tables identical — refuse instead; chunk string keys (e.g. ``url``)
    by hashing: ``df.withColumn("k", F.pmod(F.xxhash64("url"), N))``.
    """
    kt = df.schema[key_col].dataType
    if not isinstance(kt, NumericType):
        raise ValueError(
            f"chunk_checksums key {key_col!r} is {kt.simpleString()}, not "
            "numeric — pmod would cast it to NULL and fold all rows into "
            "one chunk; derive a numeric chunk key first (e.g. "
            "pmod(xxhash64(key), n_chunks))"
        )
    digest = _row_digest(cols)
    return (
        df.select(
            F.pmod(F.col(key_col), F.lit(n_chunks)).cast("long").alias("chunk"),
            F.conv(F.substring(digest, 1, 8), 16, 10).cast("long").alias("d"),
        )
        .groupBy("chunk")
        .agg(F.count("*").alias("n_rows"), F.sum("d").alias("checksum"))
    )


def checksum_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    cols: list[str],
    n_chunks: int = N_CHUNKS,
) -> DataFrame:
    """Chunks whose contents differ between OLD and NEW — each output row
    is a drill-down target for the exact cell-level differ. A chunk
    missing entirely on one side reports NULL count/checksum there."""
    o = chunk_checksums(old, key_col, cols, n_chunks).select(
        "chunk",
        F.col("n_rows").alias("old_rows"),
        F.col("checksum").alias("old_checksum"),
    )
    n = chunk_checksums(new, key_col, cols, n_chunks).select(
        "chunk",
        F.col("n_rows").alias("new_rows"),
        F.col("checksum").alias("new_checksum"),
    )
    joined = o.join(n, "chunk", "full_outer")
    return joined.where(
        ~(
            F.col("old_rows").eqNullSafe(F.col("new_rows"))
            & F.col("old_checksum").eqNullSafe(F.col("new_checksum"))
        )
    ).orderBy("chunk")


def aggregate_compare(
    old: DataFrame, new: DataFrame, cols: list[str]
) -> DataFrame:
    """(col_name, metric, old_value, new_value, equal): per-column
    nulls/min/max/sum plus a table-level row count, all rendered as
    strings so one melted schema carries every type (min/max/sum require
    numeric ``cols``). ONE aggregate pass per side (all columns in a
    single column-pruned scan), then a join of two ~4·n_cols-row
    summaries — nothing here scales with the table."""

    def summarize(df: DataFrame) -> DataFrame:
        aggs = [F.count("*").cast("string").alias("rows@*")]
        for c in cols:
            aggs += [
                (F.count("*") - F.count(c)).cast("string").alias(f"nulls@{c}"),
                F.min(c).cast("string").alias(f"min@{c}"),
                F.max(c).cast("string").alias(f"max@{c}"),
                F.sum(c).cast("string").alias(f"sum@{c}"),
            ]
        one = df.agg(*aggs)
        pairs = ", ".join(f"'{a.split('@')[0]}', '{a.split('@')[1]}', `{a}`"
                          for a in one.columns)
        # "col_name", not "column" — COLUMN is reserved in the oracle's
        # SQL dialect and the two result schemas must agree by name
        return one.select(
            F.expr(f"stack({len(one.columns)}, {pairs}) AS (metric, col_name, value)")
        )

    o = summarize(old).withColumnRenamed("value", "old_value")
    n = summarize(new).withColumnRenamed("value", "new_value")
    return (
        o.join(n, ["metric", "col_name"], "full_outer")
        .select(
            "col_name",
            "metric",
            "old_value",
            "new_value",
            F.col("old_value").eqNullSafe(F.col("new_value")).alias("equal"),
        )
        .orderBy("col_name", "metric")
    )
