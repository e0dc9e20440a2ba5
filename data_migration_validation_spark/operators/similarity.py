"""Approximate-nearest-neighbor search over an embedding column.

* ``brute_topk`` — exact cosine top-k: one scan, vectorized JVM
  expressions (zip_with/aggregate), TopK via orderBy+limit
  (TakeOrderedAndProject — per-partition heaps, no global shuffle). The
  baseline and the oracle.
* ``lsh_topk`` — the scale path: random-hyperplane LSH (deterministic,
  seed-derived hyperplanes) buckets vectors by sign bits; candidates are
  the query's bucket in each of ``n_tables`` hash tables, then exact
  rerank of candidates only. At 1e9 vectors the brute path scans
  everything; the LSH path scans |union of matching buckets|.

Hyperplane h_t,j[i] is a deterministic pseudo-random value in [-0.5, 0.5)
derived from (table, bit, dim) — reproducible in SQL, so even the ANN
path has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_migration_validation_spark.operators.dedup import cosine_sim

_HP_MIX = 48271
_HP_MOD = 2**31 - 1


def _hp_val(t: int, j: int, i: int) -> float:
    """Deterministic hyperplane coefficient in [-0.5, 0.5)."""
    z = ((t * 131071 + j * 8191 + i * 127 + 17) * _HP_MIX) % _HP_MOD
    return z / _HP_MOD - 0.5


def hyperplane_sql(t: int, j: int, i: str | int) -> str:
    """DuckDB expression for _hp_val with i possibly a column expr."""
    return (
        f"(CAST((({t}*131071 + {j}*8191 + ({i})*127 + 17) * {_HP_MIX}) % {_HP_MOD} AS DOUBLE)"
        f" / {_HP_MOD} - 0.5)"
    )


def _topk_ranked(scored: DataFrame, id_col: str, k: int) -> DataFrame:
    """Top-k of (id, cos) with a dense ``rank`` column, planned as
    TakeOrderedAndProject: ``orderBy().limit(k)`` runs a per-partition
    top-k + driver merge (no global single-partition shuffle), then the
    rank window only ever sees the <=k survivors."""
    topk = scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(id_col, "cos", F.col("rank").cast("int").alias("rank"))
    )


def brute_topk(
    df: DataFrame,
    query_vec: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine to ``query_vec`` (a Column, e.g. from a
    broadcast one-row subquery). Deterministic tiebreak on id."""
    scored = df.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), query_vec), 6).alias("cos"),
    )
    return _topk_ranked(scored, id_col, k)


def lsh_bucket_bits(vec_col: Column, table: int, n_bits: int, dim: int) -> Column:
    """Sign-bit bucket key of a vector under table ``table``'s
    hyperplanes: bit j = (dot(h_j, v) > 0)."""
    def dot_hp(j: int) -> Column:
        coeffs = F.array(*[F.lit(_hp_val(table, j, i)) for i in range(dim)])
        return F.aggregate(
            F.zip_with(coeffs, F.transform(vec_col, lambda x: x.cast("double")), lambda h, x: h * x),
            F.lit(0.0),
            lambda s, x: s + x,
        )

    return F.concat_ws(
        "", *[F.when(dot_hp(j) > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(n_bits)]
    )


def lsh_topk(
    df: DataFrame,
    query_vec: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_tables: int = 4,
    n_bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """ANN top-k: candidates = vectors sharing the query's bucket in ANY
    table; exact cosine rerank of candidates. Returns (id, cos, rank) —
    rank within the candidate set."""
    with_buckets = df.select(
        F.col(id_col),
        F.col(vec_col),
        *[lsh_bucket_bits(F.col(vec_col), t, n_bits, dim).alias(f"_bkt{t}") for t in range(n_tables)],
    )
    q_buckets = [lsh_bucket_bits(query_vec, t, n_bits, dim) for t in range(n_tables)]
    cand_pred = None
    for t in range(n_tables):
        p = F.col(f"_bkt{t}") == q_buckets[t]
        cand_pred = p if cand_pred is None else (cand_pred | p)
    candidates = with_buckets.where(cand_pred)
    scored = candidates.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), query_vec), 6).alias("cos"),
    )
    return _topk_ranked(scored, id_col, k)
