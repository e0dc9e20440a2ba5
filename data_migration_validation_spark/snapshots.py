"""Deterministic OLD/NEW snapshot pair derived from the driver's
``customer`` table — the migration-validation workload (reference
sample_data semantics: seeded mutations, deletions, additions, rekeys,
duplicates, nulls) expressed twice, once as DataFrame ops and once as SQL
CTEs, so every validation operator gets a DuckDB oracle.

Seeded defects (all pure functions of c_custkey, so Spark and SQL agree):
  deletions   : c_custkey % 97 == 3   (odd ones allowlisted)
  rekeys      : c_custkey % 103 == 9  → reappears as c_custkey + 2_000_000
  additions   : c_custkey % 101 == 7  → extra key c_custkey + 1_000_000
  name edit   : c_custkey % 13 == 1   → ' Jr.' suffix (reference mismatch
                flavor, output/mismatches.csv:2)
  balance edit: c_custkey % 17 == 2   → +100.00 (decimal-exact)
  segment flip: c_custkey % 19 == 5   → 'MIGRATED'
  null seed   : c_custkey % 23 == 4   → c_mktsegment NULL
  duplicate   : c_custkey % 107 == 11 → row inserted twice in NEW

c_acctbal is cast to DECIMAL(12,2) in BOTH derivations so arithmetic and
string rendering are bit-identical across engines (double '+100' would
render differently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BAL = "cast(c_acctbal as decimal(12,2))"


def old_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return c.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.expr(BAL).alias("c_acctbal"),
        "c_mktsegment",
    )


def new_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = old_customers(spark, sf_dir)
    k = F.col("c_custkey")
    mutated = c.where(~((k % 97 == 3) | (k % 103 == 9))).select(
        k.alias("c_custkey"),
        F.when(k % 13 == 1, F.concat(F.col("c_name"), F.lit(" Jr."))).otherwise(F.col("c_name")).alias("c_name"),
        F.col("c_nationkey"),
        F.when(k % 17 == 2, F.col("c_acctbal") + F.lit(100).cast("decimal(12,2)"))
        .otherwise(F.col("c_acctbal"))
        .cast("decimal(12,2)")
        .alias("c_acctbal"),
        F.when(k % 23 == 4, F.lit(None).cast("string"))
        .when(k % 19 == 5, F.lit("MIGRATED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    additions = c.where(k % 101 == 7).select(
        (k + 1_000_000).alias("c_custkey"),
        F.concat(F.lit("Customer#NEW"), k.cast("string")).alias("c_name"),
        F.col("c_nationkey"),
        F.col("c_acctbal"),
        F.col("c_mktsegment"),
    )
    rekeys = c.where(k % 103 == 9).select(
        (k + 2_000_000).alias("c_custkey"),
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    dups = mutated.where(F.col("c_custkey") % 107 == 11)
    return mutated.unionByName(additions).unionByName(rekeys).unionByName(dups)


# SQL CTE prelude reproducing the same pair for DuckDB oracles. Usage:
#   f"{SNAPSHOT_CTES} SELECT ... FROM old_snap ..."
SNAPSHOT_CTES = f"""
WITH old_snap AS (
  SELECT c_custkey, c_name, c_nationkey, {BAL} AS c_acctbal, c_mktsegment
  FROM customer
),
mutated AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 13 = 1 THEN c_name || ' Jr.' ELSE c_name END AS c_name,
         c_nationkey,
         CAST(CASE WHEN c_custkey % 17 = 2 THEN c_acctbal + CAST(100 AS DECIMAL(12,2))
              ELSE c_acctbal END AS DECIMAL(12,2)) AS c_acctbal,
         CASE WHEN c_custkey % 23 = 4 THEN NULL
              WHEN c_custkey % 19 = 5 THEN 'MIGRATED'
              ELSE c_mktsegment END AS c_mktsegment
  FROM old_snap
  WHERE NOT (c_custkey % 97 = 3 OR c_custkey % 103 = 9)
),
new_snap AS (
  SELECT * FROM mutated
  UNION ALL
  SELECT c_custkey + 1000000, 'Customer#NEW' || c_custkey, c_nationkey, c_acctbal, c_mktsegment
  FROM old_snap WHERE c_custkey % 101 = 7
  UNION ALL
  SELECT c_custkey + 2000000, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM old_snap WHERE c_custkey % 103 = 9
  UNION ALL
  SELECT * FROM mutated WHERE c_custkey % 107 = 11
)
"""

# allowlist predicates (same both sides)
ALLOWED_DELETIONS_SQL = "(c_custkey % 97 = 3 AND c_custkey % 2 = 1)"
ALLOWED_ADDITIONS_SQL = "(c_custkey >= 1000000 AND c_custkey < 2000000 AND c_custkey % 2 = 1)"


def allowed_deletions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allowlist as a DataFrame — consumers broadcast-join it; the key set
    scales with the data, so it must never be collected to the driver."""
    return (
        old_customers(spark, sf_dir)
        .where("c_custkey % 97 = 3 AND c_custkey % 2 = 1")
        .select("c_custkey")
    )


def allowed_additions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        new_customers(spark, sf_dir)
        .where("c_custkey >= 1000000 AND c_custkey < 2000000 AND c_custkey % 2 = 1")
        .select("c_custkey")
    )
