"""Plan-shape guards for the ANN top-k finishers: the final top-k must be
planned as TakeOrderedAndProject (per-partition heaps merged on the
driver), never a global single-partition Window over all scored rows —
the difference between O(k) driver memory and collecting 1e9 rows into
one task at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_migration_validation_spark.operators.similarity import (
    brute_topk,
    ivf_topk,
    lsh_topk,
)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _qvec(spark, sf_dir):
    row = _emb(spark, sf_dir).where(F.col("vec_id") == 0).select("embedding").collect()[0]
    return F.array(*[F.lit(float(x)) for x in row["embedding"]])


def test_brute_topk_plans_take_ordered(spark, sf_dir):
    df = brute_topk(_emb(spark, sf_dir), _qvec(spark, sf_dir), k=5)
    plan = _physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    df.collect()  # plan must also execute


def test_lsh_topk_plans_take_ordered(spark, sf_dir):
    df = lsh_topk(_emb(spark, sf_dir), _qvec(spark, sf_dir), k=5, dim=64)
    plan = _physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    df.collect()


def test_ivf_topk_plans_filter_then_take_ordered(spark, sf_dir):
    """IVF candidate pruning must be a scan-side Filter (assignment is a
    pure expression — no join, no aggregate, no exchange before the
    rerank), finished by TakeOrderedAndProject."""
    row = _emb(spark, sf_dir).where(F.col("vec_id") == 0).select("embedding").collect()[0]
    vals = [float(x) for x in row["embedding"]]
    df = ivf_topk(_emb(spark, sf_dir), vals, k=5, n_list=8, n_probe=2)
    plan = _physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    body = plan.split("TakeOrderedAndProject", 1)[1]
    for op in ("Join", "HashAggregate", "Exchange", "Window"):
        assert op not in body, f"unexpected {op} below the top-k:\n{plan}"
    df.collect()


def test_topk_rank_is_dense_and_ordered(spark, sf_dir):
    rows = brute_topk(_emb(spark, sf_dir), _qvec(spark, sf_dir), k=5).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    cos = [r["cos"] for r in rows]
    assert cos == sorted(cos, reverse=True)
    assert rows[0]["vec_id"] == 0 and rows[0]["cos"] == 1.0
