"""Deterministic stratified sampling: the keep/drop decision must be a
pure function of the key (stable under repartitioning and re-runs),
rates must hold to the 1/256 quantization, nested samples must be strict
subsets, and the plan must be a shuffle-free scan+filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_migration_validation_spark.operators.sampling import (
    BUCKETS,
    stratified_sample,
    uniform_bucket,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")


def test_partitioning_invariance(spark, docs):
    a = stratified_sample(docs, "doc_id", "lang", {"en": 0.5}, 0.25)
    b = stratified_sample(
        docs.repartition(7, "lang"), "doc_id", "lang", {"en": 0.5}, 0.25
    )
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_nested_samples_are_subsets(spark, docs):
    half = {r["doc_id"] for r in stratified_sample(docs, "doc_id", "lang", {}, 0.5).collect()}
    quarter = {r["doc_id"] for r in stratified_sample(docs, "doc_id", "lang", {}, 0.25).collect()}
    assert quarter <= half
    assert len(quarter) < len(half)


def test_rates_hold_per_stratum(spark, docs):
    got = (
        stratified_sample(docs, "doc_id", "lang", {"en": 0.5, "de": 0.25}, 0.0)
        .groupBy("lang")
        .count()
        .collect()
    )
    totals = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    rates = {r["lang"]: r["count"] / totals[r["lang"]] for r in got}
    assert set(rates) == {"en", "de"}  # default 0 drops other strata entirely
    assert rates["en"] == pytest.approx(0.5, abs=0.15)
    assert rates["de"] == pytest.approx(0.25, abs=0.15)


def test_bucket_uniform_range(spark, docs):
    mm = docs.select(uniform_bucket(F.col("doc_id")).alias("b")).agg(
        F.min("b"), F.max("b"), F.count_distinct("b")
    ).collect()[0]
    assert mm[0] >= 0 and mm[1] < BUCKETS
    assert mm[2] > BUCKETS // 2  # spread, not clumped


def test_plan_is_shuffle_free_filter(spark, docs):
    plan = (
        stratified_sample(docs, "doc_id", "lang", {"en": 0.5}, 0.125)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_topk_plan_and_cutoff(spark, sf_dir):
    """Top-K vocabulary must plan TakeOrderedAndProject (per-partition
    heaps), not a global Sort, and the K-boundary must be deterministic."""
    from data_migration_validation_spark.queries_corpus import corpus_vocab_topk

    df = corpus_vocab_topk(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    rows = df.collect()
    assert len(rows) > 0
    # deterministic ordering incl. tie-break on token
    keys = [(-r["n_occurrences"], r["token"]) for r in rows]
    assert keys == sorted(keys)
