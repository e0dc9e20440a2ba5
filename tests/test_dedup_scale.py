"""Scale-shape guards for the dedup suite.

* SimHash blocking must expose a large bucket space (4 x 2^16 segments,
  not 4 x 2^8 bytes) and honor ``max_bucket`` so a boilerplate-heavy
  corpus cannot explode the candidate self-join.
* exact_dedup must aggregate before its exchange (map-side partial
  min(id) per content hash) — the shuffle carries (hash, id), never text.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_migration_validation_spark.functions.hashing import (
    SIMHASH_SEG_BITS,
    SIMHASH_SEGS,
)
from data_migration_validation_spark.operators.dedup import (
    exact_dedup,
    simhash_pairs,
    simhash_segment_values,
)


@pytest.fixture(scope="module")
def skewed_corpus(spark):
    """120 boilerplate near-clones (one hot block) + 80 distinct docs."""
    rows = []
    for i in range(120):
        rows.append((i, "breaking news site boilerplate footer copyright terms privacy contact about us" + (" hot" if i % 2 else "")))
    for i in range(120, 200):
        rows.append((i, f"unique document {i} with words alpha{i} beta{i*7} gamma{i*13} delta epsilon zeta"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_segment_space_is_16_bit(spark, skewed_corpus):
    segs = simhash_segment_values(skewed_corpus, "doc_id", "text").collect()
    assert all(len(r["_segs"]) == SIMHASH_SEGS for r in segs)
    assert all(0 <= v < 2**SIMHASH_SEG_BITS for r in segs for v in r["_segs"])


def test_max_bucket_caps_candidate_pairs(spark, skewed_corpus):
    uncapped = simhash_pairs(skewed_corpus, "doc_id", "text", max_hamming=4).count()
    capped = simhash_pairs(
        skewed_corpus, "doc_id", "text", max_hamming=4, max_bucket=16
    ).count()
    # the two 60-doc boilerplate clone groups contribute 2 * 60*59/2
    # within-group pairs uncapped; max_bucket=16 drops those super-blocks
    # entirely, so the capped run loses at least that quadratic core
    hot_pairs = 2 * (60 * 59 // 2)
    assert uncapped >= hot_pairs
    assert capped <= uncapped - hot_pairs


def test_exact_dedup_partial_min_before_exchange(spark, skewed_corpus):
    df = exact_dedup(skewed_corpus, "doc_id", "text")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan, plan
    # shuffle must not carry the text column
    import re

    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert exchanges and all("text" not in ln for ln in exchanges), exchanges


def test_exact_dedup_finds_identical_texts(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa"), (4, "aa"), (5, "cc")],
        "doc_id long, text string",
    )
    got = sorted(tuple(r) for r in exact_dedup(df, "doc_id", "text").collect())
    assert got == [(1, 3), (1, 4)]
