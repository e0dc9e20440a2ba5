"""PII scrubbing, Gopher-style repetition metrics, and benchmark
contamination (functions/text.py, operators/quality.py,
operators/contamination.py) — behavioral tests; cross-engine value
parity is pinned by the driver-contract oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_migration_validation_spark.functions.text import (
    EMAIL_RE,
    PHONE_RE,
    PII_PATTERNS,
    pii_count,
    scrub_pii,
)
from data_migration_validation_spark.operators.contamination import (
    contaminated_docs,
)
from data_migration_validation_spark.operators.quality import repetition_stats


# -- PII ----------------------------------------------------------------------

def test_scrub_removes_every_pii_match(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.co.uk and bob@x.io call +1-555-0199 from 10.0.0.1 ok"),
            (2, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    out = df.select(
        pii_count(F.col("text"), EMAIL_RE).alias("e"),
        pii_count(F.col("text"), PHONE_RE).alias("p"),
        scrub_pii(F.col("text")).alias("s"),
    ).collect()
    assert (out[0]["e"], out[0]["p"]) == (2, 1)
    assert "<EMAIL>" in out[0]["s"] and "<PHONE>" in out[0]["s"] and "<IPV4>" in out[0]["s"]
    assert out[1]["s"] == "no pii here at all"
    # scrubbed text must contain zero residual matches of ANY pattern
    residual = df.select(scrub_pii(F.col("text")).alias("s")).select(
        *[pii_count(F.col("s"), p).alias(k) for k, p in PII_PATTERNS.items()]
    ).collect()
    assert all(v == 0 for r in residual for v in r)


def test_scrub_is_scan_only(spark):
    """No shuffle: redaction must stay a projection over the scan."""
    df = spark.createDataFrame([(1, "x@y.io")], "doc_id long, text string")
    plan = (
        df.select(scrub_pii(F.col("text")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# -- repetition ---------------------------------------------------------------

def test_repetition_flags_degenerate_doc(spark):
    diverse = " ".join(f"w{i}" for i in range(40))  # 40 distinct words:
    # top_bigram_frac must stay meaningful — at realistic doc lengths;
    # a 6-word doc would trip the threshold trivially (1/5 > 0.08)
    df = spark.createDataFrame(
        [
            (1, "a a a a a"),   # dup 0.8, top bigram 4/4
            (2, diverse),       # all distinct
            (3, "solo"),        # 1 word → no bigrams → dropped
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["repetitious"] is True
    assert abs(out[1]["dup_word_frac"] - 0.8) < 1e-9
    assert abs(out[1]["top_bigram_frac"] - 1.0) < 1e-9
    assert out[2]["repetitious"] is False
    assert out[2]["dup_word_frac"] == 0.0


def test_dup_word_frac_needs_no_shuffle(spark):
    """The dup-word fraction alone is a scan expression; only the bigram
    side aggregates. Guard: the base projection stays shuffle-free."""
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    from data_migration_validation_spark.functions.text import tokens

    ws = tokens(F.col("text"))
    plan = (
        df.select((1.0 - F.size(F.array_distinct(ws)) / F.size(ws)).alias("f"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# -- contamination ------------------------------------------------------------

def test_contamination_hits_and_misses(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta"),
            (2, "totally unrelated words in this document here"),
            (3, "prefix alpha beta gamma delta epsilon suffix tail"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon",)], "text string"
    )
    got = {r["doc_id"]: r["n_hits"] for r in contaminated_docs(docs, bench, n=5).collect()}
    assert got == {1: 1, 3: 1}  # doc 2 absent, not zero


def test_contamination_counts_distinct_benchmark_grams(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f a b c d e f")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([("a b c d e f",)], "text string")
    # benchmark has 2 distinct 5-grams; the doc repeats them — count stays 2
    got = contaminated_docs(docs, bench, n=5).collect()
    assert got[0]["n_hits"] == 2


def test_contamination_broadcasts_benchmark(spark):
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    bench = spark.createDataFrame([("a b c d e",)], "text string")
    plan = (
        contaminated_docs(docs, bench, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
