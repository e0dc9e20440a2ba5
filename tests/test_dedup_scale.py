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


def test_ngram_jaccard_refuses_unblocked_call(spark, skewed_corpus):
    """block_col=None means one global block — a full O(n^2) cross join.
    A public API must fail loudly, not silently plan it."""
    from data_migration_validation_spark.operators.dedup import ngram_jaccard_pairs

    with pytest.raises(ValueError, match="cross\\s*join|O\\(n"):
        ngram_jaccard_pairs(skewed_corpus, "doc_id", "text")

    # explicit opt-in still works for small oracle baselines
    df = ngram_jaccard_pairs(
        skewed_corpus.limit(20), "doc_id", "text", allow_unblocked=True
    )
    assert df.count() >= 0


def test_ngram_jaccard_max_block_drops_hot_blocks(spark):
    """A dominant block (one hot language) is dropped from pair
    expansion, not quadratically expanded; small blocks are unaffected."""
    from data_migration_validation_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(i, "common boilerplate text shared by very many documents here", "en")
            for i in range(50)]
    rows += [(100 + i, "ein kleines deutsches dokument nummer gleich gleich gleich", "de")
             for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    capped = ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.5, block_col="lang", max_block=10
    )
    got = capped.collect()
    assert got, "small de block should still produce pairs"
    assert all(r["a"] >= 100 and r["b"] >= 100 for r in got)  # en block dropped

    uncapped = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5, block_col="lang")
    assert uncapped.count() > len(got)  # the cap really removed the hot block


def test_embedding_neardup_refuses_unblocked_call(spark):
    """Same contract as ngram_jaccard_pairs: block_col=None is a full
    O(n^2) cross join and must fail loudly without an explicit opt-in."""
    from data_migration_validation_spark.operators.dedup import (
        embedding_neardup_pairs,
    )

    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="cross\\s*join|O\\(n"):
        embedding_neardup_pairs(df, "vec_id", "embedding")

    got = embedding_neardup_pairs(
        df, "vec_id", "embedding", allow_unblocked=True
    )
    assert got.count() > 0  # identical i%3 vectors pair up


def test_embedding_neardup_max_block_drops_hot_blocks(spark):
    """A dominant label block is dropped from pair expansion, small
    blocks still pair — mirroring ngram_jaccard_pairs' max_block."""
    from data_migration_validation_spark.operators.dedup import (
        embedding_neardup_pairs,
    )

    rows = [(i, [1.0, 0.0], "hot") for i in range(50)]
    rows += [(100 + i, [0.0, 1.0], "cold") for i in range(4)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    capped = embedding_neardup_pairs(
        df, "vec_id", "embedding", threshold=0.9, block_col="label", max_block=10
    )
    got = capped.collect()
    assert got, "small cold block should still produce pairs"
    assert all(r["a"] >= 100 and r["b"] >= 100 for r in got)

    uncapped = embedding_neardup_pairs(
        df, "vec_id", "embedding", threshold=0.9, block_col="label"
    )
    assert uncapped.count() > len(got)


def test_possible_rekeys_hot_value_guard(spark):
    """A shared default attribute value (count > max_freq) is excluded
    from the rekey join — it would be quadratic in its frequency — and
    surfaced by rekey_hot_values as its own finding."""
    from data_migration_validation_spark.operators.validation import (
        ValidationConfig,
        possible_rekeys,
        rekey_hot_values,
    )

    cfg = ValidationConfig(primary_key="id")
    old = spark.createDataFrame(
        [(i, "default@x.com") for i in range(30)] + [(100, "real@x.com")],
        "id long, email string",
    )
    new = spark.createDataFrame(
        [(1000 + i, "default@x.com") for i in range(30)] + [(200, "real@x.com")],
        "id long, email string",
    )
    guarded = possible_rekeys(old, new, cfg, attr="email", max_freq=10)
    got = [(r["old_pk"], r["new_pk"]) for r in guarded.collect()]
    assert got == [(100, 200)]  # only the genuine rekey; 900 noise pairs gone

    hot = rekey_hot_values(old, new, cfg, attr="email", max_freq=10).collect()
    assert len(hot) == 1 and hot[0]["email"] == "default@x.com"
    assert hot[0]["old_count"] == 30 and hot[0]["new_count"] == 30

    unguarded = possible_rekeys(old, new, cfg, attr="email", max_freq=None)
    assert unguarded.count() == 30 * 30 + 1  # what the guard prevents
