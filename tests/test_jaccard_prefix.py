"""Prefix-filtered exact n-gram Jaccard (AllPairs/PPJoin shape) must be
row-identical to the quadratic baseline — the property that lets the
registry slot twin them over one oracle. Plus the completeness edge
cases the pigeonhole proof leans on: exact-threshold intersections,
short docs (< k tokens), singleton sets, and a hot stop-shingle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_migration_validation_spark.operators.dedup import (
    ngram_jaccard_pairs,
    ngram_jaccard_prefix_pairs,
)


def _rows(df):
    return sorted(
        (r["a"], r["b"], r["jaccard"]) for r in df.collect()
    )


def _assert_same(quad, pref):
    rq, rp = _rows(quad), _rows(pref)
    assert rq == rp, (
        f"prefix-filtered pairs diverge from the quadratic baseline: "
        f"only-quad={set(rq) - set(rp)}, only-prefix={set(rp) - set(rq)}"
    )


def _synth_corpus(spark, n_docs=80, vocab=14, seed=7):
    """Random base docs over a small vocabulary, plus seeded mutations of
    earlier docs (append / replace / truncate / exact copy) so EVERY seed
    produces pairs on both sides of every threshold — purely random draws
    almost never share 3-token shingles, and an all-empty result only
    proves both plans found nothing. Includes short docs (1–2 tokens →
    whole-string shingle) and corpus-saturating hot shingles (the case
    frequency ordering exists for)."""
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    rows = []
    for i in range(n_docs):
        if i >= 10 and rng.random() < 0.5:
            base = rows[int(rng.integers(0, len(rows)))][1].split()
            kind = int(rng.integers(0, 4))
            if kind == 0:  # append a token — high-but-<1 jaccard
                base = base + [str(rng.choice(words))]
            elif kind == 1 and len(base) > 1:  # replace one token
                base[int(rng.integers(0, len(base)))] = str(rng.choice(words))
            elif kind == 2 and len(base) > 2:  # truncate — length-filter edge
                base = base[: int(rng.integers(1, len(base)))]
            # kind 3: exact copy — jaccard 1.0
            text = " ".join(base)
        else:
            n = int(rng.integers(1, 12))
            text = " ".join(rng.choice(words, size=n))
        rows.append((i, text, f"b{int(rng.integers(0, 2))}"))
    return spark.createDataFrame(rows, "doc_id int, text string, blk string")


@pytest.mark.parametrize(
    "threshold,seed",
    [(0.3, 7), (0.5, 7), (0.6, 7), (0.75, 7), (1.0, 7), (0.4, 11), (0.66, 23)],
)
def test_prefix_matches_quadratic_unblocked(spark, threshold, seed):
    df = _synth_corpus(spark, seed=seed)
    quad = ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=threshold, shingle_k=3,
        allow_unblocked=True,
    )
    pref = ngram_jaccard_prefix_pairs(
        df, "doc_id", "text", threshold=threshold, shingle_k=3
    )
    _assert_same(quad, pref)
    # mutation seeding guarantees the corpus exercises the match path
    # (empty == empty would prove nothing)
    assert len(_rows(quad)) > 0


def test_prefix_matches_quadratic_blocked(spark, sf_dir):
    from data_migration_validation_spark.queries_corpus import (
        JACCARD_T,
        SHINGLE_K,
        corpus,
    )

    df = corpus(spark, sf_dir)
    quad = ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=JACCARD_T, shingle_k=SHINGLE_K,
        block_col="lang",
    )
    pref = ngram_jaccard_prefix_pairs(
        df, "doc_id", "text", threshold=JACCARD_T, shingle_k=SHINGLE_K,
        block_col="lang",
    )
    _assert_same(quad, pref)
    assert len(_rows(quad)) > 0  # seeded exact copies guarantee matches


def test_exact_threshold_boundary(spark):
    """jaccard == t exactly (integral t·n) — the tightest case for the
    ceil in the prefix length: 3 shared of 4∪6−... engineered pairs
    whose jaccard lands exactly on the threshold must be FOUND, not
    lost to a one-off-short prefix."""
    # doc shingle sets via 1-token shingles (k=1 == tokens themselves)
    rows = [
        (1, "a b c d", "x"),       # {a,b,c,d}
        (2, "a b c d e f g h", "x"),  # superset: jac = 4/8 = 0.5
        (3, "a b c e", "x"),        # jac(1,3) = 3/5 = 0.6
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, blk string")
    for t in (0.5, 0.6):
        quad = ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=t, shingle_k=1, allow_unblocked=True
        )
        pref = ngram_jaccard_prefix_pairs(
            df, "doc_id", "text", threshold=t, shingle_k=1
        )
        _assert_same(quad, pref)
        assert (1, 2, 0.5) in _rows(quad) or t > 0.5
        assert (1, 3, 0.6) in _rows(quad)


def test_null_text_defined_out(spark):
    rows = [(1, None, "x"), (2, None, "x"), (3, "a b c", "x"), (4, "a b c", "x")]
    df = spark.createDataFrame(rows, "doc_id int, text string, blk string")
    got = _rows(
        ngram_jaccard_prefix_pairs(df, "doc_id", "text", threshold=0.5, shingle_k=1)
    )
    assert got == [(3, 4, 1.0)]  # null texts never pair


def test_threshold_zero_refused(spark):
    df = spark.createDataFrame([(1, "a", "x")], "doc_id int, text string, blk string")
    with pytest.raises(ValueError, match="threshold > 0"):
        ngram_jaccard_prefix_pairs(df, "doc_id", "text", threshold=0.0)


def test_no_cross_join_in_plan(spark):
    """The scale claim, asserted on the physical plan: no cartesian /
    nested-loop join anywhere — every join is an equi-join (prefix
    shingle candidates + hash-keyed verify)."""
    df = _synth_corpus(spark, n_docs=20)
    plan = ngram_jaccard_prefix_pairs(
        df, "doc_id", "text", threshold=0.6
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
