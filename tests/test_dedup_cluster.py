"""connected_components: transitive closure of dup pairs into clusters —
chains that need multiple propagation rounds, disjoint components, and
the non-convergence guard."""

from __future__ import annotations

import pytest

from data_migration_validation_spark.operators.dedup import connected_components


def _clusters(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "a long, b long")
    out = connected_components(df, "a", "b", **kw)
    assert out.columns == ["member_id", "cluster_id"]
    got = {}
    for r in out.collect():
        assert r["member_id"] not in got, "member assigned twice"
        got[r["member_id"]] = r["cluster_id"]
    return got


def test_chain_and_disjoint_components(spark):
    # chain 1-2-3-4 (diameter 3 → needs >1 round), pair 10-11, triangle 20-21-22
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    got = _clusters(spark, pairs)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_long_chain_converges(spark):
    # path 0-1-...-9: min label must travel the full diameter
    got = _clusters(spark, [(i, i + 1) for i in range(9)])
    assert set(got.values()) == {0}
    assert len(got) == 10


def test_pair_order_irrelevant(spark):
    # edges given "backwards" (big id first) — same closure
    got = _clusters(spark, [(5, 3), (3, 8), (8, 1)])
    assert got == {1: 1, 3: 1, 5: 1, 8: 1}


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _clusters(spark, [(i, i + 1) for i in range(9)], max_iters=2)


def test_star_matches_label_on_mixed_graph(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    assert _clusters(spark, pairs, algorithm="star") == _clusters(spark, pairs)


def test_star_long_chain_in_log_rounds(spark):
    """A 50-vertex path needs ~50 label-propagation rounds (min label
    moves one hop per round) but only O(log n) large-star/small-star
    rounds — max_iters=10 proves the logarithmic bound while label
    propagation is given the same budget and must fail."""
    chain = [(i, i + 1) for i in range(49)]
    got = _clusters(spark, chain, algorithm="star", max_iters=10)
    assert set(got.values()) == {0}
    assert len(got) == 50
    with pytest.raises(RuntimeError, match="did not converge"):
        _clusters(spark, chain, algorithm="label", max_iters=10)


def test_star_pair_order_irrelevant(spark):
    got = _clusters(spark, [(5, 3), (3, 8), (8, 1)], algorithm="star")
    assert got == {1: 1, 3: 1, 5: 1, 8: 1}


def test_unknown_algorithm_raises(spark):
    with pytest.raises(ValueError, match="unknown algorithm"):
        _clusters(spark, [(1, 2)], algorithm="bogus")
