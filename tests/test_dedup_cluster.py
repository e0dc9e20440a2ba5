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
