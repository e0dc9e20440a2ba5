"""Persisted ANN indexes: build once, query with partition pruning.

The inline ``ivf_topk``/``lsh_topk`` recompute centroid assignment /
bucket bits per query — fine for one-shot jobs, wrong for a serving
index. ``IvfIndex``/``LshIndex`` write the table partitioned by list id
/ bucket key so a query's probe filter resolves to DIRECTORIES at
planning time: the plan must show PartitionFilters, results must equal
the inline operators, and a partial (crashed) build must be unqueryable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_migration_validation_spark.operators.similarity import (
    IvfIndex,
    LshIndex,
    brute_topk,
    ivf_topk,
    lsh_topk,
)

SF_DIR = "/root/testdata/sf0.01"
DIM = 16
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvals(spark, emb):
    row = emb.orderBy("vec_id").limit(1).collect()[0]
    return [float(x) for x in row["embedding"]]


def _qcol(qvals):
    return F.array(*[F.lit(float(x)) for x in qvals])


def _rows(df):
    return [(r["vec_id"], r["cos"], r["rank"]) for r in df.collect()]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ivf_index_matches_inline_operator(spark, tmp_path, emb, qvals):
    idx = IvfIndex.build(emb, str(tmp_path / "ivf"), n_list=16)
    got = _rows(idx.topk(spark, qvals, k=K, n_probe=4))
    want = _rows(ivf_topk(emb, qvals, k=K, n_list=16, n_probe=4))
    assert got == want  # same codebook derivation → identical answer


def test_ivf_query_plan_prunes_partitions(spark, tmp_path, emb, qvals):
    idx = IvfIndex.build(emb, str(tmp_path / "ivf"), n_list=16)
    cand = idx.candidates(spark, qvals, n_probe=4)
    plan = _plan(cand)
    assert "PartitionFilters" in plan and "_list_id" in plan.split("PartitionFilters", 1)[1]
    # the pruned scan reads a strict subset of the lists
    total = spark.read.parquet(str(tmp_path / "ivf" / "lists")).count()
    assert 0 < cand.count() < total


def test_ivf_partial_build_is_unqueryable(spark, tmp_path, emb):
    """The codebook is written LAST; a build that crashed before it must
    refuse to open rather than serve a half-written index."""
    import os

    emb.limit(5).write.mode("overwrite").parquet(str(tmp_path / "broken" / "lists"))
    assert not os.path.exists(str(tmp_path / "broken" / "codebook.json"))
    with pytest.raises(FileNotFoundError):
        IvfIndex(str(tmp_path / "broken"))


def test_lsh_index_matches_inline_operator(spark, tmp_path, emb, qvals):
    idx = LshIndex.build(
        emb, str(tmp_path / "lsh"), n_tables=4, n_bits=8, dim=DIM
    )
    got = idx.topk(spark, qvals, k=K, probe_radius=1)
    want = lsh_topk(
        emb, _qcol(qvals), k=K, n_tables=4, n_bits=8, dim=DIM,
        query_values=qvals, probe_radius=1,
    )
    assert _rows(got) == _rows(want)


def test_lsh_build_is_one_pass(spark, tmp_path, emb, qvals, monkeypatch):
    """The build must write all n_tables hash tables in ONE job over the
    input (explode to (t, _bucket) rows, one partitioned write) — the
    round-4 verdict flagged the previous n_tables sequential full scans."""
    from pyspark.sql.readwriter import DataFrameWriter

    calls = {"n": 0}
    real = DataFrameWriter.parquet

    def counting(self, *a, **kw):
        calls["n"] += 1
        return real(self, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", counting)
    idx = LshIndex.build(emb, str(tmp_path / "lsh1p"), n_tables=4, n_bits=8, dim=DIM)
    assert calls["n"] == 1, f"build ran {calls['n']} write jobs"
    # layout and answers unchanged
    got = idx.topk(spark, qvals, k=K, probe_radius=1)
    want = lsh_topk(
        emb, _qcol(qvals), k=K, n_tables=4, n_bits=8, dim=DIM,
        query_values=qvals, probe_radius=1,
    )
    assert _rows(got) == _rows(want)


def test_lsh_query_plan_prunes_partitions(spark, tmp_path, emb, qvals):
    idx = LshIndex.build(emb, str(tmp_path / "lsh"), n_tables=2, n_bits=8, dim=DIM)
    out = idx.topk(spark, qvals, k=K, probe_radius=1)
    plan = _plan(out)
    assert "PartitionFilters" in plan
    assert "_bucket" in plan.split("PartitionFilters", 1)[1]


def test_indexed_recall_not_below_inline(spark, tmp_path, emb, qvals):
    """Persisting must not change the recall story the inline operators
    already pin — identical candidates, identical rerank."""
    truth = {r["vec_id"] for r in brute_topk(emb, _qcol(qvals), k=K).collect()}
    idx = IvfIndex.build(emb, str(tmp_path / "ivf"), n_list=16)
    got = {r["vec_id"] for r in idx.topk(spark, qvals, k=K, n_probe=4).collect()}
    inline = {r["vec_id"] for r in ivf_topk(emb, qvals, k=K, n_list=16, n_probe=4).collect()}
    assert len(got & truth) == len(inline & truth)
