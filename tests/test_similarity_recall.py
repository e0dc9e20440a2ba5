"""ANN-LSH recall vs the brute-force oracle.

The LSH path trades recall for scan volume and nothing else in the suite
bounds that trade — the DuckDB oracle only checks that Spark and DuckDB
agree on the SAME approximate answer, not that the answer is any good.

Two workloads:

* **planted neighbors** — copies of the query vector with small
  deterministic perturbations (cos ≈ 0.99). This is the workload ANN is
  for (near-duplicate retrieval); recall must be ≥ 0.8 at the registry's
  production parameters.
* **uniform-random embeddings** (the raw sf0.01 table) — the adversarial
  case: the true top-10 cosines are ≈ 0.28–0.37, barely above noise, so
  high recall inherently costs scan volume. Multi-probe radius 2 lifts
  recall 0.10 → 0.70 (scanning ~44% of this tiny table; the fraction
  shrinks with corpus size at fixed bucket geometry); the test pins that
  floor so a parameter regression (fewer tables, more bits, radius cut)
  fails loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_migration_validation_spark.operators.similarity import (
    brute_topk,
    ivf_topk,
    lsh_topk,
)
from data_migration_validation_spark.queries_corpus import (
    ANN_K,
    DIM,
    IVF_LIST,
    IVF_PROBE,
    LSH_BITS,
    LSH_PROBE_RADIUS,
    LSH_TABLES,
    _query_vec_values,
    ann_brute_topk,
    ann_ivf_topk,
    ann_lsh_topk,
)

SF_DIR = "/root/testdata/sf0.01"


def test_lsh_recall_planted_neighbors(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vals = _query_vec_values(spark, SF_DIR)
    planted = spark.createDataFrame(
        [
            (900_000 + j, [v + (0.15 if i == j else 0.0) for i, v in enumerate(vals)], 99)
            for j in range(1, 11)
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    df = emb.unionByName(planted)
    qv = F.array(*[F.lit(x) for x in vals])
    k = 11  # query itself + the 10 planted copies
    brute = {r["vec_id"] for r in brute_topk(df, qv, k=k).collect()}
    assert brute == {0} | {900_000 + j for j in range(1, 11)}
    lsh = {
        r["vec_id"]
        for r in lsh_topk(
            df, qv, k=k, n_tables=LSH_TABLES, n_bits=LSH_BITS, dim=DIM,
            query_values=vals, probe_radius=LSH_PROBE_RADIUS,
        ).collect()
    }
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.8, f"planted-neighbor recall@{k} = {recall:.2f} < 0.8"


def test_lsh_recall_floor_uniform(spark):
    brute = {r["vec_id"] for r in ann_brute_topk(spark, SF_DIR).collect()}
    lsh = {r["vec_id"] for r in ann_lsh_topk(spark, SF_DIR).collect()}
    assert len(brute) == ANN_K
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.5, (
        f"uniform-data recall@{ANN_K} = {recall:.2f} < 0.5 — multi-probe "
        f"(radius {LSH_PROBE_RADIUS}) regressed; 0.7 is the measured value "
        "at tables=4, bits=8, radius=2"
    )


def test_ivf_recall_planted_neighbors(spark):
    """Planted near-duplicates of the query land in the query's own
    inverted list (cos ≈ 0.99 to the query ⇒ same nearest centroid), so
    IVF recall on the retrieval workload must be ≥ 0.9."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vals = _query_vec_values(spark, SF_DIR)
    planted = spark.createDataFrame(
        [
            (900_000 + j, [v + (0.15 if i == j else 0.0) for i, v in enumerate(vals)], 99)
            for j in range(1, 11)
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    df = emb.unionByName(planted)
    k = 11
    brute = {r["vec_id"] for r in brute_topk(df, F.array(*[F.lit(x) for x in vals]), k=k).collect()}
    ivf = {
        r["vec_id"]
        for r in ivf_topk(df, vals, k=k, n_list=IVF_LIST, n_probe=IVF_PROBE).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.9, f"planted-neighbor IVF recall@{k} = {recall:.2f} < 0.9"


def test_ivf_recall_floor_uniform(spark):
    """Adversarial uniform data: true neighbors are barely above noise,
    scattered across lists. Pins the measured floor at the registry
    params (n_list=16, n_probe=4 — scanning ~n_probe/n_list of rows)."""
    brute = {r["vec_id"] for r in ann_brute_topk(spark, SF_DIR).collect()}
    ivf = {r["vec_id"] for r in ann_ivf_topk(spark, SF_DIR).collect()}
    assert len(brute) == ANN_K
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.4, (
        f"uniform-data IVF recall@{ANN_K} = {recall:.2f} < 0.4 at "
        f"n_list={IVF_LIST}, n_probe={IVF_PROBE}"
    )
