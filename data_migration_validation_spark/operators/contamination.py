"""Benchmark contamination detection: which corpus documents contain any
n-gram from a (small) benchmark/eval set.

The standard decontamination step before LLM training (GPT-3 appendix C,
PaLM §6; typically 8–13-gram overlap): the benchmark side is tiny — a
few thousand eval questions — so its n-gram set broadcasts, and the scan
side explodes each document's n-grams once and broadcast-semi-joins.
At 100 TB the plan is: one pass over the corpus, no shuffle of document
text, BroadcastHashJoin on the exploded grams; the only aggregation is
per-doc hit counting on (doc_id, gram) — map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def text_ngrams(text_col: str, n: int) -> F.Column:
    """Word n-grams of a text column as an array<string> — pure
    expression (split → sequence → transform → concat_ws)."""
    ws = f"filter(split(trim({text_col}), '\\\\s+'), t -> t != '')"
    joined = ", ".join(f"{ws}[i-1+{j}]" for j in range(n))
    return F.expr(
        f"CASE WHEN size({ws}) >= {n} THEN "
        f"transform(sequence(1, size({ws}) - {n - 1}), i -> concat_ws(' ', {joined})) "
        f"ELSE array() END"
    )


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """Distinct n-grams of the benchmark set — the broadcast side."""
    return (
        benchmark.select(F.explode(text_ngrams(text_col, n)).alias("gram"))
        .distinct()
    )


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(doc_id, n_hits): documents sharing ≥1 distinct n-gram with the
    benchmark set, with the count of DISTINCT benchmark grams matched.

    The benchmark gram set is explicitly ``broadcast()`` — it is
    metadata-sized by definition (eval sets are thousands of rows, not
    billions), and a shuffle join here would re-partition the entire
    exploded corpus for nothing.
    """
    grams = broadcast(benchmark_ngrams(benchmark, text_col, n))
    doc_grams = docs.select(
        F.col(id_col), F.explode(text_ngrams(text_col, n)).alias("gram")
    ).dropDuplicates([id_col, "gram"])
    return (
        doc_grams.join(grams, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
