"""Repetition-based document quality (Gopher-style repetition rules).

Rae et al., "Scaling Language Models: ... Gopher" (arXiv 2112.11446,
appendix A1.1) filter web documents whose content is dominated by
repetition — duplicate words, or one n-gram covering a large fraction of
the text. Two of those signals, as pure Spark aggregations:

* ``dup_word_frac``  = 1 − |distinct words| / |words| — computed as a
  scan-side Column expression (``array_distinct``), zero shuffle;
* ``top_bigram_frac`` = occurrences of the most frequent bigram / total
  bigrams — explode → two-phase hash aggregate (partial map-side
  combine), the same shape at any scale.

Reference parity: the reference engine has no corpus-quality stage; this
extends the migration-validation surface toward the LLM-training-data
pipeline the engine fronts (SURVEY.md §2, round-4 additions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_migration_validation_spark.functions.text import tokens

DUP_WORD_T = 0.6
TOP_BIGRAM_T = 0.08


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dup_word_t: float = DUP_WORD_T,
    top_bigram_t: float = TOP_BIGRAM_T,
) -> DataFrame:
    """Per-document repetition metrics + a ``repetitious`` flag.

    Documents with fewer than two words have no bigrams and are dropped
    (they are below any length filter that would run first anyway). The
    dup-word fraction rides through the bigram aggregation via ``first``
    instead of a join back — one pipeline, no extra shuffle.
    """
    ws = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        F.round(
            1.0 - F.size(F.array_distinct(ws)).cast("double") / F.size(ws), 6
        ).alias("dup_word_frac"),
        # bigram i = words[i] || ' ' || words[i+1]; guarded because
        # sequence(1, 0) DESCENDS in Spark — a 1-word doc would emit
        # bogus grams instead of none
        F.expr(
            f"CASE WHEN size({_toks_sql(text_col)}) >= 2 THEN "
            f"transform(sequence(1, size({_toks_sql(text_col)}) - 1), "
            f"i -> concat_ws(' ', {_toks_sql(text_col)}[i-1], {_toks_sql(text_col)}[i])) "
            f"ELSE array() END"
        ).alias("bigrams"),
    ).where(F.size("bigrams") > 0)

    per_gram = (
        base.select(id_col, "dup_word_frac", F.explode("bigrams").alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("c"), F.first("dup_word_frac").alias("dup_word_frac"))
    )
    per_doc = per_gram.groupBy(id_col).agg(
        F.first("dup_word_frac").alias("dup_word_frac"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_bigram_frac"),
    )
    return per_doc.select(
        id_col,
        "dup_word_frac",
        "top_bigram_frac",
        (
            (F.col("dup_word_frac") > F.lit(dup_word_t))
            | (F.col("top_bigram_frac") > F.lit(top_bigram_t))
        ).alias("repetitious"),
    )


def _toks_sql(text_col: str) -> str:
    """SQL twin of functions.text.tokens — needed because transform's
    lambda indexes the SAME array twice and the expression parser cannot
    reference a python Column from inside F.expr."""
    return f"filter(split(trim({text_col}), '\\\\s+'), t -> t != '')"
