"""Deterministic synthetic Common-Crawl-style page table.

Schema per BASELINE.json ``input_hint``:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Everything is generated **distributed and JVM-side** (``spark.range`` +
column expressions — no driver loop, no Python UDF), so the same generator
scales from 1e3 rows in tests to 1e10 rows on a cluster: ``spark.range``
partitions the id space evenly across executors and every derived column is
a pure function of ``id``.

Determinism contract: for a given (n_pages, seed) the table is byte-stable,
and ``text == extract_text(html)`` byte-for-byte (the reconciliation
invariant; see functions/text.py).

Skew: a configurable fraction of pages lands on one hot domain
(``hot.example.com``) to exercise salt-based skew splitting downstream —
mirrors real web crawls where a few domains dominate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Small fixed vocabulary; page text is a deterministic word sequence drawn
# from it by modular arithmetic on the page id.
_VOCAB = [
    "the", "crawl", "web", "page", "data", "spark", "stream", "index",
    "merge", "table", "lake", "commit", "epoch", "key", "value", "shard",
    "domain", "link", "anchor", "text", "html", "byte", "hash", "salt",
    "skew", "batch", "offset", "replay", "delta", "upsert", "schema", "row",
]

LANGS = ["en", "de", "hi", "te"]

BASE_TS = "2024-01-01 00:00:00"

# Knuth multiplicative constant — deterministic id mixing.
_MIX = 2654435761
_M32 = 2**32


def _mixed(id_col: Column, salt: int) -> Column:
    """Deterministic pseudo-random long in [0, 2^31-1) derived from id.

    splitmix32-style finalizer (multiply + xor-shift rounds) so different
    salts give statistically independent streams — a plain affine mix
    correlates salts that differ by a multiple of a later modulus.
    All intermediates stay < 2^63 (ANSI-safe) for ids up to ~1e10.
    """
    base = F.pmod(F.pmod(id_col, F.lit(2**31)).bitwiseXOR(F.shiftright(id_col, 31)), F.lit(2**31))
    z = F.pmod(base * F.lit(_MIX) + F.lit((salt * 2654435789) % _M32), F.lit(_M32))
    z = F.pmod(z.bitwiseXOR(F.shiftright(z, 16)) * F.lit(0x45D9F3B), F.lit(_M32))
    z = F.pmod(z.bitwiseXOR(F.shiftright(z, 16)) * F.lit(0x45D9F3B), F.lit(_M32))
    z = z.bitwiseXOR(F.shiftright(z, 16))
    return F.pmod(z, F.lit(2**31 - 1))


def url_expr(id_col: Column, hot_fraction_pct: int = 50, n_cold_domains: int = 1000) -> Column:
    """URL with a skewed domain distribution: ``hot_fraction_pct``% of pages
    on one hot domain, the rest spread over ``n_cold_domains`` domains."""
    is_hot = _mixed(id_col, 7) % 100 < hot_fraction_pct
    domain = F.when(is_hot, F.lit("hot.example.com")).otherwise(
        F.concat(F.lit("site"), (_mixed(id_col, 11) % n_cold_domains).cast("string"), F.lit(".example.org"))
    )
    return F.concat(F.lit("https://"), domain, F.lit("/page/"), id_col.cast("string"))


def text_expr(id_col: Column, min_words: int = 5, max_words: int = 40) -> Column:
    """Deterministic word sequence from the fixed vocab; length varies by id."""
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    n_words = (_mixed(id_col, 13) % (max_words - min_words)) + min_words
    words = F.transform(
        F.sequence(F.lit(0), n_words),
        lambda j: F.element_at(vocab, ((F.pmod(id_col * 31 + j * 17 + 3, F.lit(len(_VOCAB)))) + 1).cast("int")),
    )
    return F.array_join(words, " ")


def html_expr(text_col: Column, title_col: Column) -> Column:
    """Wrap text in a minimal deterministic HTML envelope (binary).

    ``functions.text.extract_text`` inverts this byte-exactly: it returns
    the contents of the single <p> element.
    """
    return F.encode(
        F.concat(
            F.lit("<html><head><title>"),
            title_col,
            F.lit("</title></head><body><p>"),
            text_col,
            F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )


def synth_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    hot_fraction_pct: int = 50,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic page table: (url, warc_ts, html, text, lang).

    ``seed`` shifts every mixing constant, so different seeds give disjoint
    content while staying reproducible.
    """
    base = spark.range(0, n_pages, numPartitions=num_partitions)
    id_col = F.col("id") + F.lit(seed * 1_000_003)
    text = text_expr(id_col)
    return base.select(
        url_expr(F.col("id"), hot_fraction_pct).alias("url"),
        (F.to_timestamp(F.lit(BASE_TS)) + F.make_interval(secs=(F.col("id") % 86400).cast("double"))).alias("warc_ts"),
        html_expr(text, F.concat(F.lit("T"), F.col("id").cast("string"))).alias("html"),
        text.alias("text"),
        F.element_at(F.array(*[F.lit(lang) for lang in LANGS]), (_mixed(id_col, 17) % len(LANGS) + 1).cast("int")).alias("lang"),
    )
