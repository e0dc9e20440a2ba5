"""Text extraction and analysis.

``extract_text`` is the engine's vectorized Arrow UDF (BASELINE.json
input_hint: "vectorized pandas/Arrow UDFs (no per-row Python) throughout"):
binary html in, extracted text out, deterministic and byte-stable so the
reconciliation operator can assert byte-identical text per url.

The analysis helpers (language id, quality score, token count,
fingerprint) are pure Column expressions — JVM-side, whole-stage-codegen
friendly — mirroring what a large-scale training-data pipeline runs over a
``documents`` table.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# extract_text: binary html -> text (vectorized, deterministic)
# ---------------------------------------------------------------------------

# Matches the paragraph bodies of the synthetic html envelope
# (sources/pages.py html_expr) and, generally, strips tags from arbitrary
# html deterministically: concatenate <p> bodies joined by "\n"; if no <p>
# elements exist, fall back to stripping all tags.
_P_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")


def _extract_series(html: pd.Series) -> pd.Series:
    # Vectorized-ish: pandas .apply over a decoded Series within one Arrow
    # batch (no per-row Python round trips through Spark). Decoding is
    # strict UTF-8 with surrogateescape OFF: determinism over leniency.
    def one(b: bytes | None) -> str | None:
        if b is None:
            return None
        s = bytes(b).decode("utf-8")
        paras = _P_RE.findall(s)
        if paras:
            return "\n".join(paras)
        return _TAG_RE.sub("", s)

    return html.map(one)


@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Arrow-batched html→text extraction. Byte-deterministic: same bytes
    in, same string out, independent of partitioning or batch size."""
    return _extract_series(html)


def extract_text_expr(html: Column) -> Column:
    """JVM-expression twin of :func:`extract_text`: the same two-regex
    extraction as pure Column expressions (``regexp_extract_all`` +
    ``array_join`` / tag-strip fallback) — whole-stage codegen, no Python
    worker pool, no Arrow transfer. Byte-identical to the Arrow UDF on
    valid UTF-8 (parity-tested); they diverge only on INVALID UTF-8,
    where the UDF raises (strict decode — determinism over leniency) and
    the JVM decode substitutes replacement chars. The engine default
    stays the Arrow UDF (the north-star operator, and the honest cost
    model for real extraction libraries that only exist in Python);
    this is the measured upper bound of staying JVM-side
    (``CDCApplyEngine(text_extract="expr")``)."""
    s = F.decode(html, "UTF-8")
    paras = F.regexp_extract_all(s, F.lit(r"(?s)<p>(.*?)</p>"), 1)
    return F.when(html.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(F.size(paras) > 0, F.array_join(paras, "\n")).otherwise(
            F.regexp_replace(s, r"<[^>]*>", "")
        )
    )


# ---------------------------------------------------------------------------
# Text analysis (pure Column expressions; SQL-oracle-friendly)
# ---------------------------------------------------------------------------

# Tiny per-language stopword marker sets for the n-gram-free heuristic
# language id. Deliberately simple + deterministic (public-knowledge
# heuristic, not a trained model).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty strings removed (stable across
    engines for leading/trailing whitespace)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_token_count(text: Column) -> Column:
    """BPE-ish token proxy: count word pieces + punctuation marks via regex
    splits — a deterministic stand-in for subword tokenization."""
    words = F.size(F.filter(F.split(text, r"[^A-Za-z0-9]+"), lambda t: t != ""))
    puncts = F.size(F.filter(F.split(text, r"[A-Za-z0-9\s]+"), lambda t: t != ""))
    return words + puncts


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = tokens(F.lower(text))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\.\,\;\:\!\?]", "")
    return F.when(
        F.length(text) > 0, F.length(stripped).cast("double") / F.length(text)
    ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: rewards moderate length,
    penalizes extreme punctuation density; the classic cheap pre-filter a
    training-data pipeline runs before expensive dedup."""
    n = token_count(text)
    len_score = F.least(n.cast("double") / 100.0, F.lit(1.0))
    punct_penalty = F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    sw = stopword_ratio(text)
    return F.round(
        F.greatest(
            F.lit(0.0),
            len_score * 0.5 + sw * 0.3 + (1.0 - punct_penalty) * 0.2,
        ),
        6,
    )


def lang_id(text: Column) -> Column:
    """Marker-word language guess: the language with the most stopword hits
    wins; ties and zero-hit rows → 'und' (undetermined)."""
    toks = tokens(F.lower(text))

    def _contains(marr):
        # closure factory — a default-arg lambda would read as two-arg
        return lambda t: F.array_contains(marr, t)

    scores = []
    for lang, markers in LANG_MARKERS.items():
        marr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, _contains(marr)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # array_max over struct compares field-by-field: (hits, lang) — lang is
    # the deterministic tiebreak (lexicographically greatest wins ties).
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


# -- PII scrubbing -----------------------------------------------------------
#
# Regexes are deliberately written in the common subset of Java regex
# (Spark) and RE2 (DuckDB oracle / Go scanners): no backreferences, no
# lookaround — so one pattern string drives both engines and any future
# external scrubber verbatim.

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

PII_PATTERNS: dict[str, str] = {
    "email": EMAIL_RE,
    "phone": PHONE_RE,
    "ipv4": IPV4_RE,
}


def pii_count(text: Column, pattern: str) -> Column:
    """Number of matches of ``pattern`` in ``text`` — pure Column
    expression (JVM regex, whole-stage codegen; no Python in the loop)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def scrub_pii(text: Column, patterns: dict[str, str] | None = None) -> Column:
    """Redact every PII match with ``<KIND>`` placeholders. Replacement is
    sequential by kind (email, then phone, then ipv4) — order matters only
    if patterns overlap, which these by construction do not. At 100 TB
    this is the shape you want: a scan-only projection, no shuffle, no
    UDF; throughput is the parquet read."""
    out = text
    for kind, pat in (patterns or PII_PATTERNS).items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out
