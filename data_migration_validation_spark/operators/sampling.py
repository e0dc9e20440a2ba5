"""Deterministic stratified sampling — training-data mixture construction.

A corpus pipeline samples each stratum (language, source, quality band)
at its own rate to hit a target mixture. At 100 TB the sampler must be:

* **deterministic & key-stable** — the keep/drop decision is a pure
  function of the row's KEY, not of partitioning, task retries, or run
  count (``df.sample``/``rand()`` are none of these: a retried task
  would resample, breaking the commit determinism contract and making
  runs non-reproducible);
* **shuffle-free** — a scan + filter, no exchange, no driver state;
* **oracle-checkable** — the same decision is expressible in ANSI SQL,
  so an independent engine derives the identical sample.

Decision rule: ``uniform_bucket(key)`` maps the key's md5 to a uniform
bucket in [0, 256); a row survives iff its bucket < rate*256 for its
stratum. Nested samples compose: a 50% sample of a 50% sample is the
25% sample (bucket < 64 ⊂ bucket < 128), which lets a pipeline carve
successive sub-mixtures that are strict subsets — the property the
usual per-run RNG samplers lack.

Reference parity: generalizes the reference's allowlist row filtering
(src/validate.py:66-82 adjusts counts by a fixed key set) to rate-based
per-stratum selection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 256  # two hex chars of the md5 — rate granularity 1/256


def _hexval(m: Column, i: int) -> Column:
    """Numeric value of hex digit ``i`` (1-based) of a lowercase hex
    string, via ascii arithmetic — portable to any SQL engine (no
    conv/strtol needed)."""
    a = F.ascii(F.substring(m, i, 1))
    return F.when(a >= 97, a - 87).otherwise(a - 48)


def uniform_bucket(key: Column) -> Column:
    """Uniform bucket in [0, 256) from the md5 of the key's string form.
    md5 (not xxhash64) because every SQL engine computes the identical
    digest — the oracle twin is ``uniform_bucket_sql``."""
    m = F.md5(key.cast("string"))
    return _hexval(m, 1) * 16 + _hexval(m, 2)


def uniform_bucket_sql(expr: str) -> str:
    """ANSI-SQL twin of :func:`uniform_bucket` (DuckDB-tested)."""

    def hexval(i: int) -> str:
        a = f"ascii(substr(md5(CAST({expr} AS VARCHAR)), {i}, 1))"
        return f"(CASE WHEN {a} >= 97 THEN {a} - 87 ELSE {a} - 48 END)"

    return f"({hexval(1)} * 16 + {hexval(2)})"


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff its key's uniform bucket clears its stratum's
    rate. ``rates`` maps stratum value → fraction in [0, 1] (quantized
    to 1/256); strata not listed use ``default_rate``. Plan shape: one
    scan + one codegen'd filter — no shuffle, no UDF, no driver state;
    rows of a 100-TB table are decided independently in place.

    For a FEW strata (a mixture spec) the rate lookup is a literal CASE
    chain, which keeps the whole predicate in whole-stage codegen; a
    data-scaled strata table should broadcast-join its rates instead.
    """
    for s, r in {**rates, "__default__": default_rate}.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {s!r} must be in [0, 1], got {r}")
    threshold = F.lit(int(default_rate * BUCKETS))
    for value, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(rate * BUCKETS))
        ).otherwise(threshold)
    return df.where(uniform_bucket(F.col(key)) < threshold)


def stratified_sample_sql(
    key_expr: str, strata_expr: str, rates: dict[str, float], default_rate: float = 0.0
) -> str:
    """WHERE-clause twin of :func:`stratified_sample`."""
    cases = " ".join(
        f"WHEN '{v}' THEN {int(r * BUCKETS)}" for v, r in sorted(rates.items())
    )
    return (
        f"{uniform_bucket_sql(key_expr)} < "
        f"(CASE {strata_expr} {cases} ELSE {int(default_rate * BUCKETS)} END)"
    )
