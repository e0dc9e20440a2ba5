"""Range (interval) join: match fact rows whose timestamp falls inside a
dimension validity interval ``[start, end)`` on the same key.

Spark has no native interval join for the batch DataFrame API (Databricks
ships a range-join hint; OSS Structured Streaming has stream-stream time
bounds, but nothing for static frames). The naive formulation

    facts JOIN intervals ON key AND start <= ts AND ts < end

is planned as an equi-join on ``key`` followed by a filter — which is fine
when keys are selective, but degenerates to a per-key cartesian when a hot
key has many facts AND many intervals (O(F_k × I_k) rows materialized per
key before the filter). That is exactly the skew shape web-scale event
data has.

The scalable shape is BUCKETED OVERLAP (the same trick DuckDB's IEJoin
literature and Flink's interval join use): quantize time into fixed
buckets of ``granularity`` seconds, explode each interval to the buckets
it covers, tag each fact with its single bucket, and equi-join on
``(key, bucket)`` — then apply the exact range predicate to the survivors.
The join key becomes (key, bucket), so a hot key's work is spread across
its time range instead of concentrated in one task, and each fact is
compared only against intervals that touch its bucket, not all intervals
for the key.

Cost model (pick ``granularity`` accordingly): each interval produces
``ceil(span / granularity) (+1)`` exploded rows — granularity should be
on the order of the TYPICAL interval span. Too coarse → more false
candidates per bucket (filtered after the join); too fine → interval
blowup. Both failure modes degrade gracefully (correctness never depends
on granularity); ``max_span_buckets`` hard-caps pathological intervals so
one year-long interval cannot explode into 10^5 rows silently.

Overlapping intervals are allowed: a fact matches EVERY interval that
contains it (standard interval-join semantics; dedupe downstream if the
intervals are known disjoint). Null timestamps/bounds and empty intervals
(``end <= start``) never match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "_rj_bucket"


def _bucket(ts: Column, granularity_s: int) -> Column:
    return (F.unix_timestamp(ts) / F.lit(granularity_s)).cast("long")


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    key: str,
    ts: str,
    start: str,
    end: str,
    granularity: str = "30 minutes",
    max_span_buckets: int = 1024,
    suffix: str = "_iv",
) -> DataFrame:
    """Inner interval join: every (fact, interval) pair on the same
    ``key`` with ``interval[start] <= fact[ts] < interval[end]``.

    Interval payload columns keep their names; collisions with fact
    columns get ``suffix`` (``start``/``end`` are always emitted, suffixed
    on collision). ``granularity`` is any Spark interval string; intervals
    spanning more than ``max_span_buckets`` buckets raise at plan build —
    widen the granularity instead of silently exploding.
    """
    gran_s = _granularity_seconds(granularity)
    if gran_s <= 0:
        raise ValueError(f"granularity must be positive, got {granularity!r}")

    iv_payload = [c for c in intervals.columns if c != key]
    out = {c: (c + suffix if c in facts.columns else c) for c in iv_payload}

    lo = _bucket(F.col(start), gran_s)
    # half-open end: the interval touches the bucket of the last instant
    # STRICTLY BEFORE `end`
    hi = _bucket(F.col(end) - F.expr("INTERVAL 1 MICROSECOND"), gran_s)
    exploded = (
        intervals.where(
            F.col(start).isNotNull()
            & F.col(end).isNotNull()
            & (F.col(end) > F.col(start))
        )
        .withColumn(
            _BUCKET,
            F.explode(
                F.when(
                    hi - lo < F.lit(max_span_buckets),
                    F.sequence(lo, hi),
                ).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"range_join: interval spans > {max_span_buckets} "
                                f"buckets at granularity {granularity!r} (start="
                            ),
                            F.col(start).cast("string"),
                            F.lit(", end="),
                            F.col(end).cast("string"),
                            F.lit("); widen granularity or raise max_span_buckets"),
                        )
                    ).cast("array<long>"),
                )
            ),
        )
        .select(
            F.col(key),
            _BUCKET,
            *[F.col(c).alias(out[c]) for c in iv_payload],
        )
    )

    f = facts.where(F.col(ts).isNotNull()).withColumn(_BUCKET, _bucket(F.col(ts), gran_s))
    return (
        f.join(exploded, on=[key, _BUCKET], how="inner")
        .where((F.col(out[start]) <= F.col(ts)) & (F.col(ts) < F.col(out[end])))
        .drop(_BUCKET)
    )


def _granularity_seconds(granularity: str) -> int:
    """Parse a Spark interval string to whole seconds (driver-side, tiny)."""
    import re

    units = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }
    m = re.fullmatch(r"\s*(\d+)\s+([a-z]+)\s*", granularity.lower())
    if not m or m.group(2) not in units:
        raise ValueError(f"unsupported granularity {granularity!r}")
    return int(m.group(1)) * units[m.group(2)]
