"""As-of join: attach to each fact row the most recent dimension version
with ``dim.ts <= fact.ts`` for the same key.

Spark has no native as-of join (DuckDB/Pandas do), and the naive
formulations both die at scale:

* ``fact JOIN dim ON key AND dim.ts <= fact.ts`` + keep-latest is a
  range join — Catalyst plans a per-key cartesian then filters, O(F x V)
  rows materialized per key before the dedup window;
* ``merge_asof`` via pandas needs both sides sorted per key in one
  memory image — driver-bound.

The scalable shape is the UNION-MERGE trick: tag both sides, union them,
and run ONE window per key ordered by (ts, side) carrying the dimension
row forward with ``last(ignorenulls=True)``. Cost is a single
hash-shuffle on the key + a per-partition sort — the same work as the
sort-merge join Spark would run anyway, with no intermediate blowup.
Rows-between is growing-only (unbounded preceding → current row), so the
window is a streaming accumulator inside the sorted partition, never a
re-scan.

The carried value is a single STRUCT of (dim ts, payload...), not
per-column ``last`` calls: a dim version whose payload column is
legitimately NULL must not inherit that column from an OLDER version —
struct-carry keeps each version atomic.

Tie rule: a dimension version AT the fact timestamp matches (``<=``),
so dim rows sort before fact rows at equal ts (side 0 < side 1). Callers
must ensure dim has at most one row per (key, ts) — enforce upstream
with an LWW dedup — otherwise "the" version at a timestamp is ambiguous
(DuckDB's ASOF JOIN has the same precondition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE = "_asof_side"
_CARRY = "_asof_v"


def asof_join(
    facts: DataFrame,
    dim: DataFrame,
    *,
    key: str,
    ts: str,
    how: str = "inner",
    suffix: str = "_dim",
) -> DataFrame:
    """For each row of ``facts``, the latest ``dim`` row with
    ``dim[ts] <= facts[ts]`` on the same ``key``.

    Dimension payload columns (everything except key/ts) are appended;
    name collisions with fact columns get ``suffix``. ``dim``'s ts is
    always emitted as ``ts + suffix`` (the matched version's timestamp).
    ``how='inner'`` drops facts with no prior version; ``'left'`` keeps
    them with null payload.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    payload_cols = [c for c in dim.columns if c not in (key, ts)]
    fact_cols = [c for c in facts.columns if c not in (key, ts)]
    out_names = {c: (c + suffix if c in facts.columns else c) for c in payload_cols}
    out_names[ts] = ts + suffix

    d = dim.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias(_SIDE),
        F.struct(
            F.col(ts).alias(out_names[ts]),
            *[F.col(c).alias(out_names[c]) for c in payload_cols],
        ).alias(_CARRY),
        *[F.lit(None).cast(facts.schema[c].dataType).alias(c) for c in fact_cols],
    )
    f = facts.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias(_SIDE),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                [f"`{out_names[ts]}`:{dim.schema[ts].dataType.simpleString()}"]
                + [
                    f"`{out_names[c]}`:{dim.schema[c].dataType.simpleString()}"
                    for c in payload_cols
                ]
            )
            + ">"
        )
        .alias(_CARRY),
        *[F.col(c) for c in fact_cols],
    )

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = f.unionByName(d).withColumn(
        _CARRY, F.last(_CARRY, ignorenulls=True).over(w)
    )

    joined = carried.where(F.col(_SIDE) == 1).drop(_SIDE)
    if how == "inner":
        joined = joined.where(F.col(_CARRY).isNotNull())
    return joined.select(
        key,
        ts,
        *fact_cols,
        *[F.col(f"{_CARRY}.`{out_names[c]}`").alias(out_names[c])
          for c in [ts, *payload_cols]],
    )
