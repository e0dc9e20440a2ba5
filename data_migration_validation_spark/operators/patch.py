"""Patch-merge (sparse CDC events): fold events that carry only CHANGED
columns into final per-key state.

Row-level LWW (operators/lww.py) assumes every event carries the full row
image. Real CDC feeds often don't: Debezium emits unchanged-TOAST
placeholders for Postgres, Mongo update events carry only the patched
fields, and wide tables make full images expensive. In patch semantics a
null column in a U event means "unchanged", so the final state of each
column is the value of the latest event that SET it — per-column LWW —
bounded below by the row's last full-image barrier:

* ``I`` (insert) is a full row image: it RESETS the row — columns it
  leaves null stay null until a later event sets them, and values from
  before the insert must not leak through it;
* ``D`` (delete) is a tombstone barrier: patches from before the delete
  must not leak into a later re-creation;
* the key is live iff its globally-latest event is not a ``D`` (a U
  after a D re-creates by patching — upsert-by-patch, consistent with
  the row-LWW engine's treatment of late U events);
* a key with only ``U`` events is live with all its patches applied
  (no barrier).

Plan shape (scale): ONE hash shuffle on the key — a window attaches the
per-key barrier and latest-event markers (constant per key), and the
groupBy that follows reuses the window's exchange (same partitioning, no
second shuffle). Per column the fold is ``max(struct(order, value))``
filtered to eligible setters — pure Column expressions, whole-stage
codegen, no Python. Orderable column types only (numeric/string/binary/
timestamp — the engine's payload types).

The fold is an EPOCH/BATCH operator and a full-log oracle query
(``cdc_patch_state``). Folding merge-on-read deltas epoch-over-epoch
would additionally need per-CELL ordinals in stored state (a folded row
mixes columns set at different times, so a single row timestamp cannot
arbitrate a late cross-epoch patch — the Cassandra cell-timestamp
problem); that is deliberately out of scope here and documented so the
engine's ``mor`` mode is never silently combined with patch semantics.

Reference parity: generalizes the reference's cell-level comparison unit
(docs/script.js:318-340 treats each (pk, column) cell independently) from
validation to merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def patch_fold(
    events: DataFrame,
    key: str = "url",
    order: Sequence[str] = ("warc_ts", "seq"),
    op_col: str = "op",
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Fold sparse patch events into live per-key state. Returns one row
    per live key: the key, each value column's per-column LWW winner, and
    the row-level ``order`` columns of the key's latest event (for
    downstream reporting/ordering)."""
    if value_cols is None:
        reserved = {key, op_col, *order}
        value_cols = [c for c in events.columns if c not in reserved]
    value_cols = list(value_cols)
    ord_s = F.struct(*[F.col(c) for c in order])
    op = F.col(op_col)

    w = Window.partitionBy(key)
    # barrier: latest full-image event (I or D); .del breaks no ties (the
    # order is unique per event) — it rides along to expose the op kind
    barrier = F.max(
        F.when(op.isin("I", "D"), F.struct(*[F.col(c) for c in order], (op == "D").alias("del")))
    ).over(w)
    latest = F.max(
        F.struct(*[F.col(c) for c in order], (op == "D").alias("del"))
    ).over(w)
    with_marks = events.select(
        key,
        *order,
        op_col,
        *value_cols,
        barrier.alias("_barrier"),
        latest.alias("_latest"),
    )

    b = F.col("_barrier")
    b_ord = F.struct(*[b.getField(c) for c in order])
    # an event may set a column iff it is at-or-after the barrier: strictly
    # after a D barrier (nothing leaks through a tombstone), at-or-after an
    # I barrier (the insert's own image counts), unconstrained if no barrier
    eligible = b.isNull() | (ord_s > b_ord) | ((ord_s == b_ord) & ~b.getField("del"))

    aggs = [
        F.max(
            F.when(
                eligible & F.col(c).isNotNull(),
                F.struct(*[F.col(o) for o in order], F.col(c).alias("v")),
            )
        ).alias(f"_w_{c}")
        for c in value_cols
    ]
    # groupBy(key) directly reuses the window's key-hash exchange: the
    # input is already partitioned by key, so this is a partial+final agg
    # with NO new shuffle — one fat exchange total for the whole fold
    folded = (
        with_marks.groupBy(key)
        .agg(F.max("_latest").alias("_latest"), *aggs)
        .where(~F.col("_latest").getField("del"))
    )
    return folded.select(
        key,
        *[F.col("_latest").getField(c).alias(c) for c in order],
        *[F.col(f"_w_{c}").getField("v").alias(c) for c in value_cols],
    )
