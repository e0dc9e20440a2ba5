"""Continuous rollup: an incrementally-maintained time-bucketed aggregate
over the change stream (the "hypertable continuous aggregate" shape).

At 100 TB you cannot re-aggregate the whole event log every time the
monitoring dashboard refreshes. The scalable contract is MATERIALIZED
PARTIALS: each ingest epoch writes only its OWN per-(window, dims)
partial aggregates — a few hundred rows, regardless of table size — and
the read side merges partials with a second (tiny) aggregation. That
works because the measures are restricted to commutative monoids (count,
sum): ``merge(partial_a, partial_b) = sum`` is associative, so epoch
boundaries, arrival order, replays, and compaction can never change the
merged result — the same algebra that makes the lake's LWW merge
order-insensitive makes this rollup epoch-insensitive.

Cost model:
* apply: one map-side-combined hash aggregate over JUST the epoch's
  events (shuffle rows = #distinct (window, dims) groups in the epoch,
  not #events), one small parquet write. O(epoch), never O(table).
* read: scan #groups x #uncompacted-epochs partial rows + one merge
  aggregation. Bounded by ``compact()``, which folds all partials into
  one base group — after which read cost is O(#groups).
* storage: partials are additive-only; compaction is the GC.

Commit protocol (same discipline as plans/lake.py, simplified to the
append-only case): partial files land under ``partials/epoch=N/`` FIRST,
then a manifest naming them is atomically swapped in. A crash between
the two leaves an orphan directory that the manifest never references —
the retried epoch overwrites it. ``apply_epoch`` on an already-committed
epoch is a no-op, so at-least-once delivery upstream (foreachBatch
retries, replay-after-crash) is safe end-to-end.

Append-only by design: this rolls up the CHANGE STREAM (ingest
monitoring — events/sec, bytes, deletes per window), not the merged LWW
state. A state-level rollup needs signed retractions (+new/-old winner
per rekeyed group) to stay mergeable; that seam is documented here so
nobody quietly points this class at a stream of UPDATE winners and
double-counts them.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "manifest.json"


def _atomic_write(path: str, content: str) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)  # atomic on POSIX
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


@dataclass(frozen=True)
class RollupSpec:
    """What to roll up. Measures are restricted to mergeable aggregates:
    ``n_events`` (count) is always produced; ``sums`` maps output column
    -> source column summed. (avg = sum/count downstream; exact distinct
    is deliberately NOT offered — it is not mergeable; use a sketch.)"""

    ts_col: str = "ts"
    window: str = "1 hour"
    dims: tuple[str, ...] = ()
    sums: dict[str, str] = field(default_factory=dict)

    def group_cols(self) -> list[str]:
        return ["window_start", "window_end", *self.dims]

    def measure_cols(self) -> list[str]:
        return ["n_events", *self.sums]


class ContinuousRollup:
    """Epoch-keyed, idempotent, merge-on-read rollup table."""

    def __init__(self, spark: SparkSession, path: str, spec: RollupSpec):
        self.spark = spark
        self.path = path
        self.spec = spec
        os.makedirs(path, exist_ok=True)

    # -- manifest ----------------------------------------------------------

    def _manifest(self) -> dict:
        p = os.path.join(self.path, _MANIFEST)
        if not os.path.exists(p):
            return {"version": 0, "groups": []}
        with open(p) as f:
            return json.load(f)

    def epochs_applied(self) -> set[int]:
        return {e for g in self._manifest()["groups"] for e in g["epochs"]}

    def n_groups(self) -> int:
        """Manifest-level file-group count (read-side merge width)."""
        return len(self._manifest()["groups"])

    # -- write path --------------------------------------------------------

    def _partial(self, df: DataFrame) -> DataFrame:
        s = self.spec
        aggs = [F.count(F.lit(1)).alias("n_events")] + [
            F.sum(F.col(src)).alias(out) for out, src in s.sums.items()
        ]
        return (
            df.groupBy(F.window(F.col(s.ts_col), s.window).alias("w"), *s.dims)
            .agg(*aggs)
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                *s.dims,
                *s.measure_cols(),
            )
        )

    def apply_epoch(self, df: DataFrame, epoch: int) -> bool:
        """Aggregate ONE epoch's events and commit the partial. Returns
        False (no-op) if the epoch is already in the manifest."""
        m = self._manifest()
        if any(epoch in g["epochs"] for g in m["groups"]):
            return False
        rel = f"partials/epoch={epoch}"
        out = os.path.join(self.path, rel)
        self._partial(df).write.mode("overwrite").parquet(out)
        m["version"] += 1
        m["groups"].append({"path": rel, "epochs": [epoch]})
        _atomic_write(os.path.join(self.path, _MANIFEST), json.dumps(m, indent=1))
        return True

    # -- read path ---------------------------------------------------------

    def read(self) -> DataFrame | None:
        """Merged rollup: sum the partials. One aggregation over
        O(#groups x #file-groups) rows — bounded by compact()."""
        m = self._manifest()
        if not m["groups"]:
            return None
        paths = [os.path.join(self.path, g["path"]) for g in m["groups"]]
        df = self.spark.read.parquet(*paths)
        s = self.spec
        return df.groupBy(*s.group_cols()).agg(
            *[F.sum(c).alias(c) for c in s.measure_cols()]
        )

    # -- maintenance -------------------------------------------------------

    def compact(self) -> int:
        """Fold every committed file group into one base group (the merged
        rollup itself is a valid partial — the monoid is closed). Returns
        the number of file groups folded. Old directories are removed
        AFTER the manifest swap (readers of the old manifest finished or
        retry against the new one)."""
        m = self._manifest()
        if len(m["groups"]) <= 1:
            return 0
        merged = self.read()
        epochs = sorted({e for g in m["groups"] for e in g["epochs"]})
        rel = f"base-v{m['version'] + 1}"
        merged.write.mode("overwrite").parquet(os.path.join(self.path, rel))
        folded = len(m["groups"])
        old = [g["path"] for g in m["groups"]]
        m = {"version": m["version"] + 1, "groups": [{"path": rel, "epochs": epochs}]}
        _atomic_write(os.path.join(self.path, _MANIFEST), json.dumps(m, indent=1))
        for p in old:
            shutil.rmtree(os.path.join(self.path, p), ignore_errors=True)
        return folded
