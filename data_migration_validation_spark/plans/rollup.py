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

Commit protocol (same discipline as plans/lake.py, scaled down to the
append-only case): partial files land in a UNIQUE directory first, then
the manifest naming them is swapped in through the commit store's CAS —
read manifest, append the group, put-if-unchanged, re-read and retry on
conflict. A plain read-modify-write of a shared manifest file would let
two concurrent writers (the streaming ``foreachBatch`` applier and a
maintenance ``compact()``, or two sibling repliers after a crash) each
drop the other's just-committed group — the same lost-update hole the
novelty blooms had before their CAS fold. The unique directory per
ATTEMPT (not per epoch) keeps racing same-epoch writers from overwriting
each other's data files while a manifest still references them; the CAS
loser's directory is unreferenced and removed by the loser itself (or by
``vacuum`` after a crash). ``apply_epoch`` on an already-committed epoch
is a no-op, so at-least-once delivery upstream (foreachBatch retries,
replay-after-crash) is safe end-to-end. On POSIX the store CAS is
flock+rename; on an object store it is an etag-preconditioned PUT
(plans/commit_store.py) — no rollup code changes either way.

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
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_migration_validation_spark.plans.commit_store import (
    CommitStore,
    PosixCommitStore,
)

_MANIFEST = "manifest"
_LEGACY_MANIFEST = "manifest.json"


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

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        spec: RollupSpec,
        store: CommitStore | None = None,
    ):
        self.spark = spark
        self.path = path
        self.spec = spec
        os.makedirs(path, exist_ok=True)
        self.store = store or PosixCommitStore(os.path.join(path, "_meta"))

    # -- manifest ----------------------------------------------------------

    def _manifest_raw(self) -> tuple[dict, str | None]:
        """Current manifest plus the raw string it was parsed from (the
        CAS expectation). A pre-CAS-era table (root ``manifest.json``) is
        adopted read-only: its content seeds the first CAS (expected =
        absent), after which the store copy is authoritative."""
        raw = self.store.read(_MANIFEST)
        if raw is not None:
            return json.loads(raw), raw
        legacy = os.path.join(self.path, _LEGACY_MANIFEST)
        if os.path.exists(legacy):
            with open(legacy) as f:
                return json.load(f), None
        return {"version": 0, "groups": []}, None

    def _manifest(self) -> dict:
        return self._manifest_raw()[0]

    @staticmethod
    def _has_epoch(m: dict, epoch: int) -> bool:
        return any(epoch in g["epochs"] for g in m["groups"])

    def epochs_applied(self) -> set[int]:
        return {e for g in self._manifest()["groups"] for e in g["epochs"]}

    def n_groups(self) -> int:
        """Manifest-level file-group count (read-side merge width)."""
        return len(self._manifest()["groups"])

    def _swap(self, expected_raw: str | None, new_manifest: dict) -> bool:
        exp = expected_raw.strip() if expected_raw is not None else None
        return self.store.cas(_MANIFEST, exp, json.dumps(new_manifest, indent=1))

    def _drop_dir(self, rel: str) -> None:
        shutil.rmtree(os.path.join(self.path, rel), ignore_errors=True)

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
        False (no-op) if the epoch is already committed — including when
        a racing sibling commits it between our write and our CAS (the
        loser's unreferenced directory is removed before returning)."""
        m, raw = self._manifest_raw()
        if self._has_epoch(m, epoch):
            return False
        rel = f"partials/epoch={epoch}-{uuid.uuid4().hex[:8]}"
        self._partial(df).write.mode("overwrite").parquet(
            os.path.join(self.path, rel)
        )
        while True:
            new = {
                "version": m["version"] + 1,
                "groups": [*m["groups"], {"path": rel, "epochs": [epoch]}],
            }
            if self._swap(raw, new):
                return True
            # lost the CAS: re-read and retry against the new head; if the
            # winner committed THIS epoch, our files are an orphan — drop
            # them and report the no-op
            m, raw = self._manifest_raw()
            if self._has_epoch(m, epoch):
                self._drop_dir(rel)
                return False

    # -- read path ---------------------------------------------------------

    def _read_groups(self, m: dict) -> DataFrame | None:
        if not m["groups"]:
            return None
        paths = [os.path.join(self.path, g["path"]) for g in m["groups"]]
        df = self.spark.read.parquet(*paths)
        s = self.spec
        return df.groupBy(*s.group_cols()).agg(
            *[F.sum(c).alias(c) for c in s.measure_cols()]
        )

    def read(self) -> DataFrame | None:
        """Merged rollup: sum the partials. One aggregation over
        O(#groups x #file-groups) rows — bounded by compact()."""
        return self._read_groups(self._manifest())

    # -- maintenance -------------------------------------------------------

    def compact(self) -> int:
        """Fold every committed file group into one base group (the merged
        rollup itself is a valid partial — the monoid is closed). Returns
        the number of file groups folded. Concurrency-safe: the folded
        base covers exactly the manifest read at the top of the attempt,
        and the CAS refuses the swap if any epoch landed since — the
        retry re-reads and re-folds, so a concurrent ``apply_epoch`` can
        never be silently dropped. Old directories are removed AFTER the
        swap (readers of the old manifest finished or retry against the
        new one)."""
        while True:
            m, raw = self._manifest_raw()
            if len(m["groups"]) <= 1:
                return 0
            merged = self._read_groups(m)
            epochs = sorted({e for g in m["groups"] for e in g["epochs"]})
            rel = f"base-v{m['version'] + 1}-{uuid.uuid4().hex[:8]}"
            merged.write.mode("overwrite").parquet(os.path.join(self.path, rel))
            folded = len(m["groups"])
            old = [g["path"] for g in m["groups"]]
            new = {
                "version": m["version"] + 1,
                "groups": [{"path": rel, "epochs": epochs}],
            }
            if self._swap(raw, new):
                for p in old:
                    self._drop_dir(p)
                return folded
            # an epoch landed mid-fold: our base is stale — drop it and
            # fold again over the new manifest
            self._drop_dir(rel)

    def vacuum(self, min_age_seconds: float = 3600.0) -> int:
        """Remove partial/base directories the manifest does not
        reference — CAS losers and crash orphans. Age-guarded like the
        lake's vacuum: an in-flight ``apply_epoch`` has already written
        its directory but not yet CAS'd the manifest, and an unknown or
        young mtime must read as too YOUNG to touch. Returns the number
        of directories removed."""
        live = {g["path"] for g in self._manifest()["groups"]}
        removed = 0
        now = time.time()
        for sub in ("partials", "."):
            base = os.path.normpath(os.path.join(self.path, sub))
            if not os.path.isdir(base):
                continue
            for entry in os.listdir(base):
                full = os.path.join(base, entry)
                rel = os.path.relpath(full, self.path)
                if not os.path.isdir(full) or rel in live:
                    continue
                if sub == "." and not entry.startswith("base-"):
                    continue
                if sub == "partials" and not entry.startswith("epoch="):
                    continue
                try:
                    age = now - max(
                        os.stat(os.path.join(dp, f)).st_mtime
                        for dp, _dns, fns in os.walk(full)
                        for f in fns
                    )
                except (ValueError, FileNotFoundError):
                    age = now - os.stat(full).st_mtime
                if age >= min_age_seconds:
                    self._drop_dir(rel)
                    removed += 1
        return removed
