"""Snapshot-committed, bucket-partitioned lake table (Iceberg-style).

The real deployment target is Apache Iceberg (``MERGE INTO`` on a table
partitioned by ``bucket(N, url)``); the Iceberg runtime jars are not in
this container, so this module implements the same *semantics* on plain
Parquet + atomic metadata renames, behind an interface the apply engine
uses. The key properties it reproduces:

* **atomic snapshot commits** — a commit is visible iff the CURRENT
  pointer references its manifest; the pointer flip is a compare-and-swap
  through the :class:`~.commit_store.CommitStore` interface (POSIX:
  flock + rename; object stores: etag-preconditioned PUT — the metadata
  path has NO rename/link dependency baked in);
* **idempotent, epoch-keyed commits** — each snapshot records the set of
  applied batch epochs (like Iceberg snapshot summary properties); a
  commit for an already-applied epoch is a no-op, which is what makes
  replay-after-crash exactly-once;
* **bucket-level MERGE, merge-on-read by default** — state is
  hash-bucketed by key. A delta commit (Iceberg-v2 style) writes ONLY the
  epoch's rows as per-bucket delta files and carries every base file
  forward by reference: apply cost is proportional to the epoch, not the
  table (copy-on-write rewrites every touched bucket, and with uniform
  keys every epoch touches every bucket — at 100 TB that rewrites the
  lake per epoch). Readers LWW-merge base+delta per key; ``compact()``
  folds deltas back into base files periodically. Copy-on-write commits
  remain available (``mode="rewrite"``) and are what compaction uses;
* **schema evolution without rewrites** — the manifest records a schema
  per file group; readers upcast old files to the current schema
  (additive columns read as null, widened types cast up), so adding a
  column or widening int→long never rewrites data.

Layout (Iceberg's manifest-list / manifest-file split)::

    table/
      data/commit-<version>/bucket=<k>/part-*.parquet
      _meta/v<version>.json        # snapshot: schema + epochs + per-bucket
                                   #   shard POINTERS (O(buckets) entries)
      _meta/manifests/b<k>-<uuid>.json  # immutable per-bucket shard: that
                                   #   bucket's files + min/max bounds
      _meta/CURRENT                # pointer: current version number

A commit writes new shards ONLY for the buckets it touched; every other
bucket's shard is carried forward by reference — commit metadata volume
is O(touched buckets' files), never O(all files in the table). Buckets
are a bounded table property (~10^3-10^4); file counts grow without
bound, which is what killed the previous monolithic manifest at scale.

Reference parity note: this generalizes the reference's CSV "sink"
(/root/reference/src/validate.py:133-139 writes proof CSVs) into the
engine's durable, versioned output surface.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from data_migration_validation_spark.plans.commit_store import (
    CommitStore,
    PosixCommitStore,
    atomic_write,
)

BUCKET_COL = "_bucket"

class CommitConflictError(RuntimeError):
    """The table's published head moved between reading it and publishing
    against it — another writer committed first. The losing commit's
    files are cleaned up; callers re-read state and retry (maintenance
    ops do this automatically)."""


def _condense_ranges(values) -> list[list[int]]:
    """Sorted ints → [[lo, hi], ...] of maximal contiguous runs. Applied
    epochs are near-contiguous by construction (a replayer walks the
    epoch line), so a year of per-minute epochs condenses from ~500k ints
    to a handful of pairs — keeping the snapshot manifest O(1) in history
    length instead of O(epochs)."""
    out: list[list[int]] = []
    for v in sorted(set(int(x) for x in values)):
        if out and v == out[-1][1] + 1:
            out[-1][1] = v
        else:
            out.append([v, v])
    return out


def _expand_ranges(ranges) -> list[int]:
    return [v for lo, hi in ranges for v in range(int(lo), int(hi) + 1)]


def _fold_origin(
    prev_origins: dict | None, epochs: list[int], summary: dict | None
) -> dict:
    """Carry forward the per-origin condensed epoch ranges, folding in
    this commit's epoch(s) when its summary carries an ``origin`` tag."""
    out = {k: [list(r) for r in v] for k, v in (prev_origins or {}).items()}
    origin = (summary or {}).get("origin")
    if epochs and origin:
        out[str(origin)] = _condense_ranges(
            _expand_ranges(out.get(str(origin), [])) + [int(e) for e in epochs]
        )
    return out


def _epochs_of(m: dict) -> list[int]:
    """Applied epochs from a raw manifest — condensed ``epoch_ranges``
    (current format) or the flat legacy ``epochs`` list."""
    if "epoch_ranges" in m:
        return _expand_ranges(m["epoch_ranges"])
    return list(m.get("epochs", []))


def _canon_ts(s: str) -> str:
    """Canonicalize a timestamp string to naive-UTC ISO with a space
    separator ("YYYY-MM-DD HH:MM:SS[.ffffff]"), the one format where
    lexicographic order == chronological order. Accepts tz-aware inputs
    (pyarrow yields "...+00:00" for Spark's UTC-adjusted
    TIMESTAMP_MICROS; legacy manifests recorded those verbatim) and
    "T"-separated ISO. Unparseable strings pass through unchanged —
    the caller's comparison then degrades to best-effort, matching the
    'files without recorded bounds stay candidates' stance."""
    import datetime as _dt

    try:
        dt = _dt.datetime.fromisoformat(s.replace("T", " ").strip())
    except ValueError:
        return s
    if dt.tzinfo is not None:
        dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return dt.isoformat(sep=" ")


def bucket_expr(key: Column, num_buckets: int) -> Column:
    """Engine-wide bucketing function: pmod(xxhash64(key), B). Matches the
    spirit of Iceberg's bucket transform (hash of key mod N)."""
    return F.pmod(F.xxhash64(key), F.lit(num_buckets)).cast("int")


def _xxhash64_str(s: str) -> int:
    """Driver-side twin of Spark's ``xxhash64(string)`` as a SIGNED 64-bit
    value; ``_xxhash64_str(k) % B`` (Python % is non-negative) equals
    ``bucket_expr`` — the point-lookup planner's bucket computation,
    no Spark job needed."""
    from data_migration_validation_spark.functions.hashing import xxhash64_bytes

    h = xxhash64_bytes(s.encode("utf-8"), 42)
    return h - (1 << 64) if h >= (1 << 63) else h


# storage primitives live in commit_store; _atomic_write stays importable
# from here (checkpoint.py and rollup.py use it for their own local state)
_atomic_write = atomic_write


def _select_files(
    groups: dict[str, dict[str, list[str]]], buckets: set[int] | None
) -> dict[str, list[str]]:
    """schema_json -> file list, optionally restricted to buckets
    (manifest-level partition pruning: untouched buckets are never even
    listed, let alone read)."""
    out: dict[str, list[str]] = {}
    for schema_json, by_bucket in groups.items():
        fs: list[str] = []
        for b, paths in by_bucket.items():
            if buckets is None or int(b) in buckets:
                fs.extend(paths)
        if fs:
            out[schema_json] = fs
    return out


@dataclass
class Snapshot:
    version: int
    epochs: list[int]  # all batch epochs applied as of this snapshot
    schema: StructType  # current logical schema
    # base file groups: schema_json -> {bucket(str) -> [file paths]}
    file_groups: dict[str, dict[str, list[str]]]
    summary: dict
    # merge-on-read delta files, same shape as file_groups
    delta_groups: dict[str, dict[str, list[str]]] = None  # type: ignore[assignment]
    # tombstone-GC retention horizon (ISO timestamp string) — events at or
    # before this warc_ts are contractually too late and are dropped at
    # apply time, which is what makes tombstone removal safe
    gc_horizon: str | None = None
    # table properties AS OF this snapshot (key_col/num_buckets/order_cols).
    # A later rebucket() changes the live property; a time-travel read must
    # merge with the bucket function the snapshot's files were written under.
    table_props: dict | None = None
    # per-file key-column [min, max] from the parquet footers (Iceberg
    # manifest lower/upper bounds) — point lookups skip files whose range
    # excludes the key. Files absent from the map are always candidates.
    file_stats: dict | None = None
    # per-file order-timestamp [min, max] as ISO strings — event-time
    # range reads skip files whose window cannot overlap. Same
    # absent-means-candidate rule.
    ts_stats: dict | None = None
    # epochs committed with a non-null summary origin tag, condensed per
    # origin: {"redrive": [[lo, hi], ...]}. Lets the apply path tell on
    # EVERY idempotent skip — O(1), no historical-manifest scan — whether
    # the committed epoch came from the same kind of writer (identical-
    # epoch convergence only holds between writers replaying the same
    # source slice). Tagged commits are rare, so the map stays tiny.
    origin_epochs: dict | None = None

    def __post_init__(self):
        if self.delta_groups is None:
            self.delta_groups = {}
        if self.file_stats is None:
            self.file_stats = {}
        if self.ts_stats is None:
            self.ts_stats = {}

    def files_for(self, buckets: set[int] | None) -> dict[str, list[str]]:
        return _select_files(self.file_groups, buckets)

    def delta_files_for(self, buckets: set[int] | None) -> dict[str, list[str]]:
        return _select_files(self.delta_groups, buckets)

    def delta_buckets(self) -> set[int]:
        return {int(b) for by_bucket in self.delta_groups.values() for b in by_bucket}

    def all_buckets(self) -> set[int]:
        return {
            int(b)
            for groups in (self.file_groups, self.delta_groups)
            for by_bucket in groups.values()
            for b in by_bucket
        }

    def delta_depth(self) -> int:
        """Max number of delta files stacked on any one bucket — the
        read-side merge cost driver (each delta commit adds ~1 file per
        touched bucket). Driver-side manifest arithmetic, no Spark job."""
        per_bucket: dict[int, int] = {}
        for by_bucket in self.delta_groups.values():
            for b, files in by_bucket.items():
                per_bucket[int(b)] = per_bucket.get(int(b), 0) + len(files)
        return max(per_bucket.values(), default=0)


class LakeTable:
    """Bucket-partitioned, snapshot-committed keyed table."""

    def __init__(
        self,
        path: str,
        key_col: str | None = None,
        num_buckets: int | None = None,
        order_cols: tuple[str, ...] | None = None,
        store: CommitStore | None = None,
        data_fs=None,
    ):
        """Open (or create) a lake table.

        ``key_col`` / ``num_buckets`` / ``order_cols`` are TABLE
        properties, recorded in every manifest: on an existing table the
        manifest's values win, and passing a DIFFERENT value raises —
        re-bucketing rows with the wrong count would put them in wrong
        bucket ids, which bucket-pruned reads then silently miss
        (duplicate/resurrected keys). ``None`` (the default) means "use
        the table's recorded properties", falling back to
        url/32/(warc_ts, seq) only when creating a brand-new table.
        Changing the bucket count of a live table goes through
        :meth:`rebucket`, never through the constructor."""
        self.path = path
        self.meta_dir = os.path.join(path, "_meta")
        self.data_dir = os.path.join(path, "data")
        # ALL mutable-metadata IO (pointer, manifests, shards) goes through
        # the commit store — swap PosixCommitStore for
        # ConditionalPutCommitStore and the exactly-once/lost-update
        # guarantees carry over to S3/GCS (see commit_store.py)
        self.store: CommitStore = store or PosixCommitStore(self.meta_dir)
        # driver-side DATA-file IO (commit-dir listing, footer stats):
        # local os by default, any pyarrow.fs.FileSystem via fsio.DataFS
        from data_migration_validation_spark.fsio import LOCAL, DataFS  # noqa: F401

        self.data_fs: DataFS = data_fs or LOCAL
        # version of the most recent publish=False commit (WAP stage)
        self.last_staged_version: int | None = None
        os.makedirs(self.data_dir, exist_ok=True)
        # immutable shard cache: per-bucket manifest files are uuid-named
        # and never rewritten, so caching by path is always safe
        self._shard_cache: dict[str, dict] = {}
        stored = self._stored_props()
        if stored is not None:
            for name, passed, have in [
                ("key_col", key_col, stored["key_col"]),
                ("num_buckets", num_buckets, stored["num_buckets"]),
                ("order_cols", tuple(order_cols) if order_cols else None, tuple(stored["order_cols"])),
            ]:
                if passed is not None and passed != have:
                    raise ValueError(
                        f"table {path} was created with {name}={have!r}; "
                        f"got {name}={passed!r} — table properties are fixed "
                        "at creation (use rebucket() to change the bucket count)"
                    )
            self.key_col = stored["key_col"]
            self.num_buckets = int(stored["num_buckets"])
            self.order_cols = tuple(stored["order_cols"])
        else:
            self.key_col = key_col or "url"
            self.num_buckets = num_buckets or 32
            # total LWW order used to merge base+delta rows per key at read
            self.order_cols = tuple(order_cols or ("warc_ts", "seq"))

    def _stored_props(self) -> dict | None:
        v = self.current_version()
        if v is None:
            return None
        return self._manifest_raw(v).get("table")

    # -- snapshot bookkeeping -------------------------------------------------

    def current_version(self) -> int | None:
        cur = self.store.read("CURRENT")
        return None if cur is None else int(cur.strip())

    def current_snapshot(self) -> Snapshot | None:
        v = self.current_version()
        return None if v is None else self.snapshot(v)

    def _write_bucket_shards(
        self,
        file_groups: dict,
        delta_groups: dict,
        file_stats: dict,
        ts_stats: dict,
        touched_buckets: set[int],
        prev_shards: dict[str, str],
    ) -> tuple[dict[str, str], list[str]]:
        """Shard the file-level metadata per bucket (Iceberg's
        manifest-list / manifest-file split): every UNTOUCHED bucket
        carries its immutable shard file forward BY REFERENCE; only the
        touched buckets get a new shard written. Commit metadata volume
        is therefore O(touched buckets' files) + O(num_buckets) path
        entries in the snapshot file — never O(all files in the table),
        which a monolithic manifest rewrites on every commit (at 10^5-
        10^6 files that is the metadata path's scale killer). Buckets are
        bounded (a table property, ~10^3-10^4); files grow without bound.
        A legacy monolithic parent (empty ``prev_shards``) is sharded in
        full once, on its first sharded commit. Returns
        ``(bucket -> shard relpath, newly written relpaths)``."""
        all_buckets = {
            b for g in (file_groups, delta_groups) for bb in g.values() for b in bb
        }
        touched_strs = {str(b) for b in touched_buckets}
        bucket_manifests: dict[str, str] = {}
        added_manifests: list[str] = []
        for b in sorted(all_buckets, key=int):
            if b not in touched_strs and b in prev_shards:
                bucket_manifests[b] = prev_shards[b]  # carried by reference
                continue
            base = {sj: bb[b] for sj, bb in file_groups.items() if bb.get(b)}
            delta = {sj: bb[b] for sj, bb in delta_groups.items() if bb.get(b)}
            b_files = {f for fs in base.values() for f in fs} | {
                f for fs in delta.values() for f in fs
            }
            shard = {
                "bucket": b,
                "base": base,
                "delta": delta,
                "file_stats": {f: st for f, st in file_stats.items() if f in b_files},
                "ts_stats": {f: st for f, st in ts_stats.items() if f in b_files},
            }
            rel = f"manifests/b{b}-{uuid.uuid4().hex[:12]}.json"
            self.store.write(rel, json.dumps(shard))
            bucket_manifests[b] = rel
            added_manifests.append(rel)
        return bucket_manifests, added_manifests

    def _load_shard(self, relpath: str) -> dict:
        if relpath not in self._shard_cache:
            content = self.store.read(relpath)
            if content is None:
                raise FileNotFoundError(f"bucket manifest {relpath} missing")
            self._shard_cache[relpath] = json.loads(content)
        return self._shard_cache[relpath]

    def _resolve_groups(
        self, m: dict, buckets: set[int] | None = None
    ) -> tuple[dict, dict, dict, dict]:
        """(file_groups, delta_groups, file_stats, ts_stats) for a raw
        manifest — resolving per-bucket manifest shards for the sharded
        format (only the ``buckets`` asked for, when given: a point
        lookup parses ONE shard out of thousands), or reading them inline
        for legacy monolithic manifests."""
        if "bucket_manifests" not in m:  # legacy monolithic manifest
            return (
                m.get("file_groups", {}),
                m.get("delta_groups", {}),
                m.get("file_stats", {}),
                m.get("ts_stats", {}),
            )
        file_groups: dict = {}
        delta_groups: dict = {}
        file_stats: dict = {}
        ts_stats: dict = {}
        want = None if buckets is None else {str(b) for b in buckets}
        for b, rel in m["bucket_manifests"].items():
            if want is not None and b not in want:
                continue
            shard = self._load_shard(rel)
            for sj, fs in shard.get("base", {}).items():
                file_groups.setdefault(sj, {})[b] = list(fs)
            for sj, fs in shard.get("delta", {}).items():
                delta_groups.setdefault(sj, {})[b] = list(fs)
            file_stats.update(shard.get("file_stats", {}))
            ts_stats.update(shard.get("ts_stats", {}))
        if not file_groups:
            # keep the current schema recorded even when it has no files
            file_groups[json.dumps(json.loads(m["schema"]), sort_keys=True)] = {}
        return file_groups, delta_groups, file_stats, ts_stats

    def _snapshot_from_raw(
        self, m: dict, buckets: set[int] | None = None
    ) -> Snapshot:
        """The ONE place a raw manifest dict becomes a Snapshot — every
        new manifest field (gc_horizon and ts_stats both arrived after
        the first two copies of this constructor diverged) is threaded
        through here once, for full reads and bucket-pruned reads alike."""
        file_groups, delta_groups, file_stats, ts_stats = self._resolve_groups(
            m, buckets=buckets
        )
        return Snapshot(
            version=m["version"],
            epochs=_epochs_of(m),
            schema=StructType.fromJson(json.loads(m["schema"])),
            file_groups=file_groups,
            summary=m.get("summary", {}),
            delta_groups=delta_groups,
            gc_horizon=m.get("gc_horizon"),
            table_props=m.get("table"),
            file_stats=file_stats,
            ts_stats=ts_stats,
            origin_epochs=m.get("origin_epochs"),
        )

    def snapshot(self, version: int) -> Snapshot:
        """Load a specific snapshot by version — the time-travel entry
        point (Iceberg: ``VERSION AS OF``). Manifests are immutable and
        never vacuumed here, and commits never delete data files, so every
        published version stays readable."""
        return self._snapshot_from_raw(self._manifest_raw(version))

    def _all_manifest_versions(self) -> list[int]:
        return sorted(
            int(fn[1:-5])
            for fn in self.store.list("")
            if fn.startswith("v") and fn.endswith(".json") and "/" not in fn
        )

    def versions(self) -> list[int]:
        """All published snapshot versions, ascending — the PARENT CHAIN
        from CURRENT, not every manifest on disk: an orphan manifest from
        a crash between staging and publish is never published, even
        after later commits push CURRENT past its number (numeric order
        cannot distinguish the two once that happens, the chain can).
        Manifests that predate parent-tracking fall back to numeric order
        (their history was linear by construction)."""
        cur = self.current_version()
        if cur is None:
            return []
        chain: list[int] = []
        v: int | None = cur
        while v is not None:
            if not self.store.exists(f"v{v}.json"):
                break  # ancestor expired (expire_snapshots): history ends here
            m = self._manifest_raw(v)
            chain.append(v)
            if "parent" not in m:
                # legacy manifest (pre-WAP): every lower version is an
                # ancestor — staging didn't exist, history was linear
                chain.extend(x for x in self._all_manifest_versions() if x < v)
                break
            v = m["parent"]
        return sorted(set(chain))

    def version_asof_epoch(self, epoch: int) -> int | None:
        """Latest published version whose state reflects batch epochs
        ``<= epoch`` only (Iceberg: snapshot-per-commit + ``FOR TIMESTAMP
        AS OF``, keyed here on the epoch line instead of wall time).
        Maintenance commits (compaction/GC/rebucket) carry the epoch set
        forward unchanged, so the latest qualifying version includes any
        maintenance that ran before the next epoch — same logical state."""
        best = None
        for v in self.versions():
            # raw-manifest read: resolving a full Snapshot would parse
            # every bucket shard of every version just to compare epoch
            # numbers the O(1) manifest JSON already carries
            epochs = _epochs_of(self._manifest_raw(v))
            if epochs and max(epochs) <= epoch:
                best = v
        return best

    def buckets_changed_between(self, v_from: int | None, v_to: int) -> set[int] | None:
        """Buckets whose LOGICAL state may differ between two published
        versions — the union of the ``touched_buckets`` recorded by every
        epoch commit in ``(v_from, v_to]``. Maintenance commits
        (compaction / GC / rebucket carry ``epoch=None``) rewrite files
        without changing epoch-line state and are skipped — except that a
        GC or rebucket in the range invalidates bucket-level pruning
        (tombstone GC physically drops rows table-wide; rebucket changes
        what a bucket id means), in which case ``None`` ("all buckets")
        is returned. Also returns ``None`` when a commit predates the
        ``touched_buckets`` record. Manifest-only: no data files are read."""
        if v_from is None:
            return None
        # raw-manifest reads throughout: everything compared here
        # (table props, gc horizon, commit summary) lives in the O(1)
        # manifest JSON — resolving Snapshots would read every bucket
        # shard of every version in range on each read_changes call
        m_from = self._manifest_raw(v_from)
        props_from = m_from.get("table") or {}
        out: set[int] = set()
        for v in self.versions():
            if v <= v_from or v > v_to:
                continue
            m = self._manifest_raw(v)
            props = m.get("table") or {}
            if props.get("num_buckets") != props_from.get("num_buckets"):
                return None  # rebucket in range: bucket ids not comparable
            if m.get("gc_horizon") != m_from.get("gc_horizon"):
                return None  # tombstone GC in range: rows dropped table-wide
            summary = m.get("summary", {})
            if summary.get("epoch") is None:
                continue  # compaction: state-preserving
            touched = summary.get("touched_buckets")
            if touched is None:
                return None  # pre-record commit: unknown extent
            out.update(int(b) for b in touched)
        return out

    def gc_horizon(self) -> str | None:
        """Current tombstone-GC retention horizon (ISO timestamp) or None."""
        snap = self.current_snapshot()
        return snap.gc_horizon if snap else None

    def epochs_applied(self) -> set[int]:
        snap = self.current_snapshot()
        return set(snap.epochs) if snap else set()

    def epoch_origin(self, epoch: int) -> str | None:
        """The origin tag the commit of ``epoch`` carried (e.g.
        ``"redrive"``), or None for a plain ingest commit. O(1): read
        from the condensed ``origin_epochs`` ranges in the CURRENT
        manifest, not a scan over historical manifests — cheap enough
        for the apply path to check on every idempotent skip."""
        snap = self.current_snapshot()
        for origin, ranges in ((snap.origin_epochs if snap else None) or {}).items():
            if any(int(lo) <= epoch <= int(hi) for lo, hi in ranges):
                return origin
        return None

    def epoch_summary(self, epoch: int) -> dict | None:
        """The commit summary of the published version that applied
        ``epoch`` (Iceberg snapshot-summary lookup), or None if no
        published commit carries it. Lets a writer that lost an
        idempotent-skip race inspect WHO committed the epoch — e.g. the
        redrive protocol checks ``summary["origin"]`` to distinguish a
        sibling redriver (same content, markers safe) from a normal
        ingest that burned the epoch number (markers would lose data).
        Manifest-only: O(versions) reads of O(1)-sized JSON, newest
        first; no data files touched."""
        for v in sorted(self.versions(), reverse=True):
            s = self._manifest_raw(v).get("summary") or {}
            se = s.get("epoch")
            # group commits record a LIST of epochs; membership counts
            if se == epoch or (isinstance(se, list) and epoch in se):
                return s
        return None

    def _next_version(self) -> int:
        # Scan existing manifests (not CURRENT) so a crash between manifest
        # write and pointer update never reuses a version number.
        versions = self._all_manifest_versions()
        return (max(versions) + 1) if versions else 0

    # -- read -----------------------------------------------------------------

    def _read_groups(
        self,
        spark: SparkSession,
        snap: Snapshot,
        groups: dict[str, list[str]],
    ) -> DataFrame | None:
        """Union the given file groups, upcasting every group to the
        current schema: missing columns → null, narrower numeric types →
        cast up (schema evolution never rewrites data)."""
        if not groups:
            return None
        cur_fields = {f.name: f.dataType for f in snap.schema.fields}
        parts: list[DataFrame] = []
        for schema_json, files in groups.items():
            file_schema = StructType.fromJson(json.loads(schema_json))
            df = spark.read.schema(file_schema).parquet(*files)
            cols = [
                (
                    F.col(name).cast(cur_fields[name])
                    if name in {f.name for f in file_schema.fields}
                    else F.lit(None).cast(cur_fields[name])
                ).alias(name)
                for name in cur_fields
            ]
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(
        self,
        spark: SparkSession,
        buckets: set[int] | None = None,
        merge: bool = True,
        version: int | None = None,
    ) -> DataFrame | None:
        """Current state (optionally only the given buckets). When delta
        files exist and ``merge`` is on, base and delta rows are LWW-merged
        per key on the bucket shuffle (winner by ``order_cols`` desc) — the
        merge-on-read half of the delta-commit design. ``merge=False``
        returns the raw base+delta union (one row per surviving version).
        ``version`` time-travels: the read is served from that snapshot's
        manifest — including its OWN recorded bucket count, so a read of a
        pre-``rebucket`` version still merges under the bucket function its
        files were laid out with. Returns None for an empty table."""
        snap = self.snapshot(version) if version is not None else self.current_snapshot()
        if snap is None:
            return None
        base = self._read_groups(spark, snap, snap.files_for(buckets))
        delta = self._read_groups(spark, snap, snap.delta_files_for(buckets))
        if base is None and delta is None:
            return spark.createDataFrame([], snap.schema)
        out = base.unionByName(delta) if base is not None and delta is not None else (base or delta)
        if delta is None or not merge:
            return out
        from data_migration_validation_spark.operators.lww import lww_window_bucketed

        props = snap.table_props or {}
        key_col = props.get("key_col", self.key_col)
        num_buckets = int(props.get("num_buckets", self.num_buckets))
        order_cols = tuple(props.get("order_cols", self.order_cols))
        out = out.withColumn(BUCKET_COL, bucket_expr(F.col(key_col), num_buckets))
        return lww_window_bucketed(
            out,
            key=key_col,
            order=order_cols,
            bucket_col=BUCKET_COL,
            num_partitions=num_buckets,
        ).drop(BUCKET_COL)

    # -- point lookup ---------------------------------------------------------

    def snapshot_pruned(self, version: int | None, buckets: set[int]) -> Snapshot | None:
        """Snapshot restricted to the given buckets: with sharded
        manifests this parses ONLY those buckets' shard files — a point
        lookup on a 10^4-bucket table reads one shard, not the whole
        manifest tree (the read-side half of the metadata-scaling story;
        legacy monolithic manifests degrade to a full parse)."""
        v = version if version is not None else self.current_version()
        if v is None:
            return None
        return self._snapshot_from_raw(self._manifest_raw(v), buckets=buckets)

    def _key_bucket(self, key_value: str, version: int | None = None) -> int:
        """The key's bucket under the table properties AS OF a version —
        driver-side, manifest-only, no Spark job."""
        v = version if version is not None else self.current_version()
        props = (self._manifest_raw(v).get("table") or {}) if v is not None else {}
        num_buckets = int(props.get("num_buckets", self.num_buckets))
        return _xxhash64_str(key_value) % num_buckets

    def _lookup_plan(
        self, key_value: str, version: int | None
    ) -> tuple[dict[str, list[str]], dict[str, list[str]], int, Snapshot] | None:
        """Shared planning for :meth:`lookup_files` / :meth:`lookup`: ONE
        snapshot-manifest read serves the bucket computation, the pruned
        snapshot, and the key-bounds pruning (against an object store
        each extra read is a GET on the point-lookup hot path)."""
        v = version if version is not None else self.current_version()
        if v is None:
            return None
        m = self._manifest_raw(v)
        props = m.get("table") or {}
        num_buckets = int(props.get("num_buckets", self.num_buckets))
        bucket = _xxhash64_str(key_value) % num_buckets
        snap = self._snapshot_from_raw(m, buckets={bucket})
        stats = snap.file_stats or {}

        def _prune(groups: dict[str, list[str]]) -> dict[str, list[str]]:
            out = {}
            for sj, fs in groups.items():
                kept = [
                    f
                    for f in fs
                    if f not in stats or stats[f][0] <= key_value <= stats[f][1]
                ]
                if kept:
                    out[sj] = kept
            return out

        return (
            _prune(snap.files_for({bucket})),
            _prune(snap.delta_files_for({bucket})),
            bucket,
            snap,
        )

    def lookup_files(
        self, key_value: str, version: int | None = None
    ) -> tuple[dict[str, list[str]], dict[str, list[str]], int]:
        """Manifest-only planning for a point lookup: the key's bucket
        (computed driver-side with the same xxhash64 the layout uses) and
        the base/delta file groups for that bucket, pruned by the per-file
        key [min, max] bounds. Returns (base_groups, delta_groups,
        bucket). Files without recorded bounds stay candidates. Only the
        key's bucket shard is parsed (see :meth:`snapshot_pruned`)."""
        plan = self._lookup_plan(key_value, version)
        if plan is None:
            return {}, {}, -1
        base_g, delta_g, bucket, _snap = plan
        return base_g, delta_g, bucket

    def lookup(
        self, spark: SparkSession, key_value: str, version: int | None = None
    ) -> DataFrame | None:
        """Point lookup by key — O(one bucket's pruned files), not a table
        scan: manifest pruning picks the key's bucket, the per-file key
        bounds skip base files whose range excludes the key (after a
        key-sorted compaction each base file covers a narrow range), and
        only the surviving files are read, filtered, and LWW-merged. The
        100-TB shape: a lookup touches a handful of parquet files — and
        parses ONE bucket-manifest shard — regardless of table size."""
        plan = self._lookup_plan(key_value, version)
        if plan is None:
            return None
        base_g, delta_g, bucket, snap = plan
        props = snap.table_props or {}
        key_col = props.get("key_col", self.key_col)
        base = self._read_groups(spark, snap, base_g)
        delta = self._read_groups(spark, snap, delta_g)
        if base is None and delta is None:
            return spark.createDataFrame([], snap.schema)
        out = (
            base.unionByName(delta)
            if base is not None and delta is not None
            else (base if base is not None else delta)
        )
        out = out.where(F.col(key_col) == key_value)
        if delta is None:
            return out
        from data_migration_validation_spark.operators.lww import lww_window_bucketed

        order_cols = tuple(props.get("order_cols", self.order_cols))
        out = out.withColumn(BUCKET_COL, F.lit(0))
        return lww_window_bucketed(
            out, key=key_col, order=order_cols, bucket_col=BUCKET_COL
        ).drop(BUCKET_COL)

    # -- event-time range read ---------------------------------------------------

    def files_in_time_range(
        self, t0: str, t1: str, version: int | None = None
    ) -> tuple[dict[str, list[str]], dict[str, list[str]], int, int]:
        """Manifest-only planning for an event-time range scan: base and
        delta file groups whose recorded order-timestamp [min, max]
        window can overlap ``[t0, t1]`` (ISO strings; chronological ==
        lexicographic). Files without recorded bounds stay candidates.
        Returns (base_groups, delta_groups, candidate_files,
        total_files)."""
        snap = self.snapshot(version) if version is not None else self.current_snapshot()
        if snap is None:
            return {}, {}, 0, 0
        # normalize BOTH sides to naive-UTC canonical form before the
        # lexicographic compare — stored bounds may be legacy tz-aware
        # strings ("...+00:00"), and a suffixed string sorts after its
        # naive twin, wrongly pruning files at the window edge.
        stats = {
            f: [_canon_ts(st[0]), _canon_ts(st[1])]
            for f, st in (snap.ts_stats or {}).items()
        }
        t0, t1 = _canon_ts(t0), _canon_ts(t1)

        def _prune(groups: dict[str, list[str]]) -> dict[str, list[str]]:
            out = {}
            for sj, fs in groups.items():
                kept = [
                    f
                    for f in fs
                    if f not in stats or not (stats[f][1] < t0 or stats[f][0] > t1)
                ]
                if kept:
                    out[sj] = kept
            return out

        base_all = snap.files_for(None)
        delta_all = snap.delta_files_for(None)
        total = sum(len(fs) for g in (base_all, delta_all) for fs in g.values())
        base_g, delta_g = _prune(base_all), _prune(delta_all)
        cand = sum(len(fs) for g in (base_g, delta_g) for fs in g.values())
        return base_g, delta_g, cand, total

    def read_events_in_range(
        self, spark: SparkSession, t0: str, t1: str, version: int | None = None
    ) -> DataFrame | None:
        """Raw stored event-versions whose order timestamp falls in
        ``[t0, t1]`` — the late-event / incident-investigation scan
        ("what arrived for this window?"). Deliberately ``merge=False``
        semantics: this returns every surviving stored VERSION in the
        window, NOT live state (pruning files before an LWW merge would
        let an out-of-window newer version be missed — range-scanning
        merged state is a different, full-merge query).

        Scale shape: manifest-level file skipping on the per-file
        timestamp bounds recorded at commit time — merge-on-read delta
        files cluster tightly by arrival time, so a narrow window reads a
        few delta files out of a 100-TB table — then an exact
        ``between`` filter that parquet row-group stats prune further."""
        snap = self.snapshot(version) if version is not None else self.current_snapshot()
        if snap is None:
            return None
        base_g, delta_g, _, _ = self.files_in_time_range(t0, t1, version=version)
        base = self._read_groups(spark, snap, base_g)
        delta = self._read_groups(spark, snap, delta_g)
        if base is None and delta is None:
            return spark.createDataFrame([], snap.schema)
        out = (
            base.unionByName(delta)
            if base is not None and delta is not None
            else (base if base is not None else delta)
        )
        ts = F.col(self.order_cols[0])
        return out.where(
            (ts >= F.to_timestamp(F.lit(t0))) & (ts <= F.to_timestamp(F.lit(t1)))
        )

    # -- commit ---------------------------------------------------------------

    def commit(
        self,
        new_bucket_data: DataFrame,
        touched_buckets: set[int],
        epoch: int | list[int] | None,
        schema: StructType,
        summary: dict | None = None,
        mode: str = "rewrite",
        gc_horizon: str | None = None,
        max_records_per_file: int | None = None,
        publish: bool = True,
    ) -> tuple[bool, int]:
        """Atomically commit one epoch and publish the new manifest.

        ``publish=False`` STAGES the commit (Iceberg write-audit-publish):
        the data files and manifest are written, but the CURRENT pointer
        is not flipped — readers of the table see nothing, while an
        auditor can read the staged snapshot by version
        (``read(version=...)`` / ``read_added``). :meth:`publish` flips
        the pointer iff the table hasn't moved since staging (optimistic
        concurrency on the recorded parent version); :meth:`reject_staged`
        discards the staged files. A crash between staging and publish
        leaves an orphan manifest that is invisible (``versions()`` only
        lists published versions), never reuses a version number, and is
        reclaimable via :meth:`cleanup_staged`.

        ``mode="delta"`` (merge-on-read): the written files are appended
        as DELTA files for the touched buckets; every base file and every
        existing delta is carried forward by reference — write volume is
        the epoch's rows, independent of table size. ``mode="rewrite"``
        (copy-on-write / compaction): the written files REPLACE the
        touched buckets' base and delta files; untouched buckets carry
        forward.

        ``epoch=None`` marks a maintenance commit (compaction): no epoch
        is recorded and the idempotency guard is skipped.

        ``epoch=[e1, e2, ...]`` is a GROUP commit (commit coalescing for
        backlog replay): all epochs are recorded atomically in this ONE
        snapshot — a reader sees none or all of them, and the manifest's
        ``summary["epoch"]`` carries the list. The caller must have
        filtered already-applied epochs out first: a group wholly applied
        returns ``(False, 0)`` (idempotent skip), but a PARTIAL overlap
        raises — committing the remainder would re-write content of the
        overlapped epochs with wrong attribution, so the caller re-plans.

        Returns ``(committed, rows_written)``; rows come from the written
        files' parquet footers (driver-side metadata — no counting job),
        or ``None`` when footers are unreadable (unknown, not a count).
        ``(False, 0)`` if ``epoch`` was already applied — the idempotency
        guard that makes crash-replay exactly-once. ``new_bucket_data``
        must contain ``_bucket`` and exactly the columns of ``schema``,
        and must only produce rows in ``touched_buckets`` (enforced).
        """
        if mode not in ("rewrite", "delta"):
            raise ValueError(f"unknown commit mode {mode!r}")
        # normalize: scalar epoch → 1-element group; None → maintenance
        epochs = (
            []
            if epoch is None
            else sorted({int(e) for e in epoch})
            if isinstance(epoch, (list, tuple, set))
            else [int(epoch)]
        )
        prev = self.current_snapshot()
        applied = set(prev.epochs) if prev else set()
        overlap = set(epochs) & applied
        if epochs and overlap == set(epochs):
            return False, 0
        if overlap:
            raise ValueError(
                f"group commit epochs {sorted(overlap)} of {epochs} are "
                f"already applied — a partial group cannot commit as-is "
                f"(its merged content includes the overlapped epochs' "
                f"events); drop them from the group and re-plan"
            )

        version = self._next_version()
        commit_dir = os.path.join(self.data_dir, f"commit-{version}-{uuid.uuid4().hex[:8]}")
        # No repartition here: the caller shuffles by _bucket already (the
        # merge's LWW shuffle is keyed on the bucket — see
        # operators/lww.lww_window_bucketed), so each task holds whole
        # buckets and partitionBy writes ~one file per bucket.
        writer = new_bucket_data.write.partitionBy(BUCKET_COL).mode("overwrite")
        if max_records_per_file:
            # split big buckets into several files (Iceberg target file
            # size): with key-sorted input each file covers a narrow,
            # disjoint key range — what makes min/max file skipping bite
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        writer.parquet(commit_dir)

        # Collect written files per bucket (through the data-FS seam:
        # local by default, a pyarrow FileSystem on an object store).
        new_by_bucket: dict[str, list[str]] = {}
        for bdir in self.data_fs.list_dirs(commit_dir):
            entry = os.path.basename(bdir)
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            b = entry.split("=", 1)[1]
            files = [
                f for f in self.data_fs.list_files(bdir) if f.endswith(".parquet")
            ]
            if files:
                new_by_bucket[b] = files

        # Consistency invariant: every written bucket must be in the
        # caller's touched set. The touched set comes from a SEPARATE scan
        # of the same input; if the input is not deterministic across the
        # two jobs, rows can land in buckets whose old files are carried
        # forward — silent duplicate-key state. Fail the commit instead.
        stray = {b for b in new_by_bucket if int(b) not in touched_buckets}
        if stray:
            raise ValueError(
                f"commit wrote buckets {sorted(stray)} outside the declared "
                f"touched set {sorted(touched_buckets)} — the input DataFrame "
                "changed between the lineage pre-scan and the merge (it must "
                "be deterministic across re-evaluation)"
            )

        schema_json = json.dumps(json.loads(schema.json()), sort_keys=True)

        def _carry(
            groups: dict[str, dict[str, list[str]]] | None, drop_touched: bool
        ) -> dict[str, dict[str, list[str]]]:
            out: dict[str, dict[str, list[str]]] = {}
            for sj, by_bucket in (groups or {}).items():
                kept = (
                    {b: fs for b, fs in by_bucket.items() if int(b) not in touched_buckets}
                    if drop_touched
                    else dict(by_bucket)
                )
                if kept:
                    out[sj] = kept
            return out

        if mode == "delta":
            # base untouched; new files append to the delta groups
            file_groups = _carry(prev.file_groups if prev else None, drop_touched=False)
            delta_groups = _carry(prev.delta_groups if prev else None, drop_touched=False)
            target = delta_groups
        else:
            # rewrite: touched buckets' base AND deltas are replaced by the
            # new files (the caller merged them — CoW apply or compaction)
            file_groups = _carry(prev.file_groups if prev else None, drop_touched=True)
            delta_groups = _carry(prev.delta_groups if prev else None, drop_touched=True)
            target = file_groups
        merged = target.setdefault(schema_json, {})
        for b, fs in new_by_bucket.items():
            merged.setdefault(b, []).extend(fs)
        if not merged:
            target.pop(schema_json, None)
        if not file_groups:
            file_groups.setdefault(schema_json, {})  # keep schema recorded

        rows_written: int | None = 0
        new_stats: dict[str, list] = {}
        new_ts_stats: dict[str, list] = {}
        try:
            import datetime as _dtmod
            from concurrent.futures import ThreadPoolExecutor

            ts_col = self.order_cols[0] if self.order_cols else None
            all_files = [fp for files in new_by_bucket.values() for fp in files]

            def _footer(fp: str):
                # per-file [min, max] bounds from the SAME footer read
                # as the row count — no extra IO (Iceberg lower/upper
                # bounds): the key column for point-lookup file
                # skipping, and the order timestamp for event-time
                # range pruning. Missing/odd-typed stats just leave
                # the file un-prunable.
                md = self.data_fs.parquet_metadata(fp)
                key_b = ts_b = None
                try:
                    names = [md.schema.column(i).name for i in range(md.num_columns)]

                    def _bounds(col: str):
                        j = names.index(col)
                        mins, maxs = [], []
                        for rg in range(md.num_row_groups):
                            st = md.row_group(rg).column(j).statistics
                            if st is None or not st.has_min_max:
                                raise ValueError("no stats")
                            mins.append(st.min)
                            maxs.append(st.max)
                        if not mins:
                            raise ValueError("no row groups")
                        return min(mins), max(maxs)

                    try:
                        lo, hi = _bounds(self.key_col)
                        if isinstance(lo, str) and isinstance(hi, str):
                            key_b = [lo, hi]
                    except ValueError:
                        pass
                    if ts_col is not None:
                        try:
                            lo, hi = _bounds(ts_col)
                            if isinstance(lo, _dtmod.datetime) and isinstance(
                                hi, _dtmod.datetime
                            ):
                                # Record NAIVE UTC: pyarrow returns
                                # tz-aware datetimes for Spark's
                                # TIMESTAMP_MICROS (isAdjustedToUTC),
                                # and a "+00:00" suffix breaks the
                                # chronological==lexicographic contract
                                # files_in_time_range relies on.
                                ts_b = [
                                    _canon_ts(lo.isoformat(sep=" ")),
                                    _canon_ts(hi.isoformat(sep=" ")),
                                ]
                        except ValueError:
                            pass
                except Exception:
                    pass
                return md.num_rows, key_b, ts_b

            # footer reads are driver-side IO over O(touched files) per
            # commit; run serially they are the commit's Amdahl term (at
            # 64 buckets/epoch the loop showed up as a double-digit
            # serial fraction in the scaling ladder). pyarrow's footer
            # parse releases the GIL, so a thread pool collapses the
            # wall time while the per-file work stays unchanged.
            if all_files:
                with ThreadPoolExecutor(
                    max_workers=min(16, len(all_files))
                ) as pool:
                    results = list(pool.map(_footer, all_files))
            else:
                results = []
            for fp, (n_rows, key_b, ts_b) in zip(all_files, results):
                rows_written += n_rows
                if key_b is not None:
                    new_stats[fp] = key_b
                if ts_b is not None:
                    new_ts_stats[fp] = ts_b
        except Exception:
            rows_written = None  # footer stats unavailable; not fatal —
            # callers must treat None as "unknown", never as a count

        # carry stats for surviving files, add the new files', drop the rest
        live_files = {
            f
            for groups in (file_groups, delta_groups)
            for by_bucket in groups.values()
            for fs in by_bucket.values()
            for f in fs
        }
        file_stats = {
            f: st
            for f, st in {**((prev.file_stats or {}) if prev else {}), **new_stats}.items()
            if f in live_files
        }
        ts_stats = {
            f: st
            for f, st in {**((prev.ts_stats or {}) if prev else {}), **new_ts_stats}.items()
            if f in live_files
        }

        prev_horizon = prev.gc_horizon if prev else None
        # canonicalize BEFORE comparing: only the canonical space-separated
        # naive-UTC form orders chronologically under string max() — a
        # "T"-separated or tz-suffixed input would otherwise beat any
        # same-day canonical string ('T' > ' ') and REGRESS the horizon,
        # re-admitting events whose tombstones were already GC'd
        horizon = max(
            (_canon_ts(h) for h in (prev_horizon, gc_horizon) if h),
            default=None,
        )

        prev_shards: dict[str, str] = {}
        if prev is not None:
            prev_shards = self._manifest_raw(prev.version).get("bucket_manifests") or {}
        bucket_manifests, added_manifests = self._write_bucket_shards(
            file_groups, delta_groups, file_stats, ts_stats, touched_buckets, prev_shards
        )

        manifest = {
            "version": version,
            # WAP bookkeeping: the published version this commit built on
            # (publish() refuses to flip the pointer if the table moved),
            # and the directory of files this commit ADDED (the audit unit
            # — read_added() reads exactly these, cost ∝ the commit, never
            # the table)
            "parent": prev.version if prev else None,
            "commit_dir": commit_dir,
            # condensed ranges: O(1) in history length, not O(epochs) —
            # a flat list would make every manifest (and every commit)
            # grow with the table's entire epoch history
            "epoch_ranges": _condense_ranges(applied | set(epochs)),
            # origin-tagged epochs, carried forward and condensed like
            # epoch_ranges (tagged commits — redrives — are rare, so this
            # stays O(1); see Snapshot.origin_epochs)
            "origin_epochs": _fold_origin(
                (prev.origin_epochs if prev else None), epochs, summary
            ),
            "schema": schema.json(),
            "bucket_manifests": bucket_manifests,
            # shards THIS commit wrote (vs carried) — the reject/cleanup
            # unit: discarding a stage must not touch shards other
            # snapshots still reference
            "added_manifests": added_manifests,
            "summary": {
                **(summary or {}),
                # scalar for a single-epoch commit (the dominant case and
                # the legacy shape), list for a group commit, None for
                # maintenance — epoch_summary() matches all three
                "epoch": (
                    None
                    if not epochs
                    else epochs[0]
                    if len(epochs) == 1
                    else epochs
                ),
                # recorded for incremental consumers (change-data-feed /
                # incremental reconcile): which buckets this commit's rows
                # landed in — manifest-only, no data read needed later
                "touched_buckets": sorted(int(b) for b in touched_buckets),
            },
            "table": {
                "key_col": self.key_col,
                "num_buckets": self.num_buckets,
                "order_cols": list(self.order_cols),
            },
            "gc_horizon": horizon,
        }
        # claim a version number exclusively: if a concurrent writer took
        # this one, bump and re-claim (the manifest content only embeds
        # the number; staleness vs the new head is caught by the flip CAS)
        while not self.store.write_exclusive(f"v{version}.json", json.dumps(manifest)):
            version = self._next_version()
            manifest["version"] = version
        if publish:
            try:
                self._flip(version, prev.version if prev else None)
            except CommitConflictError:
                # lost the race: another writer published first. This
                # commit's manifest carried forward from a stale head, so
                # publishing it would drop the winner's files — discard
                # our files instead and let the caller re-read and retry.
                self.reject_staged(version)
                raise
        else:
            self.last_staged_version = version
        return True, rows_written

    # -- pointer flip under optimistic concurrency ------------------------------

    def _flip(self, version: int, expected_parent: int | None) -> None:
        """Publish ``version`` by compare-and-swapping CURRENT from
        ``expected_parent`` — the commit store's one synchronization
        primitive (Iceberg does the same CAS against its catalog).
        Without it, two writers that both parented off head H would each
        flip, and the second flip silently drops the first commit's files
        from the carried-forward manifest — a lost update. Raises
        :class:`CommitConflictError` on a moved head. How the CAS is made
        atomic is the store's business: flock + rename on POSIX,
        etag-preconditioned PUT on an object store (commit_store.py)."""
        expected = None if expected_parent is None else str(expected_parent)
        if not self.store.cas("CURRENT", expected, str(version)):
            cur = self.current_version()
            raise CommitConflictError(
                f"cannot publish v{version}: built on parent "
                f"{expected_parent} but the table head is now {cur}"
            )

    # -- write-audit-publish ----------------------------------------------------

    def _manifest_raw(self, version: int) -> dict:
        content = self.store.read(f"v{version}.json")
        if content is None:
            raise FileNotFoundError(f"manifest v{version}.json missing")
        return json.loads(content)

    def staged_versions(self) -> list[int]:
        """Manifests written but never published (not on CURRENT's parent
        chain): in-flight WAP stages plus orphans from crashes between
        staging and publish. Ascending."""
        published = set(self.versions())
        return [v for v in self._all_manifest_versions() if v not in published]

    def read_added(self, spark: SparkSession, version: int) -> DataFrame | None:
        """Read ONLY the files a commit ADDED (its own commit dir) — the
        write-audit-publish audit unit: for a merge-on-read epoch these
        are the epoch's LWW winners, so auditing them costs O(epoch), not
        O(table), regardless of lake size. ``_bucket`` partition dirs are
        resolved and dropped."""
        commit_dir = self._manifest_raw(version).get("commit_dir")
        if not commit_dir or not self.data_fs.is_dir(commit_dir):
            return None
        df = spark.read.parquet(commit_dir)
        return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df

    def publish(self, version: int) -> None:
        """Publish a staged commit: flip CURRENT to ``version``, iff the
        table's published head is still the parent the stage was built on
        (optimistic concurrency — the Iceberg commit-conflict rule,
        enforced under the same lock as every other flip). A stale stage
        must be rejected and re-staged against the new head;
        fast-forwarding it would silently drop the interleaved commit's
        files from the merged manifest."""
        m = self._manifest_raw(version)
        if self.current_version() == version:
            return  # already published (publish-retry after crash)
        self._flip(version, m.get("parent"))

    def reject_staged(self, version: int) -> None:
        """Discard a staged commit: delete the files it added, the bucket
        manifest shards it wrote (never carried ones — other snapshots
        reference those), and its manifest. Refuses published versions
        (those are table history). The snapshot manifest goes FIRST so a
        crash mid-reject leaves only unreferenced blobs (vacuum's job),
        never a manifest naming deleted shards."""
        if version in set(self.versions()):
            raise ValueError(f"v{version} is published; reject_staged only discards stages")
        m = self._manifest_raw(version)
        self.store.delete(f"v{version}.json")
        for rel in m.get("added_manifests", []):
            self.store.delete(rel)
        commit_dir = m.get("commit_dir")
        if commit_dir:
            self.data_fs.remove_dir(commit_dir)

    def cleanup_staged(self) -> int:
        """Reclaim ALL unpublished manifests and their files (orphans from
        crashes between staging and publish). Single-writer maintenance
        op — do not run concurrently with an in-flight stage. Returns the
        number of stages removed."""
        staged = self.staged_versions()
        for v in staged:
            self.reject_staged(v)
        return len(staged)

    # -- compaction ------------------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        buckets: set[int] | None = None,
        gc_horizon_ts: str | None = None,
        max_records_per_file: int | None = None,
    ) -> int:
        """Fold delta files back into base files (merge-on-read →
        merge-on-write, amortized): LWW-merge base+delta for every bucket
        that has deltas (or the given subset), rewrite those buckets as
        new base files, and drop the consumed deltas — one atomic
        maintenance commit. Buckets without deltas are untouched. Returns
        the number of compacted buckets.

        ``gc_horizon_ts`` (ISO timestamp, e.g. ``"2024-01-01 12:00:00"``)
        additionally garbage-collects tombstones: deleted rows whose
        order timestamp is at or before the horizon are physically
        dropped, and the horizon is recorded in the manifest so the apply
        engine REFUSES events at or before it from then on — without that
        gate, a late old update could resurrect a GC'd deleted key.
        Tombstones newer than the horizon are kept (they still shield
        their key from in-retention late events). A GC pass sweeps EVERY
        bucket (tombstones live in base files too), so schedule it like
        any full-table maintenance op, not per epoch. State grows with
        live keys only once GC runs periodically — without it, every
        deleted key leaves a tombstone forever.

        Concurrency: compaction races with ingest by design (on a real
        cluster maintenance runs alongside the apply job). A commit
        conflict means an epoch published between our read and our flip —
        the compacted files would drop that epoch's deltas, so the commit
        is discarded and the whole pass retries against the new head
        (up to 3 attempts, then the conflict propagates)."""
        last_err: CommitConflictError | None = None
        for _attempt in range(3):
            try:
                return self._compact_once(spark, buckets, gc_horizon_ts, max_records_per_file)
            except CommitConflictError as e:
                last_err = e
        raise last_err

    def _compact_once(
        self,
        spark: SparkSession,
        buckets: set[int] | None = None,
        gc_horizon_ts: str | None = None,
        max_records_per_file: int | None = None,
    ) -> int:
        snap = self.current_snapshot()
        if snap is None:
            return 0
        targets = snap.all_buckets() if gc_horizon_ts else snap.delta_buckets()
        if buckets is not None:
            targets &= set(buckets)
        if not targets:
            return 0
        merged = self.read(spark, buckets=targets, merge=True)
        if gc_horizon_ts and "deleted" in merged.columns:
            ts_col = self.order_cols[0]
            merged = merged.where(
                ~(F.col("deleted") & (F.col(ts_col) <= F.to_timestamp(F.lit(gc_horizon_ts))))
            )
        merged = merged.withColumn(
            BUCKET_COL, bucket_expr(F.col(self.key_col), self.num_buckets)
        )
        # key-sorted base files (Iceberg sort order): a LOCAL sort on the
        # already-bucket-partitioned data — no shuffle. partitionBy's
        # required ordering (bucket) is satisfied by (bucket, key), so the
        # write preserves it; each base file then covers a tight key range
        # and the manifest min/max bounds make point lookups skip files.
        merged = merged.sortWithinPartitions(BUCKET_COL, self.key_col)
        self.commit(
            merged,
            touched_buckets=targets,
            epoch=None,
            schema=snap.schema,
            summary={"compacted_buckets": len(targets)},
            mode="rewrite",
            gc_horizon=gc_horizon_ts,
            max_records_per_file=max_records_per_file,
        )
        return len(targets)

    # -- snapshot expiration -----------------------------------------------------

    def expire_snapshots(self, keep_last: int = 10) -> dict:
        """Expire old snapshots (Iceberg ``expire_snapshots``): drop all
        but the newest ``keep_last`` published manifests and physically
        delete data files referenced ONLY by the expired ones. This is
        what bounds metadata and storage growth under continuous ingest —
        every delta commit and compaction strands superseded files that
        only the manifest history keeps alive; without expiration the
        table's footprint grows with every commit forever.

        The time-travel horizon shrinks accordingly: ``version_asof_epoch``
        / ``read(version=...)`` only see retained snapshots (that is the
        Iceberg trade too). The current snapshot is always retained.
        Driver-side metadata surgery only — no Spark job; file deletes
        happen AFTER the expired manifests are removed, so a crash
        mid-expire leaves at worst unreferenced files (re-running expire
        is a no-op for manifests and harmless for files), never a
        published manifest pointing at deleted data."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        versions = self.versions()
        keep = set(versions[-keep_last:])
        cur = self.current_version()
        if cur is not None:
            keep.add(cur)
        expired = [v for v in versions if v not in keep]
        if not expired:
            return {"expired_versions": 0, "removed_files": 0, "removed_shards": 0}

        def _files(snap: Snapshot) -> set[str]:
            return {
                f
                for groups in (snap.file_groups, snap.delta_groups)
                for by_bucket in groups.values()
                for fs in by_bucket.values()
                for f in fs
            }

        live = set()
        live_shards: set[str] = set()
        for v in keep:
            live |= _files(self.snapshot(v))
            live_shards |= set(
                (self._manifest_raw(v).get("bucket_manifests") or {}).values()
            )
        # staged (unpublished) manifests pin their shards AND their data
        # files: a staged commit carries its parent's files by reference,
        # and that parent may be in the expired set — deleting those
        # files would break the WAP auditor's read of the staged version
        for v in self.staged_versions():
            live |= _files(self.snapshot(v))
            live_shards |= set(
                (self._manifest_raw(v).get("bucket_manifests") or {}).values()
            )
        dead = set()
        dead_shards: set[str] = set()
        for v in expired:
            dead |= _files(self.snapshot(v)) - live
            dead_shards |= (
                set((self._manifest_raw(v).get("bucket_manifests") or {}).values())
                - live_shards
            )
        # manifests first (see docstring crash ordering)
        for v in expired:
            self.store.delete(f"v{v}.json")
        for rel in dead_shards:
            self.store.delete(rel)
        removed = 0
        for f in sorted(dead):
            # through the data-IO seam: on an object-store table the local
            # os.path.exists would be False for every path and expiry
            # would silently reclaim nothing, forever
            removed += int(self.data_fs.delete_file(f))
        return {
            "expired_versions": len(expired),
            "removed_files": removed,
            "removed_shards": len(dead_shards),
        }

    # -- orphan-file vacuum -------------------------------------------------------

    def vacuum(self, min_age_seconds: float = 3600.0) -> dict:
        """Delete data files referenced by NO manifest (published, staged,
        or orphaned): leftovers from commits that crashed after writing
        data but before writing their manifest. `expire_snapshots` and
        `reject_staged`/`cleanup_staged` handle files that a manifest
        still names; this sweeps the files nothing names — under
        continuous ingest with occasional crashes they otherwise
        accumulate forever (Iceberg's `remove_orphan_files`).

        ``min_age_seconds`` is the correctness guard: a commit writes its
        files BEFORE its manifest, so a younger-than-threshold
        unreferenced file may belong to an in-flight commit — it is kept.
        Driver-side only; no Spark job."""
        import time as _time

        referenced: set[str] = set()
        referenced_shards: set[str] = set()
        for v in self._all_manifest_versions():
            m = self._manifest_raw(v)
            file_groups, delta_groups, _, _ = self._resolve_groups(m)
            for groups in (file_groups, delta_groups):
                for by_bucket in groups.values():
                    for fs in by_bucket.values():
                        referenced.update(fs)
            referenced_shards.update((m.get("bucket_manifests") or {}).values())
        # Spark writes bookkeeping next to the data (.crc checksums,
        # _SUCCESS markers) that manifests never name: in a LIVE commit
        # dir they must survive (deleting a live file's .crc defeats
        # checksum verification), in a dead dir they go with it. The
        # _SUCCESS marker sits at the commit-dir ROOT — the PARENT of the
        # bucket dirs the data files live in — so live parents are kept
        # too, or every vacuumed live commit would read as incomplete to
        # tooling that gates on the marker.
        ref_dirs = {os.path.dirname(f) for f in referenced}
        ref_dirs |= {os.path.dirname(d) for d in ref_dirs}
        removed = 0
        now = _time.time()
        # through the data-IO seam (walk + mtime + delete): an
        # object-store table vacuums its own storage, not a nonexistent
        # local directory
        for p, mtime in self.data_fs.walk_files(self.data_dir):
            if p in referenced:
                continue
            fn = os.path.basename(p)
            is_data = fn.endswith(".parquet") and not fn.startswith(".")
            if not is_data and os.path.dirname(p) in ref_dirs:
                continue  # live dir bookkeeping
            if now - mtime < min_age_seconds:
                continue
            if self.data_fs.delete_file(p) and is_data:
                removed += 1  # bookkeeping isn't counted as data
        # prune directories the sweep emptied (real filesystems only)
        self.data_fs.prune_empty_dirs(self.data_dir)
        # stale quarantine staging dirs (.tmp-epoch-*): hidden from readers
        # (Spark skips dot-prefixed paths) but left behind by a crash
        # between the dead-letter write and its rename-into-place
        qdir = os.path.join(self.path, "_quarantine")
        removed_staging = 0
        for p in self.data_fs.list_dirs(qdir):
            if (
                os.path.basename(p).startswith(".tmp-")
                and now - self.data_fs.mtime(p) >= min_age_seconds
            ):
                self.data_fs.remove_dir(p)
                removed_staging += 1
        # bucket-manifest shards referenced by NO manifest: a crash between
        # shard write and manifest claim, or a partial reject, strands
        # them. Same age guard as data files (a younger shard may belong
        # to an in-flight commit whose manifest isn't claimed yet);
        # unknown age (mtime None) is treated as too young.
        removed_shards = 0
        for rel in self.store.list("manifests/"):
            if rel in referenced_shards:
                continue
            age_base = self.store.mtime(rel)
            if age_base is None or now - age_base < min_age_seconds:
                continue
            self.store.delete(rel)
            removed_shards += 1
        return {
            "removed_files": removed,
            "removed_staging_dirs": removed_staging,
            "removed_shards": removed_shards,
        }

    # -- bucket-count evolution -------------------------------------------------

    def rebucket(self, spark: SparkSession, new_num_buckets: int) -> int:
        """Change the table's bucket count — the maintenance op a growing
        table needs: bucket count fixes merge/sort parallelism and
        per-bucket task size, so a table that grew 100x needs more
        buckets than it was created with. Reads the full merged state,
        re-partitions it under the new bucket function, and publishes ONE
        atomic rewrite commit whose manifest records the new count —
        readers/writers opening the table after the swap use the new
        property automatically (and stale writers that pass the old count
        explicitly now fail the constructor check). Crash-safe: until the
        manifest pointer flips, the old manifest (old count, old files)
        stays current. Returns the new bucket count."""
        if new_num_buckets < 1:
            raise ValueError("new_num_buckets must be >= 1")
        snap = self.current_snapshot()
        if snap is None:
            self.num_buckets = new_num_buckets
            return new_num_buckets
        old_buckets = snap.all_buckets()
        merged = self.read(spark, merge=True)
        old_count = self.num_buckets
        self.num_buckets = new_num_buckets
        try:
            if merged is None:
                # empty table: publish a props-only manifest via an empty commit
                data = spark.createDataFrame([], snap.schema).withColumn(
                    BUCKET_COL, F.lit(0).cast("int")
                )
                touched = old_buckets or {0}
            else:
                # the merge's shuffle is keyed on the OLD bucket ids; one
                # extra shuffle clusters rows by the new bucket function so
                # each new bucket is written as ~one file (rare maintenance
                # op — the cost is a single pass over the table)
                data = merged.withColumn(
                    BUCKET_COL, bucket_expr(F.col(self.key_col), new_num_buckets)
                ).repartition(new_num_buckets, F.col(BUCKET_COL))
                # every pre-existing bucket is replaced; every new-numbering
                # bucket may be written
                touched = old_buckets | set(range(new_num_buckets))
            self.commit(
                data,
                touched_buckets=touched,
                epoch=None,
                schema=snap.schema,
                summary={"rebucketed_from": old_count, "rebucketed_to": new_num_buckets},
                mode="rewrite",
            )
        except Exception:
            self.num_buckets = old_count  # commit never published; keep truth
            raise
        return new_num_buckets
