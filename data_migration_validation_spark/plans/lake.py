"""Snapshot-committed, bucket-partitioned lake table (Iceberg-style).

The real deployment target is Apache Iceberg (``MERGE INTO`` on a table
partitioned by ``bucket(N, url)``); the Iceberg runtime jars are not in
this container, so this module implements the same *semantics* on plain
Parquet + atomic metadata renames, behind an interface the apply engine
uses. The key properties it reproduces:

* **atomic snapshot commits** — a commit is visible iff the CURRENT
  pointer file references its manifest; manifest and pointer are written
  via write-temp-then-``os.rename`` (atomic on POSIX);
* **idempotent, epoch-keyed commits** — each snapshot records the set of
  applied batch epochs (like Iceberg snapshot summary properties); a
  commit for an already-applied epoch is a no-op, which is what makes
  replay-after-crash exactly-once;
* **bucket-level copy-on-write MERGE** — state is hash-bucketed by key;
  a commit rewrites only the buckets touched by the batch and carries
  every other bucket's files forward by reference. At 100 TB this is the
  difference between rewriting gigabytes and rewriting the lake;
* **schema evolution without rewrites** — the manifest records a schema
  per file group; readers upcast old files to the current schema
  (additive columns read as null, widened types cast up), so adding a
  column or widening int→long never rewrites data.

Layout::

    table/
      data/commit-<version>/bucket=<k>/part-*.parquet
      _meta/v<version>.json     # manifest: files per bucket + schema + epochs
      _meta/CURRENT             # atomic pointer: current version number

Reference parity note: this generalizes the reference's CSV "sink"
(/root/reference/src/validate.py:133-139 writes proof CSVs) into the
engine's durable, versioned output surface.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

BUCKET_COL = "_bucket"


def bucket_expr(key: Column, num_buckets: int) -> Column:
    """Engine-wide bucketing function: pmod(xxhash64(key), B). Matches the
    spirit of Iceberg's bucket transform (hash of key mod N)."""
    return F.pmod(F.xxhash64(key), F.lit(num_buckets)).cast("int")


def _atomic_write(path: str, content: str) -> None:
    d = os.path.dirname(path)
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


@dataclass
class Snapshot:
    version: int
    epochs: list[int]  # all batch epochs applied as of this snapshot
    schema: StructType  # current logical schema
    # file groups: schema_json -> {bucket(str) -> [file paths]}
    file_groups: dict[str, dict[str, list[str]]]
    summary: dict

    def files_for(self, buckets: set[int] | None) -> dict[str, list[str]]:
        """schema_json -> file list, optionally restricted to buckets
        (manifest-level partition pruning: untouched buckets are never
        even listed, let alone read)."""
        out: dict[str, list[str]] = {}
        for schema_json, by_bucket in self.file_groups.items():
            fs: list[str] = []
            for b, paths in by_bucket.items():
                if buckets is None or int(b) in buckets:
                    fs.extend(paths)
            if fs:
                out[schema_json] = fs
        return out


class LakeTable:
    """Bucket-partitioned, snapshot-committed keyed table."""

    def __init__(self, path: str, key_col: str = "url", num_buckets: int = 32):
        self.path = path
        self.key_col = key_col
        self.num_buckets = num_buckets
        self.meta_dir = os.path.join(path, "_meta")
        self.data_dir = os.path.join(path, "data")
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- snapshot bookkeeping -------------------------------------------------

    def current_version(self) -> int | None:
        cur = os.path.join(self.meta_dir, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return int(f.read().strip())

    def current_snapshot(self) -> Snapshot | None:
        v = self.current_version()
        if v is None:
            return None
        with open(os.path.join(self.meta_dir, f"v{v}.json")) as f:
            m = json.load(f)
        return Snapshot(
            version=m["version"],
            epochs=m["epochs"],
            schema=StructType.fromJson(json.loads(m["schema"])),
            file_groups=m["file_groups"],
            summary=m.get("summary", {}),
        )

    def epochs_applied(self) -> set[int]:
        snap = self.current_snapshot()
        return set(snap.epochs) if snap else set()

    def _next_version(self) -> int:
        # Scan existing manifests (not CURRENT) so a crash between manifest
        # write and pointer update never reuses a version number.
        versions = [
            int(fn[1:-5])
            for fn in os.listdir(self.meta_dir)
            if fn.startswith("v") and fn.endswith(".json")
        ]
        return (max(versions) + 1) if versions else 0

    # -- read -----------------------------------------------------------------

    def read(self, spark: SparkSession, buckets: set[int] | None = None) -> DataFrame | None:
        """Current state (optionally only the given buckets). Old file
        groups are upcast to the current schema: missing columns → null,
        narrower numeric types → cast up. Returns None for an empty table."""
        snap = self.current_snapshot()
        if snap is None:
            return None
        groups = snap.files_for(buckets)
        if not groups:
            return spark.createDataFrame([], snap.schema)
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

    # -- commit ---------------------------------------------------------------

    def commit(
        self,
        new_bucket_data: DataFrame,
        touched_buckets: set[int],
        epoch: int,
        schema: StructType,
        summary: dict | None = None,
    ) -> tuple[bool, int]:
        """Atomically commit one epoch: write parquet for touched buckets,
        carry all other buckets forward, publish the new manifest.

        Returns ``(committed, rows_written)``; rows come from the written
        files' parquet footers (driver-side metadata — no counting job),
        or ``None`` when footers are unreadable (unknown, not a count).
        ``(False, 0)`` if ``epoch`` was already applied — the idempotency
        guard that makes crash-replay exactly-once. ``new_bucket_data``
        must contain ``_bucket`` and exactly the columns of ``schema``,
        and must only produce rows in ``touched_buckets`` (enforced).
        """
        prev = self.current_snapshot()
        applied = set(prev.epochs) if prev else set()
        if epoch in applied:
            return False, 0

        version = self._next_version()
        commit_dir = os.path.join(self.data_dir, f"commit-{version}-{uuid.uuid4().hex[:8]}")
        # No repartition here: the caller shuffles by _bucket already (the
        # merge's LWW shuffle is keyed on the bucket — see
        # operators/lww.lww_window_bucketed), so each task holds whole
        # buckets and partitionBy writes ~one file per bucket.
        (
            new_bucket_data.write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(commit_dir)
        )

        # Collect written files per bucket.
        new_by_bucket: dict[str, list[str]] = {}
        for entry in os.listdir(commit_dir):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            b = entry.split("=", 1)[1]
            bdir = os.path.join(commit_dir, entry)
            files = [
                os.path.join(bdir, fn)
                for fn in os.listdir(bdir)
                if fn.endswith(".parquet")
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
        file_groups: dict[str, dict[str, list[str]]] = {}
        if prev is not None:
            for sj, by_bucket in prev.file_groups.items():
                kept = {b: fs for b, fs in by_bucket.items() if int(b) not in touched_buckets}
                if kept:
                    file_groups[sj] = kept
        merged = file_groups.setdefault(schema_json, {})
        for b, fs in new_by_bucket.items():
            merged.setdefault(b, []).extend(fs)
        if not merged:
            file_groups.pop(schema_json, None)
            file_groups.setdefault(schema_json, {})  # keep schema recorded

        rows_written: int | None = 0
        try:
            import pyarrow.parquet as pq

            for files in new_by_bucket.values():
                for fp in files:
                    rows_written += pq.ParquetFile(fp).metadata.num_rows
        except Exception:
            rows_written = None  # footer stats unavailable; not fatal —
            # callers must treat None as "unknown", never as a count

        manifest = {
            "version": version,
            "epochs": sorted(applied | {epoch}),
            "schema": schema.json(),
            "file_groups": file_groups,
            "summary": {**(summary or {}), "epoch": epoch},
        }
        _atomic_write(os.path.join(self.meta_dir, f"v{version}.json"), json.dumps(manifest))
        _atomic_write(os.path.join(self.meta_dir, "CURRENT"), str(version))
        return True, rows_written
