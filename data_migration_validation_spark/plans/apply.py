"""CDC apply engine: epoch-by-epoch replay of a binlog into the lake table.

Per epoch (SURVEY.md §3 engine lifecycle):

1. **idempotency guard** — skip epochs already in the current snapshot's
   epoch set (crash between commit and checkpoint → re-run is a no-op);
2. **lineage pre-scan** — per-bucket (min seq, max seq, event count) from
   a COLUMN-PRUNED aggregation over the raw slice (only the key and seq
   columns are read — the html payload never flows through this job);
   also yields the touched-bucket set for manifest pruning;
3. **flatten + text extraction (map-side)** — payload struct flattened
   to columns; vectorized Arrow UDF html→text fused into the scan stage,
   on this batch's events only (state rows never re-cross Python);
4. **schema merge** — incoming schema merged into the registry (additive
   columns, widening) — the durable registry IS the lake snapshot schema;
5. **single-shuffle MERGE, merge-on-read by default** — the epoch's
   events take the LWW winner per key ((warc_ts, seq) desc) in ONE
   window keyed on the bucket, and that shuffle IS the write
   partitioning. In ``mor`` mode (default) the winners land as
   per-bucket DELTA files with no state read — write volume ∝ epoch
   size, never table size — and readers LWW-merge base+delta (deltas
   folded into base every ``compact_every`` epochs). In ``cow`` mode the
   touched state buckets are read (manifest-level pruning), unioned with
   the events, and rewritten merged. Either way out-of-order older
   events cannot overwrite newer state, and tombstones (op='D') are kept
   as deleted=true rows so a late old update cannot resurrect a deleted
   key. The salted applyInPandas LWW (north-star operator, robust to a
   single hot KEY) is the optional pre-reduction path (use_pandas_lww);
6. **atomic epoch-keyed commit** + per-partition lineage + metrics +
   checkpoint. Post-commit row counts come from the written parquet
   footers (driver-side metadata, no extra job).

Scale notes: the heavy path is ONE declarative single-pass plan with ONE
fat-row shuffle per epoch — no persist/cache, no double materialization.
The driver never holds data rows; it only sees the touched-bucket list,
lineage aggregates, and file-footer stats.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, replace as dc_replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_migration_validation_spark.functions.text import extract_text
from data_migration_validation_spark.operators.lww import (
    lww_apply_in_pandas,
    lww_window,
    lww_window_bucketed,
)
from data_migration_validation_spark.plans.checkpoint import CheckpointStore
from data_migration_validation_spark.plans.lake import (
    BUCKET_COL,
    CommitConflictError,
    LakeTable,
    bucket_expr,
)
from data_migration_validation_spark.schema import SchemaRegistry, conform, merge_schemas

ENVELOPE_COLS = ("op", "url", "warc_ts", "seq", "payload", "batch_epoch")


class EpochOriginConflict(RuntimeError):
    """An idempotent epoch skip found the committed epoch was written by
    a DIFFERENT kind of writer (commit-summary ``origin`` tag mismatch).
    Identical-epoch convergence — the rule that makes skipping an
    already-committed epoch safe — only holds between writers replaying
    the same deterministic source slice; a mismatched origin means THIS
    caller's events were never applied, so skipping silently would lose
    them. Both directions are loud: a normal ingest whose epoch number
    was taken by a redrive commit raises here (its source slice was not
    applied), and a redrive whose epoch was taken by a normal ingest
    raises too (handled by redrive_quarantine, which retires the burned
    intent and leaves the sources pending)."""


def quarantine_epoch_dirs(quarantine_dir: str, pending_only: bool = True) -> list[str]:
    """``epoch=K`` directories under a quarantine table, optionally only
    those without a ``_REDRIVEN`` marker, sorted by epoch."""
    if not os.path.isdir(quarantine_dir):
        return []
    out = []
    for name in os.listdir(quarantine_dir):
        if not name.startswith("epoch="):
            continue
        p = os.path.join(quarantine_dir, name)
        if not os.path.isdir(p):
            continue
        if pending_only and os.path.exists(os.path.join(p, "_REDRIVEN")):
            continue
        out.append(p)
    return sorted(out, key=lambda p: int(p.rsplit("=", 1)[1]))


def read_quarantine_dirs(
    spark: SparkSession, quarantine_dir: str, dirs: list[str]
) -> DataFrame:
    """Union the given quarantine epoch partitions under the registry's
    widening rules. NOT parquet ``mergeSchema``: the envelope evolves
    mid-stream, and quarantined rows keep their delivery-time schema —
    a type-widened column (e.g. fetch_status int→long at evo3) across
    two epochs is a CANNOT_MERGE_SCHEMAS error for mergeSchema, while
    the engine's own lattice (``schema.merge_schemas``/``conform``)
    widens it exactly as the lake serves old data files. Partitions are
    grouped by identical schema first, so the union is
    O(distinct schemas) branches — one per evolution step — not
    O(epochs). Grouping reads one parquet FOOTER per directory on the
    driver (pyarrow, ~ms each) rather than a full Spark reader
    resolution per epoch: the dead-letter table is append-only (redriven
    partitions are kept as lineage), so a long-lived table has hundreds
    of epoch dirs and only a handful of distinct schemas — Spark is
    invoked once per distinct schema, not once per epoch."""
    import pyarrow.parquet as pq

    groups: dict[str, list[str]] = {}
    for d in dirs:
        parts = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        if not parts:
            continue  # marker-only/empty partition: nothing to union
        key = pq.read_schema(os.path.join(d, parts[0])).to_string()
        groups.setdefault(key, []).append(d)
    frames = [
        spark.read.option("basePath", quarantine_dir).parquet(*group)
        for group in groups.values()
    ]
    if not frames:
        # the engine only ever creates a quarantine partition BY writing
        # rows into it, so epoch dirs with no parquet at all mean the
        # files were removed externally. A schema-less Spark read here
        # would raise an opaque AnalysisException ("unable to infer
        # schema") — fail with the actual story instead.
        raise FileNotFoundError(
            f"quarantine partitions contain no parquet files: "
            f"{sorted(dirs)} — the dead-letter table is append-only and "
            f"every partition is written with rows; were the files "
            f"deleted externally?"
        )
    target = None
    for part in frames:
        target = (
            part.schema if target is None else merge_schemas(target, part.schema)
        )
    out = None
    for part in frames:
        part = conform(part, target)
        out = part if out is None else out.unionByName(part)
    return out


@dataclass
class ApplyStats:
    epoch: int
    skipped: bool
    events_seen: int = 0
    # rows physically written by this epoch's commit (from parquet
    # footers). MODE-DEPENDENT by design: in mor mode this is the epoch's
    # delta winners; in cow mode it is the full rewritten content of the
    # touched buckets — the checkpoint metric is emitted as
    # rows_written_<mode> so the two are never conflated in a series.
    # None = footers unreadable (unknown), never a sentinel count.
    rows_written: int | None = 0
    buckets_touched: int = 0
    seconds: float = 0.0
    quarantined: int = 0
    # write-audit-publish outcome: rejected=True means the staged commit
    # FAILED its audit and was discarded — the table did not change and
    # the epoch is not checkpointed (a later retry re-stages it).
    # audit_violations carries the nonzero check counts.
    rejected: bool = False
    audit_violations: dict | None = None
    # content-novelty filter (plans/novelty.py): upsert winners dropped
    # because their text fingerprint was seen in an earlier epoch (or
    # earlier in this one). 0 when the filter is off.
    novelty_dropped: int = 0


class CDCApplyEngine:
    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        checkpoint_path: str,
        key_col: str | None = None,
        num_buckets: int | None = None,
        use_pandas_lww: bool = False,
        n_salts: int = 16,
        in_batch_prededup: bool = False,
        merge_mode: str = "mor",
        compact_every: int | None = 8,
        enrich_text: bool = False,
        quarantine: bool = True,
        text_extract: str = "arrow",
        store=None,
        novelty_filter: bool | str = False,
        novelty_buckets: int = 16,
        novelty_bloom_bits: int = 1 << 20,
        novelty_max_bucket: int | None = None,
        data_fs=None,
    ):
        """``in_batch_prededup``: add a key-hash pre-shuffle that dedups the
        batch BEFORE text extraction and the merge. Worth it for backfill /
        replay batches with many versions per key in one epoch (extraction
        then runs on winners only); for a streaming tail (~1 version per key
        per epoch) the extra fat-row shuffle costs more than the duplicate
        extraction it saves, so the default is the single-shuffle path.

        ``merge_mode``: ``"mor"`` (default) commits each epoch's LWW
        winners as per-bucket DELTA files — no state read, write volume
        proportional to the epoch, readers merge base+delta per key;
        ``compact_every`` epochs the deltas are folded into base files.
        ``"cow"`` reads the touched state buckets each epoch and rewrites
        them merged — simpler reads, but with uniformly distributed keys
        every epoch touches every bucket, i.e. rewrites the table.

        ``enrich_text``: run the training-data text-analysis operators on
        ingest — language id, quality score, and a 64-bit fingerprint per
        page (functions/text.py) — stored as ``lang_guess`` / ``quality``
        / ``fingerprint`` columns. This is the production shape of a
        corpus pipeline (enrich once at ingest, filter cheaply forever);
        all three are pure Column expressions (whole-stage codegen) over
        the post-dedup winners.

        ``quarantine``: route malformed events (null key / null warc_ts /
        null seq / unknown op) to a dead-letter table under the lake dir
        instead of failing the epoch. With ``quarantine=False`` a
        malformed row FAILS the epoch loudly before anything is written
        (note Spark's hash functions return their seed for NULL input —
        a null key would otherwise bucket normally and be applied
        silently, never tripping the stray-bucket invariant). Detection
        piggybacks on the lineage
        pre-scan (two extra slim columns, no extra job); the quarantine
        WRITE only runs for epochs that actually have violations, into an
        epoch-keyed directory (idempotent under crash-replay). Reasons in
        generation order: nothing downstream of the envelope can be
        trusted for a row that fails it, so one reason per row suffices.

        ``novelty_filter``: drop upsert winners whose extracted TEXT was
        already ingested in an earlier epoch (content dedup at ingest —
        bloom pre-pass + fingerprint-index exact check, plans/novelty.py).
        ``True`` / ``"exact"`` = byte-identical text; ``"minhash"`` =
        NEAR-duplicate admission (MinHash-banded, signature-similarity
        threshold — drops boilerplate variants exact hashing misses).
        Deletes always pass through. Requires merge_mode="mor" (admission
        semantics are defined over per-epoch LWW winners)."""
        if merge_mode not in ("mor", "cow"):
            raise ValueError(f"unknown merge_mode {merge_mode!r}")
        if text_extract not in ("arrow", "expr"):
            raise ValueError(f"unknown text_extract {text_extract!r}")
        self.spark = spark
        # key_col/num_buckets are TABLE properties: None adopts an existing
        # table's recorded values (or url/32 for a new table); a conflicting
        # explicit value raises in the LakeTable constructor
        # `store` selects the commit-protocol storage backend (POSIX
        # rename/link/flock by default; ConditionalPutCommitStore for
        # object stores — see plans/commit_store.py)
        # `data_fs` selects the DRIVER-side data-file IO backend (fsio.
        # DataFS; local os by default, any pyarrow.fs.FileSystem for an
        # object store). The quarantine/redrive surface (partition
        # listing, _REDRIVEN markers, intent files) and the novelty
        # index listings are still local-POSIX-only — refuse loudly
        # rather than silently report an empty dead-letter table on a
        # non-local deployment (the same silent-no-op failure the lake's
        # own maintenance seam exists to prevent).
        if data_fs is not None and getattr(data_fs, "pafs", None) is not None:
            if quarantine:
                raise NotImplementedError(
                    "the quarantine/redrive surface does driver-side "
                    "POSIX IO (partition listing, markers, intents) and "
                    "would silently see an empty dead-letter table on a "
                    "non-local data_fs — pass quarantine=False, or keep "
                    "a POSIX-mounted table path"
                )
            if novelty_filter and novelty_filter != "off":
                raise NotImplementedError(
                    "the novelty index does driver-side POSIX listings "
                    "and is not yet wired to a non-local data_fs"
                )
        self.lake = LakeTable(
            table_path,
            key_col=key_col,
            num_buckets=num_buckets,
            store=store,
            data_fs=data_fs,
        )
        self.ckpt = CheckpointStore(checkpoint_path)
        self.key_col = self.lake.key_col
        self.use_pandas_lww = use_pandas_lww
        self.in_batch_prededup = in_batch_prededup
        self.n_salts = n_salts
        self.merge_mode = merge_mode
        self.compact_every = compact_every
        self.enrich_text = enrich_text
        self.quarantine = quarantine
        # "arrow" = the north-star vectorized Arrow UDF (default; honest
        # cost model for Python-only extraction libs); "expr" = the
        # byte-identical-on-valid-UTF-8 JVM expression twin
        # (functions/text.extract_text_expr) — whole-stage codegen, no
        # Python worker pool in the apply hot path.
        self.text_extract = text_extract
        self.quarantine_dir = os.path.join(table_path, "_quarantine")
        if novelty_filter not in (False, True, "exact", "minhash", "off"):
            raise ValueError(f"unknown novelty_filter {novelty_filter!r}")
        # "off" = explicit opt-out: ingest WITHOUT admission into a table
        # whose novelty mode is pinned (see _assert_novelty_config) —
        # an operator decision, never a default
        self._novelty_opt_out = novelty_filter == "off"
        if self._novelty_opt_out:
            novelty_filter = False
        if novelty_filter and merge_mode != "mor":
            raise ValueError("novelty_filter requires merge_mode='mor'")
        # where NoveltyFilter's commit store pins the table's admission
        # mode on first use (plans/novelty.py:_ensure_mode)
        self._novelty_pin_path = os.path.join(
            table_path, "_novelty", "blooms", "_mode"
        )
        if novelty_filter:
            from data_migration_validation_spark.plans.novelty import NoveltyFilter

            self.novelty: NoveltyFilter | None = NoveltyFilter(
                os.path.join(table_path, "_novelty"),
                n_buckets=novelty_buckets,
                bloom_bits=novelty_bloom_bits,
            )
            self.novelty_mode = "minhash" if novelty_filter == "minhash" else "exact"
        else:
            self.novelty = None
            self.novelty_mode = None
        # minhash mode only: in-epoch band buckets over this size skip the
        # O(m²) pairwise scan and collapse to first-seen (skew guard for
        # near-identical variant floods); None = exact semantics
        self.novelty_max_bucket = novelty_max_bucket
        self.registry = SchemaRegistry()
        snap = self.lake.current_snapshot()
        if snap is not None:
            self.registry.current = snap.schema

    # -- one epoch --------------------------------------------------------------

    def _assert_novelty_config(self) -> None:
        """Refuse to WRITE epochs without novelty admission into a table
        whose novelty mode is pinned. An engine constructed without
        ``novelty_filter`` (the default — every read-only consumer does
        this) would otherwise commit content that bypasses admission:
        the committed-but-unindexed epochs are treated as bootstrap
        history by later admits, so identical content re-admits forever
        — a permanent, silent corruption of the dedup contract. Checked
        on every apply (one stat call; the pin can appear mid-stream
        when another writer first enables the filter). Explicit opt-out:
        ``novelty_filter="off"``."""
        if self.novelty is not None or self._novelty_opt_out:
            return
        try:
            with open(self._novelty_pin_path) as f:
                pin = f.read().strip()
        except (FileNotFoundError, NotADirectoryError):
            return
        raise ValueError(
            f"table was ingested with a pinned novelty mode ({pin}); "
            f"applying epochs without the filter would commit content "
            f"that bypasses admission and permanently break the table's "
            f"dedup contract — construct the engine with the matching "
            f"novelty_filter (CLI: --novelty), or pass "
            f"novelty_filter='off' to deliberately ingest without it"
        )

    def _check_skip_origin(self, epoch: int, commit_summary: dict | None) -> None:
        """Guard the idempotent skip: the committed epoch's origin tag
        (O(1) from the current manifest) must match this caller's.
        Identical-epoch convergence assumes both writers replay the same
        deterministic source slice; a redrive taking an ingest's epoch
        number (or vice versa) breaks that, and skipping silently would
        lose the caller's events."""
        mine = (commit_summary or {}).get("origin")
        theirs = self.lake.epoch_origin(epoch)
        if theirs != mine:
            raise EpochOriginConflict(
                f"epoch {epoch} is committed with origin="
                f"{theirs or 'ingest'!r} but this apply carries origin="
                f"{mine or 'ingest'!r} — the idempotent skip only converges "
                f"between writers replaying the same source slice, so this "
                f"call's events were NOT applied (redrives must use epoch "
                f"numbers no ingest will replay)"
            )

    def apply_epoch(
        self,
        events: DataFrame,
        epoch: int,
        crash_after_commit: bool = False,
        audit=None,
        crash_after_stage: bool = False,
        commit_summary: dict | None = None,
    ) -> ApplyStats:
        """Apply one epoch's events to the lake table.

        ``commit_summary``: extra provenance keys folded into the
        commit's manifest summary (Iceberg snapshot-summary properties)
        — e.g. the redrive protocol tags its commits ``origin=redrive``
        so a later reader of :meth:`LakeTable.epoch_summary` can tell
        which writer won an epoch race. Reserved keys (``epoch``,
        ``touched_buckets``, ``applied_events``) cannot be overridden.

        Determinism contract: ``events`` is evaluated TWICE (the lineage
        pre-scan and the merge plan) and must produce the same rows both
        times — no non-deterministic expressions (rand, monotonically_
        increasing_id), no sampling, no source directory mutated
        mid-epoch. A violation would put rows in buckets outside the
        declared touched set; ``LakeTable.commit`` fails such commits
        rather than silently double-registering state.

        ``audit`` (write-audit-publish, Iceberg WAP): a callable
        ``DataFrame -> {check: violations}`` (see ``operators/audit``).
        When set, the epoch's commit is STAGED invisibly, the audit runs
        over exactly the files the commit added (O(epoch) in mor mode),
        and the snapshot is published only if every count is zero —
        otherwise the stage is discarded, the table is untouched, the
        epoch stays un-checkpointed (a retry re-stages it), and the
        returned stats carry ``rejected=True`` + the violation counts.
        A crash between staging and publish leaves an invisible orphan
        manifest; the retry re-stages under a fresh version and the
        orphan is reclaimable via ``LakeTable.cleanup_staged()``."""
        t0 = time.monotonic()
        self._assert_novelty_config()
        if epoch in self.lake.epochs_applied():
            self._check_skip_origin(epoch, commit_summary)
            return ApplyStats(epoch=epoch, skipped=True)

        key = self.key_col
        horizon = self.lake.gc_horizon()
        valid, in_horizon = self._admission_exprs(horizon)
        # 2. lineage pre-scan: per-bucket source offsets + event counts
        # from ONLY slim envelope columns — column pruning keeps the html
        # payload out of this job entirely (at a parquet source this is a
        # 4-column scan). Malformed (-1) and too-late (-2) rows fold into
        # the SAME aggregation as sentinel groups — their counts cost no
        # extra job. `valid` is checked first so a null warc_ts lands in
        # quarantine, not silently in the horizon drop.
        bucket_assign = (
            F.when(~valid, F.lit(-1))
            .when(~in_horizon, F.lit(-2))
            .otherwise(bucket_expr(F.col(key), self.lake.num_buckets))
        )
        scan_rows = (
            events.select(key, "seq", "op", "warc_ts")
            .withColumn(BUCKET_COL, bucket_assign)
            .groupBy(BUCKET_COL)
            .agg(
                F.min("seq").alias("source_offset_start"),
                F.max("seq").alias("source_offset_end"),
                F.count("*").alias("applied_events"),
            )
            .collect()
        )
        n_quarantined = sum(r["applied_events"] for r in scan_rows if r[BUCKET_COL] == -1)
        n_late_dropped = sum(r["applied_events"] for r in scan_rows if r[BUCKET_COL] == -2)
        novelty_dropped = 0  # set by the novelty filter in the mor branch
        if n_quarantined and not self.quarantine:
            # quarantine off = malformed input is a hard error, BEFORE any
            # write. It cannot be delegated to the commit's stray-bucket
            # invariant: xxhash64(NULL) returns the seed, so a null key
            # buckets like any other value and would be applied silently.
            raise ValueError(
                f"epoch {epoch}: {n_quarantined} malformed event(s) "
                f"(null key/warc_ts/seq or unknown op) and quarantine is "
                f"disabled — nothing was written; fix the feed or enable "
                f"quarantine to dead-letter them"
            )
        lineage_rows = [r for r in scan_rows if r[BUCKET_COL] >= 0]
        touched = {r[BUCKET_COL] for r in lineage_rows}
        n_events = sum(r["applied_events"] for r in lineage_rows)

        if n_quarantined:
            self._write_quarantine(events, epoch, valid)
        if self.quarantine and n_quarantined:
            events = events.where(valid)
        if horizon is not None:
            events = events.where(in_horizon)

        def _commit(**kw):
            # concurrent-writer safety: a commit conflict whose epoch was
            # published by ANOTHER writer is this engine's idempotent
            # skip (two replayers of the same log converge); a conflict
            # from an interleaved maintenance commit (compaction racing
            # ingest) retries — lake.commit re-reads the head, so the
            # retry parents off the maintenance commit's manifest and the
            # deterministic merge plan re-executes safely.
            for attempt in range(3):
                try:
                    return self.lake.commit(**kw)
                except CommitConflictError:
                    if epoch in self.lake.epochs_applied():
                        return False, 0
                    # the merge plan's admission filter baked the gc
                    # horizon in as a LITERAL at planning time; if the
                    # conflicting commit advanced it (a GC compaction
                    # racing this ingest), retrying the stale plan would
                    # apply events at/below the new horizon — resurrecting
                    # keys whose tombstones that GC just dropped. Fail
                    # loudly instead: apply_epoch is idempotent, so the
                    # caller re-applies and re-plans against the new head.
                    cur_h = self.lake.gc_horizon()
                    if cur_h != horizon:
                        raise RuntimeError(
                            f"epoch {epoch}: gc horizon advanced from "
                            f"{horizon!r} to {cur_h!r} while this apply was "
                            f"in flight; the epoch's admission filter is "
                            f"stale — re-apply the epoch to re-plan against "
                            f"the new horizon"
                        ) from None
                    if attempt == 2:
                        raise

        # 3. flatten payload; tombstones keep null payload columns
        flat = events.select(
            key,
            "warc_ts",
            "seq",
            (F.col("op") == "D").alias("deleted"),
            F.col("payload.*"),
        )
        has_html = "html" in flat.columns

        if self.merge_mode == "mor":
            # 4-6 (merge-on-read): NO state read at all. The epoch's raw
            # events LWW-reduce in ONE bucket-keyed window (which is also
            # the write partitioning); vectorized text extraction runs
            # AFTER the window, on winners only — one fat shuffle carrying
            # html (not text), extraction over the minimum row set, and
            # delta files whose volume is ∝ epoch size, never table size.
            # The cross-epoch merge happens at read time (amortized by
            # compaction). in_batch_prededup is a no-op here (the window
            # already is the in-batch dedup); the salted applyInPandas
            # path (north-star operator, hot-KEY robust) still pre-reduces
            # when selected.
            src = flat
            if self.use_pandas_lww:
                src = lww_apply_in_pandas(
                    src, key=key, order=("warc_ts", "seq"), n_salts=self.n_salts
                )
            src = src.withColumn(BUCKET_COL, bucket_expr(F.col(key), self.lake.num_buckets))
            winners = lww_window_bucketed(
                src,
                key=key,
                order=("warc_ts", "seq"),
                bucket_col=BUCKET_COL,
                num_partitions=self.lake.num_buckets,
            )
            if has_html:
                winners = winners.withColumn("text", self._extract(F.col("html")))
                winners = self._enrich(winners)
            if self.novelty is not None:
                if "text" not in winners.columns:
                    raise ValueError(
                        "novelty_filter needs an extracted 'text' column "
                        "(events must carry payload.html)"
                    )
                # only STRICTLY EARLIER committed epochs gate admission —
                # an out-of-order replay must not see its own or later
                # epochs' fingerprints as history
                committed = {e for e in self.lake.epochs_applied() if e < epoch}
                extra_kw = {}
                if self.novelty_mode == "minhash":
                    admit = self.novelty.admit_neardup
                    if self.novelty_max_bucket is not None:
                        extra_kw["max_bucket"] = self.novelty_max_bucket
                else:
                    admit = self.novelty.admit
                winners, nstats = admit(
                    self.spark,
                    winners,
                    epoch,
                    committed,
                    text_col="text",
                    key_col=key,
                    **extra_kw,
                )
                novelty_dropped = nstats.dropped
            target = self.registry.merge(winners.drop(BUCKET_COL).schema)
            merged = conform(winners, target).withColumn(
                BUCKET_COL, bucket_expr(F.col(key), self.lake.num_buckets)
            )
            commit_mode = "delta"
        else:
            # 4. in-batch LWW (CoW path). Window path: SKIPPED as a
            # separate shuffle — raw events go straight into the bucket-
            # keyed merge window below, which deduplicates and merges in
            # the SAME shuffle (the one that is also the write
            # partitioning). One fat shuffle per epoch total. The salted
            # applyInPandas path still pre-reduces when selected.
            if self.use_pandas_lww:
                pre = lww_apply_in_pandas(
                    flat, key=key, order=("warc_ts", "seq"), n_salts=self.n_salts
                )
            elif self.in_batch_prededup:
                pre = lww_window(flat, key=key, order=("warc_ts", "seq"))
            else:
                pre = flat

            # 5. vectorized text extraction MAP-SIDE, before the shuffle:
            # runs on this batch's events only (state rows never re-cross
            # the Python boundary — their text is already stored), and
            # fuses into the scan stage. Extracting post-merge instead
            # would pull state rows through Python again.
            if has_html:
                pre = pre.withColumn("text", self._extract(F.col("html")))
                pre = self._enrich(pre)

            # schema merge (registry == durable snapshot schema)
            target = self.registry.merge(pre.schema)
            pre = conform(pre, target).withColumn(
                BUCKET_COL, bucket_expr(F.col(key), self.lake.num_buckets)
            )
            state = self.lake.read(self.spark, buckets=touched)
            if state is not None and state.schema != target:
                state = conform(state, target)
            merged = pre
            if state is not None:
                merged = merged.unionByName(
                    state.withColumn(BUCKET_COL, bucket_expr(F.col(key), self.lake.num_buckets))
                )
            # 6. dedup + upsert in ONE window over the bucket shuffle (which
            # is also the write partitioning)
            merged = lww_window_bucketed(
                merged,
                key=key,
                order=("warc_ts", "seq"),
                bucket_col=BUCKET_COL,
                num_partitions=self.lake.num_buckets,
            )
            commit_mode = "rewrite"

        def _stage_and_commit():
            # a FRESH observation per attempt: pyspark's Observation caches
            # the first action's metrics, so re-staging after a publish
            # conflict must re-attach, or the audit would judge attempt 1's
            # counts against attempt 2's files
            m, obs = self._attach_inline_audit(merged, audit)
            c, rw = _commit(
                new_bucket_data=m,
                touched_buckets=touched,
                epoch=epoch,
                schema=target,
                summary={**(commit_summary or {}), "applied_events": n_events},
                mode=commit_mode,
                publish=audit is None,
            )
            return c, rw, obs

        committed, rows_written, inline_obs = _stage_and_commit()

        if committed and audit is not None:
            # publish under the same bounded-retry policy as _commit: a
            # compaction commit racing an audited epoch moves the head
            # between stage and publish; the losing stage is rejected and
            # the epoch re-stages (re-executes the deterministic merge
            # plan) against the new head instead of raising out of
            # apply_epoch and stranding an orphan manifest.
            for attempt in range(3):
                staged_v = self.lake.last_staged_version
                if crash_after_stage:
                    raise RuntimeError("injected crash between stage and publish")
                if inline_obs is not None:
                    # counts were collected by the staging write itself
                    violations = audit.postprocess(inline_obs.get)
                else:
                    staged = self.lake.read_added(self.spark, staged_v)
                    violations = audit(staged)
                bad = {k: int(v) for k, v in violations.items() if v}

                # audit metrics are appended exactly ONCE per epoch — on
                # the definitive outcome (rejection, or after the publish
                # lands). Appending per attempt would double-count
                # audit_* / audit_rejected rows when a publish conflict
                # forces a re-stage, skewing per-epoch metric consumers.
                def _record_audit(violations, bad):
                    self.ckpt.append_metrics(
                        [
                            {
                                "epoch": epoch,
                                "stage": "audit",
                                "metric": f"audit_{name}",
                                "value": float(count),
                            }
                            for name, count in violations.items()
                        ]
                        + [
                            {
                                "epoch": epoch,
                                "stage": "audit",
                                "metric": "audit_rejected",
                                "value": float(bool(bad)),
                            }
                        ]
                    )

                if bad:
                    _record_audit(violations, bad)
                    self.lake.reject_staged(staged_v)
                    if self.novelty is not None:
                        # the rejected epoch's admit() left its frames
                        # persisted; the normal-path release below is
                        # skipped by this early return
                        self.novelty.release()
                    return ApplyStats(
                        epoch=epoch,
                        skipped=False,
                        events_seen=int(n_events),
                        buckets_touched=len(touched),
                        seconds=time.monotonic() - t0,
                        quarantined=int(n_quarantined),
                        rejected=True,
                        audit_violations=bad,
                    )
                try:
                    self.lake.publish(staged_v)
                    _record_audit(violations, bad)
                    break
                except CommitConflictError:
                    self.lake.reject_staged(staged_v)
                    if epoch in self.lake.epochs_applied():
                        # another replayer won: idempotent skip — the
                        # winner records the epoch's audit metrics
                        committed = False
                        break
                    # same staleness rule as _commit's conflict path: the
                    # merge plan baked the gc horizon in as a literal, and
                    # staged commits never conflict (only the publish flip
                    # does) — so a GC advancing the horizon between stage
                    # and publish lands HERE. Re-staging the stale plan
                    # would apply events at/below the new horizon,
                    # resurrecting keys whose tombstones that GC dropped.
                    cur_h = self.lake.gc_horizon()
                    if cur_h != horizon:
                        raise RuntimeError(
                            f"epoch {epoch}: gc horizon advanced from "
                            f"{horizon!r} to {cur_h!r} while this apply was "
                            f"in flight; the epoch's admission filter is "
                            f"stale — re-apply the epoch to re-plan against "
                            f"the new horizon"
                        ) from None
                    if attempt == 2:
                        raise
                    committed, rows_written, inline_obs = _stage_and_commit()
                    if not committed:
                        break
        commit_ts = time.time()
        if committed:
            self.ckpt.append_lineage(
                [
                    {
                        "epoch": epoch,
                        "partition": int(r[BUCKET_COL]),
                        "source_offset_start": int(r["source_offset_start"]),
                        "source_offset_end": int(r["source_offset_end"]),
                        "applied_events": int(r["applied_events"]),
                        "commit_ts": commit_ts,
                    }
                    for r in lineage_rows
                ]
            )
            dt = time.monotonic() - t0
            metrics = [
                {"epoch": epoch, "stage": "apply", "metric": "applied_events", "value": float(n_events)},
                {"epoch": epoch, "stage": "apply", "metric": "buckets_touched", "value": float(len(touched))},
                {"epoch": epoch, "stage": "apply", "metric": "seconds", "value": dt},
            ]
            if n_quarantined:
                metrics.append(
                    {"epoch": epoch, "stage": "apply", "metric": "quarantined_events", "value": float(n_quarantined)}
                )
            if n_late_dropped:
                metrics.append(
                    {"epoch": epoch, "stage": "apply", "metric": "late_dropped_events", "value": float(n_late_dropped)}
                )
            if rows_written is not None:  # omit when footers were unreadable
                # mode-tagged: mor counts delta winners, cow counts full
                # rewritten buckets — not comparable, so never one series
                metrics.insert(
                    1,
                    {
                        "epoch": epoch,
                        "stage": "apply",
                        "metric": f"rows_written_{self.merge_mode}",
                        "value": float(rows_written),
                    },
                )
            self.ckpt.append_metrics(metrics)
        if not committed:
            # a commit/publish conflict resolved to "another writer already
            # committed this epoch" — safe only if that writer was the same
            # KIND of writer (same origin). Checked before the epoch is
            # checkpointed so a conflict raise leaves the checkpoint clean.
            try:
                self._check_skip_origin(epoch, commit_summary)
            except EpochOriginConflict:
                if self.novelty is not None:
                    self.novelty.release()
                raise
        if crash_after_commit:
            raise RuntimeError("injected crash between commit and checkpoint")
        self.ckpt.write_epoch(epoch)

        # periodic compaction: fold accumulated delta files into base
        # files so read-side merge cost stays bounded. Triggered on the
        # ACCUMULATED delta depth (max delta files on any bucket, from the
        # manifest — no job), not on the epoch number: an epoch-modulo
        # trigger that crashes between checkpoint and compact() never
        # reruns (replay hits the idempotency guard), letting deltas pile
        # up until the next boundary; a state-based trigger self-heals on
        # the next applied epoch.
        if (
            committed
            and self.merge_mode == "mor"
            and self.compact_every
            and self.lake.current_snapshot().delta_depth() >= self.compact_every
        ):
            n_compacted = self.lake.compact(self.spark)
            if n_compacted:
                self.ckpt.append_metrics(
                    [
                        {
                            "epoch": epoch,
                            "stage": "compact",
                            "metric": "compacted_buckets",
                            "value": float(n_compacted),
                        }
                    ]
                )
            if self.novelty is not None:
                # same cadence: fold per-epoch novelty index partitions so
                # the admit-time exact check plans O(buckets) files, not
                # O(epochs × buckets)
                self.novelty.compact_index(
                    self.spark, self.lake.epochs_applied()
                )

        if self.novelty is not None:
            self.novelty.release()
        return ApplyStats(
            epoch=epoch,
            skipped=not committed,
            events_seen=int(n_events),
            rows_written=None if rows_written is None else int(rows_written),
            buckets_touched=len(touched),
            seconds=time.monotonic() - t0,
            quarantined=int(n_quarantined),
            novelty_dropped=int(novelty_dropped),
        )

    def apply_epoch_group(
        self,
        slices: dict[int, DataFrame],
        commit_summary: dict | None = None,
        crash_after_commit: bool = False,
    ) -> list[ApplyStats]:
        """Apply SEVERAL pending epochs in ONE shuffle and ONE atomic
        snapshot commit — commit coalescing, the backlog-catch-up shape.

        At 1e10-event scale the sequential replay's cost is
        per-epoch-fixed-latency × epochs (lineage job + merge job +
        commit metadata per epoch — BENCH.md's profiling shows the fixed
        term dominating at realistic epoch sizes). A replayer that is
        BEHIND the log does not need per-epoch snapshot granularity to
        catch up: LWW by (warc_ts, seq) over the UNION of k epochs picks
        exactly the winner that k sequential applies would leave, so the
        group commits as one delta write. What is traded away, explicitly:

        * snapshot granularity — time travel (``read_asof``) resolves to
          GROUP boundaries inside the grouped range (mid-group epochs
          have no published snapshot of their own);
        * per-epoch audit gating — write-audit-publish judges an epoch's
          files in isolation; a grouped stage cannot attribute a
          violation to one epoch. ``replay(group_size=..., audit=...)``
          therefore stays sequential;
        * per-epoch novelty admission — first-seen ordering ACROSS the
          grouped epochs is what the novelty index records; collapsing
          them would mis-attribute first-seen epochs, so a novelty-
          configured engine refuses the group path.

        What is NOT traded away: exactly-once (the group's epochs are
        recorded atomically in the one manifest — a crash commits none
        or all; re-running skips wholly-applied groups and re-plans
        partial overlaps), per-epoch lineage (the pre-scan aggregates
        per (epoch, bucket), one lineage file per epoch as in sequential
        replay), per-epoch quarantine attribution (invalid rows
        dead-letter into their own ``epoch=K`` partition), and the
        bucket-pinned single-shuffle merge plan.

        Merge-on-read only: a CoW group would read and rewrite state
        under the union's buckets — correct, but the group's write is
        then O(table), defeating the point; use sequential CoW applies.

        Returns one ApplyStats per input epoch (skipped=True for epochs
        already applied; applied epochs carry their own events_seen /
        quarantined, and ``seconds`` is the GROUP's wall time — the cost
        is genuinely shared, there is no per-epoch attribution)."""
        t0 = time.monotonic()
        self._assert_novelty_config()
        if self.novelty is not None:
            raise ValueError(
                "apply_epoch_group cannot run with a novelty filter: "
                "admission is first-seen-per-epoch order-dependent across "
                "epochs — replay sequentially (apply_epoch per epoch)"
            )
        if self.merge_mode != "mor":
            raise ValueError(
                "apply_epoch_group requires merge_mode='mor' — a CoW "
                "group rewrites O(table) for the union's buckets; use "
                "sequential apply_epoch in cow mode"
            )

        applied = self.lake.epochs_applied()
        stats: dict[int, ApplyStats] = {}
        pending: dict[int, DataFrame] = {}
        for e in sorted(slices):
            if e in applied:
                self._check_skip_origin(e, commit_summary)
                stats[e] = ApplyStats(epoch=e, skipped=True)
            else:
                pending[int(e)] = slices[e]
        if not pending:
            return [stats[e] for e in sorted(stats)]
        if len(pending) == 1:
            e, df = next(iter(pending.items()))
            stats[e] = self.apply_epoch(df, e, commit_summary=commit_summary)
            return [stats[e] for e in sorted(stats)]

        key = self.key_col
        horizon = self.lake.gc_horizon()
        valid, in_horizon = self._admission_exprs(horizon)
        group = sorted(pending)

        # grouped lineage pre-scan: ONE job over the union of the slim
        # envelope columns (epoch-tagged), aggregated per (epoch, bucket)
        # — same column pruning as the sequential path (html never flows
        # through this job), k× fewer jobs. Sentinel buckets: -1 invalid,
        # -2 past-horizon, folded into the same aggregation.
        bucket_assign = (
            F.when(~valid, F.lit(-1))
            .when(~in_horizon, F.lit(-2))
            .otherwise(bucket_expr(F.col(key), self.lake.num_buckets))
        )
        slim = None
        for e in group:
            s = (
                pending[e]
                .select(key, "seq", "op", "warc_ts")
                .withColumn("_epoch", F.lit(int(e)))
            )
            slim = s if slim is None else slim.unionByName(s)
        scan_rows = (
            slim.withColumn(BUCKET_COL, bucket_assign)
            .groupBy("_epoch", BUCKET_COL)
            .agg(
                F.min("seq").alias("source_offset_start"),
                F.max("seq").alias("source_offset_end"),
                F.count("*").alias("applied_events"),
            )
            .collect()
        )
        by_epoch: dict[int, dict] = {
            e: {"quarantined": 0, "late": 0, "lineage": []} for e in group
        }
        for r in scan_rows:
            acc = by_epoch[int(r["_epoch"])]
            if r[BUCKET_COL] == -1:
                acc["quarantined"] += r["applied_events"]
            elif r[BUCKET_COL] == -2:
                acc["late"] += r["applied_events"]
            else:
                acc["lineage"].append(r)
        n_quarantined = sum(a["quarantined"] for a in by_epoch.values())
        if n_quarantined and not self.quarantine:
            bad = {e: a["quarantined"] for e, a in by_epoch.items() if a["quarantined"]}
            raise ValueError(
                f"epoch group {group}: malformed event(s) {bad} (null "
                f"key/warc_ts/seq or unknown op) and quarantine is "
                f"disabled — nothing was written; fix the feed or enable "
                f"quarantine to dead-letter them"
            )
        for e in group:
            if by_epoch[e]["quarantined"]:
                # per-epoch dead-letter partitions: attribution survives
                # grouping (each epoch=K dir holds only its own rows)
                self._write_quarantine(pending[e], e, valid)

        touched = {
            int(r[BUCKET_COL]) for a in by_epoch.values() for r in a["lineage"]
        }
        n_events = sum(
            int(r["applied_events"]) for a in by_epoch.values() for r in a["lineage"]
        )

        # merge input: per-epoch flatten under each slice's OWN payload
        # schema, then widen to the group's schema lattice before the
        # union — mid-group schema evolution (new columns, type widening)
        # unions exactly as the lake serves old data files (conform),
        # where a raw unionByName would fail on a widened type.
        flats = []
        for e in group:
            ev = pending[e].where(valid)
            if horizon is not None:
                ev = ev.where(in_horizon)
            flats.append(
                ev.select(
                    key,
                    "warc_ts",
                    "seq",
                    (F.col("op") == "D").alias("deleted"),
                    F.col("payload.*"),
                )
            )
        lattice = flats[0].schema
        for f in flats[1:]:
            lattice = merge_schemas(lattice, f.schema)
        # teach the registry each epoch's WINNER-shaped schema in epoch
        # order (flat + the post-extraction columns), exactly as k
        # sequential applies would — so the committed column ORDER is
        # independent of whether a stretch of the log was replayed
        # sequentially or grouped
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        for f in flats:
            fields = list(f.schema.fields)
            if "html" in f.schema.fieldNames():
                fields.append(StructField("text", StringType()))
                if self.enrich_text:
                    fields += [
                        StructField("lang_guess", StringType()),
                        StructField("quality", DoubleType()),
                        StructField("fingerprint", LongType()),
                    ]
            self.registry.merge(StructType(fields))
        src = None
        for f in flats:
            c = conform(f, lattice)
            src = c if src is None else src.unionByName(c)
        has_html = "html" in src.columns

        # the mor merge, unchanged from apply_epoch: LWW winner per key
        # across the WHOLE group in one bucket-keyed window (LWW over a
        # union ≡ sequential per-epoch LWW — max by (warc_ts, seq) is
        # associative), shuffle pinned at the bucket count, extraction
        # on winners only, delta volume ∝ group size.
        if self.use_pandas_lww:
            src = lww_apply_in_pandas(
                src, key=key, order=("warc_ts", "seq"), n_salts=self.n_salts
            )
        src = src.withColumn(BUCKET_COL, bucket_expr(F.col(key), self.lake.num_buckets))
        winners = lww_window_bucketed(
            src,
            key=key,
            order=("warc_ts", "seq"),
            bucket_col=BUCKET_COL,
            num_partitions=self.lake.num_buckets,
        )
        if has_html:
            winners = winners.withColumn("text", self._extract(F.col("html")))
            winners = self._enrich(winners)
        target = self.registry.merge(winners.drop(BUCKET_COL).schema)
        merged = conform(winners, target).withColumn(
            BUCKET_COL, bucket_expr(F.col(key), self.lake.num_buckets)
        )

        summary = {
            **(commit_summary or {}),
            "applied_events": n_events,
            "applied_events_by_epoch": {
                str(e): sum(int(r["applied_events"]) for r in by_epoch[e]["lineage"])
                for e in group
            },
        }
        committed, rows_written = True, 0
        for attempt in range(3):
            try:
                committed, rows_written = self.lake.commit(
                    new_bucket_data=merged,
                    touched_buckets=touched,
                    epoch=group,
                    schema=target,
                    summary=summary,
                    mode="delta",
                )
                break
            except CommitConflictError:
                won = set(group) & self.lake.epochs_applied()
                if won == set(group):
                    committed, rows_written = False, 0
                    break
                if won:
                    # another writer (a sequential replayer) committed a
                    # SUBSET of this group mid-flight — the group's merge
                    # plan includes those epochs' events, so committing
                    # the remainder as-is would re-write their content
                    # under wrong attribution. Idempotent: re-call and
                    # the pending filter re-plans without them.
                    raise RuntimeError(
                        f"epoch group {group}: epochs {sorted(won)} were "
                        f"committed by another writer mid-group — re-call "
                        f"apply_epoch_group to re-plan without them"
                    ) from None
                cur_h = self.lake.gc_horizon()
                if cur_h != horizon:
                    # same staleness rule as apply_epoch: the admission
                    # filter baked the gc horizon in as a literal
                    raise RuntimeError(
                        f"epoch group {group}: gc horizon advanced from "
                        f"{horizon!r} to {cur_h!r} while this apply was in "
                        f"flight — re-apply the group to re-plan against "
                        f"the new horizon"
                    ) from None
                if attempt == 2:
                    raise

        commit_ts = time.time()
        dt = time.monotonic() - t0
        if committed:
            for e in group:
                self.ckpt.append_lineage(
                    [
                        {
                            "epoch": e,
                            "partition": int(r[BUCKET_COL]),
                            "source_offset_start": int(r["source_offset_start"]),
                            "source_offset_end": int(r["source_offset_end"]),
                            "applied_events": int(r["applied_events"]),
                            "commit_ts": commit_ts,
                        }
                        for r in by_epoch[e]["lineage"]
                    ]
                )
                e_events = sum(
                    int(r["applied_events"]) for r in by_epoch[e]["lineage"]
                )
                metrics = [
                    {"epoch": e, "stage": "apply", "metric": "applied_events", "value": float(e_events)},
                    {"epoch": e, "stage": "apply", "metric": "buckets_touched", "value": float(len(by_epoch[e]["lineage"]))},
                ]
                if by_epoch[e]["quarantined"]:
                    metrics.append(
                        {"epoch": e, "stage": "apply", "metric": "quarantined_events", "value": float(by_epoch[e]["quarantined"])}
                    )
                if by_epoch[e]["late"]:
                    metrics.append(
                        {"epoch": e, "stage": "apply", "metric": "late_dropped_events", "value": float(by_epoch[e]["late"])}
                    )
                self.ckpt.append_metrics(metrics)
            # group-level: wall time and written rows are genuinely
            # shared across the group — recorded once under the group's
            # max epoch, never split by a fictitious attribution
            gm = [
                {"epoch": group[-1], "stage": "apply_group", "metric": "group_epochs", "value": float(len(group))},
                {"epoch": group[-1], "stage": "apply_group", "metric": "seconds", "value": dt},
                {"epoch": group[-1], "stage": "apply_group", "metric": "applied_events", "value": float(n_events)},
            ]
            if rows_written is not None:
                gm.append(
                    {"epoch": group[-1], "stage": "apply_group", "metric": f"rows_written_{self.merge_mode}", "value": float(rows_written)}
                )
            self.ckpt.append_metrics(gm)
        else:
            # conflict resolved to "another writer applied the whole
            # group" — converged iff the same KIND of writer did
            for e in group:
                self._check_skip_origin(e, commit_summary)
        if crash_after_commit:
            # test hook, same contract as apply_epoch's: the group is
            # committed (atomically, all k epochs) but NOT checkpointed —
            # a crash-replay must hit the lake's idempotency guard and
            # skip the whole group, never double-apply it
            raise RuntimeError("injected crash between commit and checkpoint")
        self.ckpt.write_epoch(group[-1])

        if (
            committed
            and self.compact_every
            and self.lake.current_snapshot().delta_depth() >= self.compact_every
        ):
            n_compacted = self.lake.compact(self.spark)
            if n_compacted:
                self.ckpt.append_metrics(
                    [
                        {
                            "epoch": group[-1],
                            "stage": "compact",
                            "metric": "compacted_buckets",
                            "value": float(n_compacted),
                        }
                    ]
                )

        for e in group:
            e_events = sum(int(r["applied_events"]) for r in by_epoch[e]["lineage"])
            stats[e] = ApplyStats(
                epoch=e,
                skipped=not committed,
                events_seen=e_events,
                # per-epoch write attribution does not exist in a group
                # commit — None is "unknown", the group metric has the total
                rows_written=None,
                buckets_touched=len(by_epoch[e]["lineage"]),
                seconds=dt,
                quarantined=int(by_epoch[e]["quarantined"]),
            )
        return [stats[e] for e in sorted(stats)]

    def _admission_exprs(self, horizon: str | None):
        """The two admission predicates, shared by the single-epoch and
        group apply paths (evaluated identically in the lineage pre-scan
        and the merge plan — the determinism contract):

        * ``valid`` — envelope sanity; a failing row cannot be applied
          meaningfully and is routed to the quarantine table (or fails
          the epoch when quarantine is off). op.isNotNull first: a bare
          isin(...) yields NULL (not False) for a NULL op under
          three-valued logic, and a NULL ``valid`` fails BOTH the
          quarantine branch (~valid is NULL) and the apply filter — the
          row would vanish from every path while still being counted as
          seen. Reachable via the Debezium parser, which maps unmapped
          ops to NULL.
        * ``in_horizon`` — tombstone-GC retention gate: events at or
          before the recorded horizon are contractually too late (their
          tombstones may already be physically gone); admitting one
          could resurrect a GC'd deleted key, so they are dropped."""
        key = self.key_col
        valid = (
            F.col(key).isNotNull()
            & F.col("warc_ts").isNotNull()
            & F.col("seq").isNotNull()
            & F.col("op").isNotNull()
            & F.col("op").isin("I", "U", "D")
        )
        in_horizon = (
            F.lit(True)
            if horizon is None
            else F.col("warc_ts") > F.to_timestamp(F.lit(horizon))
        )
        return valid, in_horizon

    def _write_quarantine(self, events: DataFrame, epoch: int, valid) -> None:
        """Dead-letter write of one epoch's invalid rows — only called for
        epochs that actually have violations. Stage-then-rename instead of
        mode("overwrite") on the final dir: a crash mid-overwrite would
        leave a half-deleted epoch dir, and two replayers racing the same
        epoch could interleave each other's deletes and writes. The rename
        is atomic; a loser (dir already renamed in — the content is
        deterministic, so identical) discards its stage."""
        import shutil as _shutil
        import uuid as _uuid

        key = self.key_col
        reason = (
            F.when(F.col(key).isNull(), F.lit("null_key"))
            .when(F.col("warc_ts").isNull(), F.lit("null_warc_ts"))
            .when(F.col("seq").isNull(), F.lit("null_seq"))
            .otherwise(F.lit("bad_op"))
        )
        staging = os.path.join(
            self.quarantine_dir, f".tmp-epoch-{epoch}-{_uuid.uuid4().hex[:8]}"
        )
        (
            events.where(~valid)
            .withColumn("_reason", reason)
            .write.mode("overwrite")
            .parquet(staging)
        )
        final_dir = os.path.join(self.quarantine_dir, f"epoch={epoch}")
        if os.path.isdir(final_dir):
            # crash-replay: a complete previous write is equivalent
            # (deterministic content) — keep it, drop the stage
            _shutil.rmtree(staging)
        else:
            try:
                os.rename(staging, final_dir)
            except OSError:
                _shutil.rmtree(staging)  # concurrent writer won

    def _attach_inline_audit(self, df, audit):
        """Inline write-audit-publish: attach the audit's aggregate
        expressions to the merge plan via DataFrame.observe, so the
        STAGING WRITE itself collects the check counts — zero extra
        Spark jobs (vs the classic mode's one O(epoch) scan of the
        staged files). Returns (df, Observation|None)."""
        if audit is None or not getattr(audit, "inline", False):
            return df, None
        from pyspark.sql import Observation

        obs = Observation()
        return df.observe(obs, *audit.agg_exprs(df.columns)), obs

    def _extract(self, html_col):
        if self.text_extract == "expr":
            from data_migration_validation_spark.functions.text import extract_text_expr

            return extract_text_expr(html_col)
        return extract_text(html_col)

    def _enrich(self, df: DataFrame) -> DataFrame:
        """Ingest-time text analysis (enrich_text option): language id,
        quality score, 64-bit content fingerprint — Column-only
        expressions over the extracted text. Deletes carry nulls."""
        if not self.enrich_text:
            return df
        from data_migration_validation_spark.functions.text import lang_id, quality_score

        t = F.col("text")
        return (
            df.withColumn("lang_guess", F.when(t.isNotNull(), lang_id(t)))
            .withColumn("quality", F.when(t.isNotNull(), quality_score(t)))
            .withColumn("fingerprint", F.when(t.isNotNull(), F.xxhash64(t)))
        )

    # -- full replay --------------------------------------------------------------

    def replay(
        self,
        slices: dict[int, DataFrame],
        resume: bool = True,
        audit=None,
        group_size: int = 1,
    ) -> list[ApplyStats]:
        """Apply epoch slices in epoch order; with resume=True, epochs at or
        below the checkpoint are still offered to apply_epoch, whose lake
        guard skips them (the lake, not the checkpoint, is truth).
        ``audit`` enables write-audit-publish per epoch; a rejected epoch
        STOPS the replay (later epochs must not commit on top of a hole
        in the epoch line) — its stats entry carries the violations.

        ``group_size > 1`` batches consecutive epochs through
        :meth:`apply_epoch_group` (one shuffle + one atomic snapshot per
        group — the backlog-catch-up path; see its docstring for the
        granularity trade). Grouping silently degrades to sequential
        when a per-epoch gate is configured — ``audit`` (the WAP gate
        judges epochs in isolation), a novelty filter (admission is
        first-seen-per-epoch), or cow mode (a grouped rewrite is
        O(table)) — so ``group_size`` is always safe to pass."""
        if (
            group_size > 1
            and audit is None
            and self.novelty is None
            and self.merge_mode == "mor"
        ):
            epochs = sorted(slices)
            stats = []
            for i in range(0, len(epochs), group_size):
                chunk = {e: slices[e] for e in epochs[i : i + group_size]}
                stats.extend(self.apply_epoch_group(chunk))
            return stats
        stats = []
        for epoch in sorted(slices):
            st = self.apply_epoch(slices[epoch], epoch, audit=audit)
            stats.append(st)
            if st.rejected:
                break
        return stats

    # -- reads ---------------------------------------------------------------------

    def read_state(self) -> DataFrame | None:
        """Current materialized table incl. tombstones."""
        return self.lake.read(self.spark)

    def read_final(self) -> DataFrame | None:
        """Live rows only (tombstones filtered)."""
        st = self.read_state()
        return None if st is None else st.where(~F.col("deleted")).drop("deleted")

    def read_asof(self, epoch: int) -> DataFrame | None:
        """Live rows as the table stood after batch ``epoch`` — time
        travel along the epoch line (Iceberg: ``FOR VERSION AS OF``).
        Served entirely from the retained manifest history: no state is
        reconstructed by replay, the historical snapshot's own files and
        bucket layout are read directly, so later epochs, compactions,
        and rebuckets do not disturb it. Returns None if no published
        snapshot covers only epochs ``<= epoch``."""
        v = self.lake.version_asof_epoch(epoch)
        if v is None:
            return None
        st = self.lake.read(self.spark, version=v)
        return None if st is None else st.where(~F.col("deleted")).drop("deleted")

    def lookup(self, key_value: str) -> DataFrame | None:
        """Point lookup of one key's live row — manifest-pruned to the
        key's bucket and the files whose recorded key range covers it
        (``LakeTable.lookup``); tombstoned keys return empty."""
        df = self.lake.lookup(self.spark, key_value)
        if df is None:
            return None
        if "deleted" in df.columns:
            df = df.where(~F.col("deleted")).drop("deleted")
        return df

    def read_quarantine(self, pending_only: bool = False) -> DataFrame | None:
        """Dead-letter table: every quarantined event across all epochs,
        with its rejection ``_reason`` and an ``epoch`` partition column.
        Epoch directories may carry different payload schemas (the
        envelope evolves mid-stream) — merged on read. None if no event
        was ever quarantined.

        ``pending_only=True`` hides epochs already re-admitted by
        :meth:`redrive_quarantine` (their directories carry a
        ``_REDRIVEN`` marker) — the operational "what still needs a fix"
        view. Redriven partitions are never deleted: the dead-letter
        table stays append-only lineage."""
        dirs = self._quarantine_epoch_dirs(pending_only=pending_only)
        if not dirs:
            return None
        return read_quarantine_dirs(self.spark, self.quarantine_dir, dirs)

    # -- quarantine redrive (DLQ reprocess) ----------------------------------------

    def _quarantine_epoch_dirs(self, pending_only: bool = True) -> list[str]:
        return quarantine_epoch_dirs(self.quarantine_dir, pending_only=pending_only)

    def redrive_intent(self, redrive_epoch: int) -> list[int] | None:
        """The source-epoch list a redrive of ``redrive_epoch`` is (or
        was) bound to, if an intent was ever published — intents persist
        as lineage, so this answers "which quarantine partitions did
        redrive epoch N actually cover" after the fact. None if no
        redrive of that epoch was ever started."""
        p = self._redrive_intent_path(redrive_epoch)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return [int(e) for e in json.load(f)["source_epochs"]]

    def _redrive_intent_path(self, redrive_epoch: int) -> str:
        # no '=' in the name: Spark's hidden-file filter exempts names
        # containing '=' (partition-dir support), so an '='-named intent
        # would be read as table data and break the full-dir parquet scan
        return os.path.join(
            self.quarantine_dir, f"_redrive-intent-{redrive_epoch}.json"
        )

    def redrive_quarantine(
        self,
        redrive_epoch: int,
        fix=None,
        source_epochs: list[int] | None = None,
        audit=None,
    ) -> ApplyStats:
        """Re-admit dead-lettered events through the normal exactly-once
        epoch gate (DLQ redrive — Kafka Connect / Kinesis "reprocess the
        dead-letter queue" semantics).

        Reads the pending (un-redriven) quarantine partitions — or the
        explicit ``source_epochs`` — applies the optional ``fix``
        (a declarative ``DataFrame -> DataFrame`` repair, e.g. mapping a
        producer's bad op codes back to I/U/D), and feeds the result to
        :meth:`apply_epoch` as NEW epoch ``redrive_epoch``. Everything
        downstream is the existing machinery: rows the fix did not cure
        re-quarantine under ``redrive_epoch`` (nothing is ever lost),
        LWW ordering by (warc_ts, seq) means a redriven event that is
        older than the key's current state correctly does NOT win, and
        the commit is idempotent under crash-replay.

        Crash-safe protocol (the redrive must never mark a source
        partition redriven unless its rows were part of the committed
        redrive epoch):

        1. publish an INTENT file naming the exact source epochs
           (atomic, create-exclusive via ``os.link``; a resume or a
           racing redriver of the same epoch adopts the existing
           intent's list — so quarantine partitions that appear AFTER
           the intent are never silently marked);
        2. ``apply_epoch(fixed_rows, redrive_epoch)`` — exactly-once;
           a crash after this commit resumes at step 3 because the
           intent survives and the epoch skip is not a failure;
        3. write a ``_REDRIVEN`` marker (idempotent, existence-based;
           Spark readers ignore ``_``-prefixed files) into each source
           partition listed by the intent.

        ``fix`` is part of apply_epoch's determinism contract: it is
        evaluated more than once and must be a pure column-level
        transform. An audit rejection (``stats.rejected``) leaves the
        sources unmarked and the intent in place — the retry re-stages.

        Raises if ``redrive_epoch`` is (or becomes) committed by a normal
        ingest: the up-front check catches an already-committed epoch,
        and the commit's ``origin=redrive`` summary tag catches the
        IN-FLIGHT race — if the post-apply idempotent skip finds the
        epoch was won by a commit without the tag, the sources stay
        pending, the now-unusable intent is retired, and the caller is
        told to retry with an unused epoch (the exactly-once skip would
        otherwise silently drop the redriven rows while marking their
        sources done — data loss). A skip whose winner IS a redrive
        commit is the converging-sibling / crash-resume case: markers
        and lineage metrics complete normally, with the applied-event
        count read back from the commit summary."""
        intent_path = self._redrive_intent_path(redrive_epoch)
        if os.path.exists(intent_path):
            with open(intent_path) as f:
                epochs = json.load(f)["source_epochs"]
        else:
            if redrive_epoch in self.lake.epochs_applied():
                raise ValueError(
                    f"redrive_epoch {redrive_epoch} is already committed by a "
                    f"prior {self.lake.epoch_origin(redrive_epoch) or 'ingest'} "
                    f"and no redrive intent exists for it — the exactly-once "
                    f"skip would discard the redriven events; pick an unused "
                    f"epoch"
                )
            if source_epochs is not None:
                epochs = sorted({int(e) for e in source_epochs})
                # validate BEFORE the intent is durably published: every
                # retry adopts the intent verbatim, so a bad list written
                # into it would wedge this redrive epoch forever
                missing_e = [
                    e
                    for e in epochs
                    if not os.path.isdir(
                        os.path.join(self.quarantine_dir, f"epoch={e}")
                    )
                ]
                if missing_e:
                    raise FileNotFoundError(
                        f"source_epochs name quarantine partitions that do "
                        f"not exist: {missing_e}; no intent was published — "
                        f"fix the list and retry"
                    )
                done = [
                    e
                    for e in epochs
                    if os.path.exists(
                        os.path.join(
                            self.quarantine_dir, f"epoch={e}", "_REDRIVEN"
                        )
                    )
                ]
                if done:
                    raise ValueError(
                        f"source epochs {done} were already redriven (their "
                        f"_REDRIVEN markers exist) — re-admitting them would "
                        f"double-apply the events under a second epoch; pass "
                        f"only pending partitions "
                        f"(read_quarantine(pending_only=True))"
                    )
            else:
                epochs = [
                    int(p.rsplit("=", 1)[1]) for p in self._quarantine_epoch_dirs()
                ]
            if not epochs:
                return ApplyStats(epoch=redrive_epoch, skipped=True)
            os.makedirs(self.quarantine_dir, exist_ok=True)
            tmp = intent_path + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(
                    {"redrive_epoch": redrive_epoch, "source_epochs": epochs}, f
                )
            try:
                os.link(tmp, intent_path)  # create-exclusive publish
            except FileExistsError:
                with open(intent_path) as f:
                    epochs = json.load(f)["source_epochs"]
            finally:
                os.unlink(tmp)

        dirs = [os.path.join(self.quarantine_dir, f"epoch={e}") for e in epochs]
        missing = [d for d in dirs if not os.path.isdir(d)]
        if missing:
            raise FileNotFoundError(
                f"redrive intent for epoch {redrive_epoch} names quarantine "
                f"partitions that do not exist: {missing} (the dead-letter "
                f"table is append-only — was it deleted externally?)"
            )
        events = read_quarantine_dirs(self.spark, self.quarantine_dir, dirs).drop(
            "_reason", "epoch"
        )
        if fix is not None:
            events = fix(events)

        try:
            stats = self.apply_epoch(
                events,
                redrive_epoch,
                audit=audit,
                commit_summary={"origin": "redrive"},
            )
        except EpochOriginConflict:
            # a NORMAL ingest committed this epoch number (entry race or
            # lost publish race): our rows were never applied, so stamping
            # the sources _REDRIVEN would silently lose them. The epoch
            # number is burned — retire the intent (un-wedging the still-
            # pending sources) and tell the operator to retry.
            try:
                os.unlink(intent_path)
            except FileNotFoundError:
                pass
            raise RuntimeError(
                f"redrive epoch {redrive_epoch} was committed by a "
                f"concurrent normal ingest while this redrive was in "
                f"flight — the redriven events were NOT applied. All "
                f"source partitions remain pending and the intent was "
                f"retired; retry with an unused epoch"
            ) from None
        if stats.rejected:
            return stats
        summary: dict = {}
        if stats.skipped:
            # the skip passed the origin check, so the committed epoch IS
            # a redrive of this same intent (sibling / crash resume) —
            # fetch its summary for the applied-event count below
            summary = self.lake.epoch_summary(redrive_epoch) or {}

        # markers LAST: each names the redrive epoch for lineage, but the
        # protocol only relies on existence (a torn write still marks)
        for d in dirs:
            marker = os.path.join(d, "_REDRIVEN")
            if not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write(str(redrive_epoch))
        # lineage metrics exactly once per redrive epoch, durable across
        # the commit→marker crash window: a resume (skipped, origin ours)
        # reads the applied-event count from the commit summary instead
        # of its own empty run, and the existence check keeps a second
        # resume from overwriting the record with zeros
        m = self.ckpt.metrics()
        recorded = bool(
            len(m)
            and not m[
                (m["epoch"] == redrive_epoch) & (m["stage"] == "redrive")
            ].empty
        )
        events_val = (
            float(summary.get("applied_events") or 0)
            if stats.skipped
            else float(stats.events_seen)
        )
        if not recorded:
            self.ckpt.append_metrics(
                [
                    {
                        "epoch": redrive_epoch,
                        "stage": "redrive",
                        "metric": "redrive_source_epochs",
                        "value": float(len(epochs)),
                    },
                    {
                        "epoch": redrive_epoch,
                        "stage": "redrive",
                        "metric": "redriven_events",
                        "value": events_val,
                    },
                ]
            )
        if stats.skipped and stats.events_seen != int(events_val):
            # crash-resume / converging-sibling skip: apply_epoch saw no
            # events itself, but the committed epoch DID apply them —
            # report that count, not 0, so a CLI/API consumer auditing
            # the resume sees what the redrive actually re-admitted
            stats = dc_replace(stats, events_seen=int(events_val))
        return stats

    def read_changes(
        self, from_epoch: int | None, to_epoch: int | None = None
    ) -> DataFrame | None:
        """Change-data-feed: row-level changes between two points on the
        epoch line (Delta Lake CDF / Iceberg incremental-read semantics).
        Returns the live-state diff from the table as of ``from_epoch`` to
        the table as of ``to_epoch`` (default: current HEAD), one row per
        change with ``_change_type`` ∈ {insert, delete, update_preimage,
        update_postimage} — updates emit BOTH images, so a downstream
        consumer can maintain any aggregate incrementally.

        Scale design: both endpoint states are served from the retained
        manifest history (no replay), and BOTH reads are pruned to the
        buckets actually touched by the epoch commits in the range
        (``LakeTable.buckets_changed_between`` — manifest-only). For a
        small epoch range over a 100-TB table the diff therefore reads a
        few buckets, not the lake; the full-outer join runs key-bucketed
        on both sides. The classification is a single plan — one join, no
        branch recomputation (changed keys explode into their 1–2 CDF
        rows; unchanged keys explode into zero).

        ``from_epoch=None`` (or a from-point before the first commit)
        diffs against the empty table — every live row is an insert.

        Group commits coarsen the epoch line: a ``from_epoch``/
        ``to_epoch`` INSIDE a grouped range has no snapshot of its own,
        so ``to_epoch`` resolves to None (no feed) and ``from_epoch``
        falls back to the previous resolvable point — the diff is then
        a correct superset of the requested changes, never a partial
        one. Consumers that need exact per-epoch feeds should read from
        tables replayed with ``group_size=1`` (the default), or align
        their from/to points to group boundaries."""
        cur = self.lake.current_version()
        if cur is None:
            return None
        v2 = cur if to_epoch is None else self.lake.version_asof_epoch(to_epoch)
        if v2 is None:
            return None
        v1 = None if from_epoch is None else self.lake.version_asof_epoch(from_epoch)
        snap2 = self.lake.snapshot(v2)
        buckets = self.lake.buckets_changed_between(v1, v2)

        def _live(version: int | None) -> DataFrame | None:
            if version is None:
                return None
            st = self.lake.read(self.spark, buckets=buckets, version=version)
            if st is None:
                return None
            return st.where(~F.col("deleted")).drop("deleted")

        new = _live(v2)
        if new is None:
            return None
        old = _live(v1)
        target = new.schema
        if old is None:
            old = self.spark.createDataFrame([], target)
        elif old.schema != target:
            old = conform(old, target)  # schema evolution in range: upcast

        key = (snap2.table_props or {}).get("key_col", self.key_col)
        vals = [c for c in new.columns if c != key]
        old_s = old.select(F.col(key), F.struct(*vals).alias("_old"))
        new_s = new.select(F.col(key), F.struct(*vals).alias("_new"))
        j = old_s.join(new_s, on=key, how="full_outer")
        o, n = F.col("_old"), F.col("_new")

        def _row(src, ctype: str):
            return F.struct(src.alias("vals"), F.lit(ctype).alias("ct"))

        rows = (
            F.when(o.isNull() & n.isNotNull(), F.array(_row(n, "insert")))
            .when(n.isNull() & o.isNotNull(), F.array(_row(o, "delete")))
            .when(
                o.isNotNull() & n.isNotNull() & ~o.eqNullSafe(n),
                F.array(_row(o, "update_preimage"), _row(n, "update_postimage")),
            )
            # unchanged key: explode(NULL) emits no rows
        )
        ex = j.select(F.col(key), F.explode(rows).alias("_r"))
        return ex.select(
            key, *[F.col(f"_r.vals.{c}").alias(c) for c in vals],
            F.col("_r.ct").alias("_change_type"),
        )
