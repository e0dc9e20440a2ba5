"""Ingest-time content-novelty filter: drop documents whose TEXT was seen
in any earlier epoch (or earlier in this epoch), before they ever land in
the lake.

The classic corpus-dedup crossover for CDC ingest: crawls re-discover the
same page under new URLs and re-deliver unchanged pages as updates; a
training-data lake wants each distinct content exactly once. Filtering at
read time would re-pay the dedup on every consumer — filtering at ingest
pays it once, on the epoch, never on the table.

Scale design (the part that matters at 100 TB):

* **Fingerprint index, partitioned by fingerprint bucket**: admitted
  fingerprints append to ``_novelty/index/epoch=E/_fpb=B/`` — two 8-byte
  columns, epoch-idempotent (overwrite), bucket-partitioned so the exact
  check can prune. The index is O(distinct admitted docs), not O(events).
* **Bloom pre-pass**: one bloom per fingerprint bucket (default 16 ×
  1 MiB bits = 2 MiB total), broadcast to executors; a vectorized Arrow
  UDF tests the epoch's candidates. Bloom MISSES — the overwhelming
  majority of novel traffic — are admitted with NO join at all; only
  bloom hits (true dups + the false-positive rate) do the exact
  anti-join against the index. The join carries (hits + index rows), a
  sliver of either table, and joins on (_fpb, _fp) so the partition
  column is in the join key (dynamic partition pruning eligible).
* **Bounded driver traffic**: bloom updates never collect fingerprints.
  Each epoch's admitted rows fold into per-bucket bitmaps DISTRIBUTEDLY
  (``applyInPandas`` emits one (bucket, bitmap) row per bucket — size
  bounded by the bloom, not the epoch) and the driver ORs them into the
  stored blooms.

Crash-safety contract (shares the lake's idempotent-epoch discipline):

* Bloom bits are a SUPERSET cache: extra bits (from a crashed/rejected
  attempt) only cause extra exact checks, never false drops. Blooms are
  rebuildable from the index (``rebuild_blooms``). Updates are CAS-folds
  (read → OR → put-if-match → retry) tagged with the max epoch folded
  in, so concurrent writers union instead of clobbering, and an admit
  only TRUSTS a bloom whose tag covers its committed epochs — a stale or
  missing bloom degrades to the exact index check, never a blind admit.
* The admission mode (exact vs minhash) and its shape parameters are
  pinned in the store on first use; reopening a table with a different
  mode raises instead of mixing incompatible index schemas.
* Index partitions are only TRUSTED for epochs the LAKE committed: the
  exact check filters ``epoch ∈ lake-committed epochs``, so a crash
  between index write and table commit cannot make a later epoch drop
  content the table never received. Replays overwrite their epoch's
  index partition with identical (deterministic) content.

Admission semantics (mirrored exactly by the ``cdc_novel_state`` DuckDB
oracle): over each epoch's LWW winners, an upsert is admitted iff its
text fingerprint's globally FIRST occurrence — ordered by (epoch,
*order_cols, key) — is this row. Deletes always pass through: novelty
gates content, not tombstones. A re-upsert of identical text is dropped
even if the original URL was deleted since ("seen-ever" semantics — the
index is append-only).
"""

# NOTE: no `from __future__ import annotations` here — it stringifies the
# pandas_udf type hints, which pyspark's hint parser cannot resolve
# ("Unsupported signature: (fp: 'pd.Series', ...)"). Python 3.9+ builtin
# generics work at runtime without it.
import base64
import os
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_migration_validation_spark.plans.commit_store import (
    CommitStore,
    PosixCommitStore,
)

FP_COL = "_fp"
FPB_COL = "_fpb"

# splitmix64 finalizer constants — k probe positions per fingerprint are
# (h1 + i*h2) mod bits, the standard double-hashing bloom construction
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    h = x.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= _C1
    h ^= h >> np.uint64(27)
    h *= _C2
    h ^= h >> np.uint64(31)
    return h


def _positions(fps: np.ndarray, bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions for each fingerprint."""
    h1 = _mix(fps)
    h2 = _mix(fps + np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    return np.stack(
        [(h1 + np.uint64(i) * h2) % np.uint64(bits) for i in range(k)]
    )


def _test_bits(bitmap: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """All-k-bits-set membership over a packed uint8 bitmap."""
    hit = np.ones(pos.shape[1], dtype=bool)
    for i in range(pos.shape[0]):
        p = pos[i]
        hit &= (bitmap[(p >> np.uint64(3)).astype(np.int64)]
                & (np.uint8(1) << (p & np.uint64(7)).astype(np.uint8))) != 0
    return hit


def _set_bits(bitmap: np.ndarray, pos: np.ndarray) -> None:
    for i in range(pos.shape[0]):
        p = pos[i]
        np.bitwise_or.at(
            bitmap,
            (p >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (p & np.uint64(7)).astype(np.uint8)),
        )


def _obs_metric(obs, key: str, default: int) -> int:
    """Read an Observation metric, treating an ELIDED observed node as
    ``default``. AQE's empty-relation propagation removes a subtree whose
    shuffle produced zero rows — taking any CollectMetrics in it along —
    and the Observation then completes with an empty row that pyspark's
    ``get`` cannot convert (Py4JJavaError from toPyRow). For the plans
    here, elision ⇔ the subtree was empty, so the caller supplies what
    the metric would have been over zero rows."""
    from py4j.protocol import Py4JJavaError

    try:
        v = obs.get[key]
    except Py4JJavaError:
        return int(default)
    return int(default) if v is None else int(v)


@dataclass
class NoveltyStats:
    candidates: int  # upsert winners after in-epoch content dedup
    admitted: int
    dropped: int  # candidates − admitted (content seen in earlier epochs)
    # near-dup mode only: in-epoch band buckets over max_bucket that were
    # collapsed to first-seen instead of pairwise-scanned (0 = none/off)
    overflow_buckets: int = 0


class NoveltyFilter:
    """Per-table novelty state: fingerprint index + per-bucket blooms.

    ``store`` carries the bloom bytes (base64) — the same conditional-
    write seam as the lake's manifests, so an object-store deployment
    swaps one implementation. The index is plain Spark parquet.
    """

    def __init__(
        self,
        root: str,
        n_buckets: int = 16,
        bloom_bits: int = 1 << 20,  # 128 KiB per bucket
        bloom_k: int = 4,
        store: CommitStore | None = None,
    ):
        """Size ``bloom_bits`` at ~10 bits per expected distinct document
        PER BUCKET for a ~1% false-positive rate (false positives only
        cost exact-check traffic). The default (16 buckets × 2^20 bits)
        carries ~1.7M docs; a billion-doc table wants ~2^30 total bits
        spread over more buckets. Every per-epoch cost below (store read,
        broadcast, bitmap collect) is proportional to TOTAL BLOOM BYTES,
        not to data — oversizing the bloom taxes every epoch, which is
        why the default is modest and the knob is per-table."""
        self.root = root
        self.index_dir = os.path.join(root, "index")
        self.compact_dir = os.path.join(root, "index_compact")
        self.n_buckets = n_buckets
        self.bloom_bits = bloom_bits
        self.bloom_k = bloom_k
        self.store = store or PosixCommitStore(os.path.join(root, "blooms"))
        # driver-side cache: one store read per bucket per PROCESS, not
        # per epoch. Safe under concurrent writers because every entry
        # carries its HEAD tag (max epoch folded in): a bloom is only
        # TRUSTED for an admit when its head covers the caller's committed
        # epochs, and an uncovered bloom degrades to the exact check —
        # never to a blind admit (see _blooms_for).
        self._bloom_cache: dict[int, tuple[np.ndarray, int]] | None = None
        # the exact committed-epoch SET the cache is known to cover —
        # either read from the store while those epochs were committed,
        # or folded by this process itself (_update_blooms). Tracked as a
        # set, NOT a high-water mark: another writer can fold a GAP epoch
        # below an unchanged max(committed), and a watermark gate would
        # keep trusting a cache missing that epoch's bits (a bloom MISS
        # admits blindly — silent re-admit of committed content).
        self._bloom_refreshed_for: set[int] = set()

    # -- bloom persistence ----------------------------------------------------
    #
    # Stored format: "<head>:<base64 bits>". head = max epoch whose
    # admitted fingerprints have been folded into the bits (-1 = unknown/
    # legacy → never trusted). Folds go through a CAS loop (read → OR →
    # put-if-match → retry), so two concurrent writers can never erase
    # each other's committed bits — the failure mode of a plain
    # last-writer-wins overwrite, where a bloom MISS would then silently
    # re-admit already-ingested content.

    @staticmethod
    def _decode(raw: str) -> tuple[np.ndarray, int]:
        head_s, _, b64 = raw.strip().partition(":")
        if not b64:  # legacy bare-b64 object: bits usable, coverage unknown
            head_s, b64 = "-1", head_s
        return (
            np.frombuffer(base64.b64decode(b64), dtype=np.uint8).copy(),
            int(head_s),
        )

    @staticmethod
    def _encode(bitmap: np.ndarray, head: int) -> str:
        return f"{int(head)}:" + base64.b64encode(bitmap.tobytes()).decode()

    def _load_blooms(self, refresh: bool = False) -> dict[int, np.ndarray]:
        if self._bloom_cache is None or refresh:
            cache: dict[int, tuple[np.ndarray, int]] = {}
            for b in range(self.n_buckets):
                raw = self.store.read(f"fpb{b}")
                if raw is not None:
                    cache[b] = self._decode(raw)
            self._bloom_cache = cache
        return {b: bm for b, (bm, _head) in self._bloom_cache.items()}

    def _blooms_for(self, committed_epochs: set[int]) -> dict[int, np.ndarray]:
        """Blooms TRUSTABLE against ``committed_epochs``: head must cover
        the committed high-water mark and the bitmap must match this
        filter's geometry. A stale cache triggers ONE store refresh (the
        other-writer-advanced-the-table case); buckets still uncovered
        after that are omitted, which routes their members to the exact
        index check (an absent bloom defaults to HIT in the pre-pass)."""
        nbytes = self.bloom_bits // 8
        need = max(committed_epochs) if committed_epochs else None

        def usable(bm: np.ndarray, head: int) -> bool:
            return len(bm) == nbytes and (need is None or head >= need)

        # refresh whenever the committed SET gained an epoch this cache
        # has not covered — not merely when max(committed) advanced. A
        # head only records the MAX epoch some writer folded, never
        # interior coverage: in a gap replay ANOTHER process can fold
        # epoch 3 into the store while max(committed) stays 5, and a
        # watermark-gated cache (head=5 ≥ need=5, no refresh) would then
        # lack epoch 3's bits and silently re-admit its content on a
        # bloom MISS. The store copy itself is always a superset of every
        # committed epoch's bits (folds are CAS-unions and run before the
        # epoch's lake commit), so cache==store-at-committed-set is
        # sufficient; _update_blooms marks this process's own folds as
        # covered, keeping the single-writer path refresh-free.
        if self._bloom_cache is None:
            self._load_blooms()
            self._bloom_refreshed_for |= committed_epochs
        elif committed_epochs - self._bloom_refreshed_for:
            self._load_blooms(refresh=True)
            self._bloom_refreshed_for |= committed_epochs
        assert self._bloom_cache is not None
        return {
            b: bm
            for b, (bm, head) in self._bloom_cache.items()
            if usable(bm, head)
        }

    def _save_bloom(
        self, b: int, add: np.ndarray, epoch: int, rebuild_head: int | None = None
    ) -> None:
        """CAS-fold ``add`` into bucket ``b``'s stored bloom. Retries on a
        lost race with the freshly-read content, so concurrent folds
        union rather than clobber — bits are only ever ADDED, which keeps
        the store a superset of every committed epoch's fingerprints
        (extra bits cost an exact check, missing bits would cost a silent
        re-admit). A stored bitmap of a DIFFERENT geometry (resized
        filter) is replaced: a normal fold can only vouch for its own
        epoch's bits, so it tags head=-1 (untrusted until
        ``rebuild_blooms``); a rebuild's bits ARE the full committed
        index, so ``rebuild_head`` stands."""
        name = f"fpb{b}"
        nbytes = self.bloom_bits // 8
        claim = int(epoch) if rebuild_head is None else int(rebuild_head)
        for _ in range(64):
            raw = self.store.read(name)
            if raw is None:
                merged, new_head = add, claim
            else:
                cur, head = self._decode(raw)
                if len(cur) != nbytes:
                    merged = add
                    new_head = -1 if rebuild_head is None else claim
                else:
                    merged, new_head = cur | add, max(head, claim)
            expected = raw.strip() if raw is not None else None
            if self.store.cas(name, expected, self._encode(merged, new_head)):
                if self._bloom_cache is None:
                    self._bloom_cache = {}
                self._bloom_cache[b] = (merged, new_head)
                return
        raise RuntimeError(
            f"novelty bloom {name}: CAS contention persisted after 64 attempts"
        )

    # -- mode pinning ----------------------------------------------------------

    def _ensure_mode(self, mode: str, **params: int) -> None:
        """Pin the index's admission mode + shape parameters on first use
        and refuse a mismatched reopen: the exact and minhash modes write
        INCOMPATIBLE index schemas into the same directory, and a silent
        mix either fails on missing columns or — worse — exact-checks
        text fingerprints against band-hash rows, re-admitting committed
        content."""
        import json

        desc = {
            "mode": mode,
            "n_buckets": int(self.n_buckets),
            **{k: int(v) for k, v in params.items()},
        }
        content = json.dumps(desc, sort_keys=True)
        if getattr(self, "_mode_pinned", None) == content:
            return  # verified once per process; the pin never changes
        cur = self.store.read("_mode")
        if cur is None:
            self.store.write_exclusive("_mode", content)
            cur = self.store.read("_mode")
        if cur is not None and json.loads(cur) != desc:
            raise ValueError(
                f"novelty index at {self.root} was created with "
                f"{cur.strip()}; reopening it as {content} would mix "
                f"incompatible index schemas — use a fresh table or the "
                f"original parameters"
            )
        self._mode_pinned = content

    # -- admission --------------------------------------------------------------

    def admit(
        self,
        spark: SparkSession,
        winners: DataFrame,
        epoch: int,
        committed_epochs: set[int],
        text_col: str = "text",
        key_col: str = "url",
        order_cols: tuple[str, ...] = ("warc_ts", "seq"),
        deleted_col: str = "deleted",
    ) -> tuple[DataFrame, NoveltyStats]:
        """Filter an epoch's LWW winners down to novel content (+ all
        deletes), record the admitted fingerprints, and return the
        filtered winners. Runs two small jobs of its own (index append,
        bloom-partial collect); the returned plan is consumed by the
        caller's commit.

        ``winners`` is persisted here (released via :meth:`release`): the
        epoch plan upstream carries text extraction and the LWW shuffle,
        and admit + the caller's commit consume it several times — without
        the cache each action re-extracts the epoch (measured 7× epoch
        cost). The fingerprint is ``xxhash64`` (whole-stage codegen; a
        char-fold expression via interpreted HOFs was the dominant cost).
        Admission semantics are hash-agnostic — any injective-enough
        deterministic hash yields the same decisions, which is what the
        cdc_novel_state oracle checks by partitioning on the text itself."""
        self._ensure_mode("exact")
        self.release()  # previous epoch's cache, if the caller forgot
        winners = winners.persist()
        dels = winners.where(F.col(deleted_col))
        ups = (
            winners.where(~F.col(deleted_col))
            .withColumn(FP_COL, F.xxhash64(F.col(text_col)))
            .withColumn(
                FPB_COL, F.pmod(F.col(FP_COL), F.lit(self.n_buckets)).cast("int")
            )
        )
        from pyspark.sql import Observation

        # in-epoch first occurrence per content fingerprint — TAGGED, not
        # filtered, so the candidate count still sees in-epoch dups.
        # Counts ride the index-write action as Observations: at epoch
        # scale every extra Spark job is pure fixed latency, so admit()
        # schedules exactly TWO of its own (index write, bitmap fold).
        w = Window.partitionBy(FP_COL).orderBy(
            *[F.col(c).asc() for c in order_cols], F.col(key_col).asc()
        )
        obs_cand, obs_adm = Observation(), Observation()
        tagged = ups.withColumn("_rn", F.row_number().over(w)).persist()
        firsts = (
            tagged.observe(obs_cand, F.count(F.lit(1)).alias("n"))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

        blooms = self._blooms_for(committed_epochs)
        idx = self._read_index(spark, committed_epochs, epoch=epoch)
        extra_cached = []
        if idx is None:
            # no committed history → everything surviving the in-epoch
            # dedup is novel
            novel = firsts
        elif blooms:
            maybe = self._bloom_hit_udf(spark, blooms)
            flagged = firsts.withColumn("_maybe", maybe(FP_COL, FPB_COL))
            miss = flagged.where(~F.col("_maybe")).drop("_maybe")
            hits = flagged.where(F.col("_maybe")).drop("_maybe")
            # join on (_fpb, _fp): the partition column rides the join
            # key, so the scan of the (big) index side is DPP-eligible
            hits = hits.join(idx, [FPB_COL, FP_COL], "left_anti")
            novel = miss.unionByName(hits).persist()
            extra_cached = [novel]
        else:
            # bloom storage lost/absent but history exists: degrade to the
            # exact check on EVERYTHING — never to admitting blindly
            novel = firsts.join(idx, [FPB_COL, FP_COL], "left_anti").persist()
            extra_cached = [novel]

        novel = novel.observe(obs_adm, F.count(F.lit(1)).alias("n"))
        # 1. index append (epoch-idempotent overwrite; trusted only once
        #    the lake commits this epoch) — also collects both counts
        (
            novel.select(FP_COL, FPB_COL)
            .write.mode("overwrite")
            .partitionBy(FPB_COL)
            .parquet(os.path.join(self.index_dir, f"epoch={epoch}"))
        )
        # 2. bloom update: distributed per-bucket bitmap partials, driver
        #    CAS-folds fixed-size bitmaps into the store (never row data)
        self._update_blooms(novel, epoch)

        # elision-safe reads (same guard as admit_neardup): AQE's empty-
        # relation propagation can remove a zero-row subtree together
        # with its CollectMetrics node, and a raw ``obs.get`` then fails.
        # Elision ⇔ the subtree was empty ⇔ both counts are 0.
        n_cand = _obs_metric(obs_cand, "n", default=0)  # winners incl. in-epoch dups
        n_admitted = _obs_metric(obs_adm, "n", default=0)
        admitted = novel.drop(FP_COL, FPB_COL)
        # the returned plan references the persisted frames; the engine
        # calls release() once its commit has consumed them
        self._held = [winners, tagged] + extra_cached
        return dels.unionByName(admitted), NoveltyStats(
            candidates=n_cand, admitted=n_admitted, dropped=n_cand - n_admitted
        )

    def release(self) -> None:
        """Unpersist the previous admit()'s cached plans (call after the
        epoch's commit) — keeps a long replay's executor storage flat."""
        for df in getattr(self, "_held", None) or []:
            df.unpersist()
        self._held = []

    # -- internals --------------------------------------------------------------

    def _index_has_data(self) -> bool:
        """Any parquet file at index/epoch=*/_fpb=*/ — guards against an
        all-deletes first epoch, whose index write leaves only _SUCCESS
        (an empty-dir read cannot infer a schema). Routed through the
        driver data-FS seam like the lake's own listings."""
        from data_migration_validation_spark.fsio import LOCAL

        for edir in LOCAL.list_dirs(self.index_dir):
            for bdir in LOCAL.list_dirs(edir):
                if any(f.endswith(".parquet") for f in LOCAL.list_files(bdir)):
                    return True
        return False

    def _read_index(
        self,
        spark: SparkSession,
        committed_epochs: set[int],
        epoch: int | None = None,
    ) -> DataFrame | None:
        return self._trusted_index(
            spark, committed_epochs, [FPB_COL, FP_COL], epoch=epoch
        )

    @staticmethod
    def _dir_has_parquet(d: str) -> bool:
        from data_migration_validation_spark.fsio import LOCAL

        for bdir in LOCAL.list_dirs(d):
            if any(f.endswith(".parquet") for f in LOCAL.list_files(bdir)):
                return True
        return False

    def _epoch_dirs_on_disk(self) -> set[int]:
        from data_migration_validation_spark.fsio import LOCAL

        out = set()
        for edir in LOCAL.list_dirs(self.index_dir):
            name = os.path.basename(edir)
            if name.startswith("epoch="):
                try:
                    out.add(int(name.split("=", 1)[1]))
                except ValueError:
                    pass
        return out

    def _compact_state(self) -> dict | None:
        import json

        raw = self.store.read("_compact")
        return json.loads(raw) if raw else None

    def _trusted_index(
        self,
        spark: SparkSession,
        committed_epochs: set[int],
        cols: list[str],
        epoch: int | None = None,
    ) -> DataFrame | None:
        """Rows trusted against ``committed_epochs``: the compacted
        generation plus per-epoch partitions for the committed remainder.
        Orphan partitions from crashed/rejected attempts are invisible by
        construction (the epoch IN-list). Duplicate rows between
        generations would be harmless (admission is an anti-/semi-join),
        but the fold vacuums what it covers anyway.

        The generation is used only when every epoch it folded is in the
        caller's committed set — an admit must never see LATER epochs'
        fingerprints — with one deliberate exception: the admitting
        ``epoch`` itself may appear in the fold. Everything folded is
        lake-committed (compact_index's precondition), so a generation
        containing the caller's own epoch means ANOTHER replayer already
        committed it after this caller's idempotency check; this caller's
        publish will hit the commit conflict and skip, so its admission
        decisions never land and the divergence is immaterial. Without
        the exception that narrow race would raise below (the folded
        per-epoch partitions are gone) and wedge the lagging replayer."""
        if not committed_epochs:
            return None
        parts: list[DataFrame] = []
        remaining = {int(e) for e in committed_epochs}
        visible = remaining | ({int(epoch)} if epoch is not None else set())
        cur = self._compact_state()
        if cur is not None and set(cur["epochs"]) <= visible:
            gen = os.path.join(
                self.compact_dir, cur.get("gen", f"h{cur['head']}")
            )
            if self._dir_has_parquet(gen):
                parts.append(spark.read.parquet(gen).select(*cols))
            remaining -= set(cur["epochs"])
        if remaining:
            missing = remaining - self._epoch_dirs_on_disk()
            if missing and cur is not None and missing & set(cur["epochs"]):
                # these epochs WERE indexed and their partitions were
                # folded into a generation this admit cannot use (it
                # contains later epochs) — reading on would silently drop
                # committed history
                raise RuntimeError(
                    f"novelty index at {self.root}: committed epochs "
                    f"{sorted(missing)} have neither a per-epoch partition "
                    f"nor compacted coverage usable for this admit — an "
                    f"admit below the compaction head after its source "
                    f"partitions were folded away is not supported"
                )
            # epochs never indexed at all: the filter was enabled on a
            # table with pre-existing committed epochs (no fold has ever
            # mentioned them). Their fingerprints were never computed, so
            # the only possible semantics is the bootstrap one — their
            # content is unknown history and re-admits; raising here
            # would wedge ingest forever (those partitions will never
            # appear). Exclude them and read what exists.
            remaining -= missing
            if self._index_has_data():
                parts.append(
                    spark.read.parquet(self.index_dir)
                    .where(F.col("epoch").isin(sorted(remaining)))
                    .select(*cols)
                )
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def compact_index(
        self, spark: SparkSession, committed_epochs: set[int]
    ) -> int:
        """Fold committed per-epoch index partitions into ONE compacted
        generation per bucket — the per-epoch ``epoch=E/_fpb=B`` layout
        otherwise grows a directory per epoch forever, and a long replay
        reads O(epochs × buckets) files per admit; after the fold the
        exact check plans O(buckets).

        Only the CONTIGUOUS committed run (from the lowest epoch ever
        seen) folds: any later admit's strictly-earlier committed set
        then always covers the folded epochs, so the trusted-epoch
        contract survives — an admit for epoch N > head sees exactly the
        history it would have read from the per-epoch partitions. The
        new generation is written first, the pointer CAS-flips, and the
        directories it makes redundant (the folded per-epoch partitions
        and the previous generation) are NOT removed yet: they are
        recorded in the pointer's ``reclaim`` list and deleted by the
        NEXT maintenance pass. An admit that planned its read against the
        previous pointer can therefore finish its Spark job against
        intact files — immediate removal would FileNotFound a concurrent
        reader mid-job. The grace window is one maintenance cadence;
        until then the duplicates are harmless (admission is an anti-/
        semi-join). Returns the total number of folded epochs.

        Concurrency: each fold attempt writes a UNIQUELY-NAMED generation
        directory (recorded in the pointer), and the pointer CAS compares
        against the exact raw content the fold was planned from — a
        concurrent fold therefore always loses the CAS (never regresses
        the pointer to a stale plan) and a CAS loser can only ever delete
        its OWN directory, never the winner's live generation. A crash
        between the generation write and the CAS leaves an unreferenced
        directory under ``index_compact/`` — a bounded storage leak, kept
        rather than risk a sweep racing an in-flight fold's pointer flip.

        If an epoch BELOW the previously folded run arrives later (out-of-
        order replay) and a gap still separates it from that run, the fold
        is skipped rather than shrinking pointer coverage to the new lower
        contiguous run: the previously folded epochs' per-epoch partitions
        are already reclaimed, so regressing the pointer would orphan
        their only remaining coverage. The low epochs stay per-epoch until
        the gap fills, after which one fold covers everything."""
        import json
        import shutil
        import uuid

        if not committed_epochs:
            return 0
        raw0 = self.store.read("_compact")
        cur = json.loads(raw0) if raw0 else None
        # reclaim what the PREVIOUS flip made redundant: one maintenance
        # cadence has passed, so readers that planned against the pointer
        # before that flip have drained. Deleting up front (not after our
        # own CAS) keeps the cleanup crash-safe and idempotent — a lost
        # race or an early return changes nothing, the pointer's reclaim
        # list and folded-epoch sweep simply run again next pass. The
        # per-epoch sweep covers EVERY epoch the live generation folds,
        # which also collects partitions a lagging replayer re-created
        # below the fold head after the flip.
        if cur is not None:
            for rel in cur.get("reclaim") or []:
                shutil.rmtree(os.path.join(self.root, rel), ignore_errors=True)
            for fe in cur["epochs"]:
                shutil.rmtree(
                    os.path.join(self.index_dir, f"epoch={fe}"),
                    ignore_errors=True,
                )
        folded_prev: set[int] = set(cur["epochs"]) if cur else set()
        allc = {int(e) for e in committed_epochs} | folded_prev
        lo = min(allc)
        run: list[int] = []
        e = lo
        while e in allc:
            run.append(e)
            e += 1
        new_folded = set(run)
        if new_folded <= folded_prev or not folded_prev <= new_folded:
            return len(folded_prev)
        head = max(run)
        gen_name = f"h{head}-{uuid.uuid4().hex[:8]}"
        gen = os.path.join(self.compact_dir, gen_name)

        parts: list[DataFrame] = []
        old_gen: str | None = None
        if cur is not None:
            old_gen = os.path.join(
                self.compact_dir, cur.get("gen", f"h{cur['head']}")
            )
            if self._dir_has_parquet(old_gen):
                parts.append(spark.read.parquet(old_gen))
        fresh = sorted(new_folded - folded_prev)
        if self._index_has_data():
            parts.append(
                spark.read.parquet(self.index_dir)
                .where(F.col("epoch").isin(fresh))
                .drop("epoch")
            )
        if parts:
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            (
                out.write.mode("overwrite")
                .partitionBy(FPB_COL)
                .parquet(gen)
            )
        # what THIS flip makes redundant — deleted by the next pass, not
        # now (a concurrent admit may still be scanning these files).
        # Folded per-epoch partitions are swept from the pointer's epochs
        # list, so only the superseded generation needs recording here.
        reclaim = []
        if cur is not None:
            reclaim.append(
                os.path.join(
                    "index_compact", cur.get("gen", f"h{cur['head']}")
                )
            )
        content = json.dumps(
            {
                "head": head,
                "epochs": sorted(new_folded),
                "gen": gen_name,
                "reclaim": reclaim,
            },
            sort_keys=True,
        )
        expected = raw0.strip() if raw0 is not None else None
        if not self.store.cas("_compact", expected, content):
            # another maintenance process folded concurrently; ours loses
            # and removes its own (uniquely named) generation only
            shutil.rmtree(gen, ignore_errors=True)
            new = self._compact_state()
            return len(new["epochs"]) if new else len(folded_prev)
        return len(new_folded)

    def _bloom_hit_udf(self, spark: SparkSession, blooms: dict[int, np.ndarray]):
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        bits, k = self.bloom_bits, self.bloom_k
        packed = {b: bm.tobytes() for b, bm in blooms.items()}
        bc = spark.sparkContext.broadcast(packed)

        @pandas_udf("boolean")
        def hit(fp: pd.Series, fpb: pd.Series) -> pd.Series:
            fps = fp.to_numpy(dtype=np.int64).astype(np.uint64)
            buckets = fpb.to_numpy(dtype=np.int64)
            # absent bloom defaults to HIT: a lost bloom file must force
            # the exact check, never skip it (false drops are impossible;
            # false admits would be)
            out = np.ones(len(fps), dtype=bool)
            maps = bc.value
            for b in np.unique(buckets):
                raw = maps.get(int(b))
                if raw is None:
                    continue
                mask = buckets == b
                pos = _positions(fps[mask], bits, k)
                out[mask] = _test_bits(np.frombuffer(raw, dtype=np.uint8), pos)
            return pd.Series(out)

        return hit

    def _update_blooms(
        self, novel: DataFrame, epoch: int, rebuild_head: int | None = None
    ) -> None:
        """Fold ``novel``'s fingerprints into the stored blooms. Default:
        CAS-fold per bucket, head advanced to ``epoch``. With
        ``rebuild_head`` set (the recovery path): still a CAS-fold, but
        claiming that head — sound because the rebuild's bits are the
        full committed index, and unioning (never overwriting) means a
        concurrent fold's bits survive the race."""
        bits, k = self.bloom_bits, self.bloom_k
        nbytes = bits // 8

        def fold(pdf):
            import pandas as pd

            bm = np.zeros(nbytes, dtype=np.uint8)
            fps = pdf[FP_COL].to_numpy(dtype=np.int64).astype(np.uint64)
            _set_bits(bm, _positions(fps, bits, k))
            return pd.DataFrame(
                {"b": [int(pdf[FPB_COL].iloc[0])], "bm": [bm.tobytes()]}
            )

        partials = (
            novel.select(FP_COL, FPB_COL)
            .groupBy(FPB_COL)
            .applyInPandas(fold, "b int, bm binary")
            .collect()
        )
        for row in partials:
            b = row["b"]
            add = np.frombuffer(row["bm"], dtype=np.uint8)
            # rebuild included: still a CAS-UNION, never an overwrite — a
            # blind overwrite racing an in-flight fold would shed that
            # fold's bits, and under out-of-order replay the shed epoch
            # can sit BELOW max(committed), where the head>=need trust
            # check cannot see the hole. OR-ing keeps the superset
            # invariant; rebuild only differs in the head it may claim.
            self._save_bloom(b, add, epoch, rebuild_head=rebuild_head)
        # buckets with no admitted rows this epoch keep their stored bloom
        # (coherent w.r.t. this epoch trivially), and each touched
        # bucket's cache entry was CAS-merged with fresh store content —
        # so this process's cache now covers this epoch everywhere:
        self._bloom_refreshed_for.add(int(epoch))

    # -- near-duplicate admission (MinHash-banded) -----------------------------

    def admit_neardup(
        self,
        spark: SparkSession,
        winners: DataFrame,
        epoch: int,
        committed_epochs: set[int],
        text_col: str = "text",
        key_col: str = "url",
        order_cols: tuple[str, ...] = ("warc_ts", "seq"),
        deleted_col: str = "deleted",
        num_perm: int = 8,
        bands: int = 4,
        shingle_k: int = 3,
        sim_min_matches: int = 4,
        max_bucket: int | None = None,
    ) -> tuple[DataFrame, NoveltyStats]:
        """Near-duplicate novelty: drop an upsert winner iff any EARLIER
        seen winner (same epoch by (order_cols, key), or any committed
        epoch) shares an LSH band AND agrees on ≥ ``sim_min_matches`` of
        the ``num_perm`` MinHash signature positions (the standard
        signature-level Jaccard estimate; an integer threshold so the two
        engines can never diverge on a float compare).

        Semantics are "cluster-collapse to the first-seen member": the
        earlier row counts even if IT was dropped — the index records
        every seen winner, so a chain A≈B≈C (A admitted, B dropped)
        still drops C via B. This is the aggressive crawl-dedup shape,
        and crucially it needs NO transitive closure at admit time —
        one band join per epoch. Exact duplicates collapse first via the
        exact-fingerprint window (a by-product: band buckets stay small
        — a flood of identical pages is one band row, not a quadratic
        bucket).

        Scale shape mirrors the exact mode: blooms key on
        xxhash64(band_id, band_key) (misses skip the join entirely), the
        index is partitioned by band-hash bucket, and the join carries
        bloom hits × matching index partitions only. Storage is
        ``bands`` rows of (band key + num_perm longs) per seen winner.
        Candidate/admitted counts ride the index-write action as
        Observations (same as ``admit``) — no extra Spark jobs; at epoch
        scale each extra job is pure fixed latency.

        ``max_bucket`` bounds the in-epoch quadratic term: exact
        pre-dedup keeps IDENTICAL floods to one band row, but a flood of
        near-identical VARIANTS (same band keys, distinct fingerprints)
        swells a bucket and its O(m²) in-array similarity scan. A bucket
        over the cap skips the pairwise scan and collapses to its
        first-seen member — for a single-band-key variant flood that is
        the cluster-collapse semantics anyway, just without per-pair
        confirmation. Overflowed buckets are counted in
        ``NoveltyStats.overflow_buckets``. Default None = exact
        semantics (what the cdc_novel_neardup_state oracle checks).
        """
        from data_migration_validation_spark.functions.hashing import (
            minhash_signature,
            shingle_hashes,
        )
        from data_migration_validation_spark.functions.text import tokens

        self._ensure_mode(
            "minhash", num_perm=num_perm, bands=bands, shingle_k=shingle_k
        )
        self.release()
        winners = winners.persist()
        dels = winners.where(F.col(deleted_col))
        ups = winners.where(~F.col(deleted_col))

        from pyspark.sql import Observation

        # exact in-epoch pre-dedup (first occurrence wins); the candidate
        # count (incl. in-epoch dups) rides the index write below
        w = Window.partitionBy(F.xxhash64(F.col(text_col))).orderBy(
            *[F.col(c).asc() for c in order_cols], F.col(key_col).asc()
        )
        obs_cand, obs_adm, obs_over = Observation(), Observation(), Observation()
        tagged = ups.withColumn("_rn", F.row_number().over(w)).persist()
        firsts = (
            tagged.observe(
                obs_cand,
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(F.col("_rn") == 1, 1)).alias("n_firsts"),
            )
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

        # signatures + band rows (hoisted projections: interpreted HOFs
        # get no common-subexpression elimination — same lesson as
        # operators/dedup.minhash_lsh_pairs)
        r = num_perm // bands
        hashed = firsts.select(
            key_col,
            *order_cols,
            shingle_hashes(tokens(F.col(text_col)), k=shingle_k).alias("_hashes"),
        )
        sigd = hashed.select(
            key_col, *order_cols, minhash_signature(F.col("_hashes"), num_perm).alias("_sig")
        )
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.concat_ws(
                        "-",
                        *[
                            F.element_at("_sig", b * r + j + 1).cast("string")
                            for j in range(r)
                        ],
                    ).alias("band_key"),
                )
                for b in range(bands)
            ]
        )
        band_rows = (
            sigd.select(key_col, *order_cols, "_sig", F.explode(band_structs).alias("_b"))
            .select(
                key_col,
                *order_cols,
                "_sig",
                F.col("_b.band_id").alias("band_id"),
                F.col("_b.band_key").alias("band_key"),
            )
            .withColumn(FP_COL, F.xxhash64(F.col("band_id"), F.col("band_key")))
            .withColumn(FPB_COL, F.pmod(F.col(FP_COL), F.lit(self.n_buckets)).cast("int"))
            .persist()
        )

        ord_struct = F.struct(*[F.col(c) for c in order_cols], F.col(key_col))
        sim_pred_sql = (
            f"size(filter(zip_with(e._sig, m._sig, (x, y) -> x = y), t -> t)) "
            f">= {int(sim_min_matches)}"
        )

        # in-epoch: per band bucket, a member is dropped if ANY bucket-mate
        # with a smaller order tuple is similar — in-array expansion, no
        # self-join (buckets are small post-exact-dedup)
        members = band_rows.groupBy("band_id", "band_key").agg(
            F.collect_list(
                F.struct(ord_struct.alias("_o"), F.col(key_col).alias("_k"), F.col("_sig").alias("_sig"))
            ).alias("_ms")
        )
        pairwise_drop = (
            "transform(filter(_ms, m -> exists(_ms, "
            f"e -> e._o < m._o AND {sim_pred_sql})), m -> m._k)"
        )
        if max_bucket is not None:
            # skew cap: an over-cap bucket (near-identical variant flood
            # sharing one band key) skips the O(m²) scan and collapses to
            # its first-seen member. Counted via the same index-write
            # action (members sits inside the dropped-keys lineage).
            members = members.observe(
                obs_over,
                F.sum((F.size("_ms") > int(max_bucket)).cast("long")).alias("n"),
            ).withColumn("_mino", F.expr("array_min(transform(_ms, m -> m._o))"))
            drop_expr = (
                f"CASE WHEN size(_ms) > {int(max_bucket)} "
                f"THEN transform(filter(_ms, m -> m._o > _mino), m -> m._k) "
                f"ELSE {pairwise_drop} END"
            )
        else:
            drop_expr = pairwise_drop
        in_epoch_dropped = (
            members.where(F.size("_ms") >= 2)
            .select(F.explode(F.expr(drop_expr)).alias(key_col))
            .distinct()
        )

        # cross-epoch: bloom pre-pass on the band hash, exact check joins
        # the committed index on (_fpb, band_id, band_key) + similarity
        blooms = self._blooms_for(committed_epochs)
        idx = self._read_index_neardup(spark, committed_epochs, epoch=epoch)
        cross_dropped = None
        if idx is not None:
            probe = band_rows
            if blooms:
                maybe = self._bloom_hit_udf(spark, blooms)
                probe = probe.withColumn("_maybe", maybe(FP_COL, FPB_COL)).where(
                    F.col("_maybe")
                )
            m = probe.alias("m")
            e = idx.alias("e")
            cross_dropped = (
                m.join(e, [FPB_COL, "band_id", "band_key"])
                .where(F.expr(sim_pred_sql))
                .select(F.col(f"m.{key_col}").alias(key_col))
                .distinct()
            )

        dropped = in_epoch_dropped
        if cross_dropped is not None:
            dropped = dropped.unionByName(cross_dropped).distinct()
        admitted = firsts.join(dropped, key_col, "left_anti")

        # record: index rows for ALL seen winners (post-exact-dedup),
        # then bloom bits — same trust/crash contract as exact mode.
        # The write plan LEFT-joins the dropped keys purely so the
        # admitted count (and the candidate count up the tagged lineage,
        # plus the overflow count inside dropped) ride this one action as
        # Observations — the marker column is projected away before the
        # rows land, so the stored index is unchanged. band_id == 0
        # filters the count to one band row per key.
        marked = band_rows.join(
            dropped.withColumn("_dropped", F.lit(True)), key_col, "left"
        )
        (
            marked.observe(
                obs_adm,
                F.count(
                    F.when(
                        (F.col("band_id") == 0) & F.col("_dropped").isNull(), 1
                    )
                ).alias("n"),
            )
            .select(FP_COL, FPB_COL, "band_id", "band_key", "_sig")
            .write.mode("overwrite")
            .partitionBy(FPB_COL)
            .parquet(os.path.join(self.index_dir, f"epoch={epoch}"))
        )
        self._update_blooms(band_rows, epoch)

        # An observation inside the dropped-keys subtree (obs_adm's join
        # marker, obs_over's bucket scan) is ELIDED when AQE's empty-
        # relation propagation removes that subtree — which happens
        # exactly when there were NO drops. So a missing metric is not an
        # error: it means empty, and the fallbacks below encode that
        # (admitted = all firsts, overflow = 0). Even obs_cand on the
        # written band_rows lineage is elided when the epoch has ZERO
        # upserts (all-deletes) — default 0 is exactly right there.
        n_cand = _obs_metric(obs_cand, "n", default=0)
        n_firsts = _obs_metric(obs_cand, "n_firsts", default=0)
        n_admitted = _obs_metric(obs_adm, "n", default=n_firsts)
        n_over = (
            _obs_metric(obs_over, "n", default=0) if max_bucket is not None else 0
        )
        self._held = [winners, tagged, band_rows]
        return dels.unionByName(admitted), NoveltyStats(
            candidates=n_cand,
            admitted=n_admitted,
            dropped=n_cand - n_admitted,
            overflow_buckets=n_over,
        )

    def _read_index_neardup(
        self,
        spark: SparkSession,
        committed_epochs: set[int],
        epoch: int | None = None,
    ) -> DataFrame | None:
        return self._trusted_index(
            spark,
            committed_epochs,
            [FPB_COL, "band_id", "band_key", "_sig"],
            epoch=epoch,
        )

    def vacuum_orphans(self, committed_epochs: set[int]) -> list[int]:
        """Delete index partitions for epochs the lake never committed and
        that sit BELOW the committed head — i.e. crashed or rejected
        attempts whose replay has already been superseded. Epochs at or
        above the head are left alone (one may belong to an apply in
        flight). Orphans are invisible to reads either way (the committed-
        epochs filter); this reclaims their storage."""
        import shutil

        from data_migration_validation_spark.fsio import LOCAL

        if not committed_epochs:
            return []
        head = max(committed_epochs)
        removed: list[int] = []
        for edir in LOCAL.list_dirs(self.index_dir):
            name = os.path.basename(edir)
            if not name.startswith("epoch="):
                continue
            try:
                e = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if e < head and e not in committed_epochs:
                shutil.rmtree(edir, ignore_errors=True)
                removed.append(e)
        return sorted(removed)

    def _pinned_mode(self) -> str | None:
        """The admission mode this index was created with (see
        ``_ensure_mode``), or None if it was never used."""
        import json

        raw = self.store.read("_mode")
        return json.loads(raw)["mode"] if raw else None

    def rebuild_blooms(self, spark: SparkSession, committed_epochs: set[int]) -> int:
        """Recompute every bloom from the committed index — the recovery
        path if bloom storage is lost, and the ONLY path that re-trusts
        blooms after a geometry resize (a normal fold can only vouch for
        its own epoch's bits, so it tags a replaced bitmap head=-1).
        Safe to skip: lost/untrusted blooms only mean the next epochs
        exact-check everything. Mode-aware: an exact index stores the
        content fingerprint directly; a minhash index stores band rows,
        whose bloom key is ``xxhash64(band_id, band_key)`` — the same
        expression admit_neardup folds."""
        if self._pinned_mode() == "minhash":
            idx = self._read_index_neardup(spark, committed_epochs)
            if idx is not None:
                idx = idx.withColumn(
                    FP_COL, F.xxhash64(F.col("band_id"), F.col("band_key"))
                )
        else:
            idx = self._read_index(spark, committed_epochs)
        if idx is None:
            return 0
        # overwrite mode: exactly the committed index's bits, with the
        # committed high-water mark as the coverage head
        self._update_blooms(
            idx,
            epoch=-1,
            rebuild_head=max(committed_epochs) if committed_epochs else -1,
        )
        return self.n_buckets
