"""Ingest-time content-novelty filter (plans/novelty.py): cross-epoch and
in-epoch dedup semantics, delete pass-through, crash-orphan invisibility,
and bloom-loss degradation (exact check, never blind admit)."""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_migration_validation_spark.plans.apply import CDCApplyEngine
from data_migration_validation_spark.plans.novelty import (
    _positions,
    _set_bits,
    _test_bits,
)

SCHEMA = (
    "op string, url string, warc_ts timestamp, seq long, "
    "payload struct<html:binary,lang:string>, batch_epoch int"
)


def _html(body: str) -> bytes:
    return f"<html><p>{body}</p></html>".encode()


def _ev(op, url, seq, body=None, epoch=0):
    payload = None if op == "D" else (_html(body), "en")
    return (op, url, datetime(2024, 1, 1, 0, 0, seq % 60, seq), seq, payload, epoch)


def _engine(spark, tmp_path, name="t", **kw):
    return CDCApplyEngine(
        spark,
        table_path=str(tmp_path / name),
        checkpoint_path=str(tmp_path / f"{name}-ckpt"),
        num_buckets=4,
        compact_every=None,
        novelty_filter=True,
        novelty_buckets=4,
        novelty_bloom_bits=1 << 12,
        **kw,
    )


def _urls(eng):
    return {r["url"] for r in eng.read_final().select("url").collect()}


def test_cross_epoch_content_dup_dropped(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    e0 = spark.createDataFrame(
        [_ev("I", "u/a", 1, "alpha text"), _ev("I", "u/b", 2, "beta text")], SCHEMA
    )
    st0 = eng.apply_epoch(e0, 0)
    assert st0.novelty_dropped == 0
    e1 = spark.createDataFrame(
        [_ev("I", "u/c", 10, "alpha text", 1),  # same content, new url → dup
         _ev("I", "u/d", 11, "delta text", 1)], SCHEMA
    )
    st1 = eng.apply_epoch(e1, 1)
    assert st1.novelty_dropped == 1
    assert _urls(eng) == {"u/a", "u/b", "u/d"}


def test_in_epoch_dup_keeps_first_by_order(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    ev = spark.createDataFrame(
        [_ev("I", "u/later", 20, "same words"), _ev("I", "u/early", 5, "same words")],
        SCHEMA,
    )
    st = eng.apply_epoch(ev, 0)
    assert st.novelty_dropped == 1
    assert _urls(eng) == {"u/early"}  # lowest (warc_ts, seq) wins admission


def test_same_url_unchanged_content_update_is_noop(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    eng.apply_epoch(spark.createDataFrame([_ev("I", "u/a", 1, "stable")], SCHEMA), 0)
    st = eng.apply_epoch(
        spark.createDataFrame([_ev("U", "u/a", 9, "stable", 1)], SCHEMA), 1
    )
    assert st.novelty_dropped == 1  # unchanged re-delivery suppressed
    row = eng.read_final().collect()[0]
    assert row["seq"] == 1  # original row retained


def test_delete_passes_through_and_content_stays_blocked(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    eng.apply_epoch(spark.createDataFrame([_ev("I", "u/a", 1, "ghost")], SCHEMA), 0)
    eng.apply_epoch(spark.createDataFrame([_ev("D", "u/a", 5, None, 1)], SCHEMA), 1)
    assert _urls(eng) == set()
    # seen-ever: the deleted content cannot re-enter under a new url
    st = eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/b", 9, "ghost", 2)], SCHEMA), 2
    )
    assert st.novelty_dropped == 1
    assert _urls(eng) == set()


def test_orphan_index_partition_is_invisible(spark, tmp_path):
    """A crashed attempt leaves index rows for an epoch the LAKE never
    committed — those rows must NOT block content, or a crash between
    index write and table commit silently loses data."""
    eng = _engine(spark, tmp_path)
    eng.apply_epoch(spark.createDataFrame([_ev("I", "u/a", 1, "first")], SCHEMA), 0)
    # fabricate the orphan: epoch 5 index rows fingerprinting the EXTRACTED
    # text "future text" (what admission compares), with NO lake commit
    # for epoch 5
    nov = eng.novelty
    (
        spark.createDataFrame([("future text",)], "t string")
        .select(F.xxhash64(F.col("t")).alias("_fp"))
        .withColumn("_fpb", F.pmod(F.col("_fp"), F.lit(nov.n_buckets)).cast("int"))
        .write.mode("overwrite")
        .partitionBy("_fpb")
        .parquet(f"{nov.index_dir}/epoch=5")
    )
    st = eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/y", 60, "future text", 1)], SCHEMA), 1
    )
    assert st.novelty_dropped == 0
    assert "u/y" in _urls(eng)


def test_bloom_loss_degrades_to_exact_check(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    eng.apply_epoch(spark.createDataFrame([_ev("I", "u/a", 1, "keepsake")], SCHEMA), 0)
    # lose every bloom file; drop the in-process cache too (a stale cache
    # is a SUPERSET of the store — safe — but this test emulates a fresh
    # process discovering the loss)
    for b in range(eng.novelty.n_buckets):
        try:
            eng.novelty.store.delete(f"fpb{b}")
        except Exception:
            pass
    eng.novelty._bloom_cache = None
    assert eng.novelty._load_blooms() == {}
    st = eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/b", 9, "keepsake", 1)], SCHEMA), 1
    )
    assert st.novelty_dropped == 1  # exact check caught it without blooms


def test_rebuild_blooms_from_index(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    eng.apply_epoch(spark.createDataFrame([_ev("I", "u/a", 1, "rebuildme")], SCHEMA), 0)
    for b in range(eng.novelty.n_buckets):
        try:
            eng.novelty.store.delete(f"fpb{b}")
        except Exception:
            pass
    eng.novelty._bloom_cache = None
    n = eng.novelty.rebuild_blooms(spark, set(eng.lake.epochs_applied()))
    assert n == eng.novelty.n_buckets
    assert eng.novelty._load_blooms() != {}


def test_replay_same_epoch_is_skipped(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    ev = spark.createDataFrame([_ev("I", "u/a", 1, "once")], SCHEMA)
    eng.apply_epoch(ev, 0)
    st = eng.apply_epoch(ev, 0)  # replayer double-run
    assert st.skipped
    assert _urls(eng) == {"u/a"}


def test_novelty_requires_mor(spark, tmp_path):
    with pytest.raises(ValueError, match="merge_mode"):
        CDCApplyEngine(
            spark,
            table_path=str(tmp_path / "x"),
            checkpoint_path=str(tmp_path / "xc"),
            merge_mode="cow",
            novelty_filter=True,
        )


def test_rejected_epoch_does_not_poison_the_index(spark, tmp_path):
    """Novelty records fingerprints BEFORE the write-audit-publish gate
    decides. If the audit rejects the epoch, those index rows are
    orphans of an uncommitted epoch — a clean retry (same epoch, fixed
    data) must still admit its content, not see it as 'already seen'."""
    from data_migration_validation_spark.operators.audit import page_envelope_audit

    eng = _engine(spark, tmp_path)
    audit = page_envelope_audit()
    bad = spark.createDataFrame(
        [("I", "not a url at all", datetime(2024, 1, 1), 1, (_html("poisoned body"), "en"), 0)],
        SCHEMA,
    )
    st = eng.apply_epoch(bad, 0, audit=audit)
    assert st.rejected
    assert eng.read_final() is None  # nothing ever published
    # retry epoch 0 with a VALID url carrying the same content — the
    # rejected attempt's index rows must be invisible
    good = spark.createDataFrame([_ev("I", "https://ok.example.com/1", 2, "poisoned body")], SCHEMA)
    st2 = eng.apply_epoch(good, 0, audit=audit)
    assert not st2.rejected and st2.novelty_dropped == 0
    assert _urls(eng) == {"https://ok.example.com/1"}


def test_vacuum_removes_only_superseded_orphans(spark, tmp_path):
    import os

    eng = _engine(spark, tmp_path)
    for e in range(3):
        eng.apply_epoch(
            spark.createDataFrame([_ev("I", f"u/{e}", e + 1, f"body {e}", e)], SCHEMA), e
        )
    nov = eng.novelty
    # orphan BELOW head (epoch 1 never committed here? it was — fake 1.5
    # is impossible; fabricate epoch dirs instead)
    os.makedirs(f"{nov.index_dir}/epoch=99", exist_ok=True)   # above head
    committed = set(eng.lake.epochs_applied())
    # fake an uncommitted epoch below head by pretending 1 wasn't committed
    removed = nov.vacuum_orphans(committed - {1})
    assert removed == [1]
    assert not os.path.isdir(f"{nov.index_dir}/epoch=1")
    assert os.path.isdir(f"{nov.index_dir}/epoch=99")  # in-flight: kept
    assert os.path.isdir(f"{nov.index_dir}/epoch=0")


def test_novelty_through_streaming_front_end(spark, tmp_path):
    """stream_apply drives apply_epoch per micro-batch, so the novelty
    filter must hold across triggers: a later file re-posting an earlier
    file's content under a new url never reaches the table."""
    import os

    from data_migration_validation_spark.streaming.microbatch import stream_apply

    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    batches = [
        [_ev("I", "u/a", 1, "stream alpha"), _ev("I", "u/b", 2, "stream beta")],
        [_ev("I", "u/c", 10, "stream alpha", 1), _ev("I", "u/d", 11, "stream gamma", 1)],
    ]
    schema = None
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, SCHEMA)
        schema = df.schema
        staging = str(tmp_path / f"staging-{i}")
        df.coalesce(1).write.parquet(staging)
        part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        os.rename(os.path.join(staging, part), f"{log_dir}/batch-{i}.parquet")

    eng = _engine(spark, tmp_path, name="stream-t")
    q = stream_apply(
        spark,
        log_dir,
        eng,
        schema=schema,
        checkpoint_location=str(tmp_path / "stream-ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    assert _urls(eng) == {"u/a", "u/b", "u/d"}  # u/c = content dup, dropped


# -- near-duplicate mode (MinHash-banded) --------------------------------------

BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
)
OTHER = (
    "zinc yarrow xenon walnut violet umber topaz slate ruby quartz pearl "
    "onyx nickel maroon lapis kohl jade ivory hazel garnet flint ebony"
)


def _engine_nd(spark, tmp_path, name="nd", **kw):
    return CDCApplyEngine(
        spark,
        table_path=str(tmp_path / name),
        checkpoint_path=str(tmp_path / f"{name}-ckpt"),
        num_buckets=4,
        compact_every=None,
        novelty_filter="minhash",
        novelty_buckets=4,
        novelty_bloom_bits=1 << 12,
        **kw,
    )


def test_neardup_drops_boilerplate_variant_across_epochs(spark, tmp_path):
    eng = _engine_nd(spark, tmp_path)
    st0 = eng.apply_epoch(spark.createDataFrame([_ev("I", "u/a", 1, BASE)], SCHEMA), 0)
    assert st0.novelty_dropped == 0
    e1 = spark.createDataFrame(
        [
            _ev("I", "u/b", 10, BASE + " footer", 1),  # near-dup: one added token
            _ev("I", "u/c", 11, OTHER, 1),             # genuinely different
        ],
        SCHEMA,
    )
    st1 = eng.apply_epoch(e1, 1)
    assert st1.novelty_dropped == 1
    assert _urls(eng) == {"u/a", "u/c"}


def test_neardup_also_drops_exact_dups(spark, tmp_path):
    eng = _engine_nd(spark, tmp_path)
    eng.apply_epoch(spark.createDataFrame([_ev("I", "u/a", 1, BASE)], SCHEMA), 0)
    st = eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/b", 9, BASE, 1)], SCHEMA), 1
    )
    assert st.novelty_dropped == 1
    assert _urls(eng) == {"u/a"}


def test_neardup_in_epoch_first_by_order_wins(spark, tmp_path):
    eng = _engine_nd(spark, tmp_path)
    st = eng.apply_epoch(
        spark.createDataFrame(
            [_ev("I", "u/later", 20, BASE + " tail"), _ev("I", "u/early", 5, BASE)],
            SCHEMA,
        ),
        0,
    )
    assert st.novelty_dropped == 1
    assert _urls(eng) == {"u/early"}


def test_neardup_deletes_pass_through(spark, tmp_path):
    eng = _engine_nd(spark, tmp_path)
    eng.apply_epoch(spark.createDataFrame([_ev("I", "u/a", 1, BASE)], SCHEMA), 0)
    eng.apply_epoch(spark.createDataFrame([_ev("D", "u/a", 5, None, 1)], SCHEMA), 1)
    assert _urls(eng) == set()
    # seen-ever applies to near-dups too
    st = eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/b", 9, BASE + " reborn", 2)], SCHEMA), 2
    )
    assert st.novelty_dropped == 1


def test_neardup_replay_idempotent(spark, tmp_path):
    eng = _engine_nd(spark, tmp_path)
    ev = spark.createDataFrame([_ev("I", "u/a", 1, BASE)], SCHEMA)
    eng.apply_epoch(ev, 0)
    st = eng.apply_epoch(ev, 0)
    assert st.skipped
    assert _urls(eng) == {"u/a"}


def test_unknown_novelty_mode_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="novelty_filter"):
        CDCApplyEngine(
            spark,
            table_path=str(tmp_path / "x2"),
            checkpoint_path=str(tmp_path / "x2c"),
            novelty_filter="fuzzy",
        )


def test_bloom_bit_roundtrip_no_false_negatives():
    bits, k = 1 << 12, 4
    fps = np.arange(1, 2000, 7, dtype=np.uint64)
    bm = np.zeros(bits // 8, dtype=np.uint8)
    _set_bits(bm, _positions(fps, bits, k))
    assert _test_bits(bm, _positions(fps, bits, k)).all()  # no false negatives
    other = np.arange(100_000, 102_000, dtype=np.uint64)
    fp_rate = _test_bits(bm, _positions(other, bits, k)).mean()
    assert fp_rate < 0.5  # saturated but not degenerate at this tiny size


# -- multi-writer bloom safety (CAS folds + head-tagged trust) ----------------


def test_bloom_cas_fold_survives_stale_cache_writer(tmp_path):
    """Two writers over the same bloom store: B primes its cache before
    A's fold, then folds its own bits. A last-writer-wins overwrite from
    B's stale view would erase A's committed bits (and a later bloom MISS
    would blindly re-admit A's content); the CAS fold must union them."""
    from data_migration_validation_spark.plans.novelty import NoveltyFilter

    a = NoveltyFilter(str(tmp_path / "nv"), n_buckets=1, bloom_bits=1 << 10)
    b = NoveltyFilter(str(tmp_path / "nv"), n_buckets=1, bloom_bits=1 << 10)
    bits, k = a.bloom_bits, a.bloom_k
    fa = np.array([111], dtype=np.uint64)
    fb = np.array([222], dtype=np.uint64)
    add_a = np.zeros(bits // 8, dtype=np.uint8)
    _set_bits(add_a, _positions(fa, bits, k))
    add_b = np.zeros(bits // 8, dtype=np.uint8)
    _set_bits(add_b, _positions(fb, bits, k))

    b._load_blooms()  # stale (empty) cache, primed before A's fold
    a._save_bloom(0, add_a, epoch=0)
    b._save_bloom(0, add_b, epoch=1)  # must NOT clobber A's bits

    merged = b._load_blooms(refresh=True)[0]
    assert _test_bits(merged, _positions(fa, bits, k)).all()
    assert _test_bits(merged, _positions(fb, bits, k)).all()
    assert b._bloom_cache[0][1] == 1  # head advanced to max folded epoch


def test_blooms_for_refreshes_stale_head_and_drops_uncovered(tmp_path):
    """_blooms_for must only hand out blooms whose head covers the
    caller's committed epochs: a cache that predates another writer's
    fold refreshes from the store; a bloom that STILL cannot cover (e.g.
    legacy untagged bits) is omitted, routing its bucket to the exact
    check."""
    from data_migration_validation_spark.plans.novelty import NoveltyFilter

    a = NoveltyFilter(str(tmp_path / "nv"), n_buckets=1, bloom_bits=1 << 10)
    bits, k = a.bloom_bits, a.bloom_k
    add = np.zeros(bits // 8, dtype=np.uint8)
    _set_bits(add, _positions(np.array([7], dtype=np.uint64), bits, k))
    a._save_bloom(0, add, epoch=0)
    assert 0 in a._blooms_for({0})

    # another process folds epoch 1 bits — a's cache is now stale
    other = NoveltyFilter(str(tmp_path / "nv"), n_buckets=1, bloom_bits=1 << 10)
    add2 = np.zeros(bits // 8, dtype=np.uint8)
    _set_bits(add2, _positions(np.array([9], dtype=np.uint64), bits, k))
    other._save_bloom(0, add2, epoch=1)

    got = a._blooms_for({0, 1})  # must refresh, not trust the stale cache
    assert 0 in got
    assert _test_bits(got[0], _positions(np.array([9], dtype=np.uint64), bits, k)).all()

    # legacy/untagged bloom (head=-1) can never cover a committed epoch
    a.store.write("fpb0", a._encode(add, -1))
    a._bloom_cache = None  # fresh process: only the store's tag to go on
    assert a._blooms_for({0, 1}) == {}
    # ...but with no committed history at all it is usable as-is
    assert 0 in a._blooms_for(set())


def test_second_replayer_stale_cache_does_not_readmit(spark, tmp_path):
    """End-to-end two-replayer scenario from the round-4 advice: engine A
    folds epoch 0, engine B (same table) folds epoch 1, then A — whose
    bloom cache predates B's fold — sees epoch 1's content re-delivered.
    A stale-cache bloom MISS would skip the exact check and re-admit;
    the head check must force a refresh and drop the duplicate."""
    eng_a = _engine(spark, tmp_path, name="shared")
    eng_b = _engine(spark, tmp_path, name="shared")
    eng_a.apply_epoch(
        spark.createDataFrame([_ev("I", "u/a", 1, "alpha text")], SCHEMA), 0
    )
    eng_b.apply_epoch(
        spark.createDataFrame([_ev("I", "u/b", 2, "beta text", 1)], SCHEMA), 1
    )
    st = eng_a.apply_epoch(
        spark.createDataFrame([_ev("I", "u/c", 3, "beta text", 2)], SCHEMA), 2
    )
    assert st.novelty_dropped == 1
    assert _urls(eng_a) == {"u/a", "u/b"}
    # and the interleaved folds unioned — A's epoch-0 bits survived B's fold
    st = eng_b.apply_epoch(
        spark.createDataFrame([_ev("I", "u/d", 4, "alpha text", 3)], SCHEMA), 3
    )
    assert st.novelty_dropped == 1


def test_novelty_mode_pinned_per_table(spark, tmp_path):
    """Exact and minhash write incompatible index schemas — reopening a
    table with the other mode (or other minhash shape params) must raise,
    not silently mix them."""
    eng = _engine(spark, tmp_path, name="pin")
    eng.apply_epoch(spark.createDataFrame([_ev("I", "u/a", 1, "pinme")], SCHEMA), 0)

    eng2 = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "pin"),
        checkpoint_path=str(tmp_path / "pin-ckpt"),
        num_buckets=4,
        compact_every=None,
        novelty_filter="minhash",
        novelty_buckets=4,
        novelty_bloom_bits=1 << 12,
    )
    with pytest.raises(ValueError, match="incompatible index schemas"):
        eng2.apply_epoch(
            spark.createDataFrame([_ev("I", "u/b", 2, "other", 1)], SCHEMA), 1
        )

    # same mode, different banding shape → also refused
    eng3 = _engine_nd(spark, tmp_path, name="pin2")
    eng3.apply_epoch(spark.createDataFrame([_ev("I", "u/a", 1, BASE)], SCHEMA), 0)
    nov = eng3.novelty
    with pytest.raises(ValueError, match="incompatible index schemas"):
        nov._mode_pinned = None
        nov._ensure_mode("minhash", num_perm=16, bands=8, shingle_k=3)


# -- near-dup scale shape: observation-folded counts + bucket skew cap ---------


def test_neardup_counts_ride_index_write(spark, tmp_path, monkeypatch):
    """admit_neardup's candidate/admitted counts must ride the index-write
    action as Observations — zero DataFrame.count() jobs (the round-4
    verdict flagged two extra per-epoch jobs; per-job fixed cost dominates
    novelty overhead at epoch scale)."""
    from pyspark.sql import DataFrame

    eng = _engine_nd(spark, tmp_path, name="obsnd")
    ev0 = spark.createDataFrame(
        [_ev("I", "u/a", 1, BASE), _ev("I", "u/b", 2, OTHER)], SCHEMA
    )
    eng.apply_epoch(ev0, 0)  # seed committed history so the join path runs

    calls = {"n": 0}
    real_count = DataFrame.count

    def counting(self):
        calls["n"] += 1
        return real_count(self)

    monkeypatch.setattr(DataFrame, "count", counting)
    committed = {e for e in eng.lake.epochs_applied() if e < 1}
    winners = spark.createDataFrame(
        [
            _ev("I", "u/c", 10, BASE + " footer", 1),   # near-dup of u/a
            _ev("I", "u/d", 11, "totally fresh words here", 1),
            _ev("I", "u/d2", 12, "totally fresh words here", 1),  # in-epoch exact dup
        ],
        SCHEMA,
    ).select(
        "url", "warc_ts", "seq",
        F.decode(F.col("payload.html"), "utf-8").alias("text"),
        F.lit(False).alias("deleted"),
    ).withColumn("text", F.regexp_replace(F.regexp_replace("text", "^<html><p>", ""), "</p></html>$", ""))
    out, stats = eng.novelty.admit_neardup(spark, winners, 1, committed)
    assert calls["n"] == 0, f"admit_neardup ran {calls['n']} count() jobs"
    assert stats.candidates == 3
    assert stats.admitted == 1  # u/c near-dup dropped, u/d2 exact in-epoch dup
    assert stats.dropped == 2
    assert {r["url"] for r in out.collect()} == {"u/d"}
    eng.novelty.release()


def test_neardup_max_bucket_collapses_variant_flood(spark, tmp_path):
    """A flood of near-identical VARIANTS (distinct fingerprints, shared
    band keys) must not quadratically swell the in-epoch bucket scan:
    with max_bucket set, over-cap buckets collapse to their first-seen
    member and are counted in overflow_buckets; small buckets keep exact
    pairwise semantics."""
    eng = _engine_nd(spark, tmp_path, name="flood", novelty_max_bucket=8)
    flood = [
        # seq 10..39 keeps warc_ts monotone (seconds = seq % 60), so
        # u/f0 is the first-seen member by the (warc_ts, seq) order
        _ev("I", f"u/f{i}", 10 + i, BASE + f" variant{i // 6}", 0)
        for i in range(30)
    ]
    # control: unrelated docs far under the cap, not near-dups of each other
    flood.append(_ev("I", "u/x", 1, OTHER, 0))
    st = eng.apply_epoch(spark.createDataFrame(flood, SCHEMA), 0)
    assert st.novelty_dropped >= 24  # flood collapsed, not admitted wholesale
    urls = _urls(eng)
    assert "u/x" in urls
    assert "u/f0" in urls  # first-seen flood member survives
    assert len(urls) <= 7  # 30 variants collapse to at most a handful

    # the overflow accounting is surfaced by the direct API
    committed = set()
    winners = spark.createDataFrame(
        [_ev("I", f"u/g{i}", 200 + i, BASE + " same same", 1) for i in range(12)],
        SCHEMA,
    ).select(
        "url", "warc_ts", "seq",
        F.decode(F.col("payload.html"), "utf-8").alias("text"),
        F.lit(False).alias("deleted"),
    )
    nv = eng.novelty
    out, stats = nv.admit_neardup(
        spark, winners, 99, committed, max_bucket=4
    )
    # 12 EXACT copies collapse via the exact pre-dedup (1 candidate bucket
    # row per band) — no overflow; candidates include the in-epoch dups
    assert stats.candidates == 12
    assert stats.admitted == 1
    nv.release()


# -- index compaction ----------------------------------------------------------


def test_index_compaction_identical_decisions_exact(spark, tmp_path):
    """Folding committed per-epoch index partitions must not change a
    single admission decision: same stream through a compacted and an
    uncompacted table converges to the same final state, and the
    compacted table's exact check reads O(buckets) files from the
    compacted generation only."""
    import os

    streams = [
        [_ev("I", "u/a", 1, "alpha text"), _ev("I", "u/b", 2, "beta text")],
        [_ev("I", "u/c", 10, "gamma text", 1)],
        [_ev("I", "u/d", 20, "alpha text", 2),   # dup of epoch-0 content
         _ev("I", "u/e", 21, "delta text", 2)],
        [_ev("I", "u/f", 30, "gamma text", 3),   # dup of epoch-1 content
         _ev("I", "u/g", 31, "epsilon text", 3)],
    ]
    plain = _engine(spark, tmp_path, name="nocomp")
    comp = _engine(spark, tmp_path, name="comp")
    for e, rows in enumerate(streams[:2]):
        plain.apply_epoch(spark.createDataFrame(rows, SCHEMA), e)
        comp.apply_epoch(spark.createDataFrame(rows, SCHEMA), e)

    folded = comp.novelty.compact_index(spark, comp.lake.epochs_applied())
    assert folded == 2
    # per-epoch partitions stay on disk for ONE maintenance cadence (a
    # concurrent admit may still be scanning them), but reads already
    # plan from the compacted generation only
    assert {0, 1} <= comp.novelty._epoch_dirs_on_disk()
    idx = comp.novelty._read_index(spark, {0, 1})
    assert all("index_compact" in f for f in idx.inputFiles())

    for e, rows in list(enumerate(streams))[2:]:
        plain.apply_epoch(spark.createDataFrame(rows, SCHEMA), e)
        comp.apply_epoch(spark.createDataFrame(rows, SCHEMA), e)
    assert _urls(comp) == _urls(plain) == {"u/a", "u/b", "u/c", "u/e", "u/g"}

    # second fold extends the generation and stays consistent; it also
    # reclaims what the FIRST flip made redundant
    assert comp.novelty.compact_index(spark, comp.lake.epochs_applied()) == 4
    assert comp.novelty._epoch_dirs_on_disk() & {0, 1} == set()
    # a third (no-op) pass reclaims the second flip's leftovers too
    assert comp.novelty.compact_index(spark, comp.lake.epochs_applied()) == 4
    assert comp.novelty._epoch_dirs_on_disk() == set()
    gens = os.listdir(comp.novelty.compact_dir)
    assert len(gens) == 1  # superseded generations swept
    st = comp.apply_epoch(
        spark.createDataFrame([_ev("I", "u/h", 40, "beta text", 4)], SCHEMA), 4
    )
    assert st.novelty_dropped == 1  # epoch-0 content still remembered


def test_index_compaction_identical_decisions_neardup(spark, tmp_path):
    """Same contract in minhash mode: the banded index folds without
    changing near-dup admissions."""
    plain = _engine_nd(spark, tmp_path, name="ndplain")
    comp = _engine_nd(spark, tmp_path, name="ndcomp")
    streams = [
        [_ev("I", "u/a", 1, BASE)],
        [_ev("I", "u/b", 10, OTHER, 1)],
    ]
    for e, rows in enumerate(streams):
        plain.apply_epoch(spark.createDataFrame(rows, SCHEMA), e)
        comp.apply_epoch(spark.createDataFrame(rows, SCHEMA), e)
    assert comp.novelty.compact_index(spark, comp.lake.epochs_applied()) == 2

    tail = [
        _ev("I", "u/c", 20, BASE + " footer", 2),   # near-dup of u/a
        _ev("I", "u/d", 21, "completely different words entirely", 2),
    ]
    for eng in (plain, comp):
        st = eng.apply_epoch(spark.createDataFrame(tail, SCHEMA), 2)
        assert st.novelty_dropped == 1
    assert _urls(comp) == _urls(plain) == {"u/a", "u/b", "u/d"}


def test_index_compaction_folds_only_contiguous_run(spark, tmp_path):
    """With a committed gap, only the contiguous prefix folds — a later
    admit for the gap epoch must still see exactly its strictly-earlier
    history (the folded set is always a subset of any later admit's
    committed set)."""
    eng = _engine(spark, tmp_path, name="gap")
    eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/a", 1, "alpha text")], SCHEMA), 0
    )
    eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/b", 10, "beta text", 2)], SCHEMA), 2
    )
    # committed = {0, 2}: the run stops before the gap at 1
    assert eng.novelty.compact_index(spark, eng.lake.epochs_applied()) == 1
    st = eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/c", 5, "alpha text", 1)], SCHEMA), 1
    )
    assert st.novelty_dropped == 1  # epoch-0 history via the compacted gen
    # and epoch 2's partition is still on disk (not folded)
    assert 2 in eng.novelty._epoch_dirs_on_disk()


def test_concurrent_fold_loser_keeps_winners_generation(spark, tmp_path):
    """Two maintenance processes folding the same committed run: the CAS
    loser must delete only its OWN (uniquely named) generation directory,
    never the winner's live one — and the CAS must compare against the
    pointer content the fold was planned from, so a stale fold can never
    overwrite a newer pointer."""
    from data_migration_validation_spark.plans.novelty import NoveltyFilter

    eng = _engine(spark, tmp_path, name="race")
    streams = [
        [_ev("I", "u/a", 1, "alpha text")],
        [_ev("I", "u/b", 10, "beta text", 1)],
    ]
    for e, rows in enumerate(streams):
        eng.apply_epoch(spark.createDataFrame(rows, SCHEMA), e)
    committed = eng.lake.epochs_applied()
    nf_a = eng.novelty
    nf_b = NoveltyFilter(
        nf_a.root, n_buckets=nf_a.n_buckets, bloom_bits=nf_a.bloom_bits
    )
    real_cas = nf_b.store.cas
    raced = {}

    def cas_after_other_writer(name, expected, content):
        if name == "_compact" and "hit" not in raced:
            raced["hit"] = True
            # the other writer folds the same run and flips first
            assert nf_a.compact_index(spark, committed) == 2
        return real_cas(name, expected, content)

    nf_b.store.cas = cas_after_other_writer
    # the loser reports the winner's (identical) coverage, not a failure
    assert nf_b.compact_index(spark, committed) == 2
    assert raced == {"hit": True}
    # the winner's generation survived the loser's cleanup: committed
    # history still gates admission
    st = eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/c", 20, "alpha text", 2)], SCHEMA), 2
    )
    assert st.novelty_dropped == 1
    assert _urls(eng) == {"u/a", "u/b"}


def test_refold_after_lower_epoch_arrives_same_head(spark, tmp_path):
    """Out-of-order replay: epoch 1 folds first, then epoch 0 arrives and
    the run extends DOWNWARD without raising the head. The refold must
    write a fresh generation (not read-and-overwrite its own input dir)
    and keep every fingerprint."""
    eng = _engine(spark, tmp_path, name="ooo")
    eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/b", 10, "beta text", 1)], SCHEMA), 1
    )
    assert eng.novelty.compact_index(spark, eng.lake.epochs_applied()) == 1
    eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/a", 1, "alpha text")], SCHEMA), 0
    )
    assert eng.novelty.compact_index(spark, eng.lake.epochs_applied()) == 2
    st = eng.apply_epoch(
        spark.createDataFrame(
            [_ev("I", "u/c", 20, "alpha text", 2),
             _ev("I", "u/d", 21, "beta text", 2)],
            SCHEMA,
        ),
        2,
    )
    assert st.novelty_dropped == 2
    assert _urls(eng) == {"u/a", "u/b"}


def test_fold_skips_rather_than_regress_coverage(spark, tmp_path):
    """An epoch BELOW the previously folded run, still separated from it
    by a gap, must NOT fold: shrinking pointer coverage to the new lower
    run would orphan the already-reclaimed higher epochs' only coverage.
    The fold waits; admits keep working; once the gap fills everything
    folds in one pass."""
    eng = _engine(spark, tmp_path, name="skipgap")
    eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/g", 30, "gamma text", 2)], SCHEMA), 2
    )
    assert eng.novelty.compact_index(spark, eng.lake.epochs_applied()) == 1
    eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/a", 1, "alpha text")], SCHEMA), 0
    )
    # run from 0 stops at the gap at 1: skip, keep {2} folded
    assert eng.novelty.compact_index(spark, eng.lake.epochs_applied()) == 1
    assert eng.novelty._compact_state()["epochs"] == [2]
    assert 0 in eng.novelty._epoch_dirs_on_disk()  # stays per-epoch
    # an admit above the head still sees ALL committed history (gen for
    # {2}, per-epoch partition for {0}) — with a regressed pointer this
    # raises because epoch 2 has neither coverage
    st = eng.apply_epoch(
        spark.createDataFrame(
            [_ev("I", "u/x", 40, "alpha text", 3),
             _ev("I", "u/y", 41, "gamma text", 3)],
            SCHEMA,
        ),
        3,
    )
    assert st.novelty_dropped == 2
    # gap fills → one fold covers everything
    eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/b", 5, "beta text", 1)], SCHEMA), 1
    )
    assert eng.novelty.compact_index(spark, eng.lake.epochs_applied()) == 4
    st = eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/z", 50, "beta text", 4)], SCHEMA), 4
    )
    assert st.novelty_dropped == 1


def test_trusted_index_allows_own_epoch_in_generation(spark, tmp_path):
    """Converging-replayer race: the fold may contain the admitting epoch
    itself (another replayer committed it between this caller's
    idempotency check and its admit). Usable — the caller's publish will
    conflict-skip, so its decisions never land. Any OTHER folded-away
    epoch outside the committed set still refuses."""
    eng = _engine(spark, tmp_path, name="own")
    streams = [
        [_ev("I", "u/a", 1, "alpha text")],
        [_ev("I", "u/b", 10, "beta text", 1)],
    ]
    for e, rows in enumerate(streams):
        eng.apply_epoch(spark.createDataFrame(rows, SCHEMA), e)
    nf = eng.novelty
    assert nf.compact_index(spark, {0, 1}) == 2
    # second (no-op) pass actually reclaims the folded per-epoch dirs —
    # during the grace window reads fall back to them and nothing raises
    assert nf.compact_index(spark, {0, 1}) == 2
    assert nf._epoch_dirs_on_disk() == set()
    idx = nf._read_index(spark, {0}, epoch=1)
    assert idx is not None and idx.count() == 2
    with pytest.raises(RuntimeError, match="neither a per-epoch partition"):
        nf._read_index(spark, {0}, epoch=2)


def test_bloom_refresh_once_per_high_water_mark(spark, tmp_path):
    """A bucket that stays uncovered after a refresh (legacy/geometry-
    swapped bloom, head=-1) must not turn every admit into n_buckets
    store reads: at most one refresh per NEW committed epoch (the
    committed-set gate) — a repeat admit against the same committed set
    reads nothing."""
    eng = _engine(spark, tmp_path, name="blthrottle")
    for e, rows in enumerate(
        [[_ev("I", "u/a", 1, "alpha text")], [_ev("I", "u/b", 10, "beta text", 1)]]
    ):
        eng.apply_epoch(spark.createDataFrame(rows, SCHEMA), e)
    nf = eng.novelty
    nf._load_blooms(refresh=True)
    k = next(iter(nf._bloom_cache))
    bm, _head = nf._bloom_cache[k]
    # poison the STORE: bucket k's bloom is permanently head=-1 (what a
    # legacy bare-b64 object or a geometry swap awaiting rebuild_blooms
    # looks like) — a refresh re-reads exactly this
    name = f"fpb{k}"
    assert nf.store.cas(name, nf.store.read(name).strip(), nf._encode(bm, -1))
    reads: list[str] = []
    real_read = nf.store.read
    nf.store.read = lambda n: (reads.append(n), real_read(n))[1]

    nf._bloom_cache[k] = (bm, -1)
    nf._bloom_refreshed_for = set()  # as a fresh process would start
    out = nf._blooms_for({0, 1})
    n_after_first = len(reads)
    assert n_after_first > 0  # one refresh happened
    assert k not in out  # still uncovered → omitted → exact check path

    nf._blooms_for({0, 1})
    assert len(reads) == n_after_first  # no second refresh at the same mark

    nf._blooms_for({0, 1, 2})  # higher watermark → one more refresh
    assert len(reads) > n_after_first


def test_bloom_cache_refreshes_on_watermark_advance(tmp_path):
    """A cached head >= need must NOT skip the store refresh: head
    records the MAX epoch some writer folded, never interior coverage.
    Gap replay: process P folds epoch 2 (its cache then carries head=2)
    while epoch 1 is still uncommitted; process Q later folds epoch 1's
    bits into the store; P admits with committed={0,1,2}. P's cache
    lacks Q's bits — without a refresh, epoch-1 content bloom-MISSes,
    and misses skip the exact check by design: a silent re-admit."""
    from data_migration_validation_spark.plans.novelty import NoveltyFilter

    root = str(tmp_path / "nv-stale")
    p = NoveltyFilter(root, n_buckets=2, bloom_bits=1 << 12)
    q = NoveltyFilter(root, n_buckets=2, bloom_bits=1 << 12)
    nbytes = (1 << 12) // 8
    bits_p = np.zeros(nbytes, dtype=np.uint8)
    bits_p[0] = 1
    bits_q = np.zeros(nbytes, dtype=np.uint8)
    bits_q[1] = 2
    p._save_bloom(0, bits_p, epoch=2)  # P folds epoch 2 first (gap open)
    q._save_bloom(0, bits_q, epoch=1)  # Q folds epoch 1 into the store
    out = p._blooms_for({0, 1, 2})  # P admits the next epoch
    assert 0 in out, "head=2 covers need=2: bloom must be trusted"
    assert out[0][0] == 1 and out[0][1] == 2, (
        "cache was not refreshed at the watermark advance: Q's committed "
        "bits are missing and their content would silently re-admit"
    )


def test_gap_fold_below_unchanged_watermark_refreshes(spark, tmp_path):
    """Two gap-replayers below an unchanged max(committed): A's cache
    last refreshed while max=5, B then folds GAP epoch 3's fingerprints
    into the store (max still 5), and A admits epoch 3's content again.
    A watermark-gated cache (head=5 >= need=5, no refresh) would lack
    B's bits, bloom-MISS, and re-admit blindly; the committed-SET gate
    must see the unseen epoch 3, refresh, and drop the duplicate."""
    def _gap_engine():
        return CDCApplyEngine(
            spark,
            table_path=str(tmp_path / "gapshared"),
            checkpoint_path=str(tmp_path / "gapshared-ckpt"),
            num_buckets=4,
            compact_every=None,
            novelty_filter=True,
            novelty_buckets=1,  # every fingerprint shares one bloom bucket
            novelty_bloom_bits=1 << 12,
        )

    a = _gap_engine()
    # A commits 0, 5, then 7 — the epoch-7 admit reads the store while
    # B's epoch-3 bits do NOT yet exist, and its trusted committed set
    # {0,5} tops out at 5
    a.apply_epoch(spark.createDataFrame([_ev("I", "u/a", 1, "alpha")], SCHEMA), 0)
    a.apply_epoch(
        spark.createDataFrame([_ev("I", "u/e", 50, "echo", 5)], SCHEMA), 5
    )
    a.apply_epoch(
        spark.createDataFrame([_ev("I", "u/h", 70, "hotel", 7)], SCHEMA), 7
    )
    # B (second replayer, own process-local cache) fills gap epoch 3
    b = _gap_engine()
    st3 = b.apply_epoch(
        spark.createDataFrame([_ev("I", "u/g", 30, "gamma", 3)], SCHEMA), 3
    )
    assert st3.novelty_dropped == 0
    # A admits epoch 6 with CONTENT IDENTICAL to B's epoch 3. Its
    # trusted set {0,3,5} includes the gap epoch, but its max is still
    # 5 — exactly where A's cache already stood
    st6 = a.apply_epoch(
        spark.createDataFrame([_ev("I", "u/x", 60, "gamma", 6)], SCHEMA), 6
    )
    assert st6.novelty_dropped == 1, (
        "stale bloom cache below an unchanged watermark re-admitted "
        "another replayer's committed content"
    )
    assert _urls(a) == {"u/a", "u/e", "u/h", "u/g"}


def test_all_deletes_epoch_exact_mode_observation_safe(spark, tmp_path):
    """An all-deletes epoch has zero upserts; if AQE's empty-relation
    propagation elides the observed subtree, the exact-mode counts must
    default to 0 instead of failing the epoch (deterministic replay
    would then wedge on it forever)."""
    eng = _engine(spark, tmp_path, name="alldel")
    # first epoch all-deletes (index write leaves only _SUCCESS)
    st0 = eng.apply_epoch(
        spark.createDataFrame([_ev("D", "u/a", 1), _ev("D", "u/b", 2)], SCHEMA), 0
    )
    assert (st0.events_seen, st0.novelty_dropped) == (2, 0)
    # mid-stream all-deletes with committed history + blooms present
    eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/c", 3, "gamma", 1)], SCHEMA), 1
    )
    st2 = eng.apply_epoch(
        spark.createDataFrame([_ev("D", "u/c", 9, None, 2)], SCHEMA), 2
    )
    assert (st2.events_seen, st2.novelty_dropped) == (1, 0)
    assert _urls(eng) == set()


def test_rebuild_blooms_never_sheds_concurrent_fold_bits(spark, tmp_path):
    """rebuild_blooms must CAS-UNION, not overwrite: a blind overwrite
    racing an in-flight fold sheds that fold's bits, and under
    out-of-order replay the shed epoch can sit BELOW max(committed),
    where the head>=need trust check cannot see the hole."""
    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "rb"),
        checkpoint_path=str(tmp_path / "rb-ckpt"),
        num_buckets=4,
        compact_every=None,
        novelty_filter=True,
        novelty_buckets=1,  # all fingerprints land in fpb0
        novelty_bloom_bits=1 << 12,
    )
    eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/a", 1, "alpha text")], SCHEMA), 0
    )
    nf = eng.novelty
    nbytes = (1 << 12) // 8
    inflight = np.zeros(nbytes, dtype=np.uint8)
    inflight[7] = 8
    nf._save_bloom(0, inflight, epoch=5)  # concurrent fold, epoch 5 in flight
    nf.rebuild_blooms(spark, eng.lake.epochs_applied())  # claims head 0
    bm, head = nf._decode(nf.store.read("fpb0"))
    assert head == 5, "rebuild must never regress a stored head"
    assert bm[7] & 8, "rebuild shed a concurrent fold's bits"


def test_apply_without_filter_on_pinned_table_refuses(spark, tmp_path):
    """A table whose novelty mode is pinned must refuse a plain apply:
    committed-but-unindexed epochs are treated as bootstrap history by
    later admits, so content committed past the filter re-admits forever
    — silent permanent corruption of the dedup contract. The explicit
    opt-out (novelty_filter='off') stays available for an operator who
    means it."""
    path, ckpt = str(tmp_path / "pin"), str(tmp_path / "pin-ckpt")
    nv = CDCApplyEngine(
        spark, table_path=path, checkpoint_path=ckpt, num_buckets=4,
        compact_every=None, novelty_filter=True, novelty_buckets=2,
        novelty_bloom_bits=1 << 12,
    )
    nv.apply_epoch(
        spark.createDataFrame([_ev("I", "u/a", 1, "alpha text")], SCHEMA), 0
    )
    plain = CDCApplyEngine(
        spark, table_path=path, checkpoint_path=ckpt, num_buckets=4,
        compact_every=None,
    )
    with pytest.raises(ValueError, match="pinned novelty mode"):
        plain.apply_epoch(
            spark.createDataFrame([_ev("I", "u/b", 2, "beta text", 1)], SCHEMA), 1
        )
    # the refusal happened before anything was written
    assert set(nv.lake.epochs_applied()) == {0}
    # explicit opt-out: the operator takes responsibility
    opt_out = CDCApplyEngine(
        spark, table_path=path, checkpoint_path=ckpt, num_buckets=4,
        compact_every=None, novelty_filter="off",
    )
    st = opt_out.apply_epoch(
        spark.createDataFrame([_ev("I", "u/b", 2, "beta text", 1)], SCHEMA), 1
    )
    assert not st.skipped and st.events_seen == 1


def test_novelty_enabled_on_existing_table_bootstraps(spark, tmp_path):
    """Enabling the filter on a table with pre-existing committed epochs
    must not wedge ingest: those epochs were never indexed (their
    fingerprints were never computed), so their content is unknown
    history — it re-admits, and the filter applies from the enable point
    on. Raising instead would fail every subsequent apply forever."""
    path, ckpt = str(tmp_path / "boot"), str(tmp_path / "boot-ckpt")
    plain = CDCApplyEngine(
        spark, table_path=path, checkpoint_path=ckpt, num_buckets=4,
        compact_every=None,
    )
    plain.apply_epoch(
        spark.createDataFrame(
            [_ev("I", "u/a", 1, "alpha text"), _ev("I", "u/b", 2, "beta text")],
            SCHEMA,
        ),
        0,
    )
    nv = CDCApplyEngine(
        spark, table_path=path, checkpoint_path=ckpt, num_buckets=4,
        compact_every=None, novelty_filter=True, novelty_buckets=4,
        novelty_bloom_bits=1 << 12,
    )
    # pre-enable content is unknown history: the dup of u/a re-admits
    st1 = nv.apply_epoch(
        spark.createDataFrame(
            [_ev("I", "u/c", 10, "gamma text", 1),
             _ev("I", "u/d", 11, "alpha text", 1)],
            SCHEMA,
        ),
        1,
    )
    assert st1.novelty_dropped == 0
    # post-enable history gates normally
    st2 = nv.apply_epoch(
        spark.createDataFrame([_ev("I", "u/e", 20, "gamma text", 2)], SCHEMA), 2
    )
    assert st2.novelty_dropped == 1
    assert _urls(nv) == {"u/a", "u/b", "u/c", "u/d"}


def test_compaction_defers_reclaim_for_inflight_readers(spark, tmp_path):
    """An admit that planned its index read against the pre-fold pointer
    must be able to finish its Spark job: the fold defers deleting the
    directories it supersedes to the NEXT maintenance pass instead of
    removing them under a concurrent reader."""
    eng = _engine(spark, tmp_path, name="grace")
    for e, rows in enumerate(
        [[_ev("I", "u/a", 1, "alpha text")], [_ev("I", "u/b", 10, "beta text", 1)]]
    ):
        eng.apply_epoch(spark.createDataFrame(rows, SCHEMA), e)
    nf = eng.novelty
    idx = nf._read_index(spark, {0, 1})  # plans against per-epoch dirs
    assert all("index_compact" not in f for f in idx.inputFiles())
    assert nf.compact_index(spark, {0, 1}) == 2  # pointer flips mid-read
    assert idx.count() == 2  # the in-flight plan still finds its files
