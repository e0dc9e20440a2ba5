"""Change-data-feed (CDCApplyEngine.read_changes): row-level changes
between two epoch-line points, Delta-CDF-style. The feed must classify
insert / delete / update (both images) correctly, prune its reads to the
buckets the range's epoch commits touched (manifest-only), and stay
correct when maintenance commits (compaction, GC, rebucket) sit inside
the range — falling back to an unpruned diff where bucket-level pruning
is no longer sound."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_migration_validation_spark.plans.lake import bucket_expr
from tests.test_time_travel import _EPOCHS, _events, _replay


def _feed_rows(df):
    return sorted(
        (r["url"], r["seq"], r["_change_type"]) for r in df.collect()
    )


def test_cdf_classifies_changes(spark, tmp_path):
    eng = _replay(spark, tmp_path, "cdf", [0, 1, 2, 3])
    feed = eng.read_changes(from_epoch=1)
    # state after e1: a/1(s3), b/3(s2), b/4(s5); final: a/1(s9), b/3(s6),
    # a/2(s7, re-insert after delete), c/5(s10); b/4 deleted at e2.
    assert _feed_rows(feed) == sorted(
        [
            ("https://a/1", 3, "update_preimage"),
            ("https://a/1", 9, "update_postimage"),
            ("https://b/3", 2, "update_preimage"),
            ("https://b/3", 6, "update_postimage"),
            ("https://b/4", 5, "delete"),
            ("https://a/2", 7, "insert"),
            ("https://c/5", 10, "insert"),
        ]
    )
    # update postimage carries the new extracted text, preimage the old
    pre = feed.where((F.col("url") == "https://a/1") & (F.col("_change_type") == "update_preimage"))
    post = feed.where((F.col("url") == "https://a/1") & (F.col("_change_type") == "update_postimage"))
    assert "s3" in pre.collect()[0]["text"] and "s9" in post.collect()[0]["text"]


def test_cdf_from_empty_is_all_inserts(spark, tmp_path):
    eng = _replay(spark, tmp_path, "cdf0", [0, 1])
    feed = eng.read_changes(from_epoch=None)
    final = eng.read_final()
    assert {r["_change_type"] for r in feed.collect()} == {"insert"}
    assert feed.count() == final.count()


def test_cdf_empty_range(spark, tmp_path):
    eng = _replay(spark, tmp_path, "cdfe", [0, 1, 2, 3])
    feed = eng.read_changes(from_epoch=3)
    assert feed.count() == 0
    # maintenance inside an otherwise-empty range stays empty (compaction
    # is state-preserving and must not surface as phantom changes)
    eng.lake.compact(spark)
    assert eng.read_changes(from_epoch=3).count() == 0


def test_cdf_prunes_to_touched_buckets(spark, tmp_path):
    eng = _replay(spark, tmp_path, "cdfp", [0, 1, 2, 3], num_buckets=64)
    v1 = eng.lake.version_asof_epoch(2)
    changed = eng.lake.buckets_changed_between(v1, eng.lake.current_version())
    # epoch 3 touches exactly a/1 and c/5 — pruning must narrow to their
    # buckets, not scan the table
    expected = {
        r["b"]
        for r in spark.range(1)
        .select(
            F.explode(F.array(F.lit("https://a/1"), F.lit("https://c/5"))).alias("u")
        )
        .select(bucket_expr(F.col("u"), 64).alias("b"))
        .collect()
    }
    assert changed == expected
    assert len(changed) < 64
    # state after e2: a/1(s3), b/3(s6), a/2(s7); final adds a/1→s9, c/5(s10)
    assert _feed_rows(eng.read_changes(from_epoch=2)) == sorted(
        [
            ("https://a/1", 3, "update_preimage"),
            ("https://a/1", 9, "update_postimage"),
            ("https://c/5", 10, "insert"),
        ]
    )


def test_cdf_fallback_when_pruning_unsound(spark, tmp_path):
    # GC in range: bucket pruning is invalidated (rows physically dropped
    # table-wide) — buckets_changed_between returns None and the feed is
    # computed unpruned, still correct.
    eng = _replay(spark, tmp_path, "cdfg", [0, 1, 2])
    v1 = eng.lake.version_asof_epoch(1)
    eng.lake.compact(spark, gc_horizon_ts="2023-01-01 00:00:00")
    eng.apply_epoch(_events(spark, _EPOCHS[3], 3), 3)
    assert eng.lake.buckets_changed_between(v1, eng.lake.current_version()) is None
    assert _feed_rows(eng.read_changes(from_epoch=1)) == sorted(
        [
            ("https://a/1", 3, "update_preimage"),
            ("https://a/1", 9, "update_postimage"),
            ("https://b/3", 2, "update_preimage"),
            ("https://b/3", 6, "update_postimage"),
            ("https://b/4", 5, "delete"),
            ("https://a/2", 7, "insert"),
            ("https://c/5", 10, "insert"),
        ]
    )

    # rebucket in range: bucket ids change meaning — same fallback.
    eng2 = _replay(spark, tmp_path, "cdfr", [0, 1, 2])
    v1 = eng2.lake.version_asof_epoch(1)
    eng2.lake.rebucket(spark, 16)
    eng2.apply_epoch(_events(spark, _EPOCHS[3], 3), 3)
    assert eng2.lake.buckets_changed_between(v1, eng2.lake.current_version()) is None
    assert _feed_rows(eng2.read_changes(from_epoch=1)) == _feed_rows(
        eng.read_changes(from_epoch=1)
    )
