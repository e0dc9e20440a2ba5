"""Point lookup with manifest file skipping: a key read must touch ONE
bucket's pruned files, not the table. After a key-sorted compaction with
a file-size target, base files cover disjoint key ranges recorded as
[min, max] bounds in the manifest; the lookup planner (driver-side
xxhash64 twin + range pruning, no Spark job) must select a strict subset
of the bucket's files and still return exactly the state read's row —
including through later delta commits and tombstones."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_migration_validation_spark.plans.apply import CDCApplyEngine
from data_migration_validation_spark.sources.binlog import (
    BinlogConfig,
    epoch_slice,
    synth_binlog,
)

CFG = BinlogConfig(n_keys=600, max_versions=3, events_per_epoch=700, seed=7)
N_BUCKETS = 4  # few buckets → many keys per bucket → file skipping visible


def _engine(spark, tmp_path, name):
    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / f"{name}-t"),
        checkpoint_path=str(tmp_path / f"{name}-c"),
        num_buckets=N_BUCKETS,
        compact_every=None,  # compaction is explicit in these tests
    )
    binlog = synth_binlog(spark, CFG)
    for e in range(CFG.n_epochs):
        eng.apply_epoch(epoch_slice(binlog, CFG, e), e)
    return eng


def test_lookup_matches_state_and_prunes_files(spark, tmp_path):
    eng = _engine(spark, tmp_path, "lk")
    # key-sorted compaction, ~8 files per bucket
    eng.lake.compact(spark, max_records_per_file=20)
    snap = eng.lake.current_snapshot()

    final = {r["url"]: r["seq"] for r in eng.read_final().collect()}
    some = sorted(final)[:5] + sorted(final)[-5:]
    for url in some:
        base_g, delta_g, bucket = eng.lake.lookup_files(url)
        all_in_bucket = sum(len(fs) for fs in snap.files_for({bucket}).values())
        chosen = sum(len(fs) for fs in base_g.values())
        assert chosen >= 1
        assert chosen < all_in_bucket, (
            f"no pruning for {url}: {chosen}/{all_in_bucket} files"
        )
        got = eng.lookup(url).collect()
        assert len(got) == 1 and got[0]["seq"] == final[url]


def test_lookup_after_delta_commit_merges(spark, tmp_path):
    from tests.test_time_travel import _events

    eng = _engine(spark, tmp_path, "lkd")
    eng.lake.compact(spark, max_records_per_file=20)
    url = eng.read_final().select("url").orderBy("url").limit(1).collect()[0]["url"]
    # a later delta epoch updates the key; lookup must LWW-merge base+delta
    up = [("U", url, "2030-01-01 00:00:00", 10_000_000)]
    eng.apply_epoch(_events(spark, up, CFG.n_epochs), CFG.n_epochs)
    got = eng.lookup(url).collect()
    assert len(got) == 1 and got[0]["seq"] == 10_000_000

    # tombstone: lookup returns empty, not the stale base row
    de = [("D", url, "2030-01-02 00:00:00", 10_000_001)]
    eng.apply_epoch(_events(spark, de, CFG.n_epochs + 1), CFG.n_epochs + 1)
    assert eng.lookup(url).count() == 0


def test_lookup_absent_key_prunes_everything(spark, tmp_path):
    eng = _engine(spark, tmp_path, "lka")
    eng.lake.compact(spark, max_records_per_file=20)
    # a key lexically below every real url: every base file's range
    # excludes it → zero files read, empty result straight from planning
    base_g, delta_g, _ = eng.lake.lookup_files("aaa://nothing")
    assert base_g == {} and delta_g == {}
    assert eng.lookup("aaa://nothing").count() == 0


def test_stats_survive_carry_forward(spark, tmp_path):
    from tests.test_time_travel import _events

    eng = _engine(spark, tmp_path, "lks")
    eng.lake.compact(spark, max_records_per_file=20)
    n_stats = len(eng.lake.current_snapshot().file_stats)
    assert n_stats > 0
    # an epoch touching one bucket carries every other file by reference —
    # their stats must survive in the new manifest
    url = eng.read_final().limit(1).collect()[0]["url"]
    eng.apply_epoch(
        _events(spark, [("U", url, "2030-01-01 00:00:00", 20_000_000)], 99), 99
    )
    after = eng.lake.current_snapshot().file_stats
    assert len(after) >= n_stats  # old stats carried + new delta file's


def test_lookup_parses_only_one_bucket_shard(spark, tmp_path):
    """With sharded manifests, a point lookup must load the key's bucket
    shard and no other — the read-side metadata cost stays O(1) as bucket
    (and file) counts grow."""
    eng = _engine(spark, tmp_path, "shard")
    lake = eng.lake
    url = eng.read_final().select("url").limit(1).collect()[0]["url"]

    lake._shard_cache.clear()
    loaded: list[str] = []
    orig = lake._load_shard

    def counting(rel):
        loaded.append(rel)
        return orig(rel)

    lake._load_shard = counting
    try:
        got = lake.lookup(spark, url).collect()
    finally:
        lake._load_shard = orig
    assert len(got) == 1
    # every load is the SAME bucket's shard (lookup_files + snapshot_pruned
    # may each ask once; the cache makes repeats free)
    bucket = lake._key_bucket(url)
    assert loaded, "expected a sharded manifest"
    assert all(rel.startswith(f"manifests/b{bucket}-") for rel in loaded), loaded
    assert len(set(loaded)) == 1
