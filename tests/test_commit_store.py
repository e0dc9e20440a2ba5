"""Commit-store interface + sharded per-bucket manifests.

Two 100-TB metadata-path properties under test:

1. the commit protocol's guarantees (exclusive version claim, pointer
   CAS) hold through the abstract :class:`CommitStore` interface — for
   the POSIX implementation AND the object-store conditional-PUT
   implementation, which uses no rename/link/flock at all;
2. commit metadata volume is O(touched buckets' files), never O(all
   files in the table): untouched buckets' shard files are carried
   forward by reference, so a 10k-file table whose commit touches one
   bucket writes ~1/32 of the file-level metadata, and the snapshot
   manifest itself contains no file paths (O(buckets) pointer entries).
"""

from __future__ import annotations

import json
import os

import pytest

from data_migration_validation_spark.plans.commit_store import (
    ConditionalPutCommitStore,
    LocalBlobApi,
    PosixCommitStore,
)
from data_migration_validation_spark.plans.lake import LakeTable, _xxhash64_str


@pytest.fixture(params=["posix", "condput"])
def store(request, tmp_path):
    root = str(tmp_path / "store")
    if request.param == "posix":
        return PosixCommitStore(root)
    return ConditionalPutCommitStore(LocalBlobApi(root))


# -- primitive semantics, identical across implementations -------------------


def test_read_write_list_delete(store):
    assert store.read("CURRENT") is None
    store.write("manifests/b0-abc.json", '{"x": 1}')
    store.write("v0.json", "{}")
    assert store.read("v0.json") == "{}"
    assert store.list("") == ["manifests/b0-abc.json", "v0.json"]
    assert store.list("manifests/") == ["manifests/b0-abc.json"]
    store.delete("v0.json")
    assert store.read("v0.json") is None
    store.delete("v0.json")  # absent delete is not an error


def test_write_exclusive_is_test_and_set(store):
    assert store.write_exclusive("v1.json", "first")
    assert not store.write_exclusive("v1.json", "second")
    assert store.read("v1.json") == "first"  # loser never clobbers


def test_cas_creates_only_when_expected_absent(store):
    assert not store.cas("CURRENT", "0", "1")  # absent != "0"
    assert store.cas("CURRENT", None, "0")  # create-if-absent
    assert not store.cas("CURRENT", None, "9")  # exists now
    assert store.read("CURRENT") == "0"


def test_cas_swaps_only_on_match(store):
    store.cas("CURRENT", None, "0")
    assert store.cas("CURRENT", "0", "1")
    assert not store.cas("CURRENT", "0", "2")  # stale writer loses
    assert store.read("CURRENT") == "1"


def test_cas_is_atomic_under_thread_race(store):
    """N threads all try to advance the pointer from the same parent;
    exactly one may win — the lost-update rule the whole lake rests on."""
    import threading

    store.cas("CURRENT", None, "0")
    wins = []
    barrier = threading.Barrier(8)

    def contend(i):
        barrier.wait()
        if store.cas("CURRENT", "0", str(i + 1)):
            wins.append(i + 1)

    threads = [threading.Thread(target=contend, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert len(wins) == 1
    assert store.read("CURRENT") == str(wins[0])


# -- sharded-manifest metadata scaling (no Spark needed) ---------------------


def _synthetic_groups(n_files: int, n_buckets: int):
    """A fabricated table layout: n_files spread across n_buckets, one
    schema group, with per-file stats — the metadata shape of a mature
    100-TB table (file counts >> bucket count)."""
    sj = '{"fields": [], "type": "struct"}'
    by_bucket: dict[str, list[str]] = {
        str(b): [f"/data/commit-0/bucket={b}/part-{b}-{i}.parquet" for i in range(n_files // n_buckets)]
        for b in range(n_buckets)
    }
    files = [f for fs in by_bucket.values() for f in fs]
    stats = {f: ["https://a.example.com/0", "https://z.example.com/9"] for f in files}
    ts = {f: ["2024-01-01 00:00:00", "2024-01-02 00:00:00"] for f in files}
    return {sj: by_bucket}, stats, ts


def test_commit_metadata_bytes_scale_with_touched_buckets(tmp_path):
    """10k-file table, 32 buckets: a commit touching ONE bucket must
    write ~1 bucket's worth of file metadata; a full rewrite writes all
    of it. The ratio bounds the carried-by-reference savings."""
    lake = LakeTable(str(tmp_path / "t"), key_col="url", num_buckets=32)
    file_groups, stats, ts = _synthetic_groups(n_files=10_240, n_buckets=32)

    def shard_bytes(touched, prev_shards):
        manifests, added = lake._write_bucket_shards(
            file_groups, {}, stats, ts, touched, prev_shards
        )
        return manifests, added, sum(
            len(lake.store.read(rel)) for rel in added
        )

    # first sharded commit: everything is new (the one-time migration)
    full_map, full_added, full_bytes = shard_bytes(set(range(32)), {})
    assert len(full_added) == 32

    # steady state: a narrow commit touching one bucket
    narrow_map, narrow_added, narrow_bytes = shard_bytes({3}, full_map)
    assert len(narrow_added) == 1
    # 31 of 32 shards carried forward BY REFERENCE (identical paths)
    assert sum(narrow_map[b] == full_map[b] for b in narrow_map) == 31
    # file-metadata bytes written ∝ touched fraction (1/32), with slack
    assert narrow_bytes < full_bytes / 16, (narrow_bytes, full_bytes)


def test_snapshot_manifest_contains_no_file_paths(tmp_path):
    """The snapshot file is a manifest LIST: O(buckets) shard pointers,
    zero per-file entries — so the per-commit pointer-file write stays
    constant-size as the table's file count grows without bound."""
    lake = LakeTable(str(tmp_path / "t"), key_col="url", num_buckets=32)
    file_groups, stats, ts = _synthetic_groups(n_files=10_240, n_buckets=32)
    manifests, added = lake._write_bucket_shards(
        file_groups, {}, stats, ts, set(range(32)), {}
    )
    # what commit() embeds in vN.json for the file level:
    snapshot_side = json.dumps({"bucket_manifests": manifests, "added_manifests": added})
    assert ".parquet" not in snapshot_side
    assert len(snapshot_side) < 10_000  # ~70 bytes/bucket, not ~100 bytes/file


# -- integration: a real narrow commit against a wide table ------------------


def _urls_in_bucket(bucket: int, num_buckets: int, n: int) -> list[str]:
    out, i = [], 0
    while len(out) < n:
        u = f"https://narrow.example.com/{i}"
        if _xxhash64_str(u) % num_buckets == bucket:
            out.append(u)
        i += 1
    return out


def test_real_narrow_commit_reuses_shards(spark, tmp_path):
    from datetime import datetime

    from data_migration_validation_spark.plans.apply import CDCApplyEngine

    SCHEMA = (
        "op string, url string, warc_ts timestamp, seq long, "
        "payload struct<html:binary,lang:string>, batch_epoch int"
    )
    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "t"),
        checkpoint_path=str(tmp_path / "c"),
        num_buckets=8,
        compact_every=None,
    )
    # epoch 0: keys across all buckets
    wide = spark.createDataFrame(
        [
            ("I", f"https://wide.example.com/{i}", datetime(2024, 1, 1), i,
             (b"<html><p>w</p></html>", "en"), 0)
            for i in range(200)
        ],
        SCHEMA,
    )
    eng.apply_epoch(wide, 0)
    m0 = eng.lake._manifest_raw(eng.lake.current_version())
    assert len(m0["bucket_manifests"]) == 8

    # epoch 1: keys confined to bucket 5 — exactly one new shard
    urls = _urls_in_bucket(5, 8, 10)
    narrow = spark.createDataFrame(
        [
            ("U", u, datetime(2024, 1, 2), 1000 + i, (b"<html><p>n</p></html>", "en"), 1)
            for i, u in enumerate(urls)
        ],
        SCHEMA,
    )
    st = eng.apply_epoch(narrow, 1)
    assert st.buckets_touched == 1
    m1 = eng.lake._manifest_raw(eng.lake.current_version())
    assert len(m1["added_manifests"]) == 1
    carried = [b for b in m1["bucket_manifests"] if b != "5"]
    assert all(m1["bucket_manifests"][b] == m0["bucket_manifests"][b] for b in carried)
    assert m1["bucket_manifests"]["5"] != m0["bucket_manifests"]["5"]
    # and the merged read still sees both epochs
    assert eng.read_final().count() == 210


def test_epoch_ranges_condense_and_roundtrip(tmp_path):
    """Applied epochs are stored as contiguous RANGES, not a flat list:
    the snapshot manifest must stay O(1) in history length — a flat list
    makes every commit's metadata grow with the table's entire epoch
    history (500k ints after a year of per-minute epochs)."""
    from data_migration_validation_spark.plans.lake import (
        _condense_ranges,
        _expand_ranges,
    )

    assert _condense_ranges([0, 1, 2, 3]) == [[0, 3]]
    assert _condense_ranges([5, 0, 1, 3, 2]) == [[0, 3], [5, 5]]
    assert _condense_ranges([]) == []
    big = list(range(100_000))
    assert _condense_ranges(big) == [[0, 99_999]]
    assert _expand_ranges([[0, 3], [5, 5]]) == [0, 1, 2, 3, 5]
    # the serialized form of 100k contiguous epochs is a dozen bytes
    import json

    assert len(json.dumps(_condense_ranges(big))) < 20


def test_origin_fold_carries_and_condenses(tmp_path):
    """Origin-tagged epochs fold forward like epoch_ranges: untagged and
    maintenance (epoch=None) commits carry the map unchanged, tagged
    commits extend their origin's condensed ranges, and the input dict
    is never mutated (manifests are immutable snapshots)."""
    from data_migration_validation_spark.plans.lake import _fold_origin

    assert _fold_origin(None, [0], {"applied_events": 3}) == {}
    assert _fold_origin(None, [7], {"origin": "redrive"}) == {"redrive": [[7, 7]]}
    prev = {"redrive": [[7, 7]]}
    out = _fold_origin(prev, [8], {"origin": "redrive"})
    assert out == {"redrive": [[7, 8]]}
    assert prev == {"redrive": [[7, 7]]}  # no aliasing back into prev
    # untagged and maintenance (empty epoch list) commits carry verbatim
    assert _fold_origin(prev, [9], {"applied_events": 1}) == prev
    assert _fold_origin(prev, [], {"origin": "redrive"}) == prev
    # a second origin gets its own ranges
    two = _fold_origin(prev, [100], {"origin": "backfill"})
    assert two == {"redrive": [[7, 7]], "backfill": [[100, 100]]}
    # a GROUP commit folds all of its epochs into one condensed run
    grp = _fold_origin(prev, [8, 9, 10], {"origin": "redrive"})
    assert grp == {"redrive": [[7, 10]]}
