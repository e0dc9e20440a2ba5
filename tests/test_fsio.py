"""Driver-side data-file IO seam: the lake's commit-dir listing and
footer reads must behave identically through the default local backend
and through a real ``pyarrow.fs.FileSystem`` — the swap an object-store
deployment makes. LocalFileSystem stands in for S3FileSystem here; the
code path exercised (FileSelector listings, filesystem-routed footer
reads) is the same."""

from __future__ import annotations

from datetime import datetime

from data_migration_validation_spark.fsio import DataFS
from data_migration_validation_spark.plans.apply import CDCApplyEngine

SCHEMA = (
    "op string, url string, warc_ts timestamp, seq long, "
    "payload struct<html:binary,lang:string>, batch_epoch int"
)


def _events(spark, epoch, n=25):
    rows = [
        (
            "I",
            f"https://fsio.example.com/{epoch}/{i}",
            datetime(2024, 1, 1 + epoch, i % 24),
            epoch * 100 + i,
            (b"<html><p>x</p></html>", "en"),
            epoch,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_lake_commit_through_pyarrow_filesystem(spark, tmp_path):
    import pyarrow.fs as pafs

    def build(name, data_fs):
        eng = CDCApplyEngine(
            spark,
            table_path=str(tmp_path / f"{name}-t"),
            checkpoint_path=str(tmp_path / f"{name}-c"),
            num_buckets=4,
            compact_every=None,
        )
        if data_fs is not None:
            eng.lake.data_fs = data_fs
        for e in range(2):
            eng.apply_epoch(_events(spark, e), e)
        return eng

    local = build("local", None)
    arrow = build("arrow", DataFS(pafs.LocalFileSystem()))

    s_local, s_arrow = local.lake.current_snapshot(), arrow.lake.current_snapshot()
    # identical metadata: same file counts, same recorded bounds coverage
    def n_files(s):
        return sum(
            len(fs)
            for g in (s.file_groups, s.delta_groups)
            for bb in g.values()
            for fs in bb.values()
        )

    assert n_files(s_arrow) == n_files(s_local) > 0
    assert len(s_arrow.file_stats) == len(s_local.file_stats) == n_files(s_local)
    assert len(s_arrow.ts_stats) == len(s_local.ts_stats)
    # bounds VALUES match too (canonical naive-UTC strings)
    assert sorted(s_arrow.ts_stats.values()) == sorted(s_local.ts_stats.values())
    assert arrow.read_final().count() == local.read_final().count() == 50


def test_parquet_rows_matches_across_backends(spark, tmp_path):
    import pyarrow.fs as pafs

    from data_migration_validation_spark.queries import _parquet_rows

    p = str(tmp_path / "rows")
    spark.range(1234).write.parquet(p)
    assert _parquet_rows(p) == 1234
    assert _parquet_rows(p, fs=DataFS(pafs.LocalFileSystem())) == 1234


def test_unknown_mtime_reads_as_young_not_ancient():
    """A filesystem that does not report mtimes must make files look
    BRAND NEW, not infinitely old: vacuum's min-age guard compares
    now - mtime, and an unknown age of 0.0 would read as ancient and
    delete a live in-flight commit's files."""
    import time

    import pyarrow.fs as pafs

    from data_migration_validation_spark.fsio import DataFS

    class NoMtimeFS:
        def get_file_info(self, sel):
            info = pafs.FileInfo(
                "bucket/t/part-0.parquet",
                type=pafs.FileType.File,
                mtime=None,
                size=3,
            )
            return [info] if isinstance(sel, pafs.FileSelector) else info

    fs = DataFS(NoMtimeFS())
    now = time.time()
    [(path, mt)] = fs.walk_files("bucket/t")
    assert path == "bucket/t/part-0.parquet"
    assert now - 5 <= mt <= now + 5, "unknown mtime must read as age ~0"
    mt2 = fs.mtime("bucket/t/part-0.parquet")
    assert now - 5 <= mt2 <= now + 5


def test_engine_refuses_nonlocal_data_fs_on_posix_only_surfaces(spark, tmp_path):
    """The quarantine/redrive surface and the novelty index still do
    driver-side POSIX IO; an engine handed a non-local data_fs must
    refuse those combinations loudly instead of silently reporting an
    empty dead-letter table (or an unindexed admit) on an object store."""
    import pytest
    from pyarrow import fs as pafs

    nonlocal_fs = DataFS(pafs.LocalFileSystem())  # any pafs counts as non-local
    kw = dict(
        table_path=str(tmp_path / "ofs-t"),
        checkpoint_path=str(tmp_path / "ofs-c"),
        num_buckets=4,
    )
    with pytest.raises(NotImplementedError, match="quarantine"):
        CDCApplyEngine(spark, data_fs=nonlocal_fs, **kw)
    with pytest.raises(NotImplementedError, match="novelty"):
        CDCApplyEngine(
            spark, data_fs=nonlocal_fs, quarantine=False,
            novelty_filter=True, **kw
        )
    # quarantine off + no novelty: allowed, and the lake adopts the fs
    eng = CDCApplyEngine(spark, data_fs=nonlocal_fs, quarantine=False, **kw)
    assert eng.lake.data_fs is nonlocal_fs
