"""Driver-side data-file IO behind one seam.

Spark's executors already reach data files through Hadoop's FileSystem,
so the distributed path is object-store-safe for free. But the DRIVER
also touches data files directly in three places — listing a commit
directory's written files, reading parquet footers for row counts, and
reading footer min/max bounds for manifest file-skipping — and those
calls previously hardcoded ``os``. They now route through a
:class:`DataFS` handle: the default is the local filesystem (what a
single box or a POSIX mount needs); an object-store deployment passes
``DataFS(pyarrow.fs.S3FileSystem(...))`` (or GCS/Azure — any
``pyarrow.fs.FileSystem``) and every footer read and listing goes
through it, because ``pyarrow.parquet.ParquetFile`` natively accepts a
``filesystem=``. No caller knows which backend it is talking to.

(The commit-METADATA path — pointer, manifests — has its own, stricter
seam in ``plans/commit_store.py``, because it needs conditional-write
atomicity that plain file IO cannot express.)
"""

from __future__ import annotations

import os


class DataFS:
    """Minimal driver-side filesystem facade: local ``os`` by default,
    any ``pyarrow.fs.FileSystem`` when provided."""

    def __init__(self, pafs=None):
        self.pafs = pafs

    def list_files(self, directory: str) -> list[str]:
        """Full paths of the plain files directly inside ``directory``
        (no recursion), [] if it does not exist."""
        if self.pafs is None:
            try:
                return sorted(
                    os.path.join(directory, fn)
                    for fn in os.listdir(directory)
                    if not os.path.isdir(os.path.join(directory, fn))
                )
            except FileNotFoundError:
                return []
        from pyarrow import fs as pafs_mod

        sel = pafs_mod.FileSelector(directory, recursive=False, allow_not_found=True)
        return sorted(
            info.path
            for info in self.pafs.get_file_info(sel)
            if info.type == pafs_mod.FileType.File
        )

    def list_dirs(self, directory: str) -> list[str]:
        """Full paths of the sub-directories of ``directory``."""
        if self.pafs is None:
            try:
                return sorted(
                    os.path.join(directory, fn)
                    for fn in os.listdir(directory)
                    if os.path.isdir(os.path.join(directory, fn))
                )
            except FileNotFoundError:
                return []
        from pyarrow import fs as pafs_mod

        sel = pafs_mod.FileSelector(directory, recursive=False, allow_not_found=True)
        return sorted(
            info.path
            for info in self.pafs.get_file_info(sel)
            if info.type == pafs_mod.FileType.Directory
        )

    def is_dir(self, path: str) -> bool:
        if self.pafs is None:
            return os.path.isdir(path)
        from pyarrow import fs as pafs_mod

        return self.pafs.get_file_info(path).type == pafs_mod.FileType.Directory

    def parquet_metadata(self, path: str):
        """Footer metadata only — row counts and column statistics; never
        reads data pages."""
        import pyarrow.parquet as pq

        if self.pafs is None:
            return pq.ParquetFile(path).metadata
        return pq.ParquetFile(path, filesystem=self.pafs).metadata

    # -- maintenance-side operations (expire/vacuum/reject) ---------------------

    def delete_file(self, path: str) -> bool:
        """Delete one file; missing is not an error. Returns whether a
        file was actually removed."""
        if self.pafs is None:
            try:
                os.unlink(path)
                return True
            except FileNotFoundError:
                return False
        from pyarrow import fs as pafs_mod

        if self.pafs.get_file_info(path).type == pafs_mod.FileType.NotFound:
            return False
        try:
            self.pafs.delete_file(path)
        except FileNotFoundError:
            # check-then-delete race: another maintenance pass got it
            # between get_file_info and here — same tolerance as the
            # local branch (concurrent vacuum/expire is supported)
            return False
        return True

    def remove_dir(self, path: str) -> None:
        """Recursively delete a directory tree; missing is not an error."""
        if self.pafs is None:
            import shutil

            shutil.rmtree(path, ignore_errors=True)
            return
        self.pafs.delete_dir_contents(path, missing_dir_ok=True)
        from pyarrow import fs as pafs_mod

        if self.pafs.get_file_info(path).type != pafs_mod.FileType.NotFound:
            self.pafs.delete_dir(path)

    def walk_files(self, directory: str) -> list[tuple[str, float]]:
        """All plain files under ``directory`` recursively, as
        (path, mtime-epoch-seconds) pairs; [] if it does not exist.

        A filesystem that does not report mtimes gets NOW, i.e. age 0:
        callers use age for min-age safety guards (vacuum's "don't
        delete what an in-flight commit just wrote"), and an unknown age
        must read as too YOUNG to touch — 0.0 would read as infinitely
        old and delete a live in-flight file."""
        if self.pafs is None:
            out: list[tuple[str, float]] = []
            for root, _dirs, files in os.walk(directory):
                for fn in files:
                    p = os.path.join(root, fn)
                    try:
                        out.append((p, os.stat(p).st_mtime))
                    except FileNotFoundError:
                        pass  # concurrent maintenance got it first
            return sorted(out)
        import time as _time

        from pyarrow import fs as pafs_mod

        now = _time.time()
        sel = pafs_mod.FileSelector(directory, recursive=True, allow_not_found=True)
        return sorted(
            (info.path, info.mtime.timestamp() if info.mtime else now)
            for info in self.pafs.get_file_info(sel)
            if info.type == pafs_mod.FileType.File
        )

    def mtime(self, path: str) -> float:
        """Modification time as epoch seconds. Unknown mtime returns NOW
        (age 0) — see :meth:`walk_files` for why unknown must mean too
        young, never infinitely old."""
        if self.pafs is None:
            return os.stat(path).st_mtime
        info = self.pafs.get_file_info(path)
        if info.mtime:
            return info.mtime.timestamp()
        import time as _time

        return _time.time()

    def prune_empty_dirs(self, directory: str) -> None:
        """Best-effort bottom-up removal of empty sub-directories. Only
        meaningful on real filesystems; object stores have no empty
        directories to prune, so the pyarrow path is a no-op (pyarrow's
        local filesystem is the exception and simply keeps its empties —
        harmless)."""
        if self.pafs is not None:
            return
        for root, dirs, files in os.walk(directory, topdown=False):
            if root != directory and not dirs and not files:
                try:
                    os.rmdir(root)
                except OSError:
                    pass


LOCAL = DataFS()
