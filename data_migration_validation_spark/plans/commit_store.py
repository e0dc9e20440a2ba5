"""Commit-protocol storage primitives behind one interface.

A snapshot-commit protocol needs exactly three storage guarantees — the
same three Iceberg delegates to its *catalog* layer:

1. **durable read/write/list/delete of small immutable metadata objects**
   (manifests, per-bucket manifest shards);
2. **exclusive create** — claim a name iff it does not exist yet (two
   concurrent commits may compute the same next version number; exactly
   one may own the manifest for it);
3. **pointer compare-and-swap** — publish a version by flipping the
   CURRENT pointer iff it still holds the expected parent (the
   optimistic-concurrency rule: a stale writer must lose loudly, never
   silently clobber the winner's commit).

:class:`LakeTable` speaks ONLY this interface for its metadata path, so
its exactly-once and lost-update guarantees are properties of the chosen
store, stated per store:

* :class:`PosixCommitStore` — local/NFS-free POSIX filesystems:
  write-temp-then-``os.rename`` (atomic publish), ``os.link``
  (test-and-set create), ``fcntl.flock`` on a permanent lock file for the
  pointer CAS (the kernel releases a crashed holder's lock — no staleness
  TTL, no lock-breaking TOCTOU).
* :class:`ConditionalPutCommitStore` — object stores. Rename is not
  atomic there and hard links do not exist, so the primitives are built
  on **conditional writes** instead, which S3 (``If-None-Match: *`` /
  ``If-Match: <etag>``), GCS (generation preconditions:
  ``ifGenerationMatch``) and ABFS (ETag preconditions) all provide:
  exclusive create = put-if-absent; pointer CAS = read-with-etag →
  compare content → put-if-match. No lock object exists at all — a lost
  CAS is detected by the failed precondition, exactly Iceberg's
  REST-catalog / DynamoDB-lock-free strategy. The store talks to a tiny
  :class:`BlobApi` (get/put/put-if-absent/put-if-match/list/delete);
  :class:`LocalBlobApi` emulates those semantics on a local directory for
  tests, so the whole concurrency suite runs against the object-store
  protocol with NO rename/link/flock anywhere in the code path.

Data files are NOT routed through this interface: Spark writes them via
its Hadoop FileSystem, and they are immutable once a manifest names them
— object stores handle immutable blob writes natively. Only the mutable
metadata path (pointer, version claims) needs these primitives.
"""

from __future__ import annotations

import os
import tempfile
import threading
import uuid
from abc import ABC, abstractmethod


class CommitStore(ABC):
    """Metadata storage primitives for the lake's commit protocol.

    Names are relative paths (``CURRENT``, ``v12.json``,
    ``manifests/b3-<uuid>.json``); content is text (JSON or a bare
    version number)."""

    @abstractmethod
    def read(self, name: str) -> str | None:
        """Content of ``name``, or None if absent."""

    @abstractmethod
    def write(self, name: str, content: str) -> None:
        """Durable last-writer-wins write. Used only for objects whose
        names are unique-per-writer (uuid-suffixed shards), where
        overwrite races cannot occur."""

    @abstractmethod
    def write_exclusive(self, name: str, content: str) -> bool:
        """Create ``name`` iff it does not exist. False if another writer
        claimed it first."""

    @abstractmethod
    def cas(self, name: str, expected: str | None, new: str) -> bool:
        """Atomically set ``name`` to ``new`` iff its current content is
        ``expected`` (None = must not exist). False on mismatch — the
        caller lost a publish race."""

    @abstractmethod
    def list(self, prefix: str = "") -> list[str]:
        """All object names under ``prefix`` (relative, recursive)."""

    @abstractmethod
    def delete(self, name: str) -> None:
        """Remove ``name``; absent is not an error (maintenance ops may
        race each other)."""

    def exists(self, name: str) -> bool:
        return self.read(name) is not None

    def mtime(self, name: str) -> float | None:
        """Last-modified epoch seconds, or None if absent/unknown (object
        stores expose LastModified; callers treat None as "too young to
        reclaim" — the conservative direction for orphan sweeps)."""
        return None


# ---------------------------------------------------------------------------
# POSIX implementation


def atomic_write(path: str, content: str) -> None:
    """Write-temp-fsync-rename: readers see the old or the new content,
    never a torn write. Atomic on POSIX rename semantics ONLY — this
    helper must not be pointed at an object-store mount."""
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def exclusive_write(path: str, content: str) -> bool:
    """Atomically create ``path`` with ``content`` iff it does not exist
    (``os.link`` fails on an existing target — the POSIX test-and-set).
    Returns False if another writer claimed the path first."""
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


class PosixCommitStore(CommitStore):
    """Local-filesystem commit store: rename / link / flock."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _p(self, name: str) -> str:
        p = os.path.join(self.root, name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return p

    def read(self, name: str) -> str | None:
        try:
            with open(os.path.join(self.root, name)) as f:
                return f.read()
        except FileNotFoundError:
            return None

    def write(self, name: str, content: str) -> None:
        atomic_write(self._p(name), content)

    def write_exclusive(self, name: str, content: str) -> bool:
        return exclusive_write(self._p(name), content)

    def cas(self, name: str, expected: str | None, new: str) -> bool:
        """Read-compare-write under ``flock`` on a PERMANENT sidecar lock
        file. The kernel drops a crashed holder's lock, so there is no
        staleness TTL and no lock-breaking step (a break-by-unlink scheme
        has an inherent TOCTOU: two breakers can both judge the lock
        stale and the slower unlink removes the faster breaker's fresh
        lock). flock excludes across processes and across separate
        ``open()`` descriptions within one process."""
        import fcntl
        import time as _time

        fd = os.open(self._p(name + ".lock"), os.O_CREAT | os.O_RDWR, 0o644)
        try:
            deadline = _time.monotonic() + 30.0
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except (BlockingIOError, InterruptedError):
                    if _time.monotonic() > deadline:
                        raise TimeoutError(f"lock for {name} held too long")
                    _time.sleep(0.02)
            cur = self.read(name)
            if cur is not None:
                cur = cur.strip()
            if cur != expected:
                return False
            atomic_write(self._p(name), new)
            return True
        finally:
            os.close(fd)  # releases the flock

    def list(self, prefix: str = "") -> list[str]:
        base = os.path.join(self.root, prefix) if prefix else self.root
        out: list[str] = []
        for dirpath, _dirs, files in os.walk(base):
            for fn in files:
                if fn.endswith(".lock") or fn.startswith(".tmp-"):
                    continue
                out.append(os.path.relpath(os.path.join(dirpath, fn), self.root))
        return sorted(out)

    def delete(self, name: str) -> None:
        try:
            os.unlink(os.path.join(self.root, name))
        except FileNotFoundError:
            pass

    def mtime(self, name: str) -> float | None:
        try:
            return os.stat(os.path.join(self.root, name)).st_mtime
        except FileNotFoundError:
            return None


# ---------------------------------------------------------------------------
# Object-store implementation (conditional writes)


class BlobApi(ABC):
    """The minimal conditional-write surface modern object stores expose:
    S3 ``If-None-Match: *`` / ``If-Match``, GCS ``ifGenerationMatch``,
    ABFS ETag preconditions. A production deployment implements this with
    boto3/gcsfs; :class:`LocalBlobApi` emulates the SEMANTICS locally so
    the commit protocol is testable without cloud credentials."""

    @abstractmethod
    def get(self, key: str) -> tuple[str, str] | None:
        """(content, etag) or None."""

    @abstractmethod
    def put(self, key: str, content: str) -> str:
        """Unconditional put; returns the new etag."""

    @abstractmethod
    def put_if_absent(self, key: str, content: str) -> bool:
        """PUT with If-None-Match:* — succeeds iff key does not exist."""

    @abstractmethod
    def put_if_match(self, key: str, content: str, etag: str) -> bool:
        """PUT with If-Match — succeeds iff the key's etag is unchanged."""

    @abstractmethod
    def list(self, prefix: str = "") -> list[str]: ...

    @abstractmethod
    def delete(self, key: str) -> None: ...


# one mutex per emulated bucket root: separate LakeTable handles on the
# same path (the concurrency tests' two-writers scenario) must share it
_LOCAL_LOCKS: dict[str, threading.Lock] = {}
_LOCAL_LOCKS_GUARD = threading.Lock()


class LocalBlobApi(BlobApi):
    """Directory-backed emulation of conditional-write blob semantics —
    a TEST DOUBLE: every operation is linearized by a per-root in-process
    mutex (the real store's server provides that atomicity), so it is
    thread-safe within one process, which is what the concurrency suite
    exercises. Etags are uuids written next to the object under
    ``.etags/``. No rename/link/flock is part of the *protocol* — the
    mutex exists only because a plain directory has no conditional PUT."""

    def __init__(self, root: str):
        self.root = os.path.realpath(root)
        os.makedirs(os.path.join(self.root, "objects"), exist_ok=True)
        os.makedirs(os.path.join(self.root, ".etags"), exist_ok=True)
        with _LOCAL_LOCKS_GUARD:
            self._lock = _LOCAL_LOCKS.setdefault(self.root, threading.Lock())

    def _obj(self, key: str) -> str:
        p = os.path.join(self.root, "objects", key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return p

    def _etag_path(self, key: str) -> str:
        p = os.path.join(self.root, ".etags", key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return p

    def get(self, key: str) -> tuple[str, str] | None:
        with self._lock:
            try:
                with open(self._obj(key)) as f:
                    content = f.read()
            except FileNotFoundError:
                return None
            try:
                with open(self._etag_path(key)) as f:
                    etag = f.read()
            except FileNotFoundError:
                etag = ""
            return content, etag

    def _put_locked(self, key: str, content: str) -> str:
        etag = uuid.uuid4().hex
        with open(self._obj(key), "w") as f:
            f.write(content)
        with open(self._etag_path(key), "w") as f:
            f.write(etag)
        return etag

    def put(self, key: str, content: str) -> str:
        with self._lock:
            return self._put_locked(key, content)

    def put_if_absent(self, key: str, content: str) -> bool:
        with self._lock:
            if os.path.exists(self._obj(key)):
                return False
            self._put_locked(key, content)
            return True

    def put_if_match(self, key: str, content: str, etag: str) -> bool:
        with self._lock:
            try:
                with open(self._etag_path(key)) as f:
                    cur = f.read()
            except FileNotFoundError:
                return False
            if cur != etag:
                return False
            self._put_locked(key, content)
            return True

    def list(self, prefix: str = "") -> list[str]:
        base = os.path.join(self.root, "objects")
        start = os.path.join(base, prefix) if prefix else base
        out: list[str] = []
        with self._lock:
            for dirpath, _dirs, files in os.walk(start):
                for fn in files:
                    out.append(os.path.relpath(os.path.join(dirpath, fn), base))
        return sorted(out)

    def delete(self, key: str) -> None:
        with self._lock:
            for p in (self._obj(key), self._etag_path(key)):
                try:
                    os.unlink(p)
                except FileNotFoundError:
                    pass

    def mtime(self, key: str) -> float | None:
        try:
            return os.stat(self._obj(key)).st_mtime
        except FileNotFoundError:
            return None


class ConditionalPutCommitStore(CommitStore):
    """Commit primitives on conditional writes alone — the object-store
    commit protocol. Exclusive create is put-if-absent; the pointer CAS
    is read-with-etag → compare expected content → put-if-match. A lost
    race surfaces as a failed precondition; there is no lock to hold, so
    there is nothing to go stale and nothing to break."""

    def __init__(self, blob: BlobApi):
        self.blob = blob

    def read(self, name: str) -> str | None:
        got = self.blob.get(name)
        return None if got is None else got[0]

    def write(self, name: str, content: str) -> None:
        self.blob.put(name, content)

    def write_exclusive(self, name: str, content: str) -> bool:
        return self.blob.put_if_absent(name, content)

    def cas(self, name: str, expected: str | None, new: str) -> bool:
        got = self.blob.get(name)
        if got is None:
            if expected is not None:
                return False
            return self.blob.put_if_absent(name, new)
        content, etag = got
        if content.strip() != expected:
            return False
        # precondition failure == another writer moved the pointer after
        # our read: by definition its content no longer equals `expected`
        # (every publish writes a new, distinct version number), so this
        # is a real conflict, not a retryable blip
        return self.blob.put_if_match(name, new, etag)

    def list(self, prefix: str = "") -> list[str]:
        return self.blob.list(prefix)

    def delete(self, name: str) -> None:
        self.blob.delete(name)

    def mtime(self, name: str) -> float | None:
        m = getattr(self.blob, "mtime", None)
        return m(name) if m else None
