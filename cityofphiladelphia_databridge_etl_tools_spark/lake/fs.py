"""Filesystem abstraction for the metadata layer.

The table's DATA path (parquet files) already goes through Spark's
Hadoop filesystems — any ``s3a://`` / ``gs://`` / ``abfss://`` root
works for the data reads and writes without this module. The METADATA
path (the append-only commit log) needs three primitives Spark does
not expose to the driver:

1. atomic create-if-absent — the CAS commit point (one winner per
   log position);
2. atomic replace — advisory hint files;
3. listing + stat — log recovery and orphan GC.

:class:`LocalFS` implements them with POSIX semantics (hard-link
create-exclusive, ``os.replace``). An object-store implementation maps
create-if-absent to a conditional PUT — S3 ``If-None-Match: *`` and
GCS ``x-goog-if-generation-match: 0`` are public, strongly-consistent
APIs — and replace to a plain PUT. Everything above this module is
store-agnostic.
"""

from __future__ import annotations

import os
import tempfile
import threading
import time


class FileSystem:
    """Driver-side metadata I/O. Paths are plain strings; the data
    plane (Spark reads/writes) never goes through this interface."""

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_text(self, path: str, text: str) -> None:
        """Atomic full replace (last writer wins) — hint files only."""
        raise NotImplementedError

    def create_exclusive(self, path: str, text: str) -> bool:
        """Atomically create ``path`` with ``text`` iff it does not
        exist. Returns False (writing nothing) when it already does —
        the optimistic-concurrency primitive."""
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        """Names in a directory; [] when the directory is absent."""
        raise NotImplementedError

    def walk_files(self, path: str) -> list[str]:
        """All file paths under a prefix; [] when absent."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def delete_dir_if_debris(self, path: str) -> bool:
        """Remove a directory that holds only writer debris
        (_SUCCESS / .crc markers). Object stores have no directories —
        their implementation is a no-op returning False."""
        return False

    def mtime(self, path: str) -> float:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError


class LocalFS(FileSystem):
    """POSIX implementation (also correct on NFS v4+ for link())."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, text: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(text)
        os.replace(tmp, path)

    def create_exclusive(self, path: str, text: str) -> bool:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(text)
        try:
            os.link(tmp, path)  # atomic create-exclusive (POSIX)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def listdir(self, path: str) -> list[str]:
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []

    def walk_files(self, path: str) -> list[str]:
        out = []
        for d, _sub, files in os.walk(path):
            out.extend(os.path.join(d, f) for f in files)
        return out

    def delete(self, path: str) -> None:
        os.unlink(path)

    def delete_dir_if_debris(self, path: str) -> bool:
        try:
            leftover = os.listdir(path)
        except (FileNotFoundError, NotADirectoryError):
            return False
        if all(f == "_SUCCESS" or f.endswith(".crc") for f in leftover):
            for f in leftover:
                os.unlink(os.path.join(path, f))
            os.rmdir(path)
            return True
        return False

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)


class InMemoryObjectStore(FileSystem):
    """Flat-namespace object store with CONDITIONAL-PUT semantics —
    the exact driver-visible contract of S3 (``PUT`` +
    ``If-None-Match: *``, strongly consistent since 2020) and GCS
    (``x-goog-if-generation-match: 0``). Paths are opaque keys; there
    are no directories (``makedirs`` is a no-op, ``listdir`` is a
    prefix scan, debris cleanup returns False).

    This is the proving double for the metadata seam: the whole
    MetaStore test suite runs against it unchanged, so a production
    S3/GCS implementation only has to map these six operations onto
    the store's HTTP API — no log/commit logic changes. It is also
    thread-safe, matching the multi-writer CAS contract the commit
    protocol relies on."""

    def __init__(self):
        self._objects: dict[str, str] = {}
        self._mtimes: dict[str, float] = {}
        self._lock = threading.Lock()

    def exists(self, path: str) -> bool:
        with self._lock:
            return path in self._objects

    def read_text(self, path: str) -> str:
        with self._lock:
            try:
                return self._objects[path]
            except KeyError:
                raise FileNotFoundError(path) from None

    def write_text(self, path: str, text: str) -> None:
        with self._lock:  # plain PUT: last writer wins
            self._objects[path] = text
            self._mtimes[path] = time.time()

    def create_exclusive(self, path: str, text: str) -> bool:
        with self._lock:  # PUT If-None-Match:* — one winner per key
            if path in self._objects:
                return False
            self._objects[path] = text
            self._mtimes[path] = time.time()
            return True

    def listdir(self, path: str) -> list[str]:
        prefix = path.rstrip("/") + "/"
        with self._lock:
            names = {
                k[len(prefix):].split("/", 1)[0]
                for k in self._objects
                if k.startswith(prefix)
            }
        return sorted(names)

    def walk_files(self, path: str) -> list[str]:
        prefix = path.rstrip("/") + "/"
        with self._lock:
            return sorted(k for k in self._objects if k.startswith(prefix))

    def delete(self, path: str) -> None:
        with self._lock:
            self._objects.pop(path, None)
            self._mtimes.pop(path, None)

    def mtime(self, path: str) -> float:
        with self._lock:
            try:
                return self._mtimes[path]
            except KeyError:
                raise FileNotFoundError(path) from None

    def makedirs(self, path: str) -> None:
        pass  # object stores have no directories
