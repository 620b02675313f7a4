"""Manifest + commit-log metadata for the parquet lake format.

Layout of a table directory::

    <root>/
      _meta/
        version-<n>.json     immutable snapshot manifest
        CURRENT              one-line pointer to the committed version,
                             swapped with os.replace (atomic on POSIX)
      data/
        bucket=<k>/snap<v>-*.parquet

A manifest is the full table state: schema history, per-bucket data
file lists, applied batch ids (the exactly-once log — reference
analogue: Oracle SCN watermark rows RUNNING→FINISHED,
db2/db2.py:596-655), per-bucket LSN watermarks, and lineage records.

Crash safety: data files and the new manifest are written first; the
commit IS the atomic CURRENT swap. A crash before the swap leaves
orphan files that no manifest references — replay of the same batch_id
re-merges from the old snapshot and reconverges (reference analogue:
rollback + drop-temp on failure, oracle/oracle.py:401-406).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field


@dataclass
class SchemaVersion:
    version: int
    schema_json: str  # StructType.json()
    added_at: float


@dataclass
class CommitRecord:
    """One committed microbatch — the lineage + exactly-once unit."""

    batch_id: str
    lsn_lo: int
    lsn_hi: int
    rows_in: int
    rows_deduped: int
    rows_upserted: int
    rows_deleted: int
    touched_buckets: list[int]
    committed_at: float
    # per-bucket rows written in this commit (lineage detail)
    bucket_rows: dict[str, int] = field(default_factory=dict)


@dataclass
class Manifest:
    version: int
    n_buckets: int
    key_columns: list[str]
    order_columns: list[str]  # LWW ordering, e.g. ["ts", "lsn"]
    schema_versions: list[SchemaVersion]
    # bucket id (as str, JSON keys are strings) -> list of relative file paths
    bucket_files: dict[str, list[str]]
    commits: list[CommitRecord]
    # bucket id -> max lsn applied (per-partition watermark)
    watermarks: dict[str, int]

    @property
    def current_schema_json(self) -> str:
        return self.schema_versions[-1].schema_json

    @property
    def applied_batch_ids(self) -> set[str]:
        return {c.batch_id for c in self.commits}

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=1)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        d = json.loads(s)
        d["schema_versions"] = [SchemaVersion(**v) for v in d["schema_versions"]]
        d["commits"] = [CommitRecord(**c) for c in d["commits"]]
        return Manifest(**d)


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first — reload the
    manifest and retry (optimistic concurrency; the lake analogue of
    the reference's transaction rollback, db2/db2.py:548-565, without
    its lock-killing)."""


class MetaStore:
    """Filesystem metadata store with atomic pointer swap."""

    def __init__(self, root: str):
        self.root = root
        self.meta_dir = os.path.join(root, "_meta")
        self.data_dir = os.path.join(root, "data")

    # -- paths -----------------------------------------------------------
    def version_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"version-{version:06d}.json")

    @property
    def current_path(self) -> str:
        return os.path.join(self.meta_dir, "CURRENT")

    def bucket_dir(self, bucket: int) -> str:
        return os.path.join(self.data_dir, f"bucket={bucket}")

    # -- io ---------------------------------------------------------------
    def exists(self) -> bool:
        return os.path.exists(self.current_path)

    def read_current(self) -> Manifest:
        with open(self.current_path) as f:
            version = int(f.read().strip())
        with open(self.version_path(version)) as f:
            return Manifest.from_json(f.read())

    def commit(self, manifest: Manifest) -> None:
        """Write manifest then atomically flip the CURRENT pointer.

        Optimistic concurrency: the manifest file is created with an
        atomic link (fails if the version already exists), so of two
        racing writers exactly one wins version N and the loser gets
        ConcurrentCommitError — its data files stay orphaned and its
        batch can be retried against the fresh manifest (version 0 is
        exempt: create() owns it)."""
        os.makedirs(self.meta_dir, exist_ok=True)
        vp = self.version_path(manifest.version)
        fd, tmp = tempfile.mkstemp(dir=self.meta_dir, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            f.write(manifest.to_json())
        try:
            os.link(tmp, vp)  # atomic create-exclusive (POSIX)
        except FileExistsError:
            os.unlink(tmp)
            raise ConcurrentCommitError(
                f"version {manifest.version} already committed by another "
                f"writer; reload the manifest and retry the batch"
            ) from None
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        fd, tmp = tempfile.mkstemp(dir=self.meta_dir, suffix=".cur.tmp")
        with os.fdopen(fd, "w") as f:
            f.write(str(manifest.version))
        os.replace(tmp, self.current_path)  # THE commit point

    @staticmethod
    def now() -> float:
        return time.time()
