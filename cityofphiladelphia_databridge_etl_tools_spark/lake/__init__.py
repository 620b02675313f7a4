"""Minimal snapshot/commit-log lake format over Parquet.

No Iceberg/Delta jars ship in this sandbox, so the engine carries its
own Iceberg-shaped metadata layer: an append-only commit log of
O(batch) delta records (CAS-created — the commit point), periodic
full-state snapshots, a batch-id set for exactly-once idempotence,
per-bucket LSN watermarks, and a schema-version history. Per-commit
metadata cost is flat in table age; all metadata I/O goes through a
FileSystem interface (POSIX here; conditional-PUT on object stores).
Swapping in real Iceberg later is a sink change only — the merge
dataflow is format-agnostic.

Semantics sources in the reference:
- atomic promote via temp table + single transaction
  (oracle/oracle.py:286-406, db2/db2.py:548-565)
- SCN watermark RUNNING→FINISHED resume cursor (db2/db2.py:596-655)
"""

from .fs import FileSystem, InMemoryObjectStore, LocalFS  # noqa: F401
from .manifest import (  # noqa: F401
    CommitRecord,
    ConcurrentCommitError,
    LogDelta,
    Manifest,
    MetaStore,
    SchemaVersion,
)
from .maintenance import CompactionScheduler  # noqa: F401
from .table import LakeTable  # noqa: F401
