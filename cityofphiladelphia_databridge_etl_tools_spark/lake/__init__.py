"""Minimal snapshot/commit-log lake format over Parquet.

No Iceberg/Delta jars ship in this sandbox, so the engine carries its
own Iceberg-shaped metadata layer: versioned JSON manifests listing
data files per key-bucket, an atomically-swapped CURRENT pointer, a
batch-id commit log for exactly-once idempotence, per-bucket LSN
watermarks, and a schema-version history. Swapping in real Iceberg
later is a sink change only — the merge dataflow is format-agnostic.

Semantics sources in the reference:
- atomic promote via temp table + single transaction
  (oracle/oracle.py:286-406, db2/db2.py:548-565)
- SCN watermark RUNNING→FINISHED resume cursor (db2/db2.py:596-655)
"""

from .manifest import (  # noqa: F401
    CommitRecord,
    ConcurrentCommitError,
    Manifest,
    SchemaVersion,
)
from .table import LakeTable  # noqa: F401
