"""LakeTable: bucketed parquet table with snapshot commits, exactly-once
batch log, LWW merge, schema evolution, and tombstoned deletes.

The merge dataflow (all Catalyst-planned, zero per-row Python):

    changes ──(coerce/evolve schema)──► batch
    batch ──window LWW dedup──► winners          (ref ago.py:1070-1078)
    winners ──distinct bucket ids──► touched      (bucket pruning: merge
                                                   cost is O(touched),
                                                   not O(table))
    read(touched buckets) ∪ winners ──window LWW──► merged
    merged ──repartition(bucket, salt)──► parquet snapshot files
    manifest+pointer flip                        (ref db2.py:548-565)

Scale behavior: buckets bound the unit of rewrite; hot conversations
are salted across writers inside a bucket; files are written sorted by
key so parquet min/max stats support row-group skipping on later point
reads; AQE handles residual shuffle skew.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.observation import Observation

from ..operators.merge import (
    DELETED_COL,
    bucket_expr,
    dedup_last_writer,
    merge_lww,
    salt_expr,
)
from .manifest import CommitRecord, Manifest, MetaStore, SchemaVersion
from .schema import coerce_to, evolve_schema

OP_COL = "op"


def _with_deleted(schema: T.StructType) -> T.StructType:
    return T.StructType(list(schema.fields) + [T.StructField(DELETED_COL, T.BooleanType(), True)])


class LakeTable:
    """One lake table = directory + manifest history. Single-writer."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.store = MetaStore(root)
        if not self.store.exists():
            raise FileNotFoundError(f"no lake table at {root} (use LakeTable.create)")

    # ------------------------------------------------------------------ DDL
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_columns: list[str],
        order_columns: list[str] = ("ts", "lsn"),
        n_buckets: int = 16,
    ) -> "LakeTable":
        for k in list(key_columns) + list(order_columns):
            if k not in schema.names:
                raise ValueError(f"key/order column {k!r} not in schema")
        store = MetaStore(root)
        if store.exists():
            raise FileExistsError(root)
        os.makedirs(store.data_dir, exist_ok=True)
        manifest = Manifest(
            version=0,
            n_buckets=n_buckets,
            key_columns=list(key_columns),
            order_columns=list(order_columns),
            schema_versions=[SchemaVersion(0, schema.json(), MetaStore.now())],
            bucket_files={},
            commits=[],
            watermarks={},
        )
        store.commit(manifest)
        return cls(spark, root)

    # ------------------------------------------------------------- metadata
    @property
    def manifest(self) -> Manifest:
        return self.store.read_current()

    def schema(self, manifest: Manifest | None = None) -> T.StructType:
        m = manifest or self.manifest
        return T.StructType.fromJson(__import__("json").loads(m.current_schema_json))

    def _schema_at(self, m: Manifest, version: int) -> T.StructType:
        sv = next(s for s in m.schema_versions if s.version == version)
        return T.StructType.fromJson(__import__("json").loads(sv.schema_json))

    def watermark(self, bucket: int) -> int:
        return self.manifest.watermarks.get(str(bucket), -1)

    # ----------------------------------------------------------------- read
    def read(
        self,
        buckets: list[int] | None = None,
        include_deleted: bool = False,
        manifest: Manifest | None = None,
    ) -> DataFrame:
        """Current snapshot as a DataFrame. ``buckets`` prunes the scan
        to the listed buckets' files only (the engine's partition
        pruning — the manifest is the index, no directory listing)."""
        m = manifest or self.manifest
        current = self.schema(m)
        stored_current = _with_deleted(current)

        wanted = {str(b) for b in buckets} if buckets is not None else None
        by_version: dict[int, list[str]] = {}
        for b, entries in m.bucket_files.items():
            if wanted is not None and b not in wanted:
                continue
            for relpath, sv in entries:
                by_version.setdefault(sv, []).append(os.path.join(self.store.root, relpath))

        if not by_version:
            df = self.spark.createDataFrame([], stored_current)
        else:
            parts = []
            for sv, paths in sorted(by_version.items()):
                # read each file group with the exact schema it was
                # written under, then coerce — deterministic add-column
                # (null-fill) and widening (cast) with no reliance on
                # reader-side type promotion.
                stored = _with_deleted(self._schema_at(m, sv))
                part = self.spark.read.schema(stored).parquet(*paths)
                parts.append(coerce_to(part, stored_current))
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        if include_deleted:
            return df
        return df.filter(~F.col(DELETED_COL)).drop(DELETED_COL)

    # ---------------------------------------------------------------- merge
    def merge_batch(
        self,
        changes: DataFrame,
        batch_id: str,
        n_salt: int = 4,
    ) -> CommitRecord | None:
        """Apply one CDC microbatch exactly-once.

        ``changes`` columns: the table payload columns (any compatible
        subset/superset — schema evolves) plus ``op`` in {I,U,D}. Rows
        with op=D need only key + order columns populated.

        Returns the CommitRecord, or None when ``batch_id`` was already
        committed (idempotent replay — ref db2/db2.py:596-655 SCN
        watermark semantics).
        """
        m = self.manifest
        if batch_id in m.applied_batch_ids:
            return None
        if OP_COL not in changes.columns:
            raise ValueError("changes must carry an 'op' column (I/U/D)")
        keys, order_cols = m.key_columns, m.order_columns

        # -- schema evolution on the incoming payload shape
        payload_schema = T.StructType([f for f in changes.schema.fields if f.name != OP_COL])
        current = self.schema(m)
        new_schema = evolve_schema(current, payload_schema)
        schema_versions = list(m.schema_versions)
        if new_schema.json() != current.json():
            schema_versions.append(
                SchemaVersion(len(schema_versions), new_schema.json(), MetaStore.now())
            )
            current = new_schema
        current_version = schema_versions[-1].version
        stored_schema = _with_deleted(current)

        # -- stage: mark deletes, coerce to table schema, intra-batch LWW
        obs_in = Observation("rows_in")
        staged = changes.observe(
            obs_in,
            F.count(F.lit(1)).alias("n"),
            F.min("lsn").alias("lsn_lo"),
            F.max("lsn").alias("lsn_hi"),
        )
        staged = coerce_to(
            staged.withColumn(DELETED_COL, F.col(OP_COL) == F.lit("D")).drop(OP_COL),
            stored_schema,
        )
        obs_dedup = Observation("rows_deduped")
        winners = dedup_last_writer(staged, keys, order_cols).observe(
            obs_dedup,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(DELETED_COL).cast("long")).alias("deletes"),
        )
        winners = winners.withColumn("_bucket", bucket_expr(keys[0], m.n_buckets))
        # The deduped batch feeds two jobs (touched-bucket probe + the
        # merge write) — persist so staging/dedup runs once.
        winners = winners.persist()

        # Bucket pruning: tiny driver-side collect of distinct bucket
        # ids (≤ n_buckets ints) decides which target files participate.
        touched = sorted(
            r["_bucket"] for r in winners.select("_bucket").distinct().collect()
        )
        if not touched:  # empty batch still commits (advances the log)
            winners.unpersist()
            return self._commit_empty(m, batch_id, schema_versions)

        # target rows are coerced to the (possibly just-evolved) schema
        # BEFORE the merge so new columns survive the union.
        target = coerce_to(
            self.read(buckets=touched, include_deleted=True, manifest=m), stored_schema
        ).withColumn("_bucket", bucket_expr(keys[0], m.n_buckets))
        merged = merge_lww(target, winners, keys, order_cols)

        # -- write new snapshot files for the touched buckets.
        # repartition by (bucket, salt): a hot conv_id spreads over
        # n_salt tasks; partitionBy(_bucket) keeps the layout per-bucket.
        snap_rel = f"data/snap-{m.version + 1:06d}-{uuid.uuid4().hex[:8]}"
        snap_dir = os.path.join(self.store.root, snap_rel)
        out = (
            merged.withColumn("_salt", salt_expr(n_salt, *keys))
            .repartition(F.col("_bucket"), F.col("_salt"))
            .drop("_salt")
            .sortWithinPartitions(*keys)
        )
        out.write.partitionBy("_bucket").parquet(snap_dir, mode="errorifexists")
        winners.unpersist()

        new_files, bucket_rows = self._scan_snapshot(snap_dir, snap_rel, current_version)

        # -- assemble + atomically commit the new manifest
        bucket_files = dict(m.bucket_files)
        for b in touched:
            bucket_files[str(b)] = new_files.get(str(b), [])
        watermarks = dict(m.watermarks)
        in_metrics, dd = obs_in.get, obs_dedup.get
        for b in touched:
            watermarks[str(b)] = max(watermarks.get(str(b), -1), int(in_metrics["lsn_hi"]))
        rec = CommitRecord(
            batch_id=batch_id,
            lsn_lo=int(in_metrics["lsn_lo"]),
            lsn_hi=int(in_metrics["lsn_hi"]),
            rows_in=int(in_metrics["n"]),
            rows_deduped=int(dd["n"]),
            rows_upserted=int(dd["n"]) - int(dd["deletes"] or 0),
            rows_deleted=int(dd["deletes"] or 0),
            touched_buckets=[int(b) for b in touched],
            committed_at=MetaStore.now(),
            bucket_rows={b: bucket_rows[b] for b in map(str, touched) if b in bucket_rows},
        )
        self.store.commit(
            Manifest(
                version=m.version + 1,
                n_buckets=m.n_buckets,
                key_columns=keys,
                order_columns=order_cols,
                schema_versions=schema_versions,
                bucket_files=bucket_files,
                commits=list(m.commits) + [rec],
                watermarks=watermarks,
            )
        )
        return rec

    def _commit_empty(
        self, m: Manifest, batch_id: str, schema_versions: list[SchemaVersion]
    ) -> CommitRecord:
        rec = CommitRecord(batch_id, -1, -1, 0, 0, 0, 0, [], MetaStore.now())
        self.store.commit(
            Manifest(
                m.version + 1, m.n_buckets, m.key_columns, m.order_columns,
                schema_versions, dict(m.bucket_files), list(m.commits) + [rec],
                dict(m.watermarks),
            )
        )
        return rec

    def _scan_snapshot(
        self, snap_dir: str, snap_rel: str, schema_version: int
    ) -> tuple[dict[str, list], dict[str, int]]:
        """List written files per bucket; row counts from parquet
        footers (driver-side metadata read — no extra Spark job)."""
        import pyarrow.parquet as pq

        files: dict[str, list] = {}
        rows: dict[str, int] = {}
        for entry in os.listdir(snap_dir):
            if not entry.startswith("_bucket="):
                continue
            b = entry.split("=", 1)[1]
            bdir = os.path.join(snap_dir, entry)
            for fn in sorted(os.listdir(bdir)):
                if not fn.endswith(".parquet"):
                    continue
                files.setdefault(b, []).append([f"{snap_rel}/{entry}/{fn}", schema_version])
                rows[b] = rows.get(b, 0) + pq.ParquetFile(os.path.join(bdir, fn)).metadata.num_rows
        return files, rows

    # ----------------------------------------------------------- utilities
    def overwrite_full(self, df: DataFrame, batch_id: str) -> CommitRecord | None:
        """Full refresh: replace all table content in one snapshot flip
        (ref: truncate-then-load, postgres/postgres.py:421-448; Carto
        replace-and-swap, carto_.py:471-490). Implemented as: tombstone
        every existing key not in df, upsert df — all in one commit."""
        m = self.manifest
        if batch_id in m.applied_batch_ids:
            return None
        keys = m.key_columns
        current = self.schema(m)
        new_schema = evolve_schema(current, df.schema)
        schema_versions = list(m.schema_versions)
        if new_schema.json() != current.json():
            schema_versions.append(
                SchemaVersion(len(schema_versions), new_schema.json(), MetaStore.now())
            )
            current = new_schema
        current_version = schema_versions[-1].version
        stored_schema = _with_deleted(current)

        obs = Observation("refresh")
        staged = df.observe(
            obs, F.count(F.lit(1)).alias("n"),
            F.min("lsn").alias("lsn_lo"), F.max("lsn").alias("lsn_hi"),
        )
        # intra-refresh dedup still applies (one row per key)
        staged = dedup_last_writer(
            coerce_to(staged.withColumn(DELETED_COL, F.lit(False)), stored_schema),
            keys, m.order_columns,
        )
        snap_rel = f"data/refresh-{m.version + 1:06d}-{uuid.uuid4().hex[:8]}"
        snap_dir = os.path.join(self.store.root, snap_rel)
        (
            staged.withColumn("_bucket", bucket_expr(keys[0], m.n_buckets))
            .repartition(F.col("_bucket"))
            .sortWithinPartitions(*keys)
            .write.partitionBy("_bucket")
            .parquet(snap_dir, mode="errorifexists")
        )
        new_files, bucket_rows = self._scan_snapshot(snap_dir, snap_rel, current_version)
        met = obs.get
        rec = CommitRecord(
            batch_id=batch_id,
            lsn_lo=int(met["lsn_lo"]), lsn_hi=int(met["lsn_hi"]),
            rows_in=int(met["n"]), rows_deduped=sum(bucket_rows.values()),
            rows_upserted=sum(bucket_rows.values()), rows_deleted=0,
            touched_buckets=sorted(int(b) for b in new_files),
            committed_at=MetaStore.now(), bucket_rows=bucket_rows,
        )
        # full replace: new files are the ONLY files — old snapshot
        # becomes unreferenced in one pointer flip (ref: rename-swap
        # prod⇄temp in one txn, carto_.py:422-436)
        self.store.commit(
            Manifest(
                m.version + 1, m.n_buckets, keys, m.order_columns,
                schema_versions, new_files, list(m.commits) + [rec],
                {b: int(met["lsn_hi"]) for b in new_files},
            )
        )
        return rec

    def compact(self, gc_tombstones_below_lsn: int | None = None) -> None:
        """Rewrite all buckets into fresh files, dropping tombstones
        whose lsn is below the horizon (default: all — callers that
        expect very late out-of-order events should pass a horizon).
        The engine's VACUUM analogue (ref: _cleanup.py:5-15)."""
        m = self.manifest
        df = self.read(include_deleted=True, manifest=m)
        horizon = gc_tombstones_below_lsn
        if horizon is None:
            df = df.filter(~F.col(DELETED_COL))
        else:
            df = df.filter((~F.col(DELETED_COL)) | (F.col("lsn") >= F.lit(horizon)))
        keys = m.key_columns
        snap_rel = f"data/compact-{m.version + 1:06d}-{uuid.uuid4().hex[:8]}"
        snap_dir = os.path.join(self.store.root, snap_rel)
        (
            df.withColumn("_bucket", bucket_expr(keys[0], m.n_buckets))
            .repartition(F.col("_bucket"))
            .sortWithinPartitions(*keys)
            .write.partitionBy("_bucket")
            .parquet(snap_dir, mode="errorifexists")
        )
        current_version = m.schema_versions[-1].version
        new_files, _ = self._scan_snapshot(snap_dir, snap_rel, current_version)
        self.store.commit(
            Manifest(
                m.version + 1, m.n_buckets, m.key_columns, m.order_columns,
                list(m.schema_versions), new_files, list(m.commits),
                dict(m.watermarks),
            )
        )
