"""LakeTable: bucketed parquet table with snapshot commits, exactly-once
batch log, LWW merge, schema evolution, and tombstoned deletes.

Two merge strategies (both Catalyst-planned, zero per-row Python):

copy-on-write (mode="cow") — read touched buckets, union the batch,
one LWW window, rewrite those buckets. Read-optimal; write cost is
O(touched table data) per batch.

merge-on-read (mode="mor") — LWW-dedup the batch alone (small window)
and append it as *delta* files to the touched buckets; readers resolve
base ∪ deltas with the same LWW window; bucket-scoped compaction folds
deltas back into base when a bucket accumulates too many. Write cost
is O(batch) — this is what sustains 10^10-event ingest, and mirrors
Iceberg/Hudi MOR. Correctness is identical because key→bucket is a
pure function: every version of a key lands in one bucket, so the
read-side window sees all of them.

The merge dataflow:

    changes ──(coerce/evolve schema)──► staged
    staged ──distinct bucket ids──► touched    (bucket pruning: O(touched))
    cow: read(touched) ∪ staged ──LWW window──► rewrite buckets
    mor: staged ──LWW window (batch only)──► append delta files
    manifest+pointer flip                      (ref db2.py:548-565)

Scale behavior: buckets bound the unit of rewrite; hot conversations
are salted across writers inside a bucket; files are written sorted by
key so parquet min/max stats support row-group skipping; AQE handles
residual shuffle skew.
"""

from __future__ import annotations

import json
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
    dedup_last_writer_colocated,
    salt_expr,
)
from .manifest import CommitRecord, Manifest, MetaStore, SchemaVersion
from .schema import coerce_to, evolve_schema

OP_COL = "op"
BASE, DELTA = "base", "delta"


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
        return T.StructType.fromJson(json.loads(m.current_schema_json))

    def _schema_at(self, m: Manifest, version: int) -> T.StructType:
        sv = next(s for s in m.schema_versions if s.version == version)
        return T.StructType.fromJson(json.loads(sv.schema_json))

    def watermark(self, bucket: int) -> int:
        return self.manifest.watermarks.get(str(bucket), -1)

    # ----------------------------------------------------------------- read
    def read(
        self,
        buckets: list[int] | None = None,
        include_deleted: bool = False,
        manifest: Manifest | None = None,
    ) -> DataFrame:
        """Current table state. ``buckets`` prunes the scan to those
        buckets' files via the manifest index (no directory listing —
        the engine's partition pruning). If any selected bucket has
        delta files, base ∪ deltas is LWW-resolved here (merge-on-read);
        tables with only base files skip the window entirely."""
        m = manifest or self.manifest
        current = self.schema(m)
        stored_current = _with_deleted(current)

        wanted = {str(b) for b in buckets} if buckets is not None else None
        # split buckets into delta-bearing (need LWW resolve) and
        # base-only (stream straight through, no window): after
        # compaction most buckets are base-only, so the resolve cost
        # tracks the UNCOMPACTED fraction, not the table size.
        resolve_groups: dict[int, list[str]] = {}
        plain_groups: dict[int, list[str]] = {}
        for b, entries in m.bucket_files.items():
            if wanted is not None and b not in wanted:
                continue
            bucket_has_delta = any(e[2] == DELTA for e in entries)
            target = resolve_groups if bucket_has_delta else plain_groups
            for e in entries:  # [relpath, schema_version, tier, (min_key, max_key)]
                target.setdefault(e[1], []).append(os.path.join(self.store.root, e[0]))

        def read_groups(groups):
            parts = []
            for sv, paths in sorted(groups.items()):
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
            return df

        if not resolve_groups and not plain_groups:
            df = self.spark.createDataFrame([], stored_current)
        elif not resolve_groups:
            df = read_groups(plain_groups)
        else:
            df = dedup_last_writer(
                read_groups(resolve_groups), m.key_columns, m.order_columns
            )
            if plain_groups:
                df = df.unionByName(read_groups(plain_groups))
        if include_deleted:
            return df
        return df.filter(~F.col(DELETED_COL)).drop(DELETED_COL)

    # ---------------------------------------------------------------- merge
    def merge_batch(
        self,
        changes: DataFrame,
        batch_id: str,
        n_salt: int = 4,
        mode: str = "mor",
        compact_threshold: int = 16,
        on_bad_rows: str = "fail",
    ) -> CommitRecord | None:
        """Apply one CDC microbatch exactly-once.

        ``changes`` columns: the table payload columns (any compatible
        subset/superset — schema evolves) plus ``op`` in {I,U,D}. Rows
        with op=D need only key + order columns populated.

        Returns the CommitRecord, or None when ``batch_id`` was already
        committed (idempotent replay — ref db2/db2.py:596-655 SCN
        watermark semantics). mode="mor" appends LWW-deduped delta
        files (O(batch) write) and compacts any bucket whose delta
        count exceeds ``compact_threshold``; mode="cow" rewrites the
        touched buckets fully.
        """
        if mode not in ("cow", "mor"):
            raise ValueError(f"unknown merge mode {mode!r}")
        if on_bad_rows not in ("fail", "dead_letter"):
            raise ValueError(f"unknown on_bad_rows policy {on_bad_rows!r}")
        m = self.manifest
        if batch_id in m.applied_batch_ids:
            return None
        if OP_COL not in changes.columns:
            raise ValueError("changes must carry an 'op' column (I/U/D)")
        keys, order_cols = m.key_columns, m.order_columns

        # bad rows: unknown op, or null key/order columns. They are
        # filtered in-plan and COUNTED by the same observation that
        # rides the main write job (zero extra jobs on the happy path);
        # if any existed, we either abort BEFORE the commit point
        # (files orphan, replay reconverges) or dead-letter them with
        # one extra job (ref: AGO error-row sink, ago/ago.py:319-344 —
        # the pipeline continues).
        # null ORDER columns are legal (desc_nulls_last: they just lose
        # ties); only unknown ops and null KEYS are malformed.
        bad_cond = ~F.col(OP_COL).isin("I", "U", "D")
        for c in keys:
            bad_cond = bad_cond | F.col(c).isNull()
        raw_changes = changes
        changes = changes.withColumn("_bad", bad_cond)

        # -- schema evolution on the incoming payload shape
        payload_schema = T.StructType(
            [f for f in changes.schema.fields if f.name not in (OP_COL, "_bad")]
        )
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

        # -- stage: mark deletes, coerce to table schema
        obs_in = Observation()
        staged = changes.observe(
            obs_in,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_bad").cast("long")).alias("n_bad"),
            F.min(F.when(~F.col("_bad"), F.col("lsn"))).alias("lsn_lo"),
            F.max(F.when(~F.col("_bad"), F.col("lsn"))).alias("lsn_hi"),
        ).filter(~F.col("_bad")).drop("_bad")
        staged = coerce_to(
            staged.withColumn(DELETED_COL, F.col(OP_COL) == F.lit("D")).drop(OP_COL),
            stored_schema,
        ).withColumn("_bucket", bucket_expr(keys[0], m.n_buckets))

        obs_out = Observation()
        snap_rel = f"data/snap-{m.version + 1:06d}-{uuid.uuid4().hex[:8]}"
        persisted = None
        part_cols = ["_bucket", "_salt"]
        if mode == "cow":
            # COW needs the touched-bucket set BEFORE reading the
            # target → one probe job over the (persisted) batch.
            persisted = staged.persist()
            touched = sorted(
                r["_bucket"] for r in persisted.select("_bucket").distinct().collect()
            )
            if not touched:  # empty batch still commits (advances the log)
                persisted.unpersist()
                self._handle_bad_rows(obs_in, raw_changes, bad_cond, batch_id, on_bad_rows)
                return self._commit_empty(m, batch_id, schema_versions)
            target = coerce_to(
                self.read(buckets=touched, include_deleted=True, manifest=m),
                stored_schema,
            ).withColumn("_bucket", bucket_expr(keys[0], m.n_buckets))
            unioned = target.withColumn("_src", F.lit(False)).unionByName(
                persisted.withColumn("_src", F.lit(True))
            ).withColumn("_salt", salt_expr(n_salt, *keys))
            # ONE exchange by (bucket, salt) + sort resolves intra-batch
            # duplicates AND batch-vs-target conflicts, pre-clustered
            # for the bucket-partitioned write (no second shuffle).
            merged = dedup_last_writer_colocated(unioned, keys, order_cols, part_cols)
            out_rows = merged.observe(
                obs_out,
                F.sum(F.col("_src").cast("long")).alias("from_batch"),
                F.sum((F.col("_src") & F.col(DELETED_COL)).cast("long")).alias("deletes"),
            ).drop("_src")
            tier = BASE
        else:
            # MOR fast path: single exchange+sort straight into the
            # delta write — ONE Spark job per batch; the write's output
            # directories reveal the touched buckets (no probe job).
            winners = dedup_last_writer_colocated(
                staged.withColumn("_salt", salt_expr(n_salt, *keys)),
                keys, order_cols, part_cols,
            )
            out_rows = winners.observe(
                obs_out,
                F.count(F.lit(1)).alias("from_batch"),
                F.sum(F.col(DELETED_COL).cast("long")).alias("deletes"),
            )
            tier = DELTA

        new_files, bucket_rows = self._write_snapshot(
            out_rows.drop("_salt"), snap_rel, current_version, tier, pre_clustered=True
        )
        if persisted is not None:
            persisted.unpersist()
        # bad rows surfaced by the write's observation: abort (before
        # the commit point — the just-written files orphan) or capture
        n_bad = self._handle_bad_rows(obs_in, raw_changes, bad_cond, batch_id, on_bad_rows)
        if mode == "mor":
            touched = sorted(int(b) for b in new_files)
            if not touched:
                return self._commit_empty(m, batch_id, schema_versions)

        # -- assemble + atomically commit the new manifest
        bucket_files = {b: list(v) for b, v in m.bucket_files.items()}
        for b in touched:
            bs = str(b)
            if mode == "cow":
                bucket_files[bs] = new_files.get(bs, [])
            else:
                bucket_files.setdefault(bs, []).extend(new_files.get(bs, []))
        watermarks = dict(m.watermarks)
        in_metrics, out_metrics = obs_in.get, obs_out.get
        for b in touched:
            watermarks[str(b)] = max(watermarks.get(str(b), -1), int(in_metrics["lsn_hi"]))
        rec = CommitRecord(
            batch_id=batch_id,
            lsn_lo=int(in_metrics["lsn_lo"]),
            lsn_hi=int(in_metrics["lsn_hi"]),
            rows_in=int(in_metrics["n"]) - n_bad,
            rows_deduped=int(out_metrics["from_batch"]),
            rows_upserted=int(out_metrics["from_batch"]) - int(out_metrics["deletes"] or 0),
            rows_deleted=int(out_metrics["deletes"] or 0),
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
        if mode == "mor":
            over = [
                int(b)
                for b, entries in self.manifest.bucket_files.items()
                if sum(1 for e in entries if e[2] == DELTA) > compact_threshold
            ]
            if over:
                self.compact(buckets=over, gc_tombstones=False)
        return rec

    def _handle_bad_rows(
        self, obs_in: Observation, raw_changes: DataFrame, bad_cond, batch_id: str, policy: str
    ) -> int:
        """Post-job bad-row policy. Returns the bad count. Called
        strictly BEFORE the manifest commit, so a 'fail' leaves only
        orphan files and a replay reconverges."""
        try:
            n_bad = int(obs_in.get["n_bad"] or 0)
        except Exception:
            # a zero-task job (everything filtered) can leave the
            # observation unpopulated — fall back to counting directly
            n_bad = raw_changes.filter(bad_cond).count()
        if not n_bad:
            return 0
        if policy == "fail":
            raise ValueError(
                f"batch {batch_id!r}: {n_bad} invalid rows (op not in I/U/D "
                f"or null key column); nothing was committed. Pass "
                f"on_bad_rows='dead_letter' to capture them and continue."
            )
        from ..sources.sinks import dead_letter

        dead_letter(
            raw_changes.filter(bad_cond).withColumn(
                "_error", F.lit(f"invalid op or null key/order column (batch {batch_id})")
            ),
            self.store.root,
        )
        return n_bad

    def _commit_empty(
        self, m: Manifest, batch_id: str, schema_versions: list[SchemaVersion]
    ) -> CommitRecord:
        rec = CommitRecord(batch_id, -1, -1, 0, 0, 0, 0, [], MetaStore.now())
        self.store.commit(
            Manifest(
                m.version + 1, m.n_buckets, m.key_columns, m.order_columns,
                schema_versions, {b: list(v) for b, v in m.bucket_files.items()},
                list(m.commits) + [rec], dict(m.watermarks),
            )
        )
        return rec

    # ---------------------------------------------------------------- write
    def _write_snapshot(
        self,
        df: DataFrame,
        snap_rel: str,
        schema_version: int,
        tier: str,
        n_salt: int = 4,
        pre_clustered: bool = False,
    ) -> tuple[dict[str, list], dict[str, int]]:
        """Write rows (must carry _bucket) as per-bucket parquet under
        snap_rel. When not pre-clustered, repartition by (bucket, salt)
        — a hot conv_id spreads over n_salt tasks while partitionBy
        keeps layout per-bucket — and sort with a leading _bucket so
        the dynamic-partition writer doesn't inject its own sort (key
        order in-file gives parquet min/max row-group skipping). Files
        are listed + row-counted from parquet footers driver-side (no
        extra Spark job)."""
        snap_dir = os.path.join(self.store.root, snap_rel)
        keys = self.manifest.key_columns
        if pre_clustered:
            out = df  # already exchanged+sorted by (_bucket, _salt, keys)
        else:
            out = (
                df.withColumn("_salt", salt_expr(n_salt, *keys))
                .repartition(F.col("_bucket"), F.col("_salt"))
                .drop("_salt")
                .sortWithinPartitions("_bucket", *keys)
            )
        out.write.partitionBy("_bucket").parquet(snap_dir, mode="errorifexists")

        import pyarrow.parquet as pq
        from concurrent.futures import ThreadPoolExecutor

        pending: list[tuple[str, str, str]] = []  # (bucket, relpath, abspath)
        for entry in os.listdir(snap_dir):
            if not entry.startswith("_bucket="):
                continue
            b = entry.split("=", 1)[1]
            bdir = os.path.join(snap_dir, entry)
            for fn in sorted(os.listdir(bdir)):
                if fn.endswith(".parquet"):
                    pending.append((b, f"{snap_rel}/{entry}/{fn}", os.path.join(bdir, fn)))

        # footer metadata in parallel — with hundreds of small files a
        # sequential loop becomes measurable driver-side serial time.
        # Besides row counts, we lift the LSN column's min/max out of
        # the row-group statistics into the manifest: incremental
        # consumers (changes_since) then skip whole files from metadata
        # alone. LSN ranges are narrow per delta file (one batch), so
        # this skipping is effective; key-column ranges would not be
        # (keys are hash-sprayed across files by design).
        key0 = self.manifest.order_columns[-1]

        def footer(p):
            md = pq.ParquetFile(p[2]).metadata
            try:
                idx = md.schema.names.index(key0)
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError
                    mins.append(st.min)
                    maxs.append(st.max)
                lo, hi = min(mins), max(maxs)
                if isinstance(lo, bytes):
                    lo, hi = lo.decode("utf-8", "replace"), hi.decode("utf-8", "replace")
            except (ValueError, KeyError):
                lo = hi = None
            return md.num_rows, lo, hi

        with ThreadPoolExecutor(max_workers=16) as ex:
            metas = list(ex.map(footer, pending))

        files: dict[str, list] = {}
        rows: dict[str, int] = {}
        for (b, relpath, _), (n, lo, hi) in zip(pending, metas):
            files.setdefault(b, []).append([relpath, schema_version, tier, lo, hi])
            rows[b] = rows.get(b, 0) + n
        return files, rows

    # ----------------------------------------------------------- utilities
    def overwrite_full(self, df: DataFrame, batch_id: str) -> CommitRecord | None:
        """Full refresh: replace all table content in one snapshot flip
        (ref: truncate-then-load, postgres/postgres.py:421-448; Carto
        replace-and-swap rename in one txn, carto_.py:422-436)."""
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

        obs = Observation()
        staged = df.observe(
            obs, F.count(F.lit(1)).alias("n"),
            F.min("lsn").alias("lsn_lo"), F.max("lsn").alias("lsn_hi"),
        )
        staged = dedup_last_writer(
            coerce_to(staged.withColumn(DELETED_COL, F.lit(False)), stored_schema),
            keys, m.order_columns,
        ).withColumn("_bucket", bucket_expr(keys[0], m.n_buckets))
        snap_rel = f"data/refresh-{m.version + 1:06d}-{uuid.uuid4().hex[:8]}"
        new_files, bucket_rows = self._write_snapshot(staged, snap_rel, current_version, BASE)
        met = obs.get
        rec = CommitRecord(
            batch_id=batch_id,
            lsn_lo=int(met["lsn_lo"]), lsn_hi=int(met["lsn_hi"]),
            rows_in=int(met["n"]), rows_deduped=sum(bucket_rows.values()),
            rows_upserted=sum(bucket_rows.values()), rows_deleted=0,
            touched_buckets=sorted(int(b) for b in new_files),
            committed_at=MetaStore.now(), bucket_rows=bucket_rows,
        )
        self.store.commit(
            Manifest(
                m.version + 1, m.n_buckets, keys, m.order_columns,
                schema_versions, new_files, list(m.commits) + [rec],
                {b: int(met["lsn_hi"]) for b in new_files},
            )
        )
        return rec

    def changes_since(self, lsn_exclusive: int) -> DataFrame:
        """Incremental change feed for downstream consumers: every row
        version (upserts AND tombstones, with ``_deleted``) whose lsn
        is past the cursor — the lake-table analogue of tailing the
        binlog from an offset. File skipping happens at the MANIFEST
        level using the per-file lsn min/max lifted from parquet
        footers at write time: only files that can contain newer rows
        are read at all (see _files_newer_than).

        Caveat: compaction with tombstone GC erases delete events —
        consumers that need deletes must keep their cursor ahead of
        the compaction horizon (or compact with gc_tombstones=False).
        """
        m = self.manifest
        paths_by_version = self._files_newer_than(m, lsn_exclusive)
        stored_current = _with_deleted(self.schema(m))
        if not paths_by_version:
            return self.spark.createDataFrame([], stored_current)
        parts = []
        for sv, paths in sorted(paths_by_version.items()):
            stored = _with_deleted(self._schema_at(m, sv))
            parts.append(coerce_to(self.spark.read.schema(stored).parquet(*paths), stored_current))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        last = m.order_columns[-1]
        return df.filter(F.col(last) > F.lit(lsn_exclusive))

    def _files_newer_than(self, m: Manifest, lsn_exclusive: int) -> dict[int, list[str]]:
        """Manifest-level file skipping on the recorded lsn max."""
        out: dict[int, list[str]] = {}
        for entries in m.bucket_files.values():
            for e in entries:
                hi = e[4] if len(e) >= 5 else None
                if hi is None or int(hi) > lsn_exclusive:
                    out.setdefault(e[1], []).append(os.path.join(self.store.root, e[0]))
        return out

    def gc_orphans(self, dry_run: bool = False) -> list[str]:
        """Remove data files no manifest version references — leftovers
        of crashes and lost commit races. Safe because every referenced
        file appears in SOME version's bucket_files and versions are
        immutable; files referenced by ANY retained version are kept
        (snapshots stay readable for time travel until manifests are
        themselves expired). Returns the removed relative paths."""
        import glob as _glob

        referenced: set[str] = set()
        for vp in _glob.glob(os.path.join(self.store.meta_dir, "version-*.json")):
            with open(vp) as f:
                man = Manifest.from_json(f.read())
            for entries in man.bucket_files.values():
                for e in entries:
                    referenced.add(os.path.normpath(e[0]))
        removed = []
        for path in _glob.glob(os.path.join(self.store.data_dir, "**", "*.parquet"), recursive=True):
            rel = os.path.normpath(os.path.relpath(path, self.store.root))
            if rel not in referenced:
                removed.append(rel)
                if not dry_run:
                    os.unlink(path)
        if not dry_run:  # prune dirs holding only write-marker debris
            for d, _subdirs, files in list(os.walk(self.store.data_dir, topdown=False)):
                leftover = os.listdir(d)
                if all(f == "_SUCCESS" or f.endswith(".crc") for f in leftover):
                    for f in leftover:
                        os.unlink(os.path.join(d, f))
                    os.rmdir(d)
        return removed

    def lineage(self) -> DataFrame:
        """The commit log as a DataFrame — per-batch lsn ranges, row
        counts, merge stats, touched buckets (the reference's
        everywhere-recounts A1/A2 collapsed into queryable metadata;
        observe()-collected, so none of it cost an extra job)."""
        m = self.manifest
        rows = [
            {
                "batch_id": c.batch_id,
                "lsn_lo": c.lsn_lo,
                "lsn_hi": c.lsn_hi,
                "rows_in": c.rows_in,
                "rows_deduped": c.rows_deduped,
                "rows_upserted": c.rows_upserted,
                "rows_deleted": c.rows_deleted,
                "n_touched_buckets": len(c.touched_buckets),
                "committed_at": float(c.committed_at),
            }
            for c in m.commits
        ]
        schema = (
            "batch_id string, lsn_lo long, lsn_hi long, rows_in long, "
            "rows_deduped long, rows_upserted long, rows_deleted long, "
            "n_touched_buckets int, committed_at double"
        )
        return self.spark.createDataFrame(rows, schema)

    def compact(
        self,
        buckets: list[int] | None = None,
        gc_tombstones: bool = True,
        gc_tombstones_below_lsn: int | None = None,
    ) -> None:
        """Fold deltas into fresh base files for the given buckets (all
        by default), optionally GC'ing tombstones — the engine's
        VACUUM analogue (ref: _cleanup.py:5-15). Bucket-scoped so MOR
        maintenance cost stays O(hot buckets), not O(table)."""
        m = self.manifest
        targets = sorted(buckets) if buckets is not None else sorted(
            int(b) for b in m.bucket_files
        )
        if not targets:
            return
        df = self.read(buckets=targets, include_deleted=True, manifest=m)
        if gc_tombstones:
            if gc_tombstones_below_lsn is None:
                df = df.filter(~F.col(DELETED_COL))
            else:
                df = df.filter(
                    (~F.col(DELETED_COL)) | (F.col("lsn") >= F.lit(gc_tombstones_below_lsn))
                )
        keys = m.key_columns
        df = df.withColumn("_bucket", bucket_expr(keys[0], m.n_buckets))
        snap_rel = f"data/compact-{m.version + 1:06d}-{uuid.uuid4().hex[:8]}"
        current_version = m.schema_versions[-1].version
        new_files, _ = self._write_snapshot(df, snap_rel, current_version, BASE)
        bucket_files = {b: list(v) for b, v in m.bucket_files.items()}
        for b in targets:
            bucket_files[str(b)] = new_files.get(str(b), [])
        self.store.commit(
            Manifest(
                m.version + 1, m.n_buckets, m.key_columns, m.order_columns,
                list(m.schema_versions), bucket_files, list(m.commits),
                dict(m.watermarks),
            )
        )
