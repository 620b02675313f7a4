"""Batch enrichment (T14) + orphan GC maintenance."""

import os

import pyspark.sql.functions as F
from pyspark.sql import types as T

from cityofphiladelphia_databridge_etl_tools_spark import changegen
from cityofphiladelphia_databridge_etl_tools_spark.changegen import TRANSCRIPT_SCHEMA
from cityofphiladelphia_databridge_etl_tools_spark.lake import LakeTable
from cityofphiladelphia_databridge_etl_tools_spark.operators.enrich import (
    batch_lookup_enrich,
    join_enrich,
)
from tests.test_lake_merge import assert_df_equal


def test_batch_lookup_enrich(spark):
    """The AGO/AIS per-row-HTTP anti-pattern replaced by batched
    executor-side lookups: fake service called once per ≤batch_size
    chunk with deduplicated keys."""
    rows = spark.createDataFrame(
        [(i, f"addr-{i % 7}") for i in range(1000)], "id long, address string"
    )

    def fake_geocoder(keys):
        assert len(keys) <= 7  # deduplicated within chunk
        return {
            k: {"lat": float(int(k.split("-")[1])), "lng": -75.0 - int(k.split("-")[1])}
            for k in keys
        }

    out = batch_lookup_enrich(
        rows, "address", fake_geocoder,
        [("lat", T.DoubleType()), ("lng", T.DoubleType())], batch_size=300,
    )
    got = out.filter(F.col("id") == 8).collect()[0]
    assert got["lat"] == 1.0 and got["lng"] == -76.0
    assert out.filter(F.col("lat").isNull()).count() == 0
    assert out.count() == 1000


def test_join_enrich_broadcasts(spark, sf_dir):
    from cityofphiladelphia_databridge_etl_tools_spark.plans import uses_broadcast_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "user_id"
    )
    out = join_enrich(ev, cust, on="user_id")
    assert uses_broadcast_join(out)
    assert out.count() == ev.count()  # left join keeps all


def test_gc_orphans(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=4,
    )
    stream = changegen.changes(spark, 800, seed=99)
    t.merge_batch(stream.filter(F.col("lsn") < 400), "b0")
    # crash/race leftovers: files written but never committed
    orphan_dir = os.path.join(t.store.root, "data/snap-crashed-cafe")
    stream.limit(50).write.parquet(orphan_dir)
    before = t.read()

    # default grace period protects a concurrent writer's in-flight
    # files: freshly-written orphans are NOT collected
    assert t.gc_orphans(dry_run=True) == []
    # with the grace period waived (no active writers), they are
    removed = t.gc_orphans(dry_run=True, older_than_s=0)
    assert removed and all("snap-crashed-cafe" in r for r in removed)
    removed = t.gc_orphans(older_than_s=0)
    assert not os.path.exists(orphan_dir)
    # committed data untouched — including files referenced only by OLD versions
    t.merge_batch(stream.filter(F.col("lsn") >= 400), "b1")
    assert t.gc_orphans(older_than_s=0) == []  # everything referenced
    assert_df_equal(t.read(), changegen.expected_final_state(stream))
    # time travel to the old version still works after GC
    old = t.store.read_version(1)
    assert_df_equal(
        t.read(manifest=old),
        changegen.expected_final_state(stream.filter(F.col("lsn") < 400)),
    )


def test_maintain_one_call_housekeeping(spark, tmp_path):
    """maintain() = compact + expire_log + orphan GC + dead-letter GC
    in one call: all deltas fold, state is unchanged, and counters
    report what each step removed."""
    from cityofphiladelphia_databridge_etl_tools_spark import changegen
    from cityofphiladelphia_databridge_etl_tools_spark.changegen import TRANSCRIPT_SCHEMA
    from cityofphiladelphia_databridge_etl_tools_spark.lake import LakeTable
    import pyspark.sql.functions as F

    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
                         ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=4)
    stream = changegen.changes(spark, 1200, seed=99)
    for k in range(3):
        t.merge_batch(stream.filter((F.col("lsn") >= k*400) & (F.col("lsn") < (k+1)*400)),
                      f"m{k}")
    before = t.read()
    out = t.maintain(orphans_older_than_s=0.0)
    m = t.manifest
    assert not any(e[2] == "delta" for v in m.bucket_files.values() for e in v)
    assert out["orphan_files_removed"] >= 0 and "metadata_records_removed" in out
    from tests.test_lake_merge import assert_df_equal
    assert_df_equal(t.read(), before)


def test_walk_files_parallel_equals_serial_walk(tmp_path):
    """Prefix-parallel listing (the 10^6-file GC scale path) must
    return exactly the serial walk's file set on BOTH filesystem
    implementations, including loose top-level files and empty roots."""
    from cityofphiladelphia_databridge_etl_tools_spark.lake.fs import (
        InMemoryObjectStore, LocalFS, walk_files_parallel,
    )

    root = str(tmp_path / "data")
    lfs = LocalFS()
    lfs.makedirs(f"{root}/snap-a/bucket=0")
    lfs.makedirs(f"{root}/snap-b")
    lfs.write_text(f"{root}/snap-a/bucket=0/f1.parquet", "x")
    lfs.write_text(f"{root}/snap-a/bucket=0/f2.parquet", "x")
    lfs.write_text(f"{root}/snap-b/f3.parquet", "x")
    lfs.write_text(f"{root}/loose.parquet", "x")
    assert sorted(walk_files_parallel(lfs, root)) == sorted(lfs.walk_files(root))
    assert walk_files_parallel(lfs, str(tmp_path / "absent")) == []

    mem = InMemoryObjectStore()
    for k in ("d/s1/b=0/a.parquet", "d/s1/b=1/b.parquet", "d/s2/c.parquet"):
        mem.write_text(f"/r/{k}", "x")
    assert sorted(walk_files_parallel(mem, "/r/d")) == sorted(mem.walk_files("/r/d"))


def test_gc_orphans_parallel_listing_same_semantics(spark, tmp_path):
    """GC over a many-file table: the prefix-parallel walk must find
    and remove exactly the unreferenced files (and keep every
    manifest-referenced one), identical to the pre-parallel contract."""
    import pyspark.sql.functions as F  # noqa: F401

    from cityofphiladelphia_databridge_etl_tools_spark import changegen
    from cityofphiladelphia_databridge_etl_tools_spark.changegen import TRANSCRIPT_SCHEMA
    from cityofphiladelphia_databridge_etl_tools_spark.lake import LakeTable

    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8,
    )
    for k in range(4):  # many snapshot dirs → many prefixes to fan over
        t.merge_batch(changegen.changes(spark, 200, seed=50 + k, lsn_start=k * 200), f"b{k}")
    fs = t.store.fs
    # plant orphans in two different snapshot prefixes + top level
    orphans = [
        str(tmp_path / "t/data/compact-zzz/bucket=0/orphan1.parquet"),
        str(tmp_path / "t/data/stray.parquet"),
    ]
    for p in orphans:
        fs.makedirs(os.path.dirname(p))
        fs.write_text(p, "junk")
    before = set(fs.walk_files(t.store.data_dir))
    removed = t.gc_orphans(older_than_s=0.0)
    after = set(fs.walk_files(t.store.data_dir))
    assert {os.path.basename(r) for r in removed} == {"orphan1.parquet", "stray.parquet"}
    assert before - after >= set(orphans)
    # every referenced file survived; table still reads correctly
    full = changegen.changes(spark, 200, seed=50)
    for k in range(1, 4):
        full = full.unionByName(changegen.changes(spark, 200, seed=50 + k, lsn_start=k * 200))
    from tests.test_lake_merge import assert_df_equal
    assert_df_equal(t.read(), changegen.expected_final_state(full))


def test_gc_skips_files_deleted_by_concurrent_actor(spark, tmp_path):
    """Two maintenance actors race: a file listed by this GC pass but
    deleted by another actor before its age check must be SKIPPED
    (missing → 'newer than any horizon'), not crash the pass with
    FileNotFoundError and not be re-deleted."""
    from cityofphiladelphia_databridge_etl_tools_spark.lake.fs import (
        LocalFS, mtimes_parallel,
    )

    lfs = LocalFS()
    live = str(tmp_path / "live.parquet")
    ghost = str(tmp_path / "ghost.parquet")
    lfs.write_text(live, "x")
    mt = mtimes_parallel(lfs, [live, ghost])  # ghost never existed
    now = __import__("time").time()
    assert now - mt[live] < 600          # fresh → grace period skips it
    assert not (now - mt[ghost] >= 0)    # missing → -inf age → skipped
    # end-to-end: GC survives a racer deleting a planted orphan mid-pass
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=4,
    )
    t.merge_batch(changegen.changes(spark, 100, seed=60), "b0")
    orphan = str(tmp_path / "t/data/snap-dead/x.parquet")
    lfs.makedirs(os.path.dirname(orphan))
    lfs.write_text(orphan, "junk")
    from cityofphiladelphia_databridge_etl_tools_spark.lake import fs as fsmod
    orig = fsmod.mtimes_parallel

    def racing(fs, paths, **kw):
        for p in list(paths):  # the racer wins the delete
            if p.endswith("x.parquet") and os.path.exists(p):
                os.unlink(p)
        return orig(fs, paths, **kw)

    fsmod.mtimes_parallel = racing
    try:
        removed = t.gc_orphans(older_than_s=0.0)  # must not raise
    finally:
        fsmod.mtimes_parallel = orig
    assert all("x.parquet" not in r for r in removed)
