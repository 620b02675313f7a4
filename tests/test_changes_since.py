"""Incremental change feed with manifest-level lsn file skipping."""

import pyspark.sql.functions as F

from cityofphiladelphia_databridge_etl_tools_spark import changegen
from cityofphiladelphia_databridge_etl_tools_spark.changegen import TRANSCRIPT_SCHEMA
from cityofphiladelphia_databridge_etl_tools_spark.lake import LakeTable


def test_changes_since_skips_old_files_and_feeds_deltas(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=4,
    )
    stream = changegen.changes(spark, 2000, seed=101)
    for k in range(4):
        t.merge_batch(
            stream.filter((F.col("lsn") >= k * 500) & (F.col("lsn") < (k + 1) * 500)),
            f"b{k}", compact_threshold=10**9,
        )
    m = t.manifest
    total_files = sum(len(v) for v in m.bucket_files.values())
    selected = t._files_newer_than(m, 999)  # only batches b2, b3 qualify
    n_selected = sum(len(v) for v in selected.values())
    assert 0 < n_selected < total_files, (n_selected, total_files)

    feed = t.changes_since(999)
    # the feed carries each batch's stored winners (a key touched in
    # both b2 and b3 appears once per batch — consumers apply LWW)
    from cityofphiladelphia_databridge_etl_tools_spark.operators.merge import dedup_last_writer
    expect_n = sum(
        dedup_last_writer(
            stream.filter((F.col("lsn") >= k * 500) & (F.col("lsn") < (k + 1) * 500)),
            ["conv_id", "turn_idx"], ["ts", "lsn"],
        ).count()
        for k in (2, 3)
    )
    assert feed.count() == expect_n
    assert feed.filter(F.col("_deleted")).count() > 0  # tombstones included
    assert feed.agg(F.min("lsn")).collect()[0][0] >= 1000

    # cursor beyond the watermark → empty feed, no files read
    assert t._files_newer_than(m, 10**9) == {}
    assert t.changes_since(10**9).count() == 0


def test_tombstone_gc_respects_registered_cursors(spark, tmp_path):
    """Compaction with tombstone GC must not destroy delete events a
    registered change-feed consumer has not read yet; once the
    horizon passed anyway (force), a lagging strict consumer errors
    instead of silently missing deletes."""
    import pytest

    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=4,
    )
    stream = changegen.changes(spark, 1000, seed=102)
    t.merge_batch(stream, "b0")
    assert t.read(include_deleted=True).filter(F.col("_deleted")).count() > 0

    t.register_cursor("downstream", 100)  # consumer lags at lsn 100
    with pytest.raises(ValueError, match="downstream"):
        t.compact(gc_tombstones=True)  # full GC would outrun it
    # GC strictly below the cursor is safe and allowed
    t.compact(gc_tombstones=True, gc_tombstones_below_lsn=100)
    assert t.manifest.tombstone_gc_lsn == 99
    # the lagging-but-safe cursor still reads its deletes
    assert t.changes_since(100).filter(F.col("_deleted")).count() > 0

    # caught-up consumer → full GC allowed; horizon recorded
    t.register_cursor("downstream", 10**9)
    t.compact(gc_tombstones=True)
    assert t.read(include_deleted=True).filter(F.col("_deleted")).count() == 0
    horizon = t.manifest.tombstone_gc_lsn
    assert horizon > 99
    # a strict consumer behind the horizon now errors loudly...
    with pytest.raises(ValueError, match="tombstone GC horizon"):
        t.changes_since(50)
    # ...and can opt into upserts-only semantics
    assert t.changes_since(50, strict=False).filter(F.col("_deleted")).count() == 0


def test_force_gc_overrides_lagging_cursor(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=2,
    )
    t.merge_batch(changegen.changes(spark, 400, seed=103), "b0")
    t.register_cursor("slow", 0)
    t.compact(gc_tombstones=True, force=True)
    assert t.read(include_deleted=True).filter(F.col("_deleted")).count() == 0
