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
