"""LSN-window runner: derived resume cursor, crash-resume, skew
spreading, and lineage surface."""

import pyspark.sql.functions as F

from cityofphiladelphia_databridge_etl_tools_spark import changegen
from cityofphiladelphia_databridge_etl_tools_spark.changegen import TRANSCRIPT_SCHEMA
from cityofphiladelphia_databridge_etl_tools_spark.lake import LakeTable
from cityofphiladelphia_databridge_etl_tools_spark.streaming.runner import LsnWindowRunner
from tests.test_lake_merge import assert_df_equal


def _source(spark, seed=41):
    def fetch(lo, hi):
        return changegen.changes(spark, hi - lo, seed=seed, lsn_start=lo)
    return fetch


def test_runner_resumes_from_commit_log(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8,
    )
    src = _source(spark)
    r = LsnWindowRunner(t, src, events_per_batch=700)
    r.run_until(1400)
    assert r.resume_lsn() == 1400

    # "crash", new runner object (fresh process analogue) continues
    r2 = LsnWindowRunner(t, src, events_per_batch=700)
    recs = r2.run_until(2800)
    assert [c.batch_id for c in recs] == ["lsn-1400-2100", "lsn-2100-2800"]
    full = changegen.changes(spark, 2800, seed=41)
    assert_df_equal(t.read(), changegen.expected_final_state(full))

    # re-running the same range is a complete no-op
    assert LsnWindowRunner(t, src, events_per_batch=700).run_until(2800) == []


def test_lineage_dataframe(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8,
    )
    LsnWindowRunner(t, _source(spark), events_per_batch=500).run_until(1500)
    lin = t.lineage()
    rows = {r["batch_id"]: r for r in lin.collect()}
    assert set(rows) == {"lsn-0-500", "lsn-500-1000", "lsn-1000-1500"}
    assert rows["lsn-500-1000"]["lsn_lo"] == 500
    assert all(r["rows_in"] == 500 for r in rows.values())
    # conservation: deduped = upserted + deleted
    assert all(
        r["rows_deduped"] == r["rows_upserted"] + r["rows_deleted"] for r in rows.values()
    )


def test_hot_key_salting_spreads_files(spark, tmp_path):
    """A pathologically hot conversation must not serialize into one
    writer: with n_salt=4 its bucket gets multiple delta files (i.e.
    multiple write tasks participated)."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8,
    )
    # every event hits conv 0; batch large enough that AQE's
    # small-partition coalescing (which rightly folds tiny test
    # batches into one task) doesn't mask the salting
    hot = changegen.changes(
        spark, 300_000, seed=44, hot_frac=1.0, n_hot=1, max_turns=50_000
    )
    t.merge_batch(hot, "hot", n_salt=4, mode="mor")
    m = t.manifest
    # all rows land in one bucket (single conv) ...
    assert len(m.bucket_files) == 1
    files = next(iter(m.bucket_files.values()))
    # ... but across >1 file because (conv, turn) salting spread tasks
    assert len(files) > 1, files
