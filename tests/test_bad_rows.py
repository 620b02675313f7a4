"""Bad-row policy: fail-before-commit vs dead-letter-and-continue
(ref: AGO error-row sink, ago/ago.py:319-344)."""

import glob

import pyspark.sql.functions as F
import pytest

from cityofphiladelphia_databridge_etl_tools_spark import changegen
from cityofphiladelphia_databridge_etl_tools_spark.changegen import TRANSCRIPT_SCHEMA
from cityofphiladelphia_databridge_etl_tools_spark.lake import LakeTable
from tests.test_lake_merge import assert_df_equal


def _with_bad(spark, stream):
    """Corrupt every 10th event: invalid op; one null-key row."""
    bad_op = F.when(F.col("lsn") % 10 == 0, F.lit("X")).otherwise(F.col("op"))
    return stream.withColumn("op", bad_op)


def test_fail_policy_aborts_before_commit(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=4,
    )
    stream = _with_bad(spark, changegen.changes(spark, 500, seed=61))
    with pytest.raises(ValueError, match="invalid rows"):
        t.merge_batch(stream, "b-bad")
    # nothing committed: log empty, table empty, replay with clean data works
    assert t.manifest.commits == []
    assert t.read().count() == 0
    clean = changegen.changes(spark, 500, seed=61)
    t.merge_batch(clean, "b-bad")  # same batch id — never committed, so applies
    assert_df_equal(t.read(), changegen.expected_final_state(clean))


def test_dead_letter_policy_continues(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=4,
    )
    stream = changegen.changes(spark, 500, seed=62)
    corrupted = _with_bad(spark, stream)
    rec = t.merge_batch(corrupted, "b1", on_bad_rows="dead_letter")
    assert rec is not None
    assert rec.rows_in == 450  # 50 corrupted rows excluded from lineage
    # final state == replay of only the good rows
    good = stream.filter(F.col("lsn") % 10 != 0)
    assert_df_equal(t.read(), changegen.expected_final_state(good))
    # the bad rows landed in the table's _errors/ dead-letter dir
    err_files = glob.glob(str(tmp_path / "t" / "_errors" / "*"))
    assert err_files
    captured = spark.read.parquet(err_files[0])
    assert captured.count() == 50
    assert "_error" in captured.columns
