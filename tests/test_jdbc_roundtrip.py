"""Live JDBC round-trip (VERDICT r4 #7): embedded Apache Derby ships
on Spark's classpath (derby-10.16 in pyspark/jars), so the thin
read_jdbc/write_jdbc passthroughs are exercised against a REAL JDBC
database — append-mode write, full scan read-back, predicate-
partitioned parallel read, and filter pushdown (ref: the reference's
primary paths, postgres/postgres.py:288-365, oracle/oracle.py:177-270).
Derby embedded is single-process; in local mode executors share the
JVM so the same URL works for every task."""

import pyspark.sql.functions as F
import pytest

from cityofphiladelphia_databridge_etl_tools_spark.sources import read_jdbc
from cityofphiladelphia_databridge_etl_tools_spark.sources.sinks import write_jdbc


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


DRIVER = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


def test_jdbc_write_read_roundtrip(spark, derby_url, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("row-"), F.col("id")).alias("name"),
    )
    write_jdbc(df, derby_url, "t_round", mode="append", batchsize=100, **DRIVER)
    back = read_jdbc(spark, derby_url, "t_round", **DRIVER)
    assert back.count() == 1000
    assert back.agg(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(1000))
    # append again: append-mode really appends (K3 semantics)
    write_jdbc(df.limit(10), derby_url, "t_round", mode="append", **DRIVER)
    assert read_jdbc(spark, derby_url, "t_round", **DRIVER).count() == 1010


def test_jdbc_predicate_partitioned_parallel_scan(spark, derby_url):
    df = spark.range(0, 400).select(F.col("id").alias("k"), (F.col("id") % 7).alias("m"))
    write_jdbc(df, derby_url, "t_part", mode="append", **DRIVER)
    # Spark's JDBC writer quotes identifiers, so the column is
    # case-sensitive lowercase in Derby — predicates must quote it too
    preds = [f'MOD("k", 4) = {i}' for i in range(4)]
    back = read_jdbc(spark, derby_url, "t_part", predicates=preds, **DRIVER)
    # one partition per predicate — the parallel-scan contract
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 400
    assert sorted(r["k"] for r in back.collect()) == list(range(400))


def test_jdbc_filter_pushdown_reaches_database(spark, derby_url):
    df = spark.range(0, 500).select(F.col("id").alias("k"))
    write_jdbc(df, derby_url, "t_push", mode="append", **DRIVER)
    q = read_jdbc(spark, derby_url, "t_push", **DRIVER).filter(F.col("k") < 50)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan" in plan, plan
    assert q.count() == 50
