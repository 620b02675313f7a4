"""Stateful streaming: per-conversation running state must accumulate
ACROSS microbatches (state survives triggers), matching a batch
aggregation of the whole stream at the end."""

import pyspark.sql.functions as F

from cityofphiladelphia_databridge_etl_tools_spark import changegen
from cityofphiladelphia_databridge_etl_tools_spark.streaming.stateful import (
    conversation_progress,
)


def test_conversation_progress_accumulates_across_batches(spark, tmp_path):
    changes_dir = str(tmp_path / "changes")
    stream = changegen.changes(spark, 1200, seed=71, n_convs=20)
    for k in range(3):  # 3 files → ≥3 microbatches with maxFilesPerTrigger=1
        (
            stream.filter((F.col("lsn") >= k * 400) & (F.col("lsn") < (k + 1) * 400))
            .coalesce(1)
            .write.parquet(f"{changes_dir}/f{k}", mode="overwrite")
        )

    schema = spark.read.parquet(changes_dir + "/*").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(changes_dir + "/*")
    )
    out = conversation_progress(src)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_progress")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emitted = spark.table("conv_progress")
    # the LAST emission per conv (max updates) must equal the batch truth
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy(F.col("updates").desc())
    final = (
        emitted.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    truth = stream.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("turn_idx").alias("max_turn_idx"),
        F.max("lsn").alias("last_lsn"),
        F.max(F.col("ts").cast("timestamp")).alias("last_ts"),
    )
    # event-time fidelity (regression: a ns/µs mix-up once produced 1972)
    ts_truth = {r["conv_id"]: r["last_ts"] for r in truth.collect()}
    for r in final.collect():
        assert r["last_ts"] == ts_truth[r["conv_id"]], r
    joined = final.select("conv_id", "n_events", "max_turn_idx", "last_lsn").join(
        truth, "conv_id", "full_outer"
    )
    assert final.count() == truth.count()
    mism = joined.filter(
        final["n_events"].eqNullSafe(truth["n_events"]) == False  # noqa: E712
    ).unionAll(
        joined.filter(final["max_turn_idx"].eqNullSafe(truth["max_turn_idx"]) == False)  # noqa: E712
    ).unionAll(
        joined.filter(final["last_lsn"].eqNullSafe(truth["last_lsn"]) == False)  # noqa: E712
    )
    assert mism.count() == 0
    # statefulness proof: some conv appears in >1 trigger yet counts are total
    assert emitted.groupBy("conv_id").count().agg(F.max("count")).collect()[0][0] > 1
    assert final.agg(F.sum("n_events")).collect()[0][0] == 1200
