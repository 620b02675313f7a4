"""spark-submit job script: windowed CDC ingest of a generated stream.

Usage (cluster mode identical — only --master changes):
    scripts/build_pyfiles.sh
    spark-submit --master local[8] --py-files dist/databridge_spark.zip \
        scripts/submit_job.py --root /tmp/lake/t --generate 1000000

The engine arrives on every executor via --py-files; no install step.
"""

import argparse

from pyspark.sql import SparkSession

from cityofphiladelphia_databridge_etl_tools_spark import changegen
from cityofphiladelphia_databridge_etl_tools_spark.lake import LakeTable
from cityofphiladelphia_databridge_etl_tools_spark.streaming.runner import LsnWindowRunner

parser = argparse.ArgumentParser()
parser.add_argument("--root", required=True)
parser.add_argument("--generate", type=int, default=1_000_000)
parser.add_argument("--events-per-batch", type=int, default=500_000)
args = parser.parse_args()

spark = SparkSession.builder.appName("databridge-spark-submit").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

table = LakeTable.create(
    spark, args.root, changegen.TRANSCRIPT_SCHEMA,
    key_columns=["conv_id", "turn_idx"], order_columns=["ts", "lsn"], n_buckets=16,
)
runner = LsnWindowRunner(
    table,
    lambda lo, hi: changegen.changes(spark, hi - lo, seed=42, lsn_start=lo),
    events_per_batch=args.events_per_batch,
)
recs = runner.run_until(args.generate)
print(f"OK windows={len(recs)} rows={table.read().count()} resume={runner.resume_lsn()}")
spark.stop()
