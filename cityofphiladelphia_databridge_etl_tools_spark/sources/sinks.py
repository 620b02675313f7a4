"""Sinks (SURVEY §2.2): open-data publish, dead-letter capture, JDBC.

The reference's S3 object puts (K7) and AGO/Carto HTTP loads (K5/K6)
collapse to path-based writes and foreachPartition batching here; the
atomic-promote semantics live in the lake layer (LakeTable.overwrite_
full / merge_batch), not in the sink."""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def publish_csv_gzip(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K8 (ref: opendata/opendata.py:78-263, gzip level 7 at :68-75):
    publish as gzipped CSV with header. Spark writes one .csv.gz per
    partition — coalesce upstream if a single artifact is required."""
    df.write.option("header", True).option("compression", "gzip").csv(path, mode=mode)


def dead_letter(
    failed: DataFrame, base_path: str, reason_col: str = "_error"
) -> str:
    """K9 (ref: ago/ago.py:319-344 timestamped -errors.txt in S3, the
    pipeline continues): persist failed rows with an error column to a
    timestamped path; returns the path for lineage."""
    if reason_col not in failed.columns:
        failed = failed.withColumn(reason_col, F.lit("unknown"))
    path = f"{base_path}/_errors/{time.strftime('%Y%m%dT%H%M%S')}"
    failed.write.parquet(path, mode="errorifexists")
    return path


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append", batchsize: int = 500, **options
) -> None:
    """K1/K3 analogue (ref COPY postgres.py:230-275, appendoraclesde
    oracle.py:272-284): batched JDBC write; batchsize mirrors the
    reference's 500-row edit batches (ago.py:70)."""
    writer = (
        df.write.format("jdbc").option("url", url).option("dbtable", table)
        .option("batchsize", batchsize).mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def foreach_partition_batched(df: DataFrame, send, batch_size: int = 500) -> None:
    """K6 (ref: ago.py:477-713 per-row loop with 500-row flushes): the
    set-wise version — each partition iterates Rows, flushing
    ``send(list_of_rows)`` every batch_size. Network work distributes
    across executors instead of one Python loop."""

    def run(it):
        buf = []
        for row in it:
            buf.append(row)
            if len(buf) >= batch_size:
                send(buf)
                buf = []
        if buf:
            send(buf)

    df.foreachPartition(run)
