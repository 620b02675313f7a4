"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 as
a (spark, sf_dir) callable; ``oracle_sql()`` gives the equivalent
DuckDB SQL — every registered query has one (the md5-derived LSH
planes are deterministic, so even the ANN paths are fully
SQL-checkable). The implementations live in
``cityofphiladelphia_databridge_etl_tools_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cityofphiladelphia_databridge_etl_tools_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full CDC engine path — events mapped to a change
    stream, merged through the lake table (commit log, LWW, buckets)
    in four microbatches, final state returned."""
    fn, _ = REGISTRY["cdc_replay_merge"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
