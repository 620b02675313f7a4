"""Query registry: every implemented operator exposed as a
(spark_fn, oracle_sql) pair over the driver's testdata tables.

``REGISTRY[name] = (fn, sql)`` where ``fn(spark, sf_dir) -> DataFrame``
and ``sql`` is equivalent ANSI SQL for DuckDB (or None for
non-SQL-expressible ops → driver does a rows-only check).

Cross-engine determinism rules used throughout (Spark vs DuckDB):
- sums of doubles go through DECIMAL(18,4) then cast back to DOUBLE —
  exact arithmetic, bit-identical results, double schema;
- every row_number/top-k has a total tiebreak;
- string hashing uses md5 (identical hex in both engines);
- similarity floats are rounded before ranking and output.
"""

from .core import CORE_REGISTRY
from .data import DATA_REGISTRY

REGISTRY: dict = {}
REGISTRY.update(CORE_REGISTRY)
REGISTRY.update(DATA_REGISTRY)


def load(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
