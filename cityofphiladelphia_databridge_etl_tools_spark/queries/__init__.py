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

from .core import CORE_REGISTRY, CURATED_OUT_CORE
from .data import DATA_REGISTRY

REGISTRY: dict = {}
REGISTRY.update(CORE_REGISTRY)
REGISTRY.update(DATA_REGISTRY)

# Implemented + oracled queries curated out of the driver's 50-row gate
# cap (see core.CURATED_OUT_CORE); tests/test_curated_out.py keeps them
# oracle-checked every pytest run.
CURATED_OUT: dict = dict(CURATED_OUT_CORE)


def load(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
