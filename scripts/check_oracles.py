"""Local approximation of the driver's correctness gate: run every
REGISTRY query on Spark and its oracle SQL on DuckDB over the same
parquet, compare row count + schema-name set + order-insensitive
values. Usage: python scripts/check_oracles.py [sf_dir] [names...]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from cityofphiladelphia_databridge_etl_tools_spark.queries import REGISTRY
from cityofphiladelphia_databridge_etl_tools_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=16)
    if os.environ.get("SPARK_GRAFT_ANSI") == "1":
        # replicate the driver harness's Spark 4 default (ANSI ON) so
        # value-level oracle agreement is checked in the caller's
        # session config, not only the package's pinned one
        spark.conf.set("spark.sql.ansi.enabled", "true")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sp = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        if sql is None:
            print(f"• {name}: rows-only ({len(sp)} rows)")
            continue
        try:
            du = con.execute(sql).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        if sorted(sp.columns) != sorted(du.columns):
            failures.append(name)
            print(f"✗ {name}: SCHEMA spark={sorted(sp.columns)} duckdb={sorted(du.columns)}")
            continue
        if len(sp) != len(du):
            failures.append(name)
            print(f"✗ {name}: ROWS spark={len(sp)} duckdb={len(du)}")
            continue
        a, b = normalize(sp), normalize(du)
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            failures.append(name)
            print(f"✗ {name}: VALUES differ in {int(bad.sum())}/{len(a)} rows")
            print("  spark:", a[bad].head(3).to_dict("records"))
            print("  duckdb:", b[bad].head(3).to_dict("records"))
            continue
        print(f"✓ {name} ({len(sp)} rows)")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
