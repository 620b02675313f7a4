"""Oracle checks for queries curated OUT of the driver's 50-row gate
cap: they must stay exactly as correct as when they were driver rows.
Runs the same comparison the driver does — Spark result vs DuckDB SQL
on the same parquet: row count, column-name set, and order-insensitive
values (floats rounded to 6, like scripts/check_oracles.py)."""

import duckdb
import pandas as pd
import pytest

from cityofphiladelphia_databridge_etl_tools_spark.queries import CURATED_OUT

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(CURATED_OUT))
def test_curated_out_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = CURATED_OUT[name]
    got = _normalize(fn(spark, sf_dir).toPandas())
    want = _normalize(duck.execute(sql).fetchdf())
    assert len(got) == len(want), (len(got), len(want))
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=1e-6)
