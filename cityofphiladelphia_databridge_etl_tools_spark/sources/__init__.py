"""Sources: file scans, schema export/import, and the paged-REST
ingestion pattern (SURVEY §2.1).

Path-based reads replace the reference's explicit S3-download step
(S6, postgres/_s3.py:3-21) — s3a:// and local paths read identically.
JDBC passthroughs stand in for the Oracle/Postgres table scans
(S1/S2); they are thin because Spark's JDBC source already does
predicate pushdown and partitioned reads.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    encoding_fallback: str = "iso-8859-1",
    **options,
) -> DataFrame:
    """S5 (ref: postgres.py:152-156 utf-8→latin-1 fallback): CSV scan
    with explicit schema (never inferSchema in production) and an
    encoding fallback — if the utf-8 read surfaces replacement chars
    in a sample, re-read as ``encoding_fallback``."""
    from pyspark.sql import functions as F

    # RFC4180 doubled-quote escaping (petl/Excel-style, what the
    # reference's staging CSVs use) — Spark's default escape is '\\'
    options.setdefault("escape", '"')
    base = spark.read.options(header=True, **options)
    if schema is not None:
        base = base.schema(schema)
    df = base.csv(path)
    str_cols = [c for c, t in df.dtypes if t == "string"]
    if str_cols:
        bad = [F.coalesce(F.instr(F.col(c), "\ufffd"), F.lit(0)) for c in str_cols]
        probe = (
            df.select(F.greatest(*bad).alias("bad") if len(bad) > 1 else bad[0].alias("bad"))
            .filter(F.col("bad") > 0)
            .limit(1)
        )
        if probe.count() > 0:
            return base.option("encoding", encoding_fallback).csv(path)
    return df


def export_table_schema(df: DataFrame, primary_keys: list[str]) -> str:
    """S3/S4 (ref: postgres/_properties.py:36-85 export_json_schema,
    oracle.py:134-141): the table's schema + merge keys as a JSON
    document (our analogue of the frictionless JSON Table Schema that
    the reference ships to S3 next to every staging CSV)."""
    return json.dumps(
        {
            "primaryKey": primary_keys,
            "fields": [
                {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
                for f in df.schema.fields
            ],
            "spark_schema": json.loads(df.schema.json()),
        },
        indent=1,
    )


def import_table_schema(doc: str) -> tuple[T.StructType, list[str]]:
    """Inverse of export_table_schema → (StructType, primary keys)."""
    d = json.loads(doc)
    return T.StructType.fromJson(d["spark_schema"]), list(d["primaryKey"])


def paged_rest_source(
    spark: SparkSession,
    fetch_page: Callable[[int], Iterable[dict]],
    schema: T.StructType,
    page_size: int = 1000,
    max_pages: int = 100_000,
    flush_rows: int = 50_000,
    spill_dir: str | None = None,
) -> DataFrame:
    """S7/S8 (ref: airtable.py:70-94, knack.py:98-118): offset-paged
    REST ingestion. Pagination is inherently driver-sequential (each
    page's cursor comes from the previous response) — the reference
    does the same — but rows land in a distributed DataFrame
    immediately, and everything downstream is parallel.

    ``fetch_page(offset)`` returns up to page_size dict rows; empty →
    stop. Inject a real HTTP fetcher in production; tests inject a
    deterministic fake.

    Driver memory is bounded: every ``flush_rows`` buffered rows are
    spilled to a parquet stage under ``spill_dir`` (tempdir default)
    and the buffer cleared, so a million-row corpus never lives in a
    driver list — the result unions the spilled stages with the tail
    buffer."""
    import tempfile

    buffer: list[dict] = []
    stages: list[str] = []
    stage_root: str | None = None
    offset = 0
    for _ in range(max_pages):
        page = list(fetch_page(offset))
        buffer.extend(page)
        if len(buffer) >= flush_rows:
            if stage_root is None:
                stage_root = spill_dir or tempfile.mkdtemp(prefix="paged_rest_")
            path = f"{stage_root}/stage-{len(stages):06d}"
            spark.createDataFrame(buffer, schema).write.parquet(path)
            stages.append(path)
            buffer = []
        if len(page) < page_size:
            break
        offset += len(page)
    df = spark.createDataFrame(buffer, schema)
    if stages:
        df = spark.read.schema(schema).parquet(*stages).unionByName(df)
    return df


def read_jdbc(
    spark: SparkSession, url: str, table: str, predicates: list[str] | None = None, **options
) -> DataFrame:
    """S1/S2 analogue (ref postgres/postgres.py:288-365,
    oracle/oracle.py:177-270): partitioned JDBC scan. Spark pushes
    projections and filters down to the database; ``predicates`` (one
    WHERE clause per partition, e.g. hash ranges on the key) gives a
    PARALLEL scan — each executor opens its own connection for its
    slice, the distributed replacement for the reference's single
    psycopg2 cursor. Round-tripped in tests against embedded Derby
    (on Spark's classpath); the same call reaches Postgres/Oracle by
    URL + driver jar."""
    if predicates:
        props = {k: str(v) for k, v in options.items()}
        return spark.read.jdbc(url, table, predicates=list(predicates), properties=props)
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
