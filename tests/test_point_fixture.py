"""Type-fidelity test on the reference's canonical fixture shape
(tests/fixtures_data/staging/point_table_2272.csv + the DDL at
tests/test_postgres.py:21-41): decimals incl. 0E-8 scientific,
special chars, embedded quotes, nulls, EWKT geometry incl. EMPTY —
roundtripped through CSV read → transform chain → lake merge → read."""

from decimal import Decimal

import pyspark.sql.functions as F
from pyspark.sql import types as T

from cityofphiladelphia_databridge_etl_tools_spark.lake import LakeTable
from cityofphiladelphia_databridge_etl_tools_spark.operators import transforms as TR
from cityofphiladelphia_databridge_etl_tools_spark.sources import read_csv

CSV = """objectid,textfield,datefield,numericfield,shape
1,"ab#$%c",2019-05-15 15:53:53.522000,0E-8,SRID=2272;POINT (2712205.7 259685.27)
2,"y""ea::h",2019-05-14 15:53:53.522000,-2.70000000,SRID=2272;POINT (2712182.1 259676.63)
3,po{}tato,2019-05-15 15:53:53.522000,2132134342.00000000,SRID=2272;POINT (2712171.3 259665.71)
4,,,,"SRID=2272;MULTIPOINT EMPTY"
"""

SCHEMA = T.StructType(
    [
        T.StructField("objectid", T.IntegerType(), False),
        T.StructField("textfield", T.StringType(), True),
        T.StructField("datefield", T.TimestampNTZType(), True),
        T.StructField("numericfield", T.DecimalType(38, 8), True),
        T.StructField("shape", T.StringType(), True),
    ]
)


def test_point_fixture_roundtrip(spark, tmp_path):
    p = tmp_path / "point_table_2272.csv"
    p.write_text(CSV)
    df = read_csv(spark, str(p), schema=SCHEMA)
    df = TR.promote_multi_geometry(df)  # points/EMPTY untouched

    # merge keyed on objectid (the fixture's PK), lsn = objectid
    table_schema = T.StructType(
        list(SCHEMA.fields) + [T.StructField("lsn", T.LongType(), False)]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), table_schema,
        key_columns=["objectid"], order_columns=["datefield", "lsn"], n_buckets=4,
    )
    changes = df.withColumn("lsn", F.col("objectid").cast("long")).withColumn(
        "op", F.lit("I")
    )
    rec = t.merge_batch(changes, "load-1")
    assert rec.rows_in == 4

    out = {r["objectid"]: r for r in t.read().collect()}
    assert out[1]["textfield"] == "ab#$%c"
    assert out[2]["textfield"] == 'y"ea::h'            # embedded quote survives
    assert out[1]["numericfield"] == Decimal("0E-8")   # scientific zero
    assert out[2]["numericfield"] == Decimal("-2.70000000")
    assert out[3]["numericfield"] == Decimal("2132134342.00000000")
    assert out[1]["shape"] == "SRID=2272;POINT (2712205.7 259685.27)"
    assert out[4]["shape"] == "SRID=2272;MULTIPOINT EMPTY"
    assert out[4]["textfield"] is None and out[4]["numericfield"] is None
    assert out[1]["datefield"].microsecond == 522000   # sub-second fidelity

    # upsert-back invariance on this shape too (ref test_postgres.py:83-86)
    before = t.read()
    t.merge_batch(before.withColumn("op", F.lit("U")), "roundtrip")
    after = t.read()
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0
