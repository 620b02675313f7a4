"""ANSI-on parity sweep.

The package session pins ``spark.sql.ansi.enabled=false`` (session.py) —
but gate queries execute inside whatever session the CALLER provides, and
Spark 4's default is ANSI ON.  Round 3 shipped a regression exactly through
that gap: a convergence signature summing raw xxhash64 values passed all
110 ANSI-off tests and then threw ARITHMETIC_OVERFLOW under the driver's
ANSI-on harness (ref analogue: the reference CI runs each suite against the
real backing service, .github/workflows/test_pr_build.yml:74-123 — test in
the caller's environment, not only your own).

This sweep flips ANSI on for the shared session and runs EVERY registered
gate query to completion (rows only — the driver's DuckDB oracle does the
value comparison).  Any expression that is only correct under ANSI-off
silent wraparound / null-on-bad-cast fails here before it can ship.
"""

import pytest

from cityofphiladelphia_databridge_etl_tools_spark.queries import REGISTRY


@pytest.fixture()
def ansi_spark(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_gate_query_runs_ansi_on(ansi_spark, sf_dir, name):
    fn = REGISTRY[name][0]
    df = fn(ansi_spark, sf_dir)
    assert df.count() >= 0
