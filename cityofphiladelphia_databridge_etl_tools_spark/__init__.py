"""PySpark-native CDC / incremental-ingest engine.

A from-scratch, Spark-first re-expression of the capabilities of
``CityOfPhiladelphia/databridge-etl-tools`` (reference at /root/reference,
studied for *semantics* only): binlog/WAL-shaped change streams of
multi-turn transcript mutations are staged as microbatch DataFrames and
applied to lake tables via key-partitioned MERGE with last-writer-wins
dedup, an idempotent exactly-once commit log, schema evolution, skew
salting, and per-partition lineage.

Everything is DataFrame/Catalyst-native: joins replace per-row lookups
(ref: ago/ago.py:1064-1078 per-row HTTPS point queries), window dedup
replaces dup-PK repair (ref: ago/ago.py:1070-1078), and an atomic
manifest-pointer commit replaces DELETE+INSERT transactions
(ref: db2/db2.py:548-565, oracle/oracle.py:386-406).
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
