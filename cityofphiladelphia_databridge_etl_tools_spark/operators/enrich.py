"""Lookup enrichment operators — the reference's per-row AIS geocoder
(T14, ais_geocoder/ais_geocoder.py:40-114: one HTTP request per row
with retry/backoff) re-expressed two ways:

1. :func:`join_enrich` — when the lookup corpus is materializable,
   it's just a broadcast join (the right answer ~always at scale).
2. :func:`batch_lookup_enrich` — when the lookup is a remote service,
   an Arrow-batched ``mapInPandas`` calls an injected batch fetcher
   once per chunk (hundreds of keys per round-trip instead of 2+
   round-trips per row), with results merged back columnar.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def join_enrich(
    rows: DataFrame, lookup: DataFrame, on: str, broadcast: bool = True
) -> DataFrame:
    """Enrich via a (small) lookup table: broadcast left join."""
    side = F.broadcast(lookup) if broadcast else lookup
    return rows.join(side, on=on, how="left")


def batch_lookup_enrich(
    rows: DataFrame,
    key_col: str,
    fetch_batch: Callable[[list], dict],
    result_fields: list[tuple[str, T.DataType]],
    batch_size: int = 500,
) -> DataFrame:
    """Remote-service enrichment, batched: ``fetch_batch(keys)`` maps a
    list of keys to {key: {field: value}} (inject a real HTTP client in
    production, a deterministic fake in tests — mirrors the reference's
    500-row flush cadence, ago/ago.py:70). Executor-side and
    Arrow-vectorized; duplicate keys within a chunk are fetched once.
    """
    out_schema = T.StructType(
        list(rows.schema.fields)
        + [T.StructField(name, dt, True) for name, dt in result_fields]
    )
    names = [name for name, _ in result_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo : lo + batch_size].copy()
                keys = chunk[key_col].drop_duplicates().tolist()
                resolved = fetch_batch(keys) or {}
                for name in names:
                    chunk[name] = chunk[key_col].map(
                        lambda k: (resolved.get(k) or {}).get(name)
                    )
                yield chunk

    return rows.mapInPandas(run, schema=out_schema)
