"""Multi-dimensional file layout: Z-order (Morton) clustering.

``compact(sort_by=[c])`` already gives single-dimension locality —
parquet min/max row-group stats prune range scans on that one column.
When TWO access patterns matter (e.g. time ranges AND a conversation
prefix), a lexicographic sort serves only the leading column; Z-order
interleaves the bits of both ranks so files stay *simultaneously*
narrow in every dimension — the same layout trick Delta's OPTIMIZE
ZORDER BY and Databricks' liquid clustering apply, built here from
public bit-interleaving math as pure JVM column expressions (shifts,
masks, ors — whole-stage codegen, no UDF).

Mechanics: each column is first normalized to a ``bits``-bit integer
rank via uniform bucketing between its (one small agg job) min/max —
rank skew only costs pruning efficiency, never correctness, because
Z-order is ONLY a sort key: rows keep their exact values and the
read path is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_rank(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Value → integer rank in [0, 2^bits): uniform bucketing over the
    observed [lo, hi] span (degenerate span → rank 0)."""
    n = F.lit((1 << bits) - 1)
    span = hi.cast("double") - lo.cast("double")
    frac = F.when(span <= 0, F.lit(0.0)).otherwise(
        (col.cast("double") - lo.cast("double")) / span
    )
    return F.least(n, F.greatest(F.lit(0), F.floor(frac * (n + 1)).cast("long")))


def zorder_key(ranks: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each rank into one Morton
    key (rank count * bits <= 63). Pure shift/mask/or expressions."""
    z = F.lit(0).cast("long")
    k = len(ranks)
    for bit in range(bits):
        for j, r in enumerate(ranks):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(r.cast("long"), bit).bitwiseAND(F.lit(1)),
                    bit * k + j,
                )
            )
    return z


def with_zorder(
    df: DataFrame,
    columns: list[str],
    bits: int = 16,
    out_col: str = "_zorder",
    bounds: dict[str, tuple] | None = None,
) -> DataFrame:
    """Add a Z-order sort key over ``columns``. ``bounds`` supplies
    per-column (min, max); when absent they are computed with ONE
    small aggregation job (numeric/timestamp columns; strings rank by
    xxhash64, which spreads uniformly and needs no bounds)."""
    if len(columns) * bits > 63:
        raise ValueError(f"{len(columns)} cols x {bits} bits exceeds a long")
    rankable = ("int", "bigint", "smallint", "tinyint", "double", "float",
                "date", "timestamp")
    need = [
        c for c in columns
        if (bounds is None or c not in bounds)
        and df.schema[c].dataType.simpleString() in rankable
    ]
    bounds = dict(bounds or {})
    if need:
        row = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in need],
            *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in need],
        ).collect()[0]
        for c in need:
            bounds[c] = (row[f"lo_{c}"], row[f"hi_{c}"])
    ranks = []
    mask = F.lit((1 << bits) - 1)
    for c in columns:
        dt = df.schema[c].dataType.simpleString()
        if c in bounds and bounds[c][0] is not None:
            lo, hi = bounds[c]
            ranks.append(_to_rank(F.col(c), F.lit(lo), F.lit(hi), bits))
        elif dt == "string":
            # hash-rank: uniform spread without a bounds job; loses
            # prefix locality (acceptable — strings rarely range-scan)
            ranks.append(F.shiftright(F.abs(F.xxhash64(F.col(c))), 12).bitwiseAND(mask))
        else:
            ranks.append(F.abs(F.xxhash64(F.col(c))).bitwiseAND(mask))
    return df.withColumn(out_col, zorder_key(ranks, bits))
