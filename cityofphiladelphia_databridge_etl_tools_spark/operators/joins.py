"""Temporal join operators Spark lacks natively.

``asof_join`` — for every left row, the latest right row with the
same key and right_ts <= left_ts. The naive expression is a range
join (quadratic blowup per key); this one is the union + running-last
window trick: tag both sides, union, sort once per key by time, and
carry the last-seen right payload forward — ONE shuffle, O(n log n)
per key, no range explosion. The same dataflow backs the single-table
``asof_last_signup`` gate query; this operator generalizes it to two
tables with payload carry-over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the payload of the
    most recent ``right`` row (same ``on`` keys, ``right_ts`` at or
    before ``left_ts``); no match → NULLs. A right row exactly at
    left_ts IS visible. ``tiebreak_cols`` order right rows sharing a
    timestamp (pass a unique id for determinism)."""
    keys = [on] if isinstance(on, str) else list(on)
    payload = payload_cols or [
        c for c in right.columns if c not in keys + [right_ts]
    ]
    tiebreaks = tiebreak_cols or []

    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_asof_ts", F.col(left_ts).cast("timestamp")
    )
    # the payload rides as ONE struct: right rows contribute a non-null
    # struct even when individual payload fields are NULL, so
    # last(..., ignorenulls) can never skip a newer-but-null value and
    # resurrect a stale one
    r = right.select(
        *keys,
        F.col(right_ts).cast("timestamp").alias("_asof_ts"),
        F.struct(*[F.col(c) for c in payload]).alias("_asof_payload"),
        *[F.col(c).alias(f"_tb_{c}") for c in tiebreaks],
    ).withColumn("_side", F.lit(0))
    unioned = l.unionByName(r, allowMissingColumns=True)

    # rights sort before lefts at equal ts (visibility), tiebreaks
    # total-order same-ts rights so the carried payload is deterministic
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("_asof_ts").asc(),
            F.col("_side").asc(),
            *[F.col(f"_tb_{c}").asc_nulls_first() for c in tiebreaks],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last(F.col("_asof_payload"), ignorenulls=True).over(w)
    out = unioned.withColumn("_asof_carried", carried)
    for c in payload:
        out = out.withColumn(f"{c}{suffix}", F.col("_asof_carried")[c])
    return (
        out.filter(F.col("_side") == 1)
        .drop("_side", "_asof_ts", "_asof_payload", "_asof_carried",
              *[f"_tb_{c}" for c in tiebreaks])
    )


def range_join_point_in_interval(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int = 86_400,
) -> DataFrame:
    """Point-in-interval range join without the cartesian blowup
    Catalyst plans for raw inequality joins: time is bucketed into
    ``bin_seconds`` bins, each interval explodes onto the bins it
    covers, the join becomes an EQUI-join on (keys, bin) — shuffle-
    partitionable, AQE-skew-safe — and the exact containment filter
    runs after. A point lands in exactly one bin, so no dedup is
    needed; cost is O(intervals × bins-per-interval + points), not
    O(points × intervals). Pick bin_seconds near the median interval
    length (cost knob, not a correctness knob). Inclusive start,
    exclusive end."""
    keys = [on] if isinstance(on, str) else list(on)
    p_bin = F.floor(F.unix_timestamp(F.col(point_ts)) / bin_seconds)
    i_lo = F.floor(F.unix_timestamp(F.col(start_ts)) / bin_seconds)
    # end is exclusive: a zero-length interval still covers its start bin
    i_hi = F.floor(
        (F.unix_timestamp(F.col(end_ts)) - F.lit(1)) / bin_seconds
    )
    binned_intervals = intervals.withColumn(
        "_bin", F.explode(F.sequence(i_lo, F.greatest(i_lo, i_hi)))
    )
    binned_points = points.withColumn("_bin", p_bin)
    return (
        binned_points.join(binned_intervals, keys + ["_bin"])
        .filter(
            (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
        )
        .drop("_bin")
    )
