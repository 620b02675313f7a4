"""Deterministic binlog/WAL-shaped change-stream generator.

Synthesizes the CDC stream over the ``transcripts`` table shape
(conv_id, turn_idx, role, text, tool, ts) per FIXTURES.md §2. Built on
``spark.range`` + seeded ``xxhash64`` column expressions only, so:

- fully distributed — generation of 10^10 events is N range-partitions
  of pure codegen'd expressions, no driver loop, no data movement;
- deterministic — same (seed, n) gives bit-identical streams on any
  cluster size, which is what makes the replay / two-parallelism
  benchmarks honest;
- replayable as an oracle — the expected final state is a pure SQL
  window query over the same stream (see :func:`expected_final_state`).

Skew is explicit: ``hot_frac`` of events hit ``n_hot`` hot
conversations (the "hot conversation" case the north rule requires the
merge to salt around).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("lsn", T.LongType(), False),
    ]
)

ROLES = ["user", "assistant", "system", "tool"]
BASE_EPOCH = 1_700_000_000  # fixed base instant (deterministic)


def _h(seed: int, *cols) -> F.Column:
    """Seeded 64-bit hash of columns — the generator's PRNG."""
    return F.xxhash64(F.lit(seed), *cols)


def _u(seed: int, *cols) -> F.Column:
    """Uniform [0,1) derived from the hash."""
    return (F.pmod(_h(seed, *cols), F.lit(1_000_000)) / 1_000_000.0)


def changes(
    spark: SparkSession,
    n_events: int,
    seed: int = 42,
    n_convs: int = 1000,
    max_turns: int = 50,
    hot_frac: float = 0.2,
    n_hot: int = 3,
    p_delete: float = 0.05,
    ts_jitter_s: int = 120,
    with_tool_col: bool = True,
    lsn_start: int = 0,
    num_partitions: int | None = None,
    text_chars: int = 0,
) -> DataFrame:
    """The CDC stream: one row per change event, lsn strictly increasing.

    Out-of-order event time is built in: ``ts`` = base + lsn ± jitter,
    so LWW on (ts, lsn) differs from naive last-lsn-wins — the oracle
    must (and does) honor it.
    """
    rng = spark.range(lsn_start, lsn_start + n_events, 1, num_partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")

    is_hot = _u(seed + 1, i) < F.lit(hot_frac)
    conv_num = F.when(
        is_hot, F.pmod(_h(seed + 2, i), F.lit(n_hot))
    ).otherwise(F.pmod(_h(seed + 3, i), F.lit(n_convs)))
    conv_id = F.concat(F.lit("conv-"), F.lpad(conv_num.cast("string"), 6, "0"))
    turn_idx = F.pmod(_h(seed + 4, i), F.lit(max_turns)).cast("int")

    op = F.when(_u(seed + 5, i) < F.lit(p_delete), F.lit("D")).otherwise(
        F.when(_u(seed + 6, i) < F.lit(0.5), F.lit("I")).otherwise(F.lit("U"))
    )
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (F.pmod(_h(seed + 7, i), F.lit(4)) + 1).cast("int")
    )
    # text is a pure function of (conv, turn, lsn): per-turn text
    # equality vs the oracle is checkable byte-for-byte. text_chars
    # pads to realistic transcript size with seeded hash material
    # (128 distinct chars repeated — mildly compressible, like prose).
    text = F.concat(
        F.lit("turn "), turn_idx.cast("string"), F.lit(" of "), conv_id,
        F.lit(" rev "), i.cast("string"), F.lit(" :: "),
        F.lower(F.hex(_h(seed + 8, i))),
    )
    if text_chars > 0:
        chunk = F.concat(*[F.lower(F.hex(_h(seed + 20 + j, i))) for j in range(8)])
        text = F.rpad(
            F.concat(text, F.lit(" "), F.repeat(chunk, max(1, text_chars // 128))),
            text_chars, "x",
        )
    tool = F.when(role == "tool", F.concat(F.lit("tool_"), F.pmod(_h(seed + 9, i), F.lit(7)).cast("string")))
    jitter = F.pmod(_h(seed + 10, i), F.lit(2 * ts_jitter_s)) - F.lit(ts_jitter_s)
    ts = F.timestamp_seconds(F.lit(BASE_EPOCH) + i + jitter)

    out = rng.select(
        i.alias("lsn"),
        op.alias("op"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(op != "D", role).alias("role"),
        F.when(op != "D", text).alias("text"),
        *( [F.when((op != "D"), tool).alias("tool")] if with_tool_col else [] ),
        ts.alias("ts"),
    )
    return out


def with_duplicates(stream: DataFrame, every_n: int = 10) -> DataFrame:
    """Re-deliver every n-th event verbatim (same lsn) — the at-least-
    once duplicate-delivery scenario the merge must be idempotent to
    (ref: AGO retry 'doubled up' guard, ago/ago.py:786-822)."""
    return stream.unionAll(stream.filter(F.pmod(F.col("lsn"), F.lit(every_n)) == 0))


def expected_final_state(stream: DataFrame) -> DataFrame:
    """Pure-SQL oracle: replay the stream with window LWW — per key the
    max-(ts, lsn) event; deletes erase. Independent of the engine's
    merge path (no bucketing/commit log), so it cross-checks it."""
    keys = ["conv_id", "turn_idx"]
    w = Window.partitionBy(*keys).orderBy(F.col("ts").desc(), F.col("lsn").desc())
    cols = [c for c in stream.columns if c != "op"]
    return (
        stream.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("op") != "D"))
        .select(*cols)
    )


def initial_snapshot(
    spark: SparkSession, n_convs: int = 200, max_turns: int = 20, seed: int = 7
) -> DataFrame:
    """A dense insert-only warm-up table: every (conv, turn) populated."""
    df = changes(
        spark,
        n_events=n_convs * max_turns,
        seed=seed,
        n_convs=n_convs,
        max_turns=max_turns,
        hot_frac=0.0,
        p_delete=0.0,
    )
    return df
