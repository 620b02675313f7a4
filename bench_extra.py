"""Round-7 optimization measurement harness (bench.py is FROZEN for
measurement — this file holds the extra instrumentation the round's
work cites: per-query noop-sink isolation, explain dumps, and
merge-phase timings). Methodology matches bench.py where it overlaps:
same session config, same SF dir/core env contract, min-of-reps after
a warm rep.

Usage:
  python bench_extra.py queries [name ...]   # time + explain the bench queries
  python bench_extra.py plans [name ...]     # write plans/r07/<q>_{when}.txt
  python bench_extra.py merge                # phase-timed MOR merge_batch
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import CPUS, SF_DIR, make_session  # noqa: E402

BENCH_QUERIES = [
    "cdc_upsert_state",
    "q1_pricing_summary",
    "q5_nation_revenue",
    "sessionize_events",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_score",
    "stream_hourly_counts",
]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def time_queries(names: list[str], reps: int = 3, sink: str = "count") -> dict:
    from cityofphiladelphia_databridge_etl_tools_spark.queries import REGISTRY

    spark = make_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        fn, _ = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"{name} (warm)")
        fn(spark, SF_DIR).count()  # warm: JIT/codegen/IO cache
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            if sink == "noop":
                _noop(fn(spark, SF_DIR))
            else:
                fn(spark, SF_DIR).count()  # bench.py's methodology
            samples.append(round(time.time() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"queries_min": {k: v["min"] for k, v in out.items()}}))
    return out


def dump_plans(names: list[str], when: str = "before") -> None:
    from cityofphiladelphia_databridge_etl_tools_spark.queries import REGISTRY

    spark = make_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs("plans/r07", exist_ok=True)
    for name in names:
        fn, _ = REGISTRY[name]
        df = fn(spark, SF_DIR)
        p = f"plans/r07/{name}_{when}.txt"
        with open(p, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(p, flush=True)


def merge_phases(n_events: int = 1_000_000) -> None:
    """One MOR merge_batch, phase-timed: stage off-clock, then time the
    full merge and the read-resolve, mirroring run_ingest's unit."""
    import shutil
    import tempfile

    from cityofphiladelphia_databridge_etl_tools_spark import changegen
    from cityofphiladelphia_databridge_etl_tools_spark.changegen import TRANSCRIPT_SCHEMA
    from cityofphiladelphia_databridge_etl_tools_spark.lake import LakeTable

    spark = make_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bx_merge_", dir="/dev/shm")
    try:
        p = f"{root}/in"
        changegen.changes(
            spark, n_events, seed=42, n_convs=max(1000, n_events // 10),
            max_turns=50, hot_frac=0.2, n_hot=3,
        ).write.parquet(p)
        batch = spark.read.parquet(p)
        # warm merge
        t = LakeTable.create(
            spark, f"{root}/w", TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
            ["ts", "lsn"], n_buckets=32, bucket_columns=["conv_id"],
        )
        t.merge_batch(batch, "warm")
        for rep in range(3):
            t2 = LakeTable.create(
                spark, f"{root}/t{rep}", TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
                ["ts", "lsn"], n_buckets=32, bucket_columns=["conv_id"],
            )
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"merge rep{rep}")
            t2.merge_batch(batch, f"b{rep}")
            t1 = time.time()
            t2.read().count()
            t2r = time.time()
            print(json.dumps({
                "rep": rep,
                "merge_sec": round(t1 - t0, 3),
                "read_resolve_sec": round(t2r - t1, 3),
            }), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    rest = sys.argv[2:]
    if cmd == "queries":
        time_queries(rest or BENCH_QUERIES)
    elif cmd == "plans":
        when = os.environ.get("BX_WHEN", "before")
        dump_plans(rest or BENCH_QUERIES, when=when)
    elif cmd == "merge":
        merge_phases(int(rest[0]) if rest else 1_000_000)
    else:
        raise SystemExit(f"unknown command {cmd}")
