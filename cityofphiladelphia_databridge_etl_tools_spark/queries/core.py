"""CDC-semantics, transform, and analytic queries over the testdata.

The `events` table (event_id, ts, user_id, event_type, value, props)
stands in for the transcript change stream: event_id is the LSN,
(user_id, event_id % 50) the merge key, event_type='error' mapped to
deletes. Each query cites the reference operator it re-expresses.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import merge as M


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# The canonical events→changes mapping used by the CDC queries.
def _as_changes(ev: DataFrame) -> DataFrame:
    return ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.col("event_id") % 50).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.col("ts"),
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )


_CHANGES_SQL = """
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 50 AS INT) AS turn_idx,
         event_type AS role, props AS text, ts, event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events
"""

_FINAL_STATE_SQL = f"""
WITH c AS ({_CHANGES_SQL}),
r AS (SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
      FROM c)
SELECT conv_id, turn_idx, role, text, ts, lsn
FROM r WHERE rn = 1 AND op <> 'D'
"""


# --------------------------------------------------------------- CDC core
def cdc_upsert_state(spark, sf_dir):
    """LWW state reconstruction — operators U1/U8 as one dataflow
    (ref: postgres.py:551-565 upsert + ago.py:1070-1078 dup repair)."""
    ch = _as_changes(_events(spark, sf_dir))
    winners = M.dedup_last_writer(ch, ["conv_id", "turn_idx"], ["ts", "lsn"])
    return winners.filter(F.col("op") != "D").drop("op")


def cdc_replay_merge(spark, sf_dir):
    """The FULL engine lifecycle: events→changes split into 4
    LSN-window microbatches, merged into a real LakeTable (commit log,
    buckets, salting, tombstones), then COMPACTED (tombstone GC +
    delta fold — maintenance must not change state), final state read
    back. The oracle is an independent one-shot SQL replay — this is
    the engine's final-state-equality gate on driver data."""
    from ..lake import LakeTable
    from pyspark.sql import types as T

    ch = _as_changes(_events(spark, sf_dir))
    schema = T.StructType([f for f in ch.schema.fields if f.name != "op"])
    root = tempfile.mkdtemp(prefix="cdc_replay_") + "/t"
    t = LakeTable.create(
        spark, root, schema, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8
    )
    hi = ch.agg(F.max("lsn")).collect()[0][0] + 1
    step = (hi + 3) // 4
    for k in range(4):
        b = ch.filter((F.col("lsn") >= k * step) & (F.col("lsn") < (k + 1) * step))
        t.merge_batch(b, f"replay-{k}")
    t.compact()
    return t.read().select("conv_id", "turn_idx", "role", "text", "ts", "lsn")


def cdc_schema_evolution(spark, sf_dir):
    """Schema evolution through the REAL engine: the first half of the
    stream arrives without the `role` column (pre-evolution batches),
    the second half with it; the table evolves in place and old rows
    read as null. Oracle: one-shot SQL replay with role nulled below
    the split."""
    from ..lake import LakeTable
    from pyspark.sql import types as T

    ch = _as_changes(_events(spark, sf_dir))
    split = ch.agg(((F.max("lsn") + 1) / 2).cast("long")).collect()[0][0]
    narrow = ch.filter(F.col("lsn") < split).drop("role")
    wide = ch.filter(F.col("lsn") >= split)
    schema = T.StructType([f for f in ch.schema.fields if f.name not in ("op", "role")])
    root = tempfile.mkdtemp(prefix="cdc_evo_") + "/t"
    t = LakeTable.create(spark, root, schema, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8)
    t.merge_batch(narrow, "evo-0")
    t.merge_batch(wide, "evo-1")
    return t.read().select("conv_id", "turn_idx", "role", "text", "ts", "lsn")


def cdc_full_refresh(spark, sf_dir):
    """Truncate-and-reload through the engine (ref: postgres.py:421-448
    truncate+load, carto replace-and-swap carto_.py:471-490): load the
    LWW state of the first half, then overwrite_full with the deduped
    second half — final table is exactly the second half's state."""
    from ..lake import LakeTable
    from pyspark.sql import types as T

    ch = _as_changes(_events(spark, sf_dir))
    split = ch.agg(((F.max("lsn") + 1) / 2).cast("long")).collect()[0][0]
    schema = T.StructType([f for f in ch.schema.fields if f.name != "op"])
    root = tempfile.mkdtemp(prefix="cdc_refresh_") + "/t"
    t = LakeTable.create(spark, root, schema, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8)
    t.merge_batch(ch.filter(F.col("lsn") < split), "load-0")
    fresh = (
        M.dedup_last_writer(ch.filter(F.col("lsn") >= split), ["conv_id", "turn_idx"], ["ts", "lsn"])
        .filter(F.col("op") != "D")
        .drop("op")
    )
    t.overwrite_full(fresh, "refresh-0")
    return t.read().select("conv_id", "turn_idx", "role", "text", "ts", "lsn")


def cdc_compacted_state(spark, sf_dir):
    """Merge in 4 batches then compact (tombstone GC + delta fold) —
    the read-back state must be unchanged by maintenance; same oracle
    as cdc_replay_merge."""
    from ..lake import LakeTable
    from pyspark.sql import types as T

    ch = _as_changes(_events(spark, sf_dir))
    schema = T.StructType([f for f in ch.schema.fields if f.name != "op"])
    root = tempfile.mkdtemp(prefix="cdc_compact_") + "/t"
    t = LakeTable.create(spark, root, schema, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8)
    hi = ch.agg(F.max("lsn")).collect()[0][0] + 1
    step = (hi + 3) // 4
    for k in range(4):
        t.merge_batch(
            ch.filter((F.col("lsn") >= k * step) & (F.col("lsn") < (k + 1) * step)),
            f"c-{k}",
        )
    t.compact()
    return t.read().select("conv_id", "turn_idx", "role", "text", "ts", "lsn")


def cdc_range_prune(spark, sf_dir):
    """Z-order layout + manifest-stat file pruning through the REAL
    engine: merge the change stream, compact with a Morton-interleaved
    (lsn, conv_id) sort (operators/layout.py) so every rewritten file
    stays narrow in BOTH dimensions, then range-read the middle fifth
    of the LSN axis. File pruning happens on the DRIVER against
    manifest column stats before any Spark planning (Iceberg-style
    scan planning); the gate asserts files_read < files_total so a
    pruning regression errors loudly under the driver harness. The row
    RESULT is pruning-independent (read_range == read().filter by
    contract), so the oracle is a plain filtered LWW replay."""
    from ..lake import LakeTable
    from pyspark.sql import types as T

    ch = _as_changes(_events(spark, sf_dir))
    schema = T.StructType([f for f in ch.schema.fields if f.name != "op"])
    root = tempfile.mkdtemp(prefix="cdc_rangeprune_") + "/t"
    # pin the layout: compaction range-partitions on shuffle.partitions,
    # and the pruning ratio should not depend on the caller's session
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        t = LakeTable.create(
            spark, root, schema, ["conv_id", "turn_idx"], ["ts", "lsn"],
            n_buckets=2, stats_columns=["lsn"],
        )
        t.merge_batch(ch, "load-0")
        t.compact(zorder_by=["lsn", "conv_id"])
        hi_all = ch.agg(F.max("lsn")).collect()[0][0]
        lo, hi = (2 * hi_all) // 5, (3 * hi_all) // 5
        stats: dict = {}
        out = t.read_range("lsn", lo=lo, hi=hi, stats=stats)
        assert stats["files_read"] < stats["files_total"], (
            f"manifest range pruning read every file: {stats}"
        )
        return out.select("conv_id", "turn_idx", "role", "text", "ts", "lsn")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def cdc_window_dedup(spark, sf_dir):
    """Window dedup keep-newest per (user, type) — operator U8."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


def cdc_route_changes(spark, sf_dir):
    """Insert/update routing counts — set-wise replacement of the AGO
    per-row point query (U5, ago/ago.py:1064-1100)."""
    ev = _events(spark, sf_dir)
    # half the customers "exist" in the target so BOTH routes appear
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select(F.col("c_custkey").alias("user_id"))
    )
    routed = M.route_changes(ev, cust, ["user_id"])
    return (
        routed.groupBy("_action")
        .agg(F.count(F.lit(1)).alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .withColumnRenamed("_action", "action")
    )


def cdc_delete_stale(spark, sf_dir):
    """Delete-stale retention — U4 (postgres.py:450-495): keep only
    events whose user still exists in the staging (customer) set."""
    ev = _events(spark, sf_dir)
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("user_id"))
    kept = M.delete_stale(ev, cust, ["user_id"])
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("n_users")
    )


def cdc_watermark(spark, sf_dir):
    """Per-partition watermark computation — U7/A2 (db2.py:596-655,
    ago.py:1317-1329 MAX(updated_datetime))."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.max("ts").alias("max_ts"),
        F.max("event_id").alias("max_lsn"),
        F.count(F.lit(1)).alias("n"),
    )


def cdc_except_diff(spark, sf_dir):
    """recorddiff oracle — A5 (tests/test_postgres.py:69-86): project
    two halves of the stream and diff them with EXCEPT ALL."""
    ev = _events(spark, sf_dir).select("user_id", "event_type")
    a = _events(spark, sf_dir).filter(F.col("event_id") % 2 == 0).select("user_id", "event_type")
    diff = ev.exceptAll(a)  # == the odd half, multiset-wise
    return diff.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


def cdc_changelog_stats(spark, sf_dir):
    """Lineage counts + per-partition watermarks per op — A1 + A2/U7
    in one aggregation (count verification everywhere in the
    reference, plus the MAX(ts)/MAX(lsn) watermark cursor of
    db2.py:596-655 / ago.py:1317-1329 — one pass, not recounts)."""
    ch = _as_changes(_events(spark, sf_dir))
    return ch.groupBy("op").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.min("lsn").alias("lsn_lo"),
        F.max("lsn").alias("lsn_hi"),
        F.max("ts").alias("max_ts"),
    )


# --------------------------------------------------------------- transforms
def t_scrub_sanitize(spark, sf_dir):
    """Vectorized text scrub + remote-upload cleanup — T3/T5/T11 in
    one pass (null-byte scrub _cleanup.py:30-54, AGO strip chars
    ago.py:436-474): lowercase/strip-non-alnum/collapse-whitespace
    (clean_*) AND the clean_for_remote operator on text salted with
    non-ascii + '\"<> characters (remote_*). regexp_replace is
    JVM-side codegen, replacing the reference's 500-line sampling
    heuristic with an exact pass."""
    from ..operators.transforms import clean_for_remote

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text",
        F.concat(F.col("text"), F.lit(' <"é"> ')).alias("remote_text"),
    )
    d = clean_for_remote(d, ["remote_text"])
    clean = F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
    )
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).alias("clean_len"),
        "remote_text",
        F.length("remote_text").alias("remote_len"),
    )


def t_tz_shift(spark, sf_dir):
    """Timezone localize — T4 (postgres.py:327-341 US/Eastern): shift
    event time by a fixed offset and histogram local hours."""
    ev = _events(spark, sf_dir)
    local = F.col("ts") + F.expr("INTERVAL 5 HOURS")
    return (
        ev.select(F.hour(local).alias("local_hour"))
        .groupBy("local_hour")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def t_json_extract(spark, sf_dir):
    """JSON payload decode — T10/T12 (airtable.py:96-111 json values):
    pull props.k out and aggregate it."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(F.col("event_type"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def t_surrogate_key(spark, sf_dir):
    """Surrogate objectid generation — T13 (oracle.py:370-375
    NEXT_ROWID, airtable.py:107-109): deterministic dense row ids via
    the distributed partition-offset technique (no single-reducer
    global window)."""
    from ..operators.transforms import add_objectid

    d = _t(spark, sf_dir, "documents")
    return add_objectid(d.select("doc_id", "source"), ["doc_id"], n_partitions=8)


def _synthetic_geoms(spark, sf_dir):
    """Deterministic EWKT shapes derived from doc_id — POINT,
    single-ring POLYGON, TWO-ring POLYGON (hole), LINESTRING, EMPTY —
    so the geometry gates cover every branch the reference's
    convert_geometry handles (ago/ago.py:954-1008 rings/paths).
    Integer-only coordinates keep string rendering identical across
    engines; testdata has no geometry column."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    x = (F.col("doc_id") % 360 - 180).cast("long").cast("string")
    y = (F.col("doc_id") % 180 - 90).cast("long").cast("string")
    shape = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("SRID=300001;POINT ("), x, F.lit(" "), y, F.lit(")")))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("SRID=4326;POLYGON ((0 0, "), x, F.lit(" 0, "), x,
                       F.lit(" "), y, F.lit(", 0 0))")))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("SRID=4326;POLYGON ((0 0, "), x, F.lit(" 0, "), x,
                       F.lit(" "), y, F.lit(", 0 0), (1 1, 2 1, 2 2, 1 1))")))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("SRID=4326;LINESTRING (0 0, "), x, F.lit(" "), y,
                       F.lit(", "), x, F.lit(" 0)")))
        .otherwise(F.lit("SRID=4326;MULTIPOINT EMPTY"))
    )
    return d.withColumn("shape", shape)


_GEOM_SQL = """
  geoms AS (
    SELECT doc_id,
      CASE
        WHEN doc_id % 5 = 0 THEN 'SRID=300001;POINT (' || CAST(doc_id % 360 - 180 AS VARCHAR) || ' ' || CAST(doc_id % 180 - 90 AS VARCHAR) || ')'
        WHEN doc_id % 5 = 1 THEN 'SRID=4326;POLYGON ((0 0, ' || CAST(doc_id % 360 - 180 AS VARCHAR) || ' 0, ' || CAST(doc_id % 360 - 180 AS VARCHAR) || ' ' || CAST(doc_id % 180 - 90 AS VARCHAR) || ', 0 0))'
        WHEN doc_id % 5 = 2 THEN 'SRID=4326;POLYGON ((0 0, ' || CAST(doc_id % 360 - 180 AS VARCHAR) || ' 0, ' || CAST(doc_id % 360 - 180 AS VARCHAR) || ' ' || CAST(doc_id % 180 - 90 AS VARCHAR) || ', 0 0), (1 1, 2 1, 2 2, 1 1))'
        WHEN doc_id % 5 = 3 THEN 'SRID=4326;LINESTRING (0 0, ' || CAST(doc_id % 360 - 180 AS VARCHAR) || ' ' || CAST(doc_id % 180 - 90 AS VARCHAR) || ', ' || CAST(doc_id % 360 - 180 AS VARCHAR) || ' 0)'
        ELSE 'SRID=4326;MULTIPOINT EMPTY' END AS shape
    FROM documents
  )
"""


def t_geometry_promote(spark, sf_dir):
    """T1+T7+T8+T9 chained (ref: postgres.py:146-201 multi-promotion,
    opendata.py:119-209 SRID handling, opendata.py:186-244 point
    cutout): extract SRID, remap bad codes, promote
    POLYGON→MULTIPOLYGON, and split POINTs into lat/lng doubles
    (EMPTY/non-point → nulls)."""
    from ..operators import transforms as TR

    g = _synthetic_geoms(spark, sf_dir)
    out = TR.promote_multi_geometry(TR.remap_bad_srid(TR.extract_srid(g)))
    # point_to_lat_lng consumes (drops) its geometry column; feed it a
    # copy so the promoted shape stays in the output
    out = TR.point_to_lat_lng(out.withColumn("_pt", F.col("shape")), geom_col="_pt")
    return out.select("doc_id", "srid", "shape", "lat", "lng")


def t_point_latlng(spark, sf_dir):
    """T8 (ref: opendata.py:186-244): EWKT POINT → lat/lng doubles,
    EMPTY/non-point → nulls, geometry column dropped."""
    from ..operators import transforms as TR

    g = _synthetic_geoms(spark, sf_dir)
    return TR.point_to_lat_lng(g).select("doc_id", "lat", "lng")


def t_reproject(spark, sf_dir):
    """T6 (ref: ago/ago.py:351-427 pyproj 2272→4326, opendata.py:186-244
    project-then-latlng): closed-form Lambert-conformal-conic inverse
    as pure column math over synthetic PA-South state-plane feet."""
    from ..operators.geo import reproject_2272_to_4326

    d = _t(spark, sf_dir, "documents").select("doc_id")
    pts = d.withColumn(
        "x_ft", (F.lit(2_200_000) + (F.col("doc_id") % 1000) * 800).cast("double")
    ).withColumn(
        "y_ft", (F.lit(100_000) + ((F.col("doc_id") * 7) % 1000) * 400).cast("double")
    )
    return reproject_2272_to_4326(pts, "x_ft", "y_ft").select("doc_id", "lat", "lng")


def t_esri_json(spark, sf_dir):
    """T6 publish leg (ref: ago/ago.py:954-1008 convert_geometry):
    EWKT → ESRI JSON after bad-SRID remap — POINTs become x/y dicts,
    single-ring POLYGONs become rings, EMPTY stays null."""
    from ..operators import transforms as TR

    g = _synthetic_geoms(spark, sf_dir)
    out = TR.to_esri_json(TR.remap_bad_srid(TR.extract_srid(g)), srid_col="srid")
    return out.select("doc_id", "esri_json")


def t_clean_remote(spark, sf_dir):
    """T5 (ref: ago/ago.py:436-474): strip non-ascii and '\"<>
    characters before remote upload, empty→null — exercised on text
    deliberately salted with both classes."""
    from ..operators.transforms import clean_for_remote

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.col("text"), F.lit(' <"é"> ')).alias("text")
    )
    out = clean_for_remote(d, ["text"])
    return out.select("doc_id", "text", F.length("text").alias("clean_len"))


def t_batch_enrich(spark, sf_dir):
    """T14 (ref: ais_geocoder.py:40-114 one-HTTP-per-row): batched
    executor-side lookup enrichment with a deterministic fake service
    (zip derived from the key — mirrors the geocoder contract)."""
    from pyspark.sql import types as T

    from ..operators.enrich import batch_lookup_enrich

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    def fake_service(keys):
        return {k: {"zip": f"19{100 + int(k) % 100}"} for k in keys}

    out = batch_lookup_enrich(
        cust, "c_custkey", fake_service, [("zip", T.StringType())], batch_size=500
    )
    return out.groupBy("c_mktsegment", "zip").agg(F.count(F.lit(1)).alias("n"))


def k_dead_letter(spark, sf_dir):
    """K9 (ref: ago/ago.py:319-344 timestamped -errors.txt, pipeline
    continues): rows with an invalid op are captured to the dead-letter
    sink while the valid rest of the batch commits; the captured set is
    the query result."""
    from ..lake import LakeTable
    from pyspark.sql import types as T

    ch = _as_changes(_events(spark, sf_dir)).withColumn(
        "op", F.when(F.col("lsn") % 97 == 0, F.lit("X")).otherwise(F.col("op"))
    )
    schema = T.StructType([f for f in ch.schema.fields if f.name != "op"])
    root = tempfile.mkdtemp(prefix="cdc_dlq_") + "/t"
    t = LakeTable.create(spark, root, schema, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8)
    t.merge_batch(ch, "dlq-0", on_bad_rows="dead_letter")
    captured = spark.read.parquet(f"{root}/_errors/*")
    return captured.groupBy("op").agg(
        F.count(F.lit(1)).alias("n_bad"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.min("lsn").alias("lsn_lo"),
        F.max("lsn").alias("lsn_hi"),
    )


def s_csv_fallback(spark, sf_dir):
    """S5 (ref: postgres.py:152-156 utf-8→latin-1 fallback): a staging
    CSV written in latin-1 (bytes invalid as utf-8) must round-trip
    through the encoding-fallback reader."""
    import os

    from pyspark.sql import types as T

    from ..sources import read_csv

    rows = sorted(
        _t(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect(),
        key=lambda r: r["n_nationkey"],
    )
    d = tempfile.mkdtemp(prefix="csv_latin1_")
    with open(os.path.join(d, "part.csv"), "w", encoding="iso-8859-1") as f:
        f.write("n_nationkey,name\n")
        for r in rows:
            f.write(f"{r['n_nationkey']},{r['n_name']}é\n")
    schema = T.StructType(
        [T.StructField("n_nationkey", T.LongType()), T.StructField("name", T.StringType())]
    )
    return read_csv(spark, d, schema=schema)


def s_paged_rest(spark, sf_dir):
    """S7/S8 (ref: airtable.py:70-94, knack.py:98-118): offset-paged
    REST ingestion through the bounded-buffer source (pages of 7,
    spill every 10 rows — exercises the parquet-stage path)."""
    from pyspark.sql import types as T

    from ..sources import paged_rest_source

    rows = [
        {"n_nationkey": r["n_nationkey"], "n_name": r["n_name"]}
        for r in sorted(
            _t(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect(),
            key=lambda x: x["n_nationkey"],
        )
    ]
    schema = T.StructType(
        [T.StructField("n_nationkey", T.LongType()), T.StructField("n_name", T.StringType())]
    )

    def fetch_page(offset):
        return rows[offset:offset + 7]

    return paged_rest_source(
        spark, fetch_page, schema, page_size=7, flush_rows=10,
        spill_dir=tempfile.mkdtemp(prefix="paged_rest_q_"),
    )


def t_parse_datetime(spark, sf_dir):
    """T12 + T4 chained (ref: knack/knack.py:120-135
    '%m/%d/%Y %I:%M %p' parse; postgres.py:327-341 US/Eastern
    localize): parse source-format datetime strings (rendered from the
    events fixture, so the roundtrip is exact to the minute), shift to
    a fixed-offset local time, histogram the local hours."""
    from ..operators.transforms import parse_source_datetime

    ev = _events(spark, sf_dir).select(
        F.date_format(F.col("ts").cast("timestamp"), "MM/dd/yyyy hh:mm a").alias("raw"),
    )
    parsed = parse_source_datetime(ev.withColumn("parsed", F.col("raw")), ["parsed"])
    local = F.col("parsed") + F.expr("INTERVAL 5 HOURS")
    return (
        parsed.select(F.hour(local).alias("local_hour"), "parsed")
        .groupBy("local_hour")
        .agg(
            F.count("parsed").alias("n_parsed"),
            F.min("parsed").alias("min_ts"),
            F.max("parsed").alias("max_ts"),
        )
    )


def stream_session_counts(spark, sf_dir):
    """Streaming sessionization via session_window + watermark (the
    state-store path); oracle is an independent batch lag+cumsum
    replay with session_window's >=gap boundary rule."""
    from ..streaming.pipeline import run_session_windows

    return run_session_windows(spark, sf_dir)


# ---------------------------------------------------------------- analytics
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the engine's heavy-agg benchmark query. Decimal
    accumulation then double output for cross-engine exactness."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))).cast(
                    "decimal(28,8)"
                )
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_top_unshipped(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + top-10 revenue. Small dims are
    broadcast (explicit hint; AQE would also pick it)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))).cast("decimal(28,8)")
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.round("revenue", 4).desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q5_nation_revenue(spark, sf_dir):
    """TPC-H Q5 shape: star join through region→nation→customer→
    orders→lineitem with broadcast dims."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))).cast("decimal(28,8)")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def topk_parts_per_brand(spark, sf_dir):
    """Top-3 revenue parts per brand — window top-k (the engine's
    hot-key inspection query)."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))).cast("decimal(28,8)")
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.round("revenue", 4).desc(), F.col("p_partkey").asc()
    )
    return agg.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)


def sessionize_events(spark, sf_dir):
    """Sessionization: 30-min-gap sessions per user via lag + cumsum —
    the batch analogue of the streaming session_window."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer microseconds in both engines — exact gap comparison
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    sess = F.sum(
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    per_session = (
        ev.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("n_events"),
    )


def asof_last_signup(spark, sf_dir):
    """As-of join (Spark lacks a native one): for each event, the most
    recent signup ts by the same user at-or-before the event —
    expressed as a running conditional max window, no join at all."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    last_signup = F.max(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).over(w)
    out = ev.withColumn("last_signup_ts", last_signup)
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("last_signup_ts").alias("n_with_signup"),
        F.max("last_signup_ts").alias("max_signup_ts"),
    )


def asof_join_orders(spark, sf_dir):
    """TWO-TABLE as-of join (the custom operator Spark lacks): each
    event gains the most recent order of the same customer at or
    before the event time — union + running-last window, one shuffle,
    no range-join blowup. Aggregated per event_type for the gate."""
    from ..operators.joins import asof_join

    ev = _events(spark, sf_dir).select(
        F.col("user_id"), F.col("event_type"), F.col("event_id"), F.col("ts")
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_totalprice", "o_orderkey"
    )
    joined = asof_join(
        ev, orders, on="user_id", left_ts="ts", right_ts="o_orderdate",
        payload_cols=["o_totalprice", "o_orderkey"], tiebreak_cols=["o_orderkey"],
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderkey_asof").alias("n_with_order"),
        F.sum(F.col("o_totalprice_asof").cast("decimal(18,4)")).cast("double").alias("sum_price"),
        F.max("o_orderkey_asof").alias("max_orderkey"),
    )


def range_join_order_windows(spark, sf_dir):
    """Binned point-in-interval range join (no cartesian blowup): each
    event matched to the 30-day windows opened by the same customer's
    orders; aggregated per event_type. Oracle is the plain inequality
    join (fine at gate scale; the binned equi-join is the 100-TB
    plan)."""
    from ..operators.joins import range_join_point_in_interval

    ev = _events(spark, sf_dir).select("user_id", "event_type", "event_id", "ts")
    win = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 3 DAYS")).alias("w_end"),
            F.col("event_id").alias("window_id"),
        )
    )
    j = range_join_point_in_interval(
        ev, win, on="user_id", point_ts="ts", start_ts="w_start", end_ts="w_end",
        bin_seconds=86_400,
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("event_id").alias("n_events"),
        F.countDistinct("window_id").alias("n_windows"),
    )


def agg_time_rollup(spark, sf_dir):
    """Hypertable-style time rollup: one pass produces hourly, daily,
    and grand-total aggregates via GROUPING SETS (the continuous-
    aggregate shape, multi-granularity without re-scanning)."""
    ev = _events(spark, sf_dir)
    ev.createOrReplaceTempView("ev_rollup")
    return spark.sql("""
        SELECT date_trunc('hour', ts) AS hour_start,
               date_trunc('day', ts) AS day_start,
               CAST(grouping(date_trunc('hour', ts)) AS INT) AS g_hour,
               CAST(grouping(date_trunc('day', ts)) AS INT) AS g_day,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM ev_rollup
        GROUP BY GROUPING SETS ((date_trunc('hour', ts)),
                                (date_trunc('day', ts)), ())
    """)


def pivot_user_events(spark, sf_dir):
    """Pivot: per-user event-type count matrix (the wide-format export
    shape open-data consumers ask for)."""
    ev = _events(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


def rollup_pricing(spark, sf_dir):
    """ROLLUP over (returnflag, linestatus): subtotal + grand-total
    rows, exact decimal accumulation."""
    li = _t(spark, sf_dir, "lineitem")
    dec = F.col("l_quantity").cast("decimal(18,4)")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def percentiles_value(spark, sf_dir):
    """Exact continuous percentiles of value per event_type (Spark
    `percentile` == DuckDB `quantile_cont`, both linear-interpolated)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


# ------------------------------------------------------------ oracle SQL
CORE_REGISTRY = {
    "cdc_upsert_state": (
        cdc_upsert_state,
        f"""
        WITH c AS ({_CHANGES_SQL}),
        r AS (SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
              FROM c)
        SELECT conv_id, turn_idx, role, text, ts, lsn
        FROM r WHERE rn = 1 AND op <> 'D'
        """,
    ),
    "cdc_replay_merge": (cdc_replay_merge, _FINAL_STATE_SQL),
    "cdc_schema_evolution": (
        cdc_schema_evolution,
        f"""
        WITH c0 AS ({_CHANGES_SQL}),
        split AS (SELECT CAST((max(lsn) + 1) / 2 AS BIGINT) AS s FROM c0),
        c AS (SELECT conv_id, turn_idx,
                     CASE WHEN lsn < (SELECT s FROM split) THEN NULL ELSE role END AS role,
                     text, ts, lsn, op
              FROM c0),
        r AS (SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
              FROM c)
        SELECT conv_id, turn_idx, role, text, ts, lsn
        FROM r WHERE rn = 1 AND op <> 'D'
        """,
    ),
    "cdc_full_refresh": (
        cdc_full_refresh,
        f"""
        WITH c0 AS ({_CHANGES_SQL}),
        split AS (SELECT CAST((max(lsn) + 1) / 2 AS BIGINT) AS s FROM c0),
        c AS (SELECT * FROM c0 WHERE lsn >= (SELECT s FROM split)),
        r AS (SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
              FROM c)
        SELECT conv_id, turn_idx, role, text, ts, lsn
        FROM r WHERE rn = 1 AND op <> 'D'
        """,
    ),
    "cdc_window_dedup": (
        cdc_window_dedup,
        """
        WITH r AS (SELECT user_id, event_type, event_id, ts,
                          row_number() OVER (PARTITION BY user_id, event_type
                                             ORDER BY ts DESC, event_id DESC) AS rn
                   FROM events)
        SELECT user_id, event_type, event_id, ts FROM r WHERE rn = 1
        """,
    ),
    "cdc_route_changes": (
        cdc_route_changes,
        """
        SELECT CASE WHEN c.c_custkey IS NOT NULL THEN 'update' ELSE 'insert' END AS action,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM events e LEFT JOIN (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0) c
          ON e.user_id = c.c_custkey
        GROUP BY 1
        """,
    ),
    "cdc_delete_stale": (
        cdc_delete_stale,
        """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events e
        WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
        GROUP BY event_type
        """,
    ),
    "cdc_except_diff": (
        cdc_except_diff,
        """
        WITH d AS (
          SELECT user_id, event_type FROM events
          EXCEPT ALL
          SELECT user_id, event_type FROM events WHERE event_id % 2 = 0
        )
        SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY event_type
        """,
    ),
    "cdc_changelog_stats": (
        cdc_changelog_stats,
        f"""
        WITH c AS ({_CHANGES_SQL})
        SELECT op, CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
               CAST(min(lsn) AS BIGINT) AS lsn_lo, CAST(max(lsn) AS BIGINT) AS lsn_hi,
               max(ts) AS max_ts
        FROM c GROUP BY op
        """,
    ),
    "cdc_range_prune": (
        cdc_range_prune,
        f"""
        WITH c AS ({_CHANGES_SQL}),
        mx AS (SELECT max(lsn) AS m FROM c),
        r AS (SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
              FROM c)
        SELECT conv_id, turn_idx, role, text, ts, lsn
        FROM r, mx
        WHERE rn = 1 AND op <> 'D'
          AND lsn >= (2 * mx.m) // 5 AND lsn <= (3 * mx.m) // 5
        """,
    ),
    "t_json_extract": (
        t_json_extract,
        """
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
        """,
    ),
    "t_surrogate_key": (
        t_surrogate_key,
        """
        SELECT doc_id, source,
               CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS objectid
        FROM documents
        """,
    ),
    "t_geometry_promote": (
        t_geometry_promote,
        f"""
        WITH {_GEOM_SQL},
        e AS (
          SELECT doc_id, shape,
                 CASE WHEN regexp_extract(shape, '^SRID=(\\d+);', 1) = '' THEN NULL
                      ELSE CAST(regexp_extract(shape, '^SRID=(\\d+);', 1) AS INT) END AS srid0,
                 regexp_extract(shape, '^(SRID=\\d+;)', 1) AS pfx,
                 regexp_replace(shape, '^SRID=\\d+;', '') AS body
          FROM geoms
        ),
        pt AS (
          SELECT doc_id,
                 regexp_extract(body, '^POINT\\s*\\(\\s*(-?[\\d.]+)\\s+(-?[\\d.]+)\\s*\\)', 1) AS xs,
                 regexp_extract(body, '^POINT\\s*\\(\\s*(-?[\\d.]+)\\s+(-?[\\d.]+)\\s*\\)', 2) AS ys
          FROM e
        )
        SELECT e.doc_id,
               CASE WHEN srid0 = 300001 THEN 2272 ELSE srid0 END AS srid,
               pfx || CASE
                 WHEN regexp_matches(body, '^POLYGON\\s*\\(')
                   THEN 'MULTIPOLYGON (' || regexp_replace(body, '^POLYGON\\s*', '') || ')'
                 WHEN regexp_matches(body, '^LINESTRING\\s*\\(')
                   THEN 'MULTILINESTRING (' || regexp_replace(body, '^LINESTRING\\s*', '') || ')'
                 ELSE body END AS shape,
               CASE WHEN pt.ys = '' THEN NULL ELSE CAST(pt.ys AS DOUBLE) END AS lat,
               CASE WHEN pt.xs = '' THEN NULL ELSE CAST(pt.xs AS DOUBLE) END AS lng
        FROM e JOIN pt ON pt.doc_id = e.doc_id
        """,
    ),
    "t_esri_json": (
        t_esri_json,
        f"""
        WITH {_GEOM_SQL},
        e AS (
          SELECT doc_id, shape,
                 CASE WHEN regexp_extract(shape, '^SRID=(\\d+);', 1) = '' THEN NULL
                      ELSE CAST(regexp_extract(shape, '^SRID=(\\d+);', 1) AS INT) END AS srid0,
                 regexp_replace(shape, '^SRID=\\d+;', '') AS body
          FROM geoms
        ),
        r AS (
          SELECT doc_id, body,
                 CAST(CASE WHEN srid0 = 300001 THEN 2272 ELSE srid0 END AS VARCHAR) AS srid,
                 regexp_extract(body, '^POINT\\s*\\(\\s*(-?[\\d.]+)\\s+(-?[\\d.]+)\\s*\\)', 1) AS xs,
                 regexp_extract(body, '^POINT\\s*\\(\\s*(-?[\\d.]+)\\s+(-?[\\d.]+)\\s*\\)', 2) AS ys,
                 regexp_replace(regexp_replace(
                   regexp_extract(body, '^POLYGON\\s*\\((.*)\\)\\s*$', 1),
                   '^\\s*\\(', ''), '\\)\\s*$', '') AS rings_src,
                 regexp_extract(body, '^LINESTRING\\s*\\((.*)\\)\\s*$', 1) AS path_src
          FROM e
        )
        SELECT doc_id,
          CASE
            WHEN body LIKE '%EMPTY%' THEN NULL
            WHEN regexp_matches(body, '^POINT\\s*\\(')
              THEN '{{"x":' || xs || ',"y":' || ys || ',"spatialReference":{{"wkid":' || srid || '}}}}'
            WHEN regexp_matches(body, '^POLYGON\\s*\\(\\(')
              THEN '{{"rings":[' ||
                   array_to_string(list_transform(
                     regexp_split_to_array(rings_src, '\\)\\s*,\\s*\\('),
                     r -> '[' || array_to_string(list_transform(
                            regexp_split_to_array(r, ',\\s*'),
                            p -> '[' || replace(trim(p), ' ', ',') || ']'), ',') || ']'),
                   ',')
                   || '],"spatialReference":{{"wkid":' || srid || '}}}}'
            WHEN regexp_matches(body, '^LINESTRING\\s*\\(')
              THEN '{{"paths":[[' ||
                   array_to_string(list_transform(
                     regexp_split_to_array(path_src, ',\\s*'),
                     p -> '[' || replace(trim(p), ' ', ',') || ']'), ',')
                   || ']],"spatialReference":{{"wkid":' || srid || '}}}}'
            ELSE NULL END AS esri_json
        FROM r
        """,
    ),
    "t_batch_enrich": (
        t_batch_enrich,
        """
        SELECT c_mktsegment,
               '19' || CAST(100 + c_custkey % 100 AS VARCHAR) AS zip,
               CAST(count(*) AS BIGINT) AS n
        FROM customer GROUP BY 1, 2
        """,
    ),
    "k_dead_letter": (
        k_dead_letter,
        f"""
        WITH c0 AS ({_CHANGES_SQL}),
        c AS (SELECT conv_id, lsn, CASE WHEN lsn % 97 = 0 THEN 'X' ELSE op END AS op FROM c0)
        SELECT op, CAST(count(*) AS BIGINT) AS n_bad,
               CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
               CAST(min(lsn) AS BIGINT) AS lsn_lo, CAST(max(lsn) AS BIGINT) AS lsn_hi
        FROM c WHERE op = 'X' GROUP BY op
        """,
    ),
    "s_csv_fallback": (
        s_csv_fallback,
        """
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name || 'é' AS name
        FROM nation
        """,
    ),
    "s_paged_rest": (
        s_paged_rest,
        """
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation
        """,
    ),
    "q1_pricing_summary": (
        q1_pricing_summary,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
                    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(28,8))) AS DOUBLE) AS sum_disc_price,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """,
    ),
    "q3_top_unshipped": (
        q3_top_unshipped,
        """
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
                    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(28,8))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY round(revenue, 4) DESC, o_orderkey ASC
        LIMIT 10
        """,
    ),
    "q5_nation_revenue": (
        q5_nation_revenue,
        """
        SELECT r_name, n_name,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
                    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(28,8))) AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        """,
    ),
    "topk_parts_per_brand": (
        topk_parts_per_brand,
        """
        WITH agg AS (
          SELECT p_brand, p_partkey,
                 CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
                      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(28,8))) AS DOUBLE) AS revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand, p_partkey
        )
        SELECT p_brand, p_partkey, revenue,
               CAST(rank AS INT) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY p_brand
                       ORDER BY round(revenue, 4) DESC, p_partkey ASC) AS rank
              FROM agg)
        WHERE rank <= 3
        """,
    ),
    "pivot_user_events": (
        pivot_user_events,
        """
        SELECT user_id,
               CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
               CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
               CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
        FROM events GROUP BY user_id
        """,
    ),
    "rollup_pricing": (
        rollup_pricing,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
    ),
    "percentiles_value": (
        percentiles_value,
        """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.95), 6) AS p95,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events GROUP BY event_type
        """,
    ),
    "t_reproject": (t_reproject, None),  # filled below (shared LCC SQL)
    "t_parse_datetime": (
        t_parse_datetime,
        """
        WITH p AS (
          SELECT strptime(strftime(ts, '%m/%d/%Y %I:%M %p'),
                          '%m/%d/%Y %I:%M %p') AS parsed
          FROM events
        )
        SELECT CAST(extract(hour FROM parsed + INTERVAL 5 HOUR) AS INT) AS local_hour,
               CAST(count(parsed) AS BIGINT) AS n_parsed,
               min(parsed) AS min_ts,
               max(parsed) AS max_ts
        FROM p GROUP BY 1
        """,
    ),
    "sessionize_events": (
        sessionize_events,
        """
        WITH g AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT user_id,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM g
        ),
        per AS (
          SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events
          FROM s GROUP BY user_id, session_id
        )
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(max(n_events) AS BIGINT) AS max_session_events,
               CAST(sum(n_events) AS BIGINT) AS n_events
        FROM per GROUP BY user_id
        """,
    ),
    "range_join_order_windows": (
        range_join_order_windows,
        """
        SELECT e.event_type,
               CAST(count(*) AS BIGINT) AS n_matches,
               CAST(count(DISTINCT e.event_id) AS BIGINT) AS n_events,
               CAST(count(DISTINCT w.event_id) AS BIGINT) AS n_windows
        FROM events e
        JOIN (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'signup') w
          ON w.user_id = e.user_id
         AND e.ts >= w.ts
         AND e.ts < w.ts + INTERVAL 3 DAY
        GROUP BY e.event_type
        """,
    ),
    "asof_join_orders": (
        asof_join_orders,
        """
        WITH j AS (
          SELECT e.event_type, x.o_totalprice, x.o_orderkey
          FROM events e
          LEFT JOIN LATERAL (
            SELECT o_totalprice, o_orderkey
            FROM orders o
            WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
            LIMIT 1
          ) x ON true
        )
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(count(o_orderkey) AS BIGINT) AS n_with_order,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
               CAST(max(o_orderkey) AS BIGINT) AS max_orderkey
        FROM j GROUP BY event_type
        """,
    ),
}


def _reproject_oracle_sql() -> str:
    """The oracle runs the IDENTICAL expression string the Spark plan
    executes (operators/geo.py builds both) — cross-engine agreement
    by construction, not by tolerance."""
    from ..operators.geo import lcc_2272_inverse_sql

    x = "CAST(2200000 + (doc_id % 1000) * 800 AS DOUBLE)"
    y = "CAST(100000 + ((doc_id * 7) % 1000) * 400 AS DOUBLE)"
    lng_sql, lat_sql = lcc_2272_inverse_sql(x, y)
    return f"SELECT doc_id, {lat_sql} AS lat, {lng_sql} AS lng FROM documents"


CORE_REGISTRY["t_reproject"] = (t_reproject, _reproject_oracle_sql())

# Queries curated OUT of the driver's 50-row gate cap to make room for
# new operator families (round 4: IVF ANN, the BMP codec, and manifest
# range pruning replaced these three, whose semantics are redundant with
# still-registered rows — stream_session_counts shares sessionize_events'
# oracle, t_scrub_sanitize's legs are covered by text/clean transforms in
# pytest, agg_time_rollup's grouping sets by rollup_pricing). They remain
# fully implemented and oracle-checked by tests/test_curated_out.py.
CURATED_OUT_CORE = {
    "t_scrub_sanitize": (
        t_scrub_sanitize,
        """
        WITH c AS (
          SELECT doc_id, text,
                 NULLIF(regexp_replace(text || ' <"é"> ',
                        '[^\\x20-\\x7E]|[''"<>]', '', 'g'), '') AS remote_text
          FROM documents
        )
        SELECT doc_id,
               regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g') AS clean_text,
               CAST(length(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS INT) AS clean_len,
               remote_text,
               CAST(length(remote_text) AS INT) AS remote_len
        FROM c
        """,
    ),
    "stream_session_counts": (
        stream_session_counts,
        """
        WITH g AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT user_id,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM g
        ),
        per AS (
          SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events
          FROM s GROUP BY user_id, session_id
        )
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(max(n_events) AS BIGINT) AS max_session_events,
               CAST(sum(n_events) AS BIGINT) AS n_events
        FROM per GROUP BY user_id
        """,
    ),
    "agg_time_rollup": (
        agg_time_rollup,
        """
        SELECT date_trunc('hour', ts) AS hour_start,
               date_trunc('day', ts) AS day_start,
               CAST(grouping(date_trunc('hour', ts)) AS INT) AS g_hour,
               CAST(grouping(date_trunc('day', ts)) AS INT) AS g_day,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY GROUPING SETS ((date_trunc('hour', ts)),
                                (date_trunc('day', ts)), ())
        """,
    ),
}
