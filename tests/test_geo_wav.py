"""Closed-form EPSG:2272→4326 reprojection and the real WAV codec
path (the two round-2 additions with external ground truth)."""

import math

import pyspark.sql.functions as F
from pyspark.sql import types as T

from cityofphiladelphia_databridge_etl_tools_spark.operators import multimodal as MM
from cityofphiladelphia_databridge_etl_tools_spark.operators.geo import (
    LAT0,
    LON0_DEG,
    lcc_2272_forward,
    reproject_2272_to_4326,
)


def test_reproject_false_origin_anchor(spark):
    """At the projection's false origin (E'=N'=0) the inverse must
    return exactly the EPSG defining parameters — validates every
    derived constant without external ground truth."""
    df = spark.createDataFrame([(1968500.0, 0.0)], "x double, y double")
    r = reproject_2272_to_4326(df, "x", "y", round_digits=9).collect()[0]
    assert abs(r["lng"] - LON0_DEG) < 1e-9
    assert abs(r["lat"] - math.degrees(LAT0)) < 1e-9


def test_reproject_roundtrips_forward_projection(spark):
    """Inverse(forward(p)) == p across the PA South zone, through the
    actual Spark column expressions."""
    pts = [(39.9526, -75.1652), (40.5, -76.0), (39.75, -80.2), (40.9, -74.8)]
    rows = [lcc_2272_forward(lat, lon) + (lat, lon) for lat, lon in pts]
    df = spark.createDataFrame(rows, "x double, y double, lat0 double, lng0 double")
    out = reproject_2272_to_4326(df, "x", "y", round_digits=9).collect()
    for r in out:
        assert abs(r["lat"] - r["lat0"]) < 1e-8, r
        assert abs(r["lng"] - r["lng0"]) < 1e-8, r
    # Philadelphia City Hall sanity: the forward leg lands where the
    # published state-plane coordinates say it should (~2,693,000 E)
    x, y = lcc_2272_forward(39.9526, -75.1652)
    assert 2_600_000 < x < 2_750_000 and 150_000 < y < 300_000


def test_wav_encode_decode_roundtrip(spark):
    docs = spark.createDataFrame(
        [(i, "x" * (i * 37 % 900)) for i in range(60)], "doc_id long, text string"
    )
    out = MM.decode_wav_meta(MM.encode_wav_pcm16(docs)).collect()
    assert len(out) == 60
    for r in out:
        i = r["media_id"]
        assert r["channels"] == 1 + i % 2
        assert r["sample_rate"] == 8000 * (1 + i % 3)
        assert r["bits"] == 16
        ns = 1 + (i * 37 % 900) % 400
        assert r["n_samples"] == ns
        assert r["n_bytes"] == 44 + ns * r["channels"] * 2
        assert r["duration_us"] == ns * 1_000_000 // r["sample_rate"]


def test_wav_decode_malformed_is_null_not_fatal(spark):
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(b"not a wav at all"), "audio/wav"),
            (2, "audio", None, "audio/wav"),
            (3, "audio", bytearray(b"RIFF\x00\x00\x00\x00WAVEjunk"), "audio/wav"),
        ],
        MM.MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in MM.decode_wav_meta(media).collect()}
    assert len(out) == 3
    for r in out.values():
        assert r["sample_rate"] is None and r["n_samples"] is None


def test_paged_rest_buffer_is_bounded(spark, tmp_path):
    """10^5 fake rows through the paged source: the driver buffer
    never holds more than flush_rows + one page (the round-1 version
    accumulated the entire corpus in a list)."""
    from cityofphiladelphia_databridge_etl_tools_spark.sources import paged_rest_source

    n, page, flush = 100_000, 1_000, 5_000
    peak = {"rows_alive": 0}

    class TrackedDict(dict):
        live = 0

        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            TrackedDict.live += 1
            peak["rows_alive"] = max(peak["rows_alive"], TrackedDict.live)

        def __del__(self):
            TrackedDict.live -= 1

    def fetch_page(offset):
        hi = min(offset + page, n)
        return [TrackedDict(i=i, v=f"v{i}") for i in range(offset, hi)]

    schema = T.StructType(
        [T.StructField("i", T.LongType()), T.StructField("v", T.StringType())]
    )
    df = paged_rest_source(
        spark, fetch_page, schema, page_size=page, flush_rows=flush,
        spill_dir=str(tmp_path / "spill"),
    )
    assert df.count() == n
    assert df.agg(F.sum("i")).collect()[0][0] == n * (n - 1) // 2
    # bounded: far below the full corpus (allow slack for GC timing
    # and per-flush createDataFrame copies)
    assert peak["rows_alive"] <= flush + 2 * page + 1000, peak


def test_bmp_codec_roundtrip_and_resize(spark, sf_dir):
    """Real zero-dependency IMAGE path: encode 24-bit BMPs, decode the
    container back (dims + per-channel means vs an independent numpy
    reference), and nearest-neighbor resize — an exact 2x upscale
    replicates every pixel 2x2, so per-channel means are preserved
    EXACTLY; downscale dims land on target."""
    import numpy as np

    from cityofphiladelphia_databridge_etl_tools_spark.operators.multimodal import (
        decode_bmp_meta, encode_bmp24, resize_bmp,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    media = encode_bmp24(docs)
    meta = {r["media_id"]: r for r in decode_bmp_meta(media).collect()}
    assert set(meta) == set(rows)
    for mid, text in rows.items():
        w, h = 4 + mid % 13, 3 + mid % 7
        m = meta[mid]
        assert (m["width"], m["height"]) == (w, h)
        x = np.arange(w)[None, :]; y = np.arange(h)[:, None]
        r = np.broadcast_to((x * y + len(text or "")) % 256, (h, w))
        g = np.broadcast_to((mid * 3 + y + 0 * x) % 256, (h, w))
        b = np.broadcast_to((mid + x + 0 * y) % 256, (h, w))
        assert m["mean_r"] == float(r.mean())
        assert m["mean_g"] == float(g.mean())
        assert m["mean_b"] == float(b.mean())

    # exact 2x upscale of one known image preserves channel means
    one = media.filter(F.col("media_id") == list(rows)[0])
    mid0 = list(rows)[0]
    w0, h0 = 4 + mid0 % 13, 3 + mid0 % 7
    up = decode_bmp_meta(resize_bmp(one, 2 * w0, 2 * h0)).collect()[0]
    base = meta[mid0]
    assert (up["width"], up["height"]) == (2 * w0, 2 * h0)
    assert (up["mean_r"], up["mean_g"], up["mean_b"]) == (
        base["mean_r"], base["mean_g"], base["mean_b"]
    )
    # downscale to fixed thumbnail dims
    thumb = decode_bmp_meta(resize_bmp(media, 4, 3)).collect()
    assert all((t["width"], t["height"]) == (4, 3) for t in thumb)

    # malformed payloads surface as NULL rows, not task failures
    bad = spark.createDataFrame(
        [(999, "image", bytearray(b"NOTABMP"), "image/bmp")], MEDIA_SCHEMA_DDL
    )
    got = decode_bmp_meta(bad).collect()[0]
    assert got["width"] is None and got["mean_r"] is None


MEDIA_SCHEMA_DDL = "media_id long, kind string, payload binary, mime string"
