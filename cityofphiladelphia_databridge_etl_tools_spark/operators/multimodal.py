"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so each task processes a columnar batch of
blobs without per-row Python dispatch.

The actual codec calls are STUBBED (no image/audio libs in this
container): ``decode_image``/``decode_audio`` raise
NotImplementedError unless a library is importable, and
``fake_decode_meta`` provides a deterministic byte-level stand-in so
the Spark-side plumbing (schema, batch iteration, partitioning) is
real and tested end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("header_byte", T.IntegerType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
        T.StructField("checksum", T.LongType(), True),
    ]
)


def docs_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table from the documents fixture: utf-8
    bytes of the text as the blob (test stand-in for real media)."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _fake_meta_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    payloads = pdf["payload"]
    n_bytes = payloads.map(lambda b: len(b) if b is not None else None)
    header = payloads.map(lambda b: b[0] if b else None)
    checksum = payloads.map(lambda b: sum(b) if b is not None else None)
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "n_bytes": n_bytes,
            "header_byte": header,
            "fake_width": n_bytes.map(lambda n: None if n is None else n % 640),
            "fake_height": n_bytes.map(lambda n: None if n is None else n % 480),
            "checksum": checksum,
        }
    )


def extract_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads — the
    decode-adjacent op that IS runnable here. Batches arrive as pandas
    DataFrames (vectorized), one iterator per partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_meta_batch(pdf)

    return media.mapInPandas(run, schema=META_SCHEMA)


def _try_import(name: str):
    try:
        return __import__(name)
    except ImportError:
        return None


def decode_image(media: DataFrame, resize_to: tuple[int, int] | None = None) -> DataFrame:
    """Real image decode (+optional resize) → (media_id, width, height,
    mean_r, mean_g, mean_b). Requires PIL; stubbed in this container."""
    if _try_import("PIL") is None:
        raise NotImplementedError(
            "image decode requires Pillow, not present in this environment; "
            "use extract_meta() for the runnable byte-level path"
        )
    raise NotImplementedError("wire PIL.Image.open over payload batches here")


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame sampling stub — requires a video codec (av/ffmpeg)."""
    if _try_import("av") is None:
        raise NotImplementedError(
            "video frame sampling requires PyAV, not present in this environment"
        )
    raise NotImplementedError("wire av.open over payload batches here")


def decode_audio(media: DataFrame, target_sr: int = 16000) -> DataFrame:
    """Audio decode/resample stub — requires soundfile/librosa."""
    if _try_import("soundfile") is None:
        raise NotImplementedError(
            "audio decode requires soundfile, not present in this environment"
        )
    raise NotImplementedError("wire soundfile.read over payload batches here")
