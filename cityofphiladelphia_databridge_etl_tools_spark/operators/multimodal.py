"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so each task processes a columnar batch of
blobs without per-row Python dispatch.

One codec path is REAL: PCM WAV needs no external library (the RIFF
container is a fixed-layout header + raw samples), so
``encode_wav_pcm16``/``decode_wav_meta`` do actual byte-level
encode/decode inside Arrow-batched ``mapInPandas``. Library-backed
codecs (JPEG via PIL, video via av, compressed audio via soundfile)
are stubbed behind import guards — those libs aren't in this
container — with ``extract_meta`` as the runnable byte-level
stand-in, so the Spark-side plumbing (schema, batch iteration,
partitioning) is real and tested end-to-end either way.
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


WAV_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("channels", T.LongType(), True),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("bits", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_us", T.LongType(), True),
    ]
)


def encode_wav_pcm16(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic PCM-16 WAV blobs from the documents fixture
    (the encode leg of the runnable codec path): sample rate,
    channel count, and sample count derive from the row, payload is
    silence. Real RIFF/fmt/data layout — any WAV reader decodes it."""
    import struct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                mid = int(mid)
                rate = 8000 * (1 + mid % 3)
                channels = 1 + mid % 2
                n_samples = 1 + len(text or "") % 400
                data = b"\x00" * (n_samples * channels * 2)
                hdr = (
                    b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                    + b"fmt " + struct.pack(
                        "<IHHIIHH", 16, 1, channels, rate,
                        rate * channels * 2, channels * 2, 16,
                    )
                    + b"data" + struct.pack("<I", len(data))
                )
                blobs.append(hdr + data)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "kind": "audio",
                    "payload": blobs,
                    "mime": "audio/wav",
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=MEDIA_SCHEMA)


def decode_wav_meta(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio decode (container parse) with zero external deps:
    validates the RIFF magic and unpacks the fmt/data chunks —
    channels, sample rate, bit depth, sample count, duration. Arrow
    batches in, columnar out; malformed blobs surface as NULL rows
    instead of failing the task (dead-letter downstream if needed)."""
    import struct

    def parse(b) -> tuple:
        if b is None or len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return (None,) * 6
        # fmt chunk at offset 12 in canonical files; walk chunks to be
        # container-correct rather than layout-lucky
        pos, fmt, data_len = 12, None, None
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            (size,) = struct.unpack("<I", b[pos + 4:pos + 8])
            if cid == b"fmt " and size >= 16:
                fmt = struct.unpack("<HHIIHH", b[pos + 8:pos + 24])
            elif cid == b"data":
                data_len = size
            pos += 8 + size + (size & 1)
        if fmt is None or data_len is None:
            return (None,) * 6
        _audio_fmt, channels, rate, _byte_rate, block_align, bits = fmt
        if block_align == 0:
            return (None,) * 6
        n_samples = data_len // block_align
        return (
            len(b), channels, rate, bits, n_samples,
            n_samples * 1_000_000 // rate if rate else None,
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse(b) for b in pdf[payload_col]]
            cols = list(zip(*parsed)) if parsed else [[]] * 6
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": pd.array(cols[0], dtype="Int64"),
                    "channels": pd.array(cols[1], dtype="Int64"),
                    "sample_rate": pd.array(cols[2], dtype="Int64"),
                    "bits": pd.array(cols[3], dtype="Int64"),
                    "n_samples": pd.array(cols[4], dtype="Int64"),
                    "duration_us": pd.array(cols[5], dtype="Int64"),
                }
            )

    return media.mapInPandas(run, schema=WAV_META_SCHEMA)


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
