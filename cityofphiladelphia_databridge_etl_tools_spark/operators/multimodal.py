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


# ---------------------------------------------------------------- BMP codec
# The IMAGE analogue of the WAV path: 24-bit uncompressed BMP is a
# fixed-layout public container (14-byte file header + 40-byte
# BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes), so a real
# encode / decode / resize / feature-extract pipeline runs here with
# zero external libraries — numpy does the pixel math inside
# Arrow-batched mapInPandas, exactly the shape a JPEG/PNG pipeline
# takes once a codec library exists.

BMP_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


def _bmp_bytes(pixels) -> bytes:
    """(h, w, 3) uint8 RGB array → 24-bit uncompressed BMP bytes."""
    import struct

    import numpy as np

    h, w = pixels.shape[0], pixels.shape[1]
    row_len = w * 3
    pad = (-row_len) % 4
    # BGR order, bottom-up rows, per-row padding
    bgr = pixels[::-1, :, ::-1]
    if pad:
        rows = np.zeros((h, row_len + pad), dtype=np.uint8)
        rows[:, :row_len] = bgr.reshape(h, row_len)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
    return hdr + info + body


def _bmp_pixels(b):
    """BMP bytes → (h, w, 3) uint8 RGB array, or None if malformed /
    not a 24-bit uncompressed bottom-up BMP."""
    import struct

    import numpy as np

    if b is None or len(b) < 54 or b[:2] != b"BM":
        return None
    offset = struct.unpack("<I", b[10:14])[0]
    hsize, w, h = struct.unpack("<Iii", b[14:26])
    planes, bpp = struct.unpack("<HH", b[26:30])
    compression = struct.unpack("<I", b[30:34])[0]
    if hsize < 40 or bpp != 24 or compression != 0 or w <= 0 or h <= 0:
        return None
    stride = (w * 3 + 3) // 4 * 4
    if len(b) < offset + stride * h:
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1]  # bottom-up BGR → top-down RGB


def encode_bmp24(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic 24-bit BMP blobs from the documents fixture (the
    encode leg): width/height and the pixel pattern derive from the
    row, so every downstream number is reproducible. Real BMP layout —
    any image viewer opens these."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                mid = int(mid)
                w = 4 + mid % 13  # varies row padding 0-3 across rows
                h = 3 + mid % 7
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                r = (x * y + len(text or "")) % 256
                g = (mid * 3 + y + 0 * x) % 256
                b = (mid + x + 0 * y) % 256
                px = np.stack(
                    [np.broadcast_to(c, (h, w)) for c in (r, g, b)], axis=-1
                ).astype(np.uint8)
                blobs.append(_bmp_bytes(px))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "kind": "image",
                    "payload": blobs,
                    "mime": "image/bmp",
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=MEDIA_SCHEMA)


def decode_bmp_meta(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL image decode + feature extraction, zero external deps:
    parses the BMP container and computes per-channel means with numpy
    over the pixel array (the feature-extract leg a CLIP-style
    pipeline would replace with an embedding forward pass). Malformed
    blobs surface as NULL rows instead of failing the task."""

    def parse(b):
        px = _bmp_pixels(b)
        if px is None:
            return (None,) * 6
        # channel means stay UNROUNDED: they are exact rationals
        # (integer pixel sum / n, both exactly computed in double), so
        # any engine reproduces them bit-for-bit — while a decimal
        # round would hit exact-.5 ties whenever w*h is a power of two
        # and round-half-even vs round-half-up then diverge.
        means = px.reshape(-1, 3).mean(axis=0)
        return (
            len(b), px.shape[1], px.shape[0],
            float(means[0]), float(means[1]), float(means[2]),
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse(b) for b in pdf[payload_col]]
            cols = list(zip(*parsed)) if parsed else [[]] * 6
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": pd.array(cols[0], dtype="Int64"),
                    "width": pd.array(cols[1], dtype="Int64"),
                    "height": pd.array(cols[2], dtype="Int64"),
                    "mean_r": pd.array(cols[3], dtype="float64"),
                    "mean_g": pd.array(cols[4], dtype="float64"),
                    "mean_b": pd.array(cols[5], dtype="float64"),
                }
            )

    return media.mapInPandas(run, schema=BMP_META_SCHEMA)


def resize_bmp(
    media: DataFrame, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """REAL image resize (nearest-neighbor) producing fresh BMP blobs —
    the thumbnail/normalize step of a training-data pipeline, as
    vectorized numpy index-gather per Arrow batch. Malformed inputs
    pass through as NULL payloads."""
    import numpy as np

    def one(b):
        px = _bmp_pixels(b)
        if px is None:
            return None
        h, w = px.shape[0], px.shape[1]
        yi = (np.arange(height) * h) // height
        xi = (np.arange(width) * w) // width
        return _bmp_bytes(px[yi][:, xi])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": "image",
                    "payload": [one(b) for b in pdf[payload_col]],
                    "mime": "image/bmp",
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def _try_import(name: str):
    try:
        return __import__(name)
    except ImportError:
        return None


def decode_image(media: DataFrame, resize_to: tuple[int, int] | None = None) -> DataFrame:
    """Compressed-image decode (+optional resize). JPEG/PNG need a
    codec library (Pillow), absent in this container — the REAL
    runnable image path is the zero-dependency BMP pipeline above
    (encode_bmp24 / decode_bmp_meta / resize_bmp), which exercises the
    identical Spark-side plumbing."""
    if _try_import("PIL") is None:
        raise NotImplementedError(
            "JPEG/PNG decode requires Pillow, not present in this "
            "environment; use the BMP pipeline (decode_bmp_meta) for the "
            "runnable real-codec path"
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
