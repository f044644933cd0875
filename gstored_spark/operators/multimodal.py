"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as Arrow
pandas UDFs over ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is stubbed
behind ``NotImplementedError`` with a clearly-marked deterministic fake
(``fake=True``) — but the Spark-side plumbing (schemas, batch shapes, UDF
signatures, partitioning) is real and tested: this is exactly how the stage
would run with PIL/ffmpeg importable on the cluster.

Media table schema:
  media(media_id long, kind string, payload binary,
        meta struct<mime:string, width:int, height:int, duration_ms:int>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, n_bytes long, byte_mean double, byte_entropy double"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary"
DECODE_SCHEMA = "media_id long, width int, height int, pixels binary"


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, bytes]:
    """Decode an image payload to (width, height, RGB bytes).

    STUB: real decoding needs PIL/libjpeg, absent in this container. With
    ``fake=True`` returns a deterministic 4x4 gray ramp derived from the
    payload bytes so the distributed plumbing is testable end to end.
    """
    try:
        import PIL.Image  # noqa: F401  (absent here; present on a real cluster)
    except ImportError:
        if not fake:
            raise NotImplementedError(
                "image decode requires PIL; pass fake=True for the deterministic stub"
            )
        seed = sum(payload[:16]) % 251 if payload else 0
        px = bytes(((seed + i) % 256) for i in range(4 * 4 * 3))
        return 4, 4, px
    raise NotImplementedError("real PIL path not wired in this sandbox")


def byte_features(df: DataFrame) -> DataFrame:
    """Real (non-stub) feature extraction: byte histogram stats via numpy
    over Arrow batches. Map-only, no shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((int(mid), 0, 0.0, 0.0))
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = arr.size
                if n == 0:
                    rows.append((int(mid), 0, 0.0, 0.0))
                    continue
                hist = np.bincount(arr, minlength=256).astype(np.float64) / n
                nz = hist[hist > 0]
                ent = float(-(nz * np.log2(nz)).sum())
                rows.append((int(mid), int(n), float(arr.mean()), round(ent, 6)))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "byte_mean", "byte_entropy"]
            )

    return df.select("media_id", "payload").mapInPandas(gen, schema=FEATURE_SCHEMA)


def decoded_images(df: DataFrame, fake: bool = True) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = decode_image(bytes(payload) if payload is not None else b"", fake=fake)
                rows.append((int(mid), w, h, px))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "pixels"])

    return df.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        gen, schema=DECODE_SCHEMA
    )


def sample_frames(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Frame sampling for video payloads. STUB decode; real batch shape:
    one output row per sampled frame (explode inside the UDF)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                if not fake:
                    raise NotImplementedError("video decode requires ffmpeg")
                n_frames = max(int(dur or 0) // every_ms, 1)
                data = bytes(payload or b"")
                for i in range(n_frames):
                    rows.append((int(mid), i, data[i % max(len(data), 1):][:8] or b"\x00"))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    src = df.filter(F.col("kind") == "video").select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )
    return src.mapInPandas(gen, schema=FRAME_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    rows = spark.range(n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3).cast("int") + 1,
    )
    payload = F.encode(
        F.concat(F.lit("payload-"), F.col("id").cast("string"), F.repeat(F.lit("x"), 64)),
        "utf-8",
    )
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        (F.col("id") % 640).cast("int").alias("width"),
        (F.col("id") % 480).cast("int").alias("height"),
        ((F.col("id") % 5 + 1) * 1000).cast("int").alias("duration_ms"),
    )
    return rows.select(
        F.col("id").alias("media_id"), kind.alias("kind"), payload.alias("payload"), meta.alias("meta")
    )
