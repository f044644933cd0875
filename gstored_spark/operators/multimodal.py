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


# ---- real pure-python codecs: uncompressed 24-bit BMP, PCM16 WAV -----------
#
# These two formats need no codec library, so the decode stage is REAL for
# them — header parse + numpy reshape. Other formats (JPEG/PNG/MP3) still
# require PIL/ffmpeg and keep the clearly-marked deterministic fake.


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """RGB (row-major, top-down) -> uncompressed 24-bit BMP bytes
    (BITMAPINFOHEADER, bottom-up rows, BGR pixels, 4-byte row padding)."""
    import struct

    assert len(rgb) == width * height * 3
    row = width * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for y in range(height - 1, -1, -1):
        r = rgb[y * row : (y + 1) * row]
        # RGB -> BGR per pixel
        bgr = bytearray()
        for x in range(width):
            bgr += bytes((r[3 * x + 2], r[3 * x + 1], r[3 * x]))
        body += bgr + b"\x00" * pad
    img_size = len(body)
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + dib + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Uncompressed 24-bit BMP -> (width, height, top-down RGB bytes)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp, = struct.unpack_from("<H", payload, 28)
    comp, = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp}, comp={comp})")
    bottom_up = height > 0
    height = abs(height)
    row = width * 3
    stride = row + (4 - row % 4) % 4
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=offset)
    rows = data.reshape(height, stride)[:, :row].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return width, height, rows[:, :, ::-1].tobytes()  # BGR -> RGB


def encode_wav(sample_rate: int, samples: "np.ndarray") -> bytes:
    """mono int16 samples -> PCM16 WAV bytes."""
    import struct

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1,
        sample_rate, sample_rate * 2, 2, 16, b"data", len(pcm),
    )
    return hdr + pcm


def decode_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    """PCM16 WAV -> (sample_rate, mono-flattened int16 samples). Walks RIFF
    chunks, so extra chunks (LIST etc.) are tolerated."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt != 1 or bits != 16:
                raise NotImplementedError(f"only PCM16 WAV (fmt={fmt}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, np.frombuffer(data, dtype="<i2")


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, bytes]:
    """Decode an image payload to (width, height, RGB bytes).

    REAL for uncompressed 24-bit BMP (pure-python header parse + numpy —
    no codec library needed). Other formats need PIL/libjpeg, absent in
    this container: with ``fake=True`` they return a deterministic 4x4 gray
    ramp derived from the payload bytes so the distributed plumbing stays
    testable end to end; with ``fake=False`` they raise.
    """
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    try:
        import PIL.Image  # noqa: F401  (absent here; present on a real cluster)
    except ImportError:
        if not fake:
            raise NotImplementedError(
                "non-BMP image decode requires PIL; pass fake=True for the stub"
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


AUDIO_SCHEMA = "media_id long, sample_rate int, n_samples long, rms double"
PIXSTAT_SCHEMA = "media_id long, width int, height int, mean_r double, mean_g double, mean_b double"


def decoded_audio(df: DataFrame) -> DataFrame:
    """REAL audio decode for PCM16 WAV payloads -> per-clip sample stats.
    Map-only Arrow batches; raises on non-WAV payloads (no silent fake)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = decode_wav(bytes(payload))
                rms = (
                    float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                    if samples.size
                    else 0.0
                )
                rows.append((int(mid), int(rate), int(samples.size), round(rms, 6)))
            yield pd.DataFrame(
                rows, columns=["media_id", "sample_rate", "n_samples", "rms"]
            )

    return df.filter(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        gen, schema=AUDIO_SCHEMA
    )


def image_pixel_stats(decoded: DataFrame) -> DataFrame:
    """decoded_images output -> per-channel pixel means (numpy reshape over
    the RGB byte buffer; map-only)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, w, h, px in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["pixels"]
            ):
                arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(int(h), int(w), 3)
                m = arr.reshape(-1, 3).mean(axis=0)
                rows.append((int(mid), int(w), int(h), float(m[0]), float(m[1]), float(m[2])))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_r", "mean_g", "mean_b"]
            )

    return decoded.mapInPandas(gen, schema=PIXSTAT_SCHEMA)


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
    """Deterministic media table for tests/benchmarks. Image rows carry
    REAL uncompressed 24-bit BMPs, audio rows REAL PCM16 WAVs (both decoded
    by the pure-python codecs above, no fake flag needed); video rows keep
    opaque bytes (ffmpeg genuinely absent -> stub path)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w, h = 4 + (i % 5), 3 + (i % 4)
            rgb = bytes(((i * 7 + j) % 256) for j in range(w * h * 3))
            payload, meta = encode_bmp(w, h, rgb), ("image/bmp", w, h, 0)
        elif kind == "audio":
            sr = 8000
            t = np.arange(sr // 4, dtype=np.float64)
            samples = (1000 * np.sin(2 * np.pi * (220 + i) * t / sr)).astype(np.int16)
            payload, meta = encode_wav(sr, samples), ("audio/wav", 0, 0, 250)
        else:
            payload = f"payload-{i}".encode() + b"x" * 64
            meta = ("application/octet-stream", i % 640, i % 480, (i % 5 + 1) * 1000)
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
