"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample
operators over ``mapInPandas``.

The container has no image/audio codecs, so the actual byte decoding is
STUBBED — ``NotImplementedError`` on the real path, a clearly-marked
deterministic fake for tests — but everything Spark-side is real and
tested: schema convention, Arrow batch shape, partition-preserving
iterator plumbing, metadata propagation. Swapping the stub for
PIL/ffmpeg changes only the inner ``_decode_bytes`` function.

Schema convention::

    payload  binary                      -- the raw media bytes
    media    struct<media_type string,   -- 'image' | 'audio' | 'video'
                    format string,       -- 'png', 'wav', ...
                    width int, height int,
                    duration_ms long, sample_rate int>

At 100 TB the payload column dominates storage: operators here never
shuffle payload bytes — decode/extract runs map-side (``mapInPandas``)
and only the (small) derived features ever reach an exchange.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = (
    "media_type string, format string, width int, height int, "
    "duration_ms long, sample_rate int"
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


class CodecUnavailable(NotImplementedError):
    """Raised on the real decode path: media codecs are not shipped in
    this environment (stub boundary — see module docstring)."""


def fake_payloads(df: DataFrame, id_col: str, seed_col: str) -> DataFrame:
    """Deterministic fake media rows for tests/fixtures: payload bytes
    derive from an existing string column; metadata cycles through the
    three media types."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    fmt = F.when(mt == "image", "png").when(mt == "audio", "wav").otherwise("mp4")
    return df.select(
        F.col(id_col),
        F.encode(F.col(seed_col), "utf-8").alias("payload"),
        F.struct(
            mt.alias("media_type"),
            fmt.alias("format"),
            F.when(mt == "image", (F.col(id_col) % 640 + 16).cast("int")).alias("width"),
            F.when(mt == "image", (F.col(id_col) % 480 + 16).cast("int")).alias("height"),
            F.when(mt != "image", (F.col(id_col) * 40 % 90000).cast("long")).alias("duration_ms"),
            F.when(mt == "audio", F.lit(16000).cast("int")).alias("sample_rate"),
        ).alias("media"),
    )


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder+model: expands the
    sha256 of the payload into ``dim`` floats in [-1, 1). NOT a real
    feature — a placeholder with the right shape and determinism."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + counter.to_bytes(4, "big")).digest()
        for i in range(0, len(h) - 1, 2):
            if len(out) >= dim:
                break
            v = int.from_bytes(h[i : i + 2], "big")
            out.append((v / 32768.0) - 1.0)
        counter += 1
    return out


def extract_features(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    dim: int = 16,
    fake: bool = True,
) -> DataFrame:
    """payload -> float feature vector via ``mapInPandas``.

    The iterator contract is the part that matters at scale: one Arrow
    batch in, one out, no per-row Python calls from the JVM, payload
    bytes never widened or shuffled. ``fake=False`` is the real-codec
    path -> :class:`CodecUnavailable`.
    """
    if not fake:
        raise CodecUnavailable("image/audio codecs not available in this build")

    schema = f"{id_col} long, feature array<float>"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "feature": [
                        _fake_decode(bytes(p), dim) for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def decode_image(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """payload -> (width, height, channels, mean_pixel). Real path
    stubbed (:class:`CodecUnavailable`); fake path derives deterministic
    pseudo-dimensions from the payload hash."""
    if not fake:
        raise CodecUnavailable("image codecs not available in this build")

    schema = f"{id_col} long, width int, height int, channels int, mean_pixel double"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for vid, p in zip(pdf[id_col], pdf[payload_col]):
                digest = hashlib.sha256(bytes(p)).digest()
                rows.append(
                    (
                        vid,
                        16 + digest[0] % 64,
                        16 + digest[1] % 64,
                        3,
                        round(digest[2] / 255.0, 6),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "channels", "mean_pixel"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    target: tuple[int, int] = (224, 224),
    fake: bool = True,
) -> DataFrame:
    """payload -> resized payload. Fake path tags the payload with the
    target size (byte-level marker) so tests can assert the pass-through
    plumbing; real path stubbed."""
    if not fake:
        raise CodecUnavailable("image codecs not available in this build")

    schema = f"{id_col} long, payload binary, width int, height int"
    w, h = target

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        marker = f"RESIZED:{w}x{h}:".encode()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [marker + bytes(p) for p in pdf[payload_col]],
                    "width": w,
                    "height": h,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    media_col: str = "media",
    every_ms: int = 1000,
    fake: bool = True,
) -> DataFrame:
    """video payload -> one row per sampled frame timestamp (frame
    payload stubbed). Output fans out rows map-side; the frame count
    derives from metadata duration, not from decoding."""
    if not fake:
        raise CodecUnavailable("video codecs not available in this build")

    # integer `div`, not double /: cross-engine exact (oracle parity)
    n_last = F.greatest(
        F.expr(f"{media_col}.duration_ms div {every_ms}") - 1,
        F.lit(0).cast("long"),
    )
    frames = df.filter(F.col(f"{media_col}.media_type") == "video").select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0).cast("long"), n_last)).alias("frame_idx"),
    )
    return frames.select(
        id_col,
        "frame_idx",
        (F.col("frame_idx") * every_ms).cast("long").alias("frame_ts_ms"),
    )
