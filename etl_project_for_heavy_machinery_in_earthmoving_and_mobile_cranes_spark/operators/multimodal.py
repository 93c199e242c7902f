"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.  The actual codec calls are STUBBED (image/audio
libraries are not in this environment) behind ``decoder=`` hooks — a
deterministic fake decoder keeps the Spark-side plumbing (schema,
batching, partitioning) real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),      # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def real_decode(content: bytes, mime: str):  # pragma: no cover - stub
    """Hook for a real decoder (PIL / soundfile / pyav).  Not available
    in this environment by design."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "pass decoder=fake_decode or wire a real library here"
    )


def fake_decode(content: bytes, mime: str) -> list[float]:
    """Deterministic stand-in for a decoder+embedder: 8 floats derived
    from the md5 of the payload.  Shape-compatible with a real model."""
    h = hashlib.md5(content or b"").digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] = fake_decode,
    batch_hint: int = 256,
) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, one Python worker
    per partition; repartition upstream so a batch of media fits in
    executor memory (content is the wide column — never shuffle it more
    than once)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(c, m) for c, m in zip(pdf["content"], pdf["mime"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c or b"") for c in pdf["content"]],
                    "content_md5": [
                        hashlib.md5(c or b"").hexdigest() for c in pdf["content"]
                    ],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def fake_resize(content: bytes, mime: str, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: output size
    scales with the target area so batch-memory behavior is realistic."""
    seed = hashlib.md5((content or b"") + f":{width}x{height}".encode()).digest()
    n = max(1, width * height // 64)
    return (seed * (n // len(seed) + 1))[:n]


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, str, int, int], bytes] = fake_resize,
) -> DataFrame:
    """mapInPandas image resize.  Only ``kind == 'image'`` rows enter the
    Python stage (the filter is JVM-side, before any Arrow transfer);
    output carries the new dims as typed columns.  A real deployment
    swaps ``resizer`` for PIL/libvips; the Spark plumbing is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "mime": pdf["mime"],
                    "content": [
                        resizer(c, m, width, height)
                        for c, m in zip(pdf["content"], pdf["mime"])
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling WITHOUT decode: the frame index plan (one
    row per sampled frame) is pure JVM — explode over a sequence sized
    from metadata (``meta['n_frames']``, defaulting from byte length).
    The per-frame ``content`` decode is left to a downstream
    ``extract_features``-style stage; at 100 TB you never want frame
    explosion and byte decode fused, because the exploded plan must
    shuffle small (id, frame_no) rows, not the video payload."""
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"),
        (F.length("content") / 16).cast("int"),
    )
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_no",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)
                )
            ),
        )
        .select("media_id", "mime", "frame_no", n_frames.alias("n_frames"))
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass (no decode): per-kind byte stats — the
    cheap pre-filter before any expensive Python decode stage."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length(F.col("content"))).alias("total_bytes"),
        F.round(F.avg(F.length(F.col("content"))), 2).alias("avg_bytes"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (md5-derived bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.md5(f"media:{i}".encode()).digest() * (i % 7 + 1)
        rows.append((i, kind, f"{kind}/x-fake", bytearray(payload), {"idx": str(i)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
