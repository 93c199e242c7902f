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
