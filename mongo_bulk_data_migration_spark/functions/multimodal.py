"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride as opaque ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so each executor touches whole record batches —
the only sane shape at 100 TB (no per-row Python, no driver collect).

The actual codec step is STUBBED (image/audio libs are not in this
container): ``decode_stub`` produces a deterministic fake feature vector from
the bytes; the real implementation swaps the inner function only — schema,
partitioning, batch shape, and tests stay valid.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_features(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: n rolling byte stats."""
    if not payload:
        return [0.0] * n
    acc = [0] * n
    for i, b in enumerate(payload):
        acc[i % n] = (acc[i % n] * 31 + b) % 65521
    return [a / 65521.0 for a in acc]


def decode_features(df: DataFrame, n_features: int = 8) -> DataFrame:
    """Arrow-batched decode -> feature vector. Swap ``_fake_features`` for a
    real codec (PIL/torchaudio/ffmpeg) in production; everything else —
    batch iterator shape, schema, partition behavior — is the real thing."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_features(bytes(p) if p is not None else b"", n_features)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return df.mapInPandas(op, schema=FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:  # pragma: no cover
    """Real image resize requires PIL/opencv — not in this container."""
    raise NotImplementedError("image codecs unavailable in this environment; see decode_features for the plumbing pattern")


def sample_frames(df: DataFrame, every_n: int) -> DataFrame:  # pragma: no cover
    """Real video frame sampling requires ffmpeg — not in this container."""
    raise NotImplementedError("video codecs unavailable in this environment; see decode_features for the plumbing pattern")
