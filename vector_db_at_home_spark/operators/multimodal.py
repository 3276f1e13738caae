"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as ``binary``
columns with a metadata struct alongside text.  The Spark-side mechanics —
schema, partition-sized Arrow batches through ``mapInPandas``, batch shapes,
output contracts — are real and tested here; the actual codec calls are
STUBBED (image/audio libraries are not in this container) behind
``decode_stub`` which raises ``NotImplementedError``, with a deterministic
byte-level feature extractor standing in so the pipeline is end-to-end
runnable and verifiable.

Swap ``_extract_features_bytes`` for a real decoder (PIL/ffmpeg/torchcodec)
without touching any of the Spark plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),   # image|audio|video
        StructField("payload", BinaryType(), False),    # opaque encoded bytes
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", LongType()),
                    StructField("height", LongType()),
                    StructField("duration_ms", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_entropy", DoubleType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def synthesize_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a deterministic media table from a text table: payload =
    UTF-8 bytes of the text (a stand-in encoded blob), metadata derived from
    lengths.  Used by tests/bench so the multimodal path has real data."""
    return df.select(
        F.col(id_col).alias("media_id"),
        (F.when(F.col(id_col) % 3 == 0, "image")
         .when(F.col(id_col) % 3 == 1, "audio")
         .otherwise("video")).alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(text_col)).cast("long").alias("width"),
            F.lit(0).cast("long").alias("height"),
            (F.length(F.col(text_col)) * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, modality: str):
    """REAL-DECODER STUB.  In production this dispatches to PIL /
    libav / etc.  The container has no media codecs, so calling it raises —
    the pipeline uses ``_extract_features_bytes`` instead."""
    raise NotImplementedError(
        f"media decode for modality={modality!r} requires codec libraries "
        "not present in this environment; see _extract_features_bytes for "
        "the deterministic stand-in"
    )


def _extract_features_bytes(payload: bytes, n_features: int = 8):
    """Deterministic stand-in featurizer: byte histogram folded to
    ``n_features`` buckets (L1-normalized) + Shannon entropy.  Pure bytes —
    no codec dependency, stable across runs/engines."""
    import math

    counts = [0] * n_features
    hist = [0] * 256
    for b in payload:
        counts[b % n_features] += 1
        hist[b] += 1
    total = len(payload)
    if total == 0:
        return 0.0, [0.0] * n_features
    entropy = -sum(
        (c / total) * math.log2(c / total) for c in hist if c
    )
    return entropy, [c / total for c in counts]


def extract_media_features(media: DataFrame, n_features: int = 8,
                           use_real_decoder: bool = False) -> DataFrame:
    """Partition-parallel feature extraction over binary payloads via
    ``mapInPandas`` (Arrow batches of raw bytes — the shape a real decode
    farm uses; one task per partition, no shuffle).

    ``use_real_decoder=True`` routes through ``decode_stub`` and therefore
    raises in this environment — the flag exists so the call site for the
    real codec path is already wired.
    """
    import pandas as pd

    def featurize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ents, feats = [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                raw = bytes(payload) if payload is not None else b""
                if use_real_decoder:
                    decode_stub(raw, modality)  # raises NotImplementedError
                e, f = _extract_features_bytes(raw, n_features)
                ents.append(e)
                feats.append(f)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(bytes(p) if p is not None else b"")
                                for p in pdf["payload"]],
                    "byte_entropy": ents,
                    "features": feats,
                }
            )

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def media_stats_by_modality(features: DataFrame) -> DataFrame:
    """Downstream aggregation over extracted features — shows the decoded
    output flowing back into plain DataFrame analytics."""
    return (
        features.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("byte_entropy"), 6).alias("avg_entropy"),
        )
        .orderBy("modality")
    )
