"""Multimodal column plumbing: opaque binary payloads + typed metadata.

For a training-data pipeline the engine must move image/audio/video bytes
through the same DataFrame machinery as text: ``binary`` columns with a typed
metadata struct, decode / feature-extract / resize / frame-sample as
Arrow-batched UDFs over ``mapInPandas``.

The decode step itself is STUBBED here (no image/audio libraries in this
container — marked explicitly below); everything Spark-side is real and
tested: schema, batch iteration, partitioning behavior, output shape.
A deterministic fake "decoder" (byte-statistics features) stands in so the
full path executes end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_std", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """REAL decode would go here (PIL/libvips). Not available in this
    container — the Spark-side plumbing is exercised with
    :func:`_fake_features` instead."""
    raise NotImplementedError(
        "image decode requires PIL/libvips, not present in this environment; "
        "swap _fake_features for a real decoder on a full cluster"
    )


def _fake_features(payload: bytes, dim: int = 8) -> tuple[float, float, list[float]]:
    """Deterministic stand-in for decode+embed: byte statistics and a fixed-
    dim histogram feature. Exercises the exact UDF shape a real decoder
    uses (bytes in → fixed-length float vector out)."""
    if payload is None or len(payload) == 0:
        return 0.0, 0.0, [0.0] * dim
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
    feat = (hist / max(len(arr), 1)).astype(np.float32)
    return float(arr.mean()), float(arr.std()), feat.tolist()


def extract_media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas over binary payloads → feature rows. Arrow-batched; at
    scale this is the stage where partition sizing matters (payloads are
    MBs, so ``spark.sql.files.maxPartitionBytes`` governs batch memory).

    Vectorized over the batch: one ``Series.map`` of the decode function
    over the payload column (the per-payload ``np.frombuffer`` decode is
    irreducible — payloads are variable-length — but all column assembly is
    columnar; no ``iterrows``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda p: _fake_features(p, dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ).to_numpy(),
                    "byte_mean": feats.map(lambda t: t[0]).to_numpy(),
                    "byte_std": feats.map(lambda t: t[1]).to_numpy(),
                    "feature": feats.map(lambda t: t[2]),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame-index
    rows (the real frame decode is the stubbed step). Shows the explode
    shape: one row per sampled frame, co-partitioned with the payload."""
    n_frames = (F.length("payload") / 1000).cast("int")  # fake: 1 frame/KB
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    # filter, not clamp: greatest(n_frames-1, 0) emitted a phantom frame 0
    # for zero-frame videos AND for NULL payloads (Spark's greatest SKIPS
    # nulls, so greatest(NULL, 0) = 0) — downstream decode would then read
    # frame 0 of empty/absent media. A video with no frames yields no rows.
    return (
        media.filter(F.col("media_type") == "video")
        .filter(n_frames >= 1)
        .select("media_id", F.explode(idx).alias("frame_idx"))
    )
