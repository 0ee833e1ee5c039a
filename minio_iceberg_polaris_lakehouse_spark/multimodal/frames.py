"""Video/audio frame-sampling plumbing (EXT X4): a binary payload fans out
to N per-frame rows with extracted feature vectors — the shape of any
video-frame / audio-chunk preprocessing stage in a multimodal training
pipeline.

The codec is stubbed (no ffmpeg/PIL in this container): `fake_sample_frames`
derives deterministic frame features from the blob bytes, while everything
Spark is responsible for — fan-out row explosion inside `mapInPandas`
(never collect-then-explode), Arrow batch shapes, per-frame schema,
downstream aggregation — is real and tested. Swapping in a real decoder
changes one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_ts_ms int, feature array<float>, frame_bytes int"
)

FEATURE_DIM = 8


def fake_sample_frames(blob: bytes, every_ms: int = 1000, max_frames: int = 4):
    """STUB decoder: a real implementation would call ffmpeg/PyAV to seek
    and decode I-frames. Deterministic fake: frame count and 8-dim features
    derive from sha256(blob) so tests can assert exact values."""
    h = hashlib.sha256(blob).digest()
    n = 1 + h[0] % max_frames
    frames = []
    for i in range(n):
        fh = hashlib.sha256(blob + bytes([i])).digest()
        feature = [round(b / 255.0, 6) for b in fh[:FEATURE_DIM]]
        frames.append((i, i * every_ms, feature, len(blob)))
    return frames


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """blob column → per-frame rows. The fan-out happens inside the Arrow
    batch iterator (one Python pass per partition); output row count is
    data-dependent, which mapInPandas supports natively."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_ts_ms": [], "feature": [], "frame_bytes": []
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                for idx, ts_ms, feature, nbytes in fake_sample_frames(bytes(blob), every_ms):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_ts_ms"].append(ts_ms)
                    out["feature"].append(feature)
                    out["frame_bytes"].append(nbytes)
            yield pd.DataFrame(out)

    return assets.select("doc_id", "blob").mapInPandas(kernel, FRAME_SCHEMA)


def frame_feature_norms(frames: DataFrame) -> DataFrame:
    """Per-document mean feature norm — JVM-side the moment frames exist
    (the Python boundary ends at extraction)."""
    norm = F.sqrt(
        F.aggregate(
            F.transform("feature", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        frames.select("doc_id", norm.alias("n"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_frames"), F.round(F.avg("n"), 6).alias("mean_feature_norm"))
    )
