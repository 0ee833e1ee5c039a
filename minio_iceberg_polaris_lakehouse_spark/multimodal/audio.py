"""Audio column pipeline (EXT scope, SURVEY.md §2.14 X4): documents
rendered to REAL RIFF/WAVE blobs, decoded/resampled/chunked by
Arrow-batched `mapInPandas` kernels over the engine's pure-stdlib codec
(multimodal/wav.py).

Synth contract (what makes the driver oracle possible): each document's
utf-8 payload becomes a deterministic 8 kHz mono PCM16 clip of
``800 + (n_bytes % 1600)`` samples — the payload bytes tiled and centered
(``(b - 128) * 256``), so every content byte contributes to the real
waveform. The SQL oracle reproduces the *arithmetic* consequences
(sample counts, durations, chunk counts) from ``octet_length(text)``
alone, while the Spark side earns them by actually encoding and parsing
WAV byte streams — a regression anywhere in the codec (header layout,
chunk walk, PCM reshape) breaks the hash match.

Scale: encode/decode are the only Python touchpoints, Arrow-batched and
shuffle-free (O(bytes) per partition); aggregation happens JVM-side after
the kernels, so at 100 TB the audio stage is an embarrassingly parallel
map over object-store blobs — the same shape as the image path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from minio_iceberg_polaris_lakehouse_spark.multimodal import wav
from minio_iceberg_polaris_lakehouse_spark.registry import register
from minio_iceberg_polaris_lakehouse_spark.sources.tables import (
    load_table,
    spread_for_kernel as _spread,
)

SAMPLE_RATE = 8000
CHUNK_LEN = 400  # 50 ms training chunks at 8 kHz

AUDIO_ASSET_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("blob", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

AUDIO_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("audio_ms", LongType()),
        StructField("rms", LongType()),
    ]
)


def doc_samples(payload: bytes) -> np.ndarray:
    """Deterministic mono PCM16 clip for a document payload: byte values
    tiled to ``800 + (len % 1600)`` samples and centered to int16."""
    n = 800 + (len(payload) % 1600)
    buf = np.frombuffer(payload, dtype=np.uint8)
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = -(-n // buf.size)
    tiled = np.tile(buf, reps)[:n].astype(np.int16)
    return (tiled - 128) * 256


def wav_assets_from_documents(df: DataFrame) -> DataFrame:
    """Asset table with REAL audio blobs: each document's payload is
    synthesized to PCM and WAV-encoded by the engine's codec, so the
    decode kernels exercise an actual RIFF parse, not a stub."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [
                wav.encode_wav(doc_samples(t.encode("utf-8")), SAMPLE_RATE)
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "audio/wav",
                    "blob": blobs,
                    "n_bytes": [len(b) for b in blobs],
                }
            )

    return _spread(df.select("doc_id", "text")).mapInPandas(kernel, AUDIO_ASSET_SCHEMA)


def decode_audio(assets: DataFrame) -> DataFrame:
    """Arrow-batched audio decode: RIFF chunk walk → fmt/data parse →
    typed columns (rate, sample count, duration, integer-rounded RMS)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                samples, rate = wav.decode_wav(bytes(blob))
                rows.append(
                    (
                        did,
                        rate,
                        samples.shape[0],
                        wav.duration_ms(samples.shape[0], rate),
                        int(round(wav.rms(samples))),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "n_samples", "audio_ms", "rms"]
            )

    return assets.mapInPandas(kernel, AUDIO_DECODED_SCHEMA)


def resample_audio(assets: DataFrame, dst_rate: int) -> DataFrame:
    """Batch sample-rate conversion: decode → linear resample →
    re-encode, keeping the BINARY column so stages chain inside Arrow."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for blob in pdf["blob"]:
                samples, rate = wav.decode_wav(bytes(blob))
                out = wav.resample_linear(samples[:, 0], rate, dst_rate)
                blobs.append(wav.encode_wav(out, dst_rate))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "audio/wav",
                    "blob": blobs,
                    # n_bytes keeps the asset-schema contract (BLOB byte
                    # length incl. RIFF header); sample counts come from
                    # decode_audio, never from this column
                    "n_bytes": [len(b) for b in blobs],
                }
            )

    return assets.mapInPandas(kernel, AUDIO_ASSET_SCHEMA)


def chunk_audio(assets: DataFrame, chunk_len: int = CHUNK_LEN) -> DataFrame:
    """Fixed-length chunk fan-out (the audio twin of sequence packing):
    one output row per zero-padded training chunk."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("chunk_id", IntegerType()),
            StructField("chunk", BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                samples, _rate = wav.decode_wav(bytes(blob))
                for i, piece in enumerate(wav.chunk_fixed(samples[:, 0], chunk_len)):
                    rows.append((did, i, piece.tobytes()))
            yield pd.DataFrame(rows, columns=["doc_id", "chunk_id", "chunk"])

    return assets.mapInPandas(kernel, schema)


def _with_source(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    d = load_table(spark, sf_dir, "documents")
    return d, wav_assets_from_documents(d)


@register(
    "mm_audio_stats",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_clips,
           CAST(SUM(800 + (octet_length(encode(text)) % 1600)) AS BIGINT)
             AS total_samples,
           CAST(SUM((800 + (octet_length(encode(text)) % 1600)) // 8) AS BIGINT)
             AS total_ms,
           {SAMPLE_RATE} AS sample_rate
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def mm_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode statistics per source, earned by a REAL WAV parse:
    payload → PCM synth → RIFF encode → mapInPandas RIFF decode (chunk
    walk, fmt/data, little-endian reshape) → per-source aggregation. The
    oracle reproduces the sample/duration arithmetic from octet_length
    alone; any codec regression breaks the hash."""
    d, assets = _with_source(spark, sf_dir)
    decoded = decode_audio(assets).join(d.select("doc_id", "source"), "doc_id")
    return (
        decoded.groupBy("source")
        .agg(
            F.count("*").alias("n_clips"),
            F.sum("n_samples").cast("long").alias("total_samples"),
            F.sum("audio_ms").cast("long").alias("total_ms"),
            F.first("sample_rate").alias("sample_rate"),
        )
        .orderBy("source")
    )


@register(
    "mm_audio_chunks",
    oracle=f"""
    SELECT source,
           CAST(SUM((800 + (octet_length(encode(text)) % 1600) + {CHUNK_LEN} - 1)
                    // {CHUNK_LEN}) AS BIGINT) AS total_chunks,
           CAST(SUM((800 + (octet_length(encode(text)) % 1600) + {CHUNK_LEN} - 1)
                    // {CHUNK_LEN}) * {CHUNK_LEN} * 2 AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length chunking fan-out over real WAV blobs: each clip is
    decoded and split into zero-padded 50 ms training chunks; the oracle
    pins ceil-division chunk counts and padded byte totals."""
    d, assets = _with_source(spark, sf_dir)
    chunks = chunk_audio(assets).join(d.select("doc_id", "source"), "doc_id")
    return (
        chunks.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("total_chunks"),
            F.sum(F.octet_length("chunk")).cast("long").alias("total_bytes"),
        )
        .orderBy("source")
    )


@register(
    "mm_audio_resample",
    oracle="""
    SELECT source,
           CAST(SUM(2 * (800 + (octet_length(encode(text)) % 1600))) AS BIGINT)
             AS total_resampled,
           CAST(16000 AS INTEGER) AS dst_rate
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8 kHz → 16 kHz linear resample over real WAV blobs: decode →
    np.interp upsample → re-encode → decode again to count samples (the
    count survives a full encode/decode round-trip, so the oracle pins
    both the resampler's length contract and the codec)."""
    d, assets = _with_source(spark, sf_dir)
    up = resample_audio(assets, 16000)
    decoded = decode_audio(up).join(d.select("doc_id", "source"), "doc_id")
    return (
        decoded.groupBy("source")
        .agg(
            F.sum("n_samples").cast("long").alias("total_resampled"),
            F.first("sample_rate").alias("dst_rate"),
        )
        .orderBy("source")
    )
